"""Reverse interop: flax trees -> reference-format .pt state dicts.

Two guarantees (models/torch_export.py):
  1. round-trip: torch_io.forward(torch_export.inverse(tree)) == tree,
     exactly (pure permutations) — for every SavedWeights component;
  2. reference consumability: the exported sd loads into the REAL reference
     torch module with load_state_dict(strict=True) (after dead-submodule
     completion) and the torch forward matches our flax forward — the
     reference stack can evaluate a jmt_tpu-trained model
     (main.py:508-609 consumer).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jmt_tpu.models import torch_export as tex
from jmt_tpu.models import torch_io as tio


def tree_eq(a, b, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            tree_eq(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                err_msg=f"{path}/{k}")


# ---------------------------------------------------------------------------
# round trips (no torch needed)
# ---------------------------------------------------------------------------
def test_roundtrip_fusion_w_jr_selfatten():
    from jmt_tpu.models.fusion import TwoTransformers
    m = TwoTransformers(joint_modalities="TRANSFORMER",
                        output_format="SELF_ATTEN", num_heads=1, num_layers=1)
    v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 3, 512)),
               jnp.ones((2, 3, 512)))
    tree = v["params"]
    sd = tex.inv_two_transformers(tree)
    back = tio.two_transformers_params(sd, num_layers=1,
                                       joint_modalities="TRANSFORMER",
                                       output_format="SELF_ATTEN")
    tree_eq(jax.tree.map(np.asarray, tree), back)


def test_roundtrip_fusion_fc_format():
    from jmt_tpu.models.fusion import TwoTransformers
    m = TwoTransformers(joint_modalities="TRANSFORMER",
                        output_format="FC", num_heads=1, num_layers=1)
    v = m.init(jax.random.PRNGKey(1), jnp.ones((2, 3, 512)),
               jnp.ones((2, 3, 512)))
    sd = tex.inv_two_transformers(v["params"])
    back = tio.two_transformers_params(sd, 1, "TRANSFORMER", "FC")
    tree_eq(jax.tree.map(np.asarray, v["params"]), back)


def test_roundtrip_intra_modal():
    from jmt_tpu.models.intra_modal import IntraModalTransformerFusion
    m = IntraModalTransformerFusion(feat_dim=512, num_heads=1,
                                    hidden_dim=512, num_layers=1)
    v = m.init(jax.random.PRNGKey(2), jnp.ones((2, 3, 512)),
               jnp.ones((2, 3, 768)))
    sd = tex.inv_intra_modal_fusion(v["params"])
    back = tio.intra_modal_fusion_params(sd, num_layers=1)
    tree_eq(jax.tree.map(np.asarray, v["params"]), back)


def test_roundtrip_pretrainer_and_fc_layer():
    from jmt_tpu.models.fusion import SingleBackbonePretrainer
    from jmt_tpu.models.intra_modal import FcLayer
    v = SingleBackbonePretrainer().init(jax.random.PRNGKey(3),
                                        jnp.ones((2, 3, 512)))
    back = tio.pretrainer_params(tex.inv_pretrainer(v["params"]))
    tree_eq(jax.tree.map(np.asarray, v["params"]), back)

    v = FcLayer(512).init(jax.random.PRNGKey(4), jnp.ones((2, 3, 1024)))
    back = tio.fc_layer_params(tex.inv_fc_layer(v["params"]))
    tree_eq(jax.tree.map(np.asarray, v["params"]), back)


@pytest.mark.slow
def test_roundtrip_resnet18():
    from jmt_tpu.models.resnet18 import ResNet18
    m = ResNet18(in_channels=1)
    v = m.init(jax.random.PRNGKey(5), jnp.ones((1, 32, 32, 1)))
    tree = {"params": v["params"], "batch_stats": v["batch_stats"]}
    sd = tex.inv_resnet18(tree)
    back = tio.resnet18_vars(sd)
    tree_eq(jax.tree.map(np.asarray, tree["params"]), back["params"])
    tree_eq(jax.tree.map(np.asarray, tree["batch_stats"]),
            back["batch_stats"])


@pytest.mark.slow
def test_roundtrip_video_resnet():
    from jmt_tpu.models.video_resnet import VideoResNet
    m = VideoResNet(arch="r2plus1d")
    v = m.init(jax.random.PRNGKey(6), jnp.ones((1, 4, 32, 32, 3)))
    tree = {"params": v["params"], "batch_stats": v["batch_stats"]}
    sd = tex.inv_video_resnet(tree)
    back = tio.video_resnet_vars(sd)
    tree_eq(jax.tree.map(np.asarray, tree["params"]), back["params"])
    tree_eq(jax.tree.map(np.asarray, tree["batch_stats"]),
            back["batch_stats"])


@pytest.mark.slow
def test_roundtrip_i3d_tcn_and_tsav():
    from jmt_tpu.models.i3d import I3DTCN
    m = I3DTCN()
    v = m.init(jax.random.PRNGKey(7), jnp.ones((1, 8, 32, 32, 3)))
    tree = {"params": v["params"], "batch_stats": v["batch_stats"]}
    sd = tex.inv_i3d_tcn(tree)
    back = tio.i3d_tcn_vars(sd)
    tree_eq(jax.tree.map(np.asarray, tree["params"]), back["params"])
    tree_eq(jax.tree.map(np.asarray, tree["batch_stats"]),
            back["batch_stats"])

    # tsav aggregate (vision_i3d only — structure is what's exercised)
    agg = {"params": {"vision_i3d": tree["params"]},
           "batch_stats": {"vision_i3d": tree["batch_stats"]}}
    sd2 = tex.inv_tsav(agg)
    back2 = tio.tsav_vars(sd2)
    tree_eq(jax.tree.map(np.asarray, agg["params"]), back2["params"])


# ---------------------------------------------------------------------------
# reference strict-load + forward match
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_reference_strict_load_and_forward_match():
    torch = pytest.importorskip("torch")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_loader import load_reference_models
    ref_models = load_reference_models()
    from jmt_tpu.models.fusion import TwoTransformers

    m = TwoTransformers(joint_modalities="TRANSFORMER",
                        output_format="SELF_ATTEN", num_heads=1, num_layers=1)
    a = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 512)).astype(np.float32))
    vch = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 3, 512)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(8), a, vch)
    vout, aout = m.apply(v, a, vch)

    ref = ref_models.two_transformers.Two_transformers(
        0.0, 0.0, 1, 1, "TRANSFORMER", "SELF_ATTEN")
    sd = tex.complete_for_module(tex.inv_two_transformers(v["params"]),
                                 ref.state_dict())
    ref.load_state_dict({k: torch.from_numpy(
        np.ascontiguousarray(np.asarray(x, np.float32)))
        for k, x in sd.items()}, strict=True)
    ref.eval()
    with torch.no_grad():
        tv, ta = ref(torch.from_numpy(np.asarray(a)),
                     torch.from_numpy(np.asarray(vch)))
    np.testing.assert_allclose(np.asarray(vout), tv.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(aout), ta.numpy(), atol=2e-5)


def test_export_reference_pt_writes_components(tmp_path):
    """export_reference_pt converts a SavedWeights dir of msgpacks."""
    torch = pytest.importorskip("torch")
    from jmt_tpu.core.checkpoint import export_components
    from jmt_tpu.models.fusion import SingleBackbonePretrainer
    v = SingleBackbonePretrainer().init(jax.random.PRNGKey(9),
                                        jnp.ones((2, 3, 512)))
    export_components(str(tmp_path), {"backbone_pretrainer": v["params"]})
    written = tex.export_reference_pt(str(tmp_path))
    assert "backbone_pretrainer_w" in written
    sd = torch.load(written["backbone_pretrainer_w"], map_location="cpu")
    assert "regressor.0.weight" in sd
    ref = tio.pretrainer_params({k: v.numpy() for k, v in sd.items()})
    tree_eq(jax.tree.map(np.asarray, v["params"]), ref)


# ---------------------------------------------------------------------------
# code-review fixes: strict load WITHOUT a live module, ordering, aliases
# ---------------------------------------------------------------------------
def test_encoder_block_layer_ordering_10plus():
    """'layer10' must map to torch 'layers.10', not lexicographic slot 2."""
    dim, hidden, n = 4, 6, 11
    rng = np.random.default_rng(0)

    def layer(i):
        mark = float(i)
        return {
            "attention": {
                "in_proj_kernel": rng.normal(size=(dim, 3 * dim)),
                "in_proj_bias": np.zeros(3 * dim),
                "out_proj_kernel": rng.normal(size=(dim, dim)),
                "out_proj_bias": np.zeros(dim)},
            "ff1": {"kernel": rng.normal(size=(dim, hidden)),
                    "bias": np.full(hidden, mark)},   # marker
            "ff2": {"kernel": rng.normal(size=(hidden, dim)),
                    "bias": np.zeros(dim)},
            "layer_norm1": {"scale": np.ones(dim), "bias": np.zeros(dim)},
            "layer_norm2": {"scale": np.ones(dim), "bias": np.zeros(dim)},
        }

    tree = {f"layer{i}": layer(i) for i in range(n)}
    sd = tex.inv_encoder_block(tree, "enc")
    for i in range(n):
        np.testing.assert_array_equal(
            sd[f"enc.layers.{i}.feed_forward.0.bias"], np.full(hidden, i))


@pytest.mark.slow
def test_strict_load_without_module_fusion_and_i3d():
    """synthesize_dead_keys: the exported .pt strict-loads into the
    reference modules with NO complete_for_module step (the CLI
    --export-pt contract), and forwards match."""
    torch = pytest.importorskip("torch")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_loader import load_reference_models
    ref_models = load_reference_models()
    from jmt_tpu.models.fusion import TwoTransformers
    from jmt_tpu.models.i3d import I3DTCN

    def to_t(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(np.asarray(x)))
                for k, x in sd.items()}

    # fusion_w, SELF_ATTEN
    m = TwoTransformers(joint_modalities="TRANSFORMER",
                        output_format="SELF_ATTEN", num_heads=1,
                        num_layers=1)
    a = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 512)).astype(np.float32))
    vch = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 3, 512)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(8), a, vch)
    sd = tex.synthesize_dead_keys("fusion_w",
                                  tex.inv_two_transformers(v["params"]))
    ref = ref_models.two_transformers.Two_transformers(
        0.0, 0.0, 1, 1, "TRANSFORMER", "SELF_ATTEN")
    ref.load_state_dict(to_t(sd), strict=True)
    ref.eval()
    vout, aout = m.apply(v, a, vch)
    with torch.no_grad():
        tv, ta = ref(torch.from_numpy(np.asarray(a)),
                     torch.from_numpy(np.asarray(vch)))
    np.testing.assert_allclose(np.asarray(vout), tv.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(aout), ta.numpy(), atol=2e-5)

    # vision_i3d (TCN net.0/net.4 aliases + dead heads)
    mi = I3DTCN()
    vi = mi.init(jax.random.PRNGKey(7), jnp.ones((1, 8, 32, 32, 3)))
    sdi = tex.synthesize_dead_keys("vision_i3d", tex.inv_i3d_tcn(
        {"params": vi["params"], "batch_stats": vi["batch_stats"]}))
    refi = ref_models.I3DWSDDA.I3D_WSDDA(
        ref_models.pytorch_i3d_new.InceptionI3d(400, in_channels=3))
    # strict load is the claim under test; value parity through the same
    # converter pair is covered by test_roundtrip_i3d_tcn_and_tsav and
    # the golden I3D tests (the reference forward itself needs 224px
    # input — its fixed (2,7,7) avg-pool — too heavy for this test)
    refi.load_state_dict(to_t(sdi), strict=True)


def test_unknown_component_skipped_converter_errors_loud(tmp_path):
    """export_reference_pt: unknown names skipped; a KeyError from INSIDE
    a converter (broken component tree) propagates instead of vanishing."""
    pytest.importorskip("torch")
    from flax import serialization

    def write(name, piece):
        with open(tmp_path / f"{name}.msgpack", "wb") as f:
            f.write(serialization.msgpack_serialize(piece))

    # an unknown component name -> skipped silently
    write("not_a_component", {"params": {"x": np.ones(2, np.float32)}})
    assert tex.export_reference_pt(str(tmp_path)) == {}
    # a KNOWN name with a broken tree -> loud failure
    write("fusion_w", {"params": {"broken": np.ones(2, np.float32)}})
    with pytest.raises(KeyError):
        tex.export_reference_pt(str(tmp_path))


def test_stitcher_is_complete_unseen_video():
    from jmt_tpu.eval.stitch import Stitcher
    st = Stitcher()
    assert not st.is_complete("never-fed")


@pytest.mark.slow
def test_strict_load_vision_r2d1_into_reference_videomodel():
    """vision_r2d1.pt (with the synthesized dead 17-way fc head,
    tsav.py:44-46/172) strict-loads into the reference VideoModel."""
    torch = pytest.importorskip("torch")
    import sys, os, importlib
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_loader import load_reference_models
    load_reference_models()
    ref_tsav = importlib.import_module("models.tsav")
    from jmt_tpu.models.video_resnet import VideoResNet

    mr = VideoResNet(arch="r2plus1d")
    vr = mr.init(jax.random.PRNGKey(1), jnp.ones((1, 8, 32, 32, 3)))
    sd = tex.synthesize_dead_keys("vision_r2d1", tex.inv_video_resnet(
        {"params": vr["params"], "batch_stats": vr["batch_stats"]},
        prefix="r2plus1d."))
    ref = ref_tsav.VideoModel(num_channels=3)
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
         for k, v in sd.items()}, strict=True)
