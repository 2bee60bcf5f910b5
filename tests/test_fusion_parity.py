"""Golden parity of the fusion stack vs the reference torch modules.

Weights are copied torch -> flax via jmt_tpu.models.torch_io; outputs must
match to fp32 tolerance on identical inputs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_loader import load_reference_models  # noqa: E402

from jmt_tpu.models import (JointMultimodalTransformer,
                            MultimodalTransformerNoJR, FeatureConcatFC,
                            TwoTransformers, SingleBackbonePretrainer,
                            IntraModalTransformerFusion, FcLayer)
from jmt_tpu.models import torch_io  # noqa: E402
from jmt_tpu.ops.attention import MultiheadAttention
from jmt_tpu.models.encoder import TransformerEncoderBlock

ref_models = load_reference_models()

B, L, E = 3, 16, 512
ATOL = 2e-5


def rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(np.float32)


def torch_out(module, *inputs):
    module.eval()
    with torch.no_grad():
        out = module(*[torch.from_numpy(x) for x in inputs])
    if isinstance(out, tuple):
        return tuple(o.numpy() for o in out if o is not None)
    return out.numpy()


def test_mha_matches_torch():
    import torch.nn as nn
    for heads in (1, 4):
        tmha = nn.MultiheadAttention(E, heads)
        q, k, v = rand(L, B, E, seed=1), rand(L, B, E, seed=2), rand(L, B, E, seed=3)
        tmha.eval()
        with torch.no_grad():
            want, _ = tmha(*map(torch.from_numpy, (q, k, v)))
        params = torch_io.mha_params(tmha.state_dict(), "")
        mod = MultiheadAttention(E, heads)
        # ours is batch-first: transpose in/out
        got = mod.apply({"params": params},
                        jnp.asarray(q.transpose(1, 0, 2)),
                        jnp.asarray(k.transpose(1, 0, 2)),
                        jnp.asarray(v.transpose(1, 0, 2)))
        got = np.asarray(got).transpose(1, 0, 2)
        np.testing.assert_allclose(got, want.numpy(), atol=ATOL)


def test_encoder_block_matches_torch():
    ref = ref_models.mm_multi_transformers.TransformerEncoderBlock(
        E, num_heads=2, hidden_dim=512, num_layers=2)
    x = rand(L, B, E, seed=4)  # torch encoder is seq-first
    want = torch_out(ref, x)
    params = torch_io.encoder_block_params(ref.state_dict(), "",
                                           num_layers=2)
    mod = TransformerEncoderBlock(E, 2, 512, 2)
    got = mod.apply({"params": params}, jnp.asarray(x.transpose(1, 0, 2)))
    got = np.asarray(got).transpose(1, 0, 2)
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("output_format", ["SELF_ATTEN", "FC"])
@pytest.mark.parametrize("heads,layers", [(1, 1), (4, 2)])
def test_jmt_w_jr_matches_torch(output_format, heads, layers):
    ref = ref_models.mm_multi_transformers.MultimodalTransformer_w_JR(
        visual_dim=E, audio_dim=E, num_heads=heads, hidden_dim=512,
        num_layers=layers, output_format=output_format)
    vis, aud = rand(B, L, E, seed=5), rand(B, L, E, seed=6)
    want = torch_out(ref, vis, aud)

    params = torch_io.jmt_w_jr_params(ref.state_dict(), layers, output_format)
    mod = JointMultimodalTransformer(
        visual_dim=E, audio_dim=E, num_heads=heads, hidden_dim=512,
        num_layers=layers, output_format=output_format,
        fc_transpose_quirk=(output_format == "FC"))
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(vis),
                               jnp.asarray(aud)))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_jmt_wo_jr_matches_torch():
    ref = ref_models.mm_transformers.MultimodalTransformer_wo_JR(
        visual_dim=E, audio_dim=E, num_heads=2, hidden_dim=512,
        num_layers=1, output_format="FC")
    vis, aud = rand(B, L, E, seed=7), rand(B, L, E, seed=8)
    want = torch_out(ref, vis, aud)
    params = torch_io.jmt_wo_jr_params(ref.state_dict(), 1)
    mod = MultimodalTransformerNoJR(num_heads=2, num_layers=1)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(vis),
                               jnp.asarray(aud)))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_feature_concat_fc_matches_torch():
    ref = ref_models.mm_multi_transformers.FeatureConcatFC(E, E)
    vis, aud = rand(B, L, E, seed=9), rand(B, L, E, seed=10)
    want = torch_out(ref, vis, aud)
    params = torch_io.feature_concat_fc_params(ref.state_dict())
    got = np.asarray(FeatureConcatFC().apply({"params": params},
                                             jnp.asarray(vis),
                                             jnp.asarray(aud)))
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("joint_modalities,output_format",
                         [("TRANSFORMER", "SELF_ATTEN"),
                          ("TRANSFORMER", "FC"),
                          ("FC", "FC"),
                          ("NONE", "FC")])
def test_two_transformers_matches_torch(joint_modalities, output_format):
    ref = ref_models.two_transformers.Two_transformers(
        v_dropout=0.0, a_dropout=0.0, num_heads=1, num_layers=1,
        joint_modalities=joint_modalities, output_format=output_format)
    aud, vis = rand(B, L, E, seed=11), rand(B, L, E, seed=12)
    want_v, want_a = torch_out(ref, aud, vis)

    params = torch_io.two_transformers_params(
        ref.state_dict(), 1, joint_modalities, output_format)
    mod = TwoTransformers(joint_modalities=joint_modalities,
                          output_format=output_format,
                          fc_transpose_quirk=(
                              joint_modalities == "TRANSFORMER"
                              and output_format == "FC"))
    got_v, got_a = mod.apply({"params": params}, jnp.asarray(aud),
                             jnp.asarray(vis))
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_a), want_a, atol=ATOL)


def test_intra_modal_fusion_matches_torch():
    ref = ref_models.intra_modal_transformer_fusion.\
        Intra_modal_transformer_fusion(feat_dim=E, num_heads=2,
                                       hidden_dim=512, num_layers=1)
    a512, b768 = rand(B, L, E, seed=13), rand(B, L, 768, seed=14)
    want = torch_out(ref, a512, b768)
    params = torch_io.intra_modal_fusion_params(ref.state_dict(), 1)
    mod = IntraModalTransformerFusion(num_heads=2, num_layers=1)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(a512),
                               jnp.asarray(b768)))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_fc_layer_matches_torch():
    ref = ref_models.fc_layer.FcLayer(1024, 512)
    x = rand(B, L, 1024, seed=15)
    want = torch_out(ref, x)
    params = torch_io.fc_layer_params(ref.state_dict())
    got = np.asarray(FcLayer(512).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_pretrainer_matches_torch():
    ref = ref_models.two_transformers.SingleBackbonePretrainer(0.0, 0.0)
    x = rand(B, L, E, seed=16)
    want_v, want_a = torch_out(ref, x)
    params = torch_io.pretrainer_params(ref.state_dict())
    got_v, got_a = SingleBackbonePretrainer().apply({"params": params},
                                                    jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_a), want_a, atol=ATOL)


def test_module_prefix_stripped():
    ref = ref_models.fc_layer.FcLayer(64, 32)
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    params = torch_io.fc_layer_params(sd)
    x = rand(2, 4, 64, seed=17)
    got = np.asarray(FcLayer(32).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, torch_out(ref, x), atol=ATOL)
