"""TwoStreamBackbones container: shapes, backbone selection, jit, reduce
parity of MAX/AVG with the reference's reduction semantics (tsav.py:196-207).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jmt_tpu.models.tsav import TwoStreamBackbones


def make_inputs(b=1, s=2, spec_w=104):
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(b, s, 64, spec_w, 1)).astype(np.float32)
    clips = rng.normal(size=(b, s, 8, 32, 32, 3)).astype(np.float32) * 0.3
    return jnp.asarray(audio), jnp.asarray(clips)


@pytest.mark.parametrize("reduce", ["MAX", "AVG", "FLATTEN"])
def test_r2d1_and_resnet18_shapes(reduce):
    model = TwoStreamBackbones(vision_backbones=("R2D1",),
                               audio_backbones=("ResNet18",),
                               r2d1_reduce=reduce)
    audio, clips = make_inputs()
    variables = model.init(jax.random.PRNGKey(0), audio, clips)
    feats = model.apply(variables, audio, clips)
    assert set(feats) == {"audio_resnet18", "vision_r2d1"}
    assert feats["audio_resnet18"].shape == (1, 2, 512)
    assert feats["vision_r2d1"].shape == (1, 2, 512)


@pytest.mark.slow
def test_full_flagship_container_jits():
    model = TwoStreamBackbones(vision_backbones=("R2D1", "I3D"),
                               audio_backbones=("ResNet18",))
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.normal(size=(1, 2, 64, 104, 1)),
                        dtype=jnp.float32)
    clips = jnp.asarray(rng.normal(size=(1, 2, 8, 112, 112, 3)) * 0.3,
                        dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), audio, clips)
    fwd = jax.jit(lambda v, a, c: model.apply(v, a, c))
    feats = fwd(variables, audio, clips)
    assert feats["vision_i3d"].shape == (1, 2, 512)
    assert feats["vision_r2d1"].shape == (1, 2, 512)
    assert np.isfinite(np.asarray(feats["vision_i3d"])).all()


def test_reduce_max_avg_semantics():
    """MAX/AVG reduce over the 49 spatial cells == reference view+max/mean
    (tsav.py:196-202) — order-independent, so layouts agree."""
    model = TwoStreamBackbones(vision_backbones=("R2D1",),
                               audio_backbones=(), r2d1_reduce="MAX")
    audio, clips = make_inputs()
    v = model.init(jax.random.PRNGKey(0), None, clips)
    feats = model.apply(v, None, clips)
    # recompute by hand from the raw feature map
    from jmt_tpu.models.video_resnet import VideoResNet
    raw = VideoResNet(arch="r2plus1d").apply(
        {"params": v["params"]["vision_r2d1"],
         "batch_stats": v["batch_stats"]["vision_r2d1"]},
        clips.reshape(2, 8, 32, 32, 3), features_only=True)
    want = jnp.max(raw.reshape(2, -1, 512), axis=1).reshape(1, 2, 512)
    np.testing.assert_allclose(np.asarray(feats["vision_r2d1"]),
                               np.asarray(want), atol=1e-6)


def test_i3d_chunked_trunk_matches_unchunked():
    """i3d_chunk streams the I3D trunk via nn.scan with broadcast params;
    in eval mode each chunk runs the identical op sequence, so the result
    must match the unchunked path to float tolerance (models/tsav.py)."""
    rng = np.random.default_rng(3)
    clips = jnp.asarray(rng.normal(size=(2, 4, 8, 32, 32, 3)) * 0.3,
                        dtype=jnp.float32)
    m0 = TwoStreamBackbones(vision_backbones=("I3D",), audio_backbones=(),
                            i3d_input_size=112)
    v = m0.init(jax.random.PRNGKey(0), None, clips)
    ref = m0.apply(v, None, clips)["vision_i3d"]
    m1 = TwoStreamBackbones(vision_backbones=("I3D",), audio_backbones=(),
                            i3d_input_size=112, i3d_chunk=2)
    out = m1.apply(v, None, clips)["vision_i3d"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_i3d_chunk_bypassed_when_finetuning():
    """Chunked batch-stats would diverge from full-batch BN — the chunk
    path must be bypassed when the I3D BN runs in batch-stats mode."""
    rng = np.random.default_rng(4)
    clips = jnp.asarray(rng.normal(size=(1, 4, 8, 32, 32, 3)) * 0.3,
                        dtype=jnp.float32)
    m0 = TwoStreamBackbones(vision_backbones=("I3D",), audio_backbones=(),
                            i3d_input_size=112, finetune=("I3D",))
    v = m0.init(jax.random.PRNGKey(0), None, clips)
    ref, bs0 = m0.apply(v, None, clips, True, True,
                        mutable=["batch_stats"])
    m1 = TwoStreamBackbones(vision_backbones=("I3D",), audio_backbones=(),
                            i3d_input_size=112, finetune=("I3D",),
                            i3d_chunk=2)
    out, bs1 = m1.apply(v, None, clips, True, True,
                        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out["vision_i3d"]),
                               np.asarray(ref["vision_i3d"]), atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-6),
        bs0, bs1)
