"""Exactness of the fused upsample∘stem conv (ops/conv.conv3d_stem_upsample2x).

The reference composes resize_clips_for_i3d (utils/utils.py:293-300; 2x
trilinear align_corners=False == bilinear half-pixel per frame) with the I3D
stem Conv3d_1a_7x7 (7x7x7, stride (1,2,2), TF-SAME). The fused op computes
the same function as one 7x5x5 stride-1 conv on the original grid + border
corrections — these tests pin exactness against the unfused composite.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jmt_tpu.ops.conv import (conv_nd, conv3d_stem_upsample2x, tf_same_pads)
from jmt_tpu.models.i3d import Unit3D, I3DTCN
from jmt_tpu.models.tsav import resize_clips_for_i3d, TwoStreamBackbones


def unfused_composite(x, kernel):
    up = resize_clips_for_i3d(x, 2 * x.shape[2])
    pads = tf_same_pads(up.shape[1:4], kernel.shape[:3], (1, 2, 2))
    return conv_nd(up, kernel, strides=(1, 2, 2), padding=pads)


@pytest.mark.parametrize("shape", [(2, 8, 112, 112, 3), (1, 5, 16, 16, 3),
                                   (3, 8, 12, 12, 2)])
def test_fused_stem_matches_unfused_f64(shape):
    with jax.enable_x64(True):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=shape))
        k = jnp.asarray(rng.normal(size=(7, 7, 7, shape[-1], 4)))
        t_pad = tf_same_pads((shape[1],), (7,), (1,))[0]
        want = unfused_composite(x, k)
        got = conv3d_stem_upsample2x(x, k, t_pad)
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-10)


def test_unit3d_upsampled2x_matches_resize_path_f32():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 20, 20, 3)).astype(np.float32))
    mod = Unit3D(8, 3, (7, 7, 7), (1, 2, 2))
    variables = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(variables, resize_clips_for_i3d(x, 40))
    got = mod.apply(variables, x, method=Unit3D.upsampled2x)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_i3d_tcn_fused_stem_matches_resize_path():
    """Full I3D+TCN: fused stem on 112 input == resize-to-224 + plain stem."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(0.3 * rng.normal(size=(1, 8, 112, 112, 3))
                    .astype(np.float32))
    mod = I3DTCN()
    variables = mod.init(jax.random.PRNGKey(1), x, True, True, True)
    want = mod.apply(variables, resize_clips_for_i3d(x, 224), True, True,
                     False)
    got = mod.apply(variables, x, True, True, True)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=2e-4)


def test_tsav_container_uses_fused_stem_at_224():
    """TwoStreamBackbones with i3d_input_size=224 on 112px clips routes
    through the fused stem (same params, same features as the resize path
    via a 112-ish small proxy is covered above); here: shape contract."""
    rng = np.random.default_rng(5)
    clips = jnp.asarray(0.1 * rng.normal(size=(1, 2, 8, 112, 112, 3))
                        .astype(np.float32))
    mod = TwoStreamBackbones(vision_backbones=("I3D",), audio_backbones=())
    variables = mod.init(jax.random.PRNGKey(2), None, clips)
    feats = mod.apply(variables, None, clips)
    assert feats["vision_i3d"].shape == (1, 2, 512)
