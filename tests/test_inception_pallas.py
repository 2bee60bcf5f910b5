"""Whole-inception-module Pallas kernel vs the XLA InceptionModule.

The kernel (ops/inception_pallas.py) computes the reference InceptionModule
(pytorch_i3d_new.py:121-158) in one pass with BN pre-folded into
kernel+bias. Numerically it differs from the XLA path only by float
reassociation (per-tap f32 accumulation order), so f32 comparisons sit at
~1e-6 relative. All tests run the kernel in interpreter mode (CPU); the
on-chip Mosaic build is exercised by bench/profile drives on the TPU.

Inputs are non-negative (post-ReLU, as in the real model) — required for
the zero-pad == -inf-pad maxpool equivalence the kernel exploits.
"""
import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jmt_tpu.ops.inception_pallas as ip
from jmt_tpu.models.i3d import InceptionModule, _I3D_STAGES


def _random_module_vars(m, x, seed=1):
    """init + randomize BN scale/bias/mean/var so folding is really tested."""
    v = flax.core.unfreeze(m.init(jax.random.PRNGKey(0), x))
    ks = jax.random.split(jax.random.PRNGKey(seed), 24)
    i = 0
    for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
        p = v["params"][b]["bn"]
        s = v["batch_stats"][b]["bn"]
        n = p["scale"].shape[0]
        p["scale"] = 1.0 + 0.1 * jax.random.normal(ks[i % 24], (n,)); i += 1
        p["bias"] = 0.1 * jax.random.normal(ks[i % 24], (n,)); i += 1
        s["mean"] = 0.1 * jax.random.normal(ks[i % 24], (n,)); i += 1
        s["var"] = jnp.abs(1.0 + 0.1 * jax.random.normal(ks[i % 24], (n,)))
        i += 1
    return v


def _fold_from_vars(v, dtype=jnp.float32):
    def get(name):
        p = v["params"][name]
        s = v["batch_stats"][name]["bn"]
        return (p["kernel"], p["bn"]["scale"], p["bn"]["bias"],
                s["mean"], s["var"])
    return ip.fold_inception_weights(get, dtype)


def _check(N, T, H, W, C, spec, ht, tol=2e-5):
    m = InceptionModule(C, spec)
    x = jax.nn.relu(jax.random.normal(
        jax.random.PRNGKey(42), (N, T, H, W, C), jnp.float32))
    v = _random_module_vars(m, x)
    ref = m.apply(v, x)
    out = ip.inception_module_fused(x, _fold_from_vars(v), spec, ht=ht,
                                    interpret=True)
    assert out.shape == ref.shape, (out.shape, ref.shape)
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < tol, (rel, (N, T, H, W, C, spec, ht))
    return rel


def test_single_tile_7x7():
    _check(2, 4, 7, 7, 16, (8, 4, 8, 4, 8, 8), 7)


def test_multi_tile_14x14():
    # 2 H-tiles: exercises the halo overlap + j-dependent border masking
    _check(2, 4, 14, 14, 16, (8, 4, 8, 4, 8, 8), 7)


def test_four_tiles_28x28():
    # 4 H-tiles: interior tiles have NO pad rows (both halo rows real)
    _check(1, 4, 28, 28, 24, (8, 4, 8, 4, 8, 8), 7)


def test_auto_ht_28x28_uses_fine_tiles():
    # the auto tile choice at 28x28 (ht=4, 7 tiles) — the shipped config
    _check(1, 4, 28, 28, 24, (8, 4, 8, 4, 8, 8), 0)


def test_uneven_ht_falls_back_to_full():
    # H not divisible by ht -> single full-height tile
    _check(1, 4, 10, 10, 16, (8, 4, 8, 4, 8, 8), 7)


def test_temporal_padding_small_t():
    _check(1, 2, 7, 7, 16, (8, 4, 8, 4, 8, 8), 7)


@pytest.mark.slow
@pytest.mark.parametrize("stage", [s for s in _I3D_STAGES
                                   if s[0].startswith("Mixed")])
def test_real_i3d_module_specs(stage):
    """Every real inception spec (channel sizes as shipped), reduced T and
    N=1; the 28x28 stages run at their real spatial size (H-tiling),
    14x14/7x7 at theirs."""
    name, spec = stage
    hw = {"3": 28, "4": 14, "5": 7}[name.split("_")[1][0]]
    cin = {"Mixed_3b": 192, "Mixed_3c": 256, "Mixed_4b": 480,
           "Mixed_4c": 512, "Mixed_4d": 512, "Mixed_4e": 512,
           "Mixed_4f": 528, "Mixed_5b": 832, "Mixed_5c": 832}[name]
    _check(1, 4, hw, hw, cin, spec, 7, tol=5e-5)


def test_model_integrated_fused_path():
    """InceptionModule(fused=True) — the in-model folding/wiring path
    (child variable access order, dtype resolution) matches fused=False."""
    spec = (8, 4, 8, 4, 8, 8)
    x = jax.nn.relu(jax.random.normal(
        jax.random.PRNGKey(3), (2, 4, 14, 14, 16), jnp.float32))
    m0 = InceptionModule(16, spec, fused=False)
    v = _random_module_vars(m0, x)
    ref = m0.apply(v, x)
    m1 = InceptionModule(16, spec, fused=True)
    old = ip._FORCE_INTERPRET
    ip._FORCE_INTERPRET = True
    try:
        out = m1.apply(v, x)
    finally:
        ip._FORCE_INTERPRET = old
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 2e-5, rel


def test_fused_init_creates_same_tree():
    """init with fused=True must create the identical param/stats tree
    (the unfused path runs while initializing)."""
    spec = (8, 4, 8, 4, 8, 8)
    x = jnp.ones((1, 4, 7, 7, 16))
    v0 = InceptionModule(16, spec, fused=False).init(jax.random.PRNGKey(0), x)
    v1 = InceptionModule(16, spec, fused=True).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)


def test_fold_bn_algebra():
    """fold_bn: conv(x,k*s)+t == BN(conv(x,k)) with running stats."""
    k = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 1, 4, 8))
    g = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (8,))
    b = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (8,))
    mu = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (8,))
    var = jnp.abs(1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(4), (8,)))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 5, 5, 4))
    y = jnp.einsum("nthwc,co->nthwo", x, k[0, 0, 0])
    bn = (y - mu) / jnp.sqrt(var + 1e-3) * g + b
    kf, bf = ip.fold_bn(k, g, b, mu, var)
    yf = jnp.einsum("nthwc,co->nthwo", x, kf[0, 0, 0]) + bf
    np.testing.assert_allclose(np.asarray(yf), np.asarray(bn), atol=1e-5)
