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


def _check(N, T, H, W, C, spec, ht, tol=2e-5, pool_in=None,
           avg_tail=False, vmem_limit_mb=None):
    """pool_in/avg_tail: H, W are the PRE-pool spatial size; the unfused
    InceptionModule applies the same absorbed ops on its XLA path."""
    m = InceptionModule(C, spec, pool_in=pool_in, avg_tail=avg_tail)
    x = jax.nn.relu(jax.random.normal(
        jax.random.PRNGKey(42), (N, T, H, W, C), jnp.float32))
    v = _random_module_vars(m, x)
    ref = m.apply(v, x)
    out = ip.inception_module_fused(x, _fold_from_vars(v), spec, ht=ht,
                                    pool_in=pool_in, avg_tail=avg_tail,
                                    vmem_limit_mb=vmem_limit_mb,
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


def test_coarse_tiles_raised_vmem_limit():
    # raised scoped-VMEM limit (>=32 MB) switches the auto tile table to
    # coarse tiles: non-pooled 28x28 -> ht=7 (4 tiles), pooled pre-28 ->
    # post-14 ht=7 (2 tiles) — the tools/vmem_sweep.py configuration
    _check(1, 4, 28, 28, 24, (8, 4, 8, 4, 8, 8), 0, vmem_limit_mb=96)
    _check(1, 4, 28, 28, 16, (8, 4, 8, 4, 8, 8), 0, vmem_limit_mb=96,
           pool_in=((1, 3, 3), (1, 2, 2)))


def test_ht_table_override():
    # the sweep hook overrides the auto tile choice per (H, pooled)
    ip._HT_TABLE[(28, False)] = 14
    try:
        _check(1, 4, 28, 28, 24, (8, 4, 8, 4, 8, 8), 0)
    finally:
        ip._HT_TABLE.clear()


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


def test_pool_prologue_k3_multi_tile():
    # pool3a/4a shape (k=(1,3,3) s=(1,2,2)): pre 28 -> post 14, auto ht=2
    # (7 tiles) — exercises the pooled halo asm incl. the j==0 zero pad
    _check(1, 4, 28, 28, 16, (8, 4, 8, 4, 8, 8), 0,
           pool_in=((1, 3, 3), (1, 2, 2)))


def test_pool_prologue_k3_temporal():
    # pool4a temporal kernel (3,3,3) stride (1,2,2)
    _check(1, 4, 28, 28, 16, (8, 4, 8, 4, 8, 8), 0,
           pool_in=((3, 3, 3), (1, 2, 2)))


def test_pool_prologue_k2_fine_tiles():
    # pool5a shape (k=(2,2,2) s=(1,2,2)): pre 14 -> post 7, auto ht=1
    _check(1, 4, 14, 14, 16, (8, 4, 8, 4, 8, 8), 0,
           pool_in=((2, 2, 2), (1, 2, 2)))


def test_pool_prologue_single_tile():
    # n_h == 1 pooled path (capped pre block + else-branch bottom zeroing)
    _check(2, 3, 14, 14, 16, (8, 4, 8, 4, 8, 8), 7,
           pool_in=((1, 3, 3), (1, 2, 2)))


def test_avg_tail():
    # Mixed_5c epilogue: AvgPool3d((2,H,W), valid) inside the kernel
    _check(2, 4, 7, 7, 16, (8, 4, 8, 4, 8, 8), 0, avg_tail=True)


def test_pool_prologue_and_avg_tail_combined():
    _check(1, 3, 14, 14, 16, (8, 4, 8, 4, 8, 8), 0,
           pool_in=((2, 2, 2), (1, 2, 2)), avg_tail=True)


@pytest.mark.slow
def test_real_shapes_pooled():
    """The three real absorbed-pool module shapes (Mixed_3b/4b/5b) and the
    real avg_tail module (Mixed_5c), reduced T."""
    specs = dict(_I3D_STAGES)
    _check(1, 3, 56, 56, 192, specs["Mixed_3b"], 0, tol=5e-5,
           pool_in=((1, 3, 3), (1, 2, 2)))
    _check(1, 3, 28, 28, 480, specs["Mixed_4b"], 0, tol=5e-5,
           pool_in=((3, 3, 3), (1, 2, 2)))
    _check(1, 3, 14, 14, 832, specs["Mixed_5b"], 0, tol=5e-5,
           pool_in=((2, 2, 2), (1, 2, 2)))
    _check(1, 3, 7, 7, 832, specs["Mixed_5c"], 0, tol=5e-5, avg_tail=True)


def test_model_integrated_absorbed_path():
    """InceptionModule(fused=True, pool_in, avg_tail) — in-model wiring of
    the absorbed kernel matches the unfused XLA path."""
    spec = (8, 4, 8, 4, 8, 8)
    kw = dict(pool_in=((1, 3, 3), (1, 2, 2)), avg_tail=True)
    x = jax.nn.relu(jax.random.normal(
        jax.random.PRNGKey(5), (2, 3, 14, 14, 16), jnp.float32))
    m0 = InceptionModule(16, spec, fused=False, **kw)
    v = _random_module_vars(m0, x)
    ref = m0.apply(v, x)
    m1 = InceptionModule(16, spec, fused=True, **kw)
    old = ip._FORCE_INTERPRET
    ip._FORCE_INTERPRET = True
    try:
        out = m1.apply(v, x)
    finally:
        ip._FORCE_INTERPRET = old
    assert out.shape == ref.shape
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 2e-5, rel


def test_unabsorbable_pool_falls_back():
    """Odd pre-pool maps (native-112's 7x7 pre-5a) can't be absorbed by
    the kernel; the fused path must pool outside and still match."""
    spec = (8, 4, 8, 4, 8, 8)
    kw = dict(pool_in=((2, 2, 2), (1, 2, 2)))
    x = jax.nn.relu(jax.random.normal(
        jax.random.PRNGKey(6), (1, 3, 7, 7, 16), jnp.float32))  # pre 7x7
    m0 = InceptionModule(16, spec, fused=False, **kw)
    v = _random_module_vars(m0, x)
    ref = m0.apply(v, x)
    m1 = InceptionModule(16, spec, fused=True, **kw)
    old = ip._FORCE_INTERPRET
    ip._FORCE_INTERPRET = True
    try:
        out = m1.apply(v, x)
    finally:
        ip._FORCE_INTERPRET = old
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 2e-5, rel


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


@pytest.mark.slow
def test_full_backbone_fused_matches_xla():
    """InceptionI3d(fused_inception=True) == fused=False through the whole
    backbone (stem, absorbed pools, all 9 modules, absorbed avg tail) on a
    reduced 64px input — the exact graph the chip runs, CPU interpret."""
    from jmt_tpu.models.i3d import InceptionI3d
    x = jax.nn.relu(jax.random.normal(
        jax.random.PRNGKey(7), (1, 3, 64, 64, 3), jnp.float32))
    m0 = InceptionI3d(fused_inception=False)
    v = m0.init(jax.random.PRNGKey(0), x)
    ref = m0.apply(v, x)
    old = ip._FORCE_INTERPRET
    ip._FORCE_INTERPRET = True
    try:
        out = InceptionI3d(fused_inception=True).apply(v, x)
    finally:
        ip._FORCE_INTERPRET = old
    assert out.shape == ref.shape
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 5e-5, rel


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
