"""Pallas fused maxpool(3x3x3, s1, SAME) -> 1x1x1 conv for inception b3.

EXPERIMENT RECORD (round 2, v5e-1, bf16, 128 clips) — kept as the
starting point for a round-3 whole-inception-module kernel, NOT wired
into the model:

* bit-exact vs XLA pool+conv (interpret mode, `check`);
* ISOLATED (numbers include ~3.5 ms RPC): (14,14,512)->64 kernel 6.54 ms
  vs XLA 22.24 (3.4x win; XLA's reduce_window is pathological at C=512
  specifically — at C=480 it's 7.15, at 528 it's 5.66);
* 28x28 and C=832 variants fail to compile (VMEM stack OOM / Mosaic
  subprocess crash) — the in-kernel H-tile loop fixed 26->19.5 MB but
  the double-buffered input block still blows the 16 MB VMEM;
* IN CONTEXT the kernel LOSES: full Mixed_4b..4f chain 46.2 ms with
  pallas-b3 (C in {480,512}) vs 36.4 ms all-XLA — the custom-call
  boundary materializes x and breaks XLA's module-wide fusion. Third
  independent confirmation (after the separable-pool and block-diag
  merge experiments, STATUS.md) that the inception body resists
  PIECEWISE rewrites; only a whole-module kernel can win.

  python tools/pallas_pool1x1_experiment.py check   # CPU interpret exactness
  python tools/pallas_pool1x1_experiment.py time    # TPU: kernel vs XLA
  python tools/pallas_pool1x1_experiment.py chain [xla]  # Mixed_4 chain A/B
"""
import functools
import os
import sys
import time

import numpy as np

CHECK = "check" in sys.argv
if CHECK:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, k_ref, out_ref, *, hb):
    tpad, hpad, wpad, c = xp_ref.shape[1:]
    t, h, w = tpad - 2, hpad - 2, wpad - 2
    k = k_ref[:, :]
    # static H-tile loop keeps VMEM intermediates bounded (whole-slab
    # shifted-max at 28x28x256 needs ~26 MB > the 16 MB VMEM)
    for j in range(0, h, hb):
        hs = xp_ref[0, :, j:j + hb + 2, :, :]       # (T+2, hb+2, W+2, C)
        a = jnp.maximum(jnp.maximum(hs[0:t], hs[1:t + 1]), hs[2:t + 2])
        b = jnp.maximum(jnp.maximum(a[:, 0:hb], a[:, 1:hb + 1]),
                        a[:, 2:hb + 2])
        p = jnp.maximum(jnp.maximum(b[:, :, 0:w], b[:, :, 1:w + 1]),
                        b[:, :, 2:w + 2])           # (T, hb, W, C)
        rows = p.reshape(t * hb * w, c)
        out = jnp.dot(rows, k, preferred_element_type=jnp.float32)
        out_ref[0, :, j:j + hb, :, :] = (
            out.reshape(t, hb, w, -1).astype(out_ref.dtype))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pool3_1x1(x, k, interpret=False):
    """x (N,T,H,W,C); k (C,Co). maxpool3x3x3 SAME stride 1 then 1x1 conv."""
    n, t, h, w, c = x.shape
    co = k.shape[-1]
    neg = jnp.finfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
                 constant_values=neg)
    hb = h
    while t * (hb + 2) * (w + 2) * c * x.dtype.itemsize > 2_500_000:
        hb //= 2
    assert h % hb == 0, (h, hb)
    return pl.pallas_call(
        functools.partial(_kernel, hb=hb),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, t + 2, h + 2, w + 2, c), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, h, w, co), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, h, w, co), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * h * w * c * co,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, k)


def xla_ref(x, k):
    from jmt_tpu.models.i3d import max_pool_same
    from jmt_tpu.ops.conv import conv_nd
    p = max_pool_same(x, (3, 3, 3), (1, 1, 1))
    return conv_nd(p, k[None, None, None], strides=(1, 1, 1),
                   padding=[(0, 0)] * 3)


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def chain_bench(use_pallas):
    import flax.linen as nn
    from jmt_tpu.models.i3d import Unit3D, max_pool_same, _I3D_STAGES
    from jmt_tpu.ops.conv import conv_nd

    dt = jnp.bfloat16

    class Mod(nn.Module):
        cin: int
        spec: tuple

        @nn.compact
        def __call__(self, x):
            o = self.spec
            c = self.cin
            b0 = Unit3D(o[0], c, (1, 1, 1), dtype=dt)
            b1a = Unit3D(o[1], c, (1, 1, 1), dtype=dt)
            b1b = Unit3D(o[2], o[1], (3, 3, 3), dtype=dt)
            b2a = Unit3D(o[3], c, (1, 1, 1), dtype=dt)
            b2b = Unit3D(o[4], o[3], (3, 3, 3), dtype=dt)
            b3b = Unit3D(o[5], c, (1, 1, 1), dtype=dt)
            k = jnp.concatenate([b0.kernel_p, b1a.kernel_p, b2a.kernel_p],
                                axis=-1).astype(dt)
            y = conv_nd(x.astype(dt), k, strides=(1, 1, 1),
                        padding=[(0, 0)] * 3)
            y0, y1, y2 = (y[..., :o[0]], y[..., o[0]:o[0] + o[1]],
                          y[..., o[0] + o[1]:])
            b0o = b0.epilogue(y0)
            b1 = b1b(b1a.epilogue(y1))
            b2 = b2b(b2a.epilogue(y2))
            if use_pallas and c in (480, 512):
                kk = b3b.kernel_p.reshape(c, o[5]).astype(dt)
                b3 = b3b.epilogue(pool3_1x1(x.astype(dt), kk))
            else:
                b3 = b3b(max_pool_same(x, (3, 3, 3), (1, 1, 1)))
            return jnp.concatenate([b0o, b1, b2, b3], -1)

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            cin = 480
            for name, spec in _I3D_STAGES[8:13]:
                x = Mod(cin, spec, name=name)(x)
                cin = spec[0] + spec[2] + spec[4] + spec[5]
            return x

    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.normal(key, (128, 8, 14, 14, 480), dt))
    m = Chain()
    v = m.init(key, x)
    jf = jax.jit(lambda v, x: jnp.sum(m.apply(v, x).astype(jnp.float32)))
    ms = timeit(jf, v, x) * 1e3
    print({"pallas_b3": use_pallas, "chain_ms": round(ms, 2)}, flush=True)


def main():
    key = jax.random.PRNGKey(0)
    if "chain" in sys.argv:
        chain_bench("xla" not in sys.argv)
        return
    if CHECK:
        for shape, co in [((2, 4, 6, 6, 16), 8), ((1, 8, 14, 14, 32), 16)]:
            x = jax.random.normal(key, shape, jnp.float32)
            k = jax.random.normal(key, (shape[-1], co), jnp.float32) * 0.1
            a = pool3_1x1(x, k, interpret=True)
            b = xla_ref(x, k)
            err = float(jnp.max(jnp.abs(a - b)))
            print(shape, "max_abs_delta", err)
            assert err < 1e-4, err
        print("CHECK-OK")
        return
    if "time" in sys.argv:
        cases = [((128, 8, 14, 14, 512), 64),
                 ((128, 4, 7, 7, 832), 128),
                 ((128, 8, 28, 28, 256), 64)]
        if "time2" in sys.argv:
            cases = [((128, 8, 14, 14, 480), 64),
                     ((128, 8, 14, 14, 528), 128),
                     ((128, 8, 28, 28, 192), 32)]
        for shape, co in cases:
            x = jax.device_put(jax.random.normal(key, shape, jnp.bfloat16))
            k = jax.device_put(
                jax.random.normal(key, (shape[-1], co), jnp.bfloat16) * .05)
            fa = jax.jit(lambda x, k: jnp.sum(
                pool3_1x1(x, k).astype(jnp.float32)))
            fb = jax.jit(lambda x, k: jnp.sum(
                xla_ref(x, k).astype(jnp.float32)))
            try:
                ta = timeit(fa, x, k) * 1e3
            except Exception as e:
                print(f"{shape}: pallas FAILED {str(e)[:120]}", flush=True)
                continue
            tb = timeit(fb, x, k) * 1e3
            print(f"{shape} co={co}: pallas {ta:.2f} ms  xla {tb:.2f} ms",
                  flush=True)


main()
