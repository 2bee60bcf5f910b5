"""Conv3D formulation experiments on the attached chip.

Compares XLA's native conv3d lowering against a temporal-tap decomposition
(sum over kt of conv2d on (N*T, H, W, C) slabs) for the shapes that
dominate the flagship step per tools/profile_step.py: the I3D Mixed
stages (3x3x3 convs at 56/28/14px, medium channels), the I3D stem
(7x7x7 @ 224, Cin=3), and the R2D1 factored convs.

Numerics: identical convolution, different accumulation order — bf16
outputs match to ~1e-2, fp32 to ~1e-5.

Run: PYTHONPATH=. python tools/conv_experiments.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def conv3d_native(x, w, stride, padding):
    """x (N,T,H,W,Ci), w (kt,kh,kw,Ci,Co)."""
    return lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def conv3d_tapsum(x, w, stride, padding):
    """Temporal-tap decomposition: pad T, then for each kt run a 2D conv
    on the (N*Tout, H, W, Ci) slab and accumulate via lax.scan (ONE live
    f32 accumulator — an unrolled python sum keeps every tap's 3 GB output
    alive and OOMs at the stem shapes). Exactly the same convolution."""
    kt = w.shape[0]
    st, sh, sw = stride
    (pt0, pt1), ph, pw = padding[0], padding[1], padding[2]
    xp = jnp.pad(x, ((0, 0), (pt0, pt1), (0, 0), (0, 0), (0, 0)))
    n, tp, h, wd, ci = xp.shape
    tout = (tp - kt) // st + 1
    slabs = jnp.stack([
        lax.slice_in_dim(xp, k, k + (tout - 1) * st + 1, st, axis=1)
        .reshape(n * tout, h, wd, ci)
        for k in range(kt)])                       # (kt, M, H, W, Ci)

    def body(acc, inp):
        slab, wk = inp
        y = lax.conv_general_dilated(
            slab, wk, window_strides=(sh, sw), padding=[ph, pw],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return acc + y, None

    ho = (h + ph[0] + ph[1] - w.shape[1]) // sh + 1
    wo = (wd + pw[0] + pw[1] - w.shape[2]) // sw + 1
    acc0 = jnp.zeros((n * tout, ho, wo, w.shape[-1]), jnp.float32)
    acc, _ = lax.scan(body, acc0, (slabs, w))
    return acc.reshape(n, tout, ho, wo, -1).astype(x.dtype)


def timeit(fn, *args, iters=8, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        float(f(*args).sum())
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc = f(*args)
    float(acc.sum())
    return (time.perf_counter() - t0) / iters * 1e3


CASES = [
    # name, N, T, H, W, Ci, Co, k, stride, pad (TF-SAME computed by hand)
    ("i3d_stem_7x7x7_s122_224", 128, 8, 224, 224, 3, 64, (7, 7, 7),
     (1, 2, 2), [(3, 3), (2, 3), (2, 3)]),
    ("i3d_3x3x3_56px_c128", 128, 8, 56, 56, 128, 192, (3, 3, 3),
     (1, 1, 1), [(1, 1), (1, 1), (1, 1)]),
    ("i3d_3x3x3_28px_c208", 128, 4, 28, 28, 96, 208, (3, 3, 3),
     (1, 1, 1), [(1, 1), (1, 1), (1, 1)]),
    ("i3d_3x3x3_14px_c320", 128, 2, 14, 14, 160, 320, (3, 3, 3),
     (1, 1, 1), [(1, 1), (1, 1), (1, 1)]),
    ("i3d_1x1x1_28px_c480", 128, 4, 28, 28, 480, 192, (1, 1, 1),
     (1, 1, 1), [(0, 0), (0, 0), (0, 0)]),
    ("r2d1_spatial_1x3x3_56px", 128, 8, 56, 56, 64, 144, (1, 3, 3),
     (1, 1, 1), [(0, 0), (1, 1), (1, 1)]),
    ("r2d1_temporal_3x1x1_56px", 128, 8, 56, 56, 144, 64, (3, 1, 1),
     (1, 1, 1), [(1, 1), (0, 0), (0, 0)]),
]


def main():
    rng = np.random.default_rng(0)
    out = {}
    for name, n, t, h, wd, ci, co, k, stride, pad in CASES:
        x = jnp.asarray(rng.normal(size=(n, t, h, wd, ci)) * 0.1,
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(*k, ci, co)) * 0.05, jnp.bfloat16)
        t3 = timeit(lambda a, b: conv3d_native(a, b, stride, pad), x, w)
        t2 = timeit(lambda a, b: conv3d_tapsum(a, b, stride, pad), x, w)
        # correctness spot check (fp32 inputs)
        xa = jnp.asarray(rng.normal(size=(2, t, 16, 16, ci)), jnp.float32)
        wa = jnp.asarray(np.asarray(w, np.float32))
        ref = conv3d_native(xa, wa, stride, pad)
        got = conv3d_tapsum(xa, wa, stride, pad)
        err = float(jnp.max(jnp.abs(ref - got)))
        out[name] = {"conv3d_ms": round(t3, 2), "tapsum_ms": round(t2, 2),
                     "speedup": round(t3 / t2, 2), "max_err_fp32": err}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
