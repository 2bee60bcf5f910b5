"""Stem conv formulation micro-bench: native stride-(1,2,2) conv3d vs the
exact space-to-depth reformulation (ops/conv.conv3d_s2d_hw), at the I3D and
R2D1 stem shapes. Run: PYTHONPATH=. python tools/stem_experiments.py"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jmt_tpu.ops.conv import conv_nd, conv3d_s2d_hw, tf_same_pads


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
    ("i3d_stem_224", 128, 8, 224, 224, 3, 64, (7, 7, 7), "same"),
    ("r2d1_spatial_stem_112", 128, 8, 112, 112, 3, 45, (1, 7, 7), "torch"),
]


def main():
    rng = np.random.default_rng(0)
    out = {}
    for name, n, t, h, w, ci, co, k, padmode in CASES:
        x = jnp.asarray(rng.normal(size=(n, t, h, w, ci)) * .1, jnp.bfloat16)
        kern = jnp.asarray(rng.normal(size=(*k, ci, co)) * .05, jnp.bfloat16)
        if padmode == "same":
            pads = tf_same_pads((t, h, w), k, (1, 2, 2))
        else:
            pads = tuple((kk // 2, kk // 2) for kk in k)
        t_native = timeit(
            lambda a, b: conv_nd(a, b, strides=(1, 2, 2),
                                 padding=list(pads)), x, kern)
        t_s2d = timeit(lambda a, b: conv3d_s2d_hw(a, b, pads), x, kern)
        out[name] = {"native_ms": round(t_native, 2),
                     "s2d_ms": round(t_s2d, 2),
                     "speedup": round(t_native / t_s2d, 2)}
        print(json.dumps({name: out[name]}), flush=True)
    return out


if __name__ == "__main__":
    main()
