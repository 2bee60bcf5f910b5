"""Round 2 of conv formulation experiments: pointwise and degenerate-3D
convs vs GEMM/2-D reformulations (exact).

Findings from round 1 (tools/conv_experiments.py): big 3x3x3 convs run at
~78% MXU util (leave them to XLA), but 1x1x1 convs measure ~3% of peak and
(1,3,3)/(3,1,1) convs 14-24% — XLA's 3D lowering is the problem for the
degenerate shapes. Run: PYTHONPATH=. python tools/conv_experiments2.py
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


def conv3d(x, w, stride=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0))):
    return lax.conv_general_dilated(
        x, w, window_strides=stride, padding=list(padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def pointwise_dot(x, w):
    """1x1x1 conv == GEMM over channels. w: (1,1,1,Ci,Co)."""
    n, t, h, wd, ci = x.shape
    y = x.reshape(-1, ci) @ w.reshape(ci, -1)
    return y.reshape(n, t, h, wd, -1)


def spatial_conv2d(x, w, stride=(1, 1), padding=((1, 1), (1, 1))):
    """(1,kh,kw) conv == 2D conv on the (N*T, H, W, C) slab. w: (1,kh,kw,Ci,Co)."""
    n, t, h, wd, ci = x.shape
    y = lax.conv_general_dilated(
        x.reshape(n * t, h, wd, ci), w[0], window_strides=stride,
        padding=list(padding), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(n, t, *y.shape[1:])


def temporal_dot(x, w):
    """(kt,1,1) conv, SAME pad == stacked-shift GEMM: concat kt shifted
    views along channels, one dot with (kt*Ci, Co). w: (kt,1,1,Ci,Co)."""
    kt = w.shape[0]
    n, t, h, wd, ci = x.shape
    p = kt // 2
    xp = jnp.pad(x, ((0, 0), (p, kt - 1 - p), (0, 0), (0, 0), (0, 0)))
    taps = jnp.concatenate([xp[:, k:k + t] for k in range(kt)], axis=-1)
    y = taps.reshape(-1, kt * ci) @ w.transpose(0, 3, 1, 2, 4).reshape(
        kt * ci, -1)
    return y.reshape(n, t, h, wd, -1)


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


def run(name, fn_a, fn_b, x, w, check_shape=None):
    ta = timeit(fn_a, x, w)
    tb = timeit(fn_b, x, w)
    # exactness (small fp32)
    rng = np.random.default_rng(1)
    xa = jnp.asarray(rng.normal(size=(2, x.shape[1], 8, 8, x.shape[-1])),
                     jnp.float32)
    wa = jnp.asarray(np.asarray(w, np.float32))
    err = float(jnp.max(jnp.abs(fn_a(xa, wa) - fn_b(xa, wa))))
    res = {"conv3d_ms": round(ta, 2), "alt_ms": round(tb, 2),
           "speedup": round(ta / tb, 2), "max_err_fp32": err}
    print(json.dumps({name: res}), flush=True)
    return res


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    # 1x1x1 @ 28px, Ci 480 -> 192 (Mixed_4 bottleneck shape)
    x = jnp.asarray(rng.normal(size=(128, 4, 28, 28, 480)) * .1, bf)
    w = jnp.asarray(rng.normal(size=(1, 1, 1, 480, 192)) * .05, bf)
    run("pw_28px_480to192", conv3d, lambda a, b: pointwise_dot(a, b), x, w)

    # 1x1x1 @ 56px, Ci 192 -> 256 (merged Mixed_3b 1x1 group)
    x = jnp.asarray(rng.normal(size=(128, 8, 28, 28, 192)) * .1, bf)
    w = jnp.asarray(rng.normal(size=(1, 1, 1, 192, 256)) * .05, bf)
    run("pw_28px_192to256", conv3d, lambda a, b: pointwise_dot(a, b), x, w)

    # (1,3,3) @ 56px 64 -> 144 (R2D1 layer1 spatial)
    x = jnp.asarray(rng.normal(size=(128, 8, 56, 56, 64)) * .1, bf)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, 64, 144)) * .05, bf)
    run("sp_56px_64to144",
        lambda a, b: conv3d(a, b, (1, 1, 1), ((0, 0), (1, 1), (1, 1))),
        lambda a, b: spatial_conv2d(a, b), x, w)

    # (1,3,3) stride 2 @ 56->28px, 144-ish mid (R2D1 layer2 downsample)
    x = jnp.asarray(rng.normal(size=(128, 8, 56, 56, 128)) * .1, bf)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, 128, 230)) * .05, bf)
    run("sp_s2_56to28_128to230",
        lambda a, b: conv3d(a, b, (1, 2, 2), ((0, 0), (1, 1), (1, 1))),
        lambda a, b: spatial_conv2d(a, b, (2, 2)), x, w)

    # (3,1,1) @ 56px 144 -> 64 (R2D1 layer1 temporal)
    x = jnp.asarray(rng.normal(size=(128, 8, 56, 56, 144)) * .1, bf)
    w = jnp.asarray(rng.normal(size=(3, 1, 1, 144, 64)) * .05, bf)
    run("tm_56px_144to64",
        lambda a, b: conv3d(a, b, (1, 1, 1), ((1, 1), (0, 0), (0, 0))),
        lambda a, b: temporal_dot(a, b), x, w)


if __name__ == "__main__":
    main()
