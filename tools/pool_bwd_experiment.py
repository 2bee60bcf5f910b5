"""Max-pool backward experiment: SelectAndScatter vs shifted-compare.

Context: finetune's backward is I3D-dominated (+389 ms over the frozen
step, ~3.7x the I3D forward — STATUS round-3 attribution table). I3D has
9 in-module stride-1 (3,3,3) pools plus 4 strided pools; XLA derives
max-pool gradients as SelectAndScatter, which serializes window scans.
Candidate replacement (exact up to tie-routing): for each tap t,
grad_x += where(x == shift_t(y), shift_t(g), 0) — 27 fused elementwise
passes, no scatter. Tie semantics differ (splits gradient across equal
maxima instead of first-argmax routing); post-ReLU zeros tie often, so
this is only shippable with a documented semantics delta — MEASURE FIRST
whether the win justifies it.

usage: python tools/pool_bwd_experiment.py [inmodule] [strided] [i3dft]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

DT = jnp.bfloat16


def timeit(fn, *args, iters=16, warmup=2):
    for _ in range(warmup):
        float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    float(jax.tree_util.tree_leaves(acc)[0].sum())
    return (time.perf_counter() - t0) / iters


def bench_shape(tag, shape, kernel, strides):
    from jmt_tpu.models.i3d import max_pool_same

    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.nn.relu(jax.random.normal(key, shape, DT)))

    # XLA path: grad of sum(pool(x)) -> SelectAndScatter
    f_xla = jax.jit(jax.grad(
        lambda x: jnp.sum(max_pool_same(x, kernel, strides)
                          .astype(jnp.float32))))

    # shifted-compare path: pool fwd (reduce_window) + manual bwd
    def pool_fwd(x):
        return max_pool_same(x, kernel, strides)

    def manual_grad(x):
        y = pool_fwd(x)
        g = jnp.ones_like(y)
        from jmt_tpu.ops.conv import tf_same_pads
        pads = tf_same_pads(x.shape[1:4], kernel, strides)
        # scatter-free: pad y/g to the input grid, compare per tap
        gx = jnp.zeros_like(x, jnp.float32)
        kt, kh, kw = kernel
        st, sh, sw = strides
        if (st, sh, sw) == (1, 1, 1):
            yp = jnp.pad(y, ((0, 0), *[(p[0], p[1]) for p in pads], (0, 0)),
                         constant_values=-jnp.inf)
            gp = jnp.pad(g, ((0, 0), *[(p[0], p[1]) for p in pads], (0, 0)))
            T, H, W = x.shape[1:4]
            for dt in range(kt):
                for dh in range(kh):
                    for dw in range(kw):
                        ys = yp[:, dt:dt + T, dh:dh + H, dw:dw + W, :]
                        gs = gp[:, dt:dt + T, dh:dh + H, dw:dw + W, :]
                        gx = gx + jnp.where(x == ys, gs, 0.0)
        else:
            raise NotImplementedError
        return gx

    f_man = jax.jit(manual_grad)

    t_xla = timeit(f_xla, x) * 1e3
    out = f"{tag} {shape} k{kernel}/s{strides}: xla(S&S) {t_xla:.2f} ms"
    if strides == (1, 1, 1):
        t_man = timeit(f_man, x) * 1e3
        out += f"  shifted-compare {t_man:.2f} ms"
    print(out, flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["inmodule"]
    if "inmodule" in args:
        # the 9 in-module pool-branch pools; C=512 is the reduce_window
        # pathology shape from round 2
        bench_shape("inmod", (128, 8, 14, 14, 512), (3, 3, 3), (1, 1, 1))
        bench_shape("inmod", (128, 8, 28, 28, 256), (3, 3, 3), (1, 1, 1))
        bench_shape("inmod", (128, 8, 7, 7, 832), (3, 3, 3), (1, 1, 1))
    if "strided" in args:
        bench_shape("pool3a", (128, 8, 56, 56, 192), (1, 3, 3), (1, 2, 2))
        bench_shape("pool4a", (128, 8, 28, 28, 480), (3, 3, 3), (1, 2, 2))
