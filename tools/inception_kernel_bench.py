"""On-chip A/B: whole-inception-module Pallas kernel vs the XLA path.

Stages (run in one invocation to amortize relay setup):
  single — compile + time + bf16 numerics for one module (Mixed_4c shape)
  chain  — the full inception trunk Mixed_3b..Mixed_5c incl. interleaved
           pools, 128-clip bf16 tensors: pallas vs XLA wall time
usage: python tools/inception_kernel_bench.py [single] [chain] [xla-only]

Timing per the axon relay rules: chain N>=8 iterations, device->host
scalar fetch as the only true barrier (block_until_ready returns early).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.models.i3d import InceptionModule, max_pool_same, _I3D_STAGES
from jmt_tpu.ops.inception_pallas import (fold_inception_weights,
                                          inception_module_fused)

DT = jnp.bfloat16
N = 128


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def make_module_vars(cin, spec, key):
    m = InceptionModule(cin, spec, dtype=DT)
    x = jnp.zeros((1, 8, 14, 14, cin), DT)
    v = m.init(key, x)
    return m, v


def fold_from(v):
    def get(name):
        p = v["params"][name]
        s = v["batch_stats"][name]["bn"]
        return (p["kernel"], p["bn"]["scale"], p["bn"]["bias"],
                s["mean"], s["var"])
    return fold_inception_weights(get, DT)


def single():
    cin, spec = 512, (160, 112, 224, 24, 64, 64)  # Mixed_4c
    key = jax.random.PRNGKey(0)
    m, v = make_module_vars(cin, spec, key)
    x = jax.device_put(jax.nn.relu(
        jax.random.normal(key, (N, 8, 14, 14, cin), DT)))
    fw = jax.device_put(fold_from(v))

    fp = jax.jit(lambda x, fw: jnp.sum(
        inception_module_fused(x, fw, spec).astype(jnp.float32)))
    fx = jax.jit(lambda v, x: jnp.sum(m.apply(v, x).astype(jnp.float32)))

    t0 = time.perf_counter()
    sp = float(fp(x, fw))
    print(f"pallas compile+1st: {time.perf_counter()-t0:.1f}s", flush=True)
    sx = float(fx(v, x))
    rel = abs(sp - sx) / max(abs(sx), 1e-9)
    print(f"sum pallas {sp:.6g} xla {sx:.6g} rel {rel:.2e}", flush=True)

    # elementwise numerics on a slice (fetch cost; N=8 subset)
    outp = jax.jit(lambda x, fw: inception_module_fused(x, fw, spec))(
        x[:8], fw)
    outx = jax.jit(lambda v, x: m.apply(v, x))(v, x[:8])
    import numpy as np
    d = np.max(np.abs(np.asarray(outp, np.float32)
                      - np.asarray(outx, np.float32)))
    mx = np.max(np.abs(np.asarray(outx, np.float32)))
    print(f"elementwise max_abs {d:.3e} (ref max {mx:.3f})", flush=True)

    tp = timeit(fp, x, fw) * 1e3
    tx = timeit(fx, v, x) * 1e3
    print(f"Mixed_4c N={N}: pallas {tp:.2f} ms  xla {tx:.2f} ms", flush=True)


class Trunk(nn.Module):
    """pool3a output -> Mixed_3b..Mixed_5c with interleaved pools.
    `fused` is a substring filter: modules whose name contains any of the
    comma-separated tokens run the Pallas kernel."""
    fused: str = ""

    @nn.compact
    def __call__(self, x):
        toks = [t for t in self.fused.split(",") if t]
        cin = 192
        for name, spec in _I3D_STAGES[5:]:
            if name.startswith("MaxPool"):
                x = max_pool_same(x, *spec)
            else:
                fu = any(t in name for t in toks)
                x = InceptionModule(cin, spec, fused=fu,
                                    dtype=DT, name=name)(x)
                cin = spec[0] + spec[2] + spec[4] + spec[5]
        return x


def chain(fused: str):
    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.nn.relu(
        jax.random.normal(key, (N, 8, 28, 28, 192), DT)))
    m = Trunk(fused=fused)
    v = Trunk(fused="").init(key, x)  # same tree either way
    f = jax.jit(lambda v, x: jnp.sum(m.apply(v, x).astype(jnp.float32)))
    t0 = time.perf_counter()
    s = float(f(v, x))
    c = time.perf_counter() - t0
    ms = timeit(f, v, x) * 1e3
    print(f"trunk fused=[{fused}]: {ms:.2f} ms  "
          f"(compile+1st {c:.1f}s, sum {s:.6g})", flush=True)


class Stack(nn.Module):
    """Mixed_4b..Mixed_4f back-to-back, NO pools — isolates module-chain
    behavior (pallas<->pallas adjacency) from pool/layout seams."""
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        cin = 480
        for name, spec in _I3D_STAGES[8:13]:
            x = InceptionModule(cin, spec, fused=self.fused,
                                dtype=DT, name=name)(x)
            cin = spec[0] + spec[2] + spec[4] + spec[5]
        return x


def stack(use_pallas):
    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.nn.relu(
        jax.random.normal(key, (N, 8, 14, 14, 480), DT)))
    m = Stack(fused=use_pallas)
    v = Stack(fused=False).init(key, x)
    f = jax.jit(lambda v, x: jnp.sum(m.apply(v, x).astype(jnp.float32)))
    t0 = time.perf_counter()
    s = float(f(v, x))
    c = time.perf_counter() - t0
    ms = timeit(f, v, x) * 1e3
    print(f"stack(M4b..f, no pools) fused={use_pallas}: {ms:.2f} ms "
          f"(compile+1st {c:.1f}s, sum {s:.6g})", flush=True)


if __name__ == "__main__":
    if "single" in sys.argv:
        single()
    if "stack" in sys.argv:
        stack(True)
        stack(False)
    if "chain" in sys.argv:
        for spec in sys.argv[sys.argv.index("chain") + 1:]:
            chain("" if spec == "xla" else spec)
