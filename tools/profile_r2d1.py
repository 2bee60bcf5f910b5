"""Per-stage R(2+1)D-18 profiling: where do the ~45 ms go?

The flagship roofline accounting (tools/flops_analysis.py) puts R2D1 at
4.85 TF / ~45 ms measured = 55% bf16 util — the second-largest block
after I3D and never profiled stage-by-stage. Times the backbone in 5
stage groups (each its own jit graph, random params — timing only) on
the attached chip, or reports exact FLOPs via XLA cost analysis on CPU:

    PYTHONPATH=. python tools/profile_r2d1.py            # time on TPU
    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/profile_r2d1.py --flops

Groups (B*S=128 clips, reference geometry T=8, 112px):
    stem    R2Plus1dStem (1,7,7)/s2 3->45 + (3,1,1) 45->64  (128,8,112,112,3)
    layer1  2 blocks 64ch mid144      @ 56x56
    layer2  2 blocks 128ch (s2 first) @ 56->28
    layer3  2 blocks 256ch (s2 first) @ 28->14
    layer4  2 blocks 512ch (s2 first) @ 14->7

Candidate structural wastes to localize: Cout lane padding (45->128,
144->256 MXU tiles), the Cin=3 stem, mid-channel BN/ReLU traffic.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def flops_of(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main(n=128, flops_mode=False, only=None):
    import flax.linen as nn
    from jmt_tpu.models.video_resnet import BasicBlock3d, R2Plus1dStem

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    class Layer(nn.Module):
        planes: int
        stride: int

        @nn.compact
        def __call__(self, x):
            x = BasicBlock3d(self.planes, "r2plus1d", self.stride,
                             dtype=dt, name="b0")(x)
            return BasicBlock3d(self.planes, "r2plus1d", 1,
                                dtype=dt, name="b1")(x)

    stages = {
        "stem": (R2Plus1dStem(dtype=dt), (n, 8, 112, 112, 3)),
        "layer1": (Layer(64, 1), (n, 8, 56, 56, 64)),
        "layer2": (Layer(128, 2), (n, 8, 56, 56, 64)),
        "layer3": (Layer(256, 2), (n, 8, 28, 28, 128)),
        "layer4": (Layer(512, 2), (n, 8, 14, 14, 256)),
    }

    out = {}
    for name, (mod, shape) in stages.items():
        if only and name not in only:
            continue
        x = jax.device_put(
            jax.random.normal(key, shape, dt))
        v = mod.init(key, x)
        f = jax.jit(lambda v, x, mod=mod: jnp.sum(
            mod.apply(v, x).astype(jnp.float32)))
        if flops_mode:
            fl = flops_of(lambda v, x, mod=mod: mod.apply(v, x), v, x)
            out[name] = {"gflops": round(fl / 1e9, 1)}
            print(f"{name}: {fl / 1e9:.1f} GF", flush=True)
            continue
        t0 = time.perf_counter()
        s = float(f(v, x))
        c = time.perf_counter() - t0
        ms = timeit(f, v, x) * 1e3
        out[name] = {"ms": round(ms, 2)}
        print(f"{name}: {ms:.2f} ms (compile+1st {c:.1f}s, sum {s:.6g})",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    main(flops_mode="--flops" in sys.argv, only=only or None)
