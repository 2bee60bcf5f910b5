"""Per-stage I3D profiling: where do the ~105 ms go?

Times the I3D body in 6 stage groups (each its own jit graph, random
params — timing only) on the attached chip, or reports each group's exact
FLOPs via XLA cost analysis when run on CPU:

    PYTHONPATH=. python tools/profile_i3d.py            # time on TPU
    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/profile_i3d.py --flops

Groups (input shapes at the 224-equivalent resolution, B*S=128 clips):
    stem       Conv3d_1a_7x7 via the fused-upsample path   (128,8,112,112,3)
    pool2a     MaxPool3d_2a (1,3,3)/(1,2,2)                (128,8,112,112,64)
    conv2bc    Conv3d_2b_1x1 + Conv3d_2c_3x3 + pool3a      (128,8,56,56,64)
    mixed3     Mixed_3b + Mixed_3c + pool4a                (128,8,28,28,192)
    mixed4     Mixed_4b..4f                                (128,8,14,14,480)
    tail       pool5a + Mixed_5b + Mixed_5c + avg + TCN    (128,8,14,14,832)
    poolmicro  one in-module max_pool_same (3,3,3)/(1,1,1) (128,8,14,14,512)
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
    from jmt_tpu.models.i3d import (Unit3D, InceptionModule, max_pool_same,
                                    _I3D_STAGES)
    from jmt_tpu.models.tcn import TemporalConvNet
    from jmt_tpu.ops.conv import avg_pool

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    class Conv2BC(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Unit3D(64, 64, (1, 1, 1), dtype=dt,
                       name="Conv3d_2b_1x1")(x)
            x = Unit3D(192, 64, (3, 3, 3), dtype=dt,
                       name="Conv3d_2c_3x3")(x)
            return max_pool_same(x, (1, 3, 3), (1, 2, 2))

    class Mixed3(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = InceptionModule(192, (64, 96, 128, 16, 32, 32), dtype=dt,
                                name="Mixed_3b")(x)
            x = InceptionModule(256, (128, 128, 192, 32, 96, 64), dtype=dt,
                                name="Mixed_3c")(x)
            return max_pool_same(x, (3, 3, 3), (1, 2, 2))

    class Mixed4(nn.Module):
        @nn.compact
        def __call__(self, x):
            cin = 480
            for name, spec in _I3D_STAGES[8:13]:
                x = InceptionModule(cin, spec, dtype=dt, name=name)(x)
                cin = spec[0] + spec[2] + spec[4] + spec[5]
            return x

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = max_pool_same(x, (2, 2, 2), (1, 2, 2))
            x = InceptionModule(832, (256, 160, 320, 32, 128, 128),
                                dtype=dt, name="Mixed_5b")(x)
            x = InceptionModule(832, (384, 192, 384, 48, 128, 128),
                                dtype=dt, name="Mixed_5c")(x)
            x = avg_pool(x, (2, x.shape[2], x.shape[3]), (1, 1, 1))
            x = x.squeeze(3).squeeze(2)
            return TemporalConvNet((512, 512, 512, 512), kernel_size=5,
                                   dropout=0.1, dtype=dt)(x)

    stem = Unit3D(64, 3, (7, 7, 7), (1, 2, 2), dtype=dt)

    stages = {
        "stem": (lambda v, x: stem.apply(v, x, True,
                                         method=Unit3D.upsampled2x),
                 stem, (n, 8, 112, 112, 3)),
        "pool2a": (lambda v, x: max_pool_same(x, (1, 3, 3), (1, 2, 2)),
                   None, (n, 8, 112, 112, 64)),
        "conv2bc": (None, Conv2BC(), (n, 8, 56, 56, 64)),
        "mixed3": (None, Mixed3(), (n, 8, 28, 28, 192)),
        "mixed4": (None, Mixed4(), (n, 8, 14, 14, 480)),
        "tail": (None, Tail(), (n, 8, 14, 14, 832)),
        "poolmicro": (lambda v, x: max_pool_same(x, (3, 3, 3), (1, 1, 1)),
                      None, (n, 8, 14, 14, 512)),
    }

    out = {}
    for name, (fn, mod, shape) in stages.items():
        if only and name not in only:
            continue
        x = jax.random.normal(key, shape, dt)
        if mod is not None and fn is None:
            v = mod.init(key, x)
            fn = mod.apply
        elif mod is not None:
            v = mod.init(key, x, True, method=Unit3D.upsampled2x)
        else:
            v = {}

        if flops_mode:
            out[name] = {"gflops": round(
                flops_of(lambda vv, xx: jnp.sum(fn(vv, xx)), v, x) / 1e9, 1)}
            out[name]["ideal_ms_197tf"] = round(
                out[name]["gflops"] / 197e3 * 1e3, 2)
        else:
            xd = jax.device_put(x)

            def run(vv, xx, fn=fn):
                return jnp.sum(fn(vv, xx))

            jf = jax.jit(run)
            out[name] = {"ms": round(timeit(jf, v, xd) * 1e3, 2)}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    flops_mode = "--flops" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("-")] or None
    main(flops_mode=flops_mode, only=only)
