"""On-chip sweep: scoped-VMEM budgets for XLA fusions and the fused
inception kernel.

Round-3 finding under test: every inception-kernel tile decision (and the
pool-absorption negative result) was measured against Mosaic's DEFAULT
16 MB scoped-VMEM limit — but v5e has 128 MB physical VMEM, and both
limits are raisable:
  * per-kernel: pltpu.CompilerParams(vmem_limit_bytes=...) —
    ops/inception_pallas._VMEM_LIMIT_MB knob (coarse tiles unlock at
    >=32 MB).
  * whole-program: jit(compiler_options={"xla_tpu_scoped_vmem_limit_kib":
    N}) — raises XLA's OWN fusion scratch budget on the default path,
    untried so far and applicable to the headline bench number.

Stages (each serialized; run one at a time on the single chip):
  xla   — flagship inference step at scoped-vmem {default, 32M, 64M}
  fit   — AOT VMEM-fit probes of the fused kernel at raised limit +
          coarse tiles, absorb variants (cheap: Mosaic errors ~15 s)
  fused — in-model I3D/flagship A/B at the best fitting config

usage: python tools/vmem_sweep.py xla|fit|fused
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

DT = jnp.bfloat16


def stage_xla(kibs=(0, 32768, 65536)):
    """Default-path flagship at raised XLA scoped-vmem budgets — measured
    through the EXACT headline path (bench.bench_jmt_tpu, which takes
    scoped_vmem_kib for this sweep)."""
    from bench import bench_jmt_tpu
    for kib in kibs:
        tag = f"scoped_vmem={kib or 'default'}kib"
        try:
            t0 = time.perf_counter()
            cps, dt, p50 = bench_jmt_tpu(scoped_vmem_kib=kib)
            print(f"flagship [{tag}]: {dt * 1e3:.2f} ms = {cps:.1f} "
                  f"clips/s, p50 {p50 * 1e3:.1f} ms "
                  f"(total incl. compile {time.perf_counter() - t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"flagship [{tag}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


# real fused-path shapes: (name, cin, spec, H, pool_in, avg_tail) after
# the stem (T=8 pre-pool2a -> trunk T=4; H from the 112 input: 28/14/7)
_SHAPES = (
    ("3b", 192, (64, 96, 128, 16, 32, 32), 28, ((1, 3, 3), (1, 2, 2)), 0),
    ("3c", 256, (128, 128, 192, 32, 96, 64), 28, None, 0),
    ("4b", 480, (192, 96, 208, 16, 48, 64), 14, ((3, 3, 3), (1, 2, 2)), 0),
    ("4f", 528, (256, 160, 320, 32, 128, 128), 14, None, 0),
    ("5b", 832, (256, 160, 320, 32, 128, 128), 7, ((2, 2, 2), (1, 2, 2)), 0),
    ("5c", 832, (384, 192, 384, 48, 128, 128), 7, None, 1),
)


def stage_fit(limit_mb=96):
    """AOT-compile each real module shape at raised limit + coarse tiles;
    report fit/fail per (module, ht, absorb)."""
    from jmt_tpu.ops import inception_pallas as ip

    T = 8  # temporal extent through the whole trunk (stem stride (1,2,2))
    for name, cin, spec, H, pool_in, avg_tail in _SHAPES:
        o = (spec[0], spec[1], spec[2], spec[3], spec[4], spec[5])
        key = jax.random.PRNGKey(0)
        rngs = jax.random.split(key, 8)
        fw = ip.FoldedInception(
            k1=jax.random.normal(rngs[0], (cin, o[0] + o[1] + o[3]), DT),
            b1=jnp.zeros((o[0] + o[1] + o[3],), jnp.float32),
            kb1=jax.random.normal(rngs[1], (27, o[1], o[2]), DT),
            bb1=jnp.zeros((o[2],), jnp.float32),
            kb2=jax.random.normal(rngs[2], (27, o[3], o[4]), DT),
            bb2=jnp.zeros((o[4],), jnp.float32),
            k3=jax.random.normal(rngs[3], (cin, o[5]), DT),
            b3=jnp.zeros((o[5],), jnp.float32))
        for absorb in ((False, True) if pool_in else (False,)):
            Hin = H * 2 if absorb else H
            xin = jnp.abs(jax.random.normal(
                rngs[4], (128, T, Hin, Hin, cin), DT))
            hts = ([7, 4, 14] if H % 7 == 0 else [H])
            if avg_tail:
                hts = [H]
            for ht in hts:
                if H % ht:
                    continue
                tag = (f"{name} H={H} ht={ht} absorb={int(absorb)} "
                       f"lim={limit_mb}MB")
                try:
                    fn = jax.jit(lambda xx: ip.inception_module_fused(
                        xx, fw, o, pool_in=pool_in if absorb else None,
                        avg_tail=bool(avg_tail), ht=ht,
                        vmem_limit_mb=limit_mb))
                    t0 = time.perf_counter()
                    lowered = fn.lower(xin)
                    compiled = lowered.compile()
                    dt = time.perf_counter() - t0
                    print(f"FIT  {tag} (compile {dt:.0f}s)", flush=True)
                except Exception as e:
                    msg = str(e).replace("\n", " ")[:160]
                    print(f"FAIL {tag}: {msg}", flush=True)


def stage_fused(limit_mb=96, absorb=True):
    """In-model A/B at raised kernel limit (coarse auto tiles) vs XLA."""
    from jmt_tpu.ops import inception_pallas as ip
    import tools.ab_absorbed_flagship as ab
    ip._VMEM_LIMIT_MB = limit_mb
    ip._ABSORB_POOLS = absorb
    print(f"kernel vmem limit {limit_mb} MB, absorb_pools={absorb}, "
          f"coarse tiles", flush=True)
    ab.ab_i3d()
    ab.ab_flagship()


if __name__ == "__main__":
    if "xla" in sys.argv:
        explicit = [int(a) for a in sys.argv[2:] if a.isdigit()]
        stage_xla(tuple(explicit) if explicit else (0, 32768, 65536))
    if "fit" in sys.argv:
        stage_fit()
    if "fused" in sys.argv:
        stage_fused(absorb="noabsorb" not in sys.argv)
