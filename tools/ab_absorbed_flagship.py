"""On-chip A/B: seam-ABSORBED fused inception vs the XLA path, in-model.

Round-3 context: the bare whole-module kernel won the isolated trunk
(62.6 vs 67.9 ms) but lost end-to-end (flagship 156.4 vs 151.6 ms)
because the stem->Mixed_3b and Mixed_5c->tail XLA<->Pallas seams cost
~11-12 ms. This measures whether pool-prologue + avg-tail absorption
(ops/inception_pallas.py) flips the sign. Same-process A/B, axon timing
rules (chained iters, device->host scalar fetch as the barrier).

usage: python tools/ab_absorbed_flagship.py [i3d] [flagship]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

DT = jnp.bfloat16


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def ab_i3d():
    """I3D backbone alone (stem fold -> trunk -> tail -> TCN), 128 clips.
    Round-3 bare-kernel numbers: fused 112.1 ms, XLA 106.1 ms."""
    from jmt_tpu.models.i3d import I3DTCN
    x = jax.device_put(jax.nn.relu(jax.random.normal(
        jax.random.PRNGKey(0), (128, 8, 112, 112, 3), DT)))
    m_x = I3DTCN(fused_inception=False, dtype=DT)
    v = m_x.init(jax.random.PRNGKey(1), x)
    m_f = I3DTCN(fused_inception=True, dtype=DT)

    for tag, m in (("xla", m_x), ("fused", m_f)):
        f = jax.jit(lambda v, x, m=m: jnp.sum(
            m.apply(v, x, stem_upsample2x=True).astype(jnp.float32)))
        t0 = time.perf_counter()
        s = float(f(v, x))
        c = time.perf_counter() - t0
        ms = timeit(f, v, x) * 1e3
        print(f"i3d backbone [{tag}]: {ms:.2f} ms "
              f"(compile+1st {c:.1f}s, sum {s:.6g})", flush=True)


def ab_flagship():
    """Full flagship step at the bench config (B=8 x S=16 = 128 clips).
    Round-3 bare-kernel numbers: fused 156.4 ms, XLA 151.6 ms."""
    from bench import make_host_batch, B, S
    from jmt_tpu.models.jmt_model import JMTModel
    from jmt_tpu.train.loops import _preprocess

    arrays = make_host_batch()
    dev_arrays = jax.device_put(arrays)
    kw = dict(vision_backbones=("R2D1", "I3D"),
              audio_backbones=("ResNet18", "wavLM"),
              intra_modal_fusion="encoder_plus_self_attention",
              joint_modalities="TRANSFORMER", output_format="SELF_ATTEN",
              num_heads=1, num_layers=1, dtype=DT)
    m_x = JMTModel(i3d_fused_inception=False, **kw)
    spec, clips = _preprocess(m_x, arrays, None, augment=False)
    v = m_x.init(jax.random.PRNGKey(0), spec, clips, arrays["wavlm"])
    m_f = JMTModel(i3d_fused_inception=True, **kw)

    for tag, m in (("xla", m_x), ("fused", m_f)):
        @jax.jit
        def f(v, arrays, m=m):
            spec, clips = _preprocess(m, arrays, None, augment=False)
            vouts, aouts = m.apply(v, spec, clips, arrays["wavlm"],
                                   train=False)
            return vouts.sum() + aouts.sum()
        t0 = time.perf_counter()
        s = float(f(v, dev_arrays))
        c = time.perf_counter() - t0
        ms = timeit(f, v, dev_arrays) * 1e3
        print(f"flagship [{tag}]: {ms:.2f} ms = {B * S / ms * 1e3:.1f} "
              f"clips/s (compile+1st {c:.1f}s, sum {s:.6g})", flush=True)


if __name__ == "__main__":
    if "i3d" in sys.argv or len(sys.argv) == 1:
        ab_i3d()
    if "flagship" in sys.argv or len(sys.argv) == 1:
        ab_flagship()
