"""Per-component step profiling on the attached chip (flagship config).

Times each stage of the flagship inference step in isolation with the
scalar-fetch sync pattern (on the axon relay, block_until_ready returns
early — a device->host transfer is the only true barrier).

Run:  PYTHONPATH=. python tools/profile_step.py [B] [iters]
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


def main(b=8, s=16, iters=8):
    from jmt_tpu.models.jmt_model import JMTModel
    from jmt_tpu.models.i3d import I3DTCN, InceptionI3d, Unit3D
    from jmt_tpu.models.video_resnet import VideoResNet
    from jmt_tpu.models.resnet18 import ResNet18
    from jmt_tpu.models.tsav import resize_clips_for_i3d
    from jmt_tpu.ops.mel import log_mel
    from jmt_tpu.train.loops import _preprocess

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    arrays = {
        "clips": rng.integers(0, 255, size=(b, s, 8, 112, 112, 3),
                              dtype=np.uint8),
        "audio": (rng.normal(size=(b, s, 45599)) * 0.1).astype(np.float32),
        "wavlm": rng.normal(size=(b, s, 768)).astype(np.float32),
    }
    model = JMTModel(
        vision_backbones=("R2D1", "I3D"),
        audio_backbones=("ResNet18", "wavLM"),
        intra_modal_fusion="encoder_plus_self_attention",
        joint_modalities="TRANSFORMER", output_format="SELF_ATTEN",
        dtype=dt)
    spec, clips = _preprocess(model, arrays, None, augment=False)
    variables = model.init(jax.random.PRNGKey(0), spec, clips,
                           arrays["wavlm"])
    dev = jax.device_put(arrays)
    results = {}

    @jax.jit
    def full(v, a):
        sp, cl = _preprocess(model, a, None, augment=False)
        vo, ao = model.apply(v, sp, cl, a["wavlm"], train=False)
        return vo.sum() + ao.sum()

    results["full_step_ms"] = timeit(full, variables, dev,
                                     iters=iters) * 1e3

    # ---- isolated stages on pre-flattened bf16 clips
    flat = (arrays["clips"].reshape(b * s, 8, 112, 112, 3)
            .astype(np.float32) / 255.0).astype(np.dtype("bfloat16"))
    flat = jax.device_put(jnp.asarray(flat, dt))

    i3d_vars = {"params": variables["params"]["backbones"]["vision_i3d"],
                "batch_stats":
                    variables["batch_stats"]["backbones"]["vision_i3d"]}
    i3d = I3DTCN(dtype=dt)

    @jax.jit
    def i3d_only(v, x):
        return i3d.apply(v, resize_clips_for_i3d(x)).sum()

    results["i3d_total_ms"] = timeit(i3d_only, i3d_vars, flat,
                                     iters=iters) * 1e3

    @jax.jit
    def i3d_fused(v, x):
        return i3d.apply(v, x, True, True, True).sum()

    results["i3d_fused_ms"] = timeit(i3d_fused, i3d_vars, flat,
                                     iters=iters) * 1e3

    @jax.jit
    def upsample_only(x):
        return resize_clips_for_i3d(x).sum()

    results["i3d_upsample_ms"] = timeit(upsample_only, flat,
                                        iters=iters) * 1e3

    # stem conv (Conv3d_1a_7x7) on the 224 input
    stem = Unit3D(64, 3, (7, 7, 7), (1, 2, 2), dtype=dt)
    x224 = jax.device_put(jnp.zeros((b * s, 8, 224, 224, 3), dt))
    stem_vars = {
        "params": i3d_vars["params"]["i3d"]["Conv3d_1a_7x7"],
        "batch_stats":
            i3d_vars["batch_stats"]["i3d"]["Conv3d_1a_7x7"],
    }

    @jax.jit
    def stem_only(v, x):
        return stem.apply(v, x, True).sum()

    results["i3d_stem224_ms"] = timeit(stem_only, stem_vars, x224,
                                       iters=iters) * 1e3

    @jax.jit
    def stem_fused(v, x):
        return stem.apply(v, x, True, method=Unit3D.upsampled2x).sum()

    results["i3d_stem_fused_ms"] = timeit(stem_fused, stem_vars, flat,
                                          iters=iters) * 1e3

    r2d1_vars = {"params": variables["params"]["backbones"]["vision_r2d1"],
                 "batch_stats":
                     variables["batch_stats"]["backbones"]["vision_r2d1"]}
    r2 = VideoResNet(arch="r2plus1d", dtype=dt)

    @jax.jit
    def r2d1_only(v, x):
        return r2.apply(v, x, True, True).sum()

    results["r2d1_ms"] = timeit(r2d1_only, r2d1_vars, flat,
                                iters=iters) * 1e3

    rn_vars = {"params":
               variables["params"]["backbones"]["audio_resnet18"],
               "batch_stats":
               variables["batch_stats"]["backbones"]["audio_resnet18"]}
    rn = ResNet18(in_channels=1, dtype=dt)
    dev_audio = jax.device_put(arrays["audio"])

    @jax.jit
    def audio_chain(v, a):
        mel = log_mel(a, batch_dims=2).astype(dt)[..., None]
        m = mel.reshape(b * s, *mel.shape[2:])
        # ResNet expects (N, H, W, C); mel is (N, 64, T, 1)
        return rn.apply(v, m).sum()

    results["mel_plus_resnet_ms"] = timeit(audio_chain, rn_vars, dev_audio,
                                           iters=iters) * 1e3

    @jax.jit
    def mel_only(a):
        return log_mel(a, batch_dims=2).sum()

    results["mel_ms"] = timeit(mel_only, dev_audio, iters=iters) * 1e3

    results["clips_per_s_full"] = b * s / (results["full_step_ms"] / 1e3)
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))
    return results


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(b=b, iters=iters)
