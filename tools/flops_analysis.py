"""Exact per-stage FLOP accounting via XLA cost analysis (CPU, cheap).

Combines with measured stage times (tools/profile_step.py on the chip) to
compute MXU utilization per stage = flops / (time * peak). v5e-1 bf16 peak
is ~197 TFLOP/s.

Run:  JAX_PLATFORMS=cpu PYTHONPATH=. python tools/flops_analysis.py [B]
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def flops_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main(b=8, s=16):
    from jmt_tpu.models.jmt_model import JMTModel
    from jmt_tpu.models.i3d import I3DTCN, Unit3D
    from jmt_tpu.models.video_resnet import VideoResNet
    from jmt_tpu.models.resnet18 import ResNet18
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
    flat = jnp.asarray(
        (arrays["clips"].reshape(b * s, 8, 112, 112, 3)
         .astype(np.float32) / 255.0), dt)

    out = {}

    def full(v, a):
        sp, cl = _preprocess(model, a, None, augment=False)
        vo, ao = model.apply(v, sp, cl, a["wavlm"], train=False)
        return vo.sum() + ao.sum()

    out["full_step"] = flops_of(full, variables, arrays)

    i3d_vars = {"params": variables["params"]["backbones"]["vision_i3d"],
                "batch_stats":
                    variables["batch_stats"]["backbones"]["vision_i3d"]}
    i3d = I3DTCN(dtype=dt)
    out["i3d_fused"] = flops_of(
        lambda v, x: i3d.apply(v, x, True, True, True).sum(), i3d_vars, flat)

    stem = Unit3D(64, 3, (7, 7, 7), (1, 2, 2), dtype=dt)
    stem_vars = {
        "params": i3d_vars["params"]["i3d"]["Conv3d_1a_7x7"],
        "batch_stats": i3d_vars["batch_stats"]["i3d"]["Conv3d_1a_7x7"]}
    out["i3d_stem_fused"] = flops_of(
        lambda v, x: stem.apply(v, x, True,
                                method=Unit3D.upsampled2x).sum(),
        stem_vars, flat)

    r2d1_vars = {"params": variables["params"]["backbones"]["vision_r2d1"],
                 "batch_stats":
                     variables["batch_stats"]["backbones"]["vision_r2d1"]}
    r2 = VideoResNet(arch="r2plus1d", dtype=dt)
    out["r2d1"] = flops_of(
        lambda v, x: r2.apply(v, x, True, True).sum(), r2d1_vars, flat)

    rn_vars = {"params": variables["params"]["backbones"]["audio_resnet18"],
               "batch_stats":
                   variables["batch_stats"]["backbones"]["audio_resnet18"]}
    rn = ResNet18(in_channels=1, dtype=dt)

    def audio_chain(v, a):
        mel = log_mel(a, batch_dims=2).astype(dt)[..., None]
        m = mel.reshape(b * s, *mel.shape[2:])
        return rn.apply(v, m).sum()

    out["mel_plus_resnet"] = flops_of(audio_chain, rn_vars, arrays["audio"])

    known = out["i3d_fused"] + out["r2d1"] + out["mel_plus_resnet"]
    out["fusion_plus_rest"] = out["full_step"] - known
    peak = 197e12
    report = {k: {"gflops": round(v / 1e9, 1),
                  "ideal_ms_at_peak": round(v / peak * 1e3, 2)}
              for k, v in out.items()}
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
