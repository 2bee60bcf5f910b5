"""Benchmark: flagship audio-visual inference throughput (clips/sec/chip).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures the full device pipeline per clip — uint8 clip normalize, fused
log-mel front-end, R2D1 + I3D(+TCN) vision, ResNet18 audio (+wavLM feature
fusion), intra-modal transformers, JMT fusion, V/A heads — in bf16 on the
attached chip.

Baseline: the same compute graph assembled from the reference's own torch
modules (r2plus1d_18, I3D_WSDDA, Two_transformers,
Intra_modal_transformer_fusion imported from /root/reference; torchvision's
resnet18 is unavailable here so an identical-architecture torch ResNet-18
stands in), run the way the reference runs it — per-batch-item python loop
(train.py:136-148), float32 CPU (the only torch device in this image).
Measured once and cached in .bench_baseline.json.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")

B, S = 8, 16  # batch x clips-per-window: 128 clips/step (measured best
# throughput on v5e-1: B=4 -> 582 clips/s, B=8 -> 723 (round 1) / 842 with
# the fused I3D stem (round 2); B=12 and B=16 OOM on the I3D stem-output
# activations even with the 224² input tensor folded away)
N_WARMUP = 2
# the only true completion barrier on the axon relay is a device->host
# scalar fetch (~28 ms of RPC tunnel latency per fetch, absent on a real
# TPU host) — chain enough iterations that the amortized fetch cost
# (28/N ms) is negligible against the ~150 ms step
N_ITERS = 32


def make_host_batch(b=B, s=S, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "clips": rng.integers(0, 255, size=(b, s, 8, 112, 112, 3),
                              dtype=np.uint8),
        "audio": (rng.normal(size=(b, s, 45599)) * 0.1).astype(np.float32),
        "wavlm": rng.normal(size=(b, s, 768)).astype(np.float32),
    }


def bench_jmt_tpu(i3d_input_size=224, b=B, i3d_chunk=0, scoped_vmem_kib=0,
                  int8=False):
    import functools
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REPO)
    from jmt_tpu.models.jmt_model import JMTModel
    from jmt_tpu.train.loops import _preprocess
    from jmt_tpu.ops import quant

    model = JMTModel(
        vision_backbones=("R2D1", "I3D"),
        audio_backbones=("ResNet18", "wavLM"),
        intra_modal_fusion="encoder_plus_self_attention",
        joint_modalities="TRANSFORMER", output_format="SELF_ATTEN",
        num_heads=1, num_layers=1, i3d_input_size=i3d_input_size,
        i3d_chunk=i3d_chunk, dtype=jnp.bfloat16)

    arrays = make_host_batch(b=b)
    # init on a 1-window batch: param shapes are batch-independent, and
    # init always runs the UNCHUNKED backbone paths (nn.scan is bypassed
    # while initializing) — initializing at B>=12 OOMs before the
    # chunked step ever runs
    init_arrays = make_host_batch(b=1)
    spec1, clips1 = _preprocess(model, init_arrays, None, augment=False)
    variables = model.init(jax.random.PRNGKey(0), spec1, clips1,
                           init_arrays["wavlm"])

    # optional XLA scoped-VMEM fusion-budget override (tools/vmem_sweep.py)
    copts = ({"xla_tpu_scoped_vmem_limit_kib": str(scoped_vmem_kib)}
             if scoped_vmem_kib else None)

    # int8="static": calibrate per-conv activation scales on one batch so
    # the quantize becomes a fusable elementwise op with baked constants —
    # the dynamic mode's per-conv max-reduce is an extra pass over every
    # activation tensor plus a fusion break (measured ~neutral on chip)
    act_scales = None
    if int8 == "static":
        @jax.jit
        def calib_maxes(variables, arrays):
            coll = []
            with quant.int8_calibration(coll):
                spec, clips = _preprocess(model, arrays, None, augment=False)
                model.apply(variables, spec, clips, arrays["wavlm"],
                            train=False)
            return jnp.stack(coll)
        maxes = np.asarray(calib_maxes(variables, jax.device_put(arrays)))
        act_scales = quant.act_scales_from_maxes(maxes)
        print(f"int8 static calibration: {len(act_scales)} conv scales",
              file=sys.stderr)

    def _step(variables, arrays):
        # int8: eligible backbone convs lower to the s8xs8->s32 MXU path
        # (ops/quant.py; v5e int8 peak ~2x bf16). Accuracy bound is pinned
        # by tests/test_quant.py + the parity harness (STATUS.md).
        with quant.int8_inference(bool(int8), act_scales=act_scales):
            spec, clips = _preprocess(model, arrays, None, augment=False)
            return model.apply(variables, spec, clips, arrays["wavlm"],
                               train=False)

    # NB: compiler_options is only legal on a TOP-LEVEL jit — step_sum
    # must call the plain function, not a jitted one (nested jit with
    # compiler_options raises in jax 0.8)
    @functools.partial(jax.jit, compiler_options=copts)
    def step_sum(variables, arrays):
        vouts, aouts = _step(variables, arrays)
        return vouts.sum() + aouts.sum()

    dev_arrays = jax.device_put(arrays)
    # NB: on the axon relay platform block_until_ready returns early; a
    # device->host scalar transfer is the only true completion barrier.
    for _ in range(N_WARMUP):
        float(step_sum(variables, dev_arrays))
    t0 = time.perf_counter()
    acc = None
    for _ in range(N_ITERS):
        acc = step_sum(variables, dev_arrays)
    float(acc)
    dt = (time.perf_counter() - t0) / N_ITERS
    # serving-style p50: single-request latency incl. the device->host sync
    # (the InferenceServer path reuses this same compiled graph shape)
    lats = []
    for _ in range(5):
        t1 = time.perf_counter()
        float(step_sum(variables, dev_arrays))
        lats.append(time.perf_counter() - t1)
    lats.sort()
    clips_per_sec = (b * S) / dt
    return clips_per_sec, dt, lats[len(lats) // 2]


def measure_torch_baseline():
    """Reference-shaped torch CPU pipeline, per-item loop (train.py:136)."""
    import types
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from reference_loader import load_reference_models
    ref = load_reference_models()

    class TorchBasicBlock(tnn.Module):
        def __init__(self, inp, planes, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.down = (tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
                if stride != 1 or inp != planes else None)

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            res = self.down(x) if self.down is not None else x
            return F.relu(out + res)

    class TorchResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(1, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            layers, inp = [], 64
            for li, planes in enumerate((64, 128, 256, 512)):
                blocks = []
                for bi in range(2):
                    stride = 2 if (li > 0 and bi == 0) else 1
                    blocks.append(TorchBasicBlock(inp, planes, stride))
                    inp = planes
                layers.append(tnn.Sequential(*blocks))
            self.layers = tnn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
            x = self.layers(x)
            return torch.flatten(F.adaptive_avg_pool2d(x, (1, 1)), 1)

    r2d1 = ref.video_resnet.r2plus1d_18(pretrained=False)
    i3d = ref.I3DWSDDA.I3D_WSDDA(
        ref.pytorch_i3d_new.InceptionI3d(400, in_channels=3))
    audio_rn = TorchResNet18()
    intra_v = ref.intra_modal_transformer_fusion.\
        Intra_modal_transformer_fusion(512, 1, 512, 1)
    intra_a = ref.intra_modal_transformer_fusion.\
        Intra_modal_transformer_fusion(512, 1, 512, 1)
    fusion = ref.two_transformers.Two_transformers(
        0.0, 0.0, 1, 1, "TRANSFORMER", "SELF_ATTEN")
    for m in (r2d1, i3d, audio_rn, intra_v, intra_a, fusion):
        m.eval()

    host = make_host_batch(b=1, s=S, seed=1)  # 1 window to keep CPU feasible
    clips = torch.from_numpy(
        host["clips"][0].transpose(0, 4, 1, 2, 3).astype(np.float32) / 255.)
    spec = torch.from_numpy(
        np.random.default_rng(2).normal(size=(S, 1, 64, 104))
        .astype(np.float32))
    wavlm = torch.from_numpy(host["wavlm"][:1])

    def one_window():
        with torch.no_grad():
            r2d1(clips)
            f_r2d1 = r2d1.spatial_fts.reshape(S, 512, -1).max(dim=2)[0]
            clips224 = F.interpolate(
                clips.permute(0, 2, 1, 3, 4), size=(3, 224, 224),
                mode="trilinear", align_corners=False).permute(0, 2, 1, 3, 4)
            f_i3d = i3d(clips224).max(dim=1)[0]
            f_audio = audio_rn(spec)
            vfeat = intra_v(f_r2d1[None], f_i3d[None])
            afeat = intra_a(f_audio[None], wavlm)
            return fusion(afeat, vfeat)

    one_window()  # warmup
    t0 = time.perf_counter()
    n = 2
    for _ in range(n):
        one_window()
    dt = (time.perf_counter() - t0) / n
    return S / dt  # clips/sec (single window per iteration, as reference)


def main():
    from jmt_tpu.core.compcache import enable_compilation_cache, ENV_VAR
    # default to a repo-local cache: the flagship graph takes ~16 min of
    # remote compile on the axon relay, 69 s warm (measured; identical
    # throughput/p50 either way — warmup iterations still run on device)
    enable_compilation_cache(os.environ.get(ENV_VAR)
                             or os.path.join(REPO, ".xla_cache"))
    kib = 0
    if "--scoped-vmem" in sys.argv:
        kib = int(sys.argv[sys.argv.index("--scoped-vmem") + 1])
    ours, step_dt, p50_s = bench_jmt_tpu(scoped_vmem_kib=kib)

    # int8 inference leg (ops/quant.py): same flagship graph with eligible
    # convs on the s8 MXU path — the round-4 arithmetic lever. Default ON
    # (one extra cached compile) so the driver's BENCH record carries it;
    # --no-int8 skips, and a failure never kills the headline number.
    int8_cps = None
    int8_err = None
    if "--no-int8" not in sys.argv:
        try:
            # static calibration is the default: 1044.9 clips/s vs 868.0
            # bf16 on v5e-1 (+20%), where dynamic per-call scales measured
            # 857.8 (the max-reduce pass erased the s8 MXU gain) —
            # --int8-dynamic keeps the calibration-free mode measurable
            int8_cps, int8_dt, int8_p50 = bench_jmt_tpu(
                scoped_vmem_kib=kib,
                int8=True if "--int8-dynamic" in sys.argv else "static")
            print(f"int8 leg: {int8_cps:.2f} clips/s, p50 "
                  f"{int8_p50 * 1e3:.2f} ms", file=sys.stderr)
        except Exception as e:
            # a broken int8 leg must never kill the headline number, but
            # it must not be silent either: the failure rides in the JSON
            int8_err = f"{type(e).__name__}: {e}"
            print(f"int8 leg failed: {int8_err}", file=sys.stderr)

    # opt-in secondary metric: the native-112 I3D config (exact same
    # pipeline minus the information-free 112->224 upsample; NOT
    # reference-parity — see PARITY.md/STATUS.md; measured 1777 clips/s
    # vs 842 parity on v5e-1). Extra heavy compile, so flag-gated.
    native112 = None
    if "--native112" in sys.argv:
        native112, _, _ = bench_jmt_tpu(i3d_input_size=112,
                                        scoped_vmem_kib=kib)

    # opt-in B-sweep past the stem-activation knee: i3d_chunk streams the
    # I3D trunk (models/tsav.py) so B=12/16 no longer OOM. Heavy extra
    # compiles; prints one line per point to stderr, keeps the stock
    # B=8 number as THE metric unless a sweep point beats it.
    bsweep = {}
    if "--bsweep" in sys.argv:
        for b_, ck in ((12, 96), (16, 128), (16, 64)):
            try:
                cps, _, _ = bench_jmt_tpu(b=b_, i3d_chunk=ck,
                                          scoped_vmem_kib=kib)
            except Exception as e:
                print(f"bsweep B={b_} chunk={ck} failed: {e}",
                      file=sys.stderr)
                continue
            bsweep[f"B{b_}_ck{ck}"] = round(cps, 2)
            print(f"bsweep B={b_} chunk={ck}: {cps:.2f} clips/s",
                  file=sys.stderr)

    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f)["torch_cpu_clips_per_sec"]
    else:
        try:
            baseline = measure_torch_baseline()
            with open(BASELINE_CACHE, "w") as f:
                json.dump({"torch_cpu_clips_per_sec": baseline}, f)
        except Exception as e:
            print(f"baseline measurement failed: {e}", file=sys.stderr)
            baseline = None

    # honest utilization alongside the torch-CPU multiple (which measures
    # a CPU baseline, the only torch device in this image): step FLOPs by
    # XLA cost analysis (tools/flops_analysis.py: 11.76 TF at B=8 x S=16)
    # over measured step time vs the v5e bf16 peak (197 TFLOP/s)
    step_tflops = 11.76 * (B * S) / 128
    mfu = step_tflops * 1e12 / step_dt / 197e12

    result = {
        "metric": "flagship_audiovisual_inference_clips_per_sec_per_chip",
        "value": round(ours, 2),
        "unit": "clips/sec",
        "vs_baseline": (round(ours / baseline, 2)
                        if baseline else None),
        "p50_request_ms": round(p50_s * 1e3, 2),
        "p50_ms_per_clip": round(p50_s * 1e3 / (B * S), 3),
        "mfu_vs_197tflops_bf16": round(mfu, 3),
    }
    if int8_cps is not None:
        from jmt_tpu.ops.quant import FLAGSHIP_VA_ABS_BOUND
        result["int8_clips_per_sec"] = round(int8_cps, 2)
        result["int8_p50_request_ms"] = round(int8_p50 * 1e3, 2)
        result["int8_mode"] = ("dynamic" if "--int8-dynamic" in sys.argv
                               else "static")
        # accuracy bound for the int8 leg — the SAME constant
        # tests/test_quant.py enforces (conv-level ~1% rel err; flagship
        # eval V/A drift vs f32)
        result["int8_accuracy_bound"] = (
            f"V/A abs<={FLAGSHIP_VA_ABS_BOUND:g} vs f32 (test_quant)")
    elif int8_err is not None:
        result["int8_error"] = int8_err
    if native112 is not None:
        result["native112_clips_per_sec"] = round(native112, 2)
    if bsweep:
        result["bsweep"] = bsweep
    print(json.dumps(result))


if __name__ == "__main__":
    main()
