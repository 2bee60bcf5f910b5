"""Serving: ahead-of-time compiled, fixed-shape batched inference.

The TPU-native serving story the reference never had (its test.py is an
offline batch script). Design:

* **Compile once, stream many** — the flagship forward (device
  preprocessing + backbones + fusion) is AOT-compiled per batch bucket via
  ``jit(...).lower(...).compile()`` at server construction; request time
  never traces or compiles.
* **Static batch buckets** — requests are padded UP to the smallest
  compiled bucket (powers of two by default); XLA sees only static shapes.
* **bf16 compute** — same policy as training (model_params.compute_dtype).
* Weights come from a training run (``SavedWeights/`` components — the
  BEST epoch — or the monolithic train_state).

Usage:
    server = InferenceServer.from_experiment(exp_dir)
    v, a = server.predict(clips_u8, audio_f32, wavlm)   # (B,S) each

CLI self-test (synthetic input, prints latency JSON):
    python -m jmt_tpu.serve [--exp-dir DIR] [--buckets 1,8]
"""
from __future__ import annotations

import time
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class WavLMFrontend:
    """Server-side WavLM features from the request's raw audio chunks.

    Training-time wavLM features are per-anchor-frame embeddings of the
    FULL audio track (offline: data/wavlm_extract.py). A live request
    only carries each subsequence's ~1 s wav chunk, whose END is the
    anchor instant — so the frontend runs WavLM over the chunk (one AOT
    compile per bucket; host-side 44.1k->16k polyphase resample) and
    emits the LAST WavLM frame. Context is truncated to the chunk by
    construction; use the offline extractor when full-track features are
    available. The approximation is MEASURED (tests/test_wavlm_drift.py,
    numbers in docs/OPERATIONS.md "Live WavLM approximation"): alignment
    is sub-frame accurate and downstream V/A drift is ≤0.04 with a
    worst-case random-init model — re-run that harness with your real
    checkpoint before shipping raw-audio serving.
    """

    def __init__(self, params, cfg, sample_rate: int = 44100,
                 audio_samples: Optional[int] = None):
        from jmt_tpu.models.wavlm import wavlm_apply
        from jmt_tpu.ops.mel import AUDIO_SAMPLES
        from jmt_tpu.data.wavlm_extract import WAVLM_SR
        self.cfg = cfg
        self.sr = sample_rate
        self.audio_samples = audio_samples or AUDIO_SAMPLES
        from math import gcd
        g = gcd(self.sr, WAVLM_SR)
        self._up, self._down = WAVLM_SR // g, self.sr // g
        self._params = params

        def fn(params, wav):  # wav: (N, L16) normalized
            return wavlm_apply(params, wav, cfg)[:, -1, :]

        self._fn = jax.jit(fn)

    def features(self, audio: np.ndarray) -> np.ndarray:
        """(B, S, A) raw chunks at self.sr -> (B, S, hidden) f32."""
        from scipy.signal import resample_poly
        b, s, a = audio.shape
        assert a == self.audio_samples, (a, self.audio_samples)
        flat = audio.reshape(b * s, a).astype(np.float32)
        w16 = resample_poly(flat, self._up, self._down, axis=1)
        w16 = w16.astype(np.float32)
        mu = w16.mean(axis=1, keepdims=True)
        sd = w16.std(axis=1, keepdims=True)
        w16 = (w16 - mu) / (sd + 1e-7)
        out = np.asarray(self._fn(self._params, w16), np.float32)
        return out.reshape(b, s, -1)

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "WavLMFrontend":
        from jmt_tpu.data.wavlm_extract import load_torch_checkpoint
        params, cfg = load_torch_checkpoint(path)
        return cls(params, cfg, **kw)


class InferenceServer:
    """AOT-compiled fixed-bucket batched inference on one model state."""

    def __init__(self, model, params, batch_stats,
                 seq: int = 16, buckets: Sequence[int] = (1, 8),
                 img_size: int = 112, audio_samples: Optional[int] = None,
                 use_wavlm: Optional[bool] = None,
                 wavlm_frontend: Optional[WavLMFrontend] = None,
                 model_mesh=None, int8=False, int8_scales=None):
        from jmt_tpu.ops.mel import AUDIO_SAMPLES
        self.model = model
        # int8: False | True (dynamic per-call activation scales, measured
        # ~neutral on v5e) | "static" (calibrated per-conv scales baked in
        # as constants — measured +20% over bf16; requires int8_scales or a
        # later .calibrate() on a representative request)
        self.int8 = int8
        self.int8_scales = (list(int8_scales) if int8_scales is not None
                            else None)
        if int8 == "static" and self.int8_scales is None:
            raise ValueError(
                "int8='static' needs int8_scales — pass scales from "
                "train.loops.make_calibration_step, or construct with "
                "int8=True and call .calibrate(clips, audio[, wavlm]) on "
                "a representative request")
        self.seq = seq
        self.img = img_size
        self.audio_samples = audio_samples or AUDIO_SAMPLES
        self.use_wavlm = ("wavLM" in model.audio_backbones
                          if use_wavlm is None else use_wavlm)
        self.wavlm_frontend = wavlm_frontend
        self.wavlm_dim = (wavlm_frontend.cfg.hidden_size
                          if wavlm_frontend is not None else 768)
        self.buckets = sorted(set(int(b) for b in buckets))
        # tensor-parallel serving (parallel/tp.py): channel axes of the
        # param tree sharded over the 'model' mesh; inputs replicated.
        # Data parallelism scales throughput, TP shrinks PER-REQUEST
        # latency — the bucket-1 lever on a multi-chip serving host.
        self.model_mesh = model_mesh
        if model_mesh is not None:
            from jmt_tpu.parallel.tp import shard_params
            self.variables = {
                "params": shard_params(params, model_mesh),
                "batch_stats": shard_params(batch_stats, model_mesh),
            }
        else:
            self.variables = {
                "params": jax.device_put(params),
                "batch_stats": jax.device_put(batch_stats),
            }
        self._compiled: Dict[int, object] = {}
        for b in self.buckets:
            self._compiled[b] = self._compile(b)

    # ------------------------------------------------------------------
    def _example(self, b: int):
        arrays = {
            "clips": jnp.zeros((b, self.seq, 8, self.img, self.img, 3),
                               jnp.uint8),
            "audio": jnp.zeros((b, self.seq, self.audio_samples),
                               jnp.float32),
        }
        if self.use_wavlm:
            arrays["wavlm"] = jnp.zeros((b, self.seq, self.wavlm_dim),
                                        jnp.float32)
        if self.model_mesh is not None:
            from jmt_tpu.parallel.tp import replicate
            arrays = replicate(arrays, self.model_mesh)
        return arrays

    def _compile(self, b: int):
        from jmt_tpu.train.loops import _preprocess
        from jmt_tpu.ops import quant

        def fwd(variables, arrays):
            # int8 serving (ops/quant.py): eligible backbone convs on the
            # s8 MXU path — the context is active during .lower()'s trace
            with quant.int8_inference(
                    bool(self.int8),
                    act_scales=(self.int8_scales
                                if self.int8 == "static" else None)):
                spec, clips = _preprocess(self.model, arrays, None,
                                          augment=False)
                return self.model.apply(variables, spec, clips,
                                        arrays.get("wavlm"), train=False)

        return (jax.jit(fwd)
                .lower(self.variables, self._example(b))
                .compile())

    def calibrate(self, clips: np.ndarray, audio: np.ndarray,
                  wavlm: Optional[np.ndarray] = None):
        """Measure per-conv activation scales on a representative request,
        switch to static-int8 mode, and recompile the buckets (measured
        +20% over bf16 on v5e where dynamic int8 was neutral — bench.py).
        Values beyond a calibrated range clip, so calibrate on data that
        covers the serving distribution. Returns the scales (persist and
        pass as int8_scales to skip recalibration)."""
        from jmt_tpu.train.loops import _preprocess
        from jmt_tpu.ops import quant

        arrays = {"clips": np.asarray(clips),
                  "audio": np.asarray(audio, np.float32)}
        if self.use_wavlm:
            if wavlm is None and self.wavlm_frontend is not None:
                arrays["wavlm"] = self.wavlm_frontend.features(
                    arrays["audio"])
            else:
                assert wavlm is not None, "model has a wavLM path"
                arrays["wavlm"] = np.asarray(wavlm, np.float32)
        if self.model_mesh is not None:
            from jmt_tpu.parallel.tp import replicate
            arrays = replicate(arrays, self.model_mesh)

        def calib(variables, arrays):
            coll: list = []
            with quant.int8_calibration(coll):
                spec, c = _preprocess(self.model, arrays, None,
                                      augment=False)
                self.model.apply(variables, spec, c, arrays.get("wavlm"),
                                 train=False)
            return (jnp.stack(coll) if coll
                    else jnp.zeros((0,), jnp.float32))

        maxes = np.asarray(jax.jit(calib)(self.variables, arrays))
        self.int8_scales = quant.act_scales_from_maxes(maxes)
        self.int8 = "static"
        self._compiled = {b: self._compile(b) for b in self.buckets}
        return self.int8_scales

    # ------------------------------------------------------------------
    def predict(self, clips: np.ndarray, audio: np.ndarray,
                wavlm: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
        """clips (B,S,8,H,W,3) uint8, audio (B,S,A) f32, wavlm (B,S,768).
        Pads B up to the smallest compiled bucket; splits oversize requests
        into max-bucket chunks. Returns (vouts, aouts) as (B,S) float32."""
        n = clips.shape[0]
        top = self.buckets[-1]
        if n > top:
            parts = [self.predict(clips[i:i + top], audio[i:i + top],
                                  None if wavlm is None
                                  else wavlm[i:i + top])
                     for i in range(0, n, top)]
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        b = next(x for x in self.buckets if x >= n)

        def pad(x):
            if x.shape[0] == b:
                return x
            return np.concatenate(
                [x, np.zeros((b - x.shape[0],) + x.shape[1:], x.dtype)])

        arrays = {"clips": pad(np.asarray(clips)),
                  "audio": pad(np.asarray(audio, np.float32))}
        if self.use_wavlm:
            if wavlm is None and self.wavlm_frontend is not None:
                # self-contained raw-audio serving: compute the wavLM
                # features on-device from the request's audio chunks
                # (on the PADDED batch -> one frontend compile per bucket)
                arrays["wavlm"] = self.wavlm_frontend.features(
                    arrays["audio"])
            else:
                assert wavlm is not None, \
                    "model was built with a wavLM path"
                arrays["wavlm"] = pad(np.asarray(wavlm, np.float32))
        if self.model_mesh is not None:
            from jmt_tpu.parallel.tp import replicate
            arrays = replicate(arrays, self.model_mesh)
        v, a = self._compiled[b](self.variables, arrays)
        return (np.asarray(v, np.float32)[:n], np.asarray(a, np.float32)[:n])

    # ------------------------------------------------------------------
    @classmethod
    def from_experiment(cls, exp_dir: str, buckets: Sequence[int] = (1, 8),
                        weights: str = "auto",
                        wavlm_frontend: Optional["WavLMFrontend"] = None,
                        model_mesh=None, int8=False, int8_scales=None
                        ) -> "InferenceServer":
        """Build from a finished training run: final_config.yml + the BEST
        per-component weights (or the final train_state)."""
        import os
        from jmt_tpu.core.config import Config
        from jmt_tpu.train.runner import Runner
        from jmt_tpu.core import checkpoint as ckpt
        from jmt_tpu.data.synthetic import synthetic_dataset

        cfg = Config.from_file(os.path.join(exp_dir, "final_config.yml"))
        cfg.Mode = "Eval"
        cfg.mesh_data_parallel = 1
        train = synthetic_dataset("train", n_videos=1, length=481,
                                  stride=481, check_coverage=False)
        runner = Runner(cfg, train, None)
        runner.initialize()
        wdir = os.path.join(exp_dir, "SavedWeights")
        import glob
        has_components = any(
            not p.endswith(ckpt.STATE_FILE)
            for p in glob.glob(os.path.join(wdir, "*.msgpack"))
            + glob.glob(os.path.join(wdir, "*.pt")))
        if weights == "components" or (weights == "auto" and has_components):
            runner.load_components(wdir)
        else:
            runner.state = ckpt.restore_train_state(wdir, runner.state)
        return cls(runner.model, runner.state.params(),
                   runner.state.batch_stats, buckets=buckets,
                   wavlm_frontend=wavlm_frontend, model_mesh=model_mesh,
                   int8=int8, int8_scales=int8_scales)


class StreamingSession:
    """Online per-video inference: the serving-side equivalent of the
    offline validate()/Test() tail (reference val.py:313-370, test.py:
    300-349), but incremental — eval windows stream in (in dataset order,
    the same contract the reference enforces at val.py:320-325), each
    window batch runs through the AOT-compiled server immediately, and a
    video's stitched + clipped + smoothed V/A trace is available the moment
    its last window arrives. Nothing recompiles at request time.

    Usage:
        sess = StreamingSession(server)
        for arrays, anchors, videos, lengths in window_stream:
            sess.feed(arrays["clips"], arrays["audio"], arrays.get("wavlm"),
                      anchors, videos, lengths)
        v_trace, a_trace = sess.finish_video(video_id)
        # or sess.finish_all() -> {vid: (v, a)}
    """

    def __init__(self, server: InferenceServer,
                 v_smooth: int = 20, a_smooth: int = 50):
        from jmt_tpu.eval.stitch import Stitcher
        self.server = server
        self.stitcher = Stitcher(with_labels=False)
        self.v_smooth = v_smooth
        self.a_smooth = a_smooth

    def feed(self, clips: np.ndarray, audio: np.ndarray,
             wavlm: Optional[np.ndarray], anchors: np.ndarray,
             videos: Sequence[str], lengths: Sequence[int]
             ) -> Tuple[np.ndarray, np.ndarray]:
        """Run one batch of eval windows; scatter predictions into the
        per-video traces. Returns the raw (un-smoothed) (B,S) outputs."""
        v, a = self.server.predict(clips, audio, wavlm)
        self.stitcher.add_batch(v, a, np.asarray(anchors),
                                list(videos), list(lengths))
        return v, a

    def finish_video(self, vid: str) -> Tuple[np.ndarray, np.ndarray]:
        """Clip to [-1,1] + uniform smoothing (val.py:359-370) for one
        completed video. Raises if the video's last window has not been
        fed yet (otherwise unseen frames would silently read as zeros)."""
        from jmt_tpu.ops.smoothing import uniform_filter1d
        if vid not in self.stitcher.pred_v:
            raise KeyError(f"unknown video {vid!r}: no windows fed yet")
        if not self.stitcher.is_complete(vid):
            raise ValueError(
                f"video {vid!r} is incomplete: frames beyond anchor "
                f"{self.stitcher._max_anchor.get(vid, 0)} of "
                f"{self.stitcher.lengths.get(vid)} not yet fed — feed the "
                f"remaining windows before finish_video")
        cv = np.clip(self.stitcher.pred_v[vid], -1.0, 1.0)
        ca = np.clip(self.stitcher.pred_a[vid], -1.0, 1.0)
        return (np.asarray(uniform_filter1d(jnp.asarray(cv),
                                            self.v_smooth)),
                np.asarray(uniform_filter1d(jnp.asarray(ca),
                                            self.a_smooth)))

    def finish_all(self) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        return {vid: self.finish_video(vid)
                for vid in self.stitcher.pred_v}

    def write_challenge(self, dir_out: str) -> Sequence[str]:
        """Challenge-format txt files for every streamed video
        (test.py:322-349 format parity via eval.stitch)."""
        from jmt_tpu.eval.stitch import write_challenge_txt
        return write_challenge_txt(self.stitcher, dir_out)


def measure_latency(server: InferenceServer, bucket: int,
                    iters: int = 16, warmup: int = 2,
                    device_input: bool = False) -> Dict[str, float]:
    """p50/p90 request latency per bucket. True device sync via a scalar
    fetch (on the axon relay, block_until_ready returns early).

    device_input=True pre-stages the request tensors on the device and
    times ONLY compiled-graph execution + the result fetch — the true
    chip-side serving number. The default times the full predict() path
    including host->device transfer; through the axon RPC relay that
    transfer dominates (~50 MB/s tunnel), so report BOTH: a production TPU
    host pays ~PCIe (tens of ms for the large buckets), not relay, H2D."""
    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, (bucket, server.seq, 8, server.img,
                                  server.img, 3), dtype=np.uint8)
    audio = (rng.normal(size=(bucket, server.seq, server.audio_samples))
             * 0.1).astype(np.float32)
    # with a WavLMFrontend attached, measure the RAW-AUDIO path (the
    # frontend computes features per request); otherwise synthesize
    # precomputed features of the server's configured dim
    wavlm = (None if server.wavlm_frontend is not None else
             rng.normal(size=(bucket, server.seq, server.wavlm_dim))
             .astype(np.float32)) if server.use_wavlm else None
    if device_input:
        arrays = {"clips": clips, "audio": audio}
        if server.use_wavlm:
            if wavlm is None:  # frontend server: pre-stage its features
                wavlm = server.wavlm_frontend.features(audio)
            arrays["wavlm"] = wavlm
        if server.model_mesh is not None:
            from jmt_tpu.parallel.tp import replicate
            dev = replicate(arrays, server.model_mesh)
        else:
            dev = jax.device_put(arrays)
        fn = server._compiled[bucket]

        def request():
            v, _ = fn(server.variables, dev)
            float(v.sum())  # device->host scalar: the only true barrier
    else:
        def request():
            v, _ = server.predict(clips, audio, wavlm)  # np.asarray = sync
            float(v.sum())
    for _ in range(warmup):
        request()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        request()
        times.append(time.perf_counter() - t0)
    times.sort()
    clips_per_req = bucket * server.seq
    return {
        "bucket": bucket,
        "device_input": device_input,
        "p50_ms": times[len(times) // 2] * 1e3,
        "p90_ms": times[int(len(times) * 0.9)] * 1e3,
        "p50_ms_per_clip": times[len(times) // 2] * 1e3 / clips_per_req,
        "clips_per_s": clips_per_req / times[len(times) // 2],
    }


def _selftest_model(heavy: bool):
    """light = R2D1+ResNet18 only; heavy = the full flagship
    (R2D1+I3D / ResNet18+wavLM with intra-modal transformer fusion)."""
    from jmt_tpu.models.jmt_model import JMTModel
    return JMTModel(
        vision_backbones=("R2D1", "I3D") if heavy else ("R2D1",),
        audio_backbones=("ResNet18", "wavLM") if heavy else ("ResNet18",),
        intra_modal_fusion=("encoder_plus_self_attention" if heavy
                            else "None"),
        joint_modalities="TRANSFORMER", output_format="SELF_ATTEN",
        dtype=jnp.bfloat16)


def _selftest(buckets=(1, 8), heavy=False, int8=False) -> Dict:
    """Synthetic-weights self-test: AOT-compile + latency per bucket."""
    import __main__  # noqa: F401
    from jmt_tpu.train.loops import _preprocess

    model = _selftest_model(heavy)
    rng = np.random.default_rng(0)
    arrays = {
        "clips": rng.integers(0, 255, (1, 16, 8, 112, 112, 3),
                              dtype=np.uint8),
        "audio": (rng.normal(size=(1, 16, 45599)) * .1).astype(np.float32),
    }
    if "wavLM" in model.audio_backbones:
        arrays["wavlm"] = rng.normal(size=(1, 16, 768)).astype(np.float32)
    spec, clips = _preprocess(model, arrays, None, augment=False)
    variables = model.init(jax.random.PRNGKey(0), spec, clips,
                           arrays.get("wavlm"))
    server = InferenceServer(model, variables["params"],
                             variables.get("batch_stats", {}),
                             buckets=buckets, int8=bool(int8))
    if int8 == "static":
        server.calibrate(arrays["clips"], arrays["audio"],
                         arrays.get("wavlm"))
    out = {"buckets": {}}
    for b in buckets:
        out["buckets"][str(b)] = {
            "relay": measure_latency(server, b),
            "device_resident": measure_latency(server, b,
                                               device_input=True)}
    return out


if __name__ == "__main__":
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--exp-dir", default=None)
    p.add_argument("--compilation-cache", default=None,
                   help="persistent XLA compilation cache dir (default: "
                        "$JMT_COMPILATION_CACHE_DIR) — serving cold-starts "
                        "skip the AOT bucket recompiles")
    p.add_argument("--buckets", default="1,8")
    p.add_argument("--heavy", action="store_true",
                   help="self-test with the full flagship model")
    p.add_argument("--wavlm-checkpoint", default=None,
                   help="torch WavLM state dict: serve raw audio by "
                        "computing wavLM features server-side "
                        "(WavLMFrontend)")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel serving over N devices "
                        "(parallel/tp.py; shrinks per-request latency)")
    p.add_argument("--int8", action="store_true",
                   help="int8 inference, dynamic activation scales "
                        "(ops/quant.py; accuracy bound in "
                        "tests/test_quant.py + STATUS.md)")
    p.add_argument("--int8-static", action="store_true",
                   help="int8 with calibrated static activation scales "
                        "(+20%% over bf16 on v5e; calibrates on a "
                        "synthetic request here — production should "
                        "server.calibrate() on real data)")
    args = p.parse_args()
    from jmt_tpu.core.compcache import enable_compilation_cache
    enable_compilation_cache(args.compilation_cache)
    buckets = tuple(int(x) for x in args.buckets.split(","))
    if args.exp_dir:
        # frontend FIRST: the server AOT-compiles its buckets with the
        # frontend's feature dim at construction, and measure_latency
        # exercises the raw-audio path when a frontend is attached
        frontend = (WavLMFrontend.from_checkpoint(args.wavlm_checkpoint)
                    if args.wavlm_checkpoint else None)
        mesh = None
        if args.tp:
            from jmt_tpu.parallel.tp import make_model_mesh
            mesh = make_model_mesh(args.tp)
        server = InferenceServer.from_experiment(
            args.exp_dir, buckets=buckets, wavlm_frontend=frontend,
            model_mesh=mesh, int8=args.int8 or args.int8_static)
        if args.int8_static:
            rng = np.random.default_rng(0)
            server.calibrate(
                rng.integers(0, 255, (1, server.seq, 8, server.img,
                                      server.img, 3), dtype=np.uint8),
                (rng.normal(size=(1, server.seq, server.audio_samples))
                 * .1).astype(np.float32),
                None if server.wavlm_frontend is not None or
                not server.use_wavlm else
                rng.normal(size=(1, server.seq, server.wavlm_dim)
                           ).astype(np.float32))
        stats = {"buckets": {str(b): {
            "relay": measure_latency(server, b),
            "device_resident": measure_latency(server, b,
                                               device_input=True)}
            for b in buckets}}
    else:
        if args.wavlm_checkpoint or args.tp:
            import sys
            print("warning: --wavlm-checkpoint/--tp apply only with "
                  "--exp-dir (the synthetic self-test ignores them)",
                  file=sys.stderr)
        stats = _selftest(buckets, heavy=args.heavy,
                          int8=("static" if args.int8_static
                                else args.int8))
    print(json.dumps(stats))
