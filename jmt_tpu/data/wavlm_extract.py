"""Offline WavLM feature extraction — closes the reference's external
feature dependency.

The reference consumes precomputed 768-d per-frame WavLM features
(train.py:150-171) but contains no tool that computes them —
create_wavlm_audio_feat.py only reshuffles CSVs produced elsewhere. This
module computes them inside the framework: per-video wav -> resample to
16 kHz -> normalized waveform -> jitted WavLM (models/wavlm.py, static
window buckets) -> one (dim,) .npy per video frame in the exact layout
`WavlmFeatureStore` and `explode_wavlm_features` use:
`{dest}/{video}/{frame_idx}.npy`, frame_idx starting at 1.

WavLM emits one feature every 320 input samples (20 ms at 16 kHz); each
video frame at time (i + 0.5)/fps is assigned the nearest WavLM frame.
Long audio is processed in fixed-size overlapping windows (static shapes
-> one XLA compile per bucket): windows overlap by `overlap_s` on each
side and only the interior is kept, so every emitted feature has at
least `overlap_s` of real left context (WavLM's gated relative position
bias saturates at max_bucket_distance=800 frames = 16 s).

usage:
    python -m jmt_tpu.data.wavlm_extract --checkpoint wavlm.pt \
        --wav-dir /data/audio --dest /data/wavlm_feats --fps 30
checkpoint = a torch state-dict file of an HF WavLMModel (optionally
'wavlm.'-prefixed, e.g. saved from WavLMModel.from_pretrained(...)).
"""
from __future__ import annotations

import argparse
import os
import wave
from typing import Optional, Tuple

import numpy as np

WAVLM_SR = 16000  # WavLM operates on 16 kHz input


def load_wav_any_sr(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """float32 mono (L,) in [-1, 1] plus its sample rate."""
    from jmt_tpu.data.audio_io import load_wav
    data = load_wav(path)
    if data is None:
        return None
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
    return data, sr


def resample_to_16k(data: np.ndarray, sr: int) -> np.ndarray:
    if sr == WAVLM_SR:
        return data
    from math import gcd
    from scipy.signal import resample_poly
    g = gcd(sr, WAVLM_SR)
    return resample_poly(data, WAVLM_SR // g, sr // g).astype(np.float32)


class WavLMExtractor:
    """Compile-once / stream-many WavLM feature extractor."""

    def __init__(self, params, cfg, window_s: float = 20.0,
                 overlap_s: float = 2.0, dtype=None, batch: int = 4):
        import jax
        import jax.numpy as jnp
        from jmt_tpu.models.wavlm import wavlm_apply

        self.cfg = cfg
        self.stride = cfg.frame_stride          # 320 for base configs
        self.receptive = cfg.receptive_field    # 400 for base configs
        # round the window to a whole number of WavLM frames
        self.win_frames = int(window_s * WAVLM_SR) // self.stride
        self.ov_frames = max(1, int(overlap_s * WAVLM_SR) // self.stride)
        assert self.win_frames > 2 * self.ov_frames
        self.win_samples = (self.win_frames - 1) * self.stride \
            + self.receptive
        self.batch = max(1, int(batch))  # windows per device dispatch
        if dtype is not None:
            params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
        self._params = params

        def fn(params, wav):
            x = wav.astype(dtype or jnp.float32)
            return wavlm_apply(params, x, cfg).astype(jnp.float32)

        self._fn = jax.jit(fn)

    def features(self, wav16k: np.ndarray) -> np.ndarray:
        """Full-track features (T, hidden): overlapped static windows,
        interior-only stitching, `batch` windows per device dispatch.
        wav16k: float32 (L,) at 16 kHz, UN-normalIZED — zero-mean/unit-var
        is applied ONCE over the full track here, exactly like HF's
        Wav2Vec2FeatureExtractor do_normalize on the whole sequence
        (per-window stats would shift with window content and count the
        zero padding of the last window)."""
        wav16k = np.asarray(wav16k, np.float32)
        wav16k = (wav16k - wav16k.mean()) / (wav16k.std() + 1e-7)
        n = len(wav16k)
        total = max(1, (max(0, n - self.receptive) // self.stride) + 1)
        hop = self.win_frames - 2 * self.ov_frames
        # window placements: interior [start, start+hop) kept, shifted
        # left for ov_frames of context (clamped at the track ends)
        plans = []  # (w0, lo, hi) in window-local frame coords
        start_f = 0
        while start_f < total:
            w0 = max(0, start_f - self.ov_frames)
            w0 = min(w0, max(0, total - self.win_frames))
            lo = start_f - w0
            hi = min(lo + hop, total - w0, self.win_frames)
            plans.append((w0, lo, hi))
            start_f = w0 + hi

        out = np.zeros((total, self.cfg.hidden_size), np.float32)
        for i in range(0, len(plans), self.batch):
            part = plans[i:i + self.batch]
            chunks = np.zeros((self.batch, self.win_samples), np.float32)
            for j, (w0, _, _) in enumerate(part):
                s0 = w0 * self.stride
                c = wav16k[s0:s0 + self.win_samples]
                chunks[j, :len(c)] = c
            feats = np.asarray(self._fn(self._params, chunks))
            for j, (w0, lo, hi) in enumerate(part):
                out[w0 + lo:w0 + hi] = feats[j, lo:hi]
        return out

    def per_frame(self, wav16k: np.ndarray, n_frames: int,
                  fps: float) -> np.ndarray:
        """(n_frames, hidden): nearest WavLM frame per video frame.
        WavLM frame k covers samples [k*stride, k*stride + receptive),
        center k*stride + receptive/2 — nearest is by CENTER distance."""
        feats = self.features(wav16k)
        t = (np.arange(n_frames) + 0.5) / fps
        idx = np.clip(np.round(
            (t * WAVLM_SR - self.receptive / 2) / self.stride).astype(int),
            0, len(feats) - 1)
        return feats[idx]


def load_torch_checkpoint(path: str, cfg=None):
    """state-dict file -> (params pytree, WavLMConfig).

    Shapes (dims/kernels/layer+head counts/buckets) are inferred from the
    state dict; conv STRIDES are not recoverable from weights, so they
    default to the base schedule — pass an explicit `cfg` for non-base
    geometries."""
    import torch
    from jmt_tpu.models.wavlm import WavLMConfig, wavlm_params_from_torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    sd = {k[len("wavlm."):] if k.startswith("wavlm.") else k: v
          for k, v in sd.items()}
    if cfg is None:
        n_conv = 1 + max(int(k.split(".")[2]) for k in sd
                         if k.startswith("feature_extractor.conv_layers."))
        n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                           if k.startswith("encoder.layers."))
        hidden = sd["feature_projection.projection.bias"].shape[0]
        inter = sd["encoder.layers.0.feed_forward.intermediate_dense"
                   ".bias"].shape[0]
        heads = sd["encoder.layers.0.attention.gru_rel_pos_const"].numel()
        buckets = sd["encoder.layers.0.attention.rel_attn_embed"
                     ".weight"].shape[0]
        defaults = WavLMConfig()
        assert n_conv == len(defaults.conv_stride), (
            n_conv, "non-base conv stack: pass an explicit cfg")
        dims, kernels = [], []
        for i in range(n_conv):
            w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
            dims.append(w.shape[0])
            kernels.append(w.shape[2])
        cfg = WavLMConfig(
            hidden_size=hidden, num_hidden_layers=n_layers,
            num_attention_heads=heads, intermediate_size=inter,
            conv_dim=tuple(dims), conv_stride=defaults.conv_stride,
            conv_kernel=tuple(kernels), num_buckets=buckets)
    return wavlm_params_from_torch(sd, cfg), cfg


def extract_tree(checkpoint: str, wav_dir: str, dest: str, fps: float,
                 window_s: float = 20.0, overlap_s: float = 2.0,
                 n_frames_for=None, verbose: bool = True,
                 cfg=None) -> int:
    """Every {wav_dir}/{video}.wav -> {dest}/{video}/{n}.npy per frame.

    n_frames_for(video, duration_s) -> frame count; default round(dur*fps)
    (pass the annotation row count for exact Affwild2 alignment)."""
    params, cfg = load_torch_checkpoint(checkpoint, cfg)
    ex = WavLMExtractor(params, cfg, window_s, overlap_s)
    written = 0
    for fname in sorted(os.listdir(wav_dir)):
        if not fname.endswith(".wav"):
            continue
        video = os.path.splitext(fname)[0]
        loaded = load_wav_any_sr(os.path.join(wav_dir, fname))
        if loaded is None:
            continue
        data, sr = loaded
        wav16 = resample_to_16k(data, sr)
        dur = len(data) / sr
        n_frames = (n_frames_for(video, dur) if n_frames_for
                    else int(round(dur * fps)))
        feats = ex.per_frame(wav16, n_frames, fps)
        out_dir = os.path.join(dest, video)
        os.makedirs(out_dir, exist_ok=True)
        for i in range(n_frames):
            np.save(os.path.join(out_dir, f"{i + 1}.npy"), feats[i])
        written += n_frames
        if verbose:
            print(f"{video}: {n_frames} frames", flush=True)
    return written


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--wav-dir", required=True)
    ap.add_argument("--dest", required=True)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--window-s", type=float, default=20.0)
    ap.add_argument("--overlap-s", type=float, default=2.0)
    args = ap.parse_args(argv)
    from jmt_tpu.core.compcache import enable_compilation_cache
    enable_compilation_cache()  # $JMT_COMPILATION_CACHE_DIR, if set
    n = extract_tree(args.checkpoint, args.wav_dir, args.dest, args.fps,
                     args.window_s, args.overlap_s)
    print(f"wrote {n} per-frame features under {args.dest}")


if __name__ == "__main__":
    main()
