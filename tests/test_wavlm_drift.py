"""Quantify the live-WavLM approximation (VERDICT r3 #5).

serve.WavLMFrontend computes wavLM features from each request's ~1 s chunk
(last WavLM frame = the anchor instant), while training consumed per-frame
features of the FULL track (data/wavlm_extract.WavLMExtractor). This test
measures the drift that approximation causes — at the feature level and at
the STITCHED V/A prediction level through a fusion head — on synthetic
full-track audio, and pins it under a bound so a regression in either path
(extractor windowing, frontend normalization, frame mapping) surfaces.

The measured numbers live in docs/OPERATIONS.md ("Live WavLM
approximation"). Tiny random-init WavLM (no real checkpoint in this image;
the GEOMETRY — windowing, receptive field, chunk truncation — is what is
being measured, and that is config-exact).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_wavlm_extract import _tiny


FPS = 30.0
SR44 = 44100


def _synthetic_track(seconds: float, sr: int, seed: int = 0) -> np.ndarray:
    """Slowly frequency-modulated tone + noise — non-stationary enough that
    features vary along the track (a constant tone would hide misalignment
    entirely)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f = 220.0 + 120.0 * np.sin(2 * np.pi * t / 7.0)
    phase = 2 * np.pi * np.cumsum(f) / sr
    x = 0.3 * np.sin(phase) + 0.03 * rng.normal(size=len(t))
    return x.astype(np.float32)


@pytest.mark.slow
def test_live_vs_offline_wavlm_drift():
    from scipy.signal import resample_poly
    from jmt_tpu.data.wavlm_extract import WavLMExtractor, WAVLM_SR
    from jmt_tpu.serve import WavLMFrontend
    from jmt_tpu.models import TwoTransformers, FcLayer
    from jmt_tpu.ops.ccc import ccc_metric

    _, cfg, params = _tiny()

    seconds = 16.0
    n_frames = int(seconds * FPS)          # 480 video frames
    track44 = _synthetic_track(seconds, SR44)
    track16 = resample_poly(track44, 160, 441).astype(np.float32)

    # ---- offline: full-track per-frame features (training-time path)
    ex = WavLMExtractor(params, cfg, window_s=4.0, overlap_s=0.5)
    offline = ex.per_frame(track16, n_frames, FPS)      # (T, h)

    # ---- live: per-anchor 1 s chunks ending at the anchor instant (the
    # wav files the dataset serves; serving requests carry exactly these)
    audio_samples = SR44                                 # 1 s at 44.1 kHz
    anchors = np.arange(32, n_frames + 1, 32)            # window anchors
    chunks = np.zeros((1, len(anchors), audio_samples), np.float32)
    for j, n in enumerate(anchors):
        end = int(round(n / FPS * SR44))
        lo = max(0, end - audio_samples)
        c = track44[lo:end]
        chunks[0, j, audio_samples - len(c):] = c
    fe = WavLMFrontend(params, cfg, sample_rate=SR44,
                       audio_samples=audio_samples)
    live = fe.features(chunks)[0]                        # (S, h)
    off_anchor = offline[anchors - 1]                    # same instants

    # ---- feature-level drift
    cos = np.sum(live * off_anchor, axis=1) / (
        np.linalg.norm(live, axis=1) * np.linalg.norm(off_anchor, axis=1)
        + 1e-9)
    feat_rel = np.linalg.norm(live - off_anchor, axis=1) / (
        np.linalg.norm(off_anchor, axis=1) + 1e-9)

    # ---- prediction-level drift through a fusion head: identical vision
    # tokens, audio = fc(wavlm); any output delta is the approximation's
    S = len(anchors)
    fc = FcLayer(output_dim=512)
    fusion = TwoTransformers(num_heads=1, num_layers=1,
                             joint_modalities="TRANSFORMER",
                             output_format="SELF_ATTEN")
    rng = np.random.default_rng(1)
    vis = jnp.asarray(rng.normal(size=(1, S, 512)), jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    fc_p = fc.init(k1, jnp.zeros((1, S, cfg.hidden_size)))
    fu_p = fusion.init(k2, jnp.zeros((1, S, 512)), vis)

    def predict(feats):
        aud = fc.apply(fc_p, jnp.asarray(feats[None]))
        v, a = fusion.apply(fu_p, aud, vis)
        return np.asarray(v[0]), np.asarray(a[0])

    v_off, a_off = predict(off_anchor)
    v_live, a_live = predict(live)
    dv = np.abs(v_live - v_off)
    da = np.abs(a_live - a_off)
    ccc_v = float(ccc_metric(jnp.asarray(v_live), jnp.asarray(v_off)))
    ccc_a = float(ccc_metric(jnp.asarray(a_live), jnp.asarray(a_off)))

    print({"feat_cos_mean": float(cos.mean()),
           "feat_cos_min": float(cos.min()),
           "feat_relerr_mean": float(feat_rel.mean()),
           "pred_delta_v_max": float(dv.max()),
           "pred_delta_a_max": float(da.max()),
           "pred_ccc_v": ccc_v, "pred_ccc_a": ccc_a})

    # bounds: the live features must stay RECOGNIZABLY the same instant's
    # features (not a misaligned/garbage read) and the downstream stitched
    # predictions must track the offline ones closely. These are measured
    # envelopes (see OPERATIONS.md), not parity — the approximation is
    # real and documented.
    assert cos.mean() > 0.95, cos
    assert cos.min() > 0.80, cos
    assert dv.max() < 0.15 and da.max() < 0.15, (dv.max(), da.max())
    assert ccc_v > 0.9 and ccc_a > 0.9, (ccc_v, ccc_a)
