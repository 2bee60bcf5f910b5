"""Quantify the live-WavLM approximation (VERDICT r3 #5).

serve.WavLMFrontend computes wavLM features from each request's ~1 s chunk
(last WavLM frame = the anchor instant), while training consumed per-frame
features of the FULL track (data/wavlm_extract.WavLMExtractor). This test
measures the drift that approximation causes — at the feature level and at
the STITCHED V/A prediction level through a fusion head — on synthetic
full-track audio, and pins it under a bound so a regression in either path
(extractor windowing, frontend normalization, frame mapping) surfaces.

What can honestly be pinned with a RANDOM-INIT tiny WavLM (no real
checkpoint in this zero-egress image) — established by two measured
controls, not assumed:
  * offline features are WINDOW-LENGTH-INDEPENDENT: re-extracting with
    2 s windows instead of 4 s reproduces the same per-frame features
    (cos ~0.9999) — the fixed-grid windowing/mapping machinery adds no
    drift of its own;
  * a random-init WavLM's per-frame features decorrelate between
    ADJACENT 33 ms video frames (lag-1 autocorrelation ~0.39) — so any
    absolute live-vs-offline cosine is bounded by that temporal
    granularity, and the meaningful alignment claim is RELATIVE: the
    live chunk's last-frame feature must match its target instant
    BETTER than the neighboring frame's feature does (measured 0.49 vs
    the 0.39 baseline = sub-frame alignment accuracy; an off-by-a-frame
    bug would drop it to/below the baseline).
The absolute claim lives at the prediction level: V/A through a fusion
head moves < 0.15 on the [-1, 1] output scale (measured max ~0.04).
With a TRAINED checkpoint (stable features, smooth in time) the
feature-level agreement is expected to be far higher; deployments should
re-run this harness with their real checkpoint. Measured numbers:
docs/OPERATIONS.md ("Live WavLM approximation").
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

    # ---- control: the SAME offline machinery with 2 s windows — pure
    # context-length sensitivity of this (random-init) WavLM, zero
    # serving-side approximation involved
    ex2 = WavLMExtractor(params, cfg, window_s=2.0, overlap_s=0.5)
    offline2 = ex2.per_frame(track16, n_frames, FPS)

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

    # ---- feature-level drift (+ the context-change control at the same
    # anchor instants)
    def _cos(a, b):
        return np.sum(a * b, axis=1) / (
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-9)

    cos = _cos(live, off_anchor)
    cos_ctrl = _cos(offline2[anchors - 1], off_anchor)
    # temporal granularity baseline: how similar are this model's features
    # one video frame apart? (the ceiling any alignment comparison has)
    cos_lag1 = _cos(offline[1:], offline[:-1])
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
           "window_ctrl_cos_mean": float(cos_ctrl.mean()),
           "lag1_autocorr_mean": float(cos_lag1.mean()),
           "feat_relerr_mean": float(feat_rel.mean()),
           "pred_delta_v_max": float(dv.max()),
           "pred_delta_a_max": float(da.max()),
           "pred_ccc_v": ccc_v, "pred_ccc_a": ccc_a})

    # bounds (measured envelopes, OPERATIONS.md; rationale in the module
    # docstring):
    # 1. the offline mapping machinery is window-length-independent
    assert cos_ctrl.mean() > 0.95, cos_ctrl.mean()
    # 2. live alignment beats the one-frame-off temporal baseline — an
    #    off-by-a-frame serving bug would drop cos to/below lag-1
    assert np.isfinite(live).all() and np.linalg.norm(live, axis=1).min() > 0
    assert cos.mean() > cos_lag1.mean() + 0.05, (cos.mean(),
                                                 cos_lag1.mean())
    # 3. prediction-level drift stays small on the [-1, 1] output scale
    assert dv.max() < 0.15 and da.max() < 0.15, (dv.max(), da.max())
