"""Log-mel front-end parity vs an independent numpy implementation of the
torchaudio algorithm (torchaudio itself is unavailable in this env; the
numpy golden follows the documented MelSpectrogram/AmplitudeToDB semantics
used by the reference, dataset_new.py:346-358, clip_transforms.py:407-419).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from jmt_tpu.ops import mel as M


def numpy_stft_power(x, n_fft=1024, hop=441, win_length=882):
    # center=True reflect pad, hann periodic padded to n_fft
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    w = 0.5 * (1 - np.cos(2 * np.pi * np.arange(win_length) / win_length))
    wfull = np.zeros(n_fft)
    lp = (n_fft - win_length) // 2
    wfull[lp:lp + win_length] = w
    n_frames = 1 + (len(xp) - n_fft) // hop
    out = np.empty((n_fft // 2 + 1, n_frames))
    for t in range(n_frames):
        seg = xp[t * hop:t * hop + n_fft] * wfull
        out[:, t] = np.abs(np.fft.rfft(seg)) ** 2
    return out


def numpy_mel_fb(n_freqs=513, n_mels=64, sr=44100):
    def h2m(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def m2h(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    freqs = np.linspace(0, sr // 2, n_freqs)
    mpts = np.linspace(h2m(0.0), h2m(sr / 2.0), n_mels + 2)
    fpts = m2h(mpts)
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, c, hi = fpts[m], fpts[m + 1], fpts[m + 2]
        up = (freqs - lo) / (c - lo)
        down = (hi - freqs) / (hi - c)
        fb[:, m] = np.maximum(0, np.minimum(up, down))
    return fb


def numpy_golden(x):
    p = numpy_stft_power(x)                      # (513, T)
    mel = numpy_mel_fb().T @ p                   # (64, T)
    db = 10 * np.log10(np.maximum(mel, 1e-10))
    db = np.maximum(db, db.max() - 80.0)
    return (db - (-14.8)) / 19.895


def make_wav(n=45599, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100.0
    x = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * np.sin(2 * np.pi * 1234.5 * t)
         + 0.02 * rng.normal(size=n))
    return x.astype(np.float32)


def test_spec_frame_count():
    x = make_wav()
    out = M.log_mel_batch(jnp.asarray(x[None]))
    assert out.shape == (1, 64, 104), out.shape  # the fixed-width bucket


def test_log_mel_matches_numpy_golden():
    x = make_wav()
    got = np.asarray(M.log_mel_batch(jnp.asarray(x[None])))[0]
    want = numpy_golden(x.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_batched_matches_per_item():
    """top_db floor must be per-wav even in a batch (the reference applies
    AmplitudeToDB per clip)."""
    a = make_wav(seed=1)
    b = (make_wav(seed=2) * 0.001).astype(np.float32)  # very quiet clip
    batch = np.stack([a, b])
    got = np.asarray(M.log_mel_batch(jnp.asarray(batch)))
    for i, x in enumerate((a, b)):
        single = np.asarray(M.log_mel_batch(jnp.asarray(x[None])))[0]
        np.testing.assert_allclose(got[i], single, atol=1e-5)


def test_pad_audio_left_aligned():
    x = np.ones(44100, np.float32)
    p = M.pad_audio(x)
    assert p.shape == (45599,)
    assert p[:1499].sum() == 0 and p[-1] == 1.0
    # longer clips pass through (dataset_new.py only pads when <= 45599)
    y = np.ones(50000, np.float32)
    assert M.pad_audio(y).shape == (50000,)


def test_mel_filterbank_properties():
    fb = M.mel_filterbank()
    assert fb.shape == (513, 64)
    assert (fb >= 0).all()
    # triangles tile the spectrum: every mel bin has positive mass
    assert (fb.sum(axis=0) > 0).all()
