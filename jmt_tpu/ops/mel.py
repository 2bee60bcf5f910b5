"""Log-mel spectrogram — fused, jitted audio front-end.

Capability target: the reference's per-wav CPU DSP chain
(dataset_new.py:346-358 + clip_transforms.py:407-419):

    torchaudio.MelSpectrogram(sample_rate=44100, win_length=882,
        hop_length=441, n_mels=64, n_fft=1024, hann window, power=2)
    -> AmplitudeToDB('power', top_db=80)
    -> Normalize(mean=-14.8, std=19.895)

Semantics replicated exactly:
* STFT center=True with REFLECT padding of n_fft//2, hann(periodic) window of
  win_length zero-padded symmetrically to n_fft, one-sided spectrum, |X|^2.
* HTK mel filterbank (norm=None, f_min=0, f_max=sr/2), the torchaudio
  default: mel = 2595 log10(1 + f/700).
* AmplitudeToDB: 10 log10(clamp(x, 1e-10)), then floor at (max - top_db)
  where max is taken over the WHOLE per-wav tensor (torchaudio 0.9
  behavior; the reference invokes it per clip, so per-clip max here).

TPU-native design: the reference computes this per-wav inside DataLoader
worker processes (16 FFTs per sample on CPU, SURVEY.md §3.4 — the dominant
throughput constraint). Here the whole batch of fixed-length (45,599-sample)
clips is one jitted device computation: framing as a gather, batched rfft,
one (n_freq x n_mels) GEMM onto the MXU, fused dB + normalize elementwise.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

SAMPLE_RATE = 44100
N_FFT = 1024
WIN_LENGTH = 882
HOP_LENGTH = 441
N_MELS = 64
AUDIO_SAMPLES = 45599  # fixed left-padded wav length (dataset_new.py:305-308)
SPEC_FRAMES = 1 + AUDIO_SAMPLES // HOP_LENGTH  # = 104
SPEC_MEAN = -14.8
SPEC_STD = 19.895


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(n_freqs: int = N_FFT // 2 + 1, n_mels: int = N_MELS,
                   sample_rate: int = SAMPLE_RATE, f_min: float = 0.0,
                   f_max: Optional[float] = None) -> np.ndarray:
    """HTK-scale triangular filterbank (n_freqs, n_mels), norm=None —
    torchaudio melscale_fbanks defaults."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]                  # rising edge
    up = slopes[:, 2:] / f_diff[1:]                       # falling edge
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _padded_hann(win_length: int = WIN_LENGTH,
                 n_fft: int = N_FFT) -> np.ndarray:
    # torch.hann_window(periodic=True)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    lpad = (n_fft - win_length) // 2
    out = np.zeros(n_fft)
    out[lpad:lpad + win_length] = w
    return out.astype(np.float32)


def _frame(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(..., L) zero-centered framing with reflect pad -> (..., T, n_fft)."""
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (xp.shape[-1] - n_fft) // hop
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n_fft)[None, :])  # (T, n_fft), static
    return xp[..., idx]


def mel_spectrogram(audio: jnp.ndarray, power: float = 2.0) -> jnp.ndarray:
    """audio: (..., L) float in [-1, 1] -> mel power spectrogram
    (..., n_mels, T)."""
    frames = _frame(audio, N_FFT, HOP_LENGTH)
    window = jnp.asarray(_padded_hann())
    spec = jnp.fft.rfft(frames * window, axis=-1)          # (..., T, 513)
    p = jnp.abs(spec) ** power
    fb = jnp.asarray(mel_filterbank())                      # (513, 64)
    mel = jnp.einsum("...tf,fm->...tm", p.astype(jnp.float32), fb,
                     preferred_element_type=jnp.float32)
    return jnp.swapaxes(mel, -1, -2)                        # (..., 64, T)


def amplitude_to_db(x: jnp.ndarray, top_db: float = 80.0,
                    amin: float = 1e-10,
                    per_item_axes: Optional[int] = None) -> jnp.ndarray:
    """torchaudio AmplitudeToDB('power', top_db).

    per_item_axes: number of LEADING batch axes; the top_db floor uses the
    max over the remaining (per-item) axes — the reference applies the op
    per wav (clip_transforms.py:407-419), so batched callers pass the number
    of batch dims to preserve per-wav semantics. None = global max.
    """
    db = 10.0 * jnp.log10(jnp.maximum(x, amin))
    if per_item_axes is None:
        floor = jnp.max(db) - top_db
    else:
        axes = tuple(range(per_item_axes, db.ndim))
        floor = jnp.max(db, axis=axes, keepdims=True) - top_db
    return jnp.maximum(db, floor)


@functools.partial(jax.jit, static_argnames=("batch_dims",))
def log_mel_batch(audio: jnp.ndarray, batch_dims: int = 1) -> jnp.ndarray:
    """Full fused front-end for a batch of fixed-length wavs.

    audio: (*batch, 45599) -> normalized log-mel (*batch, 64, 104),
    matching the reference chain per wav.
    """
    mel = mel_spectrogram(audio)
    db = amplitude_to_db(mel, per_item_axes=batch_dims)
    return (db - SPEC_MEAN) / SPEC_STD


def log_mel(audio: jnp.ndarray, batch_dims: int = 1) -> jnp.ndarray:
    """Dispatching front-end: the fused Pallas kernel on TPU
    (ops/pallas/melspec.py), the XLA rfft path elsewhere. fp32-identical.
    Set JMT_TPU_NO_PALLAS=1 to force XLA."""
    import os
    use_pallas = False
    if os.environ.get("JMT_TPU_NO_PALLAS") != "1":
        try:
            use_pallas = (jax.default_backend() == "tpu"
                          and audio.shape[-1] == AUDIO_SAMPLES)
        except Exception:
            use_pallas = False
    if not use_pallas:
        return log_mel_batch(audio, batch_dims=batch_dims)
    from jmt_tpu.ops.pallas.melspec import log_mel_pallas
    lead = audio.shape[:-1]
    flat = audio.reshape(-1, audio.shape[-1])
    out = log_mel_pallas(flat)
    return out.reshape(*lead, N_MELS, SPEC_FRAMES)


def pad_audio(audio: np.ndarray, length: int = AUDIO_SAMPLES) -> np.ndarray:
    """LEFT-zero-pad to fixed length (dataset_new.py:305-308); longer clips
    are kept (the reference only pads when <= 45599)."""
    if audio.shape[-1] >= length:
        return audio
    out = np.zeros((*audio.shape[:-1], length), dtype=audio.dtype)
    out[..., -audio.shape[-1]:] = audio
    return out
