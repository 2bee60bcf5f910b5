"""Audio "more augmentation" path (use_more_audio_data_augm), on device.

Capability target: dataset_new.py:312-342 + clip_transforms.py:301-368:
complex STFT -> RandomTimeStretch (torchaudio phase vocoder; p=.6, rate 1.2
or 0.9 with equal odds) -> magnitude -> random time masking (p=.6, width
U[0,80)) -> random frequency masking (p=.6) -> MelScale.

Reference quirks replicated deliberately:
* the augmented branch feeds MAGNITUDE (torch.norm p=2), not power, to
  MelScale (dataset_new.py:332-340);
* it SKIPS AmpToDB+Normalize entirely (compare :358 vs :341) — augmented
  spectrograms reach the audio backbone as raw mel magnitudes.

Static-shape design: torchaudio's stretch changes the frame count
(104 -> 87 or 116); the reference then pads batches dynamically
(padSequence.py). Here every augmented spectrogram lives in a fixed
(64, AUG_FRAMES=128) buffer, content right-aligned with left zeros — the
same alignment the reference's collate produces — with the phase vocoder
evaluated for all samples under a traced per-sample rate (rate 1.0 == exact
identity), so one compiled program covers stretched and unstretched clips.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from jmt_tpu.ops.mel import (HOP_LENGTH, N_FFT, N_MELS,
                             mel_filterbank, _padded_hann, _frame)

N_FREQS = N_FFT // 2 + 1
AUG_FRAMES = 128  # >= ceil(104 / 0.9) = 116


def _complex_stft(audio: jnp.ndarray) -> jnp.ndarray:
    """(N, L) -> complex (N, T=104, F=513)."""
    frames = _frame(audio.astype(jnp.float32), N_FFT, HOP_LENGTH)
    window = jnp.asarray(_padded_hann())
    return jnp.fft.rfft(frames * window, axis=-1)


def phase_vocoder(spec: jnp.ndarray, rate: jnp.ndarray,
                  out_frames: int = AUG_FRAMES) -> jnp.ndarray:
    """torchaudio-style phase vocoder.

    spec: complex (N, T, F); rate: (N,) traced. Returns magnitude-correct
    complex (N, out_frames, F) where frame t' of sample n is valid iff
    t' < ceil(T / rate[n]) (invalid frames are zero).
    """
    n, t, f = spec.shape
    phi_adv = jnp.asarray(
        np.linspace(0, np.pi * HOP_LENGTH, N_FREQS, dtype=np.float32))
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)

    steps = jnp.arange(out_frames, dtype=jnp.float32)  # t'
    # read positions per sample/step
    pos = steps[None, :] * rate[:, None]               # (N, T')
    idx0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    idx1 = jnp.clip(idx0 + 1, 0, t - 1)
    frac = jnp.clip(pos - idx0, 0.0, 1.0)

    take = lambda arr, idx: jnp.take_along_axis(
        arr, idx[:, :, None], axis=1)                  # (N, T', F)
    mag0, mag1 = take(mag, idx0), take(mag, idx1)
    ph0, ph1 = take(phase, idx0), take(phase, idx1)
    out_mag = (1 - frac)[..., None] * mag0 + frac[..., None] * mag1

    # accumulated phase: scan over output steps
    dphi = ph1 - ph0 - phi_adv
    dphi = dphi - 2 * np.pi * jnp.round(dphi / (2 * np.pi))
    step_phase = dphi + phi_adv                        # (N, T', F)

    def acc(carry, x):
        new = carry + x
        return new, carry

    # phase[t'] = angle0[0] + sum_{s<t'} step_phase[s]
    _, prefix = jax.lax.scan(acc, jnp.zeros((n, f)),
                             jnp.moveaxis(step_phase, 1, 0))
    out_phase = ph0[:, 0:1, :] + jnp.moveaxis(prefix, 0, 1)

    valid_len = jnp.ceil(t / rate).astype(jnp.int32)   # (N,)
    valid = steps[None, :] < valid_len[:, None]
    out = out_mag * jnp.exp(1j * out_phase)
    return jnp.where(valid[..., None], out, 0.0), valid_len


def _random_mask(key, length: int, dim: int, param: int, p: float,
                 n: int) -> jnp.ndarray:
    """(N, dim) multiplicative mask along one axis: width ~ U[0, param)
    clipped to dim, start ~ U[0, dim - width] (torchaudio *Masking)."""
    k1, k2, k3 = jax.random.split(key, 3)
    width = jax.random.uniform(k1, (n,)) * param
    width = jnp.minimum(width, dim).astype(jnp.int32)
    start = (jax.random.uniform(k2, (n,))
             * (dim - width + 1)).astype(jnp.int32)
    apply = jax.random.bernoulli(k3, p, (n,))
    pos = jnp.arange(dim)[None, :]
    masked = (pos >= start[:, None]) & (pos < (start + width)[:, None])
    return jnp.where(apply[:, None] & masked, 0.0, 1.0)


@jax.jit
def more_audio_augment(audio: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """audio (N, 45599) -> augmented mel magnitudes (N, 64, AUG_FRAMES),
    content right-aligned (left zero padding, the collate convention)."""
    n = audio.shape[0]
    ks = jax.random.split(key, 4)

    spec = _complex_stft(audio)  # (N, 104, 513)
    # p=.6 stretch; rate 1.2 / 0.9 with equal odds (clip_transforms.py:311-318)
    do = jax.random.bernoulli(ks[0], 0.6, (n,))
    fast = jax.random.bernoulli(ks[1], 0.5, (n,))
    rate = jnp.where(do, jnp.where(fast, 1.2, 0.9), 1.0)
    stretched, valid_len = phase_vocoder(spec, rate)

    mag = jnp.abs(stretched)  # (N, T', 513) — magnitude, NOT power (quirk)
    mag = mag * _random_mask(ks[2], AUG_FRAMES, AUG_FRAMES, 80, 0.6,
                             n)[:, :, None]
    fb = jnp.asarray(mel_filterbank())  # (513, 64)
    mel = jnp.einsum("ntf,fm->nmt", mag, fb)  # (N, 64, T')
    mel = mel * _random_mask(ks[3], N_MELS, N_MELS, 80, 0.6, n)[:, :, None]

    # right-align content: roll each row so frame valid_len-1 lands at the
    # buffer end
    shift = AUG_FRAMES - valid_len  # (N,)
    t_idx = jnp.arange(AUG_FRAMES)[None, :]
    src = t_idx - shift[:, None]
    gather = jnp.clip(src, 0, AUG_FRAMES - 1)
    out = jnp.take_along_axis(mel, gather[:, None, :].repeat(N_MELS, 1),
                              axis=2)
    return jnp.where((src >= 0)[:, None, :], out, 0.0)
