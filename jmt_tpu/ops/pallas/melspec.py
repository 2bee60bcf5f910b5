"""Pallas TPU kernel: fused log-mel spectrogram front-end.

Per batch row: Hann windowing folded into the DFT, the 1024-point real DFT
as TWO MXU matmuls against precomputed cos/sin matrices (the TPU has no FFT
unit — a (104,1024)x(1024,513) GEMM pair IS the fast path to the spectrum),
power, mel filterbank GEMM, per-wav dB floor and normalization — one VMEM
pass, no HBM roundtrips between stages.

Frame extraction (strided slices at hop 441) happens OUTSIDE the kernel as
an XLA gather: Mosaic vector loads need 128-aligned offsets and the hop is
441, so in-kernel framing cannot lower (learned the hard way).

Numerically identical (fp32) to ops.mel.log_mel_batch, which remains the
XLA rfft reference path. Dispatch happens in ops.mel.log_mel.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jmt_tpu.ops.mel import (HOP_LENGTH, N_FFT, N_MELS, SPEC_FRAMES,
                             SPEC_MEAN, SPEC_STD,
                             mel_filterbank, _padded_hann, _frame)

N_FREQS = N_FFT // 2 + 1


@functools.lru_cache(maxsize=2)
def _dft_matrices():
    """Real-DFT cos/sin matrices with the Hann window FOLDED IN:
    frames @ C + i * frames @ S == rfft(frames * window). Each
    (N_FFT, N_FREQS) float32."""
    n = np.arange(N_FFT)[:, None]
    k = np.arange(N_FREQS)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT
    w = _padded_hann()[:, None].astype(np.float64)
    cos = (np.cos(ang) * w).astype(np.float32)
    sin = (-np.sin(ang) * w).astype(np.float32)
    return cos, sin


def _kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref):
    frames = frames_ref[0, :, :]                   # (T, N_FFT)
    # windowed DFT as two MXU matmuls (window folded into cos/sin).
    # HIGHEST precision: default MXU f32 emulation passes cost ~1e-2 in dB
    # units — too coarse for CCC parity.
    hp = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_ref[:, :], precision=hp,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:, :], precision=hp,
                 preferred_element_type=jnp.float32)
    power = re * re + im * im                      # (T, F)
    mel = jnp.dot(power, fb_ref[:, :], precision=hp,
                  preferred_element_type=jnp.float32)  # (T, 64)
    # AmplitudeToDB('power', 80) with PER-WAV max floor + normalize
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.maximum(db, jnp.max(db) - 80.0)
    out_ref[0, :, :] = ((db - SPEC_MEAN) / SPEC_STD).T  # (64, T)


@jax.jit
def log_mel_pallas(audio: jnp.ndarray) -> jnp.ndarray:
    """audio: (N, 45599) -> (N, 64, 104); fp32-parity with
    ops.mel.log_mel_batch."""
    n = audio.shape[0]
    frames = _frame(audio.astype(jnp.float32), N_FFT, HOP_LENGTH)
    cos, sin = _dft_matrices()
    fb = mel_filterbank()  # (513, 64)
    return pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, SPEC_FRAMES, N_FFT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_FREQS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_FREQS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FREQS, N_MELS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_MELS, SPEC_FRAMES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, N_MELS, SPEC_FRAMES),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * SPEC_FRAMES * N_FFT * N_FREQS
            + 2 * SPEC_FRAMES * N_FREQS * N_MELS,
            bytes_accessed=SPEC_FRAMES * N_FFT * 4
            + 2 * N_FFT * N_FREQS * 4 + N_MELS * SPEC_FRAMES * 4,
            transcendentals=SPEC_FRAMES * N_MELS,
        ),
    )(frames, jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(fb))
