"""Prediction post-processing: clip + moving-average smoothing.

Replicates the reference's eval smoothing (val.py:359-370):
``np.clip(pred, -1, 1)`` then ``scipy.ndimage.uniform_filter1d`` with
size 20 (valence) / 50 (arousal), ``mode='constant'`` (zero fill).

scipy window placement for origin=0: output[i] averages
input[i - size//2 : i + size - size//2] — for even sizes the extra tap is on
the LEFT. Implemented with a cumulative sum over a zero-padded array, which
is exact and O(n), rather than a convolution.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("size",))
def uniform_filter1d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """scipy.ndimage.uniform_filter1d(x, size, mode='constant', cval=0)."""
    left = size // 2
    right = size - 1 - left
    xp = jnp.pad(x.astype(jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32),
                 (left, right), mode="constant")
    cs = jnp.concatenate([jnp.zeros((1,), xp.dtype), jnp.cumsum(xp)])
    out = (cs[size:] - cs[:-size]) / size
    return out


@functools.partial(jax.jit, static_argnames=("v_size", "a_size"))
def clip_and_smooth(pred_v: jnp.ndarray, pred_a: jnp.ndarray,
                    v_size: int = 20, a_size: int = 50):
    """Clip to [-1, 1] then smooth, sizes per val.py:366-367."""
    v = jnp.clip(pred_v, -1.0, 1.0)
    a = jnp.clip(pred_a, -1.0, 1.0)
    return uniform_filter1d(v, v_size), uniform_filter1d(a, a_size)
