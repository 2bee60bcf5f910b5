"""Device-side clip preprocessing: color augmentation + normalize, fused.

Capability target: the reference's host-side per-frame CPU chain
(clip_transforms.py + intensity.py driven from dataset_new.py:233-286):

* RandomColorAugmentation — one RandomColorAugment per 8-frame clip with
  brightness/contrast factors ~ U(0.8, 1.2) (intensity.py:259-317), applied
  identically to the clip's frames;
* NumpyToTensor — uint8 /255, THWC->CTHW (clip_transforms.py:53-69);
* Normalize mean (0.43216, 0.394666, 0.37645), std (0.22803, 0.22145,
  0.216989) (dataset_new.py:234-236).

TPU-native redesign: the reference does ~128 PIL round-trips per sample in
DataLoader workers (SURVEY.md §3.4). Here the uint8 clip batch is shipped to
the device once and ONE fused elementwise pass applies brightness, contrast
(PIL-style blend with the frame's grayscale mean), scaling, and
normalization; per-clip random factors come from a PRNG key. Layout stays
channels-last (no CTHW permute — our convs are channels-last).

The color math follows torchvision functional semantics (multiply + clamp
for brightness; blend-with-gray-mean for contrast), which is what PIL's
ImageEnhance computes up to uint8 rounding — an immaterial difference inside
a random augmentation.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

VIS_MEAN = np.array([0.43216, 0.394666, 0.37645], np.float32)
VIS_STD = np.array([0.22803, 0.22145, 0.216989], np.float32)
# ITU-R 601-2 luma weights (PIL 'L' conversion used by adjust_contrast)
_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def sample_color_factors(key: jax.Array, n_clips: int,
                         brightness: float = 0.2,
                         contrast: float = 0.2) -> Tuple[jax.Array, jax.Array]:
    """Per-clip brightness/contrast factors ~ U(1-b, 1+b)
    (intensity.py:269-278)."""
    kb, kc = jax.random.split(key)
    bf = jax.random.uniform(kb, (n_clips,), minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    cf = jax.random.uniform(kc, (n_clips,), minval=max(0.0, 1 - contrast),
                            maxval=1 + contrast)
    return bf, cf


@functools.partial(jax.jit, static_argnames=("augment",))
def preprocess_clips(clips_u8: jnp.ndarray,
                     brightness: Optional[jnp.ndarray] = None,
                     contrast: Optional[jnp.ndarray] = None,
                     augment: bool = False) -> jnp.ndarray:
    """clips_u8: (N, T, H, W, 3) uint8 -> normalized float32 (N, T, H, W, 3).

    brightness/contrast: per-clip (N,) factors (required when augment=True).
    """
    x = clips_u8.astype(jnp.float32)
    if augment:
        bshape = (-1, 1, 1, 1, 1)
        # brightness: img * f, clamp (per clip)
        x = jnp.clip(x * brightness.reshape(bshape), 0.0, 255.0)
        # contrast: blend with the mean of the grayscale frame stack
        gray = jnp.einsum("nthwc,c->nthw", x, jnp.asarray(_LUMA))
        mean = jnp.mean(gray, axis=(1, 2, 3)).reshape(bshape)
        x = jnp.clip(contrast.reshape(bshape) * x
                     + (1.0 - contrast.reshape(bshape)) * mean, 0.0, 255.0)
    x = x / 255.0
    return (x - jnp.asarray(VIS_MEAN)) / jnp.asarray(VIS_STD)


def normalize_clips_reference(clips_u8: np.ndarray) -> np.ndarray:
    """Host/numpy twin of the non-augmented path, for tests and CPU-only
    tools: uint8 (T,H,W,3) -> float32 normalized."""
    x = clips_u8.astype(np.float32) / 255.0
    return (x - VIS_MEAN) / VIS_STD
