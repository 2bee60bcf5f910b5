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


# ---------------------------------------------------------------------------
# "More augmentation" vision path (use_more_vision_data_augm)
# ---------------------------------------------------------------------------
# Capability target: more_random_vision_augmentation (clip_transforms.py:
# 277-298): per-FRAME random rotation +-6deg, RandomResizedCrop(scale
# 0.8-1.0, ratio 1:1) back to the full size, horizontal flip p=.5, grayscale
# p=.2, ColorJitter(brightness/contrast/saturation 0.4, hue 0.1) p=.8.
# Device-side: rotation+crop compose into ONE affine bilinear resample per
# frame; hue rotates in YIQ space (the standard linear approximation of PIL's
# HSV hue shift); everything vectorized over (N*T) frames.

def _affine_grid(h: int, w: int, angle, scale, tx, ty):
    """Sampling coordinates for rotate(angle)+scaled center crop.
    angle (rad), scale = crop_size/full_size, tx/ty crop offsets in [-1,1]
    relative units. Returns (ys, xs) each (..., h, w)."""
    yy = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2)[None, :, None]
    xx = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2)[None, None, :]
    c = jnp.cos(angle)[:, None, None]
    s = jnp.sin(angle)[:, None, None]
    sc = scale[:, None, None]
    ys = sc * (s * xx + c * yy) + ty[:, None, None] * (h - 1) / 2 + (h - 1) / 2
    xs = sc * (c * xx - s * yy) + tx[:, None, None] * (w - 1) / 2 + (w - 1) / 2
    return ys, xs


def _bilinear_sample(img, ys, xs):
    """img (h, w, 3); ys/xs (h, w) -> (h, w, 3), zero padding outside."""
    h, w = img.shape[:2]
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]

    def at(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid, v, 0.0)

    return ((1 - wy) * (1 - wx) * at(y0, x0)
            + (1 - wy) * wx * at(y0, x0 + 1)
            + wy * (1 - wx) * at(y0 + 1, x0)
            + wy * wx * at(y0 + 1, x0 + 1))


# YIQ hue rotation (linear stand-in for HSV hue shift)
_RGB2YIQ = np.array([[0.299, 0.587, 0.114],
                     [0.596, -0.274, -0.322],
                     [0.211, -0.523, 0.312]], np.float32)
_YIQ2RGB = np.linalg.inv(_RGB2YIQ).astype(np.float32)


@jax.jit
def more_vision_augment(clips_u8: jnp.ndarray,
                        key: jax.Array) -> jnp.ndarray:
    """clips_u8 (N, T, H, W, 3) uint8 -> normalized float32, with the
    extra-augmentation chain applied per frame."""
    n, t, h, w, _ = clips_u8.shape
    nf = n * t
    x = clips_u8.astype(jnp.float32).reshape(nf, h, w, 3)
    ks = jax.random.split(key, 10)

    # rotation +-6 deg, crop scale in [0.8, 1.0] area, random offset
    angle = jax.random.uniform(ks[0], (nf,), minval=-6.0, maxval=6.0)
    angle = angle * (np.pi / 180.0)
    area = jax.random.uniform(ks[1], (nf,), minval=0.8, maxval=1.0)
    side = jnp.sqrt(area)
    max_off = 1.0 - side
    tx = jax.random.uniform(ks[2], (nf,), minval=-1.0, maxval=1.0) * max_off
    ty = jax.random.uniform(ks[3], (nf,), minval=-1.0, maxval=1.0) * max_off
    ys, xs = _affine_grid(h, w, angle, side, tx, ty)
    x = jax.vmap(_bilinear_sample)(x, ys, xs)

    # horizontal flip p=.5
    flip = jax.random.bernoulli(ks[4], 0.5, (nf, 1, 1, 1))
    x = jnp.where(flip, x[:, :, ::-1, :], x)

    # grayscale p=.2
    gray = jnp.einsum("fhwc,c->fhw", x, jnp.asarray(_LUMA))[..., None]
    g = jax.random.bernoulli(ks[5], 0.2, (nf, 1, 1, 1))
    x = jnp.where(g, jnp.repeat(gray, 3, axis=-1), x)

    # color jitter p=.8: brightness/contrast/saturation 0.4, hue 0.1
    jit = jax.random.bernoulli(ks[6], 0.8, (nf, 1, 1, 1)).astype(jnp.float32)
    bf = jax.random.uniform(ks[7], (nf, 1, 1, 1), minval=0.6, maxval=1.4)
    cf = jax.random.uniform(ks[8], (nf, 1, 1, 1), minval=0.6, maxval=1.4)
    kk = jax.random.split(ks[9], 2)
    sf = jax.random.uniform(kk[0], (nf, 1, 1, 1), minval=0.6, maxval=1.4)
    hf = jax.random.uniform(kk[1], (nf,), minval=-0.1, maxval=0.1)
    bf = 1 + (bf - 1) * jit
    cf = 1 + (cf - 1) * jit
    sf = 1 + (sf - 1) * jit
    hf = hf * jit[:, 0, 0, 0]

    x = jnp.clip(x * bf, 0, 255)
    mean = jnp.mean(jnp.einsum("fhwc,c->fhw", x, jnp.asarray(_LUMA)),
                    axis=(1, 2))[:, None, None, None]
    x = jnp.clip(cf * x + (1 - cf) * mean, 0, 255)
    gray = jnp.einsum("fhwc,c->fhw", x, jnp.asarray(_LUMA))[..., None]
    x = jnp.clip(sf * x + (1 - sf) * gray, 0, 255)
    # hue: rotate IQ plane
    theta = hf * (2 * np.pi)
    yiq = jnp.einsum("fhwc,dc->fhwd", x, jnp.asarray(_RGB2YIQ))
    cth, sth = jnp.cos(theta)[:, None, None], jnp.sin(theta)[:, None, None]
    i2 = cth * yiq[..., 1] - sth * yiq[..., 2]
    q2 = sth * yiq[..., 1] + cth * yiq[..., 2]
    yiq = jnp.stack([yiq[..., 0], i2, q2], axis=-1)
    x = jnp.clip(jnp.einsum("fhwd,cd->fhwc", yiq, jnp.asarray(_YIQ2RGB)),
                 0, 255)

    x = x.reshape(n, t, h, w, 3) / 255.0
    return (x - jnp.asarray(VIS_MEAN)) / jnp.asarray(VIS_STD)
