"""Convolution / pooling primitives, channels-last (TPU-native layout).

The reference's native kernel surface is cuDNN convs invoked through torch
(SURVEY.md §2.4). Here everything lowers to `lax.conv_general_dilated` /
`lax.reduce_window` in channels-last layouts (NHWC / NDHWC / NWC), which is
what XLA:TPU tiles best onto the MXU. torch's NCHW layouts exist only at the
checkpoint-conversion boundary (models/torch_io.py).

Also implements the I3D's TF-style dynamic 'SAME' padding
(pytorch_i3d_new.py:12-43,81-110) as a *static* computation — with fixed
input sizes (everything is statically shaped here) the dynamic torch code
collapses to compile-time constants.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


def tf_same_pads(sizes: Sequence[int], kernel: Sequence[int],
                 strides: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    """TF-SAME padding per spatial dim, computed statically.

    Mirrors Unit3D.compute_pad / MaxPool3dSamePadding.compute_pad
    (pytorch_i3d_new.py:81-85,13-17): pad = max(k - s, 0) if size % s == 0
    else max(k - size % s, 0), split front=pad//2, back=pad-front.
    """
    out = []
    for size, k, s in zip(sizes, kernel, strides):
        if size % s == 0:
            pad = max(k - s, 0)
        else:
            pad = max(k - (size % s), 0)
        front = pad // 2
        out.append((front, pad - front))
    return tuple(out)


def conv_nd(x: jnp.ndarray, kernel: jnp.ndarray,
            strides: Sequence[int],
            padding,
            dilation: Optional[Sequence[int]] = None,
            feature_group_count: int = 1) -> jnp.ndarray:
    """Channels-last N-D conv. x: (B, *spatial, Cin); kernel: (*k, Cin, Cout).

    `padding` is either a string ('SAME'/'VALID') or explicit
    ((lo, hi), ...) per spatial dim.
    """
    n_spatial = x.ndim - 2
    spec = {
        1: ("NWC", "WIO", "NWC"),
        2: ("NHWC", "HWIO", "NHWC"),
        3: ("NDHWC", "DHWIO", "NDHWC"),
    }[n_spatial]
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, spec)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=tuple(strides), padding=padding,
        rhs_dilation=tuple(dilation) if dilation else None,
        dimension_numbers=dn, feature_group_count=feature_group_count,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None)


def conv3d_s2d_hw(x: jnp.ndarray, kernel: jnp.ndarray,
                  pads: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """EXACT space-to-depth reformulation of a 3-D conv with spatial stride
    (1, 2, 2) — the I3D stem shape (7x7x7, Cin=3, 224px).

    Motivation: the MXU contracts over (kernel-window x Cin); with Cin=3
    the lanes pad 3->8 and the stem runs at ~20% utilization (measured,
    tools/profile_step.py). Folding the 2x2 spatial phases into channels
    gives Cin=12 and a (kt, ceil((kh+1)/2), ceil((kw+1)/2)) stride-1
    kernel — identical arithmetic (each output element is the same sum of
    the same products), better lane packing.

    x: (N, T, H, W, Ci) with H, W even; kernel (kt, kh, kw, Ci, Co);
    pads: TF-SAME ((t0,t1),(h0,h1),(w0,w1)) as computed for the ORIGINAL
    stride-(1,2,2) conv. Returns (N, T', H//2, W//2, Co).
    """
    kt, kh, kw, ci, co = kernel.shape
    (t0, t1), (h0, h1), (w0, w1) = pads
    n, t, h, w, _ = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    # pad like the original conv; then round H,W up to even for phase split
    hp, wp = h + h0 + h1, w + w0 + w1
    xpad = jnp.pad(x, ((0, 0), (t0, t1), (h0, h1 + hp % 2),
                       (w0, w1 + wp % 2), (0, 0)))
    hp, wp = hp + hp % 2, wp + wp % 2
    # (N, Tp, Hp/2, 2, Wp/2, 2, Ci) -> (N, Tp, Hp/2, Wp/2, 2*2*Ci)
    x4 = xpad.reshape(n, t + t0 + t1, hp // 2, 2, wp // 2, 2, ci)
    x4 = x4.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        n, t + t0 + t1, hp // 2, wp // 2, 4 * ci)
    # kernel phases: k4[kt, mh, mw, (ph, pw, ci), co] = k[kt, 2mh+ph, 2mw+pw]
    mh, mw = (kh + 1) // 2, (kw + 1) // 2
    k4 = np_like_zeros(kernel, (kt, mh, mw, 2, 2, ci, co))
    for ph in (0, 1):
        for pw in (0, 1):
            sub = kernel[:, ph::2, pw::2]  # (kt, <=mh, <=mw, ci, co)
            k4 = k4.at[:, :sub.shape[1], :sub.shape[2], ph, pw].set(sub)
    k4 = k4.reshape(kt, mh, mw, 4 * ci, co)
    # output H = Hp/2 - mh + 1 must equal ceil(H/2); same for W
    return conv_nd(x4, k4, strides=(1, 1, 1),
                   padding=[(0, 0), (0, 0), (0, 0)])


def np_like_zeros(ref: jnp.ndarray, shape) -> jnp.ndarray:
    return jnp.zeros(shape, ref.dtype)


def max_pool(x: jnp.ndarray, window: Sequence[int], strides: Sequence[int],
             padding) -> jnp.ndarray:
    """Channels-last max pool over the spatial dims."""
    n_spatial = x.ndim - 2
    window = (1,) + tuple(window) + (1,)
    strides = (1,) + tuple(strides) + (1,)
    if isinstance(padding, str):
        pads = padding
    else:
        pads = ((0, 0),) + tuple(padding) + ((0, 0),)
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
        jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(x, neg_inf, jax.lax.max, window, strides,
                                 pads)


def avg_pool(x: jnp.ndarray, window: Sequence[int], strides: Sequence[int],
             padding="VALID") -> jnp.ndarray:
    n_spatial = x.ndim - 2
    win = (1,) + tuple(window) + (1,)
    strd = (1,) + tuple(strides) + (1,)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, win, strd, padding)
    return summed / float(np.prod(window))


class WeightNormConv1d(nn.Module):
    """Causal dilated 1-D conv with explicit torch weight_norm reparam.

    The reference TCN wraps Conv1d in torch weight_norm (dim=0):
    weight = g * v / ||v|| with the norm over (in, k) per output channel
    (temporal_convolutional_model.py:24-33). The reference pads
    (k-1)*dilation on BOTH sides then Chomp1d-trims the right — numerically
    identical to left-only causal padding, which is what we do (one fewer
    slice, better fusion).

    Input (B, L, Cin) -> output (B, L, Cout). torch-equivalent init:
    the reference re-inits v with xavier_uniform(gain=sqrt(2))
    (temporal_convolutional_model.py:45-52) AFTER weight_norm wrapping, and
    torch weight_norm initializes g = ||v|| of the Conv1d-default weight;
    since the reference xavier-inits v post-wrap, g keeps the norm of the
    ORIGINAL kaiming weight. We replicate by initializing v xavier and g
    from a kaiming-default sample's row norms.
    """
    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    causal: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        k = self.kernel_size

        from jmt_tpu.ops.initializers import xavier_uniform_gain

        def g_init(key, shape, dtype=jnp.float32):
            # norm per out-channel of a torch Conv1d kaiming_uniform(a=sqrt(5))
            # default weight (what weight_norm captured before the re-init)
            fan_in = cin * k
            bound = 1.0 / np.sqrt(fan_in)
            w = jax.random.uniform(key, (k, cin, shape[0]), dtype,
                                   -bound, bound)
            return jnp.sqrt(jnp.sum(w ** 2, axis=(0, 1)))

        v = self.param("v", xavier_uniform_gain(np.sqrt(2.0)),
                       (k, cin, self.features))
        g = self.param("g", g_init, (self.features,))
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1),
                                keepdims=True))
        kernel = (g / norm) * v

        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)

        pad = (k - 1) * self.dilation
        padding = ((pad, 0),) if self.causal else ((pad // 2, pad - pad // 2),)
        y = conv_nd(x, kernel, strides=(1,), padding=padding,
                    dilation=(self.dilation,))
        if self.use_bias:
            from jmt_tpu.ops.initializers import torch_linear_bias
            b = self.param("bias", torch_linear_bias(cin * k),
                           (self.features,))
            y = y + (b.astype(self.dtype) if self.dtype is not None else b)
        return y
