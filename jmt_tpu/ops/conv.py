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
    from jmt_tpu.ops import quant
    if quant.quant_enabled() and quant.eligible(kernel.shape):
        # int8 inference mode (ops/quant.py): s8 x s8 -> s32 on the MXU
        return quant.int8_conv(x, kernel, strides, padding,
                               dilation=dilation,
                               feature_group_count=feature_group_count,
                               dimension_numbers=dn)
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


# Fold matrix for (2x bilinear half-pixel upsample) ∘ (7-tap stride-2 conv):
# output j of the composite reads upsampled positions u = 2j-2+t (TF-SAME
# pad (2,3) on the 2n grid); each u is a 2-tap combo of the edge-clamped
# input, so the 7 taps collapse onto 5 original-grid taps x̂[j-1+d] with
# weights w5[d] = sum_t FOLD[d,t]·w7[t] — single phase because the stride-2
# sampling preserves parity.
_UPSAMPLE2X_FOLD = np.zeros((5, 7))
_UPSAMPLE2X_FOLD[0, 0] = .25
_UPSAMPLE2X_FOLD[1, 0] = .75
_UPSAMPLE2X_FOLD[1, 1] = .75
_UPSAMPLE2X_FOLD[1, 2] = .25
_UPSAMPLE2X_FOLD[2, 1] = .25
_UPSAMPLE2X_FOLD[2, 2] = .75
_UPSAMPLE2X_FOLD[2, 3] = .75
_UPSAMPLE2X_FOLD[2, 4] = .25
_UPSAMPLE2X_FOLD[3, 3] = .25
_UPSAMPLE2X_FOLD[3, 4] = .75
_UPSAMPLE2X_FOLD[3, 5] = .75
_UPSAMPLE2X_FOLD[3, 6] = .25
_UPSAMPLE2X_FOLD[4, 5] = .25
_UPSAMPLE2X_FOLD[4, 6] = .75

# Conv zero-padding on the 2n grid makes taps with u<0 or u>2n-1 vanish;
# the folded conv (over the replicate+zero extended x̂) still includes
# them, so border outputs need a correction. At each affected output index
# the surviving extended-x̂ combos all collapse to multiples of the edge
# pixel; ALPHA maps border output -> per-tap coefficient on that pixel.
# Affected: j=0 (taps t=0,1), j=n-2 (t=6), j=n-1 (t=4,5,6).
_UPSAMPLE2X_ALPHA = {
    "lo": np.array([.75, 1., 0., 0., 0., 0., 0.]),       # j = 0
    "hi1": np.array([0., 0., 0., 0., 0., 0., 1.]),       # j = n-2
    "hi0": np.array([0., 0., 0., 0., 1., .75, .25]),     # j = n-1
}


def conv3d_stem_upsample2x(x: jnp.ndarray, kernel: jnp.ndarray,
                           t_pad: Tuple[int, int],
                           compute_dtype: Optional[jnp.dtype] = None
                           ) -> jnp.ndarray:
    """EXACT fold of the I3D input upsample into the stem conv.

    Computes `conv7x7x7_tf_same_stride_(1,2,2)(upsample2x_hw(x))` — the
    reference's resize_clips_for_i3d (utils/utils.py:293-300, trilinear
    align_corners=False == per-frame bilinear half-pixel 2x) feeding
    Conv3d_1a_7x7 (pytorch_i3d_new.py:247-537 stage table) — WITHOUT
    materializing the 2x tensor, as one stride-1 conv with a 7x5x5 kernel
    on the original grid (1.96x fewer MACs: 7·5·5 vs 7·7·7 window taps)
    plus O(border) corrections. Exact in exact arithmetic (golden-tested
    at f64 to ~1e-13 against upsample+conv).

    Derivation: upsampled u=2m is .25·x̂[m]+.75·x̂[m+1] and u=2m+1 is
    .75·x̂[m+1]+.25·x̂[m+2] over the edge-clamped x̂ (x̂[p]=x[clip(p-1)]),
    so the 7 stride-2 taps fold to the single-phase 5-tap _UPSAMPLE2X_FOLD
    kernel; conv zero-pad outside the 2n grid is restored by
    inclusion-exclusion row/col/corner corrections (_UPSAMPLE2X_ALPHA).

    x: (N, T, H, W, Ci); kernel: (kt, 7, 7, Ci, Co) — the UNFOLDED stem
    kernel (param/checkpoint layout unchanged); t_pad: TF-SAME pads for the
    T dim (stride 1). Returns (N, T', H, W, Co) — the composite output at
    the ORIGINAL spatial size (2H/2 = H).
    """
    kt, kh, kw, ci, co = kernel.shape
    assert (kh, kw) == (7, 7), (kh, kw)
    n, t, h, w, _ = x.shape
    assert h >= 4 and w >= 4, (h, w)  # border sets {0, n-2, n-1} distinct
    M = jnp.asarray(_UPSAMPLE2X_FOLD, kernel.dtype)
    k5 = jnp.einsum("ah,bw,thwio->tabio", M, M, kernel)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        k5 = k5.astype(compute_dtype)
    # x̂ extended: replicate 1 (upsample edge clamp) then zero 1 (conv pad)
    xr = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    xz = jnp.pad(xr, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    out = conv_nd(xz, k5, strides=(1, 1, 1),
                  padding=(t_pad, (0, 0), (0, 0)))

    alphas = {0: _UPSAMPLE2X_ALPHA["lo"], h - 2: _UPSAMPLE2X_ALPHA["hi1"],
              h - 1: _UPSAMPLE2X_ALPHA["hi0"]}
    walphas = {0: _UPSAMPLE2X_ALPHA["lo"], w - 2: _UPSAMPLE2X_ALPHA["hi1"],
               w - 1: _UPSAMPLE2X_ALPHA["hi0"]}
    border_row = {0: 0, h - 2: h - 1, h - 1: h - 1}
    border_col = {0: 0, w - 2: w - 1, w - 1: w - 1}

    def cast(kc):
        return kc.astype(compute_dtype) if compute_dtype is not None else kc

    # subtract the folded conv's phantom contributions on border rows/cols
    for jh, av in alphas.items():
        krow = cast(jnp.einsum("h,bw,thwio->tbio", jnp.asarray(av, M.dtype),
                               M, kernel))
        row = xz[:, :, border_row[jh] + 2, :, :]  # (N, T, W+4, Ci)
        e = conv_nd(row, krow, strides=(1, 1), padding=(t_pad, (0, 0)))
        out = out.at[:, :, jh, :, :].add(-e)
    for jw, av in walphas.items():
        kcol = cast(jnp.einsum("w,ah,thwio->taio", jnp.asarray(av, M.dtype),
                               M, kernel))
        col = xz[:, :, :, border_col[jw] + 2, :]
        e = conv_nd(col, kcol, strides=(1, 1), padding=(t_pad, (0, 0)))
        out = out.at[:, :, :, jw, :].add(-e)
    # corners were subtracted twice — add back once
    for jh, ah in alphas.items():
        for jw, aw in walphas.items():
            kc = cast(jnp.einsum("h,w,thwio->tio",
                                 jnp.asarray(ah, M.dtype),
                                 jnp.asarray(aw, M.dtype), kernel))
            px = x[:, :, border_row[jh], border_col[jw], :]  # (N, T, Ci)
            e = conv_nd(px, kc, strides=(1,), padding=(t_pad,))
            out = out.at[:, :, jh, jw, :].add(e)
    return out


def max_pool(x: jnp.ndarray, window: Sequence[int], strides: Sequence[int],
             padding) -> jnp.ndarray:
    """Channels-last max pool over the spatial dims.

    Lowering note (v5e-1 measurements, 128-clip tensors): max is
    associative, so the window separates EXACTLY into per-dim maxima of
    shifted slices — and in ISOLATION that form is 3.2x faster than
    reduce_window for the stride-1 inception b3 pools (7.1 vs 22.3 ms on
    (128,8,14,14,512) bf16). But IN CONTEXT (inside the fused inception
    module graphs) the slice form loses ~10 ms per flagship step — XLA
    fuses reduce_window with the surrounding convs/concat better than the
    pad+slice chain — and for strided windows the slice form is 3-8x
    slower outright (stride-2 slice reads). Measured full-model: rw 151.9
    ms, slice-hybrid 161.7, slice-everywhere 308. So: reduce_window,
    unconditionally. Kept as the single pool entry point so the
    experiment is one edit to redo (tools history: /tmp/pool_bench.py).
    """
    n_spatial = x.ndim - 2
    window = (1,) + tuple(window) + (1,)
    strides = (1,) + tuple(strides) + (1,)
    if isinstance(padding, str):
        pads = padding
    else:
        pads = ((0, 0),) + tuple(tuple(p) for p in padding) + ((0, 0),)
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
