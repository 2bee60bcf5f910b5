"""int8 quantized inference (VERDICT r3 item 3 — the arithmetic lever).

Round 3 exhausted the exact-rewrite lever family on the conv trunk (five
measured negative results); the remaining single-chip headroom at MFU 0.405
needs DIFFERENT arithmetic: TPU v5e's int8 MXU path peaks at ~2x the bf16
rate (394 vs 197 TOPS). This module provides dynamic post-training
quantization for the convolution backbones — no calibration pass, no
checkpoint change:

* weights: per-output-channel symmetric int8 (scale = max|w| / 127 over
  the (window x Cin) axes), quantized inside the compiled graph from the
  regular f32/bf16 params (cost: one pass over the weights, negligible
  next to the conv itself);
* activations: per-tensor dynamic symmetric int8 (scale = max|x| / 127,
  computed per call) — dynamic because conv inputs here follow BN/ReLU
  whose ranges drift per batch;
* accumulation: s8 x s8 -> s32 on the MXU (preferred_element_type), then
  dequantize by s_x * s_w[c].

Enabled by a TRACE-TIME context (``with int8_inference():``) that
``conv_nd`` consults, so every conv in every backbone routes through the
int8 path without threading a flag through the model classes — activate it
around the jitted function's tracing (make_eval_step(int8=True) /
InferenceServer AOT compile). Training is never quantized.

The reference has no quantization story at all (pure fp32/AMP torch,
SURVEY.md §2.4); accuracy vs the bf16 path is measured by the flagship
parity harness (tools/parity_check.py) and recorded in STATUS.md.
"""
from __future__ import annotations

import contextlib
import threading
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

_STATE = threading.local()

# minimum contraction size (window taps x Cin) for the int8 path: tiny
# stems (e.g. Cin=3) gain nothing on the MXU and lose accuracy, so they
# stay in the compute dtype
_MIN_CONTRACTION = 64


def quant_enabled() -> bool:
    return getattr(_STATE, "int8", False)


@contextlib.contextmanager
def int8_inference(enabled: bool = True):
    """Trace-time switch: convs traced inside this context lower to the
    int8 MXU path. Wrap the TRACING of a jitted inference function (the
    first call, or an explicit .lower()/AOT compile)."""
    prev = quant_enabled()
    _STATE.int8 = enabled
    try:
        yield
    finally:
        _STATE.int8 = prev


def quantize_weight_per_channel(kernel: jnp.ndarray):
    """Symmetric per-output-channel int8. kernel: (*window, Cin, Cout) ->
    (int8 kernel, f32 scale (Cout,))."""
    kf = kernel.astype(jnp.float32)
    axes = tuple(range(kernel.ndim - 1))
    s = jnp.max(jnp.abs(kf), axis=axes) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(kf / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_tensor(x: jnp.ndarray):
    """Symmetric per-tensor dynamic int8. Returns (int8 x, f32 scale)."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf)) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray,
              strides: Sequence[int], padding,
              dilation: Optional[Sequence[int]] = None,
              feature_group_count: int = 1,
              dimension_numbers=None) -> jnp.ndarray:
    """Quantized channels-last conv: q(x) ⊛ q(w) in s8->s32 on the MXU,
    dequantized to x's dtype. Output-channel dim is last in both HWIO
    kernels and NHWC outputs, so the per-channel scale broadcasts."""
    w_q, s_w = quantize_weight_per_channel(kernel)
    x_q, s_x = quantize_tensor(x)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=tuple(strides), padding=padding,
        rhs_dilation=tuple(dilation) if dilation else None,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (s_x * s_w)
    return out.astype(x.dtype)


def eligible(kernel_shape) -> bool:
    """int8 pays off only when the MXU contraction is non-trivial."""
    import numpy as np
    window_cin = int(np.prod(kernel_shape[:-1]))
    return window_cin >= _MIN_CONTRACTION
