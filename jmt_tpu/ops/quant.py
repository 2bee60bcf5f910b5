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

# flagship eval V/A absolute drift bound vs the f32 path — the single
# source of truth shared by tests/test_quant.py (which enforces it) and
# bench.py's int8 leg (which reports it); change it HERE only
FLAGSHIP_VA_ABS_BOUND = 0.1


def quant_enabled() -> bool:
    return (getattr(_STATE, "int8", False)
            or getattr(_STATE, "calib", None) is not None)


@contextlib.contextmanager
def int8_inference(enabled: bool = True, act_scales=None):
    """Trace-time switch: convs traced inside this context lower to the
    int8 MXU path. Wrap the TRACING of a jitted inference function (the
    first call, or an explicit .lower()/AOT compile).

    act_scales: optional sequence of STATIC per-tensor activation scales
    (floats, trace order over eligible convs — produce them with
    ``int8_calibration`` + ``act_scales_from_maxes``). With static scales
    the activation quantize is a pure elementwise op with a baked-in
    constant — XLA fuses it into the producing BN/ReLU, removing the
    per-conv dynamic max-reduce pass (an extra read of every activation
    tensor plus a fusion break) that the dynamic mode pays."""
    prev = getattr(_STATE, "int8", False)
    prev_iter = getattr(_STATE, "act_iter", None)
    _STATE.int8 = enabled
    _STATE.act_iter = (iter([float(s) for s in act_scales])
                       if enabled and act_scales is not None else None)
    try:
        yield
    finally:
        _STATE.int8 = prev
        _STATE.act_iter = prev_iter


@contextlib.contextmanager
def int8_calibration(collector: list):
    """Calibration trace: convs that WOULD quantize under int8_inference
    run in their normal dtype but append their activation absmax (a traced
    f32 scalar) to `collector`, in trace order. Jit a forward wrapped in
    this context, return ``jnp.stack(collector)``, run it once on a
    calibration batch, and feed the result to ``act_scales_from_maxes``."""
    prev = getattr(_STATE, "calib", None)
    _STATE.calib = collector
    try:
        yield
    finally:
        _STATE.calib = prev


def act_scales_from_maxes(maxes, margin: float = 1.0):
    """Per-conv absmax (int8_calibration output) -> static activation
    scales. margin > 1 leaves headroom for batches that exceed the
    calibration batch's range (values past 127*scale clip)."""
    import numpy as np
    return [max(float(m) * margin, 1e-12) / 127.0
            for m in np.asarray(maxes).reshape(-1)]


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
    coll = getattr(_STATE, "calib", None)
    if coll is not None:
        # calibration trace: record the activation range, compute normally
        coll.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=tuple(strides), padding=padding,
            rhs_dilation=tuple(dilation) if dilation else None,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
            preferred_element_type=(jnp.float32
                                    if x.dtype == jnp.float32 else None))
    w_q, s_w = quantize_weight_per_channel(kernel)
    it = getattr(_STATE, "act_iter", None)
    if it is not None:
        try:
            s_x = next(it)
        except StopIteration:
            raise RuntimeError(
                "int8 act_scales exhausted: the model traces more eligible "
                "convs than the calibration recorded — calibrate with the "
                "same model/config") from None
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                       -127, 127).astype(jnp.int8)
    else:
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
