"""Multi-head attention with torch `nn.MultiheadAttention` numerics.

The reference's entire fusion stack is built on ``nn.MultiheadAttention``
(mm_multi_transformers.py:96-113, intra_modal_transformer_fusion.py:52,81):
packed QKV in-projection with bias, scaling q by head_dim**-0.5 before the
score matmul, no dropout, no masks. This module reproduces those numerics
exactly while exposing a TPU-idiomatic **batch-first** interface (B, L, E)
— all transposition quirks of the reference live in the callers that need
them, not here.

Parameters are stored flax-style:
  in_proj/kernel  (E, 3E)   == reference in_proj_weight.T (3E, E)
  in_proj/bias    (3E,)
  out_proj/kernel (E, E)    == reference out_proj.weight.T
  out_proj/bias   (E,)

For the fusion shapes (seq<=16, E=512) a single fused einsum chain is
already MXU-friendly; the Pallas fused kernel in ops/pallas is used for the
batched 6-way cross-attention block where it pays off.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.ops.initializers import (torch_linear_kernel,
                                      xavier_uniform_packed_qkv)

# ---------------------------------------------------------------------------
# Attention core: scores -> softmax -> PV. On TPU the forward runs as ONE
# fused Pallas kernel over the (batch*heads) problem set
# (ops/pallas/fused_attention.py); the backward is the XLA formulation via
# custom_vjp. Set JMT_TPU_NO_PALLAS=1 to force the XLA path everywhere.
# ---------------------------------------------------------------------------
import os as _os


def _core_xla(q_scaled: jnp.ndarray, k: jnp.ndarray,
              v: jnp.ndarray) -> jnp.ndarray:
    """q_scaled/k/v: (B, L, H, hd); q pre-scaled by hd**-0.5."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q_scaled, k,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _pallas_ok(q: jnp.ndarray) -> bool:
    if _os.environ.get("JMT_TPU_NO_PALLAS") == "1":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    b, l, h, hd = q.shape
    return l <= 128 and hd <= 256


@jax.custom_vjp
def attention_core(q_scaled, k, v):
    if _pallas_ok(q_scaled):
        from jmt_tpu.ops.pallas.fused_attention import fused_attention
        b, lq, h, hd = q_scaled.shape
        lk = k.shape[1]
        to_bh = lambda x, l: jnp.transpose(x, (0, 2, 1, 3)).reshape(
            b * h, l, hd)
        out = fused_attention(to_bh(q_scaled, lq), to_bh(k, lk),
                              to_bh(v, lk))
        return jnp.transpose(out.reshape(b, h, lq, hd), (0, 2, 1, 3))
    return _core_xla(q_scaled, k, v)


def _attention_fwd(q_scaled, k, v):
    return attention_core(q_scaled, k, v), (q_scaled, k, v)


def _attention_bwd(res, g):
    q_scaled, k, v = res
    _, vjp = jax.vjp(_core_xla, q_scaled, k, v)
    return vjp(g)


attention_core.defvjp(_attention_fwd, _attention_bwd)


def multi_head_attention(q_in: jnp.ndarray, k_in: jnp.ndarray,
                         v_in: jnp.ndarray,
                         in_proj_kernel: jnp.ndarray,
                         in_proj_bias: jnp.ndarray,
                         out_proj_kernel: jnp.ndarray,
                         out_proj_bias: jnp.ndarray,
                         num_heads: int,
                         dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """Functional core. Inputs are batch-first (B, L, E).

    Bit-compatible (fp32) with torch F.multi_head_attention_forward for
    the no-mask/no-dropout case.
    """
    embed_dim = q_in.shape[-1]
    head_dim = embed_dim // num_heads
    assert head_dim * num_heads == embed_dim, (embed_dim, num_heads)
    scale = head_dim ** -0.5

    wq, wk, wv = jnp.split(in_proj_kernel, 3, axis=1)
    bq, bk, bv = jnp.split(in_proj_bias, 3)
    if dtype is not None:
        q_in, k_in, v_in = (x.astype(dtype) for x in (q_in, k_in, v_in))
        wq, wk, wv, bq, bk, bv = (x.astype(dtype)
                                  for x in (wq, wk, wv, bq, bk, bv))

    q = q_in @ wq + bq  # (B, Lq, E)
    k = k_in @ wk + bk  # (B, Lk, E)
    v = v_in @ wv + bv

    b, lq, _ = q.shape
    lk = k.shape[1]
    q = q.reshape(b, lq, num_heads, head_dim) * scale
    k = k.reshape(b, lk, num_heads, head_dim)
    v = v.reshape(b, lk, num_heads, head_dim)

    out = attention_core(q, k, v).reshape(b, lq, embed_dim)
    if dtype is not None:
        out = out.astype(dtype)
        out_proj_kernel = out_proj_kernel.astype(dtype)
        out_proj_bias = out_proj_bias.astype(dtype)
    return out @ out_proj_kernel + out_proj_bias


class MultiheadAttention(nn.Module):
    """torch-parity MHA, batch-first (B, L, E)."""
    embed_dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray,
                 value: jnp.ndarray) -> jnp.ndarray:
        e = self.embed_dim
        in_k = self.param("in_proj_kernel", xavier_uniform_packed_qkv,
                          (e, 3 * e))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        out_k = self.param("out_proj_kernel", torch_linear_kernel, (e, e))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (e,))
        return multi_head_attention(query, key, value, in_k, in_b,
                                    out_k, out_b, self.num_heads,
                                    dtype=self.dtype)
