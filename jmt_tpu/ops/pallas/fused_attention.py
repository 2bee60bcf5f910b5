"""Pallas TPU kernel: fused multi-head attention for the fusion stack.

The JMT fusion stack runs MANY tiny attentions (seq<=16 tokens for the
windows, 6 tokens for the SELF_ATTEN head, 2 for intra-modal fusion; E=512)
— the per-op overhead and HBM roundtrips between the score/softmax/PV
stages dominate, not FLOPs. This kernel fuses scores -> softmax -> PV for a
whole (batch*heads) problem in one VMEM-resident pass; the grid walks
batch-of-heads blocks so thousands of tiny attentions become one launch.

Numerics match ops.attention.multi_head_attention (q pre-scaled by
head_dim**-0.5, fp32 softmax). Forward-only fusion: under jax.grad the
caller's XLA path is used (inference is where launch overhead bites; the
training step is conv-dominated).

Sizes: L (seq) and D (head_dim) are padded to the fp32 tile (8, 128) by
Mosaic; BH is blocked by `block_bh`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[:, :, :]  # (BH_blk, L, D), pre-scaled
    k = k_ref[:, :, :]
    v = v_ref[:, :, :]
    # fp32 inputs keep full precision (parity); bf16 inputs stay cheap
    hp = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
          else jax.lax.Precision.DEFAULT)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=hp,
        preferred_element_type=jnp.float32)  # (BH_blk, Lq, Lk)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=hp,
        preferred_element_type=jnp.float32)
    o_ref[:, :, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_bh",))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_bh: int = 256) -> jnp.ndarray:
    """q: (BH, Lq, D) ALREADY scaled; k/v: (BH, Lk, D). Returns (BH, Lq, D).

    Caller handles projections/head split (they batch into single GEMMs
    upstream — see ops.attention).
    """
    bh, lq, d = q.shape
    lk = k.shape[1]
    block = min(block_bh, bh)
    # pad BH to a multiple of the block
    rem = (-bh) % block
    if rem:
        pad = [(0, rem), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    n_blocks = q.shape[0] // block

    out = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, lq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, lq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q.shape[0], lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * q.shape[0] * lq * lk * d * 2,
            bytes_accessed=q.shape[0] * (lq + 2 * lk) * d * q.dtype.itemsize,
            transcendentals=q.shape[0] * lq * lk,
        ),
    )(q, k, v)
    return out[:bh]
