"""Post-LN transformer encoder matching the reference's hand-rolled layer.

Reference: TransformerEncoderLayer/Block (mm_multi_transformers.py:36-70,
duplicated in mm_transformers.py and intra_modal_transformer_fusion.py):

    x = LayerNorm1(x + MHA(x, x, x))
    x = LayerNorm2(x + Linear(ReLU(Linear(x))))

No dropout anywhere; post-LN ordering; ReLU MLP. Batch-first here.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.models.common import Linear, LayerNorm
from jmt_tpu.ops.attention import MultiheadAttention


class TransformerEncoderLayer(nn.Module):
    input_dim: int
    num_heads: int
    hidden_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        attn_out = MultiheadAttention(self.input_dim, self.num_heads,
                                      dtype=self.dtype,
                                      name="attention")(x, x, x)
        x = LayerNorm(dtype=self.dtype, name="layer_norm1")(x + attn_out)
        h = Linear(self.hidden_dim, dtype=self.dtype, name="ff1")(x)
        h = nn.relu(h)
        h = Linear(self.input_dim, dtype=self.dtype, name="ff2")(h)
        x = LayerNorm(dtype=self.dtype, name="layer_norm2")(x + h)
        return x


class TransformerEncoderBlock(nn.Module):
    input_dim: int
    num_heads: int
    hidden_dim: int
    num_layers: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(self.input_dim, self.num_heads,
                                        self.hidden_dim, dtype=self.dtype,
                                        name=f"layer{i}")(x)
        return x
