"""Intra-modality fusion of two backbone feature streams.

* ``FcLayer``                     == fc_layer.py:6-12 (Linear in->out), used
  for the 'feat_concat_fc' option: concat(512+512 or 512+768) -> 512
  (main.py:317-326,377-386).
* ``IntraModalTransformerFusion`` == intra_modal_transformer_fusion.py:74-111
  ('encoder_plus_self_attention'): stack the two per-timestep features as a
  2-token sequence, run a post-LN encoder + MHA over the tokens, keep token
  -1. A shared Linear(768->512) is applied to any input whose feature dim is
  768 (wavLM — intra_modal_transformer_fusion.py:88-91).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.models.common import Linear
from jmt_tpu.models.encoder import TransformerEncoderBlock
from jmt_tpu.ops.attention import MultiheadAttention


class FcLayer(nn.Module):
    output_dim: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Linear(self.output_dim, dtype=self.dtype, name="fc_layer")(x)


class IntraModalTransformerFusion(nn.Module):
    feat_dim: int = 512
    num_heads: int = 1
    hidden_dim: int = 512
    num_layers: int = 1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder = TransformerEncoderBlock(self.feat_dim, self.num_heads,
                                               self.hidden_dim,
                                               self.num_layers,
                                               dtype=self.dtype)
        self.self_attention = MultiheadAttention(512, self.num_heads,
                                                 dtype=self.dtype)
        self.fc = Linear(512, dtype=self.dtype)  # 768 -> 512 reducer

    def __call__(self, features_a: jnp.ndarray,
                 features_b: jnp.ndarray) -> jnp.ndarray:
        """features_*: (B, L, 512 or 768). Returns (B, L, 512)."""
        if features_a.shape[-1] == 768:
            features_a = self.fc(features_a)
        if features_b.shape[-1] == 768:
            features_b = self.fc(features_b)

        stack = jnp.stack([features_a, features_b], axis=2)  # (B, L, 2, E)
        b, l, k, e = stack.shape
        tokens = stack.reshape(b * l, k, e)
        enc = self.encoder(tokens)
        attn = self.self_attention(enc, enc, enc)
        return attn.reshape(b, l, k, e)[:, :, -1, :]
