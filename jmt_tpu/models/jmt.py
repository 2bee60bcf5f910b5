"""Joint multimodal transformer fusion stacks.

TPU-native re-design of the reference's fusion models:

* ``JointMultimodalTransformer``  == MultimodalTransformer_w_JR
  (mm_multi_transformers.py:73-214): joint representation via
  Linear(1024->512), three encoder stacks, SIX cross-attentions sharing
  three parameter sets (the reference reuses ``cross_attention_v`` for
  v<-a and v<-joint, ``cross_attention_p`` for a<-v and a<-joint,
  ``cross_attention_pv`` for joint<-v and joint<-a —
  mm_multi_transformers.py:142-167), and either a SELF_ATTEN token-mixing
  head over the 6 outputs (:169-199) or an FC concat head (:201-211).

* ``MultimodalTransformerNoJR``   == MultimodalTransformer_wo_JR
  (mm_transformers.py:87-146): 2 encoders + 2 cross-attentions + concat +
  Linear(1024->512).

* ``FeatureConcatFC``             == mm_multi_transformers.py:217-225.

Everything here is batch-first (B, L, E). Reference layout quirks are
reproduced behind explicit flags:

* ``fc_transpose_quirk`` (JointMultimodalTransformer, FC head): the
  reference's FC path returns a seq-first tensor that downstream code
  treats as batch-first, so with batch>1 the flattened loss pairs
  predictions with the wrong labels (mm_multi_transformers.py:201-211 +
  train.py:303-307). Off by default (fixed); turn on for bit-parity.
* ``encode_batch_axis_quirk`` (MultimodalTransformerNoJR): the reference
  feeds batch-first tensors to seq-first encoders, so self-attention mixes
  across the BATCH axis (mm_transformers.py:125-128). On by default because
  it changes numerics and the NONE path is defined by it; set False for the
  fixed behavior.

TPU notes: the 6 cross-attentions are batched into 2 fused applications per
parameter set (queries stacked on a leading axis) so the MXU sees one big
GEMM per projection instead of 6 small ones.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.models.common import Linear
from jmt_tpu.models.encoder import TransformerEncoderBlock
from jmt_tpu.ops.attention import MultiheadAttention


class JointMultimodalTransformer(nn.Module):
    """The paper's JMT with joint representation (w_JR)."""
    visual_dim: int = 512
    audio_dim: int = 512
    num_heads: int = 1
    hidden_dim: int = 512
    num_layers: int = 1
    output_format: str = "SELF_ATTEN"  # 'FC' | 'SELF_ATTEN'
    fc_transpose_quirk: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        assert self.output_format in ("FC", "SELF_ATTEN"), self.output_format
        kw = dict(num_heads=self.num_heads, hidden_dim=self.hidden_dim,
                  num_layers=self.num_layers, dtype=self.dtype)
        self.visual_encoder = TransformerEncoderBlock(self.visual_dim, **kw)
        self.audio_encoder = TransformerEncoderBlock(self.audio_dim, **kw)
        self.joint_encoder = TransformerEncoderBlock(self.audio_dim, **kw)
        # three shared cross-attention parameter sets (see module docstring)
        self.cross_attention_v = MultiheadAttention(self.visual_dim,
                                                    self.num_heads,
                                                    dtype=self.dtype)
        self.cross_attention_p = MultiheadAttention(self.audio_dim,
                                                    self.num_heads,
                                                    dtype=self.dtype)
        self.cross_attention_pv = MultiheadAttention(512, self.num_heads,
                                                     dtype=self.dtype)
        self.out_layer_pv = Linear(512, dtype=self.dtype)
        if self.output_format == "FC":
            self.out_layer1 = Linear(1024, dtype=self.dtype)
        else:
            self.final_encoder = TransformerEncoderBlock(self.visual_dim, **kw)
            self.final_self_attention = MultiheadAttention(512, self.num_heads,
                                                           dtype=self.dtype)

    def __call__(self, visual: jnp.ndarray, audio: jnp.ndarray) -> jnp.ndarray:
        """visual, audio: (B, L, 512). Returns (B, L, 512) for SELF_ATTEN,
        (B, L, 1024) for FC (transposed to (L, B, 1024) under the quirk)."""
        joint = self.out_layer_pv(jnp.concatenate([visual, audio], axis=-1))

        v_enc = self.visual_encoder(visual)
        a_enc = self.audio_encoder(audio)
        j_enc = self.joint_encoder(joint)

        # 6 cross-attentions, batched per shared parameter set: stack the two
        # (query, kv) problems of each set on the batch axis -> one fused GEMM
        # chain instead of two.
        b = v_enc.shape[0]

        def paired(attn, q1, kv1, q2, kv2):
            q = jnp.concatenate([q1, q2], axis=0)
            kv = jnp.concatenate([kv1, kv2], axis=0)
            out = attn(q, kv, kv)
            return out[:b], out[b:]

        v_p, v_pv = paired(self.cross_attention_v, v_enc, a_enc, v_enc, j_enc)
        p_v, p_pv = paired(self.cross_attention_p, a_enc, v_enc, a_enc, j_enc)
        pv_v, pv_p = paired(self.cross_attention_pv, j_enc, v_enc, j_enc,
                            a_enc)

        # reference stacking order (mm_multi_transformers.py:173-178,203-208)
        outs = (v_p, p_v, pv_v, v_pv, pv_p, p_pv)

        if self.output_format == "SELF_ATTEN":
            stack = jnp.stack(outs, axis=2)  # (B, L, 6, E)
            bb, ll, kk, ee = stack.shape
            tokens = stack.reshape(bb * ll, kk, ee)
            enc = self.final_encoder(tokens)
            attn = self.final_self_attention(enc, enc, enc)
            out = attn.reshape(bb, ll, kk, ee)[:, :, -1, :]
            return out  # (B, L, 512)

        # FC head
        concat = jnp.concatenate(outs, axis=-1)  # (B, L, 3072)
        out = self.out_layer1(concat)  # (B, L, 1024)
        if self.fc_transpose_quirk:
            out = jnp.swapaxes(out, 0, 1)  # reproduce seq-first leak
        return out


class MultimodalTransformerNoJR(nn.Module):
    """Baseline fusion without joint representation (wo_JR)."""
    visual_dim: int = 512
    audio_dim: int = 512
    num_heads: int = 1
    hidden_dim: int = 512
    num_layers: int = 1
    output_format: str = "FC"
    encode_batch_axis_quirk: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        assert self.output_format == "FC", self.output_format
        kw = dict(num_heads=self.num_heads, hidden_dim=self.hidden_dim,
                  num_layers=self.num_layers, dtype=self.dtype)
        self.visual_encoder = TransformerEncoderBlock(self.visual_dim, **kw)
        self.audio_encoder = TransformerEncoderBlock(self.audio_dim, **kw)
        self.cross_attention_v = MultiheadAttention(self.visual_dim,
                                                    self.num_heads,
                                                    dtype=self.dtype)
        self.cross_attention_p = MultiheadAttention(self.audio_dim,
                                                    self.num_heads,
                                                    dtype=self.dtype)
        self.final_layer = Linear(512, dtype=self.dtype)

    def __call__(self, visual: jnp.ndarray, audio: jnp.ndarray) -> jnp.ndarray:
        if self.encode_batch_axis_quirk:
            # reference feeds (B, L, E) into seq-first encoders: attention
            # runs over the batch axis (mm_transformers.py:125-128).
            v_enc = jnp.swapaxes(
                self.visual_encoder(jnp.swapaxes(visual, 0, 1)), 0, 1)
            a_enc = jnp.swapaxes(
                self.audio_encoder(jnp.swapaxes(audio, 0, 1)), 0, 1)
        else:
            v_enc = self.visual_encoder(visual)
            a_enc = self.audio_encoder(audio)

        v_out = self.cross_attention_v(v_enc, a_enc, a_enc)
        p_out = self.cross_attention_p(a_enc, v_enc, v_enc)
        concat = jnp.concatenate([v_out, p_out], axis=-1)
        return self.final_layer(concat)  # (B, L, 512)


class FeatureConcatFC(nn.Module):
    """Concat both modalities + Linear->512 (mm_multi_transformers.py:217)."""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, visual: jnp.ndarray, audio: jnp.ndarray) -> jnp.ndarray:
        out = jnp.concatenate([visual, audio], axis=-1)
        return Linear(512, dtype=self.dtype, name="fc")(out)
