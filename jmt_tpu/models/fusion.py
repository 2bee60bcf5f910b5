"""Fusion top-level + valence/arousal heads.

* ``TwoTransformers``          == Two_transformers (two_transformers.py:17):
  L2-normalize both 512-d streams, optional in-projection when the vision
  feature dim differs from 512, dispatch joint_modalities in
  {TRANSFORMER, FC, NONE}, then two Linear(dim->128)->ReLU->Dropout->
  Linear(128->1) regressors.
* ``SingleBackbonePretrainer`` == two_transformers.py:131-162: a single
  Linear(512->128->2) head used to pretrain one backbone.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.models.common import Linear, l2_normalize
from jmt_tpu.models.jmt import (JointMultimodalTransformer,
                                MultimodalTransformerNoJR, FeatureConcatFC)


class Regressor(nn.Module):
    """Linear(dim->128) -> ReLU -> Dropout -> Linear(128->1|2)."""
    out_dim: int = 1
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        x = Linear(128, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return Linear(self.out_dim, dtype=self.dtype, name="fc2")(x)


class TwoTransformers(nn.Module):
    v_dropout: float = 0.0
    a_dropout: float = 0.0
    num_heads: int = 1
    num_layers: int = 1
    joint_modalities: str = "TRANSFORMER"  # 'NONE' | 'TRANSFORMER' | 'FC'
    output_format: str = "FC"              # 'FC' | 'SELF_ATTEN'
    vision_in_ft: int = 512
    fc_transpose_quirk: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        assert self.joint_modalities in ("NONE", "TRANSFORMER", "FC"), \
            self.joint_modalities
        assert self.output_format in ("FC", "SELF_ATTEN"), self.output_format

        if self.vision_in_ft != 512:
            self.linear = Linear(512, dtype=self.dtype)
        else:
            self.linear = None

        if self.joint_modalities == "TRANSFORMER":
            self.mm_transformer = JointMultimodalTransformer(
                visual_dim=512, audio_dim=512, num_heads=self.num_heads,
                hidden_dim=512, num_layers=self.num_layers,
                output_format=self.output_format,
                fc_transpose_quirk=self.fc_transpose_quirk, dtype=self.dtype)
            dim = 1024 if self.output_format == "FC" else 512
        elif self.joint_modalities == "FC":
            self.mm_transformer = FeatureConcatFC(dtype=self.dtype)
            dim = 512
        else:  # NONE
            assert self.output_format == "FC", self.output_format
            self.mm_transformer = MultimodalTransformerNoJR(
                visual_dim=512, audio_dim=512, num_heads=self.num_heads,
                hidden_dim=512, num_layers=self.num_layers,
                output_format="FC", dtype=self.dtype)
            dim = 512

        self.vregressor = Regressor(1, self.v_dropout, dtype=self.dtype)
        self.aregressor = Regressor(1, self.a_dropout, dtype=self.dtype)
        del dim  # regressor input dim is inferred at call time

    def __call__(self, f1_audio: jnp.ndarray, f2_video: jnp.ndarray,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Args follow the reference call order (audio_feats, visual_feats)
        (two_transformers.py:116, train.py:287). Returns (vouts, aouts),
        each (B, L)."""
        video = l2_normalize(f2_video, axis=-1)
        audio = l2_normalize(f1_audio, axis=-1)
        if self.linear is not None:
            video = self.linear(video)

        features = self.mm_transformer(video, audio)
        vouts = self.vregressor(features, deterministic)[..., 0]
        aouts = self.aregressor(features, deterministic)[..., 0]
        return vouts, aouts


class SingleBackbonePretrainer(nn.Module):
    v_dropout: float = 0.0
    a_dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert x.ndim == 3, x.ndim  # (B, L, 512)
        out = Regressor(2, self.a_dropout, dtype=self.dtype,
                        name="regressor")(x, deterministic)
        return out[..., 0], out[..., 1]
