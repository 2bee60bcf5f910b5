"""The full composed model: backbones -> intra-modal fusion -> JMT -> heads.

Capability target: the model-assembly logic scattered across the reference's
main.py (construction, main.py:205-503), train.py (dispatch, train.py:
173-301) and val.py (same, val.py:165-273), unified into ONE flax module so
a single jit covers the entire forward (the reference instead crosses the
python/driver boundary between every stage).

Config lattice handled (parity with the reference asserts):
* vision backbones {R2D1}, {I3D}, {R2D1, I3D} (+ intra-modal fusion:
  feat_concat_fc -> FcLayer(1024->512) | encoder_plus_self_attention ->
  IntraModalTransformerFusion; main.py:373-402)
* audio backbones {ResNet18}, {wavLM} (-> FcLayer(768->512), main.py:361),
  {ResNet18, wavLM} (+ FcLayer(1280->512) | transformer; main.py:313-343)
* goal TRAINING -> TwoTransformers fusion; PRETRAINING ->
  SingleBackbonePretrainer on the lone backbone (main.py:474-503)
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.models.tsav import TwoStreamBackbones
from jmt_tpu.models.intra_modal import FcLayer, IntraModalTransformerFusion
from jmt_tpu.models.fusion import TwoTransformers, SingleBackbonePretrainer


class JMTModel(nn.Module):
    vision_backbones: Sequence[str] = ("R2D1",)
    audio_backbones: Sequence[str] = ("ResNet18",)
    intra_modal_fusion: str = "None"
    joint_modalities: str = "TRANSFORMER"
    output_format: str = "SELF_ATTEN"
    num_heads: int = 1
    num_layers: int = 1
    v_dropout: float = 0.0
    a_dropout: float = 0.0
    r2d1_arch: str = "r2plus1d"
    r2d1_reduce: str = "MAX"
    goal: str = "TRAINING"
    finetune: Sequence[str] = ()  # backbones NOT frozen (main.py:412-466)
    # "batch" = reference parity (train-mode BN for finetuned backbones,
    # train.py:27-42); "frozen" = running-stats BN while finetuning
    # (opt-in, see tsav.TwoStreamBackbones.finetune_bn_frozen)
    finetune_bn: str = "batch"
    remat: bool = False           # rematerialize backbones in backward
    remat_granularity: str = "backbone"   # "backbone" | "stage"
    i3d_input_size: int = 224     # 112 = native-resolution option
    # whole-inception-module Pallas kernel (ops/inception_pallas.py);
    # "auto" currently resolves to False EVERYWHERE — the kernel wins the
    # isolated trunk but loses end-to-end on v5e (measured rationale in
    # ops/inception_pallas.fused_default_enabled); opt in with True
    i3d_fused_inception: object = "auto"
    # stream the I3D trunk over clip chunks of this size (0 = off) —
    # raises the B knee past the stem-activation OOM (models/tsav.py)
    i3d_chunk: int = 0
    fc_transpose_quirk: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        fused = self.i3d_fused_inception
        if fused == "auto":
            from jmt_tpu.ops.inception_pallas import fused_default_enabled
            fused = fused_default_enabled()
        self.backbones = TwoStreamBackbones(
            vision_backbones=tuple(self.vision_backbones),
            audio_backbones=tuple(self.audio_backbones),
            r2d1_arch=self.r2d1_arch, r2d1_reduce=self.r2d1_reduce,
            finetune=tuple(self.finetune),
            finetune_bn_frozen=self.finetune_bn == "frozen",
            remat=self.remat,
            remat_granularity=self.remat_granularity,
            i3d_input_size=self.i3d_input_size,
            i3d_fused_inception=bool(fused),
            i3d_chunk=self.i3d_chunk, dtype=self.dtype)

        # intra-modal (vision) — main.py:373-402
        self.fc_layer_for_video_concat = None
        self.transformer_visio_modality_fusion = None
        if len(self.vision_backbones) == 2:
            if self.intra_modal_fusion == "feat_concat_fc":
                self.fc_layer_for_video_concat = FcLayer(512,
                                                         dtype=self.dtype)
            elif self.intra_modal_fusion == "encoder_plus_self_attention":
                self.transformer_visio_modality_fusion = \
                    IntraModalTransformerFusion(
                        feat_dim=512, num_heads=self.num_heads,
                        hidden_dim=512, num_layers=self.num_layers,
                        dtype=self.dtype)
            else:
                raise NotImplementedError(self.intra_modal_fusion)

        # intra-modal (audio) — main.py:313-366
        self.fc_layer_for_audio_concat = None
        self.transformer_audio_modality_fusion = None
        if len(self.audio_backbones) == 2:
            if self.intra_modal_fusion == "feat_concat_fc":
                self.fc_layer_for_audio_concat = FcLayer(512,
                                                         dtype=self.dtype)
            elif self.intra_modal_fusion == "encoder_plus_self_attention":
                self.transformer_audio_modality_fusion = \
                    IntraModalTransformerFusion(
                        feat_dim=512, num_heads=self.num_heads,
                        hidden_dim=512, num_layers=self.num_layers,
                        dtype=self.dtype)
            else:
                raise NotImplementedError(self.intra_modal_fusion)
        elif self.audio_backbones == ("wavLM",) or (
                len(self.audio_backbones) == 1
                and "wavLM" in self.audio_backbones):
            self.fc_layer_for_audio_concat = FcLayer(512, dtype=self.dtype)

        # fusion / pretrainer — main.py:474-503
        self.fusion_model = None
        self.backbone_pretrainer = None
        if self.goal == "TRAINING":
            self.fusion_model = TwoTransformers(
                v_dropout=self.v_dropout, a_dropout=self.a_dropout,
                num_heads=self.num_heads, num_layers=self.num_layers,
                joint_modalities=self.joint_modalities,
                output_format=self.output_format, vision_in_ft=512,
                fc_transpose_quirk=self.fc_transpose_quirk, dtype=self.dtype)
        else:
            self.backbone_pretrainer = SingleBackbonePretrainer(
                v_dropout=self.v_dropout, a_dropout=self.a_dropout,
                dtype=self.dtype)

    def __call__(self, audio_spec: Optional[jnp.ndarray],
                 clips: Optional[jnp.ndarray],
                 wavlm: Optional[jnp.ndarray] = None,
                 train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """audio_spec (B,S,64,W,1) | clips (B,S,T,112,112,3) |
        wavlm (B,S,768). Returns (vouts, aouts), each (B, S)."""
        deterministic = not train
        feats = self.backbones(audio_spec, clips, train, deterministic)

        # ---- vision dispatch (train.py:173-226)
        visual_feats = None
        if len(self.vision_backbones) == 2:
            r2d1, i3d = feats["vision_r2d1"], feats["vision_i3d"]
            if self.fc_layer_for_video_concat is not None:
                visual_feats = self.fc_layer_for_video_concat(
                    jnp.concatenate([r2d1, i3d], axis=-1))
            else:
                visual_feats = self.transformer_visio_modality_fusion(
                    r2d1, i3d)
        elif "R2D1" in self.vision_backbones:
            visual_feats = feats["vision_r2d1"]
        elif "I3D" in self.vision_backbones:
            visual_feats = feats["vision_i3d"]

        # ---- audio dispatch (train.py:229-281)
        aud_feats = None
        if len(self.audio_backbones) == 2:
            rn, wl = feats["audio_resnet18"], wavlm
            if self.fc_layer_for_audio_concat is not None:
                aud_feats = self.fc_layer_for_audio_concat(
                    jnp.concatenate([rn, wl], axis=-1))
            else:
                aud_feats = self.transformer_audio_modality_fusion(rn, wl)
        elif "wavLM" in self.audio_backbones:
            aud_feats = self.fc_layer_for_audio_concat(wavlm)
        elif "ResNet18" in self.audio_backbones:
            aud_feats = feats["audio_resnet18"]

        # ---- fusion / pretrainer (train.py:283-301)
        if self.fusion_model is not None:
            return self.fusion_model(aud_feats, visual_feats, deterministic)
        x = visual_feats if visual_feats is not None else aud_feats
        return self.backbone_pretrainer(x, deterministic)


def model_from_config(cfg) -> JMTModel:
    """Build the composed model from a core.config.Config."""
    mp = cfg.model_params
    dtype = jnp.bfloat16 if mp.compute_dtype == "bfloat16" else None
    finetune = []
    if not mp.freeze_vision_R2D1 and "R2D1" in mp.l_vision_backbones:
        finetune.append("R2D1")
    if not mp.freeze_vision_I3D and "I3D" in mp.l_vision_backbones:
        finetune.append("I3D")
    if not mp.freeze_audio_ResNet18 and "ResNet18" in mp.l_audio_backbones:
        finetune.append("ResNet18")
    return JMTModel(
        vision_backbones=tuple(mp.l_vision_backbones),
        audio_backbones=tuple(mp.l_audio_backbones),
        intra_modal_fusion=mp.intra_modal_fusion,
        joint_modalities=mp.joint_modalities,
        output_format=mp.output_format,
        num_heads=mp.num_heads, num_layers=mp.num_layers,
        v_dropout=mp.v_dropout, a_dropout=mp.a_dropout,
        r2d1_reduce=mp.R2D1_ft_dim_reduce,
        goal=cfg.goal, finetune=tuple(finetune),
        finetune_bn=mp.finetune_bn,
        remat=mp.remat_backbones, remat_granularity=mp.remat_granularity,
        i3d_input_size=mp.i3d_input_size,
        i3d_fused_inception=mp.i3d_fused_inception,
        i3d_chunk=mp.i3d_chunk,
        dtype=dtype)
