"""Torch state-dict <-> flax param-tree conversion.

Enables (1) golden parity tests against reference modules and (2) loading
the reference's pretrained ``SavedWeights/*.pt`` exports (main.py:105-177)
into this framework. Pure numpy in/out; torch is only needed by callers that
unpickle .pt files.

Conventions:
* torch Linear weight (out, in)  -> flax kernel (in, out): transpose.
* torch MHA packed in_proj_weight (3E, E) -> in_proj_kernel (E, 3E).
* torch LayerNorm weight/bias -> scale/bias.
* ``module.`` DataParallel prefixes are stripped, mirroring the reference's
  load_clean_weights (main.py:54-70).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


Array = np.ndarray
Params = Dict[str, Any]


def _np(x) -> Array:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def strip_module_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Strip nn.DataParallel 'module.' prefixes (reference main.py:54-70)."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def _key(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def linear_params(sd: Mapping[str, Any], prefix: str,
                  bias: bool = True) -> Params:
    out = {"kernel": _np(sd[_key(prefix, "weight")]).T}
    if bias:
        out["bias"] = _np(sd[_key(prefix, "bias")])
    return out


def layernorm_params(sd: Mapping[str, Any], prefix: str) -> Params:
    return {"scale": _np(sd[_key(prefix, "weight")]),
            "bias": _np(sd[_key(prefix, "bias")])}


def mha_params(sd: Mapping[str, Any], prefix: str) -> Params:
    return {
        "in_proj_kernel": _np(sd[_key(prefix, "in_proj_weight")]).T,
        "in_proj_bias": _np(sd[_key(prefix, "in_proj_bias")]),
        "out_proj_kernel": _np(sd[_key(prefix, "out_proj.weight")]).T,
        "out_proj_bias": _np(sd[_key(prefix, "out_proj.bias")]),
    }


def encoder_layer_params(sd: Mapping[str, Any], prefix: str) -> Params:
    return {
        "attention": mha_params(sd, f"{prefix}.attention"),
        "ff1": linear_params(sd, f"{prefix}.feed_forward.0"),
        "ff2": linear_params(sd, f"{prefix}.feed_forward.2"),
        "layer_norm1": layernorm_params(sd, f"{prefix}.layer_norm1"),
        "layer_norm2": layernorm_params(sd, f"{prefix}.layer_norm2"),
    }


def encoder_block_params(sd: Mapping[str, Any], prefix: str,
                         num_layers: int) -> Params:
    return {f"layer{i}": encoder_layer_params(sd, _key(prefix, f"layers.{i}"))
            for i in range(num_layers)}


def regressor_params(sd: Mapping[str, Any], prefix: str) -> Params:
    # reference regressors are Sequential(Linear, ReLU, Dropout, Linear)
    return {"fc1": linear_params(sd, f"{prefix}.0"),
            "fc2": linear_params(sd, f"{prefix}.3")}


def jmt_w_jr_params(sd: Mapping[str, Any], num_layers: int,
                    output_format: str, prefix: str = "") -> Params:
    """MultimodalTransformer_w_JR -> JointMultimodalTransformer params.

    Ignores the reference's constructed-but-unused ``final_encoder`` (3072-d,
    mm_multi_transformers.py:92-93).
    """
    p = prefix
    out: Params = {
        "visual_encoder": encoder_block_params(sd, f"{p}visual_encoder",
                                               num_layers),
        "audio_encoder": encoder_block_params(
            sd, f"{p}physiological_encoder", num_layers),
        "joint_encoder": encoder_block_params(
            sd, f"{p}joint_representation_encoder", num_layers),
        "cross_attention_v": mha_params(sd, f"{p}cross_attention_v"),
        "cross_attention_p": mha_params(sd, f"{p}cross_attention_p"),
        "cross_attention_pv": mha_params(sd, f"{p}cross_attention_pv"),
        "out_layer_pv": linear_params(sd, f"{p}out_layer_pv"),
    }
    if output_format == "FC":
        out["out_layer1"] = linear_params(sd, f"{p}out_layer1")
    else:
        out["final_encoder"] = encoder_block_params(
            sd, f"{p}final_visual_encoder", num_layers)
        out["final_self_attention"] = mha_params(
            sd, f"{p}final_self_attention")
    return out


def jmt_wo_jr_params(sd: Mapping[str, Any], num_layers: int,
                     prefix: str = "") -> Params:
    p = prefix
    return {
        "visual_encoder": encoder_block_params(sd, f"{p}visual_encoder",
                                               num_layers),
        "audio_encoder": encoder_block_params(
            sd, f"{p}physiological_encoder", num_layers),
        "cross_attention_v": mha_params(sd, f"{p}cross_attention_v"),
        "cross_attention_p": mha_params(sd, f"{p}cross_attention_p"),
        "final_layer": linear_params(sd, f"{p}final_layer"),
    }


def feature_concat_fc_params(sd: Mapping[str, Any],
                             prefix: str = "") -> Params:
    return {"fc": linear_params(sd, f"{prefix}fc")}


def two_transformers_params(sd: Mapping[str, Any], num_layers: int,
                            joint_modalities: str, output_format: str,
                            vision_in_ft: int = 512) -> Params:
    """Two_transformers -> TwoTransformers params."""
    sd = strip_module_prefix(sd)
    if joint_modalities == "TRANSFORMER":
        mm = jmt_w_jr_params(sd, num_layers, output_format,
                             prefix="mm_transformer.")
    elif joint_modalities == "FC":
        mm = feature_concat_fc_params(sd, prefix="mm_transformer.")
    else:
        mm = jmt_wo_jr_params(sd, num_layers, prefix="mm_transformer.")
    out: Params = {
        "mm_transformer": mm,
        "vregressor": regressor_params(sd, "vregressor"),
        "aregressor": regressor_params(sd, "aregressor"),
    }
    if vision_in_ft != 512:
        out["linear"] = linear_params(sd, "linear")
    return out


def intra_modal_fusion_params(sd: Mapping[str, Any],
                              num_layers: int) -> Params:
    sd = strip_module_prefix(sd)
    return {
        "encoder": encoder_block_params(sd, "final_visual_encoder",
                                        num_layers),
        "self_attention": mha_params(sd, "final_self_attention"),
        "fc": linear_params(sd, "fc"),
    }


def fc_layer_params(sd: Mapping[str, Any]) -> Params:
    sd = strip_module_prefix(sd)
    return {"fc_layer": linear_params(sd, "fc_layer")}


def pretrainer_params(sd: Mapping[str, Any]) -> Params:
    sd = strip_module_prefix(sd)
    return {"regressor": regressor_params(sd, "regressor")}
