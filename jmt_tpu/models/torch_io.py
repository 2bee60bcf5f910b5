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


# ----------------------------------------------------------------------------
# Backbones (conv/BN models): converters return
# {"params": tree, "batch_stats": tree} matching the flax variable
# collections.
# ----------------------------------------------------------------------------
def conv_kernel(sd: Mapping[str, Any], prefix: str,
                bias: bool = False) -> Params:
    """torch conv weight (O, I, *k) -> flax kernel (*k, I, O)."""
    w = _np(sd[_key(prefix, "weight")])
    kernel = np.moveaxis(w, (0, 1), (-1, -2))
    out = {"kernel": kernel}
    if bias:
        out["bias"] = _np(sd[_key(prefix, "bias")])
    return out


def bn_vars(sd: Mapping[str, Any], prefix: str):
    params = {"scale": _np(sd[_key(prefix, "weight")]),
              "bias": _np(sd[_key(prefix, "bias")])}
    stats = {"mean": _np(sd[_key(prefix, "running_mean")]),
             "var": _np(sd[_key(prefix, "running_var")])}
    return params, stats


class _VarTree:
    """Accumulates params + batch_stats with mirrored structure."""

    def __init__(self):
        self.params: Params = {}
        self.stats: Params = {}

    def _put(self, tree: Params, path, piece) -> None:
        for p in path[:-1]:
            tree = tree.setdefault(p, {})
        tree[path[-1]] = piece

    def conv(self, sd, torch_prefix: str, *path, bias: bool = False):
        self._put(self.params, path, conv_kernel(sd, torch_prefix, bias=bias))

    def bn(self, sd, torch_prefix: str, *path):
        p, s = bn_vars(sd, torch_prefix)
        self._put(self.params, path, p)
        self._put(self.stats, path, s)

    def raw(self, piece: Params, *path):
        self._put(self.params, path, piece)

    def done(self) -> Params:
        return {"params": self.params, "batch_stats": self.stats}


def resnet18_vars(sd: Mapping[str, Any]) -> Params:
    """torchvision resnet18 (1-ch or 3-ch conv1) -> models.resnet18.ResNet18.

    The reference replaces the fc head with identity (tsav.py:165); fc keys
    are ignored here.
    """
    sd = strip_module_prefix(sd)
    t = _VarTree()
    t.conv(sd, "conv1", "conv1")
    t.bn(sd, "bn1", "bn1")
    for li in range(1, 5):
        for bi in range(2):
            tp = f"layer{li}.{bi}"
            fp = f"layer{li}_{bi}"
            t.conv(sd, f"{tp}.conv1", fp, "conv1")
            t.bn(sd, f"{tp}.bn1", fp, "bn1")
            t.conv(sd, f"{tp}.conv2", fp, "conv2")
            t.bn(sd, f"{tp}.bn2", fp, "bn2")
            if f"{tp}.downsample.0.weight" in sd:
                t.conv(sd, f"{tp}.downsample.0", fp, "downsample_conv")
                t.bn(sd, f"{tp}.downsample.1", fp, "downsample_bn")
    return t.done()


def video_resnet_vars(sd: Mapping[str, Any], arch: str = "r2plus1d",
                      prefix: str = "") -> Params:
    """torchvision-style VideoResNet -> models.video_resnet.VideoResNet.

    Handles the three conv makers (video_resnet.py:19-82). The fc head is
    Dummy'd in the reference feature path (tsav.py:172-173) and ignored.
    """
    sd = strip_module_prefix(sd)
    t = _VarTree()

    def conv_builder(torch_prefix: str, *path):
        if arch == "r2plus1d":
            t.conv(sd, f"{torch_prefix}.0", *path, "spatial_conv")
            t.bn(sd, f"{torch_prefix}.1", *path, "spatial_bn")
            t.conv(sd, f"{torch_prefix}.3", *path, "temporal_conv")
        else:
            t.conv(sd, torch_prefix, *path, "conv")

    # stem
    if arch == "r2plus1d":
        t.conv(sd, f"{prefix}stem.0", "stem", "spatial_conv")
        t.bn(sd, f"{prefix}stem.1", "stem", "spatial_bn")
        t.conv(sd, f"{prefix}stem.3", "stem", "temporal_conv")
        t.bn(sd, f"{prefix}stem.4", "stem", "temporal_bn")
    else:
        t.conv(sd, f"{prefix}stem.0", "stem", "conv")
        t.bn(sd, f"{prefix}stem.1", "stem", "bn")

    for li in range(1, 5):
        for bi in range(2):
            tp = f"{prefix}layer{li}.{bi}"
            fp = f"layer{li}_{bi}"
            conv_builder(f"{tp}.conv1.0", fp, "conv1")
            t.bn(sd, f"{tp}.conv1.1", fp, "bn1")
            conv_builder(f"{tp}.conv2.0", fp, "conv2")
            t.bn(sd, f"{tp}.conv2.1", fp, "bn2")
            if f"{tp}.downsample.0.weight" in sd:
                t.conv(sd, f"{tp}.downsample.0", fp, "downsample_conv")
                t.bn(sd, f"{tp}.downsample.1", fp, "downsample_bn")
    return t.done()


def _weight_norm_conv1d(sd: Mapping[str, Any], prefix: str) -> Params:
    """torch weight_norm Conv1d: weight_g (O,1,1) + weight_v (O,I,k) ->
    {g (O,), v (k,I,O), bias (O,)}. Also accepts the torch>=2.1
    parametrize key layout."""
    if _key(prefix, "weight_g") in sd:
        g = _np(sd[_key(prefix, "weight_g")])
        v = _np(sd[_key(prefix, "weight_v")])
    else:  # parametrizations.weight.original0/original1
        g = _np(sd[_key(prefix, "parametrizations.weight.original0")])
        v = _np(sd[_key(prefix, "parametrizations.weight.original1")])
    return {"g": g.reshape(-1), "v": np.transpose(v, (2, 1, 0)),
            "bias": _np(sd[_key(prefix, "bias")])}


def tcn_params(sd: Mapping[str, Any], num_blocks: int,
               prefix: str = "") -> Params:
    """TemporalConvNet (temporal_convolutional_model.py:60-82)."""
    out: Params = {}
    for i in range(num_blocks):
        tp = f"{prefix}network.{i}"
        block: Params = {
            "conv1": _weight_norm_conv1d(sd, f"{tp}.conv1"),
            "conv2": _weight_norm_conv1d(sd, f"{tp}.conv2"),
        }
        if f"{tp}.downsample.weight" in sd:
            w = _np(sd[f"{tp}.downsample.weight"])  # (O, I, 1)
            block["downsample_kernel"] = np.transpose(w, (2, 1, 0))
            block["downsample_bias"] = _np(sd[f"{tp}.downsample.bias"])
        out[f"block{i}"] = block
    return out


def i3d_vars(sd: Mapping[str, Any], prefix: str = "") -> Params:
    """InceptionI3d feature path (pytorch_i3d_new.py:247-456)."""
    sd = strip_module_prefix(sd)
    t = _VarTree()

    def unit3d(torch_prefix: str, *path, bias: bool = False,
               with_bn: bool = True):
        t.conv(sd, f"{torch_prefix}.conv3d", *path, bias=bias)
        if with_bn:
            t.bn(sd, f"{torch_prefix}.bn", *path, "bn")

    unit3d(f"{prefix}Conv3d_1a_7x7", "Conv3d_1a_7x7")
    unit3d(f"{prefix}Conv3d_2b_1x1", "Conv3d_2b_1x1")
    unit3d(f"{prefix}Conv3d_2c_3x3", "Conv3d_2c_3x3")
    for mixed in ("Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
                  "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c"):
        for branch in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            unit3d(f"{prefix}{mixed}.{branch}", mixed, branch)
    if f"{prefix}logits.conv3d.weight" in sd:
        unit3d(f"{prefix}logits", "logits", bias=True, with_bn=False)
    return t.done()


def r2d1_flatten_fc_params(sd: Mapping[str, Any], prefix: str = "",
                           fmap_chw=(512, 1, 7, 7)) -> Params:
    """The FLATTEN-reduce fc (tsav.py:156-157) flattens a channel-FIRST
    (512,1,7,7) map; ours flattens channels-LAST (1,7,7,512). Permute the
    torch weight columns accordingly."""
    w = _np(sd[_key(prefix, "weight")])  # (512, 25088)
    c, t, h, wd = fmap_chw
    w = w.reshape(-1, c, t, h, wd).transpose(0, 2, 3, 4, 1).reshape(
        w.shape[0], -1)
    return {"kernel": w.T, "bias": _np(sd[_key(prefix, "bias")])}


def i3d_tcn_vars(sd: Mapping[str, Any]) -> Params:
    """I3D_WSDDA -> models.i3d.I3DTCN. The unused predictions/regressor
    heads (I3DWSDDA.py:9-38) are ignored."""
    sd = strip_module_prefix(sd)
    i3d = i3d_vars(sd, prefix="i3d_WSDDA.")
    tcn = tcn_params(sd, num_blocks=4, prefix="temporal.")
    return {"params": {"i3d": i3d["params"], "temporal": tcn},
            "batch_stats": {"i3d": i3d["batch_stats"]}}


def _sub_sd(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def tsav_vars(sd: Mapping[str, Any]) -> Params:
    """TwoStreamAuralVisualModel sd (the reference's all_backbones.pt
    export, main.py:105-177) -> models.tsav.TwoStreamBackbones variables.

    Submodule attribute names per tsav.py:119-173: ``audio_resnet18``
    (AudioModel -> .resnet), ``vision_r2d1`` (VideoModel -> .r2plus1d),
    ``vision_r2d1_fc`` (the FLATTEN-reduce Linear), ``vision_i3d``
    (I3D_WSDDA)."""
    sd = strip_module_prefix(sd)
    params: Params = {}
    stats: Params = {}
    if any(k.startswith("audio_resnet18.") for k in sd):
        tree = resnet18_vars(_sub_sd(sd, "audio_resnet18.resnet."))
        params["audio_resnet18"] = tree["params"]
        stats["audio_resnet18"] = tree["batch_stats"]
    if any(k.startswith("vision_r2d1.") for k in sd):
        tree = video_resnet_vars(_sub_sd(sd, "vision_r2d1.r2plus1d."),
                                 arch="r2plus1d")
        params["vision_r2d1"] = tree["params"]
        stats["vision_r2d1"] = tree["batch_stats"]
    if "vision_r2d1_fc.weight" in sd:
        params["vision_r2d1_fc"] = r2d1_flatten_fc_params(
            sd, prefix="vision_r2d1_fc")
    if any(k.startswith("vision_i3d.") for k in sd):
        tree = i3d_tcn_vars(_sub_sd(sd, "vision_i3d."))
        params["vision_i3d"] = tree["params"]
        stats["vision_i3d"] = tree["batch_stats"]
    return {"params": params, "batch_stats": stats}
