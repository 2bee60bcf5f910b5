"""Flax param-tree -> torch state-dict export (the inverse of torch_io).

Closes the reverse interop direction: a jmt_tpu training run's SavedWeights
components can be written as reference-format ``.pt`` state dicts that the
reference stack loads with ``load_state_dict(strict=True)`` and evaluates
(main.py:508-609 is the consumer; main.py:105-177 defines the layout).

Pure numpy: returns flat {torch key: np.ndarray}; callers torch.save after
wrapping in tensors (see ``save_pt``). BatchNorm ``num_batches_tracked``
keys are emitted as int64 zeros (present in every torch BN state dict).

The reference modules construct some submodules they never use in the
shipped forward paths (e.g. MultimodalTransformer_w_JR.final_encoder,
mm_multi_transformers.py:92-93; I3D_WSDDA prediction heads). Those have no
counterpart in this framework's trees; ``complete_for_module`` fills them
from a freshly constructed reference module so strict loading succeeds —
they are forward-dead, so the forward-match guarantee is unaffected.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

Array = np.ndarray
SD = Dict[str, Array]


def _np(x) -> Array:
    return np.asarray(x)


def _key(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def _merge(*sds: SD) -> SD:
    out: SD = {}
    for sd in sds:
        out.update(sd)
    return out


# ---------------------------------------------------------------------------
# leaf inverses (mirror torch_io one-for-one)
# ---------------------------------------------------------------------------
def inv_linear(tree: Mapping[str, Any], prefix: str) -> SD:
    out = {_key(prefix, "weight"): _np(tree["kernel"]).T}
    if "bias" in tree:
        out[_key(prefix, "bias")] = _np(tree["bias"])
    return out


def inv_layernorm(tree, prefix: str) -> SD:
    return {_key(prefix, "weight"): _np(tree["scale"]),
            _key(prefix, "bias"): _np(tree["bias"])}


def inv_mha(tree, prefix: str) -> SD:
    return {
        _key(prefix, "in_proj_weight"): _np(tree["in_proj_kernel"]).T,
        _key(prefix, "in_proj_bias"): _np(tree["in_proj_bias"]),
        _key(prefix, "out_proj.weight"): _np(tree["out_proj_kernel"]).T,
        _key(prefix, "out_proj.bias"): _np(tree["out_proj_bias"]),
    }


def inv_encoder_layer(tree, prefix: str) -> SD:
    return _merge(
        inv_mha(tree["attention"], f"{prefix}.attention"),
        inv_linear(tree["ff1"], f"{prefix}.feed_forward.0"),
        inv_linear(tree["ff2"], f"{prefix}.feed_forward.2"),
        inv_layernorm(tree["layer_norm1"], f"{prefix}.layer_norm1"),
        inv_layernorm(tree["layer_norm2"], f"{prefix}.layer_norm2"))


def inv_encoder_block(tree, prefix: str) -> SD:
    # natural sort: flax names are 'layer{i}' — lexicographic sorted()
    # would order layer10 before layer2 at num_layers >= 10
    def _idx(k):
        m = re.search(r"(\d+)$", k)
        return (int(m.group(1)) if m else -1, k)

    return _merge(*[inv_encoder_layer(tree[k], _key(prefix, f"layers.{i}"))
                    for i, k in enumerate(sorted(tree, key=_idx))])


def inv_regressor(tree, prefix: str) -> SD:
    return _merge(inv_linear(tree["fc1"], f"{prefix}.0"),
                  inv_linear(tree["fc2"], f"{prefix}.3"))


def inv_jmt_w_jr(tree, prefix: str = "") -> SD:
    p = prefix
    out = _merge(
        inv_encoder_block(tree["visual_encoder"], f"{p}visual_encoder"),
        inv_encoder_block(tree["audio_encoder"], f"{p}physiological_encoder"),
        inv_encoder_block(tree["joint_encoder"],
                          f"{p}joint_representation_encoder"),
        inv_mha(tree["cross_attention_v"], f"{p}cross_attention_v"),
        inv_mha(tree["cross_attention_p"], f"{p}cross_attention_p"),
        inv_mha(tree["cross_attention_pv"], f"{p}cross_attention_pv"),
        inv_linear(tree["out_layer_pv"], f"{p}out_layer_pv"))
    if "out_layer1" in tree:  # FC output format
        out.update(inv_linear(tree["out_layer1"], f"{p}out_layer1"))
    else:  # SELF_ATTEN
        out.update(inv_encoder_block(tree["final_encoder"],
                                     f"{p}final_visual_encoder"))
        out.update(inv_mha(tree["final_self_attention"],
                           f"{p}final_self_attention"))
    return out


def inv_jmt_wo_jr(tree, prefix: str = "") -> SD:
    p = prefix
    return _merge(
        inv_encoder_block(tree["visual_encoder"], f"{p}visual_encoder"),
        inv_encoder_block(tree["audio_encoder"], f"{p}physiological_encoder"),
        inv_mha(tree["cross_attention_v"], f"{p}cross_attention_v"),
        inv_mha(tree["cross_attention_p"], f"{p}cross_attention_p"),
        inv_linear(tree["final_layer"], f"{p}final_layer"))


def inv_two_transformers(tree) -> SD:
    """TwoTransformers params -> Two_transformers sd; the fusion variant is
    inferred from the tree (joint_encoder => w_JR; final_layer => wo_JR;
    bare fc => FeatureConcatFC)."""
    mm = tree["mm_transformer"]
    if "joint_encoder" in mm:
        mm_sd = inv_jmt_w_jr(mm, "mm_transformer.")
    elif "final_layer" in mm:
        mm_sd = inv_jmt_wo_jr(mm, "mm_transformer.")
    else:
        mm_sd = inv_linear(mm["fc"], "mm_transformer.fc")
    out = _merge(mm_sd,
                 inv_regressor(tree["vregressor"], "vregressor"),
                 inv_regressor(tree["aregressor"], "aregressor"))
    if "linear" in tree:
        out.update(inv_linear(tree["linear"], "linear"))
    return out


def inv_intra_modal_fusion(tree) -> SD:
    return _merge(
        inv_encoder_block(tree["encoder"], "final_visual_encoder"),
        inv_mha(tree["self_attention"], "final_self_attention"),
        inv_linear(tree["fc"], "fc"))


def inv_fc_layer(tree) -> SD:
    return inv_linear(tree["fc_layer"], "fc_layer")


def inv_pretrainer(tree) -> SD:
    return inv_regressor(tree["regressor"], "regressor")


# ---------------------------------------------------------------------------
# conv/BN backbones
# ---------------------------------------------------------------------------
def inv_conv(tree, prefix: str) -> SD:
    """flax kernel (*k, I, O) -> torch conv weight (O, I, *k)."""
    out = {_key(prefix, "weight"):
           np.moveaxis(_np(tree["kernel"]), (-1, -2), (0, 1))}
    if "bias" in tree:
        out[_key(prefix, "bias")] = _np(tree["bias"])
    return out


def inv_bn(params, stats, prefix: str) -> SD:
    return {
        _key(prefix, "weight"): _np(params["scale"]),
        _key(prefix, "bias"): _np(params["bias"]),
        _key(prefix, "running_mean"): _np(stats["mean"]),
        _key(prefix, "running_var"): _np(stats["var"]),
        _key(prefix, "num_batches_tracked"): np.zeros((), np.int64),
    }


class _Inv:
    """Walk a {params, batch_stats} tree emitting torch keys."""

    def __init__(self, tree):
        self.params = tree["params"]
        self.stats = tree.get("batch_stats") or {}
        self.sd: SD = {}

    def _get(self, tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    def conv(self, torch_prefix: str, *path):
        self.sd.update(inv_conv(self._get(self.params, path), torch_prefix))

    def bn(self, torch_prefix: str, *path):
        self.sd.update(inv_bn(self._get(self.params, path),
                              self._get(self.stats, path), torch_prefix))

    def has(self, *path) -> bool:
        try:
            self._get(self.params, path)
            return True
        except KeyError:
            return False


def inv_resnet18(tree, prefix: str = "") -> SD:
    t = _Inv(tree)
    t.conv(f"{prefix}conv1", "conv1")
    t.bn(f"{prefix}bn1", "bn1")
    for li in range(1, 5):
        for bi in range(2):
            tp = f"{prefix}layer{li}.{bi}"
            fp = f"layer{li}_{bi}"
            t.conv(f"{tp}.conv1", fp, "conv1")
            t.bn(f"{tp}.bn1", fp, "bn1")
            t.conv(f"{tp}.conv2", fp, "conv2")
            t.bn(f"{tp}.bn2", fp, "bn2")
            if t.has(fp, "downsample_conv"):
                t.conv(f"{tp}.downsample.0", fp, "downsample_conv")
                t.bn(f"{tp}.downsample.1", fp, "downsample_bn")
    return t.sd


def inv_video_resnet(tree, arch: str = "r2plus1d", prefix: str = "") -> SD:
    t = _Inv(tree)

    def conv_builder(torch_prefix: str, *path):
        if arch == "r2plus1d":
            t.conv(f"{torch_prefix}.0", *path, "spatial_conv")
            t.bn(f"{torch_prefix}.1", *path, "spatial_bn")
            t.conv(f"{torch_prefix}.3", *path, "temporal_conv")
        else:
            t.conv(torch_prefix, *path, "conv")

    if arch == "r2plus1d":
        t.conv(f"{prefix}stem.0", "stem", "spatial_conv")
        t.bn(f"{prefix}stem.1", "stem", "spatial_bn")
        t.conv(f"{prefix}stem.3", "stem", "temporal_conv")
        t.bn(f"{prefix}stem.4", "stem", "temporal_bn")
    else:
        t.conv(f"{prefix}stem.0", "stem", "conv")
        t.bn(f"{prefix}stem.1", "stem", "bn")
    for li in range(1, 5):
        for bi in range(2):
            tp = f"{prefix}layer{li}.{bi}"
            fp = f"layer{li}_{bi}"
            conv_builder(f"{tp}.conv1.0", fp, "conv1")
            t.bn(f"{tp}.conv1.1", fp, "bn1")
            conv_builder(f"{tp}.conv2.0", fp, "conv2")
            t.bn(f"{tp}.conv2.1", fp, "bn2")
            if t.has(fp, "downsample_conv"):
                t.conv(f"{tp}.downsample.0", fp, "downsample_conv")
                t.bn(f"{tp}.downsample.1", fp, "downsample_bn")
    return t.sd


def inv_weight_norm_conv1d(tree, prefix: str) -> SD:
    """{g (O,), v (k,I,O), bias} -> weight_g (O,1,1) + weight_v (O,I,k)
    (the torch<=2.0 weight_norm key layout the reference uses)."""
    return {
        _key(prefix, "weight_g"): _np(tree["g"]).reshape(-1, 1, 1),
        _key(prefix, "weight_v"): np.transpose(_np(tree["v"]), (2, 1, 0)),
        _key(prefix, "bias"): _np(tree["bias"]),
    }


def inv_tcn(tree, prefix: str = "") -> SD:
    out: SD = {}
    for i in range(len(tree)):
        block = tree[f"block{i}"]
        tp = f"{prefix}network.{i}"
        out.update(inv_weight_norm_conv1d(block["conv1"], f"{tp}.conv1"))
        out.update(inv_weight_norm_conv1d(block["conv2"], f"{tp}.conv2"))
        # the reference TemporalBlock registers conv1/conv2 BOTH as
        # attributes AND inside its nn.Sequential `net` (slots 0 and 4),
        # so its state dict carries both aliases — strict load needs both
        for src, dst in ((f"{tp}.conv1", f"{tp}.net.0"),
                         (f"{tp}.conv2", f"{tp}.net.4")):
            for suf in ("weight_g", "weight_v", "bias"):
                out[f"{dst}.{suf}"] = out[f"{src}.{suf}"]
        if "downsample_kernel" in block:
            out[f"{tp}.downsample.weight"] = np.transpose(
                _np(block["downsample_kernel"]), (2, 1, 0))
            out[f"{tp}.downsample.bias"] = _np(block["downsample_bias"])
    return out


def inv_i3d(tree, prefix: str = "") -> SD:
    t = _Inv(tree)

    def unit3d(torch_prefix: str, *path, with_bn: bool = True):
        t.conv(f"{torch_prefix}.conv3d", *path)
        if with_bn:
            t.bn(f"{torch_prefix}.bn", *path, "bn")

    unit3d(f"{prefix}Conv3d_1a_7x7", "Conv3d_1a_7x7")
    unit3d(f"{prefix}Conv3d_2b_1x1", "Conv3d_2b_1x1")
    unit3d(f"{prefix}Conv3d_2c_3x3", "Conv3d_2c_3x3")
    for mixed in ("Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
                  "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c"):
        for branch in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            unit3d(f"{prefix}{mixed}.{branch}", mixed, branch)
    if t.has("logits"):
        unit3d(f"{prefix}logits", "logits", with_bn=False)
    return t.sd


def inv_r2d1_flatten_fc(tree, prefix: str = "",
                        fmap_chw=(512, 1, 7, 7)) -> SD:
    """Inverse column permute of torch_io.r2d1_flatten_fc_params."""
    c, tt, h, w = fmap_chw
    wk = _np(tree["kernel"]).T              # (O, t*h*w*c)
    wk = wk.reshape(-1, tt, h, w, c).transpose(0, 4, 1, 2, 3).reshape(
        wk.shape[0], -1)                    # (O, c*t*h*w)
    return {_key(prefix, "weight"): wk,
            _key(prefix, "bias"): _np(tree["bias"])}


def inv_i3d_tcn(tree) -> SD:
    i3d = {"params": tree["params"]["i3d"],
           "batch_stats": tree["batch_stats"]["i3d"]}
    return _merge(inv_i3d(i3d, prefix="i3d_WSDDA."),
                  inv_tcn(tree["params"]["temporal"], prefix="temporal."))


def inv_tsav(tree) -> SD:
    """TwoStreamBackbones variables -> all_backbones.pt sd (submodule
    attribute prefixes per tsav.py:119-173)."""
    params, stats = tree["params"], tree.get("batch_stats") or {}
    out: SD = {}
    if "audio_resnet18" in params:
        out.update(inv_resnet18(
            {"params": params["audio_resnet18"],
             "batch_stats": stats["audio_resnet18"]},
            prefix="audio_resnet18.resnet."))
    if "vision_r2d1" in params:
        out.update(inv_video_resnet(
            {"params": params["vision_r2d1"],
             "batch_stats": stats["vision_r2d1"]},
            prefix="vision_r2d1.r2plus1d."))
    if "vision_r2d1_fc" in params:
        out.update(inv_r2d1_flatten_fc(params["vision_r2d1_fc"],
                                       prefix="vision_r2d1_fc"))
    if "vision_i3d" in params:
        sub = inv_i3d_tcn({"params": params["vision_i3d"],
                           "batch_stats": stats["vision_i3d"]})
        out.update({f"vision_i3d.{k}": v for k, v in sub.items()})
    return out


# ---------------------------------------------------------------------------
# component dispatch (SavedWeights layout, main.py:105-177)
# ---------------------------------------------------------------------------
def component_torch_sd(name: str, piece: Mapping[str, Any]) -> SD:
    """One SavedWeights component ({'params', 'batch_stats'} tree, as
    written by core.checkpoint.export_components) -> torch state dict."""
    p = piece["params"]
    if name == "fusion_w":
        return inv_two_transformers(p)
    if name == "backbone_pretrainer_w":
        return inv_pretrainer(p)
    if name == "all_backbones":
        return inv_tsav(piece)
    if name == "audio_resnet18":
        return inv_resnet18(piece, prefix="resnet.")
    if name == "vision_r2d1":
        return inv_video_resnet(piece, prefix="r2plus1d.")
    if name == "vision_r2d1_fc":
        return inv_r2d1_flatten_fc(p)
    if name == "vision_i3d":
        return inv_i3d_tcn(piece)
    if name in ("fc_layer_for_audio_concat", "fc_layer_for_video_concat"):
        return inv_fc_layer(p)
    if name in ("transformer_audio_modality_fusion",
                "transformer_visio_modality_fusion"):
        return inv_intra_modal_fusion(p)
    raise UnknownComponent(name)


class UnknownComponent(KeyError):
    """Not a SavedWeights component name — distinct from KeyErrors raised
    inside converters (which indicate a real conversion failure and must
    NOT be silently skipped by export_reference_pt)."""


# reference submodules that exist but never run in the shipped forward
# paths — fill-from-init is safe (see module docstring)
_DEAD_KEY_PATTERNS = (
    r"^(mm_transformer\.)?final_encoder\.",          # w_JR 3072-d encoder
    r"^(mm_transformer\.)?final_visual_encoder\.",   # only dead for FC fmt
    r"^(mm_transformer\.)?final_self_attention\.",   # only dead for FC fmt
    r"^(mm_transformer\.)?out_layer1",               # dead for SELF_ATTEN
    r"^i3d_WSDDA\.logits\.",                         # replaced head
    r"^(vision_i3d\.)?(regressor|predictions|fc)",   # I3D_WSDDA dead heads
    r"\.attention\.",                                # TCN AttentionBlock off
)


def complete_for_module(sd: SD, module_sd: Mapping[str, Any]) -> SD:
    """Fill keys the target torch module has but we don't export, from the
    module's own (freshly initialized) state dict — ONLY if every such key
    is a known forward-dead submodule. Returns a strict-loadable sd."""
    missing = [k for k in module_sd if k not in sd]
    bad = [k for k in missing
           if not any(re.search(pat, k) for pat in _DEAD_KEY_PATTERNS)]
    if bad:
        raise KeyError(f"refusing to fill non-dead missing keys: {bad[:8]}")
    unexpected = [k for k in sd if k not in module_sd]
    if unexpected:
        raise KeyError(f"exported keys absent from module: {unexpected[:8]}")
    out = dict(sd)
    for k in missing:
        out[k] = _np(module_sd[k])
    return out


def _dead_encoder_layer(dim: int, hidden: int, prefix: str) -> SD:
    z = np.zeros
    return {
        f"{prefix}.attention.in_proj_weight": z((3 * dim, dim), np.float32),
        f"{prefix}.attention.in_proj_bias": z((3 * dim,), np.float32),
        f"{prefix}.attention.out_proj.weight": z((dim, dim), np.float32),
        f"{prefix}.attention.out_proj.bias": z((dim,), np.float32),
        f"{prefix}.feed_forward.0.weight": z((hidden, dim), np.float32),
        f"{prefix}.feed_forward.0.bias": z((hidden,), np.float32),
        f"{prefix}.feed_forward.2.weight": z((dim, hidden), np.float32),
        f"{prefix}.feed_forward.2.bias": z((dim,), np.float32),
        f"{prefix}.layer_norm1.weight": np.ones((dim,), np.float32),
        f"{prefix}.layer_norm1.bias": z((dim,), np.float32),
        f"{prefix}.layer_norm2.weight": np.ones((dim,), np.float32),
        f"{prefix}.layer_norm2.bias": z((dim,), np.float32),
    }


def _dead_i3d_heads(prefix: str = "") -> SD:
    """I3D_WSDDA's forward-dead heads (I3DWSDDA.py:9-37: `predictions`,
    `vregressor`/`aregressor`, and the InceptionI3d `logits` Unit3D) —
    never run in the extract_features path the reference uses."""
    z = np.zeros
    out: SD = {
        f"{prefix}i3d_WSDDA.logits.conv3d.weight":
            z((400, 1024, 1, 1, 1), np.float32),
        f"{prefix}i3d_WSDDA.logits.conv3d.bias": z((400,), np.float32),
        f"{prefix}predictions.0.conv3d.weight":
            z((512, 1024, 1, 1, 1), np.float32),
        f"{prefix}predictions.0.conv3d.bias": z((512,), np.float32),
        f"{prefix}predictions.1.conv3d.weight":
            z((1, 512, 1, 1, 1), np.float32),
        f"{prefix}predictions.1.conv3d.bias": z((1,), np.float32),
    }
    for reg in ("vregressor", "aregressor"):
        out.update({
            f"{prefix}{reg}.0.weight": z((128, 512), np.float32),
            f"{prefix}{reg}.0.bias": z((128,), np.float32),
            f"{prefix}{reg}.1.weight": np.ones((128,), np.float32),
            f"{prefix}{reg}.1.bias": z((128,), np.float32),
            f"{prefix}{reg}.1.running_mean": z((128,), np.float32),
            f"{prefix}{reg}.1.running_var": np.ones((128,), np.float32),
            f"{prefix}{reg}.1.num_batches_tracked":
                np.zeros((), np.int64),
            f"{prefix}{reg}.2.weight": z((1, 128), np.float32),
            f"{prefix}{reg}.2.bias": z((1,), np.float32),
        })
    return out


def synthesize_dead_keys(name: str, sd: SD) -> SD:
    """Add the reference modules' forward-dead submodule keys (zeros /
    identity-norm values, correct shapes) so the exported .pt strict-loads
    WITHOUT needing a live torch module for complete_for_module.

    Dead sets per component (shapes verified against the reference
    modules' own state dicts in tests/test_torch_export.py):
    * fusion_w (w_JR): `mm_transformer.final_encoder` — constructed
      unconditionally (mm_multi_transformers.py:92-93), never called.
    * vision_i3d / all_backbones' vision_i3d: `predictions`,
      `vregressor`/`aregressor`, `i3d_WSDDA.logits` (I3DWSDDA.py) —
      only extract_features + temporal run in the shipped forward."""
    out = dict(sd)
    fe = "mm_transformer.final_encoder."
    probe = "mm_transformer.joint_representation_encoder.layers."
    if any(k.startswith(probe) for k in sd) \
            and not any(k.startswith(fe) for k in sd):
        # w_JR variant: mirror the live encoders' layer count/hidden dim
        vis = "mm_transformer.visual_encoder.layers."
        n_layers = 1 + max(int(k[len(vis):].split(".")[0])
                           for k in sd if k.startswith(vis))
        hidden = np.asarray(
            sd[f"{vis}0.feed_forward.0.weight"]).shape[0]
        for i in range(n_layers):
            out.update(_dead_encoder_layer(3072, hidden,
                                           f"{fe}layers.{i}"))
    if name == "vision_i3d":
        out.update(_dead_i3d_heads())
    if name == "all_backbones" and any(
            k.startswith("vision_i3d.") for k in sd):
        out.update(_dead_i3d_heads(prefix="vision_i3d."))
    # VideoModel's 17-way fc head (reference tsav.py:44-46) is replaced
    # by Dummy before any forward (tsav.py:172) — dead, but in the sd
    for pfx in ("", "vision_r2d1."):
        if (name in ("vision_r2d1", "all_backbones")
                and any(k.startswith(f"{pfx}r2plus1d.stem") for k in sd)):
            out[f"{pfx}r2plus1d.fc.1.weight"] = np.zeros((17, 512),
                                                         np.float32)
            out[f"{pfx}r2plus1d.fc.1.bias"] = np.zeros((17,), np.float32)
    return out


def save_pt(sd: SD, path: str) -> str:
    """torch.save a numpy sd as tensors (float32/int64 preserved)."""
    import torch
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, path)
    return path


def export_reference_pt(weights_dir: str, out_dir: str = None) -> Dict[str, str]:
    """Convert every SavedWeights/*.msgpack component in `weights_dir` to a
    reference-format .pt next to it (or into out_dir)."""
    import os
    from jmt_tpu.core.checkpoint import load_component
    out_dir = out_dir or weights_dir
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for fn in sorted(os.listdir(weights_dir)):
        if not fn.endswith(".msgpack") or fn == "train_state.msgpack":
            continue
        name = fn[:-len(".msgpack")]
        try:
            sd = component_torch_sd(name, load_component(
                os.path.join(weights_dir, fn)))
        except UnknownComponent:
            continue  # not a SavedWeights component; converter errors
            # (incl. KeyErrors from inside a converter) propagate loudly
        sd = synthesize_dead_keys(name, sd)
        written[name] = save_pt(sd, os.path.join(out_dir, f"{name}.pt"))
    return written
