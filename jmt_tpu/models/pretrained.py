"""Pretrained-weight initialization policy (init_w_R2D1/ResNet18/I3D).

Capability target: the reference's pretrained-load logic scattered across
main.py:218-302 and models/tsav.py:35-116, which the flagship recipe of
record depends on (frozen PRETRAINED backbones):

* R2D1    KINETICS400 -> torchvision r2plus1d_18 Kinetics sd (torch.hub,
          video_resnet.py:12-16); the 4-channel stem round-trip in the
          reference (tsav.py:47-56 widens to 4ch, main.py:257-268 slices
          back to 3ch) is an identity on the pretrained channels.
          AFFWILD2 -> PretrainedWeights/vision_TSAV_Sub4_544k.pt — a
          VideoModel sd (``r2plus1d.`` prefix) with a 4-ch stem, loaded
          BEFORE the 3-ch conversion, so the stem is sliced to its first 3
          input channels here (main.py:257-268).
          OUR_AFFWILD2 -> R2D1_OUR_AffWild2/SavedWeights/vision_r2d1.pt
          (3-ch already; saved with MAX reduce — asserted like
          main.py:281).
* ResNet18 IMAGENET -> torchvision resnet18 ImageNet sd; conv1 is replaced
          by a 1-channel conv whose weight is the MEAN over the RGB input
          channels (tsav.py:78-85).
          AFFWILD2 -> audio_TSAV_Sub4_544k.pt (AudioModel sd, ``resnet.``
          prefix, conv1 already 1-ch).
          OUR_AFFWILD2 -> ResNet18_OUR_AffWild2/SavedWeights/
          audio_resnet18.pt.
* I3D     KINETICS400 -> rgb_imagenet.pt — a RAW InceptionI3d sd loaded
          into the i3d trunk only; the TCN head stays random
          (tsav.py:99-102).
          AFFWILD2 -> Val_model_valence_cnn_lstm_mil_64_new.t7 — a
          ``{'net': sd}`` payload with DataParallel ``module.`` prefixes
          over the full I3D_WSDDA (i3d + TCN), tsav.py:104-114.
          OUR_AFFWILD2 -> I3D_OUR_AffWild2/SavedWeights/vision_i3d.pt.

Paths are rooted at ``cfg.pretrained_weights_dir`` (first-class config —
the reference hardcodes ``<repo>/PretrainedWeights/``); file names follow
the reference conventions plus torch.hub cache names for the torchvision
checkpoints. torch is required only at load time.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from jmt_tpu.models import torch_io as tio

Params = Dict[str, Any]

# candidate file names per (backbone, source), relative to
# cfg.pretrained_weights_dir — first existing wins
_FILES = {
    ("R2D1", "KINETICS400"): ["r2plus1d_18-91a641e6.pth",
                              "r2plus1d_18_kinetics400.pt",
                              "r2plus1d_18.pt"],
    ("R2D1", "AFFWILD2"): ["vision_TSAV_Sub4_544k.pt"],
    ("R2D1", "OUR_AFFWILD2"): [
        os.path.join("R2D1_OUR_AffWild2", "SavedWeights", "vision_r2d1.pt")],
    ("ResNet18", "IMAGENET"): ["resnet18-f37072fd.pth",
                               "resnet18_imagenet.pt", "resnet18.pt"],
    ("ResNet18", "AFFWILD2"): ["audio_TSAV_Sub4_544k.pt"],
    ("ResNet18", "OUR_AFFWILD2"): [
        os.path.join("ResNet18_OUR_AffWild2", "SavedWeights",
                     "audio_resnet18.pt")],
    ("I3D", "KINETICS400"): ["rgb_imagenet.pt"],
    ("I3D", "AFFWILD2"): ["Val_model_valence_cnn_lstm_mil_64_new.t7"],
    ("I3D", "OUR_AFFWILD2"): [
        os.path.join("I3D_OUR_AffWild2", "SavedWeights", "vision_i3d.pt")],
}

_COMPONENT_OF = {"R2D1": "vision_r2d1", "ResNet18": "audio_resnet18",
                 "I3D": "vision_i3d"}


def _our_affwild2_candidates(backbone: str):
    """OUR_AFFWILD2 sources: a jmt_tpu PRETRAINING run's own component
    export (``SavedWeights/{component}.msgpack``) closes the reference's
    pretrain->flagship self-loop (main.py:270-302) natively; reference
    ``.pt`` layouts remain accepted. ``pretrained_weights_dir`` may point
    at a weights root holding ``{Backbone}_OUR_AffWild2`` experiment dirs
    (reference convention) or directly at the experiment dir itself."""
    comp = _COMPONENT_OF[backbone]
    exp = f"{backbone}_OUR_AffWild2"
    return [
        os.path.join(exp, "SavedWeights", comp + ".msgpack"),
        os.path.join(exp, "SavedWeights", comp + ".pt"),
        os.path.join("SavedWeights", comp + ".msgpack"),
        os.path.join("SavedWeights", comp + ".pt"),
        comp + ".msgpack",
        comp + ".pt",
    ]


for _bb in _COMPONENT_OF:
    _FILES[(_bb, "OUR_AFFWILD2")] = _our_affwild2_candidates(_bb)


def resolve_path(root: str, backbone: str, source: str) -> str:
    cands = _FILES[(backbone, source)]
    for c in cands:
        p = os.path.join(root, c)
        if os.path.isfile(p):
            return p
    raise FileNotFoundError(
        f"pretrained weights for {backbone}/{source}: none of "
        f"{cands} found under {root!r} (set pretrained_weights_dir to the "
        f"reference's PretrainedWeights/ analog)")


def _load_sd(path: str) -> Dict[str, Any]:
    """torch.load + the reference's laundering: ``{'net': sd}`` unwrap
    (tsav.py:104-114) and DataParallel ``module.`` strip (main.py:54-70)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and isinstance(sd.get("net"), dict):
        sd = sd["net"]
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return tio.strip_module_prefix(sd)


def _strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}
    return sd


def r2d1_vars_from_sd(sd: Dict[str, Any]) -> Params:
    """VideoModel (``r2plus1d.`` prefix) or raw torchvision sd -> flax
    vision_r2d1 variables, with the 4ch->3ch stem slice (main.py:257-268)."""
    sd = _strip_prefix(sd, "r2plus1d.")
    tree = tio.video_resnet_vars(sd, arch="r2plus1d")
    stem = tree["params"]["stem"]["spatial_conv"]
    if stem["kernel"].shape[-2] == 4:  # (1,7,7,in,45): slice in-ch to 3
        stem["kernel"] = np.ascontiguousarray(stem["kernel"][..., :3, :])
    return tree


def resnet18_vars_from_sd(sd: Dict[str, Any], source: str) -> Params:
    """AudioModel (``resnet.`` prefix) or raw torchvision sd -> flax
    audio_resnet18 variables; IMAGENET applies the conv1 RGB mean-collapse
    to 1 channel (tsav.py:78-85)."""
    sd = _strip_prefix(sd, "resnet.")
    tree = tio.resnet18_vars(sd)
    conv1 = tree["params"]["conv1"]
    if source == "IMAGENET":
        assert conv1["kernel"].shape[-2] == 3, conv1["kernel"].shape
        conv1["kernel"] = conv1["kernel"].mean(axis=-2, keepdims=True)
    return tree


def i3d_vars_from_sd(sd: Dict[str, Any], source: str
                     ) -> Tuple[Params, Tuple[str, ...]]:
    """Returns (variables, graft_subpath): KINETICS400 loads the raw i3d
    trunk only (graft at vision_i3d/i3d, TCN stays random — tsav.py:99-102);
    AFFWILD2/OUR_AFFWILD2 load the full I3D_WSDDA (i3d + TCN)."""
    if source == "KINETICS400":
        tree = tio.i3d_vars(sd)
        # drop the 400-class logits head — the feature path never runs it
        tree["params"].pop("logits", None)
        return tree, ("i3d",)
    return tio.i3d_tcn_vars(sd), ()


def graft_subtree(dst: Params, src: Params, path: Tuple[str, ...],
           errors: List[str], where: str) -> None:
    """Replace leaves of dst[path...] with src's, shape-checked."""
    node = dst
    for p in path[:-1]:
        node = node[p]
    old = node.get(path[-1]) if path else dst
    if old is None:
        errors.append(f"{where}: target subtree {'/'.join(path)} missing")
        return

    def rec(o, s, trail):
        for k, v in s.items():
            if k not in o:
                errors.append(f"{where}: unexpected key {trail + (k,)}")
                continue
            if isinstance(v, dict):
                rec(o[k], v, trail + (k,))
            else:
                if tuple(np.shape(o[k])) != tuple(np.shape(v)):
                    errors.append(
                        f"{where}: shape mismatch at {trail + (k,)}: "
                        f"init {np.shape(o[k])} vs checkpoint {np.shape(v)}")
                else:
                    o[k] = np.asarray(v, dtype=np.asarray(o[k]).dtype)

    rec(old, src, path)


def apply_pretrained(cfg, params: Params, batch_stats: Params
                     ) -> Tuple[Params, Params, Dict[str, str]]:
    """Graft pretrained backbone weights into freshly-initialized variable
    trees per the config's ``init_w_*`` policy. Returns (params,
    batch_stats, {component: source-path}). No-op when everything is
    RANDOM."""
    mp = cfg.model_params
    plan = []  # (backbone, source, top-level component key)
    if "R2D1" in mp.l_vision_backbones and mp.init_w_R2D1 != "RANDOM":
        plan.append(("R2D1", mp.init_w_R2D1, "vision_r2d1"))
    if "ResNet18" in mp.l_audio_backbones and mp.init_w_ResNet18 != "RANDOM":
        plan.append(("ResNet18", mp.init_w_ResNet18, "audio_resnet18"))
    if "I3D" in mp.l_vision_backbones and mp.init_w_I3D != "RANDOM":
        plan.append(("I3D", mp.init_w_I3D, "vision_i3d"))
    if not plan:
        return params, batch_stats, {}
    root = cfg.pretrained_weights_dir
    if not root:
        raise ValueError(
            "init_w_* != RANDOM requires pretrained_weights_dir "
            f"(requested: {[(b, s) for b, s, _ in plan]})")
    if ("R2D1", "OUR_AFFWILD2", "vision_r2d1") in plan:
        # that model was pretrained with MAX pooling (main.py:281)
        assert mp.R2D1_ft_dim_reduce == "MAX", mp.R2D1_ft_dim_reduce

    report: Dict[str, str] = {}
    errors: List[str] = []
    for backbone, source, comp in plan:
        path = resolve_path(root, backbone, source)
        sub = ()
        if path.endswith(".msgpack"):
            # a jmt_tpu component export — already flax layout, no torch
            # conversion; the self-loop pretrain-here -> init-here
            from jmt_tpu.core.checkpoint import load_component
            tree = load_component(path)
        elif backbone == "R2D1":
            tree = r2d1_vars_from_sd(_load_sd(path))
        elif backbone == "ResNet18":
            tree = resnet18_vars_from_sd(_load_sd(path), source)
        else:
            tree, sub = i3d_vars_from_sd(_load_sd(path), source)
        base = ("backbones", comp) + sub
        graft_subtree(params, tree["params"], base, errors, f"{comp}[{source}]")
        if tree.get("batch_stats"):
            graft_subtree(batch_stats, tree["batch_stats"], base, errors,
                   f"{comp}[{source}] batch_stats")
        report[comp] = path
    if errors:
        raise ValueError("pretrained grafting failed:\n  "
                         + "\n  ".join(errors))
    return params, batch_stats, report
