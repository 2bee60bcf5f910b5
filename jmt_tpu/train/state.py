"""Train state: params (trainable/frozen partition), batch stats, optimizer.

The reference freezes backbones with requires_grad=False and collects only
trainable parameters into the optimizer (main.py:406-466, 796-830). Here the
param tree is PARTITIONED: gradients are taken only w.r.t. the trainable
subtree, frozen params ride along as a constant — same optimizer-state
footprint as the reference and no wasted backward FLOPs through frozen
backbones' weights.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
from flax import traverse_util
from flax.core import freeze, unfreeze


def frozen_prefixes(cfg) -> List[Tuple[str, ...]]:
    """Param-tree path prefixes that are frozen per config
    (parity with main.py:412-466)."""
    mp = cfg.model_params
    out: List[Tuple[str, ...]] = []
    if mp.freeze_vision_R2D1 and "R2D1" in mp.l_vision_backbones:
        out.append(("backbones", "vision_r2d1"))
        # NB: vision_r2d1_fc freezes with R2D1 (main.py:419-433); the
        # reference refuses to freeze an untrained FLATTEN fc — enforced in
        # the orchestrator, not here.
        out.append(("backbones", "vision_r2d1_fc"))
    if mp.freeze_vision_I3D and "I3D" in mp.l_vision_backbones:
        out.append(("backbones", "vision_i3d"))
    if mp.freeze_audio_ResNet18 and "ResNet18" in mp.l_audio_backbones:
        out.append(("backbones", "audio_resnet18"))
    return out


def partition_params(params: Dict[str, Any],
                     prefixes: Sequence[Tuple[str, ...]]
                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split a nested param dict into (trainable, frozen) by path prefix."""
    flat = traverse_util.flatten_dict(unfreeze(params))
    train, frz = {}, {}
    for path, leaf in flat.items():
        if any(path[:len(p)] == tuple(p) for p in prefixes):
            frz[path] = leaf
        else:
            train[path] = leaf
    return (traverse_util.unflatten_dict(train),
            traverse_util.unflatten_dict(frz))


def merge_params(trainable: Dict[str, Any],
                 frozen: Dict[str, Any]) -> Dict[str, Any]:
    a = traverse_util.flatten_dict(unfreeze(trainable))
    b = traverse_util.flatten_dict(unfreeze(frozen))
    return traverse_util.unflatten_dict({**a, **b})


@dataclasses.dataclass
class TrainState:
    """Pytree-of-arrays train state (registered below)."""
    trainable: Any
    frozen: Any
    batch_stats: Any
    opt_state: Any
    epoch: int = 0

    def params(self):
        return merge_params(self.trainable, self.frozen)


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["trainable", "frozen", "batch_stats", "opt_state"],
    meta_fields=["epoch"])


def param_count(tree) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
