"""Checkpointing: full train-state save/resume + per-component export.

Improves on the reference, which snapshots only best model WEIGHTS (no
optimizer/scheduler/RNG state; ``start_epoch`` exists but nothing reloads
weights in Training mode — main.py:105-177, SURVEY.md §5.4):

* ``save_train_state``/``restore_train_state`` — the FULL state (trainable
  + frozen params, batch stats, optimizer state, epoch) via flax
  serialization, enabling true resume.
* ``export_components`` — per-component weight files mirroring the
  reference's ``SavedWeights/`` layout (fusion_w, all_backbones,
  audio_resnet18, vision_r2d1, vision_r2d1_fc, vision_i3d,
  fc_layer_for_{audio,video}_concat, transformer_{audio,visio}_modality_
  fusion, backbone_pretrainer_w — main.py:105-177), as .msgpack.
* ``import_reference_torch_checkpoint`` — load the reference's .pt exports
  (requires torch at call time only).
"""
from __future__ import annotations

import os
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

STATE_FILE = "train_state.msgpack"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _atomic_write(path: str, data: bytes) -> None:
    """Write via tmp + rename so a preemption mid-write can never leave a
    truncated checkpoint behind (resume reads whichever complete file the
    rename last published).

    TPU preemption terminates the whole VM — the page cache dies with it —
    so atomicity needs durability too: fsync the tmp file BEFORE the rename
    (else the rename can publish a truncated file) and fsync the directory
    AFTER (else the rename itself can be lost, which is safe, or worse on
    some filesystems reorder against the data)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dfd = os.open(os.path.dirname(os.path.abspath(path)), os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def save_train_state(directory: str, state, extra: Optional[dict] = None
                     ) -> str:
    """`extra` is an optional msgpack-able dict persisted alongside the
    state — the Runner stores its best-epoch tracking (best metrics, the
    best-snapshot weights, tracker curves) there so that a preemption
    resume selects the best model over the WHOLE run, not just the
    post-resume epochs."""
    os.makedirs(directory, exist_ok=True)
    payload = {
        "trainable": _to_host(state.trainable),
        "frozen": _to_host(state.frozen),
        "batch_stats": _to_host(state.batch_stats),
        # optax states are namedtuple trees; to_state_dict flattens them to
        # msgpack-able nested dicts
        "opt_state": serialization.to_state_dict(_to_host(state.opt_state)),
        "epoch": state.epoch,
    }
    if extra is not None:
        payload["extra"] = extra
    path = os.path.join(directory, STATE_FILE)
    _atomic_write(path, serialization.msgpack_serialize(payload))
    return path


def load_train_state_extra(directory: str) -> Optional[dict]:
    """The `extra` payload saved with the train state, or None."""
    path = os.path.join(directory, STATE_FILE)
    if not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload.get("extra")


def restore_train_state_with_extra(directory: str, template):
    """Restore into the structure of `template` (a TrainState); returns
    ``(state, extra)`` from ONE read + msgpack decode of the checkpoint —
    the payload holds the full param + optimizer trees (potentially GBs),
    so parsing it twice would double resume I/O and peak host memory."""
    from jmt_tpu.train.state import TrainState

    with open(os.path.join(directory, STATE_FILE), "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    out = TrainState(
        trainable=serialization.from_state_dict(template.trainable,
                                                payload["trainable"]),
        frozen=serialization.from_state_dict(template.frozen,
                                             payload["frozen"]),
        batch_stats=serialization.from_state_dict(template.batch_stats,
                                                  payload["batch_stats"]),
        opt_state=serialization.from_state_dict(template.opt_state,
                                                payload["opt_state"]),
        epoch=int(payload["epoch"]),
    )
    return out, payload.get("extra")


def restore_train_state(directory: str, template) -> Any:
    """Restore into the structure of `template` (a TrainState)."""
    return restore_train_state_with_extra(directory, template)[0]


# ----------------------------------------------------------------------------
# Per-component export (SavedWeights parity)
# ----------------------------------------------------------------------------
# component name -> (params path prefix, include batch_stats)
_COMPONENTS = {
    "fusion_w": ("fusion_model",),
    "backbone_pretrainer_w": ("backbone_pretrainer",),
    "all_backbones": ("backbones",),
    "audio_resnet18": ("backbones", "audio_resnet18"),
    "vision_r2d1": ("backbones", "vision_r2d1"),
    "vision_r2d1_fc": ("backbones", "vision_r2d1_fc"),
    "vision_i3d": ("backbones", "vision_i3d"),
    "fc_layer_for_audio_concat": ("fc_layer_for_audio_concat",),
    "transformer_audio_modality_fusion":
        ("transformer_audio_modality_fusion",),
    "fc_layer_for_video_concat": ("fc_layer_for_video_concat",),
    "transformer_visio_modality_fusion":
        ("transformer_visio_modality_fusion",),
}


def _subtree(tree: Dict[str, Any], path) -> Optional[Dict[str, Any]]:
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def export_components(directory: str, params: Dict[str, Any],
                      batch_stats: Optional[Dict[str, Any]] = None
                      ) -> Dict[str, str]:
    """Write one .msgpack per present component (reference layout,
    main.py:105-177). Returns {component: path}."""
    os.makedirs(directory, exist_ok=True)
    written = {}
    for name, path in _COMPONENTS.items():
        piece = {"params": _subtree(params, path)}
        if piece["params"] is None:
            continue
        if batch_stats is not None:
            bs = _subtree(batch_stats, path)
            if bs is not None:
                piece["batch_stats"] = bs
        out = os.path.join(directory, f"{name}.msgpack")
        _atomic_write(out, serialization.msgpack_serialize(_to_host(piece)))
        written[name] = out
    return written


class AsyncCheckpointer:
    """Epoch-end checkpoint I/O on a background thread.

    The reference blocks its epoch loop on ``torch.save`` of every component
    (main.py:984-995); here the device→host fetch, msgpack serialization and
    disk write all run on one worker thread while the main thread dispatches
    the next epoch's device work. This is safe because jax Arrays are
    immutable (``Runner`` replacing ``self.state`` cannot mutate a captured
    snapshot) and fetching them from another thread just blocks THAT thread
    until the device value is ready.

    Exactly one save is in flight: a new save first :meth:`wait`\\ s for the
    previous one, which also surfaces any exception it raised (a failed
    write therefore fails the NEXT save call, or :meth:`close`)."""

    def __init__(self) -> None:
        self._executor = ThreadPoolExecutor(max_workers=1,
                                            thread_name_prefix="jmt-ckpt")
        self._pending: Optional[Future] = None

    def _submit(self, fn, *args) -> None:
        self.wait()
        self._pending = self._executor.submit(fn, *args)

    def save_train_state(self, directory: str, state,
                         extra: Optional[dict] = None) -> None:
        self._submit(save_train_state, directory, state, extra)

    def export_components(self, directory: str, params,
                          batch_stats=None) -> None:
        self._submit(export_components, directory, params, batch_stats)

    def wait(self) -> None:
        """Block until the in-flight save (if any) finished; re-raise its
        exception here if it failed."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def close(self) -> None:
        self.wait()
        self._executor.shutdown(wait=True)

    def __enter__(self) -> "AsyncCheckpointer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def load_component(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def assemble_from_components(directory: str, cfg, params: Dict[str, Any],
                             batch_stats: Dict[str, Any]
                             ) -> Dict[str, str]:
    """Rebuild model variables FROM per-component files — completing the
    reference's Eval-mode loading (main.py:508-609, which reloads every
    component from SavedWeights/*.pt).

    Accepts BOTH layouts per component, ours first:
      * ``{name}.msgpack`` — this framework's export_components output;
      * ``{name}.pt``      — a reference SavedWeights export (torch, with
        ``module.`` DataParallel prefixes tolerated), converted via
        models.torch_io.

    Grafts in place into `params`/`batch_stats` (shape-checked) and returns
    {component: file}. Raises if NO component file is found."""
    from jmt_tpu.models.pretrained import graft_subtree

    loaded: Dict[str, str] = {}
    errors: list = []
    for name, path in _COMPONENTS.items():
        if _subtree(params, path) is None:
            continue  # component not in this config's model
        msg = os.path.join(directory, f"{name}.msgpack")
        pt = os.path.join(directory, f"{name}.pt")
        if os.path.isfile(msg):
            piece = load_component(msg)
        elif os.path.isfile(pt):
            piece = _torch_component(pt, name, cfg)
        else:
            continue
        # NB: individual backbone entries iterate AFTER all_backbones, so a
        # hand-assembled per-backbone file overrides the aggregate export.
        graft_subtree(params, piece["params"], tuple(path), errors, name)
        if piece.get("batch_stats"):
            bs = _subtree(batch_stats, path)
            if bs is not None:
                graft_subtree(batch_stats, piece["batch_stats"], tuple(path),
                              errors, f"{name} batch_stats")
        loaded[name] = msg if os.path.isfile(msg) else pt
    if errors:
        raise ValueError("component assembly failed:\n  "
                         + "\n  ".join(str(e) for e in errors))
    if not loaded:
        raise FileNotFoundError(
            f"no component files (*.msgpack/*.pt) found in {directory}")
    return loaded


def _torch_component(pt_path: str, name: str, cfg) -> Dict[str, Any]:
    """Convert one reference SavedWeights/{name}.pt to flax variables."""
    mp = cfg.model_params
    if name == "fusion_w":
        p = import_reference_torch_checkpoint(
            pt_path, "fusion", num_layers=mp.num_layers,
            joint_modalities=mp.joint_modalities,
            output_format=mp.output_format)
        return {"params": p}
    if name == "backbone_pretrainer_w":
        return {"params": import_reference_torch_checkpoint(pt_path,
                                                            "pretrainer")}
    if name == "all_backbones":
        return import_reference_torch_checkpoint(pt_path, "tsav")
    if name == "audio_resnet18":
        import torch
        from jmt_tpu.models import torch_io as tio
        sd = tio.strip_module_prefix(torch.load(pt_path,
                                                map_location="cpu"))
        sd = {k[len("resnet."):] if k.startswith("resnet.") else k: v
              for k, v in sd.items()}
        return tio.resnet18_vars(sd)
    if name == "vision_r2d1":
        import torch
        from jmt_tpu.models import torch_io as tio
        sd = tio.strip_module_prefix(torch.load(pt_path,
                                                map_location="cpu"))
        sd = {k[len("r2plus1d."):] if k.startswith("r2plus1d.") else k: v
              for k, v in sd.items()}
        return tio.video_resnet_vars(sd, arch="r2plus1d")
    if name == "vision_r2d1_fc":
        from jmt_tpu.models import torch_io as tio
        import torch
        sd = tio.strip_module_prefix(torch.load(pt_path,
                                                map_location="cpu"))
        return {"params": tio.r2d1_flatten_fc_params(sd)}
    if name == "vision_i3d":
        return import_reference_torch_checkpoint(pt_path, "i3d_tcn")
    if name in ("fc_layer_for_audio_concat", "fc_layer_for_video_concat"):
        return {"params": import_reference_torch_checkpoint(pt_path,
                                                            "fc_layer")}
    if name in ("transformer_audio_modality_fusion",
                "transformer_visio_modality_fusion"):
        return {"params": import_reference_torch_checkpoint(
            pt_path, "intra_modal_transformer", num_layers=mp.num_layers)}
    raise KeyError(name)


def import_reference_torch_checkpoint(pt_path: str, kind: str,
                                      **kwargs) -> Dict[str, Any]:
    """Load a reference SavedWeights/*.pt into flax trees via
    models.torch_io. `kind` in {'fusion', 'intra_modal_transformer',
    'fc_layer', 'pretrainer', 'resnet18', 'video_resnet', 'i3d_tcn'}."""
    import torch
    from jmt_tpu.models import torch_io as tio

    sd = torch.load(pt_path, map_location="cpu")
    if isinstance(sd, dict) and "net" in sd:  # the .t7 AFFWILD2 layout
        sd = sd["net"]
    converters = {
        "fusion": tio.two_transformers_params,
        "intra_modal_transformer": tio.intra_modal_fusion_params,
        "fc_layer": tio.fc_layer_params,
        "pretrainer": tio.pretrainer_params,
        "resnet18": tio.resnet18_vars,
        "video_resnet": tio.video_resnet_vars,
        "i3d_tcn": tio.i3d_tcn_vars,
        "tsav": tio.tsav_vars,
    }
    return converters[kind](sd, **kwargs)
