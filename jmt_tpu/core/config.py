"""Config system: typed dataclasses mirroring the reference's config schema.

The reference drives everything from a JSON defaults file plus an ~80-flag
argparse override lattice with prefix-mangled keys (``opt__*`` routed into
model_params, ``{train,val,test}_params__*`` routed into nested sections —
parseit.py:291-345), validated by dozens of asserts (parseit.py:364-471).

Here the same schema is typed dataclasses with explicit validation; overrides
use dotted paths (``model_params.num_heads=4``) AND the reference's legacy
prefix forms (``opt__lr``, ``train_params__loader_params__batch_size``) so
existing reference configs/commands translate 1:1. Dataset paths are
first-class config (the reference hardcodes cluster paths,
parseit.py:489-509).

Experiment-dir lifecycle matches the reference: ``exps/id_<exp_id>`` out dir
(parseit.py:517-530), a ``passed.txt`` already-done guard (parseit.py:354-358),
``config.yml``/``final_config.yml`` records and a ``cmd.sh`` replay script
(parseit.py:616-619).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import warnings
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


# ----------------------------------------------------------------------------
# Enumerations of the config lattice (mirrors parseit.py asserts)
# ----------------------------------------------------------------------------
VISION_BACKBONES = ("R2D1", "I3D")
AUDIO_BACKBONES = ("ResNet18", "wavLM")
INTRA_MODAL_FUSIONS = ("None", "feat_concat_fc", "encoder_plus_self_attention")
JOINT_MODALITIES = ("NONE", "TRANSFORMER", "FC")
OUTPUT_FORMATS = ("FC", "SELF_ATTEN")
GOALS = ("TRAINING", "PRETRAINING")
MODES = ("Training", "Eval")
R2D1_REDUCES = ("MAX", "AVG", "FLATTEN")
INITS_R2D1 = ("RANDOM", "KINETICS400", "AFFWILD2", "OUR_AFFWILD2")
INITS_RESNET18 = ("RANDOM", "IMAGENET", "AFFWILD2", "OUR_AFFWILD2")
INITS_I3D = ("RANDOM", "KINETICS400", "AFFWILD2", "OUR_AFFWILD2")
SPLITS = ("DEFAULT", "ROUND1", "ROUND2", "ROUND3", "ROUND4", "ROUND5")
OPTIMIZERS = ("sgd", "adam")
SCHEDULERS = ("step", "cosine", "mystep", "mycosine", "multistep",
              "reduce_on_plateau")


def _as_bool(v: Any) -> bool:
    """The reference stores booleans as strings like "True" in JSON."""
    if isinstance(v, bool):
        return v
    if isinstance(v, str):
        return v.strip().lower() in ("true", "1", "yes")
    return bool(v)


@dataclass
class LoaderParams:
    batch_size: int = 64
    shuffle: bool = False
    num_workers: int = 4
    pin_memory: bool = False
    # TPU addition: prefetch depth of the host->device pipeline.
    prefetch: int = 2

    def __post_init__(self):
        # reference command lines pass booleans as the words True/False
        # (README.MD:100-104)
        self.shuffle = _as_bool(self.shuffle)
        self.pin_memory = _as_bool(self.pin_memory)


@dataclass
class SplitParams:
    """Per-split dataset geometry (mirrors config_file.json train/val/test)."""
    labelpath: str = ""
    take_n_videos: int = -1
    seq_length: int = 512
    subseq_length: int = 32
    stride: int = 1
    dilation: int = 4
    use_more_vision_data_augm: bool = False
    use_more_audio_data_augm: bool = False
    loader_params: LoaderParams = field(default_factory=LoaderParams)

    def __post_init__(self):
        if isinstance(self.loader_params, dict):
            self.loader_params = LoaderParams(**self.loader_params)
        self.use_more_vision_data_augm = _as_bool(
            self.use_more_vision_data_augm)
        self.use_more_audio_data_augm = _as_bool(
            self.use_more_audio_data_augm)
        assert self.seq_length > 0 and self.subseq_length > 0
        assert self.seq_length % self.subseq_length == 0, \
            (self.seq_length, self.subseq_length)
        assert self.stride > 0 and self.dilation > 0
        assert self.take_n_videos == -1 or self.take_n_videos > 0


@dataclass
class OptimParams:
    """Optimizer + scheduler hyper-params (the reference's ``opt__*`` keys,
    instantiator.py:113-138)."""
    name_optimizer: str = "sgd"
    lr: float = 1e-4
    momentum: float = 0.9
    dampening: float = 0.0
    weight_decay: float = 1e-4
    nesterov: bool = True
    beta1: float = 0.9
    beta2: float = 0.999
    eps_adam: float = 1e-8
    amsgrad: bool = False
    lr_scheduler: bool = True
    name_lr_scheduler: str = "mystep"
    step_size: int = 40
    gamma: float = 0.1
    last_epoch: int = -1
    min_lr: float = 1e-7
    t_max: int = 100
    coef: float = 0.5
    milestones: List[int] = field(default_factory=lambda: [30, 60])
    mode: str = "min"
    factor: float = 0.5
    patience: int = 10
    # mirrored from model_params.max_epochs (the reference's optimizer
    # factory reads it from the same dict, instantiator.py:152-154)
    max_epochs: int = 20

    def __post_init__(self):
        self.nesterov = _as_bool(self.nesterov)
        self.amsgrad = _as_bool(self.amsgrad)
        self.lr_scheduler = _as_bool(self.lr_scheduler)
        assert self.name_optimizer in OPTIMIZERS, self.name_optimizer
        if self.lr_scheduler:
            assert self.name_lr_scheduler in SCHEDULERS, self.name_lr_scheduler


@dataclass
class ModelParams:
    intra_modal_fusion: str = "None"
    output_format: str = "FC"
    joint_modalities: str = "TRANSFORMER"
    l_vision_backbones: List[str] = field(default_factory=lambda: ["R2D1"])
    l_audio_backbones: List[str] = field(default_factory=lambda: ["ResNet18"])
    init_w_R2D1: str = "RANDOM"
    init_w_ResNet18: str = "RANDOM"
    init_w_I3D: str = "RANDOM"
    R2D1_ft_dim_reduce: str = "MAX"
    freeze_vision_R2D1: bool = True
    freeze_vision_I3D: bool = True
    freeze_audio_ResNet18: bool = True
    num_layers: int = 1
    num_heads: int = 1
    v_dropout: float = 0.0
    a_dropout: float = 0.0
    start_epoch: int = 0
    max_epochs: int = 20
    opt: OptimParams = field(default_factory=OptimParams)
    # TPU additions -----------------------------------------------------
    # compute dtype for the backbone/fusion matmuls ("bfloat16"|"float32");
    # replaces the reference's torch.cuda.amp autocast (train.py:101).
    compute_dtype: str = "bfloat16"
    # remat (jax.checkpoint) the heavy backbones to trade FLOPs for HBM.
    remat_backbones: bool = False
    # "backbone" = checkpoint whole backbones; "stage" = per-block/module
    remat_granularity: str = "backbone"
    # I3D input resolution: 224 = reference parity (112->224 trilinear
    # upsample, utils/utils.py:293-300); 112 = TPU-native option skipping
    # the information-free upsample (~4x fewer I3D FLOPs, NOT parity).
    i3d_input_size: int = 224
    # whole-inception-module Pallas kernel (ops/inception_pallas.py) for
    # the eval/frozen-BN path: True | False | "auto". "auto" currently
    # resolves to False everywhere: the kernel wins the isolated trunk
    # but loses end-to-end to the XLA path by ~5 ms/step on v5e (boundary
    # seams — measured rationale in ops/inception_pallas.py).
    i3d_fused_inception: object = "auto"
    # stream the I3D trunk over clip chunks of this size (nn.scan, eval/
    # frozen-BN only): bounds stem activations at O(chunk), raising the
    # batch knee past the B>=12 OOM. 0 = off.
    i3d_chunk: int = 0
    # BN mode while finetuning unfrozen backbones: "batch" = reference
    # parity (model.eval() + selective .train(True), train.py:27-42);
    # "frozen" = running-stats BN with grads still flowing (standard
    # small-batch finetune practice; avoids the train-BN batch-stat
    # reductions that dominate the measured I3D backward).
    finetune_bn: str = "batch"

    def __post_init__(self):
        # string forms accept both our "," and the reference's "+"
        # separator (parseit.py:364,378: "wavLM+ResNet18")
        if isinstance(self.l_vision_backbones, str):
            self.l_vision_backbones = (
                [] if self.l_vision_backbones in ("", "None")
                else self.l_vision_backbones.replace("+", ",").split(","))
        if isinstance(self.l_audio_backbones, str):
            self.l_audio_backbones = (
                [] if self.l_audio_backbones in ("", "None")
                else self.l_audio_backbones.replace("+", ",").split(","))
        if isinstance(self.opt, dict):
            self.opt = OptimParams(**self.opt)
        self.opt.max_epochs = self.max_epochs
        for b in (self.freeze_vision_R2D1, self.freeze_vision_I3D,
                  self.freeze_audio_ResNet18):
            assert isinstance(_as_bool(b), bool)
        self.freeze_vision_R2D1 = _as_bool(self.freeze_vision_R2D1)
        self.freeze_vision_I3D = _as_bool(self.freeze_vision_I3D)
        self.freeze_audio_ResNet18 = _as_bool(self.freeze_audio_ResNet18)
        assert self.intra_modal_fusion in INTRA_MODAL_FUSIONS, \
            self.intra_modal_fusion
        assert self.output_format in OUTPUT_FORMATS, self.output_format
        assert self.joint_modalities in JOINT_MODALITIES, self.joint_modalities
        for v in self.l_vision_backbones:
            assert v in VISION_BACKBONES, v
        for a in self.l_audio_backbones:
            assert a in AUDIO_BACKBONES, a
        assert self.R2D1_ft_dim_reduce in R2D1_REDUCES, self.R2D1_ft_dim_reduce
        assert self.init_w_R2D1 in INITS_R2D1, self.init_w_R2D1
        assert self.init_w_ResNet18 in INITS_RESNET18, self.init_w_ResNet18
        assert self.init_w_I3D in INITS_I3D, self.init_w_I3D
        assert self.num_layers > 0 and self.num_heads > 0
        assert 0.0 <= self.v_dropout < 1.0 and 0.0 <= self.a_dropout < 1.0
        assert self.compute_dtype in ("bfloat16", "float32"), self.compute_dtype
        assert self.i3d_input_size in (112, 224), self.i3d_input_size
        self.i3d_chunk = int(self.i3d_chunk)
        assert self.i3d_chunk >= 0, self.i3d_chunk
        if self.i3d_fused_inception != "auto":
            self.i3d_fused_inception = _as_bool(self.i3d_fused_inception)
        assert self.remat_granularity in ("backbone", "stage"), \
            self.remat_granularity
        assert self.finetune_bn in ("batch", "frozen"), self.finetune_bn


@dataclass
class Config:
    """Top-level experiment config (mirrors config_file.json:1-99)."""
    exp_id: str = "exp"
    outd: str = "exps"
    verbose: bool = True
    # dataset paths — first-class config, no hardcoded cluster paths
    dataset_rootpath: str = ""
    dataset_wavspath: str = ""
    dataset_realtimestamps: str = ""
    wavlm_features: str = ""
    # root of the pretrained backbone checkpoints (the reference hardcodes
    # ``<repo>/PretrainedWeights/`` — main.py:218-302); consumed by
    # models.pretrained per the init_w_* policy
    pretrained_weights_dir: str = ""
    # annotation roots for the split->labelpath convention
    # (auto_set_label_paths; the reference hardcodes both cluster paths,
    # parseit.py:487-498)
    dataset_annotations: str = ""
    dataset_annotations_5folds: str = ""
    # static per-wav sample bucket (the reference pads to 45,599 and keeps
    # longer wavs whole with dynamic batch padding, dataset_new.py:305-308 /
    # padSequence.py:8-21; raise this to keep low-fps chunks whole — see
    # PARITY.md 'Long-wav truncation')
    audio_samples: int = 45599
    train_params: SplitParams = field(default_factory=SplitParams)
    val_params: SplitParams = field(default_factory=SplitParams)
    test_params: SplitParams = field(default_factory=SplitParams)
    model_params: ModelParams = field(default_factory=ModelParams)
    Mode: str = "Training"
    SEED: int = 0
    split: str = "DEFAULT"
    dump_best_model_every_time: bool = True
    goal: str = "TRAINING"
    # TPU additions -----------------------------------------------------
    # device mesh spec: number of data-parallel shards; -1 = all devices.
    mesh_data_parallel: int = -1
    # multi-slice: number of slices (outer DCN mesh axis); batch shards
    # over (dcn x data) jointly, XLA reduces gradients hierarchically
    # (ICI within a slice, DCN across slices). 1 = single slice.
    mesh_dcn: int = 1
    # raise XLA's scoped-VMEM fusion budget (KiB) for the jitted steps
    # (--xla_tpu_scoped_vmem_limit_kib; 0 = compiler default of 16 MB).
    # v5e has 128 MB physical VMEM — sweep via tools/vmem_sweep.py.
    xla_scoped_vmem_kib: int = 0  # coerced in __post_init__ (CLI --set)
    # persistent XLA compilation cache dir ("" = $JMT_COMPILATION_CACHE_DIR
    # or off). Production restarts/preemption recovery skip the minutes-long
    # step recompiles (core/compcache.py; no reference counterpart — torch
    # eager has no compile step).
    compilation_cache_dir: str = ""
    # write epoch-end checkpoints (train_state.msgpack + best-component
    # exports) on a background thread, overlapping host fetch + msgpack
    # serialization + disk I/O with the next epoch's device compute (the
    # reference blocks its epoch loop on torch.save, main.py:984-995).
    # Identical files; a failed write surfaces on the next save / fit() end.
    async_checkpoint: bool = True
    # graceful preemption: install a SIGTERM handler that makes fit() save
    # the train state at the next epoch boundary and exit WITHOUT writing
    # passed.txt, so re-launching the same command resumes (core/preempt.py;
    # the reference has no failure-recovery story at all, SURVEY.md §5.3).
    graceful_preemption: bool = True
    # step-granular preemption: additionally poll the preemption flag every
    # N train steps and checkpoint MID-epoch (0 = epoch boundaries only).
    # A real Affwild2 epoch runs hours while a TPU preemption grace window
    # is ~30s-5min; with this on, at most N steps of work are lost and the
    # resume replays the epoch's data order (pure function of SEED+epoch,
    # runner.py per-epoch reseed) so the final weights are bit-identical to
    # an uninterrupted run.
    preempt_save_steps: int = 0
    # observability: write a jax.profiler trace of a few train steps of
    # `profile_epoch` into profile_dir (the reference has no tracing at all,
    # SURVEY.md §5.1 — only coarse epoch wall-clocks)
    profile_dir: str = ""
    profile_epoch: int = 0
    # log step timing every N train steps (0 = off)
    log_every_steps: int = 50

    def __post_init__(self):
        for name in ("train_params", "val_params", "test_params"):
            v = getattr(self, name)
            if isinstance(v, dict):
                setattr(self, name, SplitParams(**v))
        if isinstance(self.model_params, dict):
            self.model_params = ModelParams(**self.model_params)
        self.verbose = _as_bool(self.verbose)
        self.dump_best_model_every_time = _as_bool(
            self.dump_best_model_every_time)
        self.async_checkpoint = _as_bool(self.async_checkpoint)
        self.graceful_preemption = _as_bool(self.graceful_preemption)
        self.preempt_save_steps = int(self.preempt_save_steps)
        self.xla_scoped_vmem_kib = int(self.xla_scoped_vmem_kib)
        assert self.xla_scoped_vmem_kib >= 0, self.xla_scoped_vmem_kib
        assert self.Mode in MODES, self.Mode
        assert self.goal in GOALS, self.goal
        assert self.split in SPLITS, self.split
        self.validate_lattice()

    def auto_set_label_paths(self, must_exist: bool = True) -> None:
        """The reference's 5-fold split convention
        (auto_set_tr_vl_tst_paths, parseit.py:480-514): resolve
        {train,val,test}_params.labelpath from ``split`` against the
        first-class annotation roots —

        * DEFAULT  -> ``dataset_annotations``
        * ROUND<k> -> ``dataset_annotations_5folds``/fold<k>

        each then suffixed Train_Set / Val_Set / Test_Set. Only fills
        labelpaths that are empty (explicit paths win)."""
        fold_ids = {f"ROUND{i}": f"fold{i}" for i in range(1, 6)}
        if self.split == "DEFAULT":
            base = self.dataset_annotations
        else:
            assert self.dataset_annotations_5folds, (
                f"split={self.split} requires dataset_annotations_5folds")
            base = os.path.join(self.dataset_annotations_5folds,
                                fold_ids[self.split])
        if not base:
            return
        for params, sub in ((self.train_params, "Train_Set"),
                            (self.val_params, "Val_Set"),
                            (self.test_params, "Test_Set")):
            if not params.labelpath:
                params.labelpath = os.path.join(base, sub)
                if must_exist:
                    assert os.path.isdir(params.labelpath), params.labelpath

    # -- the reference's config-combination validation (parseit.py:364-471)
    def validate_lattice(self) -> None:
        mp = self.model_params
        if self.goal == "PRETRAINING":
            # single-backbone pretraining: exactly one backbone total
            n = len(mp.l_vision_backbones) + len(mp.l_audio_backbones)
            assert n == 1, (
                f"PRETRAINING requires exactly one backbone, got {n}")
        else:
            assert len(mp.l_vision_backbones) >= 1, mp.l_vision_backbones
            assert len(mp.l_audio_backbones) >= 1, mp.l_audio_backbones
        if len(mp.l_vision_backbones) == 2 or (
                len(mp.l_audio_backbones) == 2):
            assert mp.intra_modal_fusion != "None", (
                "two backbones in one modality require an intra-modal fusion")
        if mp.joint_modalities == "NONE":
            assert mp.output_format == "FC", mp.output_format
        # val/test geometry force-synced to train's (main.py:186-191)
        for split in (self.val_params, self.test_params):
            split.seq_length = self.train_params.seq_length
            split.subseq_length = self.train_params.subseq_length
            split.stride = self.train_params.stride
            split.dilation = self.train_params.dilation

    # -- (de)serialization ------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        d = dict(d)
        # tolerate reference-style extra keys
        known = {f.name for f in dataclasses.fields(cls)}
        mp = d.get("model_params")
        if isinstance(mp, dict):
            mp = dict(mp)
            # route legacy opt__* keys into the nested OptimParams
            opt_d = dict(mp.pop("opt", {}) or {})
            for k in list(mp.keys()):
                if k.startswith("opt__"):
                    opt_d[k[len("opt__"):]] = mp.pop(k)
            mp["opt"] = opt_d
            d["model_params"] = mp
        # reference-only keys with no TPU meaning are dropped silently
        # (config_file.json:1-99); anything else unknown is warned about so
        # a typo'd --set / pasted flag is not swallowed
        silent = {"cudaid", "t0", "tend", "myseed", "debug_subset"}
        for k in d:
            if k not in known and k not in silent:
                warnings.warn(f"ignoring unknown config key {k!r}",
                              stacklevel=2)
        d = {k: v for k, v in d.items() if k in known}
        return cls(**d)

    @classmethod
    def from_file(cls, path: str) -> "Config":
        with open(path) as f:
            if path.endswith((".yml", ".yaml")):
                d = yaml.safe_load(f)
            else:
                d = json.load(f)
        return cls.from_dict(d)

    def save_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


def apply_overrides(cfg_dict: Dict[str, Any],
                    overrides: Dict[str, Any]) -> Dict[str, Any]:
    """Apply override keys onto a raw config dict.

    Supports both dotted paths (``model_params.num_heads``) and the
    reference's prefix-mangled forms (parseit.py:291-345), so every flag
    from the reference README's command lines works verbatim as a
    ``--set`` key:

    * ``opt__<k>``                       -> model_params.opt.<k>
    * ``train_params__loader_params__<k>`` -> train_params.loader_params.<k>
    * ``<split>_params__<loader-key>``   -> <split>_params.loader_params.<k>
      (the reference flattens loader params onto the split prefix:
      ``--train_params__batch_size 32``, README.MD / parseit.py:291-345)
    * ``<section>__<k>``                 -> <section>.<k>
    * bare model-param keys (``num_heads``, ``freeze_vision_R2D1``, ...)
      -> model_params.<k> (they are TOP-LEVEL argparse flags in the
      reference, parseit.py:85-270)
    * other plain keys                    -> top level
    """
    out = json.loads(json.dumps(cfg_dict))  # deep copy, JSON-typed

    mp_keys = {f.name for f in dataclasses.fields(ModelParams)} - {"opt"}
    loader_keys = {f.name for f in dataclasses.fields(LoaderParams)}

    def set_path(d: Dict[str, Any], path: List[str], value: Any) -> None:
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = value

    for key, value in overrides.items():
        if "." in key:
            set_path(out, key.split("."), value)
        elif key.startswith("opt__"):
            set_path(out, ["model_params", key], value)
        elif "__" in key:
            path = key.split("__")
            if (len(path) == 2 and path[0].endswith("_params")
                    and path[1] in loader_keys):
                path = [path[0], "loader_params", path[1]]
            set_path(out, path, value)
        elif key in mp_keys:
            set_path(out, ["model_params", key], value)
        else:
            out[key] = value
    return out


# ----------------------------------------------------------------------------
# Experiment directory lifecycle
# ----------------------------------------------------------------------------
class ExperimentDir:
    """``exps/id_<exp_id>`` lifecycle with passed.txt idempotence guard
    (reference parseit.py:354-358,517-530; main.py:1074-1075)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.path = os.path.join(cfg.outd, f"id_{cfg.exp_id}")
        self.weights_dir = os.path.join(self.path, "SavedWeights")

    @property
    def passed_marker(self) -> str:
        return os.path.join(self.path, "passed.txt")

    @property
    def preempted_marker(self) -> str:
        """Sentinel written ONLY on the graceful-preemption exit path; the
        CLI's implicit auto-resume is gated on it so that ordinary crashes
        (OOM, Ctrl-C, bad config) don't silently resume a stale state —
        those still require an explicit --resume."""
        return os.path.join(self.path, "preempted.txt")

    def already_done(self) -> bool:
        return os.path.isfile(self.passed_marker)

    def create(self, argv: Optional[List[str]] = None) -> str:
        os.makedirs(self.path, exist_ok=True)
        os.makedirs(self.weights_dir, exist_ok=True)
        self.cfg.save_yaml(os.path.join(self.path, "config.yml"))
        argv = argv if argv is not None else sys.argv
        with open(os.path.join(self.path, "cmd.sh"), "w") as f:
            f.write("#!/usr/bin/env bash\n")
            f.write(" ".join(argv) + "\n")
        return self.path

    def finalize(self, perfs: Dict[str, Any]) -> None:
        self.cfg.save_yaml(os.path.join(self.path, "final_config.yml"))
        with open(os.path.join(self.path, "perfs.yml"), "w") as f:
            yaml.safe_dump(perfs, f, sort_keys=False)
        with open(self.passed_marker, "w") as f:
            f.write("done\n")
        if os.path.isfile(self.preempted_marker):
            os.remove(self.preempted_marker)  # run completed after resume
