"""Experiment orchestrator — the reference's main() re-designed.

Capability target: main.py:180-1081 — build model + datasets from config,
epoch loop with per-epoch reseeding (main.py:898-922), epoch train + stitched
validation, best-model tracking by average valid CCC (main.py:843-995),
per-component weight dumps, perfs.yml + tracker curves + passed.txt.

Differences by design (TPU-native):
* one jitted train step over the sharded batch — no per-item python loop,
  no AMP scaler, no DataParallel;
* full train-state checkpointing for true resume (the reference saves
  weights only);
* static per-device batch via padding instead of drop_last.
"""
from __future__ import annotations

import dataclasses
import datetime
import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from jmt_tpu.core.config import Config, ExperimentDir
from jmt_tpu.core.logging import get_logger
from jmt_tpu.core.rng import set_global_seed
from jmt_tpu.core import checkpoint as ckpt
from jmt_tpu.core import preempt
from jmt_tpu.models.jmt_model import model_from_config
from jmt_tpu.ops.ccc import ccc_metric
from jmt_tpu.train import optim as O
from jmt_tpu.train.loops import (make_train_step, make_eval_step, init_state,
                                 device_batch, batches_from_dataset,
                                 compiler_options_from_cfg)
from jmt_tpu.data.loader import PrefetchLoader
from jmt_tpu.train.state import TrainState
from jmt_tpu.eval.stitch import Stitcher, write_challenge_txt
from jmt_tpu.parallel.mesh import (pad_batch_to, make_mesh, shard_batch,
                                   replicated_sharding, host_shard,
                                   is_main_process, process_rows,
                                   gather_rows)


@dataclasses.dataclass
class EpochMetrics:
    train_ccc_v: float = 0.0
    train_ccc_a: float = 0.0
    valid_ccc_v: float = 0.0
    valid_ccc_a: float = 0.0

    @property
    def valid_avg(self) -> float:
        return (self.valid_ccc_v + self.valid_ccc_a) / 2.0


class Runner:
    def __init__(self, cfg: Config, train_ds, val_ds,
                 wavlm_store=None, test_ds=None):
        self.cfg = cfg
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.test_ds = test_ds
        self.wavlm_store = wavlm_store
        self.exp = ExperimentDir(cfg)
        self.log = get_logger()

        self.model = model_from_config(cfg)
        self.tx = O.build_optimizer(cfg.model_params.opt)
        self.lr_fn = O.lr_schedule(cfg.model_params.opt)
        self.plateau = (O.ReduceLROnPlateau(cfg.model_params.opt)
                        if cfg.model_params.opt.name_lr_scheduler
                        == "reduce_on_plateau"
                        and cfg.model_params.opt.lr_scheduler else None)
        copts = compiler_options_from_cfg(cfg)
        self.train_step = make_train_step(
            self.model, self.tx,
            more_vision_augm=cfg.train_params.use_more_vision_data_augm,
            more_audio_augm=cfg.train_params.use_more_audio_data_augm,
            compiler_options=copts)
        self.eval_step = make_eval_step(self.model, compiler_options=copts)
        self.state: Optional[TrainState] = None
        self.tracker: Dict[str, list] = {"train_v": [], "train_a": [],
                                         "valid_v": [], "valid_a": []}
        self.best = {"avg": -np.inf, "epoch": -1}
        # host copy of the best epoch's (params, batch_stats) — the
        # reference deep-copies state dicts on improvement and writes THOSE
        # at the end (main.py:843-995, 1028-1037)
        self._best_snapshot = None
        # set by a step-granular preemption inside train_epoch: the payload
        # needed to re-enter that epoch at the same step on resume
        self._preempted_mid: Optional[dict] = None
        # restored by resume() from a mid-epoch checkpoint: fast-forward
        # instructions for the first post-resume train_epoch
        self._mid_epoch: Optional[dict] = None
        # the production data-parallel mesh (cfg.mesh_data_parallel; the
        # reference applies its DP wrapper in the run path, main.py:304-306)
        self.mesh = make_mesh(cfg.mesh_data_parallel, n_dcn=cfg.mesh_dcn)
        # multi-host (pod): train loaders shard samples across processes;
        # eval loaders load the FULL split on every process (cheap, keeps
        # stitching metadata global) and each process contributes its row
        # block at batch-assembly time
        self.procs = host_shard()

    # ------------------------------------------------------------------
    def _first_batch_arrays(self):
        bsz = self.cfg.train_params.loader_params.batch_size
        batch = next(batches_from_dataset(
            self.train_ds, min(bsz, max(len(self.train_ds), 1)),
            shuffle=False, wavlm_store=self.wavlm_store))
        return device_batch(batch)

    def initialize(self) -> None:
        set_global_seed(self.cfg.SEED)
        arrays = self._first_batch_arrays()

        def pretrained_hook(params, batch_stats):
            """init_w_* policy (reference main.py:218-302, tsav.py:35-116):
            graft pretrained backbone weights before partition/opt init."""
            from jmt_tpu.models.pretrained import apply_pretrained
            params, batch_stats, report = apply_pretrained(
                self.cfg, params, batch_stats)
            for comp, path in report.items():
                self.log.log(f"Loaded pretrained weights [{comp}]: {path}")
            return params, batch_stats

        self.state = init_state(self.model, self.cfg,
                                jax.random.PRNGKey(self.cfg.SEED),
                                arrays, self.tx,
                                variables_hook=pretrained_hook)
        # replicate the state over the data mesh; batches are sharded on
        # their leading axis and XLA inserts the gradient all-reduce
        n = self.mesh.size
        n_proc = self.procs[1]
        for split in ("train_params", "val_params", "test_params"):
            bsz = getattr(self.cfg, split).loader_params.batch_size
            assert bsz % n == 0, (
                f"{split}.loader_params.batch_size={bsz} must be divisible "
                f"by the {n}-device data mesh")
            assert bsz % n_proc == 0, (
                f"{split}.loader_params.batch_size={bsz} must be divisible "
                f"by the {n_proc} host processes")
        if n > 1:
            self.state = jax.device_put(self.state,
                                        replicated_sharding(self.mesh))
        from jmt_tpu.train.state import param_count
        self.log.log({
            "trainable_params": param_count(self.state.trainable),
            "frozen_params": param_count(self.state.frozen),
            "mesh_devices": n,
        })

    # ------------------------------------------------------------------
    def _device_arrays(self, batch, bsz: int, distributed_load=False):
        """Host batch -> padded, row-weighted, mesh-sharded device arrays.
        Returns (arrays, n_real).

        distributed_load=True: `batch` is this process's LOCAL sample slice
        (train loaders use host_shard); the global batch is assembled from
        per-process blocks. Otherwise `batch` is the GLOBAL batch loaded
        identically on every process (eval contract) and each process keeps
        only its own row block before assembly."""
        idx, count = self.procs
        arrays = device_batch(batch)
        pad_to = bsz // count if (distributed_load and count > 1) else bsz
        arrays, n_real = pad_batch_to(arrays, pad_to)
        if batch.n_valid is not None:  # multi-host lockstep filler batch
            n_real = min(n_real, batch.n_valid)
        w = np.zeros(pad_to, np.float32)
        w[:n_real] = 1.0
        arrays["row_weight"] = w
        if count > 1 and not distributed_load:
            rows = process_rows(bsz)
            arrays = jax.tree.map(lambda x: x[rows], arrays)
        if self.mesh.size > 1 or count > 1:
            arrays = shard_batch(self.mesh, arrays)
        return arrays, n_real

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> EpochMetrics:
        cfg = self.cfg
        lr = (self.lr_fn(epoch) if self.plateau is None else self.plateau.lr)
        self.state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32)
        # per-epoch reseed contract (main.py:898-899)
        set_global_seed(cfg.SEED + epoch)
        rng = np.random.default_rng(cfg.SEED + epoch)
        key = jax.random.PRNGKey(cfg.SEED + epoch)

        bsz = cfg.train_params.loader_params.batch_size
        vout, vtar, aout, atar = [], [], [], []
        epoch_loss, n = 0.0, 0
        # mid-epoch resume: replay the epoch's data order (a pure function
        # of SEED+epoch via the reseed above) but skip the first `skip`
        # steps' device work, restoring their loss/metric accumulators from
        # the checkpoint — the continued run is bit-identical to an
        # uninterrupted one.
        skip = 0
        if self._mid_epoch is not None and self._mid_epoch["epoch"] == epoch:
            me, self._mid_epoch = self._mid_epoch, None
            skip = me["step"]
            epoch_loss, n = me["epoch_loss"], skip
            vout, aout = list(me["vout"]), list(me["aout"])
            vtar, atar = list(me["vtar"]), list(me["atar"])
        seen = 0
        n_proc = self.procs[1]
        loader = PrefetchLoader(
            self.train_ds, bsz // n_proc,
            shuffle=cfg.train_params.loader_params.shuffle, rng=rng,
            drop_last=False, wavlm_store=self.wavlm_store,
            prefetch=cfg.train_params.loader_params.prefetch,
            host_shard=self.procs if n_proc > 1 else None)
        profiling = bool(cfg.profile_dir) and epoch == cfg.profile_epoch
        t_step = datetime.datetime.now()
        for batch in loader:
            if seen < skip:
                # consume the batch (host transforms keep the global RNG
                # stream aligned) and the step's device key, compute nothing
                seen += 1
                key, _ = jax.random.split(key)
                continue
            seen += 1
            arrays, n_real = self._device_arrays(batch, bsz,
                                                 distributed_load=True)
            key, sub = jax.random.split(key)
            if profiling and n == 2:  # trace steps 2-4 (post-compile)
                jax.profiler.start_trace(cfg.profile_dir)
            self.state, loss, vouts, aouts = self.train_step(
                self.state, arrays, sub)
            epoch_loss += float(loss)
            if profiling and n == 4:
                jax.profiler.stop_trace()
                profiling = False
            n += 1
            if cfg.log_every_steps and n % cfg.log_every_steps == 0:
                now = datetime.datetime.now()
                self.log.metrics(
                    step=f"e{epoch}s{n}", loss=float(loss),
                    step_seconds=(now - t_step).total_seconds()
                    / cfg.log_every_steps, lr=lr)
                t_step = now
            # epoch-CCC accumulation over REAL rows only; row_weight marks
            # them globally (pad rows sit at each process block's tail on a
            # pod, so a contiguous n_real slice would be wrong there)
            S = batch.labels_v.shape[1]
            keep = np.repeat(gather_rows(arrays["row_weight"]) > 0.5, S)
            vout.extend(gather_rows(vouts).reshape(-1)[keep])
            aout.extend(gather_rows(aouts).reshape(-1)[keep])
            vtar.extend(gather_rows(arrays["labels_v"]).reshape(-1)[keep])
            atar.extend(gather_rows(arrays["labels_a"]).reshape(-1)[keep])
            # step-granular preemption (cfg.preempt_save_steps): poll every
            # N steps — the consensus call is a lockstep collective, safe
            # because every process hits the same step cadence (lockstep
            # loaders) — and hand fit() the mid-epoch payload to checkpoint
            if (cfg.preempt_save_steps and cfg.graceful_preemption
                    and n % cfg.preempt_save_steps == 0 and preempt.agreed()):
                self._preempted_mid = {
                    "epoch": epoch, "step": n,
                    "epoch_loss": float(epoch_loss),
                    "vout": np.asarray(vout, np.float32),
                    "aout": np.asarray(aout, np.float32),
                    "vtar": np.asarray(vtar, np.float32),
                    "atar": np.asarray(atar, np.float32)}
                break

        if self._preempted_mid is not None:
            # mid-epoch preemption exit: fit() discards these metrics, and
            # ccc_metric over the partial accumulators would be a new array
            # shape — a fresh XLA compile inside the short grace window
            return EpochMetrics()
        if self.plateau is not None and n:
            self.plateau.step(epoch_loss / n)
        m = EpochMetrics(
            train_ccc_v=float(ccc_metric(jnp.asarray(np.array(vout)),
                                         jnp.asarray(np.array(vtar)))),
            train_ccc_a=float(ccc_metric(jnp.asarray(np.array(aout)),
                                         jnp.asarray(np.array(atar)))))
        return m

    # ------------------------------------------------------------------
    def validate(self, dataset=None, store_pkl: str = "") -> EpochMetrics:
        set_global_seed(self.cfg.SEED)  # main.py:922
        dataset = dataset if dataset is not None else self.val_ds
        bsz = self.cfg.val_params.loader_params.batch_size
        stitcher = Stitcher(with_labels=True)
        for batch in PrefetchLoader(
                dataset, bsz, shuffle=False, wavlm_store=self.wavlm_store,
                prefetch=self.cfg.val_params.loader_params.prefetch):
            arrays, n_real = self._device_arrays(batch, bsz)
            vouts, aouts = self.eval_step(self.state, arrays)
            stitcher.add_batch(gather_rows(vouts), gather_rows(aouts),
                               batch.anchors, batch.videos, batch.lengths,
                               batch.labels_v, batch.labels_a,
                               n_real=n_real)
        ccc_v, ccc_a = stitcher.scores()
        if store_pkl and is_main_process():
            stitcher.dump_pkl(store_pkl)
        return EpochMetrics(valid_ccc_v=ccc_v, valid_ccc_a=ccc_a)

    def test(self, dir_out: str, store_pkl: str = "") -> None:
        """Challenge inference: stitch + write {vid}.txt (test.py:15-363)."""
        assert self.test_ds is not None
        bsz = self.cfg.test_params.loader_params.batch_size
        stitcher = Stitcher(with_labels=False)
        for batch in PrefetchLoader(
                self.test_ds, bsz, shuffle=False,
                wavlm_store=self.wavlm_store,
                prefetch=self.cfg.test_params.loader_params.prefetch):
            arrays, n_real = self._device_arrays(batch, bsz)
            vouts, aouts = self.eval_step(self.state, arrays)
            stitcher.add_batch(gather_rows(vouts), gather_rows(aouts),
                               batch.anchors, batch.videos, batch.lengths,
                               n_real=n_real)
        if is_main_process():
            write_challenge_txt(stitcher, dir_out)
            if store_pkl:
                stitcher.dump_pkl(store_pkl)

    # ------------------------------------------------------------------
    def snapshot_best(self) -> None:
        """Host-copy the current (params, batch_stats) as the best-epoch
        snapshot (reference deepcopy_state_dict on improvement,
        main.py:843-995)."""
        self._best_snapshot = jax.tree.map(
            np.asarray, (self.state.params(), self.state.batch_stats))

    def dump_best(self, async_ckpt: "ckpt.AsyncCheckpointer" = None) -> None:
        """Export the BEST epoch's weights to SavedWeights/ (the reference
        writes the tracked best copies at the end, main.py:1028-1037), or
        the current state if no snapshot was taken yet. With `async_ckpt`
        the serialization + write happen on its background thread."""
        if not is_main_process():
            return
        if self._best_snapshot is not None:
            params, batch_stats = self._best_snapshot
        else:
            params, batch_stats = self.state.params(), self.state.batch_stats
        if async_ckpt is not None:
            async_ckpt.export_components(self.exp.weights_dir, params,
                                         batch_stats)
        else:
            ckpt.export_components(self.exp.weights_dir, params, batch_stats)

    def load_components(self, directory: str) -> Dict[str, str]:
        """Assemble the model FROM per-component weight files — ours
        (.msgpack) or reference SavedWeights exports (.pt) — completing
        Eval-mode parity with main.py:508-609. Rebuilds the train state
        (partition + fresh optimizer) around the assembled variables."""
        from jmt_tpu.train.state import frozen_prefixes, partition_params
        if self.state is None:
            self.initialize()
        params = jax.tree.map(np.asarray, self.state.params())
        batch_stats = jax.tree.map(np.asarray, self.state.batch_stats)
        loaded = ckpt.assemble_from_components(directory, self.cfg,
                                               params, batch_stats)
        trainable, frz = partition_params(params,
                                          frozen_prefixes(self.cfg))
        self.state = TrainState(trainable=trainable, frozen=frz,
                                batch_stats=batch_stats,
                                opt_state=self.tx.init(trainable),
                                epoch=self.state.epoch)
        for name, path in loaded.items():
            self.log.log(f"Loaded component weights [{name}]: {path}")
        return loaded

    def _ckpt_extra(self, mid_epoch: Optional[dict] = None) -> dict:
        """Runner-level tracking persisted WITH the train state so a
        preemption resume selects the best model over the WHOLE run (not
        just post-resume epochs) and reports complete tracker curves."""
        extra = {
            "best": {k: (int(v) if k == "epoch" else float(v))
                     for k, v in self.best.items()},
            "tracker": {k: [float(x) for x in v]
                        for k, v in self.tracker.items()},
        }
        if self._best_snapshot is not None:
            extra["best_snapshot"] = {
                "params": self._best_snapshot[0],
                "batch_stats": self._best_snapshot[1]}
        if self.plateau is not None:
            p = {"lr": float(self.plateau.lr),
                 "num_bad": int(self.plateau.num_bad)}
            if self.plateau.best is not None:
                p["best"] = float(self.plateau.best)
            extra["plateau"] = p
        if mid_epoch is not None:
            extra["mid_epoch"] = mid_epoch
        return extra

    def _restore_extra(self, extra: Optional[dict]) -> None:
        if not extra:
            return
        if extra.get("best"):
            self.best = {k: (int(v) if k == "epoch" else float(v))
                         for k, v in extra["best"].items()}
        if extra.get("tracker"):
            self.tracker = {k: [float(x) for x in v]
                            for k, v in extra["tracker"].items()}
        snap = extra.get("best_snapshot")
        if snap is not None:
            self._best_snapshot = (snap["params"], snap["batch_stats"])
        p = extra.get("plateau")
        if p is not None and self.plateau is not None:
            self.plateau.lr = float(p["lr"])
            self.plateau.num_bad = int(p["num_bad"])
            self.plateau.best = (float(p["best"]) if "best" in p else None)
        me = extra.get("mid_epoch")
        if me is not None:
            self._mid_epoch = {
                "epoch": int(me["epoch"]), "step": int(me["step"]),
                "epoch_loss": float(me["epoch_loss"]),
                "vout": np.asarray(me["vout"], np.float32),
                "aout": np.asarray(me["aout"], np.float32),
                "vtar": np.asarray(me["vtar"], np.float32),
                "atar": np.asarray(me["atar"], np.float32)}

    def _save_state(self, acp: "ckpt.AsyncCheckpointer" = None,
                    mid_epoch: Optional[dict] = None) -> None:
        if not is_main_process():
            return
        extra = self._ckpt_extra(mid_epoch)
        if acp is not None:
            acp.save_train_state(self.exp.weights_dir, self.state, extra)
        else:
            ckpt.save_train_state(self.exp.weights_dir, self.state, extra)

    def resume(self) -> bool:
        """Restore the full train state from the experiment dir if present
        (true resume — the reference saves weights only and never reloads
        them in Training mode, SURVEY.md §5.4). Returns True if resumed."""
        if self.state is None:
            self.initialize()
        path = os.path.join(self.exp.weights_dir, ckpt.STATE_FILE)
        if not os.path.isfile(path):
            return False
        self.state, extra = ckpt.restore_train_state_with_extra(
            self.exp.weights_dir, self.state)
        self._restore_extra(extra)
        self.cfg.model_params.start_epoch = self.state.epoch
        at = (f" (mid-epoch, step {self._mid_epoch['step']})"
              if self._mid_epoch else "")
        self.log.log(f"resumed from {path} at epoch {self.state.epoch}{at}")
        return True

    def _assert_pod_resume_agreement(self, start: int) -> None:
        """Pod resume sanity: _save_state/preempted.txt are written by
        process 0 only, so with per-host experiment dirs a post-preemption
        relaunch can have host 0 resume at epoch E (mid-epoch skip armed)
        while other hosts start fresh at 0 — mismatched collectives and a
        permanent hang. Every process reaches fit(), so this allgather is a
        safe lockstep collective; it fails FAST with the fix (shared
        storage for weights_dir — docs/OPERATIONS.md) instead of hanging."""
        _, count = self.procs
        if count == 1:
            return
        from jax.experimental import multihost_utils
        mid = self._mid_epoch["step"] if self._mid_epoch else -1
        mine = np.asarray([start, mid], np.int32)
        allv = np.asarray(multihost_utils.process_allgather(mine))
        if not (allv == allv[0]).all():
            raise RuntimeError(
                "pod resume disagreement: per-process (start_epoch, "
                f"mid_epoch_step) = {allv.tolist()} — processes restored "
                "different checkpoints. train_state.msgpack/preempted.txt "
                "are written by process 0 only; put weights_dir on storage "
                "shared by all hosts (docs/OPERATIONS.md, pod resume)")

    def fit(self) -> Dict[str, float]:
        if self.exp.already_done():
            self.log.log("experiment already passed; skipping "
                         "(passed.txt guard)")
            return {}
        if is_main_process():
            self.exp.create()
        if self.state is None:
            self.initialize()
        cfg = self.cfg
        start = cfg.model_params.start_epoch
        self._assert_pod_resume_agreement(start)
        if cfg.graceful_preemption:
            preempt.install()
        preempted = False
        # background checkpoint writer: epoch-end fetch/serialize/write
        # overlap the next epoch's device compute (cfg.async_checkpoint)
        acp = (ckpt.AsyncCheckpointer()
               if cfg.async_checkpoint and is_main_process() else None)
        try:
            for epoch in range(start, cfg.model_params.max_epochs):
                t0 = datetime.datetime.now()
                tm = self.train_epoch(epoch)
                if self._preempted_mid is not None:
                    # step-granular exit: state stays AT `epoch`; resume
                    # re-enters this epoch and fast-forwards to the saved
                    # step, so the final weights are bit-identical to an
                    # uninterrupted run
                    me, self._preempted_mid = self._preempted_mid, None
                    self._save_state(acp, mid_epoch=me)
                    self.log.log(f"preemption: state saved mid-epoch "
                                 f"{epoch} at step {me['step']}; re-launch "
                                 f"to resume")
                    preempted = True
                    break
                if cfg.graceful_preemption and preempt.agreed():
                    # grace-window exit: keep the finished epoch's training
                    # (identical numerics to an uninterrupted run), skip its
                    # validation; resume continues at epoch + 1
                    self.state = dataclasses.replace(self.state,
                                                     epoch=epoch + 1)
                    self._save_state(acp)
                    self.log.log(f"preemption: state saved after train "
                                 f"epoch {epoch}; validation skipped; "
                                 f"re-launch to resume at {epoch + 1}")
                    preempted = True
                    break
                vm = self.validate()
                self.tracker["train_v"].append(tm.train_ccc_v)
                self.tracker["train_a"].append(tm.train_ccc_a)
                self.tracker["valid_v"].append(vm.valid_ccc_v)
                self.tracker["valid_a"].append(vm.valid_ccc_a)
                if vm.valid_avg >= self.best["avg"]:
                    self.best = {"avg": vm.valid_avg, "epoch": epoch,
                                 "valid_v": vm.valid_ccc_v,
                                 "valid_a": vm.valid_ccc_a}
                    self.snapshot_best()
                    if cfg.dump_best_model_every_time:
                        self.dump_best(acp)
                self.state = dataclasses.replace(self.state, epoch=epoch + 1)
                # full train-state checkpoint every epoch: true resume from
                # the LATEST state (beyond the reference, which has no
                # resume). Pod: host-0 writes (state is replicated, so host
                # 0 has it all)
                self._save_state(acp)
                self.log.metrics(step=epoch,
                                 train_ccc_v=tm.train_ccc_v,
                                 train_ccc_a=tm.train_ccc_a,
                                 valid_ccc_v=vm.valid_ccc_v,
                                 valid_ccc_a=vm.valid_ccc_a,
                                 best_epoch=self.best["epoch"],
                                 epoch_seconds=(datetime.datetime.now()
                                                - t0).total_seconds())
                if cfg.graceful_preemption and preempt.agreed():
                    # state for epoch+1 is already saved — exit is free
                    self.log.log(f"preemption: exiting after full epoch "
                                 f"{epoch}; re-launch to resume")
                    preempted = True
                    break
            if preempted:
                # export whatever best snapshot exists, but do NOT finalize:
                # passed.txt stays absent so the same command resumes
                # instead of hitting the idempotence guard. preempted.txt
                # gates the CLI's IMPLICIT auto-resume (ordinary crashes
                # still require an explicit --resume).
                if is_main_process():
                    # flush the in-flight async state write FIRST: the
                    # marker arms implicit auto-resume, so it must never be
                    # observable (SIGKILL after the grace window) without
                    # the checkpoint it vouches for
                    if acp is not None:
                        acp.wait()
                    with open(self.exp.preempted_marker, "w") as f:
                        f.write("graceful preemption; re-launch resumes\n")
                if self._best_snapshot is not None:
                    self.dump_best(acp)
            else:
                self.dump_best(acp)
        finally:
            if acp is not None:
                acp.close()
        perfs = {"best": self.best, "tracker": self.tracker,
                 "preempted": preempted}
        if is_main_process() and not preempted:
            self._plot_tracker()
            self.exp.finalize({"best": self.best, "tracker": self.tracker})
        return perfs

    def _plot_tracker(self) -> None:
        """Learning-curve PNG (tools.py:61-155 equivalent); optional."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        for ax, key, title in ((axes[0], "v", "valence CCC"),
                               (axes[1], "a", "arousal CCC")):
            ax.plot(self.tracker[f"train_{key}"], label="train")
            ax.plot(self.tracker[f"valid_{key}"], label="valid")
            if self.best["epoch"] >= 0:
                ax.axvline(self.best["epoch"], ls="--", c="gray")
            ax.set_title(title)
            ax.set_xlabel("epoch")
            ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(self.exp.path, "tracker.png"), dpi=100)
        plt.close(fig)
