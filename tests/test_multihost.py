"""Multi-host (pod) wiring: loader sharding, global-batch assembly,
process-0 I/O gating.

True multi-process JAX cannot run in CI (single host), so these tests pin
the components and contracts (VERDICT r2 #3):
  * per-process loader shards are disjoint, exhaustive, and LOCKSTEP
    (equal batch counts via filler batches with n_valid=0);
  * per-process blocks assemble into the same global batch a single
    process would build (set-equality per step; row order within a batch
    is irrelevant to the loss and row_weight travels with its block);
  * `shard_batch` routes through jax.make_array_from_process_local_data
    when process_count > 1 (the device_put path cannot build a global
    array on a real pod);
  * checkpoint/artifact writes happen on process 0 only.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import jmt_tpu.parallel.mesh as M
from jmt_tpu.data.loader import PrefetchLoader
from jmt_tpu.data.synthetic import synthetic_dataset


def _tiny_ds():
    return synthetic_dataset("train", n_videos=2, length=481, stride=481,
                             img_size=16, check_coverage=False)


def test_host_shards_disjoint_exhaustive_lockstep():
    ds = _tiny_ds()
    n = len(ds)
    assert n >= 2
    rng0, rng1 = (np.random.default_rng(7) for _ in range(2))
    l0 = PrefetchLoader(ds, 2, shuffle=True, rng=rng0, host_shard=(0, 2))
    l1 = PrefetchLoader(ds, 2, shuffle=True, rng=rng1, host_shard=(1, 2))
    b0 = list(l0._index_batches())
    b1 = list(l1._index_batches())
    assert len(b0) == len(b1) == len(l0) == len(l1)  # lockstep
    all0 = np.concatenate(b0) if b0 else np.zeros(0)
    all1 = np.concatenate(b1) if b1 else np.zeros(0)
    assert set(all0) & set(all1) == set()            # disjoint
    assert set(all0) | set(all1) == set(range(n))    # exhaustive


def test_lockstep_filler_batches():
    ds = _tiny_ds()
    n = len(ds)
    # a process count that leaves host sizes unequal (host 0 gets 2
    # samples, the rest 1 each), forcing filler batches on the short hosts
    count = max(2, n - 1)
    loaders = [PrefetchLoader(ds, 2, host_shard=(i, count))
               for i in range(count)]
    lens = {len(l) for l in loaders}
    assert len(lens) == 1  # every host reports the identical batch count
    # the short hosts actually YIELD filler batches with n_valid == 0
    short = loaders[-1]
    batches = list(short)
    assert len(batches) == len(short)
    fillers = [b for b in batches if b.n_valid == 0]
    real = [b for b in batches if b.n_valid is None]
    assert len(real) >= 1
    # filler batches still have full static shapes
    for b in fillers:
        assert b.clips.shape[0] == 1


def test_two_process_blocks_equal_single_process_batch():
    """Simulated 2-process assembly == single-process global batch (as
    index sets per lockstep step)."""
    ds = _tiny_ds()
    n = len(ds)
    gl = PrefetchLoader(ds, 4, shuffle=True, rng=np.random.default_rng(3))
    l0 = PrefetchLoader(ds, 2, shuffle=True, rng=np.random.default_rng(3),
                        host_shard=(0, 2))
    l1 = PrefetchLoader(ds, 2, shuffle=True, rng=np.random.default_rng(3),
                        host_shard=(1, 2))
    for g, a, b in zip(gl._index_batches(), l0._index_batches(),
                       l1._index_batches()):
        assert set(g) == set(a) | set(b)


def test_shard_batch_process_local_assembly(monkeypatch):
    """count>1 routes through make_array_from_process_local_data; in a
    single-process run local==global, so the result must equal the
    device_put path bit-for-bit."""
    mesh = M.make_mesh(8)
    x = {"a": np.arange(64, dtype=np.float32).reshape(8, 8),
         "w": np.ones(8, np.float32)}
    ref = M.shard_batch(mesh, x)
    monkeypatch.setattr(M, "proc_info", lambda: (0, 2))
    out = M.shard_batch(mesh, x)
    for k in x:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))
        assert out[k].sharding.is_equivalent_to(ref[k].sharding, x[k].ndim)


def test_process_rows(monkeypatch):
    monkeypatch.setattr(M, "proc_info", lambda: (1, 4))
    assert M.process_rows(8) == slice(2, 4)
    monkeypatch.setattr(M, "proc_info", lambda: (0, 1))
    assert M.process_rows(8) == slice(0, 8)


def test_gather_rows_multiproc_branch(monkeypatch):
    """The addressable-shards concat + allgather path; in single-process
    jax the allgather is an identity, so the result must equal the
    global array."""
    mesh = M.make_mesh(8)
    x = jax.device_put(np.arange(32, dtype=np.float32).reshape(8, 4),
                       M.batch_sharding(mesh))
    monkeypatch.setattr(M, "proc_info", lambda: (0, 2))
    np.testing.assert_array_equal(M.gather_rows(x),
                                  np.arange(32, dtype=np.float32)
                                  .reshape(8, 4))


def test_pod_resume_agreement(monkeypatch):
    """fit()'s entry allgather fails fast when processes restored different
    checkpoints (per-host experiment dirs after a preemption: host 0 resumes
    at epoch E, the rest at 0 — previously a permanent collective hang)."""
    import types
    from jax.experimental import multihost_utils
    from jmt_tpu.train.runner import Runner

    ns = types.SimpleNamespace(procs=(0, 2), _mid_epoch=None)
    # agreement: both processes report (start=3, mid=-1) -> no raise
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda x, **kw: np.stack([x, x]))
    Runner._assert_pod_resume_agreement(ns, 3)
    # disagreement: process 1 starts fresh at epoch 0 -> RuntimeError
    monkeypatch.setattr(
        multihost_utils, "process_allgather",
        lambda x, **kw: np.stack([x, np.zeros_like(x)]))
    with pytest.raises(RuntimeError, match="shared"):
        Runner._assert_pod_resume_agreement(ns, 3)
    # mid-epoch step mismatch alone also trips it
    ns_mid = types.SimpleNamespace(procs=(0, 2), _mid_epoch={"step": 5})
    monkeypatch.setattr(
        multihost_utils, "process_allgather",
        lambda x, **kw: np.stack([x, np.asarray([x[0], -1], x.dtype)]))
    with pytest.raises(RuntimeError, match="disagreement"):
        Runner._assert_pod_resume_agreement(ns_mid, 3)
    # single process: no collective, no raise
    Runner._assert_pod_resume_agreement(
        types.SimpleNamespace(procs=(0, 1), _mid_epoch=None), 0)


@pytest.mark.slow
def test_fit_writes_nothing_off_main_process(tmp_path, monkeypatch):
    """A non-zero process runs the full epoch (collectives must execute in
    lockstep) but writes no checkpoints or artifacts."""
    from jmt_tpu.core.config import Config
    from jmt_tpu.train.runner import Runner
    import jmt_tpu.train.runner as R

    cfg = Config.from_dict({
        "exp_id": "podgate", "outd": str(tmp_path / "exps"),
        "goal": "PRETRAINING",  # single backbone keeps the epoch cheap
        "train_params": {"loader_params": {"batch_size": 2}},
        "val_params": {"loader_params": {"batch_size": 2}},
        "model_params": {"l_vision_backbones": "R2D1",
                         "l_audio_backbones": "",
                         "freeze_vision_R2D1": False,
                         "R2D1_ft_dim_reduce": "MAX",
                         "max_epochs": 1, "compute_dtype": "float32"},
        "SEED": 0, "mesh_data_parallel": 1,
    })
    ds = _tiny_ds()
    monkeypatch.setattr(R, "is_main_process", lambda: False)
    r = Runner(cfg, ds, ds)
    perfs = r.fit()
    assert np.isfinite(perfs["best"]["valid_v"])
    exp_dir = os.path.join(str(tmp_path / "exps"), "id_podgate")
    # no artifacts: the experiment dir was never created
    assert not os.path.exists(os.path.join(exp_dir, "SavedWeights"))
    assert not os.path.exists(os.path.join(exp_dir, "passed.txt"))
    assert not os.path.exists(os.path.join(exp_dir, "tracker.png"))
