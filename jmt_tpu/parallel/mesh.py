"""Device mesh + shardings — the TPU-native distributed backend.

Replaces the reference's ONLY parallelism, single-process
``nn.DataParallel`` (tools.py:16-21, applied per-module in main.py:304-503),
with pjit/GSPMD data parallelism: a 1-D ``data`` mesh over ICI, batch axes
sharded via NamedSharding, parameters replicated, gradient all-reduce
emitted by XLA. This removes the reference's three DP warts by
construction (SURVEY.md §5.8): no drop_last requirement (static per-device
batch), no ragged-batch `.module` fallback, no 'module.' checkpoint prefix.

A second ``model`` axis is accepted for future tensor-parallel sharding of
the fusion stack; at this model scale (<100M params) data parallel is the
right mapping and the model axis defaults to 1.

Multi-slice: ``make_mesh(n_dcn=...)`` builds a hybrid (dcn, data) mesh —
the outer axis spans slices over DCN, the inner axis rides ICI within a
slice. The batch is sharded over BOTH axes jointly, so XLA emits the
gradient all-reduce hierarchically (reduce-scatter/all-gather on ICI,
small cross-slice all-reduce on DCN). On real multi-slice hardware the
device grid comes from mesh_utils.create_hybrid_device_mesh (slice-aware
placement); on flat single-slice/fake device sets it falls back to a
reshape, which keeps the same program semantics.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, devices: Optional[Sequence] = None,
              n_dcn: int = 1) -> Mesh:
    """Data-parallel mesh; n_data=-1 uses all (remaining) devices.

    n_dcn > 1 -> hybrid (dcn, data) mesh with n_dcn slices of n_data
    devices each.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices) // max(n_dcn, 1)
    assert n_dcn * n_data <= len(devices), (n_dcn, n_data, len(devices))
    if n_dcn <= 1:
        return Mesh(np.array(devices[:n_data]), axis_names=("data",))
    try:  # slice-aware placement on real multi-slice hardware
        from jax.experimental import mesh_utils
        grid = mesh_utils.create_hybrid_device_mesh(
            (1, n_data), (n_dcn, 1), devices=devices[:n_dcn * n_data])
    except (ImportError, ValueError, AssertionError) as e:
        # Flat/fake device sets (CPU mesh, single slice) legitimately lack
        # slice topology — fall back to contiguous groups per slice. On real
        # multi-slice hardware this fallback would place the dcn axis
        # arbitrarily across ICI/DCN, so make the degradation visible.
        import warnings
        warnings.warn(
            f"create_hybrid_device_mesh failed ({type(e).__name__}: {e}); "
            f"falling back to a contiguous reshape — fine for fake/CPU "
            f"devices, but on real multi-slice pods check slice topology",
            RuntimeWarning, stacklevel=2)
        grid = np.array(devices[:n_dcn * n_data]).reshape(n_dcn, n_data)
    return Mesh(grid, axis_names=("dcn", "data"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over all mesh axes (dcn outer, data inner)."""
    if "dcn" in mesh.axis_names:
        return NamedSharding(mesh, P(("dcn", "data")))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def proc_info():
    """(process_index, process_count). Module-level so tests can simulate
    multi-host by monkeypatching."""
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    """Checkpoint/artifact writes are gated to process 0 on a pod
    (SURVEY.md §5.8 'checkpoint I/O on host 0'; logging is gated in
    core.logging)."""
    return proc_info()[0] == 0


def shard_batch(mesh: Mesh, tree):
    """Host batch -> global sharded device arrays.

    Single process: a plain sharded device_put. Multi-process (pod): each
    process holds only ITS rows of the global batch (loader host_shard),
    and `jax.make_array_from_process_local_data` assembles the global
    array — a device_put of local rows cannot build a global array on a
    real pod."""
    sh = batch_sharding(mesh)
    _, count = proc_info()
    if count > 1:
        import numpy as _np
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, _np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def host_shard():
    """(process_index, process_count) for multi-host data loading — pass to
    PrefetchLoader(host_shard=...). On a single host this is (0, 1)."""
    return proc_info()


def process_rows(n_rows: int):
    """This process's contiguous row block of a global batch with `n_rows`
    rows: global row layout == per-process blocks in process order (the
    loader/mesh contract; jax.devices() orders devices by process)."""
    idx, count = proc_info()
    assert n_rows % count == 0, (n_rows, count)
    per = n_rows // count
    return slice(idx * per, (idx + 1) * per)


def gather_rows(x) -> np.ndarray:
    """Global (possibly non-addressable) batch-axis array -> full host
    np.ndarray on EVERY process (epoch metrics / stitching need the whole
    vector). Single process: plain np.asarray."""
    _, count = proc_info()
    if count == 1:
        return np.asarray(x)
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(local, tiled=True))


def pad_batch_to(tree, batch: int):
    """Pad the leading axis to `batch` (static per-device batch without
    drop_last — the reference instead drops the last batch, main.py:655).
    Returns (padded_tree, n_real)."""
    import numpy as _np

    def pad(x):
        n = x.shape[0]
        if n == batch:
            return x
        pad_width = [(0, batch - n)] + [(0, 0)] * (x.ndim - 1)
        return _np.pad(x, pad_width)

    n_real = jax.tree.leaves(tree)[0].shape[0]
    return jax.tree.map(pad, tree), n_real
