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

Multi-slice note: pass devices ordered so the data axis rides ICI within a
slice; a DCN axis would be an outer mesh dim — not needed at this scale.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh; n_data=-1 uses all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices)
    assert n_data <= len(devices), (n_data, len(devices))
    return Mesh(np.array(devices[:n_data]), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put a host batch with the leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def host_shard():
    """(process_index, process_count) for multi-host data loading — pass to
    PrefetchLoader(host_shard=...). On a single host this is (0, 1)."""
    return jax.process_index(), jax.process_count()


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
