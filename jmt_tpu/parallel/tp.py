"""Tensor-parallel (model-axis) shardings for latency-bound serving.

Data parallelism (mesh.py) scales THROUGHPUT; it cannot shrink the
latency of one request. For single-request serving (serve.py bucket 1)
the TPU-native lever is tensor parallelism: shard the channel/feature
dimensions of the conv and dense kernels over a ``model`` mesh axis and
let XLA GSPMD propagate the shardings through the network, inserting the
ICI collectives where operands must be re-replicated. This is the
idiomatic JAX formulation — no model-code changes, no manual collectives;
the sharding is an annotation on the param tree.

The reference has no analog (its only parallelism is nn.DataParallel,
tools.py:16-21 — throughput-only). At this model's scale (<100M params)
TP is strictly a latency tool; training stays data-parallel.

Sharding rule (Megatron-lite, propagation-friendly):
* kernel leaves (ndim >= 2): shard the LAST (output-feature/channel)
  axis over "model" when it is divisible by the axis size and large
  enough to matter (>= 2 rows per shard of a 64-lane-friendly dim);
* 1-D per-channel leaves (BN scale/bias/stats, biases) shard the same
  way so the conv -> BN -> ReLU chain stays local to the shard;
* everything else (small heads, embedding-like leaves) replicated.

Exactness: GSPMD is semantics-preserving up to float reassociation —
tests assert sharded == unsharded within fp32 tolerance on the CPU mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_model_mesh(n_model: int = -1,
                    devices: Optional[Sequence] = None) -> Mesh:
    """1-D ``model`` mesh for tensor-parallel serving."""
    devices = list(devices if devices is not None else jax.devices())
    if n_model == -1:
        n_model = len(devices)
    assert n_model <= len(devices), (n_model, len(devices))
    return Mesh(np.array(devices[:n_model]), axis_names=("model",))


def _leaf_spec(leaf, n_model: int, min_dim: int = 128) -> P:
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    last = shape[-1]
    if last < min_dim or last % n_model != 0:
        return P()
    return P(*([None] * (len(shape) - 1) + ["model"]))


def tp_shardings(params, mesh: Mesh, min_dim: int = 128):
    """Param tree -> NamedSharding tree (last-axis channel sharding)."""
    n = mesh.shape["model"]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, n, min_dim)),
        params)


def shard_params(params, mesh: Mesh, min_dim: int = 128):
    """Place a param/batch-stats tree on the model mesh per tp_shardings.
    Committed shardings: jit'd functions consuming these arrays compile
    to the tensor-parallel program without in_shardings plumbing."""
    sh = tp_shardings(params, mesh, min_dim)
    return jax.tree.map(jax.device_put, params, sh)


def replicate(tree, mesh: Mesh):
    """Inputs (batch) replicated over the model mesh — every shard sees
    the full request; only the weight/feature dims are split."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
