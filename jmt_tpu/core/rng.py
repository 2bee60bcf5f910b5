"""Reproducibility runtime.

TPU-native replacement for the reference's reproducibility.py (set_seed /
set_to_deterministic, reproducibility.py:89,141): instead of mutating global
torch/numpy RNG state and forcing cuDNN determinism, JAX threads explicit
`jax.random.PRNGKey`s. XLA:TPU is deterministic by default, so the only state
to manage is the key stream.

The reference reseeds per-epoch with ``seed + epoch`` (main.py:898-899) and
resets to the base seed before validation (main.py:922); `epoch_key` mirrors
that contract functionally.
"""
from __future__ import annotations

import dataclasses
import os
import random

import numpy as np

import jax


SEED_ENV_VAR = "MYSEED"  # same env contract as reference parseit.py:347


def set_global_seed(seed: int) -> None:
    """Seed host-side RNGs (numpy/python) used by data augmentation.

    Device-side randomness never touches these: it flows through PRNG keys.
    """
    os.environ[SEED_ENV_VAR] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def epoch_key(base_seed: int, epoch: int) -> jax.Array:
    """Key for one training epoch: functional analog of
    ``set_seed(epoch + SEED)`` (reference main.py:898-899)."""
    return jax.random.PRNGKey(base_seed + epoch)


@dataclasses.dataclass
class RngStream:
    """A splittable stream of PRNG keys with named folds.

    Usage::

        stream = RngStream(seed=0)
        k = stream.next()           # fresh key
        dk = stream.named("dropout")  # deterministic per name+counter
    """

    seed: int
    _counter: int = 0

    def __post_init__(self):
        self._key = jax.random.PRNGKey(self.seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        self._counter += 1
        return sub

    def named(self, name: str) -> jax.Array:
        h = hash(name) & 0x7FFFFFFF
        return jax.random.fold_in(self.next(), h)
