"""Prefetching host->device pipeline.

Replaces the reference's torch DataLoader worker processes (4 workers,
config_file.json:22) with a background producer thread and a bounded queue:
sample materialization (native batched JPEG/WAV decode, data/native.py) and
collation run ahead of the training step, overlapping host IO with device
compute. A thread (not a process) suffices because the heavy work happens
in libjpeg/libc inside the native library, which releases the GIL; the
native decoder additionally fans out across its own pthreads.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from jmt_tpu.data.datasets import Batch, collate

_SENTINEL = object()


class PrefetchLoader:
    """Iterate collated batches with up to `prefetch` prepared ahead."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 rng: Optional[np.random.Generator] = None,
                 drop_last: bool = False, wavlm_store=None,
                 prefetch: int = 2, host_shard=None):
        """host_shard: (process_index, process_count) for multi-host
        training — each host loads a disjoint stride of the (identically
        shuffled) sample order. Pass jmt_tpu.parallel.mesh.host_shard()."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = rng
        self.drop_last = drop_last
        self.wavlm_store = wavlm_store
        self.prefetch = max(1, prefetch)
        self.host_shard = host_shard

    def _order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # all hosts must shuffle identically (same per-epoch rng seed)
            # so the host_shard strides are disjoint and exhaustive
            (self.rng or np.random.default_rng()).shuffle(order)
        if self.host_shard is not None:
            idx, count = self.host_shard
            order = order[idx::count]
        return order

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.host_shard is not None:
            # lockstep contract: every host yields the SAME batch count
            # (the longest host's), padding with empty/filler batches —
            # otherwise a pod deadlocks on the shorter hosts' last step
            _, count = self.host_shard
            n = (n + count - 1) // count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        order = self._order()
        target = len(self)
        emitted = 0
        for i in range(0, len(order), self.batch_size):
            idx = order[i:i + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            yield idx
            emitted += 1
        while emitted < target:  # lockstep filler (multi-host tail)
            yield np.zeros((0,), np.int64)
            emitted += 1

    def __iter__(self) -> Iterator[Batch]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for idx in self._index_batches():
                    if stop.is_set():
                        return
                    if len(idx) == 0:  # lockstep filler: all rows padding
                        batch = collate([self.dataset[0]])
                        batch.n_valid = 0
                    else:
                        batch = collate([self.dataset[int(j)] for j in idx])
                    if self.wavlm_store is not None:
                        batch.wavlm = self.wavlm_store.lookup_batch(
                            batch.wav_paths)
                    out_q.put(batch)
                out_q.put(_SENTINEL)
            except Exception as e:
                out_q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is _SENTINEL:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
