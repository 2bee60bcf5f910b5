"""Synthetic data source — deterministic in-memory videos/audio.

Serves the reference's smoke-run convention (``take_n_videos 2
max_epochs 1``, README.MD:98-106) without any Affwild2 data, and the
benchmark input generator. Frames/audio are derived deterministically from
the path string, so samples are reproducible across processes.
"""
from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np

from jmt_tpu.data.datasets import VideoRecord, WindowedDataset, IMG_SIZE
from jmt_tpu.ops.mel import SAMPLE_RATE


def _seed_from(path: str) -> int:
    return int.from_bytes(hashlib.md5(path.encode()).digest()[:4], "little")


def synthetic_frame_loader(path: str) -> Optional[np.ndarray]:
    rng = np.random.default_rng(_seed_from(path))
    # plausible face-crop statistics: mid-gray with low-freq structure
    base = rng.integers(60, 190, size=(IMG_SIZE // 8, IMG_SIZE // 8, 3),
                        dtype=np.uint8)
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
    noise = rng.integers(0, 25, size=img.shape, dtype=np.uint8)
    return (img + noise).astype(np.uint8)


def synthetic_audio_loader(path: str) -> Optional[np.ndarray]:
    rng = np.random.default_rng(_seed_from(path))
    n = SAMPLE_RATE  # one second
    t = np.arange(n) / SAMPLE_RATE
    f0 = float(rng.uniform(120, 300))
    x = (0.25 * np.sin(2 * np.pi * f0 * t)
         + 0.05 * rng.normal(size=n))
    return x.astype(np.float32)


def synthetic_records(n_videos: int = 2, length: int = 481,
                      missing_every: int = 0, seed: int = 0
                      ) -> List[VideoRecord]:
    """Videos with frame ids 1..length (optionally dropping every k-th frame
    to exercise the decimation/placeholder paths) and smooth V/A traces."""
    records = []
    for vi in range(n_videos):
        rng = np.random.default_rng(seed + vi)
        ids = np.arange(1, length + 1)
        if missing_every > 1:
            ids = ids[ids % missing_every != 0]
        t = ids / 30.0
        phase = rng.uniform(0, np.pi)
        v = 0.7 * np.sin(2 * np.pi * t / 20 + phase)
        a = 0.6 * np.sin(2 * np.pi * t / 31 + phase * 0.5)
        records.append(VideoRecord(
            name=f"synth{vi:03d}",
            image_paths=[f"synth{vi:03d}/{i:05d}.jpg" for i in ids],
            labels_v=v.astype(np.float32),
            labels_a=a.astype(np.float32),
            frame_ids=ids.astype(np.int64),
            length=length,
            wav_dir=f"/synthetic/audio/synth{vi:03d}",
        ))
    return records


def synthetic_dataset(split: str, n_videos: int = 2, length: int = 481,
                      missing_every: int = 0, stride: int = 1,
                      img_size: int = IMG_SIZE,
                      check_coverage: bool = True) -> WindowedDataset:
    return WindowedDataset(
        synthetic_records(n_videos, length, missing_every), split=split,
        stride=stride,
        frame_loader=synthetic_frame_loader,
        audio_loader=synthetic_audio_loader,
        img_size=img_size, check_coverage=check_coverage)
