"""Offline preprocessing tools.

Capability targets (SURVEY.md §2.2):

* ``convert_va_annotations`` — Affwild2 ``VA_Set`` txt annotations ->
  per-video CSV ``(img, V, A, frame_id)``, dropping ``-5`` rows
  (datasets/preprocessing.py:31-75). Paths are arguments, not the
  reference's hardcoded cluster paths.
* ``explode_wavlm_features`` — per-video WavLM CSV -> per-frame ``{n}.npy``
  (create_wavlm_audio_feat.py:7-33). ``feature_dim`` defaults to 768, the
  dimension the run path actually consumes (train.py:130); the reference
  tool truncates to 512, inconsistent with its own training code — kept as
  an option, not the default.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def frame_name(i: int) -> str:
    """1-based zero-padded frame file stem (preprocessing.py:17-29)."""
    return f"{i:05d}"


def convert_va_annotations(anno_dir: str, out_dir: str) -> List[str]:
    """Each ``{video}.txt`` (header line + 'V,A' rows, one per frame) ->
    ``{video}.csv`` with columns img,V,A,frame_id; -5 rows dropped."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for fname in sorted(os.listdir(anno_dir)):
        if not fname.endswith(".txt"):
            continue
        video = os.path.splitext(fname)[0]
        imgs, vs, aas, fids = [], [], [], []
        with open(os.path.join(anno_dir, fname)) as f:
            lines = f.readlines()[1:]  # skip the 'valence,arousal' header
        for i, line in enumerate(lines):
            parts = line.strip().split(",")
            if len(parts) < 2 or parts[0] == "-5" or parts[1] == "-5":
                continue
            imgs.append(f"{video}/{frame_name(i + 1)}.jpg")
            vs.append(float(parts[0]))
            aas.append(float(parts[1]))
            fids.append(frame_name(i + 1))
        df = pd.DataFrame({"img": imgs, "V": vs, "A": aas,
                           "frame_id": fids})
        out = os.path.join(out_dir, f"{video}.csv")
        df.to_csv(out)
        written.append(out)
    return written


def explode_wavlm_features(source_dir: str, dest_dir: str,
                           feature_dim: Optional[int] = 768) -> int:
    """Per-video WavLM CSVs (rows = frames) -> {dest}/{video}/{n}.npy,
    n starting at 1. Returns the number of .npy files written."""
    import pandas as pd

    count = 0
    for fname in sorted(os.listdir(source_dir)):
        path = os.path.join(source_dir, fname)
        if not os.path.isfile(path):
            continue
        video = os.path.splitext(fname)[0]
        out_dir = os.path.join(dest_dir, video)
        os.makedirs(out_dir, exist_ok=True)
        feats = pd.read_csv(path).to_numpy(dtype=np.float32)
        if feature_dim is not None:
            feats = feats[:, :feature_dim]
        for i in range(feats.shape[0]):
            np.save(os.path.join(out_dir, f"{i + 1}.npy"), feats[i])
            count += 1
    return count


def write_realtimestamps(out_dir: str, video: str, n_frames: int,
                         fps: float = 30.0) -> str:
    """Helper to produce a ``{video}_video_ts.txt`` in the reference's
    format (header + one timestamp line per frame) — used by tests and by
    users preparing data without the original extraction pipeline."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{video}_video_ts.txt")
    with open(path, "w") as f:
        f.write("timestamp\n")
        for i in range(n_frames):
            f.write(f"{i / fps:.6f}\n")
    return path
