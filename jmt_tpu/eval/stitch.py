"""Per-video prediction stitching, smoothing, CCC, challenge writers.

Capability target: the stitch/smooth/score tail of validate()
(val.py:313-397) and Test() (test.py:300-363):

* per-clip predictions are scattered into per-video arrays at index
  anchor-1; anchors beyond the video length are dropped; frames whose
  label is -5.0 keep pred=0 AND label=0 (they still enter the CCC — an
  exact reference behavior, val.py:335-344);
* per video: clip to [-1,1], uniform_filter1d smoothing (valence 20,
  arousal 50, zero-fill), then ONE CCC over all videos concatenated;
* Test mode writes ``{vid}.txt`` files with the challenge format
  ``image_location,valence,arousal`` + %.5f rows (test.py:340-349) and the
  same pkl dump layout.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from jmt_tpu.ops.smoothing import uniform_filter1d
import jax.numpy as jnp


class Stitcher:
    """Accumulates per-clip predictions into per-video traces."""

    def __init__(self, with_labels: bool = True):
        self.with_labels = with_labels
        self.pred_v: Dict[str, np.ndarray] = {}
        self.pred_a: Dict[str, np.ndarray] = {}
        self.label_v: Dict[str, np.ndarray] = {}
        self.label_a: Dict[str, np.ndarray] = {}
        # ordering contract: windows of a video must arrive in sequence
        # (overlapping windows overwrite — last write wins, so order
        # changes results); tracks the last seen anchor per video
        self._last_anchor: Dict[str, int] = {}
        # completeness: highest in-range anchor written per video; the eval
        # windowing covers every frame 1..length, so a video is complete
        # exactly when this reaches its length
        self.lengths: Dict[str, int] = {}
        self._max_anchor: Dict[str, int] = {}

    def add_batch(self, vouts: np.ndarray, aouts: np.ndarray,
                  anchors: np.ndarray, videos: Sequence[str],
                  lengths: Sequence[int],
                  labels_v: Optional[np.ndarray] = None,
                  labels_a: Optional[np.ndarray] = None,
                  n_real: Optional[int] = None) -> None:
        """vouts/aouts/anchors: (B, S); videos/lengths: per-sample.

        n_real: number of non-padding rows (static-batch padding support).
        """
        b = len(videos) if n_real is None else n_real
        for i in range(b):
            vid, length = videos[i], int(lengths[i])
            first = int(anchors[i][0])
            if vid not in self.pred_v:
                # the reference dies unless a video's FIRST seen frame is
                # frameid 1 (val.py:320-325: `if frameid > 1: ... exit`)
                if first > 1:
                    raise ValueError(
                        f"out-of-order windows for {vid}: first anchor "
                        f"{first} != 1 (reference exits here too — "
                        f"val.py:320-325)")
                self.pred_v[vid] = np.zeros(length)
                self.pred_a[vid] = np.zeros(length)
                self.label_v[vid] = np.zeros(length)
                self.label_a[vid] = np.zeros(length)
                self.lengths[vid] = length
                self._max_anchor[vid] = 0
            elif first < self._last_anchor.get(vid, 0):
                # overlapping windows are written last-wins (like the
                # reference's sequential loop) — a shuffled/parallel eval
                # loader would silently mis-stitch, so die instead
                raise ValueError(
                    f"non-sequential windows for {vid}: anchor {first} "
                    f"after {self._last_anchor[vid]} — eval batches must "
                    f"arrive in dataset order")
            self._last_anchor[vid] = first
            for j in range(vouts.shape[1]):
                fid = int(anchors[i][j])
                if fid > length:
                    continue
                if fid > self._max_anchor[vid]:
                    self._max_anchor[vid] = fid
                if self.with_labels:
                    lv = float(labels_v[i][j])
                    la = float(labels_a[i][j])
                    # -5 labels: slot stays (0, 0) but REMAINS in the CCC
                    # (val.py:335-344)
                    if lv == -5.0 or la == -5.0:
                        continue
                    self.label_v[vid][fid - 1] = lv
                    self.label_a[vid][fid - 1] = la
                self.pred_v[vid][fid - 1] = float(vouts[i][j])
                self.pred_a[vid][fid - 1] = float(aouts[i][j])

    def is_complete(self, vid: str) -> bool:
        """True once every frame of `vid` has been written (the eval
        windowing emits every anchor 1..length, so the highest in-range
        anchor reaching length means full coverage). A video never fed
        is NOT complete."""
        if vid not in self.lengths:
            return False
        return self._max_anchor.get(vid, 0) >= self.lengths[vid]

    def smoothed(self, v_size: int = 20, a_size: int = 50
                 ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
        sv, sa = {}, {}
        for vid in self.pred_v:
            cv = np.clip(self.pred_v[vid], -1.0, 1.0)
            ca = np.clip(self.pred_a[vid], -1.0, 1.0)
            sv[vid] = np.asarray(uniform_filter1d(jnp.asarray(cv), v_size))
            sa[vid] = np.asarray(uniform_filter1d(jnp.asarray(ca), a_size))
        return sv, sa

    def scores(self) -> Tuple[float, float]:
        """(ccc_v, ccc_a) over all videos concatenated (val.py:359-382)."""
        from jmt_tpu.ops.ccc import ccc_metric
        sv, sa = self.smoothed()
        vout = np.concatenate([sv[k] for k in self.pred_v])
        aout = np.concatenate([sa[k] for k in self.pred_v])
        vtar = np.concatenate([self.label_v[k] for k in self.pred_v])
        atar = np.concatenate([self.label_a[k] for k in self.pred_v])
        return (float(ccc_metric(jnp.asarray(vout), jnp.asarray(vtar))),
                float(ccc_metric(jnp.asarray(aout), jnp.asarray(atar))))

    def dump_pkl(self, path: str) -> None:
        """Eval pkl layout (val.py:384-397 / test.py:351-363)."""
        sv, sa = self.smoothed()
        data = {
            "trg": ({"vl": self.label_v, "ar": self.label_a}
                    if self.with_labels else {"vl": None, "ar": None}),
            "pred": {"vl": sv, "ar": sa},
        }
        with open(path, "wb") as f:
            pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)


def write_challenge_txt(stitcher: Stitcher, dir_out: str) -> List[str]:
    """Challenge submission files, format parity with test.py:322-349."""
    os.makedirs(dir_out, exist_ok=True)
    sv, sa = stitcher.smoothed()
    written = []
    for vid in sv:
        path = os.path.join(dir_out, vid + ".txt")
        with open(path, "w") as f:
            f.write("image_location,valence,arousal\n")
            for i in range(len(sv[vid])):
                f.write(",".join([
                    f"{vid}/{i + 1:05d}.jpg",
                    f"{sv[vid][i]:.5f}",
                    f"{sa[vid][i]:.5f}",
                ]) + "\n")
        written.append(path)
    return written
