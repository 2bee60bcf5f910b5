"""Datasets: windowed audio-visual samples with pluggable IO.

Capability target: ImageList / ImageList_val / ImageList_test
(dataset_new.py:182-373, dataset_val.py:194-355, dataset_test.py:198-423)
— eager windowing at construction, per-sample materialization of 16 clips
x 8 frames (uint8 112x112x3, missing frame -> zeros via the reference's
bare-except, dataset_new.py:262-266) and 16 one-second wavs (left-padded to
45,599 samples; missing wav -> zeros in val/test, dataset_val.py:321-334).

TPU-native split of responsibilities: the dataset returns RAW uint8 frames
and RAW fixed-length audio; normalization, color augmentation and the mel
front-end run fused ON DEVICE (data/transforms.py, ops/mel.py). The
reference instead burns DataLoader workers on ~144 PIL decodes + 16 CPU
FFTs per sample (SURVEY.md §3.4).

IO is pluggable (frame_loader / audio_loader callables) so the same dataset
serves real Affwild2 directories, test fixtures, and the synthetic
benchmark source (data/synthetic.py).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Sequence

import numpy as np

from jmt_tpu.data import windowing as W
from jmt_tpu.data.audio_io import load_wav
from jmt_tpu.ops.mel import AUDIO_SAMPLES

FrameLoader = Callable[[str], Optional[np.ndarray]]
AudioLoader = Callable[[str], Optional[np.ndarray]]

IMG_SIZE = 112


@dataclasses.dataclass
class VideoRecord:
    """One annotated video: rows are (image path, V, A, frame_id)."""
    name: str                 # csv stem, may end in _left/_right
    image_paths: List[str]
    labels_v: np.ndarray      # (n,)
    labels_a: np.ndarray      # (n,)
    frame_ids: np.ndarray     # (n,) int
    length: int               # realtimestamps line count
    wav_dir: str              # {wavs_root}/{vidname}; wavs are {anchor}.wav

    @property
    def vidname(self) -> str:
        # _left/_right share one audio track (dataset_new.py:85-93)
        for suf in ("_left", "_right"):
            if self.name.endswith(suf):
                return self.name[: -len(suf)]
        return self.name


def load_video_records(labeldir: str, wavs_root: str, timestamps_dir: str,
                       skip: Sequence[str] = (), take_n_videos: int = -1
                       ) -> List[VideoRecord]:
    """Read per-video CSVs (img,V,A,frame_id) + realtimestamps line counts
    (dataset_new.py:71-99). Sorted by basename; optional skip list and
    take_n truncation."""
    import pandas as pd

    csvs = [f for f in os.listdir(labeldir)
            if f.endswith(".csv") and not f.startswith(".")
            and f not in skip]
    csvs = W.sort_files_by_basename(csvs)
    if take_n_videos > 0:
        csvs = csvs[:take_n_videos]
    records = []
    for csv_name in csvs:
        df = pd.read_csv(os.path.join(labeldir, csv_name))
        stem = os.path.splitext(csv_name)[0]
        n_rows = len(df)
        # challenge test split has no V/A labels; fill with the ignore value
        lv = (df["V"].to_numpy(np.float32) if "V" in df
              else np.full(n_rows, -5.0, np.float32))
        la = (df["A"].to_numpy(np.float32) if "A" in df
              else np.full(n_rows, -5.0, np.float32))
        rec = VideoRecord(
            name=stem,
            image_paths=list(df["img"]),
            labels_v=lv,
            labels_a=la,
            frame_ids=df["frame_id"].to_numpy(np.int64),
            length=0, wav_dir="")
        ts = os.path.join(timestamps_dir, rec.vidname + "_video_ts.txt")
        with open(ts) as f:
            rec.length = len(f.readlines()[1:])
        rec.wav_dir = os.path.join(wavs_root, rec.vidname)
        records.append(rec)
    return records


def default_frame_loader(path: str) -> Optional[np.ndarray]:
    try:
        from PIL import Image
        return np.asarray(Image.open(path))
    except Exception:
        return None  # black frame fallback (dataset_new.py:262-266)


def _fit_audio(wav: Optional[np.ndarray],
               length: int = AUDIO_SAMPLES) -> np.ndarray:
    """Left-zero-pad to `length` samples; longer clips keep their TAIL (the
    left-aligned convention; the reference instead keeps long wavs whole and
    pads the batch dynamically, padSequence.py:8-21 — static shapes here).

    Quantified divergence + the wider-bucket escape hatch
    (cfg.audio_samples): see PARITY.md 'Long-wav truncation'."""
    out = np.zeros(length, np.float32)
    if wav is None or len(wav) == 0:
        return out
    if len(wav) >= length:
        return wav[-length:].astype(np.float32)
    out[-len(wav):] = wav
    return out


@dataclasses.dataclass
class Sample:
    """One window: fixed static shapes, ready for device preprocessing."""
    clips: np.ndarray      # (16, 8, 112, 112, 3) uint8
    audio: np.ndarray      # (16, 45599) float32
    labels_v: np.ndarray   # (16,) float32 (-5.0 for placeholders)
    labels_a: np.ndarray   # (16,)
    anchors: np.ndarray    # (16,) int64 frame ids (eval stitching)
    video: str
    length: int
    wav_paths: List[str]   # for wavLM feature lookup


class WindowedDataset:
    """Train or eval windowed dataset over VideoRecords."""

    def __init__(self, records: Sequence[VideoRecord], split: str,
                 stride: int = 1, win_length: int = 512,
                 frame_loader: FrameLoader = default_frame_loader,
                 audio_loader: AudioLoader = load_wav,
                 check_coverage: bool = True, img_size: int = IMG_SIZE,
                 use_native: Optional[bool] = None,
                 audio_samples: int = AUDIO_SAMPLES):
        assert split in ("train", "val", "test"), split
        self.split = split
        self.img_size = img_size
        # static per-wav bucket; >45599 keeps long wavs whole (PARITY.md)
        self.audio_samples = int(audio_samples)
        # native batched decode only makes sense with the default file
        # loaders (synthetic/test loaders stay pluggable)
        if use_native is None:
            # measured (tools/ingest_bench.py): on a SINGLE-core host the
            # pthread decode pool loses to the sequential PIL path
            # (443 vs 521 clips/s — pool contention with the prefetch
            # producer thread); native pays off only with cores to spare
            # count cores actually AVAILABLE to this process (cgroup /
            # affinity limits), not the host total — in a 1-core container
            # on a big host the pool would otherwise be chosen in exactly
            # the regime where it loses
            try:
                avail = len(os.sched_getaffinity(0))
            except (AttributeError, OSError):
                avail = os.cpu_count() or 1
            use_native = (frame_loader is default_frame_loader
                          and audio_loader is load_wav
                          and avail >= 2)
        if use_native:
            from jmt_tpu.data import native as _native
            use_native = _native.available()
        self.use_native = bool(use_native)
        self.records = list(records)
        self.frame_loader = frame_loader
        self.audio_loader = audio_loader
        self.index: List = []  # (record_idx, WindowSample)
        windower = W.train_windows if split == "train" else W.eval_windows
        for ri, rec in enumerate(self.records):
            samples, emitted = windower(rec.frame_ids, rec.length,
                                        win_length=win_length, stride=stride)
            if check_coverage and not W.coverage_check(emitted, rec.length):
                raise ValueError(
                    f"windowing coverage broken for video {rec.name}: "
                    f"{len(set(emitted))} anchors != length {rec.length} "
                    f"(reference dies here too, dataset_new.py:156-162)")
            for s in samples:
                self.index.append((ri, s))

    def __len__(self) -> int:
        return len(self.index)

    def __getitem__(self, i: int) -> Sample:
        ri, win = self.index[i]
        rec = self.records[ri]
        n = W.SUBSEQS_PER_WINDOW
        sz = self.img_size
        clips = np.zeros((n, W.CLIP_LEN, sz, sz, 3), np.uint8)
        audio = np.zeros((n, self.audio_samples), np.float32)
        labels_v = np.full((n,), -5.0, np.float32)
        labels_a = np.full((n,), -5.0, np.float32)
        anchors = np.zeros((n,), np.int64)
        wav_paths: List[str] = []
        # (clip, frame) slots to fill + their file paths
        frame_slots: List = []
        audio_slots: List[int] = []
        for ci, clip in enumerate(win.clips):
            anchors[ci] = clip.anchor
            wav_path = os.path.join(rec.wav_dir, f"{clip.anchor}.wav")
            wav_paths.append(wav_path)
            if clip.rows is not None:
                for fi, row in enumerate(clip.rows):
                    frame_slots.append((ci, fi, rec.image_paths[row]))
                    # last row's labels win (dataset_new.py:257-266)
                    labels_v[ci] = rec.labels_v[row]
                    labels_a[ci] = rec.labels_a[row]
                audio_slots.append(ci)
            # placeholder: zero frames/audio, -5 labels (dataset_val.py)

        if self.use_native and frame_slots:
            from jmt_tpu.data import native as _native
            imgs = _native.decode_jpeg_batch(
                [p for _, _, p in frame_slots], sz, sz)
            wavs = _native.decode_wav_batch(
                [wav_paths[ci] for ci in audio_slots], self.audio_samples)
            for k, (ci, fi, _) in enumerate(frame_slots):
                clips[ci, fi] = imgs[k]
            for k, ci in enumerate(audio_slots):
                audio[ci] = wavs[k]
        else:
            for ci, fi, path in frame_slots:
                img = self.frame_loader(path)
                if img is not None:
                    clips[ci, fi, :, :, :3] = img[:sz, :sz]
            for ci in audio_slots:
                audio[ci] = _fit_audio(self.audio_loader(wav_paths[ci]),
                                       self.audio_samples)
        if self.split == "test":
            # test-split quirk: a near-empty wav (<=100 samples) reuses the
            # previous clip's audio (dataset_test.py:360-368). Cheap gate on
            # file size (<=100 samples cannot exceed ~1KB in any PCM layout)
            # so the common case costs one stat, not a re-decode.
            for k, ci in enumerate(audio_slots):
                p = wav_paths[ci]
                try:
                    tiny = os.path.getsize(p) < 1024
                except OSError:
                    tiny = False
                if tiny and k > 0:
                    raw = self.audio_loader(p)
                    if raw is not None and 0 < len(raw) <= 100:
                        audio[ci] = audio[audio_slots[k - 1]]
        return Sample(clips=clips, audio=audio, labels_v=labels_v,
                      labels_a=labels_a, anchors=anchors, video=rec.name,
                      length=rec.length, wav_paths=wav_paths)


@dataclasses.dataclass
class Batch:
    """Stacked samples, static shapes (device-ready)."""
    clips: np.ndarray      # (B, 16, 8, 112, 112, 3) uint8
    audio: np.ndarray      # (B, 16, 45599) float32
    labels_v: np.ndarray   # (B, 16)
    labels_a: np.ndarray   # (B, 16)
    anchors: np.ndarray    # (B, 16)
    videos: List[str]
    lengths: List[int]
    wav_paths: List[List[str]]
    wavlm: Optional[np.ndarray] = None  # (B, 16, 768) if wavLM enabled
    # multi-host lockstep: hosts with fewer samples yield filler batches so
    # every process issues the same number of (collective) steps; rows past
    # n_valid are weight-0 padding (None = all rows valid)
    n_valid: Optional[int] = None


def collate(samples: Sequence[Sample]) -> Batch:
    """Static-shape stacking — replaces the reference's dynamic per-batch
    max-width padding (padSequence.py:4-101); spectrogram width is fixed by
    the fused mel front-end, so nothing here is data-dependent."""
    return Batch(
        clips=np.stack([s.clips for s in samples]),
        audio=np.stack([s.audio for s in samples]),
        labels_v=np.stack([s.labels_v for s in samples]),
        labels_a=np.stack([s.labels_a for s in samples]),
        anchors=np.stack([s.anchors for s in samples]),
        videos=[s.video for s in samples],
        lengths=[s.length for s in samples],
        wav_paths=[s.wav_paths for s in samples],
    )


class WavlmFeatureStore:
    """Precomputed WavLM features: {root}/{vidname}/{anchor}.npy -> (768,).

    Parity with the in-loop .npy reads (train.py:150-171), minus the
    absolute-path-depth indexing fragility (split_path[6], train.py:153).
    Missing features are zeros.
    """

    def __init__(self, root: str, dim: int = 768,
                 loader: Optional[Callable[[str], Optional[np.ndarray]]] = None):
        self.root = root
        self.dim = dim
        self._loader = loader or self._np_loader

    @staticmethod
    def _np_loader(path: str) -> Optional[np.ndarray]:
        if os.path.exists(path):
            return np.load(path)
        return None

    def lookup_batch(self, wav_paths: List[List[str]]) -> np.ndarray:
        b = len(wav_paths)
        s = len(wav_paths[0])
        out = np.zeros((b, s, self.dim), np.float32)
        for i, row in enumerate(wav_paths):
            for j, wav in enumerate(row):
                stem = os.path.splitext(os.path.basename(wav))[0]
                vid = os.path.basename(os.path.dirname(wav))
                feat = self._loader(os.path.join(self.root, vid,
                                                 f"{stem}.npy"))
                if feat is not None:
                    out[i, j] = feat[:self.dim]
        return out
