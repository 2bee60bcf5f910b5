"""File-surface pipeline: Affwild2-layout tree -> records -> windowed
dataset -> prefetch loader -> collated batches.

Drives the exact disk layout the reference trains from (per-video label
CSVs `img,V,A,frame_id` dataset_new.py:71-99, realtimestamp line counts,
per-anchor `{wavdir}/{frameidx}.wav` dataset_new.py:113, JPEG frame
files) through the REAL file loaders — the path the synthetic in-memory
source bypasses. The tree generator is shared with tools/ingest_bench.py.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from ingest_bench import generate_tree  # noqa: E402

from jmt_tpu.data.datasets import load_video_records, WindowedDataset
from jmt_tpu.data.loader import PrefetchLoader


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("affwild_tree"))
    return generate_tree(n_videos=2, length=481, root=root)


def test_load_video_records(tree):
    recs = load_video_records(tree["labels"], tree["wavs"], tree["ts"])
    assert [r.name for r in recs] == ["001", "002"]  # basename-sorted
    for r in recs:
        assert r.length == 481  # realtimestamps line count minus header
        assert len(r.image_paths) == 481
        assert r.wav_dir.endswith(r.name)
        assert r.frame_ids[0] == 1 and r.frame_ids[-1] == 481
        assert np.abs(r.labels_v).max() <= 1.0
    # take_n truncation (dataset_new.py:63-69) and skip list
    assert len(load_video_records(tree["labels"], tree["wavs"], tree["ts"],
                                  take_n_videos=1)) == 1
    assert len(load_video_records(tree["labels"], tree["wavs"], tree["ts"],
                                  skip=["001.csv"])) == 1


def test_train_dataset_decodes_real_files(tree):
    recs = load_video_records(tree["labels"], tree["wavs"], tree["ts"])
    ds = WindowedDataset(recs, "train")
    assert len(ds) == 2  # one 512-window per 481-frame video
    s = ds[0]
    assert s.clips.shape == (16, 8, 112, 112, 3) and s.clips.dtype == np.uint8
    assert s.clips.any(), "JPEG frames should decode to nonzero pixels"
    assert s.audio.shape == (16, 45599)
    # 30-fps chunk wavs are 47,040 samples; the tail-keep bucket fills it
    assert np.abs(s.audio).max() > 0
    assert s.labels_v.shape == (16,)
    assert (s.labels_v >= -5.0).all()
    # anchors are the last frame of each 32-frame subsequence
    assert s.anchors[0] >= 1 and s.anchors[-1] <= 481
    assert (np.diff(s.anchors) > 0).all()


def test_eval_dataset_and_loader(tree):
    recs = load_video_records(tree["labels"], tree["wavs"], tree["ts"])
    ds = WindowedDataset(recs, "val")
    loader = PrefetchLoader(ds, batch_size=2, shuffle=False)
    seen = 0
    first = None
    for batch in loader:
        if first is None:
            first = batch
        seen += batch.clips.shape[0]
    assert seen == len(ds)
    assert first.clips.shape[1:] == (16, 8, 112, 112, 3)
    assert first.videos[0] == "001"
    assert int(first.anchors[0][0]) == 1  # stitcher first-anchor contract


def test_missing_files_fall_back_to_zeros(tree):
    """Reference behavior: unreadable frame -> black frame (bare except,
    dataset_new.py:262-266); missing wav -> zeros (dataset_val.py:321)."""
    recs = load_video_records(tree["labels"], tree["wavs"], tree["ts"])
    rec = recs[0]
    rec.image_paths = ["/nonexistent/x.jpg"] * len(rec.image_paths)
    rec.wav_dir = "/nonexistent"
    ds = WindowedDataset([rec], "train")
    s = ds[0]
    assert not s.clips.any()
    assert not s.audio.any()


@pytest.mark.slow
def test_wavlm_extract_feeds_real_pipeline(tree, tmp_path):
    """Audio self-loop: features computed by the in-framework WavLM
    extractor are found and consumed by the REAL training pipeline
    (windower wav paths -> WavlmFeatureStore lookup), closing the
    reference's external-feature dependency end-to-end."""
    import torch
    import wave as wave_mod
    from test_wavlm import _tiny_hf_config
    from transformers import WavLMModel
    from jmt_tpu.models.wavlm import WavLMConfig
    from jmt_tpu.data.wavlm_extract import extract_tree
    from jmt_tpu.data.datasets import WavlmFeatureStore

    torch.manual_seed(7)
    hf = _tiny_hf_config()
    tm = WavLMModel(hf).eval()
    cfg = WavLMConfig.from_hf(hf)
    ckpt = tmp_path / "wavlm_tiny.pt"
    torch.save(tm.state_dict(), ckpt)

    # full-track wav per video (the ingest tree has only per-anchor
    # chunks; the offline extractor consumes whole tracks)
    length, fps = 481, 30.0
    tracks = tmp_path / "tracks"
    os.makedirs(tracks)
    rng = np.random.default_rng(9)
    n_samp = int(round(length / fps * 44100))
    for vid in ("001", "002"):
        pcm = (rng.normal(size=n_samp) * 3000).astype("<i2")
        with wave_mod.open(str(tracks / f"{vid}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(pcm.tobytes())

    feats_dir = tmp_path / "wavlm_feats"
    n = extract_tree(str(ckpt), str(tracks), str(feats_dir), fps=fps,
                     window_s=0.5, overlap_s=0.05, cfg=cfg, verbose=False,
                     n_frames_for=lambda v, d: length)
    assert n == 2 * length

    # the real pipeline: records -> windower -> wav paths -> store lookup
    recs = load_video_records(tree["labels"], tree["wavs"], tree["ts"])
    ds = WindowedDataset(recs, "train")
    store = WavlmFeatureStore(str(feats_dir), dim=cfg.hidden_size)
    from jmt_tpu.data.datasets import collate
    batch = collate([ds[0], ds[len(ds) - 1]])
    feats = store.lookup_batch(batch.wav_paths)
    assert feats.shape == (2, 16, cfg.hidden_size)
    # every anchor must resolve to a real (non-zero) extracted feature
    assert (np.abs(feats).sum(axis=2) > 0).all()
    # and match the on-disk per-frame file exactly
    stem = os.path.splitext(os.path.basename(batch.wav_paths[0][0]))[0]
    vid = os.path.basename(os.path.dirname(batch.wav_paths[0][0]))
    np.testing.assert_array_equal(
        feats[0, 0], np.load(feats_dir / vid / f"{stem}.npy"))
