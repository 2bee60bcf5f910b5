"""Preprocessing tools, native IO, prefetch loader, extra augmentation,
digitized CCC."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ----------------------------------------------------- preprocessing -------
def test_convert_va_annotations(tmp_path):
    from jmt_tpu.data.preprocessing import convert_va_annotations
    anno = tmp_path / "VA"
    anno.mkdir()
    (anno / "vid1.txt").write_text(
        "valence,arousal\n0.5,0.25\n-5,-5\n-0.1,0.9\n")
    out = convert_va_annotations(str(anno), str(tmp_path / "csv"))
    import pandas as pd
    df = pd.read_csv(out[0])
    # -5 row dropped; frame ids keep their 1-based position
    assert list(df["V"]) == [0.5, -0.1]
    assert list(df["frame_id"]) == [1, 3]
    assert df["img"][0] == "vid1/00001.jpg"
    assert df["img"][1] == "vid1/00003.jpg"


def test_explode_wavlm_features(tmp_path):
    from jmt_tpu.data.preprocessing import explode_wavlm_features
    import pandas as pd
    src = tmp_path / "src"
    src.mkdir()
    feats = np.arange(3 * 800, dtype=np.float32).reshape(3, 800)
    pd.DataFrame(feats).to_csv(src / "vidA.csv", index=False)
    n = explode_wavlm_features(str(src), str(tmp_path / "out"),
                               feature_dim=768)
    assert n == 3
    one = np.load(tmp_path / "out" / "vidA" / "1.npy")
    assert one.shape == (768,)
    np.testing.assert_array_equal(one, feats[0, :768])


# ------------------------------------------------------- native IO ---------
def test_native_jpeg_matches_pil(tmp_path):
    from jmt_tpu.data import native
    if not native.available():
        pytest.skip("native lib unavailable")
    from PIL import Image
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(112, 112, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(img).save(p, quality=90)
    got = native.decode_jpeg_batch([p, "/nope.jpg"], 112, 112)
    want = np.asarray(Image.open(p))
    np.testing.assert_array_equal(got[0], want)
    assert not got[1].any()


def test_native_wav_matches_python(tmp_path):
    from jmt_tpu.data import native
    if not native.available():
        pytest.skip("native lib unavailable")
    from jmt_tpu.data.audio_io import write_wav, load_wav
    w = (0.3 * np.sin(np.arange(30000) / 7.0)).astype(np.float32)
    p = str(tmp_path / "a" / "5.wav")
    write_wav(p, w)
    got = native.decode_wav_batch([p], 45599)[0]
    ref = load_wav(p)
    want = np.zeros(45599, np.float32)
    want[-len(ref):] = ref
    np.testing.assert_array_equal(got, want)


def test_dataset_native_vs_python_paths(tmp_path):
    """WindowedDataset produces identical samples through both IO paths."""
    from jmt_tpu.data import native
    if not native.available():
        pytest.skip("native lib unavailable")
    from PIL import Image
    from jmt_tpu.data.datasets import VideoRecord, WindowedDataset
    from jmt_tpu.data.audio_io import write_wav
    rng = np.random.default_rng(1)
    length = 481
    frames_dir = tmp_path / "frames" / "v0"
    frames_dir.mkdir(parents=True)
    wav_dir = tmp_path / "wavs" / "v0"
    paths = []
    for i in range(1, length + 1):
        p = str(frames_dir / f"{i:05d}.jpg")
        if i % 3 == 0:  # only some frames exist on disk
            Image.fromarray(rng.integers(0, 255, (112, 112, 3),
                                         dtype=np.uint8)).save(p)
        paths.append(p)
    for anchor in range(32, 482, 32):
        write_wav(str(wav_dir / f"{anchor}.wav"),
                  rng.normal(size=22050).astype(np.float32) * 0.1)
    rec = VideoRecord(name="v0", image_paths=paths,
                      labels_v=rng.uniform(-1, 1, length).astype(np.float32),
                      labels_a=rng.uniform(-1, 1, length).astype(np.float32),
                      frame_ids=np.arange(1, length + 1),
                      length=length, wav_dir=str(wav_dir))
    ds_native = WindowedDataset([rec], "train", use_native=True)
    ds_python = WindowedDataset([rec], "train", use_native=False)
    a, b = ds_native[0], ds_python[0]
    np.testing.assert_array_equal(a.clips, b.clips)
    np.testing.assert_allclose(a.audio, b.audio, atol=1e-7)
    np.testing.assert_array_equal(a.labels_v, b.labels_v)


# -------------------------------------------------- prefetch loader --------
def test_prefetch_loader_matches_sync():
    from jmt_tpu.data.loader import PrefetchLoader
    from jmt_tpu.data.synthetic import synthetic_dataset
    from jmt_tpu.train.loops import batches_from_dataset
    ds = synthetic_dataset("val", n_videos=1, length=481, img_size=48)
    sync = list(batches_from_dataset(ds, 8, shuffle=False))
    pre = list(PrefetchLoader(ds, 8, shuffle=False, prefetch=3))
    assert len(sync) == len(pre) == 4
    for s, p in zip(sync, pre):
        np.testing.assert_array_equal(s.clips, p.clips)
        assert s.videos == p.videos


def test_prefetch_loader_propagates_errors():
    from jmt_tpu.data.loader import PrefetchLoader

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(PrefetchLoader(Broken(), 2))


# ------------------------------------------------- extra augmentation ------
def test_more_vision_augment_shapes_and_range():
    from jmt_tpu.data.transforms import more_vision_augment, VIS_MEAN, VIS_STD
    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, size=(2, 4, 48, 48, 3), dtype=np.uint8)
    out = np.asarray(more_vision_augment(jnp.asarray(clips),
                                         jax.random.PRNGKey(0)))
    assert out.shape == (2, 4, 48, 48, 3)
    assert np.isfinite(out).all()
    # normalized range: raw in [0,255] -> normalized within mean/std bounds
    lo = (0 - VIS_MEAN.max()) / VIS_STD.min() - 0.1
    hi = (1 - VIS_MEAN.min()) / VIS_STD.min() + 0.1
    assert out.min() >= lo and out.max() <= hi


def test_phase_vocoder_identity_rate():
    from jmt_tpu.ops.audio_augment import phase_vocoder, _complex_stft
    rng = np.random.default_rng(1)
    audio = (0.2 * rng.normal(size=(2, 45599))).astype(np.float32)
    spec = _complex_stft(jnp.asarray(audio))
    out, valid = phase_vocoder(spec, jnp.ones(2))
    assert int(valid[0]) == spec.shape[1]
    got = np.asarray(out)[:, :spec.shape[1], :]
    np.testing.assert_allclose(np.abs(got), np.abs(np.asarray(spec)),
                               atol=1e-3)


def test_phase_vocoder_stretch_lengths():
    from jmt_tpu.ops.audio_augment import phase_vocoder, _complex_stft
    audio = jnp.zeros((2, 45599)) + 0.01
    spec = _complex_stft(audio)
    _, valid = phase_vocoder(spec, jnp.asarray([1.2, 0.9]))
    assert int(valid[0]) == int(np.ceil(104 / 1.2))
    assert int(valid[1]) == int(np.ceil(104 / 0.9))


def test_more_audio_augment_output():
    from jmt_tpu.ops.audio_augment import more_audio_augment, AUG_FRAMES
    rng = np.random.default_rng(2)
    audio = (0.2 * rng.normal(size=(4, 45599))).astype(np.float32)
    out = np.asarray(more_audio_augment(jnp.asarray(audio),
                                        jax.random.PRNGKey(3)))
    assert out.shape == (4, 64, AUG_FRAMES)
    assert np.isfinite(out).all()
    assert (out >= 0).all()  # mel magnitudes (no dB — reference quirk)


# --------------------------------------------------- digitized CCC ---------
def test_ccc_loss_digitized_matches_torch_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from jmt_tpu.ops.ccc import ccc_loss_digitized
    rng = np.random.default_rng(3)
    k = 20
    logits = rng.normal(size=(64, k)).astype(np.float32)
    target = rng.uniform(-1, 1, 64).astype(np.float32)
    # reference formula (losses/loss.py:14-32)
    bins = torch.tensor(np.linspace(-1, 1, k), dtype=torch.float32).view(1, -1)
    x = F.softmax(torch.from_numpy(logits), dim=-1)
    x = (bins * x).sum(-1).view(-1)
    y = torch.from_numpy(target).view(-1)
    vx, vy = x - x.mean(), y - y.mean()
    rho = (vx * vy).sum() / (vx.pow(2).sum().sqrt() * vy.pow(2).sum().sqrt()
                             + 1e-8)
    ccc = 2 * rho * x.std() * y.std() / (
        x.std() ** 2 + y.std() ** 2 + (x.mean() - y.mean()) ** 2)
    want = float(1 - ccc)
    got = float(ccc_loss_digitized(jnp.asarray(logits), jnp.asarray(target),
                                   num_bins=k))
    assert got == pytest.approx(want, abs=1e-5)


def test_prefetch_loader_host_sharding():
    from jmt_tpu.data.loader import PrefetchLoader
    from jmt_tpu.data.synthetic import synthetic_dataset
    ds = synthetic_dataset("val", n_videos=1, length=481, img_size=48)
    # two hosts with identical shuffle seeds cover the dataset disjointly
    all_vids = []
    for idx in (0, 1):
        rng = np.random.default_rng(7)
        loader = PrefetchLoader(ds, 4, shuffle=True, rng=rng,
                                host_shard=(idx, 2))
        got = [tuple(b.anchors[i]) for b in loader
               for i in range(len(b.videos))]
        all_vids.extend(got)
        assert len(loader) == 4  # 32 windows / 2 hosts / batches of 4
        assert len(got) == 16    # 16 samples per host
    assert len(all_vids) == 32
    assert len(set(all_vids)) == 32  # disjoint and exhaustive


def test_synthetic_wavlm_store_deterministic():
    """--synthetic now stands in for the precomputed WavLM .npy tree
    (train.py:150-171 surface) so the flagship config smoke-drives."""
    from jmt_tpu.data.synthetic import synthetic_wavlm_store
    store = synthetic_wavlm_store()
    rows = [["/synthetic/audio/synth000/00017.wav",
             "/synthetic/audio/synth000/00049.wav"]]
    a = store.lookup_batch(rows)
    b = store.lookup_batch(rows)
    assert a.shape == (1, 2, 768) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)          # deterministic
    assert np.abs(a).max() > 0                   # not the zero fallback
    assert not np.allclose(a[0, 0], a[0, 1])     # per-frame distinct


def test_cli_synthetic_datasets_include_wavlm_store():
    from jmt_tpu import cli
    from jmt_tpu.core.config import Config
    cfg = Config.from_dict({"exp_id": "x", "train_params": {},
                            "val_params": {}, "test_params": {},
                            "model_params": {}})
    train, val, test, store = cli.make_datasets(cfg, synthetic="1:481")
    assert store is not None
    feats = store.lookup_batch([[train.records[0].wav_dir + "/00033.wav"]])
    assert feats.shape == (1, 1, 768) and np.abs(feats).max() > 0


def test_persistent_compilation_cache(tmp_path):
    """core/compcache writes XLA executables to the configured dir so
    production restarts/serving cold-starts skip recompilation."""
    from jmt_tpu.core.compcache import enable_compilation_cache
    import jax, jax.numpy as jnp
    d = enable_compilation_cache(str(tmp_path / "cc"))
    assert d == str(tmp_path / "cc")
    # idempotent + env fallback is a no-op when unset
    assert enable_compilation_cache(d) == d

    @jax.jit
    def f(x):
        return (x * 3.0 + 1.0).sum()

    f(jnp.arange(128.0)).block_until_ready()
    entries = os.listdir(d)
    assert entries, "no cache entries written"


def test_verbose_gates_stdout_backend(tmp_path, capsys):
    """cfg.verbose gates the stdout logging backend (reference
    parseit.py:594-595: ArbStdOutBackend appended only if verbose); the
    file backends always write."""
    from jmt_tpu.core.logging import init_logger

    quiet = init_logger(str(tmp_path / "q"), stdout=False)
    quiet.log("hidden line")
    quiet.flush()
    loud = init_logger(str(tmp_path / "l"), stdout=True)
    loud.log("visible line")
    out = capsys.readouterr().out
    assert "hidden line" not in out and "visible line" in out
    assert "hidden line" in (tmp_path / "q" / "log.txt").read_text()
    # the CLI routes cfg.verbose into init_logger (call-site pin: the
    # __main__ path is exercised end-to-end by the synthetic CLI tests)
    import inspect
    import jmt_tpu.cli as cli_mod
    assert "stdout=cfg.verbose" in inspect.getsource(cli_mod)
