"""WavLM offline extractor: windowing, frame mapping, file layout.

Closes the reference pipeline's external dependency (precomputed WavLM
features, train.py:150-171): extract_tree writes the exact
{dest}/{video}/{n}.npy layout WavlmFeatureStore consumes.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from jmt_tpu.models.wavlm import WavLMConfig, wavlm_apply


def _tiny():
    import torch
    from transformers import WavLMModel
    from test_wavlm import _tiny_hf_config  # one tiny geometry, shared
    torch.manual_seed(3)
    hf = _tiny_hf_config()
    tm = WavLMModel(hf).eval()
    cfg = WavLMConfig.from_hf(hf)
    from jmt_tpu.models.wavlm import wavlm_params_from_torch
    return tm, cfg, wavlm_params_from_torch(tm.state_dict(), cfg)


def test_geometry_props():
    cfg = WavLMConfig()  # base
    assert cfg.frame_stride == 320
    assert cfg.receptive_field == 400
    # conv arithmetic agrees with the closed form for long inputs
    for n in (16000, 45599, 123457):
        assert cfg.n_frames(n) == (n - 400) // 320 + 1


def test_single_window_matches_direct():
    from jmt_tpu.data.wavlm_extract import WavLMExtractor, WAVLM_SR
    _, cfg, params = _tiny()
    # window bigger than the track -> one chunk; the extractor's
    # normalization + padding replicated here for an exact comparison
    ex = WavLMExtractor(params, cfg, window_s=0.2, overlap_s=0.01)
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(ex.win_samples - 37,)).astype(np.float32)
    total = (len(wav) - ex.receptive) // ex.stride + 1
    out = ex.features(wav)
    assert out.shape == (total, cfg.hidden_size)

    # features() normalizes over the FULL track (HF do_normalize
    # semantics), THEN windows/pads — replicate exactly
    norm = (wav - wav.mean()) / (wav.std() + 1e-7)
    chunk = np.pad(norm, (0, ex.win_samples - len(norm)))
    ref = np.asarray(wavlm_apply(params, jnp.asarray(chunk[None]), cfg))[0]
    np.testing.assert_allclose(out, ref[:total], rtol=0, atol=1e-5)


def test_windowed_covers_all_frames_and_is_deterministic():
    from jmt_tpu.data.wavlm_extract import WavLMExtractor
    _, cfg, params = _tiny()
    ex = WavLMExtractor(params, cfg, window_s=0.05, overlap_s=0.01)
    rng = np.random.default_rng(1)
    wav = rng.normal(size=(int(0.33 * 16000),)).astype(np.float32)
    out1 = ex.features(wav)
    out2 = ex.features(wav)
    np.testing.assert_array_equal(out1, out2)
    # every row written (zero-init would leave exact zeros)
    assert (np.abs(out1).sum(axis=1) > 0).all()
    # stitched interiors approximate a full-context pass: compare against
    # a window large enough to hold the whole track
    full = WavLMExtractor(params, cfg, window_s=0.5,
                          overlap_s=0.02).features(wav)
    assert full.shape == out1.shape
    # context at window edges differs -> approximate agreement only
    rel = (np.abs(out1 - full).mean()
           / (np.abs(full).mean() + 1e-9))
    assert rel < 0.35, rel


def test_per_frame_mapping():
    from jmt_tpu.data.wavlm_extract import WavLMExtractor
    _, cfg, params = _tiny()
    ex = WavLMExtractor(params, cfg, window_s=0.2, overlap_s=0.01)
    feats = np.arange(40, dtype=np.float32)[:, None].repeat(
        cfg.hidden_size, 1)
    ex.features = lambda wav: feats  # isolate the mapping
    out = ex.per_frame(np.zeros(100, np.float32), n_frames=10, fps=30.0)
    t = (np.arange(10) + 0.5) / 30.0
    # nearest by RECEPTIVE-FIELD CENTER: frame k covers
    # [k*stride, k*stride + receptive)
    idx = np.clip(np.round((t * 16000 - cfg.receptive_field / 2)
                           / cfg.frame_stride).astype(int), 0, 39)
    np.testing.assert_array_equal(out[:, 0], idx.astype(np.float32))
    # sanity: a frame centered exactly on WavLM frame 0's center maps to 0
    ex2 = WavLMExtractor.__new__(WavLMExtractor)
    ex2.cfg, ex2.stride = cfg, cfg.frame_stride
    ex2.receptive = cfg.receptive_field
    ex2.features = lambda wav: feats
    center_t = (cfg.receptive_field / 2) / 16000
    one = ex2.per_frame(np.zeros(10, np.float32), 1,
                        fps=0.5 / center_t)
    assert one[0, 0] == 0.0


@pytest.mark.slow
def test_extract_tree_layout(tmp_path):
    import torch
    from jmt_tpu.data.wavlm_extract import extract_tree
    from jmt_tpu.data.audio_io import write_wav
    from jmt_tpu.data.datasets import WavlmFeatureStore

    tm, cfg, _ = _tiny()
    ckpt = tmp_path / "wavlm_tiny.pt"
    torch.save(tm.state_dict(), ckpt)

    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir)
    rng = np.random.default_rng(2)
    write_wav(str(wav_dir / "vid_a.wav"),
              rng.normal(0, 0.1, 44100).astype(np.float32), 44100)
    write_wav(str(wav_dir / "vid_b.wav"),
              rng.normal(0, 0.1, 22050).astype(np.float32), 44100)

    dest = tmp_path / "feats"
    n = extract_tree(str(ckpt), str(wav_dir), str(dest), fps=10.0,
                     window_s=0.2, overlap_s=0.01, verbose=False, cfg=cfg)
    assert n == 10 + 5  # 1.0 s and 0.5 s at 10 fps
    files_a = sorted(os.listdir(dest / "vid_a"))
    assert len(files_a) == 10 and "1.npy" in files_a and "10.npy" in files_a
    f1 = np.load(dest / "vid_a" / "1.npy")
    assert f1.shape == (cfg.hidden_size,) and np.abs(f1).sum() > 0

    # the training-side store reads them back by wav path
    # (it keys on the {vid}/{stem} tail of the per-frame wav path)
    store = WavlmFeatureStore(str(dest), dim=cfg.hidden_size)
    got = store.lookup_batch([["/any/vid_a/3.wav", "/any/vid_b/2.wav"]])
    np.testing.assert_array_equal(got[0, 0],
                                  np.load(dest / "vid_a" / "3.npy"))
    np.testing.assert_array_equal(got[0, 1],
                                  np.load(dest / "vid_b" / "2.npy"))


def test_serve_wavlm_frontend(tmp_path):
    """Raw-audio serving: InferenceServer computes wavLM features via the
    WavLMFrontend when the request carries none; identical outputs to a
    request with the same features passed explicitly."""
    import flax.linen as nn
    import jax
    from jmt_tpu.serve import InferenceServer, WavLMFrontend

    _, cfg, params = _tiny()

    class Stub(nn.Module):
        vision_backbones = ()
        audio_backbones = ("wavLM",)
        dtype = None

        @nn.compact
        def __call__(self, spec, clips, wavlm, train=False):
            out = nn.Dense(2)(nn.tanh(nn.Dense(8)(wavlm)))
            return out[..., 0], out[..., 1]

    frontend = WavLMFrontend(params, cfg, sample_rate=44100,
                             audio_samples=4410)
    rng = np.random.default_rng(5)
    seq, a_len = 3, 4410
    wavlm0 = rng.normal(size=(1, seq, cfg.hidden_size)).astype(np.float32)
    model = Stub()
    variables = model.init(jax.random.PRNGKey(0), None, None, wavlm0)
    server = InferenceServer(model, variables["params"], {}, seq=seq,
                             buckets=(2,), img_size=8, audio_samples=a_len,
                             use_wavlm=True, wavlm_frontend=frontend)
    # frontend consumes the model's wavlm slot -> hidden_size features
    clips = rng.integers(0, 255, (2, seq, 8, 8, 8, 3), dtype=np.uint8)
    audio = rng.normal(0, 0.1, (2, seq, a_len)).astype(np.float32)

    v_auto, a_auto = server.predict(clips, audio)        # frontend path
    feats = frontend.features(audio)
    assert feats.shape == (2, seq, cfg.hidden_size)
    v_exp, a_exp = server.predict(clips, audio, feats)   # explicit path
    np.testing.assert_allclose(v_auto, v_exp, atol=1e-6)
    np.testing.assert_allclose(a_auto, a_exp, atol=1e-6)
    # feature rows are per-chunk: padding rows cannot leak into real rows
    v1, _ = server.predict(clips[:1], audio[:1])
    np.testing.assert_allclose(v_auto[:1], v1, atol=1e-6)
