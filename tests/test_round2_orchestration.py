"""Round-2 orchestration semantics: pad-row loss masking, best-snapshot
export, per-component eval assembly, stitcher ordering contract, 5-fold
split conventions."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.core.config import Config
from jmt_tpu.ops.ccc import ccc_loss


# ------------------------------------------------------------------ loss --
def test_ccc_loss_weight_masks_padding():
    """ccc_loss(weight=1s+0s over pad) == ccc_loss over the real slice —
    padded rows contribute NOTHING to the loss (VERDICT weak #1)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 50).astype(np.float32)
    y = rng.uniform(-1, 1, 50).astype(np.float32)
    base = float(ccc_loss(jnp.asarray(x), jnp.asarray(y)))
    xp = np.concatenate([x, np.zeros(30, np.float32)])
    yp = np.concatenate([y, np.zeros(30, np.float32)])
    w = np.concatenate([np.ones(50, np.float32), np.zeros(30, np.float32)])
    masked = float(ccc_loss(jnp.asarray(xp), jnp.asarray(yp),
                            weight=jnp.asarray(w)))
    assert masked == pytest.approx(base, abs=1e-6)
    # all-ones weight is algebraically the unweighted form
    allones = float(ccc_loss(jnp.asarray(x), jnp.asarray(y),
                             weight=jnp.ones(50)))
    assert allones == pytest.approx(base, abs=1e-6)


class _StubModel(nn.Module):
    """Minimal model with the JMTModel call signature, for testing the
    train-step plumbing without the heavy backbones."""
    vision_backbones = ()
    audio_backbones = ("wavLM",)
    dtype = None

    @nn.compact
    def __call__(self, spec, clips, wavlm, train=False):
        h = nn.Dense(8)(wavlm)
        h = nn.tanh(h)
        out = nn.Dense(2)(h)  # (B, S, 2)
        return out[..., 0], out[..., 1]


def _stub_arrays(b, s=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "wavlm": rng.normal(size=(b, s, 16)).astype(np.float32),
        "labels_v": rng.uniform(-1, 1, (b, s)).astype(np.float32),
        "labels_a": rng.uniform(-1, 1, (b, s)).astype(np.float32),
    }


def test_train_step_pad_rows_do_not_pollute_gradients():
    """A padded batch with row_weight zeros produces the SAME loss and the
    SAME parameter update as the unpadded batch (VERDICT item 2)."""
    from jmt_tpu.train import optim as O
    from jmt_tpu.train.loops import make_train_step, init_state

    cfg = Config.from_dict({"model_params": {"compute_dtype": "float32"}})
    model = _StubModel()
    tx = O.build_optimizer(cfg.model_params.opt)
    real = _stub_arrays(3)
    state0 = init_state(model, cfg, jax.random.PRNGKey(0), real, tx)
    step = make_train_step(model, tx)
    key = jax.random.PRNGKey(1)

    real_w = dict(real, row_weight=np.ones(3, np.float32))
    s_a, loss_a, _, _ = step(jax.tree.map(jnp.array, state0), real_w, key)

    padded = {k: np.concatenate([v, np.zeros((5,) + v.shape[1:], v.dtype)])
              for k, v in real.items()}
    padded["row_weight"] = np.concatenate(
        [np.ones(3, np.float32), np.zeros(5, np.float32)])
    state0b = init_state(model, cfg, jax.random.PRNGKey(0), real, tx)
    s_b, loss_b, _, _ = step(jax.tree.map(jnp.array, state0b), padded, key)

    assert float(loss_a) == pytest.approx(float(loss_b), abs=1e-6)
    for x, y in zip(jax.tree.leaves(s_a.trainable),
                    jax.tree.leaves(s_b.trainable)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_audio_samples_bucket():
    """Configurable static wav bucket (PARITY.md 'Long-wav truncation'):
    a wider bucket keeps low-fps chunks whole with left-padding like the
    reference; the default keeps the TAIL."""
    from jmt_tpu.data.datasets import _fit_audio
    wav = np.arange(1, 56449, dtype=np.float32)  # a 25-fps 32-frame chunk
    out = _fit_audio(wav, 58800)
    assert out.shape == (58800,)
    np.testing.assert_array_equal(out[-56448:], wav)
    assert not out[:58800 - 56448].any()
    out2 = _fit_audio(wav)
    np.testing.assert_array_equal(out2, wav[-45599:])


# -------------------------------------------------------------- stitcher --
def test_stitcher_dies_on_late_first_window():
    """Reference parity: first seen window of a video must start at frame 1
    (val.py:320-325)."""
    from jmt_tpu.eval.stitch import Stitcher
    st = Stitcher(with_labels=False)
    v = np.zeros((1, 2))
    anchors = np.array([[33, 65]])
    with pytest.raises(ValueError, match="out-of-order"):
        st.add_batch(v, v, anchors, ["vid"], [100])


def test_stitcher_dies_on_backwards_window():
    """Out-of-sequence later windows die loudly instead of silently
    mis-stitching (VERDICT weak #6)."""
    from jmt_tpu.eval.stitch import Stitcher
    st = Stitcher(with_labels=False)
    v = np.zeros((1, 2))
    st.add_batch(v, v, np.array([[1, 33]]), ["vid"], [100])
    st.add_batch(v, v, np.array([[65, 97]]), ["vid"], [100])  # forward ok
    with pytest.raises(ValueError, match="non-sequential"):
        st.add_batch(v, v, np.array([[33, 65]]), ["vid"], [100])


# ----------------------------------------------------------- conv kernels --
@pytest.mark.parametrize("shape", [
    (8, 32, 32, 3, 16, (7, 7, 7), "same"),    # I3D stem geometry
    (4, 16, 20, 3, 8, (7, 7, 7), "same"),     # odd W/2 rounding
    (8, 24, 24, 3, 12, (1, 7, 7), "torch"),   # R2D1 spatial stem
    (6, 16, 16, 3, 10, (3, 7, 7), "torch"),   # BasicStem geometry
])
def test_conv3d_s2d_hw_exact(shape):
    """The space-to-depth stride-2 stem reformulation is the SAME
    convolution (fp32 reassociation noise only)."""
    from jmt_tpu.ops.conv import conv_nd, conv3d_s2d_hw, tf_same_pads
    t, h, w, ci, co, k, padmode = shape
    rng = np.random.default_rng(hash(shape) % 2 ** 31)
    x = jnp.asarray(rng.normal(size=(2, t, h, w, ci)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(*k, ci, co)), jnp.float32)
    if padmode == "same":
        pads = tf_same_pads((t, h, w), k, (1, 2, 2))
    else:  # torch symmetric k//2
        pads = tuple((kk // 2, kk // 2) for kk in k)
    ref = conv_nd(x, kern, strides=(1, 2, 2), padding=list(pads))
    got = conv3d_s2d_hw(x, kern, pads)
    assert ref.shape == got.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.slow
def test_i3d_native_112_feature_drift_bounded():
    """The native-resolution I3D option (model_params.i3d_input_size=112,
    skips the information-free 112->224 upsample for ~4x fewer FLOPs) is
    NOT reference-parity; this bounds the drift: same weights, same clips,
    features at native-112 vs upsampled-224 must stay strongly aligned."""
    from jmt_tpu.models.i3d import I3DTCN
    from jmt_tpu.models.tsav import resize_clips_for_i3d

    rng = np.random.default_rng(0)
    # face-crop-like inputs: low-frequency structure + per-pixel detail
    # (a pure-smooth input makes the two paths indistinguishable after
    # spatial pooling — measured drift ~0)
    base = rng.normal(size=(2, 8, 14, 14, 3))
    smooth = np.repeat(np.repeat(base, 8, 2), 8, 3) * 0.3
    detail = rng.normal(size=smooth.shape) * 0.15
    clips = jnp.asarray(smooth + detail, jnp.float32)
    mod = I3DTCN()
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 8, 112, 112, 3)))
    # batch-stats BN: at RANDOM init, eval-mode BN (mean 0 / var 1) lets
    # the deep ReLU stack collapse activations to ~0, which makes any two
    # inputs produce identical (constant) features — a vacuous comparison
    f112, _ = mod.apply(variables, clips, False,
                        mutable=["batch_stats"])
    f224, _ = mod.apply(variables, resize_clips_for_i3d(clips, 224), False,
                        mutable=["batch_stats"])
    f112 = np.asarray(f112).reshape(-1, 512)
    f224 = np.asarray(f224).reshape(-1, 512)
    cos = float(np.mean(np.sum(f112 * f224, -1)
                        / (np.linalg.norm(f112, axis=-1)
                           * np.linalg.norm(f224, axis=-1) + 1e-9)))
    rel = float(np.linalg.norm(f112 - f224) / (np.linalg.norm(f224) + 1e-9))
    print(f"native-112 vs 224 feature drift: cosine={cos:.4f} rel={rel:.4f}")
    assert cos > 0.5, (cos, rel)


# ----------------------------------------------------------------- serve --
def test_inference_server_buckets_and_padding():
    """serve.InferenceServer: AOT-compiled buckets, pad-up, chunk-split,
    and unpadded outputs."""
    from jmt_tpu.serve import InferenceServer
    from jmt_tpu.train.loops import _preprocess

    model = _StubModel()
    rng = np.random.default_rng(0)
    wavlm = rng.normal(size=(1, 4, 768)).astype(np.float32)
    arrays = {"wavlm": wavlm}
    spec, clips = _preprocess(model, arrays, None, augment=False)
    variables = model.init(jax.random.PRNGKey(0), spec, clips, wavlm)
    server = InferenceServer(model, variables["params"], {}, seq=4,
                             buckets=(2, 4), img_size=8, audio_samples=64)
    assert sorted(server._compiled) == [2, 4]

    def mk(n):
        return (rng.integers(0, 255, (n, 4, 8, 8, 8, 3), dtype=np.uint8),
                (rng.normal(size=(n, 4, 64))).astype(np.float32),
                rng.normal(size=(n, 4, 768)).astype(np.float32))

    # n=3 pads up to bucket 4, output unpadded
    c, a, w = mk(3)
    v, ar = server.predict(c, a, w)
    assert v.shape == (3, 4) and ar.shape == (3, 4)
    # padding rows do not change real outputs
    v2, _ = server.predict(c[:2], a[:2], w[:2])
    np.testing.assert_allclose(v[:2], v2, atol=1e-6)
    # n=5 splits into max-bucket chunks
    c, a, w = mk(5)
    v, ar = server.predict(c, a, w)
    assert v.shape == (5, 4)
    assert np.isfinite(v).all()


def test_selftest_heavy_builds_flagship():
    """Regression: the serve CLI's --heavy flag must reach _selftest —
    it was parsed but dropped, so 'heavy' latency numbers were silently
    measured on the light (R2D1+ResNet18, no-I3D) model."""
    from jmt_tpu.serve import _selftest_model

    light = _selftest_model(False)
    heavy = _selftest_model(True)
    assert light.vision_backbones == ("R2D1",)
    assert light.audio_backbones == ("ResNet18",)
    assert heavy.vision_backbones == ("R2D1", "I3D")
    assert heavy.audio_backbones == ("ResNet18", "wavLM")
    assert heavy.intra_modal_fusion == "encoder_plus_self_attention"
    # and the CLI passes the flag through (source-level check: the
    # __main__ block is not importable, so pin the call site)
    import inspect
    import jmt_tpu.serve as serve_mod
    src = inspect.getsource(serve_mod)
    assert "_selftest(buckets, heavy=args.heavy" in src


def test_separable_max_pool_exact_vs_reduce_window():
    """Pins the exactness property behind the round-2 pool-lowering
    experiments (STATUS.md): a max window separates into per-dim maxima
    of shifted slices, BIT-identical to lax.reduce_window for every pool
    config the models use. max_pool itself ships the reduce_window
    lowering (fastest in fused context); this guards any future retry of
    the slice form."""
    from jax import lax
    from jmt_tpu.ops.conv import max_pool, tf_same_pads

    rng = np.random.default_rng(0)
    cases = [
        ((2, 8, 14, 14, 32), (3, 3, 3), (1, 1, 1)),   # inception b3
        ((2, 8, 15, 15, 8), (3, 3, 3), (1, 2, 2)),    # MaxPool3d_4a
        ((2, 8, 14, 14, 8), (2, 2, 2), (1, 2, 2)),    # MaxPool3d_5a
        ((2, 7, 13, 13, 8), (1, 3, 3), (1, 2, 2)),    # MaxPool3d_2a/3a
        ((2, 9, 11, 5), (3, 3), (2, 2)),               # audio ResNet-18
    ]
    for shape, win, strd in cases:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        nsp = x.ndim - 2
        pads = tf_same_pads(x.shape[1:1 + nsp], win, strd)
        ours = max_pool(x, win, strd, pads)
        ref = lax.reduce_window(
            x, -jnp.inf, lax.max, (1,) + tuple(win) + (1,),
            (1,) + tuple(strd) + (1,),
            ((0, 0),) + tuple(pads) + ((0, 0),))
        assert ours.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_streaming_session_matches_offline_stitch(tmp_path):
    """serve.StreamingSession: windows streamed one batch at a time produce
    the SAME smoothed traces as an offline Stitcher pass, and the challenge
    writer emits the reference txt format."""
    from jmt_tpu.serve import InferenceServer, StreamingSession
    from jmt_tpu.eval.stitch import Stitcher
    from jmt_tpu.ops.smoothing import uniform_filter1d
    from jmt_tpu.train.loops import _preprocess

    model = _StubModel()
    rng = np.random.default_rng(7)
    wavlm0 = rng.normal(size=(1, 4, 768)).astype(np.float32)
    arrays = {"wavlm": wavlm0}
    spec, clips = _preprocess(model, arrays, None, augment=False)
    variables = model.init(jax.random.PRNGKey(0), spec, clips, wavlm0)
    server = InferenceServer(model, variables["params"], {}, seq=4,
                             buckets=(2,), img_size=8, audio_samples=64)
    sess = StreamingSession(server, v_smooth=3, a_smooth=5)

    # two videos x 2 sequential windows of 4 anchors each (video B len 7:
    # last anchor 8 > length is dropped, exercising the stitch guard)
    windows = [
        ("A", 8, [1, 2, 3, 4]), ("A", 8, [5, 6, 7, 8]),
        ("B", 7, [1, 2, 3, 4]), ("B", 7, [5, 6, 7, 8]),
    ]
    offline = Stitcher(with_labels=False)
    for vid, length, anchors in windows:
        c = rng.integers(0, 255, (1, 4, 8, 8, 8, 3), dtype=np.uint8)
        a = rng.normal(size=(1, 4, 64)).astype(np.float32)
        w = rng.normal(size=(1, 4, 768)).astype(np.float32)
        v_raw, a_raw = sess.feed(c, a, w, np.asarray([anchors]),
                                 [vid], [length])
        offline.add_batch(np.asarray(v_raw), np.asarray(a_raw),
                          np.asarray([anchors]), [vid], [length])

    done = sess.finish_all()
    assert sorted(done) == ["A", "B"]
    for vid, length, _ in windows[::2]:
        sv_off = np.asarray(uniform_filter1d(
            jnp.asarray(np.clip(offline.pred_v[vid], -1, 1)), 3))
        sa_off = np.asarray(uniform_filter1d(
            jnp.asarray(np.clip(offline.pred_a[vid], -1, 1)), 5))
        np.testing.assert_allclose(done[vid][0], sv_off, atol=1e-7)
        np.testing.assert_allclose(done[vid][1], sa_off, atol=1e-7)
        assert done[vid][0].shape == (length,)

    files = sess.write_challenge(str(tmp_path))
    assert len(files) == 2
    lines = open(files[0]).read().splitlines()
    assert lines[0] == "image_location,valence,arousal"
    assert lines[1].startswith("A/00001.jpg,")


# ------------------------------------------------------------ 5-fold cfg --
def test_auto_set_label_paths_folds(tmp_path):
    for fold in ("fold2",):
        for sub in ("Train_Set", "Val_Set", "Test_Set"):
            os.makedirs(tmp_path / "5folds" / fold / sub)
    cfg = Config.from_dict({
        "split": "ROUND2",
        "dataset_annotations_5folds": str(tmp_path / "5folds"),
    })
    cfg.auto_set_label_paths()
    assert cfg.train_params.labelpath == str(
        tmp_path / "5folds" / "fold2" / "Train_Set")
    assert cfg.val_params.labelpath.endswith("fold2/Val_Set")
    assert cfg.test_params.labelpath.endswith("fold2/Test_Set")


def test_auto_set_label_paths_default_and_explicit_win(tmp_path):
    for sub in ("Train_Set", "Val_Set", "Test_Set"):
        os.makedirs(tmp_path / "VA" / sub)
    cfg = Config.from_dict({
        "split": "DEFAULT",
        "dataset_annotations": str(tmp_path / "VA"),
        "train_params": {"labelpath": "/explicit/train"},
    })
    cfg.auto_set_label_paths()
    assert cfg.train_params.labelpath == "/explicit/train"  # explicit wins
    assert cfg.val_params.labelpath == str(tmp_path / "VA" / "Val_Set")


def test_invalid_split_rejected():
    with pytest.raises(AssertionError):
        Config.from_dict({"split": "ROUND9"})


# ----------------------------------------------- best snapshot + assembly --
@pytest.mark.slow
def test_best_epoch_export_and_component_roundtrip(tmp_path, monkeypatch):
    """Train 2 epochs where epoch 0 is best: SavedWeights/ must hold the
    EPOCH-0 weights (main.py:843-995,1028-1037 semantics) while
    train_state.msgpack resumes from the FINAL state; then a fresh Runner
    assembled from components only reproduces the best params exactly
    (VERDICT items 3 + 6)."""
    from test_train_e2e import small_config
    from jmt_tpu.data.synthetic import synthetic_dataset
    from jmt_tpu.train.runner import Runner, EpochMetrics
    from jmt_tpu.core import checkpoint as ckpt

    cfg = small_config(tmp_path, max_epochs=2, opt__lr=5e-3)
    train = synthetic_dataset("train", n_videos=2, length=481, img_size=48)
    r = Runner(cfg, train, None)

    scripted = iter([EpochMetrics(valid_ccc_v=0.5, valid_ccc_a=0.5),
                     EpochMetrics(valid_ccc_v=0.1, valid_ccc_a=0.1)])
    monkeypatch.setattr(r, "validate",
                        lambda *a, **k: next(scripted))
    snapshots = []
    orig_snapshot = r.snapshot_best
    def capture():
        orig_snapshot()
        snapshots.append(r._best_snapshot)
    monkeypatch.setattr(r, "snapshot_best", capture)

    r.fit()
    assert len(snapshots) == 1  # only epoch 0 improved
    best_params, _ = snapshots[0]

    # the exported fusion component equals the EPOCH-0 weights...
    piece = ckpt.load_component(
        os.path.join(r.exp.weights_dir, "fusion_w.msgpack"))
    for want, got in zip(jax.tree.leaves(best_params["fusion_model"]),
                         jax.tree.leaves(piece["params"])):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    # ...and differs from the final (epoch-1) state — the old bug exported
    # the last epoch unconditionally
    final_fusion = jax.tree.leaves(r.state.params()["fusion_model"])
    deltas = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
              for a, b in zip(jax.tree.leaves(piece["params"]),
                              final_fusion)]
    assert max(deltas) > 0, "epoch-1 training changed nothing?"

    # train_state.msgpack is the FINAL state (true resume)
    restored = ckpt.restore_train_state(r.exp.weights_dir, r.state)
    assert restored.epoch == 2
    for a, b in zip(jax.tree.leaves(restored.trainable),
                    jax.tree.leaves(r.state.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # fresh Runner assembled FROM components == best weights
    cfg2 = small_config(tmp_path, max_epochs=2)
    cfg2.exp_id = "assembled"
    r2 = Runner(cfg2, train, None)
    loaded = r2.load_components(r.exp.weights_dir)
    assert "fusion_w" in loaded and "all_backbones" in loaded
    got = r2.state.params()
    for want, have in zip(jax.tree.leaves(best_params["fusion_model"]),
                          jax.tree.leaves(got["fusion_model"])):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(have))
    for want, have in zip(jax.tree.leaves(best_params["backbones"]),
                          jax.tree.leaves(got["backbones"])):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(have))


def test_assemble_from_reference_pt_fusion(tmp_path):
    """A reference SavedWeights/fusion_w.pt (torch, module.-prefixed)
    assembles into the flax fusion subtree (main.py:508-520 parity)."""
    torch = pytest.importorskip("torch")
    from reference_loader import load_reference_models
    from jmt_tpu.core import checkpoint as ckpt
    from jmt_tpu.models import TwoTransformers
    from jmt_tpu.models.torch_io import two_transformers_params

    ref_models = load_reference_models()
    torch.manual_seed(0)
    ref = ref_models.two_transformers.Two_transformers(
        0.0, 0.0, 1, 1, "TRANSFORMER", "SELF_ATTEN")
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    wdir = tmp_path / "SavedWeights"
    os.makedirs(wdir)
    torch.save(sd, str(wdir / "fusion_w.pt"))

    mod = TwoTransformers(joint_modalities="TRANSFORMER",
                          output_format="SELF_ATTEN")
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 2, 512)), jnp.zeros((1, 2, 512)))
    from flax.core import unfreeze
    params = {"fusion_model": jax.tree.map(
        np.asarray, unfreeze(variables["params"]))}
    cfg = Config.from_dict({"model_params": {
        "num_layers": 1, "joint_modalities": "TRANSFORMER",
        "output_format": "SELF_ATTEN"}})
    loaded = ckpt.assemble_from_components(str(wdir), cfg, params, {})
    assert set(loaded) == {"fusion_w"}
    want = two_transformers_params(sd, 1, "TRANSFORMER", "SELF_ATTEN")
    got_leaf = params["fusion_model"]["vregressor"]["fc1"]["kernel"]
    np.testing.assert_allclose(np.asarray(got_leaf),
                               want["vregressor"]["fc1"]["kernel"],
                               atol=0)
