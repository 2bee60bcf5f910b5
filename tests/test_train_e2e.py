"""End-to-end training smoke: the reference's take_n_videos=2, max_epochs=1
convention (README.MD:98-106) on synthetic data, plus stitching, checkpoint
roundtrip, and loss-decrease sanity."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jmt_tpu.core.config import Config
from jmt_tpu.data.synthetic import synthetic_dataset
from jmt_tpu.eval.stitch import Stitcher, write_challenge_txt


def small_config(tmp_path, **model_over):
    mp = {
        "l_vision_backbones": "R2D1",
        "l_audio_backbones": "ResNet18",
        "joint_modalities": "TRANSFORMER",
        "output_format": "SELF_ATTEN",
        "num_heads": 1, "num_layers": 1,
        "max_epochs": 1,
        "compute_dtype": "float32",
        "opt__lr": 1e-3, "opt__name_lr_scheduler": "mystep",
        "opt__step_size": 100,
    }
    mp.update(model_over)
    return Config.from_dict({
        "exp_id": "smoke", "outd": str(tmp_path),
        "train_params": {"loader_params": {"batch_size": 2,
                                           "shuffle": True}},
        "val_params": {"loader_params": {"batch_size": 2}},
        "test_params": {},
        "model_params": mp,
        "SEED": 0,
        # tiny batches are not divisible by the 8-device fake mesh
        "mesh_data_parallel": 1,
    })


@pytest.mark.slow
def test_fit_one_epoch_synthetic(tmp_path):
    from jmt_tpu.train.runner import Runner
    cfg = small_config(tmp_path)
    train = synthetic_dataset("train", n_videos=2, length=481, img_size=48)
    val = synthetic_dataset("val", n_videos=1, length=481, img_size=48)
    r = Runner(cfg, train, val)
    perfs = r.fit()
    assert "best" in perfs
    assert -1.0 <= perfs["best"]["valid_v"] <= 1.0
    # artifacts
    assert os.path.isfile(os.path.join(r.exp.path, "passed.txt"))
    assert os.path.isfile(os.path.join(r.exp.weights_dir,
                                       "fusion_w.msgpack"))
    assert os.path.isfile(os.path.join(r.exp.weights_dir,
                                       "all_backbones.msgpack"))
    assert os.path.isfile(os.path.join(r.exp.weights_dir,
                                       "train_state.msgpack"))
    # idempotence guard
    assert r.fit() == {}


def test_loss_decreases_on_fixed_batch(tmp_path):
    """The jitted train step actually optimizes (overfit one batch)."""
    from jmt_tpu.train.runner import Runner
    from jmt_tpu.train.loops import device_batch, batches_from_dataset
    cfg = small_config(tmp_path, opt__lr=5e-3)
    train = synthetic_dataset("train", n_videos=2, length=481, img_size=48)
    r = Runner(cfg, train, None)
    r.initialize()
    batch = next(batches_from_dataset(train, 2, shuffle=False))
    arrays = device_batch(batch)
    key = jax.random.PRNGKey(0)
    r.state.opt_state.hyperparams["learning_rate"] = jnp.asarray(5e-3)
    losses = []
    for i in range(6):
        key, sub = jax.random.split(key)
        r.state, loss, _, _ = r.train_step(r.state, arrays, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_checkpoint_roundtrip(tmp_path):
    from jmt_tpu.train.runner import Runner
    from jmt_tpu.train.loops import device_batch, batches_from_dataset
    from jmt_tpu.core import checkpoint as ckpt
    cfg = small_config(tmp_path)
    train = synthetic_dataset("train", n_videos=2, length=481, img_size=48)
    r = Runner(cfg, train, None)
    r.initialize()
    d = str(tmp_path / "ckpt")
    ckpt.save_train_state(d, r.state)
    restored = ckpt.restore_train_state(d, r.state)
    for a, b in zip(jax.tree.leaves(r.state.trainable),
                    jax.tree.leaves(restored.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state steps identically
    batch = next(batches_from_dataset(train, 2, shuffle=False))
    arrays = device_batch(batch)
    k = jax.random.PRNGKey(1)
    s1, l1, _, _ = r.train_step(r.state, arrays, k)
    # note: train_step donates its state arg; use the restored copy after
    s2, l2, _, _ = r.train_step(restored, arrays, k)
    assert float(l1) == pytest.approx(float(l2), abs=1e-6)


def test_stitcher_reference_semantics():
    st = Stitcher(with_labels=True)
    # video of length 64, two windows of 4 clips (toy shapes)
    vouts = np.array([[0.5, 0.6, 0.7, 0.8]])
    aouts = np.array([[0.1, 0.2, 0.3, 0.4]])
    # first window of a video must start at frame 1 (val.py:320-325 —
    # the Stitcher dies otherwise, see test_stitcher_rejects_out_of_order)
    anchors = np.array([[1, 32, 48, 64]])
    lv = np.array([[0.9, -5.0, 0.7, 0.6]])
    la = np.array([[0.1, 0.2, -5.0, 0.4]])
    st.add_batch(vouts, aouts, anchors, ["vidA"], [64], lv, la)
    # -5 labels leave slot (0,0) for BOTH pred and label
    assert st.pred_v["vidA"][31] == 0.0 and st.label_v["vidA"][31] == 0.0
    assert st.pred_a["vidA"][47] == 0.0
    # valid slots written at anchor-1
    assert st.pred_v["vidA"][0] == pytest.approx(0.5)
    assert st.label_a["vidA"][63] == pytest.approx(0.4)
    ccc_v, ccc_a = st.scores()
    assert np.isfinite([ccc_v, ccc_a]).all()


def test_stitcher_rejects_out_of_order():
    st = Stitcher()
    with pytest.raises(ValueError):
        st.add_batch(np.zeros((1, 2)), np.zeros((1, 2)),
                     np.array([[64, 96]]), ["v"], [100],
                     np.zeros((1, 2)), np.zeros((1, 2)))


def test_challenge_txt_format(tmp_path):
    st = Stitcher(with_labels=False)
    st.add_batch(np.array([[0.123456, -1.7]]), np.array([[0.5, 0.9]]),
                 np.array([[1, 2]]), ["video1"], [2])
    files = write_challenge_txt(st, str(tmp_path / "out"))
    lines = open(files[0]).read().splitlines()
    assert lines[0] == "image_location,valence,arousal"
    # clipped + smoothed values, %.5f, 1-indexed %05d frame names
    assert lines[1].startswith("video1/00001.jpg,")
    parts = lines[1].split(",")
    assert len(parts[1].split(".")[1]) == 5
