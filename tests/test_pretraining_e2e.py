"""PRETRAINING goal end-to-end + the OUR_AFFWILD2 self-loop.

The reference workflow pretrains a single backbone with
SingleBackbonePretrainer (main.py:474-503), exports SavedWeights, then
feeds that run back into the flagship as ``init_w_* = OUR_AFFWILD2``
(main.py:270-302, incl. the MAX-reduce assert at main.py:281). These tests
drive that loop natively: a goal=PRETRAINING Runner.fit on synthetic data
exports ``backbone_pretrainer_w`` + the backbone component, and a flagship
init with ``pretrained_weights_dir`` pointed at that experiment dir
demonstrably starts from the pretrained weights (.msgpack — no torch, no
hand conversion)."""
import os

import numpy as np
import pytest

from jmt_tpu.core.config import Config
from jmt_tpu.core.checkpoint import load_component
from jmt_tpu.data.synthetic import synthetic_dataset
from jmt_tpu.train.runner import Runner


def _pretrain_cfg(tmp_path, backbone="R2D1"):
    mp = {"max_epochs": 1, "compute_dtype": "float32"}
    if backbone in ("R2D1", "I3D"):
        mp.update(l_vision_backbones=backbone, l_audio_backbones="",
                  **{f"freeze_vision_{backbone}": False})
        if backbone == "R2D1":
            mp["R2D1_ft_dim_reduce"] = "MAX"
    else:
        mp.update(l_vision_backbones="", l_audio_backbones=backbone,
                  freeze_audio_ResNet18=False)
    return Config.from_dict({
        # exp dir doubles as the OUR_AFFWILD2 source dir in phase 2
        "exp_id": "pretrain_synth", "outd": str(tmp_path / "exps"),
        "goal": "PRETRAINING",
        "train_params": {"loader_params": {"batch_size": 2,
                                           "shuffle": True}},
        "val_params": {"loader_params": {"batch_size": 2}},
        "model_params": mp,
        "SEED": 0, "mesh_data_parallel": 1, "log_every_steps": 0,
    })


def test_pretraining_config_lattice():
    """PRETRAINING demands exactly one backbone (parseit lattice parity)."""
    with pytest.raises(AssertionError, match="exactly one backbone"):
        _cfg = Config.from_dict({
            "exp_id": "x", "outd": "/tmp", "goal": "PRETRAINING",
            "train_params": {}, "val_params": {}, "test_params": {},
            "model_params": {"l_vision_backbones": "R2D1",
                             "l_audio_backbones": "ResNet18"},
        })


@pytest.mark.slow
def test_pretraining_fit_and_selfloop(tmp_path):
    """Full loop: goal=PRETRAINING Runner.fit -> component export ->
    flagship init_w_R2D1=OUR_AFFWILD2 starts from those exact weights."""
    cfg = _pretrain_cfg(tmp_path, "R2D1")
    train = synthetic_dataset("train", n_videos=2, length=481, stride=481,
                              img_size=32, check_coverage=False)
    val = synthetic_dataset("val", n_videos=1, length=481, stride=481,
                            img_size=32, check_coverage=False)
    r = Runner(cfg, train, val)
    r.initialize()
    # the single backbone is TRAINED (not frozen) and the pretrainer head
    # exists instead of the fusion model (main.py:474-503)
    assert "vision_r2d1" in r.state.trainable.get("backbones", {})
    assert not r.state.frozen
    assert "backbone_pretrainer" in r.state.trainable
    assert "fusion_model" not in r.state.trainable
    stem_before = np.asarray(
        r.state.trainable["backbones"]["vision_r2d1"]["stem"]
        ["spatial_conv"]["kernel"]).copy()
    perfs = r.fit()
    assert np.isfinite(perfs["best"]["valid_v"])
    wdir = r.exp.weights_dir
    assert os.path.isfile(os.path.join(wdir, "backbone_pretrainer_w.msgpack"))
    assert os.path.isfile(os.path.join(wdir, "vision_r2d1.msgpack"))
    # the optimizer actually moved the backbone
    exported = load_component(os.path.join(wdir, "vision_r2d1.msgpack"))
    stem_after = np.asarray(exported["params"]["stem"]["spatial_conv"]
                            ["kernel"])
    assert not np.allclose(stem_after, stem_before)
    assert exported.get("batch_stats"), "BN stats must export too"

    # ---- phase 2: flagship consumes the pretraining run (main.py:270-302)
    cfg2 = Config.from_dict({
        "exp_id": "flagship", "outd": str(tmp_path / "exps2"),
        "pretrained_weights_dir": r.exp.path,  # the experiment dir itself
        "train_params": {"loader_params": {"batch_size": 1}},
        "val_params": {"loader_params": {"batch_size": 1}},
        "model_params": {
            "l_vision_backbones": "R2D1", "l_audio_backbones": "ResNet18",
            "init_w_R2D1": "OUR_AFFWILD2", "R2D1_ft_dim_reduce": "MAX",
            "max_epochs": 1, "compute_dtype": "float32"},
        "SEED": 7, "mesh_data_parallel": 1,
    })
    r2 = Runner(cfg2, train, None)
    r2.initialize()
    # R2D1 frozen by default -> the grafted pretrained weights land there
    got = np.asarray(r2.state.frozen["backbones"]["vision_r2d1"]["stem"]
                     ["spatial_conv"]["kernel"])
    np.testing.assert_array_equal(got, stem_after)
    got_bs = np.asarray(r2.state.batch_stats["backbones"]["vision_r2d1"]
                        ["stem"]["spatial_bn"]["mean"])
    np.testing.assert_array_equal(
        got_bs, np.asarray(exported["batch_stats"]["stem"]["spatial_bn"]
                           ["mean"]))


def test_our_affwild2_msgpack_resolution(tmp_path):
    """resolve_path finds a jmt_tpu component export in all three layouts:
    weights-root/<BB>_OUR_AffWild2/SavedWeights, an experiment dir, and a
    bare file."""
    from jmt_tpu.models.pretrained import resolve_path

    a = tmp_path / "root" / "ResNet18_OUR_AffWild2" / "SavedWeights"
    a.mkdir(parents=True)
    (a / "audio_resnet18.msgpack").write_bytes(b"x")
    assert resolve_path(str(tmp_path / "root"), "ResNet18",
                        "OUR_AFFWILD2").endswith(
        os.path.join("ResNet18_OUR_AffWild2", "SavedWeights",
                     "audio_resnet18.msgpack"))

    b = tmp_path / "expdir" / "SavedWeights"
    b.mkdir(parents=True)
    (b / "vision_i3d.msgpack").write_bytes(b"x")
    assert resolve_path(str(tmp_path / "expdir"), "I3D",
                        "OUR_AFFWILD2").endswith(
        os.path.join("SavedWeights", "vision_i3d.msgpack"))

    c = tmp_path / "flat"
    c.mkdir()
    (c / "vision_r2d1.pt").write_bytes(b"x")
    assert resolve_path(str(c), "R2D1", "OUR_AFFWILD2").endswith(
        "vision_r2d1.pt")


@pytest.mark.slow
def test_pretraining_cli_drive(tmp_path):
    """The CLI drives goal=PRETRAINING end-to-end (reference README.MD
    pretraining commands): synthetic data, 1 epoch, artifact set written."""
    from jmt_tpu import cli

    outd = str(tmp_path / "exps")
    rc = cli.main([
        "--set", "exp_id=cli_pretrain", "--set", f"outd={outd}",
        "--set", "goal=PRETRAINING",
        "--set", "model_params__l_vision_backbones=R2D1",
        "--set", "model_params__l_audio_backbones=",
        "--set", "model_params__freeze_vision_R2D1=false",
        "--set", "model_params__R2D1_ft_dim_reduce=MAX",
        "--set", "model_params__max_epochs=1",
        "--set", "model_params__compute_dtype=float32",
        "--set", "train_params__loader_params__batch_size=2",
        "--set", "val_params__loader_params__batch_size=2",
        "--set", "train_params__stride=481",
        "--set", "val_params__stride=481",
        "--set", "mesh_data_parallel=1",
        "--synthetic", "2:481:32",
    ])
    assert rc == 0
    exp = os.path.join(outd, "id_cli_pretrain")
    for f in ("passed.txt", "perfs.yml", "final_config.yml"):
        assert os.path.isfile(os.path.join(exp, f)), f
    assert os.path.isfile(os.path.join(
        exp, "SavedWeights", "backbone_pretrainer_w.msgpack"))
    assert os.path.isfile(os.path.join(
        exp, "SavedWeights", "vision_r2d1.msgpack"))
