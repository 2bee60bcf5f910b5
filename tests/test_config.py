"""Config system: schema round-trip, override lattice, exp-dir lifecycle."""
import json
import os

import pytest

from jmt_tpu.core.config import (Config, ExperimentDir, apply_overrides)


def reference_style_dict():
    # mirrors config_file.json:1-99 shape (with legacy opt__ keys)
    return {
        "exp_id": "t1",
        "outd": "exps",
        "dataset_rootpath": "/data/frames",
        "train_params": {"labelpath": "/data/train", "take_n_videos": -1,
                         "seq_length": 512, "subseq_length": 32,
                         "stride": 1, "dilation": 4,
                         "loader_params": {"batch_size": 8, "shuffle": False,
                                           "num_workers": 2,
                                           "pin_memory": False}},
        "val_params": {"labelpath": "/data/val", "seq_length": 512,
                       "subseq_length": 32, "stride": 1, "dilation": 4},
        "test_params": {"labelpath": "/data/test"},
        "model_params": {
            "intra_modal_fusion": "None",
            "output_format": "SELF_ATTEN",
            "joint_modalities": "TRANSFORMER",
            "l_vision_backbones": "R2D1",
            "l_audio_backbones": "ResNet18",
            "R2D1_ft_dim_reduce": "FLATTEN",
            "num_layers": 1, "num_heads": 1,
            "opt__name_optimizer": "sgd",
            "opt__lr": 1e-4,
            "opt__name_lr_scheduler": "mystep",
            "opt__step_size": 100, "opt__gamma": 0.1,
            "opt__nesterov": "True",
        },
        "Mode": "Training", "SEED": 0, "goal": "TRAINING",
    }


def test_from_dict_routes_opt_prefix():
    cfg = Config.from_dict(reference_style_dict())
    assert cfg.model_params.opt.lr == 1e-4
    assert cfg.model_params.opt.name_lr_scheduler == "mystep"
    assert cfg.model_params.opt.step_size == 100
    assert cfg.model_params.opt.nesterov is True
    assert cfg.model_params.l_vision_backbones == ["R2D1"]


def test_overrides_lattice():
    d = reference_style_dict()
    d2 = apply_overrides(d, {
        "opt__lr": 5e-3,
        "train_params__loader_params__batch_size": 4,
        "model_params.num_heads": 4,
        "SEED": 7,
    })
    cfg = Config.from_dict(d2)
    assert cfg.model_params.opt.lr == 5e-3
    assert cfg.train_params.loader_params.batch_size == 4
    assert cfg.model_params.num_heads == 4
    assert cfg.SEED == 7


def test_val_geometry_synced_to_train():
    d = reference_style_dict()
    d["val_params"]["seq_length"] = 256  # will be force-synced
    d["val_params"]["subseq_length"] = 32
    cfg = Config.from_dict(d)
    assert cfg.val_params.seq_length == cfg.train_params.seq_length == 512
    assert cfg.test_params.dilation == cfg.train_params.dilation == 4


def test_invalid_lattice_combos_rejected():
    d = reference_style_dict()
    d["model_params"]["joint_modalities"] = "NONE"
    d["model_params"]["output_format"] = "SELF_ATTEN"
    with pytest.raises(AssertionError):
        Config.from_dict(d)

    d = reference_style_dict()
    d["model_params"]["l_vision_backbones"] = "R2D1,I3D"
    d["model_params"]["intra_modal_fusion"] = "None"
    with pytest.raises(AssertionError):
        Config.from_dict(d)


def test_experiment_dir_lifecycle(tmp_path):
    d = reference_style_dict()
    d["outd"] = str(tmp_path)
    cfg = Config.from_dict(d)
    exp = ExperimentDir(cfg)
    assert not exp.already_done()
    exp.create(argv=["python", "main.py"])
    assert os.path.isfile(os.path.join(exp.path, "config.yml"))
    assert os.path.isfile(os.path.join(exp.path, "cmd.sh"))
    assert os.path.isdir(exp.weights_dir)
    exp.finalize({"best_epoch": 3, "valid_ccc_v": 0.5})
    assert exp.already_done()
    assert os.path.isfile(os.path.join(exp.path, "perfs.yml"))
    assert os.path.isfile(os.path.join(exp.path, "final_config.yml"))


def test_yaml_roundtrip(tmp_path):
    cfg = Config.from_dict(reference_style_dict())
    p = str(tmp_path / "c.yml")
    cfg.save_yaml(p)
    cfg2 = Config.from_file(p)
    assert cfg2.to_dict() == cfg.to_dict()
