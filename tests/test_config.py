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


def test_overrides_reference_readme_flag_forms():
    """Every flag form from the reference README's command lines
    (README.MD:75-115) works verbatim as a --set key: bare model-param
    flags are TOP-LEVEL argparse flags there (parseit.py:85-270), and
    loader params are flattened onto the split prefix
    (``--train_params__batch_size``, parseit.py:291-345)."""
    d = reference_style_dict()
    d2 = apply_overrides(d, {
        "num_heads": 2,                      # bare model-param key
        "freeze_vision_R2D1": False,
        "l_audio_backbones": "wavLM,ResNet18",
        "init_w_ResNet18": "IMAGENET",
        "intra_modal_fusion": "encoder_plus_self_attention",
        "train_params__batch_size": 4,       # split-prefixed loader key
        "train_params__num_workers": 2,
        "val_params__shuffle": False,
        "train_params__take_n_videos": 3,    # split-prefixed split key
        "goal": "TRAINING",                  # true top-level stays top
    })
    cfg = Config.from_dict(d2)
    assert cfg.model_params.num_heads == 2
    assert cfg.model_params.freeze_vision_R2D1 is False
    assert cfg.model_params.l_audio_backbones == ["wavLM", "ResNet18"]
    assert cfg.model_params.init_w_ResNet18 == "IMAGENET"
    assert cfg.train_params.loader_params.batch_size == 4
    assert cfg.train_params.loader_params.num_workers == 2
    assert cfg.val_params.loader_params.shuffle is False
    assert cfg.train_params.take_n_videos == 3
    assert cfg.goal == "TRAINING"


def test_reference_readme_command_line_verbatim():
    """The reference README's fusion-training command (README.MD:75-115)
    parses VERBATIM through our CLI — unknown --key value flags become
    config overrides with the reference's parseit semantics (bare
    model-param flags, opt__ prefixes, split-prefixed loader params,
    '+'-separated backbone lists)."""
    from jmt_tpu import cli
    argv = [
        "--opt__name_optimizer", "sgd",
        "--opt__lr", "0.0001",
        "--opt__weight_decay", "0.0",
        "--opt__name_lr_scheduler", "mystep",
        "--opt__step_size", "100",
        "--opt__gamma", "0.1",
        "--v_dropout", "0.0",
        "--a_dropout", "0.0",
        "--num_heads", "1",
        "--num_layers", "1",
        "--freeze_vision_R2D1", "True",
        "--freeze_vision_I3D", "True",
        "--freeze_audio_ResNet18", "True",
        "--split", "DEFAULT",
        "--l_vision_backbones", "R2D1",
        "--l_audio_backbones", "wavLM+ResNet18",
        "--init_w_R2D1", "RANDOM",
        "--init_w_I3D", "RANDOM",
        "--init_w_ResNet18", "RANDOM",
        "--goal", "TRAINING",
        "--train_params__take_n_videos", "2",
        "--val_params__take_n_videos", "2",
        "--R2D1_ft_dim_reduce", "MAX",
        "--joint_modalities", "TRANSFORMER",
        "--dump_best_model_every_time", "True",
        "--output_format", "SELF_ATTEN",
        "--intra_modal_fusion", "encoder_plus_self_attention",
        "--max_epochs", "1",
        "--train_params__seq_length", "512",
        "--train_params__subseq_length", "32",
        "--train_params__stride", "1",
        "--train_params__dilation", "4",
        "--train_params__batch_size", "32",
        "--train_params__num_workers", "16",
        "--train_params__pin_memory", "True",
        "--train_params__shuffle", "True",
        "--train_params__use_more_vision_data_augm", "False",
        "--train_params__use_more_audio_data_augm", "False",
        "--val_params__num_workers", "8",
        "--SEED", "0",
        "--Mode", "Training",
        "--exp_id", "03_09_2024_10_20_28_318104__2676163",
    ]
    args = cli.parse_args(argv)
    cfg = cli.build_config(args)
    assert cfg.Mode == "Training" and cfg.goal == "TRAINING"
    assert cfg.exp_id == "03_09_2024_10_20_28_318104__2676163"
    assert cfg.SEED == 0 and cfg.split == "DEFAULT"
    mp = cfg.model_params
    assert mp.opt.name_optimizer == "sgd" and mp.opt.lr == 1e-4
    assert mp.opt.name_lr_scheduler == "mystep" and mp.opt.step_size == 100
    assert mp.l_vision_backbones == ["R2D1"]
    assert mp.l_audio_backbones == ["wavLM", "ResNet18"]
    assert mp.freeze_vision_R2D1 is True and mp.num_heads == 1
    assert mp.intra_modal_fusion == "encoder_plus_self_attention"
    assert mp.output_format == "SELF_ATTEN" and mp.max_epochs == 1
    tp = cfg.train_params
    assert tp.take_n_videos == 2 and tp.seq_length == 512
    assert tp.stride == 1 and tp.dilation == 4
    assert tp.use_more_vision_data_augm is False
    assert tp.loader_params.batch_size == 32
    assert tp.loader_params.num_workers == 16
    assert tp.loader_params.pin_memory is True
    assert tp.loader_params.shuffle is True
    assert cfg.val_params.take_n_videos == 2
    assert cfg.val_params.loader_params.num_workers == 8


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


def test_cli_passthrough_equals_form_and_errors():
    from jmt_tpu import cli
    args = cli.parse_args(["--num_heads=2", "--opt__lr=0.01",
                           "--set", "SEED=3"])
    assert "num_heads=2" in args.set and "opt__lr=0.01" in args.set
    assert "SEED=3" in args.set
    cfg = cli.build_config(args)
    assert cfg.model_params.num_heads == 2
    assert cfg.model_params.opt.lr == 0.01 and cfg.SEED == 3
    import pytest as _pytest
    with _pytest.raises(SystemExit):      # flag without a value
        cli.parse_args(["--num_heads"])
    with _pytest.raises(SystemExit):      # bare positional operand
        cli.parse_args(["stray"])


def test_every_reference_parseit_flag_is_recognized():
    """Exhaustive verbatim compat: every --flag the reference's parseit.py
    defines (75 add_argument calls, parseit.py:85-289 + the Eval parser)
    must route into our config — no 'ignoring unknown config key' warning,
    no argparse rejection. Values come from the reference's own
    config_file.json defaults so the lattice sees realistic settings."""
    import json
    import pathlib
    import re
    import warnings

    ref = pathlib.Path("/root/reference/parseit.py")
    if not ref.exists():
        pytest.skip("reference tree unavailable")
    calls = re.findall(r'add_argument\(\s*"--(\w+)"(.*?)\)\n',
                       ref.read_text(), re.S)
    leaves = {}

    def walk(d):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v)
            else:
                leaves.setdefault(k, v)

    walk(json.load(open("/root/reference/config_file.json")))

    SAMPLES = {"Mode": "Training", "eval_set": "val",
               "exp_id": "flagtest", "verbose": "True"}
    from jmt_tpu import cli

    failures = []
    for flag, chunk in dict(calls).items():  # dict() dedupes Mode
        if flag == "fd_exp":
            # Eval-mode exp-dir alias: needs a real experiment dir; the
            # alias mapping itself is covered by the Eval CLI tests
            continue
        base = flag.split("__")[-1]
        if flag in SAMPLES:
            val = SAMPLES[flag]
        elif base in leaves and leaves[base] is not None:
            val = str(leaves[base])
        elif "str2bool" in chunk:
            val = "True"
        elif "type=int" in chunk:
            val = "1"
        elif "type=float" in chunk:
            val = "0.1"
        else:
            val = "x"
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            try:
                args = cli.parse_args([f"--{flag}", val])
                cli.build_config(args)
            except SystemExit:
                failures.append((flag, val, "argparse rejected"))
                continue
            except Exception:
                pass  # value rejected downstream => the key WAS routed
        if any("unknown config key" in str(x.message) for x in w):
            failures.append((flag, val, "unknown key"))
    assert len(dict(calls)) >= 70, "reference flag extraction broke"
    assert not failures, failures


def test_reference_config_file_loads_verbatim():
    """The reference's own config_file.json loads into Config with no
    unknown-key warnings (cuda-only keys are in the documented silent
    set) and the big knobs land where the reference put them."""
    import json
    import pathlib
    import warnings

    p = pathlib.Path("/root/reference/config_file.json")
    if not p.exists():
        pytest.skip("reference tree unavailable")
    raw = json.load(open(p))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = Config.from_dict(raw)
    unknown = [str(x.message) for x in w
               if "unknown config key" in str(x.message)]
    assert not unknown, unknown
    assert cfg.goal == raw["goal"] and cfg.SEED == raw["SEED"]
    assert cfg.model_params.opt.lr == raw["model_params"]["opt__lr"]
    assert (cfg.train_params.loader_params.batch_size
            == raw["train_params"]["loader_params"]["batch_size"])


def test_cli_without_data_paths_exits_cleanly():
    """Missing dataset paths produce an actionable SystemExit, not a raw
    FileNotFoundError traceback (new-user path: README quickstart minus
    --synthetic)."""
    from jmt_tpu import cli
    with pytest.raises(SystemExit, match="no dataset configured"):
        cli.make_datasets(Config(), synthetic=None)
