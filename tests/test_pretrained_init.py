"""Pretrained-weight initialization policy (init_w_*) — reference
main.py:218-302 / tsav.py:35-116 semantics, wired through Runner.initialize.

Fixtures are synthetic torch checkpoints in the exact reference layouts
(torchvision Kinetics/ImageNet sds, VideoModel/AudioModel sds with their
prefixes, the .t7 {'net': module.-prefixed} payload)."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from jmt_tpu.core.config import Config
from jmt_tpu.models import torch_io as tio
from jmt_tpu.models.pretrained import apply_pretrained
from reference_loader import load_reference_models

ref_models = load_reference_models()


def _cfg(tmp_path, **model_over):
    mp = {
        "l_vision_backbones": "R2D1",
        "l_audio_backbones": "ResNet18",
        "joint_modalities": "TRANSFORMER",
        "output_format": "SELF_ATTEN",
        "max_epochs": 1,
        "compute_dtype": "float32",
    }
    mp.update(model_over)
    return Config.from_dict({
        "exp_id": "pret", "outd": str(tmp_path / "exps"),
        "pretrained_weights_dir": str(tmp_path / "PretrainedWeights"),
        "train_params": {"loader_params": {"batch_size": 1}},
        "val_params": {"loader_params": {"batch_size": 1}},
        "model_params": mp,
        "SEED": 0,
        "mesh_data_parallel": 1,
    })


def _write_r2d1_affwild2_fixture(root) -> np.ndarray:
    """VideoModel sd: ``r2plus1d.`` prefix, 4-channel stem (tsav.py:47-56),
    fc head replaced (tsav.py:43-45). Returns the expected flax stem kernel
    after the 3-ch slice (main.py:257-268)."""
    torch.manual_seed(1)
    ref = ref_models.video_resnet.r2plus1d_18(pretrained=False)
    sd = ref.state_dict()
    w4 = torch.cat([sd["stem.0.weight"],
                    torch.randn(45, 1, 1, 7, 7)], dim=1)
    sd["stem.0.weight"] = w4
    # make a BN running stat non-trivial so the batch_stats graft is visible
    sd["stem.1.running_mean"] = torch.randn(45)
    sd = {f"r2plus1d.{k}": v for k, v in sd.items()}
    sd["r2plus1d.fc.1.weight"] = torch.randn(17, 512)
    sd["r2plus1d.fc.1.bias"] = torch.randn(17)
    os.makedirs(root, exist_ok=True)
    torch.save(sd, os.path.join(root, "vision_TSAV_Sub4_544k.pt"))
    want_stem = np.moveaxis(w4[:, :3].numpy(), (0, 1), (-1, -2))
    return want_stem, sd["r2plus1d.stem.1.running_mean"].numpy()


def _write_resnet18_imagenet_fixture(root) -> np.ndarray:
    """Raw torchvision-layout ImageNet sd (3-ch conv1). Returns the expected
    flax conv1 kernel after the RGB mean-collapse (tsav.py:78-85)."""
    from test_backbone_parity import _TorchResNet18
    torch.manual_seed(2)
    ref = _TorchResNet18(in_channels=3)
    sd = ref.state_dict()
    sd["bn1.running_mean"] = torch.randn(64)
    os.makedirs(root, exist_ok=True)
    torch.save(sd, os.path.join(root, "resnet18-f37072fd.pth"))
    w = sd["conv1.weight"].numpy()  # (64, 3, 7, 7)
    want = np.moveaxis(w, (0, 1), (-1, -2)).mean(axis=-2, keepdims=True)
    return want, sd["bn1.running_mean"].numpy()


@pytest.mark.slow
def test_runner_initialize_consumes_init_w(tmp_path):
    """A training init with init_w_R2D1=AFFWILD2 + init_w_ResNet18=IMAGENET
    demonstrably starts from the converted torch weights (VERDICT item 1)."""
    from jmt_tpu.data.synthetic import synthetic_dataset
    from jmt_tpu.train.runner import Runner

    root = str(tmp_path / "PretrainedWeights")
    want_stem, want_stem_rm = _write_r2d1_affwild2_fixture(root)
    want_conv1, want_bn1_rm = _write_resnet18_imagenet_fixture(root)
    cfg = _cfg(tmp_path, init_w_R2D1="AFFWILD2",
               init_w_ResNet18="IMAGENET")
    train = synthetic_dataset("train", n_videos=1, length=481, img_size=48)
    r = Runner(cfg, train, None)
    r.initialize()
    # both backbones are frozen by default -> grafted weights land in frozen
    frz = r.state.frozen["backbones"]
    np.testing.assert_allclose(
        np.asarray(frz["vision_r2d1"]["stem"]["spatial_conv"]["kernel"]),
        want_stem, atol=0)
    np.testing.assert_allclose(
        np.asarray(frz["audio_resnet18"]["conv1"]["kernel"]),
        want_conv1, atol=1e-7)
    bs = r.state.batch_stats["backbones"]
    np.testing.assert_allclose(
        np.asarray(bs["vision_r2d1"]["stem"]["spatial_bn"]["mean"]),
        want_stem_rm, atol=0)
    np.testing.assert_allclose(
        np.asarray(bs["audio_resnet18"]["bn1"]["mean"]),
        want_bn1_rm, atol=0)


def test_missing_dir_raises(tmp_path):
    cfg = _cfg(tmp_path, init_w_R2D1="AFFWILD2")
    cfg.pretrained_weights_dir = ""
    with pytest.raises(ValueError, match="pretrained_weights_dir"):
        apply_pretrained(cfg, {}, {})


def test_missing_file_raises(tmp_path):
    cfg = _cfg(tmp_path, init_w_R2D1="AFFWILD2")
    os.makedirs(cfg.pretrained_weights_dir, exist_ok=True)
    with pytest.raises(FileNotFoundError, match="vision_TSAV"):
        apply_pretrained(cfg, {"backbones": {"vision_r2d1": {}}}, {})


def _i3d_dst_trees():
    """A destination variables tree shaped like a fresh init of
    backbones/vision_i3d (I3DTCN), built from a DIFFERENT random torch
    model so grafted vs untouched subtrees are distinguishable."""
    torch.manual_seed(3)
    i3d = ref_models.pytorch_i3d_new.InceptionI3d(400, in_channels=3)
    wsdda = ref_models.I3DWSDDA.I3D_WSDDA(i3d)
    tree = tio.i3d_tcn_vars(wsdda.state_dict())
    params = {"backbones": {"vision_i3d": tree["params"]}}
    stats = {"backbones": {"vision_i3d": tree["batch_stats"]}}
    return params, stats


def test_i3d_kinetics400_grafts_trunk_only(tmp_path):
    """KINETICS400 loads rgb_imagenet.pt into the i3d trunk; the TCN head
    stays at its init (tsav.py:99-102)."""
    params, stats = _i3d_dst_trees()
    before_tcn = np.asarray(
        params["backbones"]["vision_i3d"]["temporal"]["block0"]["conv1"]["v"]
    ).copy()
    torch.manual_seed(4)
    src = ref_models.pytorch_i3d_new.InceptionI3d(400, in_channels=3)
    root = str(tmp_path / "PretrainedWeights")
    os.makedirs(root)
    torch.save(src.state_dict(), os.path.join(root, "rgb_imagenet.pt"))
    cfg = _cfg(tmp_path, l_vision_backbones="I3D",
               init_w_I3D="KINETICS400")
    params, stats, report = apply_pretrained(cfg, params, stats)
    assert set(report) == {"vision_i3d"}
    want = tio.i3d_vars(src.state_dict())
    got_i3d = params["backbones"]["vision_i3d"]["i3d"]
    np.testing.assert_allclose(
        np.asarray(got_i3d["Conv3d_1a_7x7"]["kernel"]),
        want["params"]["Conv3d_1a_7x7"]["kernel"], atol=0)
    np.testing.assert_allclose(
        np.asarray(stats["backbones"]["vision_i3d"]["i3d"]["Mixed_3b"]
                   ["b0"]["bn"]["var"]),
        want["batch_stats"]["Mixed_3b"]["b0"]["bn"]["var"], atol=0)
    # TCN untouched
    np.testing.assert_allclose(
        np.asarray(params["backbones"]["vision_i3d"]["temporal"]["block0"]
                   ["conv1"]["v"]), before_tcn, atol=0)


def test_i3d_affwild2_t7_grafts_full_model(tmp_path):
    """AFFWILD2 loads the {'net': module.-prefixed} .t7 over the FULL
    I3D_WSDDA — i3d trunk AND TCN (tsav.py:104-114)."""
    params, stats = _i3d_dst_trees()
    torch.manual_seed(5)
    i3d = ref_models.pytorch_i3d_new.InceptionI3d(400, in_channels=3)
    wsdda = ref_models.I3DWSDDA.I3D_WSDDA(i3d)
    sd = {f"module.{k}": v for k, v in wsdda.state_dict().items()}
    root = str(tmp_path / "PretrainedWeights")
    os.makedirs(root)
    torch.save({"net": sd},
               os.path.join(root, "Val_model_valence_cnn_lstm_mil_64_new.t7"))
    cfg = _cfg(tmp_path, l_vision_backbones="I3D", init_w_I3D="AFFWILD2")
    params, stats, report = apply_pretrained(cfg, params, stats)
    want = tio.i3d_tcn_vars(wsdda.state_dict())
    np.testing.assert_allclose(
        np.asarray(params["backbones"]["vision_i3d"]["temporal"]["block0"]
                   ["conv1"]["v"]),
        want["params"]["temporal"]["block0"]["conv1"]["v"], atol=0)
    np.testing.assert_allclose(
        np.asarray(params["backbones"]["vision_i3d"]["i3d"]
                   ["Conv3d_1a_7x7"]["kernel"]),
        want["params"]["i3d"]["Conv3d_1a_7x7"]["kernel"], atol=0)


def test_r2d1_kinetics400_raw_torchvision_layout(tmp_path):
    """KINETICS400 accepts the raw torch.hub sd (no ``r2plus1d.`` prefix,
    3-ch stem) — the 4ch->3ch round trip is an identity on it."""
    torch.manual_seed(6)
    src = ref_models.video_resnet.r2plus1d_18(pretrained=False)
    root = str(tmp_path / "PretrainedWeights")
    os.makedirs(root)
    torch.save(src.state_dict(),
               os.path.join(root, "r2plus1d_18-91a641e6.pth"))
    want = tio.video_resnet_vars(src.state_dict(), arch="r2plus1d")
    # destination: another random conversion (shapes match, values differ)
    torch.manual_seed(7)
    dst_t = ref_models.video_resnet.r2plus1d_18(pretrained=False)
    dst = tio.video_resnet_vars(dst_t.state_dict(), arch="r2plus1d")
    params = {"backbones": {"vision_r2d1": dst["params"]}}
    stats = {"backbones": {"vision_r2d1": dst["batch_stats"]}}
    cfg = _cfg(tmp_path, init_w_R2D1="KINETICS400")
    params, stats, _ = apply_pretrained(cfg, params, stats)
    np.testing.assert_allclose(
        np.asarray(params["backbones"]["vision_r2d1"]["stem"]
                   ["spatial_conv"]["kernel"]),
        want["params"]["stem"]["spatial_conv"]["kernel"], atol=0)


def test_our_affwild2_r2d1_requires_max_reduce(tmp_path):
    """main.py:281: the OUR_AFFWILD2 R2D1 checkpoint was pretrained with
    MAX pooling — any other reduce is refused."""
    cfg = _cfg(tmp_path, init_w_R2D1="OUR_AFFWILD2",
               R2D1_ft_dim_reduce="AVG")
    os.makedirs(cfg.pretrained_weights_dir, exist_ok=True)
    with pytest.raises(AssertionError):
        apply_pretrained(cfg, {"backbones": {"vision_r2d1": {}}}, {})
