"""Golden parity of the backbones vs reference torch modules.

Reference models imported from /root/reference (torch-only files). The audio
ResNet-18's golden is a minimal torch ResNet-18 built here from torch.nn
primitives (the reference uses torchvision's, unavailable in this env —
the architecture is the standard public one).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from reference_loader import load_reference_models  # noqa: E402

from jmt_tpu.models.tcn import TemporalConvNet
from jmt_tpu.models.video_resnet import VideoResNet
from jmt_tpu.models.resnet18 import ResNet18
from jmt_tpu.models.i3d import InceptionI3d, I3DTCN
from jmt_tpu.models.tsav import resize_clips_for_i3d
from jmt_tpu.models import torch_io

ref_models = load_reference_models()

ATOL = 3e-5


def rand(*shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (scale * rng.normal(size=shape)).astype(np.float32)


# ---------------------------------------------------------------- TCN ------
def test_tcn_matches_reference():
    ref = ref_models.temporal_convolutional_model.TemporalConvNet(
        num_inputs=64, num_channels=[32, 32], kernel_size=5, dropout=0.1,
        attention=0)
    ref.eval()
    x = rand(2, 64, 9, seed=1)  # torch (B, C, L)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # (B, 32, L)

    params = torch_io.tcn_params(ref.state_dict(), num_blocks=2)
    mod = TemporalConvNet((32, 32), kernel_size=5, dropout=0.1)
    got = mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    got = np.asarray(got).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=ATOL)


# ------------------------------------------------------- video resnets -----
@pytest.mark.parametrize("arch,ctor", [("r2plus1d", "r2plus1d_18"),
                                       ("r3d", "r3d_18"),
                                       ("mc3", "mc3_18")])
def test_video_resnet_features_match(arch, ctor):
    ref = getattr(ref_models.video_resnet, ctor)(pretrained=False)
    ref.eval()
    x = rand(2, 3, 8, 32, 32, seed=2, scale=0.5)  # torch (B,C,T,H,W)
    with torch.no_grad():
        ref(torch.from_numpy(x))
        want = ref.spatial_fts.numpy()  # (B, 512, T', H', W')

    tree = torch_io.video_resnet_vars(ref.state_dict(), arch=arch)
    mod = VideoResNet(arch=arch)
    got = mod.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                    use_running_average=True, features_only=True)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_video_resnet_train_mode_batchnorm():
    """Train-mode (batch-stats) BN parity + running-stat update parity."""
    # NB: 32px spatial — with tiny feature maps the batch variance at deep
    # layers degenerates and BN amplifies fp noise unboundedly (per-block
    # train parity is ~5e-6; whole-net composition needs sane statistics).
    x = rand(2, 3, 8, 32, 32, seed=3, scale=0.5)
    torch.manual_seed(0)
    ref3 = ref_models.video_resnet.r2plus1d_18(pretrained=False)
    sd_before = {k: v.clone() for k, v in ref3.state_dict().items()}
    ref3.train()
    with torch.no_grad():
        ref3(torch.from_numpy(x))
        want = ref3.spatial_fts.numpy()

    tree = torch_io.video_resnet_vars(sd_before, arch="r2plus1d")
    mod = VideoResNet(arch="r2plus1d")
    got, updates = mod.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                             use_running_average=False, features_only=True,
                             mutable=["batch_stats"])
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=5e-3)

    # running stats updated like torch (momentum .1, unbiased var)
    want_mean = ref3.state_dict()["stem.1.running_mean"].numpy()
    got_mean = np.asarray(
        updates["batch_stats"]["stem"]["spatial_bn"]["mean"])
    np.testing.assert_allclose(got_mean, want_mean, atol=1e-5)
    want_var = ref3.state_dict()["stem.1.running_var"].numpy()
    got_var = np.asarray(updates["batch_stats"]["stem"]["spatial_bn"]["var"])
    np.testing.assert_allclose(got_var, want_var, atol=1e-5)


# ------------------------------------------------------- audio resnet ------
class _TorchBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        if stride != 1 or inplanes != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
        else:
            self.downsample = None

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        res = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + res)


class _TorchResNet18(tnn.Module):
    """Standard (torchvision-layout) ResNet-18, 1-channel conv1 like the
    reference AudioModel (tsav.py:79-81)."""

    def __init__(self, in_channels=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        inp = 64
        for li, planes in enumerate((64, 128, 256, 512)):
            blocks = []
            for bi in range(2):
                stride = 2 if (li > 0 and bi == 0) else 1
                blocks.append(_TorchBasicBlock(inp, planes, stride))
                inp = planes
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return torch.flatten(F.adaptive_avg_pool2d(x, (1, 1)), 1)


def test_audio_resnet18_matches_torch():
    ref = _TorchResNet18(1)
    ref.eval()
    x = rand(3, 1, 64, 104, seed=4, scale=0.5)  # (B, 1, mels, frames)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # (B, 512)
    tree = torch_io.resnet18_vars(ref.state_dict())
    mod = ResNet18(in_channels=1)
    got = np.asarray(mod.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4)


# ----------------------------------------------------------------- I3D -----
@pytest.mark.slow
def test_i3d_extract_features_matches():
    torch.manual_seed(1)
    ref = ref_models.pytorch_i3d_new.InceptionI3d(400, in_channels=3)
    ref.eval()
    x = rand(1, 3, 8, 224, 224, seed=5, scale=0.3)
    with torch.no_grad():
        want = ref.extract_features(torch.from_numpy(x)).numpy()
        # (B, 1024, T', 1, 1)
    tree = torch_io.i3d_vars(ref.state_dict())
    mod = InceptionI3d()
    got = mod.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                    use_running_average=True, features_only=True)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.slow
def test_i3d_tcn_matches_wsdda():
    torch.manual_seed(2)
    i3d = ref_models.pytorch_i3d_new.InceptionI3d(400, in_channels=3)
    ref = ref_models.I3DWSDDA.I3D_WSDDA(i3d)
    ref.eval()
    x = rand(1, 3, 8, 224, 224, seed=6, scale=0.3)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # (B, T', 512)
    tree = torch_io.i3d_tcn_vars(ref.state_dict())
    mod = I3DTCN()
    got = np.asarray(mod.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=3e-4)


# ------------------------------------------------------ clip resize --------
def test_resize_clips_matches_reference_trilinear():
    x = rand(2, 3, 4, 14, 14, seed=7)  # (B, C, T, H, W)
    seq = torch.from_numpy(x).permute(0, 2, 1, 3, 4)
    want = F.interpolate(seq, size=(3, 28, 28), mode="trilinear",
                         align_corners=False)
    want = want.permute(0, 2, 1, 3, 4).numpy()  # (B, C, T, 28, 28)
    got = resize_clips_for_i3d(jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                               size=28)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)
