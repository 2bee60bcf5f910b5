"""Video ResNets: R(2+1)D-18, R3D-18, MC3-18 — channels-last, TPU-native.

Capability target: the reference's torchvision-derived generic VideoResNet
(video_resnet.py:194-351) with the three conv makers (Conv2Plus1D :40,
Conv3DSimple :19, Conv3DNoTemporal :63) and both stems (:166-191). The
reference taps pre-pool features via a side-channel attribute
(``spatial_fts``, video_resnet.py:240) because torch modules are stateful;
here ``features()`` simply *returns* the layer4 activations — functional,
no mutation, jit-friendly.

Inputs are channels-last (B, T, H, W, C); conv kernels (*k, Cin, Cout).
For the reference geometry (T=8, 112x112) layer4 features are
(B, 1, 7, 7, 512) == the reference's (sq, 512, 1, 7, 7) transposed.

The classification head (avgpool + fc) exists for weight-compat but the
feature path never computes it — unlike the reference, which runs the full
forward and discards the logits (tsav.py:190).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.ops.conv import conv_nd
from jmt_tpu.ops.norm import TorchBatchNorm
from jmt_tpu.ops.initializers import conv_kaiming_normal_fan_out, normal_std


def _midplanes(inp: int, out: int) -> int:
    # video_resnet.py:90
    return (inp * out * 3 * 3 * 3) // (inp * 3 * 3 + 3 * out)


class Conv3d(nn.Module):
    """Bare 3-D conv, kaiming fan_out init (video_resnet.py:273-276)."""
    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    padding: Sequence[int] = (0, 0, 0)
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None
    s2d_hw: bool = False  # keyword-only in practice: keep LAST (callers
    # pass features/kernel/strides/padding positionally)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        k = self.param("kernel", conv_kaiming_normal_fan_out,
                       (*self.kernel, cin, self.features))
        if self.dtype is not None:
            x, k = x.astype(self.dtype), k.astype(self.dtype)
        pads = tuple((p, p) for p in self.padding)
        if (self.s2d_hw and tuple(self.strides) == (1, 2, 2)
                and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0):
            # exact space-to-depth stem conv (ops/conv.conv3d_s2d_hw):
            # Cin=3 stems run at ~20% MXU lane utilization otherwise
            from jmt_tpu.ops.conv import conv3d_s2d_hw
            y = conv3d_s2d_hw(x, k, pads)
        else:
            y = conv_nd(x, k, strides=self.strides, padding=pads)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (b.astype(self.dtype) if self.dtype is not None else b)
        return y


class ConvBuilder3DSimple(nn.Module):
    """3x3x3 conv (r3d_18)."""
    features: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None
    downsample_stride = staticmethod(lambda s: (s, s, s))

    @nn.compact
    def __call__(self, x, use_running_average=True):
        return Conv3d(self.features, (3, 3, 3),
                      (self.stride,) * 3, (1, 1, 1), dtype=self.dtype,
                      name="conv")(x)


class ConvBuilder3DNoTemporal(nn.Module):
    """1x3x3 conv (mc3_18)."""
    features: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None
    downsample_stride = staticmethod(lambda s: (1, s, s))

    @nn.compact
    def __call__(self, x, use_running_average=True):
        return Conv3d(self.features, (1, 3, 3),
                      (1, self.stride, self.stride), (0, 1, 1),
                      dtype=self.dtype, name="conv")(x)


class ConvBuilder2Plus1D(nn.Module):
    """(2+1)D factorized conv: spatial 1x3x3 -> BN -> ReLU -> temporal 3x1x1
    (video_resnet.py:40-56)."""
    features: int
    stride: int = 1
    midplanes: int = 0
    dtype: Optional[jnp.dtype] = None
    downsample_stride = staticmethod(lambda s: (s, s, s))

    @nn.compact
    def __call__(self, x, use_running_average=True):
        mid = self.midplanes or _midplanes(x.shape[-1], self.features)
        h = Conv3d(mid, (1, 3, 3), (1, self.stride, self.stride), (0, 1, 1),
                   dtype=self.dtype, name="spatial_conv")(x)
        h = TorchBatchNorm(dtype=self.dtype, name="spatial_bn")(
            h, use_running_average)
        h = nn.relu(h)
        return Conv3d(self.features, (3, 1, 1), (self.stride, 1, 1),
                      (1, 0, 0), dtype=self.dtype, name="temporal_conv")(h)


_BUILDERS = {
    "r2plus1d": ConvBuilder2Plus1D,
    "r3d": ConvBuilder3DSimple,
    "mc3": ConvBuilder3DNoTemporal,
}


class BasicBlock3d(nn.Module):
    """video_resnet.py:85-117."""
    planes: int
    builder: str
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average=True):
        Builder = _BUILDERS[self.builder]
        inplanes = x.shape[-1]
        mid = _midplanes(inplanes, self.planes)

        # the reference computes midplanes once per block from the block's
        # INPUT planes and reuses it for both convs (video_resnet.py:90-99)
        kw = {"midplanes": mid} if self.builder == "r2plus1d" else {}
        h = Builder(self.planes, self.stride, dtype=self.dtype,
                    name="conv1", **kw)(x, use_running_average)
        h = TorchBatchNorm(dtype=self.dtype, name="bn1")(
            h, use_running_average)
        h = nn.relu(h)
        h = Builder(self.planes, 1, dtype=self.dtype,
                    name="conv2", **kw)(h, use_running_average)
        h = TorchBatchNorm(dtype=self.dtype, name="bn2")(
            h, use_running_average)

        if self.stride != 1 or inplanes != self.planes:
            ds = Builder.downsample_stride(self.stride)
            res = Conv3d(self.planes, (1, 1, 1), ds, (0, 0, 0),
                         dtype=self.dtype, name="downsample_conv")(x)
            res = TorchBatchNorm(dtype=self.dtype, name="downsample_bn")(
                res, use_running_average)
        else:
            res = x
        return nn.relu(h + res)


class BasicStem(nn.Module):
    """conv(3,7,7)/s(1,2,2) -> BN -> ReLU (video_resnet.py:166-174)."""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average=True):
        h = Conv3d(64, (3, 7, 7), (1, 2, 2), (1, 3, 3), dtype=self.dtype,
                   s2d_hw=True, name="conv")(x)
        h = TorchBatchNorm(dtype=self.dtype, name="bn")(
            h, use_running_average)
        return nn.relu(h)


class R2Plus1dStem(nn.Module):
    """Factorized stem (video_resnet.py:177-191)."""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average=True):
        h = Conv3d(45, (1, 7, 7), (1, 2, 2), (0, 3, 3), dtype=self.dtype,
                   s2d_hw=True, name="spatial_conv")(x)
        h = TorchBatchNorm(dtype=self.dtype, name="spatial_bn")(
            h, use_running_average)
        h = nn.relu(h)
        h = Conv3d(64, (3, 1, 1), (1, 1, 1), (1, 0, 0), dtype=self.dtype,
                   name="temporal_conv")(h)
        h = TorchBatchNorm(dtype=self.dtype, name="temporal_bn")(
            h, use_running_average)
        return nn.relu(h)


class VideoResNet(nn.Module):
    """Generic 18-layer video resnet. `arch` in {r2plus1d, r3d, mc3}."""
    arch: str = "r2plus1d"
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 400
    # stage-granular rematerialization: checkpoint each residual block
    # (and the stem) instead of the whole backbone — finer fwd-recompute /
    # memory tradeoff for finetune (cfg.remat_granularity="stage")
    remat_blocks: bool = False
    dtype: Optional[jnp.dtype] = None

    def _stem(self):
        if self.arch == "r2plus1d":
            return R2Plus1dStem(dtype=self.dtype, name="stem")
        return BasicStem(dtype=self.dtype, name="stem")

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True,
                 features_only: bool = True) -> jnp.ndarray:
        """x: (B, T, H, W, C). features_only returns layer4 activations
        (B, T', H', W', 512) — the reference's ``spatial_fts``
        (video_resnet.py:240)."""
        Block = (nn.remat(BasicBlock3d, static_argnums=(2,))
                 if self.remat_blocks else BasicBlock3d)
        h = self._stem()(x, use_running_average)
        planes = (64, 128, 256, 512)
        # mc3 mixes makers: Conv3DSimple for layer1, NoTemporal after
        # (video_resnet.py:327-332)
        builders = (["r3d", "mc3", "mc3", "mc3"] if self.arch == "mc3"
                    else [self.arch] * 4)
        for li, (p, n) in enumerate(zip(planes, self.layers), start=1):
            for bi in range(n):
                stride = 2 if (li > 1 and bi == 0) else 1
                h = Block(p, builders[li - 1], stride,
                          dtype=self.dtype,
                          name=f"layer{li}_{bi}")(
                    h, use_running_average)
        if features_only:
            return h
        pooled = jnp.mean(h, axis=(1, 2, 3))  # adaptive avg pool to 1x1x1
        # torchvision head init: normal(0, 0.01) kernel, zero bias
        # (video_resnet.py:281-283)
        logits = nn.Dense(self.num_classes,
                          kernel_init=normal_std(0.01),
                          bias_init=nn.initializers.zeros,
                          name="fc")(pooled)
        return logits


def r2plus1d_18(dtype=None) -> VideoResNet:
    return VideoResNet(arch="r2plus1d", dtype=dtype)


def r3d_18(dtype=None) -> VideoResNet:
    return VideoResNet(arch="r3d", dtype=dtype)


def mc3_18(dtype=None) -> VideoResNet:
    return VideoResNet(arch="mc3", dtype=dtype)
