"""2-D ResNet-18 — the audio backbone operating on log-mel spectrograms.

Capability target: the reference's torchvision resnet18 with its first conv
swapped to 1 input channel (AudioModel, tsav.py:66-90; ImageNet conv1
weights mean-collapsed over RGB when pretrained, tsav.py:82-85) and the fc
head replaced by identity so the backbone emits 512-d features
(tsav.py:165).

Channels-last: input (B, H=64 mels, W=frames, 1) -> (B, 512).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.ops.conv import conv_nd, max_pool
from jmt_tpu.ops.norm import TorchBatchNorm
from jmt_tpu.ops.initializers import conv_kaiming_normal_fan_out


class Conv2d(nn.Module):
    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        k = self.param("kernel", conv_kaiming_normal_fan_out,
                       (*self.kernel, cin, self.features))
        if self.dtype is not None:
            x, k = x.astype(self.dtype), k.astype(self.dtype)
        pads = tuple((p, p) for p in self.padding)
        return conv_nd(x, k, strides=self.strides, padding=pads)


class BasicBlock2d(nn.Module):
    planes: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average=True):
        inplanes = x.shape[-1]
        h = Conv2d(self.planes, (3, 3), (self.stride,) * 2, (1, 1),
                   dtype=self.dtype, name="conv1")(x)
        h = TorchBatchNorm(dtype=self.dtype, name="bn1")(
            h, use_running_average)
        h = nn.relu(h)
        h = Conv2d(self.planes, (3, 3), (1, 1), (1, 1), dtype=self.dtype,
                   name="conv2")(h)
        h = TorchBatchNorm(dtype=self.dtype, name="bn2")(
            h, use_running_average)
        if self.stride != 1 or inplanes != self.planes:
            res = Conv2d(self.planes, (1, 1), (self.stride,) * 2, (0, 0),
                         dtype=self.dtype, name="downsample_conv")(x)
            res = TorchBatchNorm(dtype=self.dtype, name="downsample_bn")(
                res, use_running_average)
        else:
            res = x
        return nn.relu(h + res)


class ResNet18(nn.Module):
    """Feature extractor: (B, H, W, in_channels) -> (B, 512)."""
    in_channels: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: bool = True) -> jnp.ndarray:
        assert x.shape[-1] == self.in_channels, (x.shape, self.in_channels)
        h = Conv2d(64, (7, 7), (2, 2), (3, 3), dtype=self.dtype,
                   name="conv1")(x)
        h = TorchBatchNorm(dtype=self.dtype, name="bn1")(
            h, use_running_average)
        h = nn.relu(h)
        h = max_pool(h, (3, 3), (2, 2), ((1, 1), (1, 1)))
        planes = (64, 128, 256, 512)
        for li, p in enumerate(planes, start=1):
            for bi in range(2):
                stride = 2 if (li > 1 and bi == 0) else 1
                h = BasicBlock2d(p, stride, dtype=self.dtype,
                                 name=f"layer{li}_{bi}")(
                    h, use_running_average)
        # adaptive avg pool (1,1) + flatten == mean over spatial
        return jnp.mean(h, axis=(1, 2)).astype(
            self.dtype if self.dtype is not None else h.dtype)
