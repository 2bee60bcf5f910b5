"""Temporal Convolutional Network (dilated causal conv stack).

Parity target: temporal_convolutional_model.py:21-83 — TemporalBlock of two
weight-normed dilated causal Conv1d (+ causal trim via Chomp1d, LeakyReLU,
channel Dropout2d) with a 1x1 downsample residual, stacked with dilation
2**i; Xavier·sqrt(2) init. Used by I3D_WSDDA as
TemporalConvNet(1024, [512]*4, kernel_size=5, dropout=0.1)
(I3DWSDDA.py:26-28). Channels-last here: (B, L, C).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.ops.conv import WeightNormConv1d, conv_nd
from jmt_tpu.ops.initializers import xavier_uniform_gain, torch_linear_bias


class ChannelDropout(nn.Module):
    """torch nn.Dropout2d on (B, C, L): zeroes whole channels.

    On 3-D input torch Dropout2d treats the tensor as (B, C, L) and drops
    per-(batch, channel). Channels-last: mask shape (B, 1, C).
    """
    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        import jax
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, x.shape[-1]))
        return jnp.where(mask, x / keep, 0.0)


class TemporalBlock(nn.Module):
    n_outputs: int
    kernel_size: int
    dilation: int
    dropout: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        n_inputs = x.shape[-1]
        h = WeightNormConv1d(self.n_outputs, self.kernel_size,
                             dilation=self.dilation, dtype=self.dtype,
                             name="conv1")(x)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = ChannelDropout(self.dropout, name="dropout1")(h, deterministic)
        h = WeightNormConv1d(self.n_outputs, self.kernel_size,
                             dilation=self.dilation, dtype=self.dtype,
                             name="conv2")(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = ChannelDropout(self.dropout, name="dropout2")(h, deterministic)

        if n_inputs != self.n_outputs:
            # 1x1 conv residual projection, xavier·sqrt(2) init like the
            # reference (temporal_convolutional_model.py:41,50-52)
            kernel = self.param("downsample_kernel",
                                xavier_uniform_gain(jnp.sqrt(2.0)),
                                (1, n_inputs, self.n_outputs))
            bias = self.param("downsample_bias", torch_linear_bias(n_inputs),
                              (self.n_outputs,))
            res = conv_nd(x, kernel.astype(x.dtype), strides=(1,),
                          padding=((0, 0),)) + bias.astype(x.dtype)
        else:
            res = x
        return nn.leaky_relu(h + res, negative_slope=0.01)


class TemporalConvNet(nn.Module):
    num_channels: Sequence[int]
    kernel_size: int = 2
    dropout: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: (B, L, C_in) -> (B, L, num_channels[-1])."""
        for i, ch in enumerate(self.num_channels):
            x = TemporalBlock(ch, self.kernel_size, dilation=2 ** i,
                              dropout=self.dropout, dtype=self.dtype,
                              name=f"block{i}")(x, deterministic)
        return x
