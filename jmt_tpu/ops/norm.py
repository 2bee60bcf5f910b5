"""BatchNorm with exact torch semantics.

Differences from flax.linen.BatchNorm that matter for parity with the
reference's BN-heavy backbones (BatchNorm3d in R(2+1)D/I3D, BatchNorm2d in
the audio ResNet-18, BatchNorm1d in I3D_WSDDA's regressors):

* train mode normalizes with the BIASED batch variance but updates the
  running variance with the UNBIASED one (torch _BatchNorm semantics);
* eval mode uses running stats;
* momentum convention: new = (1 - m) * old + m * batch (torch), i.e. the
  reference default m=0.1, I3D uses m=0.01 (pytorch_i3d_new.py:78-79).

The reference freezes backbones by default (config_file.json:64-66) via
``model.eval()`` + selective ``.train(True)`` (train.py:27-42); that maps to
``use_running_average=True`` here.

Running stats live in the 'batch_stats' collection: {'mean', 'var'}.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn


class TorchBatchNorm(nn.Module):
    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5
    use_scale_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: bool = True) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean((xf - mean) ** 2, axis=axes)  # biased
            n = 1
            for a in axes:
                n *= x.shape[a]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        y = (x.astype(jnp.float32) - mean) / jnp.sqrt(var + self.epsilon)
        if self.use_scale_bias:
            scale = self.param("scale", nn.initializers.ones, (features,))
            bias = self.param("bias", nn.initializers.zeros, (features,))
            y = y * scale + bias
        return y.astype(self.dtype) if self.dtype is not None else y
