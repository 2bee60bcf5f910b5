"""Shared building blocks with torch-default numerics."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.ops.initializers import torch_linear_kernel, torch_linear_bias


class Linear(nn.Module):
    """nn.Linear equivalent: torch default init, flax kernel layout (in, out)."""
    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_kernel,
                            (fan_in, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", torch_linear_bias(fan_in),
                              (self.features,))
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            y = y + bias
        return y


class LayerNorm(nn.Module):
    """nn.LayerNorm equivalent (eps=1e-5, affine). Always computed in fp32
    for stability, cast back to the compute dtype."""
    dtype: Optional[jnp.dtype] = None
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype) if self.dtype is not None else y


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(p=2): x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=axis,
                            keepdims=True))
    return (x / jnp.maximum(norm, eps).astype(x.dtype)).astype(x.dtype)
