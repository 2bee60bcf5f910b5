"""Weight initializers matching torch defaults.

The reference trains its fusion stack from scratch with torch's default
inits, so matching them matters for training parity:

* ``nn.Linear``: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for both
  kernel and bias.
* ``nn.MultiheadAttention._reset_parameters``: xavier_uniform on the packed
  in-proj, zeros for in-proj bias and out-proj bias; out-proj kernel keeps
  the Linear default.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """flax kernel layout (fan_in, fan_out); bound = 1/sqrt(fan_in)."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_packed_qkv(key, shape, dtype=jnp.float32):
    """Xavier-uniform computed over the packed (3E, E) torch matrix, stored
    here in flax layout (E, 3E). torch fan_in=E, fan_out=3E."""
    fan_in, fan_out3 = shape
    gain = 1.0
    bound = gain * np.sqrt(6.0 / (fan_in + fan_out3))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_out', nonlinearity='relu') for convs,
    as used by the reference VideoResNet (video_resnet.py:273-276).
    flax conv kernel layout: (*spatial, in, out); fan_out = out * prod(spatial).
    """
    receptive = int(np.prod(shape[:-2]))
    fan_out = shape[-1] * receptive
    std = np.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, dtype)


def xavier_uniform_gain(gain: float):
    """torch nn.init.xavier_uniform_(w, gain) for conv kernels in flax layout
    (*spatial, in, out): fan_in = in*prod(spatial), fan_out = out*prod(spatial).
    Used by the reference TCN with gain=sqrt(2)
    (temporal_convolutional_model.py:47)."""

    def init(key, shape, dtype=jnp.float32):
        receptive = int(np.prod(shape[:-2]))
        fan_in = shape[-2] * receptive
        fan_out = shape[-1] * receptive
        bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_std(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init
