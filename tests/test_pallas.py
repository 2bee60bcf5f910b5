"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def test_mel_kernel_matches_xla(interpret_pallas):
    from jmt_tpu.ops.pallas.melspec import log_mel_pallas
    from jmt_tpu.ops.mel import log_mel_batch
    rng = np.random.default_rng(0)
    x = (0.2 * rng.normal(size=(3, 45599))).astype(np.float32)
    got = np.asarray(log_mel_pallas(jnp.asarray(x)))
    want = np.asarray(log_mel_batch(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_fused_attention_matches_xla(interpret_pallas):
    from jmt_tpu.ops.pallas.fused_attention import fused_attention
    rng = np.random.default_rng(1)
    bh, lq, lk, d = 6, 16, 16, 64
    q = rng.normal(size=(bh, lq, d)).astype(np.float32) * 0.2
    k = rng.normal(size=(bh, lk, d)).astype(np.float32)
    v = rng.normal(size=(bh, lk, d)).astype(np.float32)
    got = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), block_bh=4))
    scores = np.einsum("bqd,bkd->bqk", q, k)
    attn = np.exp(scores - scores.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    want = np.einsum("bqk,bkd->bqd", attn, v)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_attention_core_grad_uses_xla_backward():
    """custom_vjp: gradient flows and equals the pure-XLA gradient."""
    from jmt_tpu.ops.attention import attention_core, _core_xla
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 4, 2, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 4, 2, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 4, 2, 8)).astype(np.float32))

    g1 = jax.grad(lambda q: jnp.sum(attention_core(q, k, v) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(_core_xla(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
