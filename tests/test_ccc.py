"""CCC loss/metric parity vs the reference formulas.

Golden references: torch formula of losses/loss.py:18-32 (re-evaluated here
with torch CPU) and the numpy formula of cccmetric.py:4-21.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from jmt_tpu.ops.ccc import ccc_loss, ccc_metric, ccc_loss_masked

torch = pytest.importorskip("torch")


def torch_ccc_loss(x, y, eps=1e-8):
    # reference CCCLoss.forward, digitize_num=1 (losses/loss.py:18-32)
    x = torch.as_tensor(x).view(-1)
    y = torch.as_tensor(y).view(-1)
    vx = x - torch.mean(x)
    vy = y - torch.mean(y)
    rho = torch.sum(vx * vy) / (
        torch.sqrt(torch.sum(vx ** 2)) * torch.sqrt(torch.sum(vy ** 2)) + eps)
    x_m, y_m = torch.mean(x), torch.mean(y)
    x_s, y_s = torch.std(x), torch.std(y)
    ccc = 2 * rho * x_s * y_s / (x_s ** 2 + y_s ** 2 + (x_m - y_m) ** 2)
    return (1 - ccc).item()


def numpy_ccc_metric(x, y):
    # reference cccmetric.ccc (cccmetric.py:4-21)
    vx = x - np.mean(x)
    vy = y - np.mean(y)
    rho = np.sum(vx * vy) / (np.sqrt(np.sum(vx ** 2)) * np.sqrt(np.sum(vy ** 2)))
    x_m, y_m = np.mean(x), np.mean(y)
    x_s, y_s = np.std(x), np.std(y)
    return 2 * rho * x_s * y_s / (x_s ** 2 + y_s ** 2 + (x_m - y_m) ** 2)


@pytest.mark.parametrize("n", [16, 512, 8192])
@pytest.mark.parametrize("seed", [0, 1])
def test_ccc_loss_matches_torch(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=n).astype(np.float32)
    y = (0.7 * x + 0.3 * rng.normal(size=n)).astype(np.float32)
    got = float(ccc_loss(jnp.asarray(x), jnp.asarray(y)))
    want = torch_ccc_loss(x, y)
    assert abs(got - want) < 1e-5, (got, want)


@pytest.mark.parametrize("n", [16, 512, 8192])
def test_ccc_metric_matches_numpy(n):
    rng = np.random.default_rng(2)
    x = rng.normal(size=n).astype(np.float64)
    y = (0.5 * x + 0.5 * rng.normal(size=n)).astype(np.float64)
    got = float(ccc_metric(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))
    want = numpy_ccc_metric(x, y)
    assert abs(got - want) < 1e-4, (got, want)


def test_ccc_perfect_agreement():
    x = np.linspace(-1, 1, 100).astype(np.float32)
    assert float(ccc_metric(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(1.0, abs=1e-5)
    assert float(ccc_loss(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(0.0, abs=1e-5)


def test_ccc_loss_unmasked_includes_ignore_labels():
    # reference quirk: -5.0 padded labels DO enter the training loss
    rng = np.random.default_rng(3)
    x = rng.normal(size=64).astype(np.float32)
    y = rng.normal(size=64).astype(np.float32)
    y[::8] = -5.0
    got = float(ccc_loss(jnp.asarray(x), jnp.asarray(y)))
    want = torch_ccc_loss(x, y)
    assert abs(got - want) < 1e-5


def test_ccc_loss_masked_ignores_labels():
    rng = np.random.default_rng(4)
    x = rng.normal(size=64).astype(np.float32)
    y = (0.9 * x).astype(np.float32)
    y_m = y.copy()
    y_m[:8] = -5.0
    # masked loss on corrupted targets == unmasked loss on the clean subset
    got = float(ccc_loss_masked(jnp.asarray(x), jnp.asarray(y_m)))
    want = float(ccc_loss(jnp.asarray(x[8:]), jnp.asarray(y[8:])))
    assert abs(got - want) < 1e-5
