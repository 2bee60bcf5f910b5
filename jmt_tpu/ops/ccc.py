"""Concordance Correlation Coefficient — loss and metric.

Parity anchors (the two reference implementations differ deliberately and we
replicate each exactly):

* ``ccc_loss``  — reference training criterion ``CCCLoss`` with
  digitize_num=1 (losses/loss.py:18-32): **sample** std (torch.std, n-1
  divisor), eps=1e-8 added to the rho denominator only, and NO masking of
  ``-5.0`` padded labels (they enter the training loss, a documented
  reference quirk — SURVEY.md §2.1 Losses).
* ``ccc_metric`` — reference eval metric (EvaluationMetrics/cccmetric.py:4-21):
  **population** std (np.std, n divisor) and no eps anywhere.
* ``ccc_loss_masked`` — the reference also ships an unused masked variant
  (losses/CCCLoss.py:4-43) ignoring ``-5.0`` labels; provided as an opt-in
  fixed default.

All are pure jittable functions of flattened vectors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pearson_num_den(x: jnp.ndarray, y: jnp.ndarray):
    vx = x - jnp.mean(x)
    vy = y - jnp.mean(y)
    num = jnp.sum(vx * vy)
    den = jnp.sqrt(jnp.sum(vx ** 2)) * jnp.sqrt(jnp.sum(vy ** 2))
    return num, den


def ccc_loss(pred: jnp.ndarray, target: jnp.ndarray,
             eps: float = 1e-8,
             weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """1 - CCC with torch-semantics (sample std), matching
    losses/loss.py:18-32 bit-for-bit in fp32.

    Args:
      pred, target: any shape; flattened internally (reference flattens to
        (1, b*seq) — train.py:303-311).
      weight: optional {0,1} element weights (flattened like pred). With
        all-ones this is algebraically identical to the unweighted form;
        zeros exclude entries — used to mask static-batch padding rows out
        of the gradient (the reference instead drops the ragged last batch,
        main.py:655 drop_last=True).
    """
    x = pred.reshape(-1)
    y = target.reshape(-1)
    if weight is None:
        n = jnp.asarray(x.shape[0], x.dtype)
        x_m, y_m = jnp.mean(x), jnp.mean(y)
        vx = x - x_m
        vy = y - y_m
    else:
        w = weight.reshape(-1).astype(x.dtype)
        n = jnp.sum(w)
        x_m = jnp.sum(x * w) / n
        y_m = jnp.sum(y * w) / n
        vx = (x - x_m) * w
        vy = (y - y_m) * w
    num = jnp.sum(vx * vy)
    den = jnp.sqrt(jnp.sum(vx ** 2)) * jnp.sqrt(jnp.sum(vy ** 2))
    rho = num / (den + eps)
    # torch.std is the unbiased (n-1) sample std
    x_s = jnp.sqrt(jnp.sum(vx ** 2) / (n - 1))
    y_s = jnp.sqrt(jnp.sum(vy ** 2) / (n - 1))
    ccc = 2 * rho * x_s * y_s / (x_s ** 2 + y_s ** 2 + (x_m - y_m) ** 2)
    return 1.0 - ccc


def ccc_metric(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """CCC with numpy-semantics (population std), matching
    EvaluationMetrics/cccmetric.py:4-21. Args follow the reference's
    (prediction, target) call order (val.py:381-382) though CCC is symmetric
    in all terms."""
    x = x.reshape(-1)
    y = y.reshape(-1)
    num, den = _pearson_num_den(x, y)
    rho = num / den
    x_m, y_m = jnp.mean(x), jnp.mean(y)
    x_s = jnp.std(x)  # population std (n divisor) like np.std
    y_s = jnp.std(y)
    return 2 * rho * x_s * y_s / (x_s ** 2 + y_s ** 2 + (x_m - y_m) ** 2)


def ccc_loss_masked(pred: jnp.ndarray, target: jnp.ndarray,
                    ignore: float = -5.0, eps: float = 1e-8) -> jnp.ndarray:
    """1 - CCC over the entries whose target != ignore.

    Masked counterpart of ``ccc_loss`` (in the spirit of the reference's
    unused losses/CCCLoss.py:4-43). Implemented with a weight mask so shapes
    stay static under jit.
    """
    x = pred.reshape(-1)
    y = target.reshape(-1)
    w = (y != ignore).astype(x.dtype)
    n = jnp.maximum(jnp.sum(w), 2.0)
    x_m = jnp.sum(x * w) / n
    y_m = jnp.sum(y * w) / n
    vx = (x - x_m) * w
    vy = (y - y_m) * w
    num = jnp.sum(vx * vy)
    den = jnp.sqrt(jnp.sum(vx ** 2)) * jnp.sqrt(jnp.sum(vy ** 2))
    rho = num / (den + eps)
    x_s = jnp.sqrt(jnp.sum(vx ** 2) / (n - 1))
    y_s = jnp.sqrt(jnp.sum(vy ** 2) / (n - 1))
    ccc = 2 * rho * x_s * y_s / (x_s ** 2 + y_s ** 2 + (x_m - y_m) ** 2)
    return 1.0 - ccc


def digitized_expectation(logits: jnp.ndarray, num_bins: int,
                          v_range=(-1.0, 1.0)) -> jnp.ndarray:
    """The CCCLoss digitize_num > 1 path (losses/loss.py:14-22): softmax
    over `num_bins` class logits, expectation over linspace bins."""
    bins = jnp.linspace(v_range[0], v_range[1], num_bins)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(bins * probs, axis=-1)


def ccc_loss_digitized(logits: jnp.ndarray, target: jnp.ndarray,
                       num_bins: int, eps: float = 1e-8) -> jnp.ndarray:
    """1 - CCC on the binned expectation (losses/loss.py with
    digitize_num=num_bins > 1). logits: (..., num_bins)."""
    x = digitized_expectation(logits.reshape(-1, num_bins), num_bins)
    return ccc_loss(x, target, eps=eps)


# jitted convenience entry points
ccc_loss_jit = jax.jit(ccc_loss)
ccc_metric_jit = jax.jit(ccc_metric)
