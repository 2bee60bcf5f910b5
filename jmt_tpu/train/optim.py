"""Optimizers + LR schedules with torch semantics.

Capability target: instantiator.py:27-110 (SGD/Adam factory) and
my_lr_scheduler.py (MyStepLR/MyCosineLR) plus the torch step/cosine/
multistep/reduce_on_plateau schedules. The reference steps schedulers once
per EPOCH (train.py:325-329); here schedules are pure functions
``lr(epoch) -> float`` evaluated by the loop and injected into the
optimizer, except the stateful plateau schedule which is a small class.

torch SGD parity notes (optax.sgd lacks dampening and uses a different
nesterov formulation): update implemented explicitly —
    g = grad + wd * param
    buf = momentum * buf + (1 - dampening) * g        (after first step)
    g = g + momentum * buf  (nesterov)  |  g = buf    (classic)
torch Adam parity: L2 weight decay is added to the gradient (not decoupled).
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from jmt_tpu.core.config import OptimParams


class TorchSGDState(NamedTuple):
    momentum_buf: optax.Params
    initialized: jnp.ndarray  # bool scalar


def torch_sgd(momentum: float = 0.0, dampening: float = 0.0,
              weight_decay: float = 0.0, nesterov: bool = False
              ) -> optax.GradientTransformation:
    """Exact torch.optim.SGD update (without lr scaling — chain with
    optax.scale(-lr))."""

    def init(params):
        return TorchSGDState(jax.tree.map(jnp.zeros_like, params),
                             jnp.asarray(False))

    def update(grads, state, params=None):
        if weight_decay:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p,
                                 grads, params)
        if momentum == 0.0:
            return grads, state

        def new_buf(buf, g):
            first = momentum * buf + (1.0 - dampening) * g
            return jnp.where(state.initialized, first, g)

        buf = jax.tree.map(new_buf, state.momentum_buf, grads)
        if nesterov:
            out = jax.tree.map(lambda g, b: g + momentum * b, grads, buf)
        else:
            out = buf
        return out, TorchSGDState(buf, jnp.asarray(True))

    return optax.GradientTransformation(init, update)


def build_optimizer(opt: OptimParams) -> optax.GradientTransformation:
    """SGD/Adam per instantiator.py:32-50, with injectable learning rate
    (set per-epoch by the loop via optax.inject_hyperparams)."""
    if opt.name_optimizer == "sgd":
        def make(learning_rate):
            return optax.chain(
                torch_sgd(momentum=opt.momentum, dampening=opt.dampening,
                          weight_decay=opt.weight_decay,
                          nesterov=opt.nesterov),
                optax.scale_by_learning_rate(learning_rate),
            )
    elif opt.name_optimizer == "adam":
        def make(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(opt.weight_decay)
                if opt.weight_decay else optax.identity(),
                optax.scale_by_amsgrad(b1=opt.beta1, b2=opt.beta2,
                                       eps=opt.eps_adam)
                if opt.amsgrad else
                optax.scale_by_adam(b1=opt.beta1, b2=opt.beta2,
                                    eps=opt.eps_adam),
                optax.scale_by_learning_rate(learning_rate),
            )
    else:
        raise ValueError(opt.name_optimizer)
    return optax.inject_hyperparams(make)(learning_rate=opt.lr)


def set_learning_rate(opt_state, lr: float):
    """Inject the epoch's LR into an inject_hyperparams state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


# ---------------------------------------------------------------------------
# Epoch-level LR schedules (pure lr(epoch); torch step() counting means the
# LR used during epoch e equals f(e) with f(0)=base behavior preserved).
# ---------------------------------------------------------------------------
def lr_schedule(opt: OptimParams) -> Callable[[int], float]:
    base = opt.lr
    name = opt.name_lr_scheduler
    if not opt.lr_scheduler:
        return lambda epoch: base
    # last_epoch resume (the reference passes opt.last_epoch into every
    # scheduler constructor, instantiator.py:57-92; default -1 = fresh).
    # torch's step-family schedulers resume RECURRENTLY from the
    # optimizer's current lr: training epoch e sits at absolute epoch
    # e+N+1 and only decay boundaries in (N, e+N+1] apply — matched
    # exactly below. The cosine family's torch recurrence is
    # path-dependent under resume (it assumes the group lr was also
    # restored); we apply the closed form at the shifted epoch, the
    # evidently intended behavior.
    n_last = int(opt.last_epoch)
    off = n_last + 1
    if name == "step":
        return lambda e: base * opt.gamma ** (
            (e + off) // opt.step_size - max(n_last, 0) // opt.step_size)
    if name == "mystep":
        # MyStepLR: floor at min_lr (my_lr_scheduler.py:32-35)
        return lambda e: max(
            base * opt.gamma ** ((e + off) // opt.step_size
                                 - max(n_last, 0) // opt.step_size),
            opt.min_lr)
    if name == "cosine":
        # torch CosineAnnealingLR closed form
        return lambda e: opt.min_lr + (base - opt.min_lr) * (
            1 + math.cos(math.pi * (e + off) / opt.t_max)) / 2
    if name == "mycosine":
        # MyCosineLR (my_lr_scheduler.py:73-78); max_epochs comes from
        # model_params (the reference feeds the whole model_params dict to
        # the optimizer factory, instantiator.py:152-154)
        max_epochs = float(opt.max_epochs)
        return lambda e: max(
            base * opt.coef * (1.0 + math.cos((e + off - 1) * math.pi
                                              / max_epochs)),
            opt.min_lr)
    if name == "multistep":
        ms = sorted(opt.milestones)

        def n_hit(x):  # milestones at or before absolute epoch x
            return sum(1 for m in ms if x >= m)

        return lambda e: base * opt.gamma ** (n_hit(e + off) - n_hit(n_last))
    if name == "reduce_on_plateau":
        # handled by ReduceLROnPlateau below; loop must use it
        # (torch's plateau scheduler takes no last_epoch)
        return lambda e: base
    raise ValueError(name)


class ReduceLROnPlateau:
    """torch ReduceLROnPlateau (mode/factor/patience/min_lr), stepped with
    the epoch loss like the reference (train.py:325-326)."""

    def __init__(self, opt: OptimParams):
        self.lr = opt.lr
        self.mode = opt.mode
        self.factor = opt.factor
        self.patience = opt.patience
        self.min_lr = opt.min_lr
        self.best: Optional[float] = None
        self.num_bad = 0

    def step(self, metric: float) -> float:
        better = (self.best is None
                  or (self.mode == "min" and metric < self.best)
                  or (self.mode == "max" and metric > self.best))
        if better:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr
