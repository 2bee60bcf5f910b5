"""Optimizer/schedule parity vs torch (instantiator.py / my_lr_scheduler.py
semantics)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from jmt_tpu.core.config import OptimParams
from jmt_tpu.train import optim as O


def run_torch_sgd(w0, grads, lr, momentum, dampening, wd, nesterov):
    w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([w], lr=lr, momentum=momentum,
                          dampening=dampening, weight_decay=wd,
                          nesterov=nesterov)
    for g in grads:
        opt.zero_grad()
        w.grad = torch.from_numpy(g.copy())
        opt.step()
    return w.detach().numpy()


@pytest.mark.parametrize("nesterov,dampening",
                         [(True, 0.0), (False, 0.0), (False, 0.3)])
def test_torch_sgd_parity(nesterov, dampening):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5,)).astype(np.float32)
    grads = [rng.normal(size=(5,)).astype(np.float32) for _ in range(4)]
    want = run_torch_sgd(w0, grads, lr=0.1, momentum=0.9,
                         dampening=dampening, wd=1e-2, nesterov=nesterov)

    tx = optax.chain(O.torch_sgd(momentum=0.9, dampening=dampening,
                                 weight_decay=1e-2, nesterov=nesterov),
                     optax.scale(-0.1))
    w = jnp.asarray(w0)
    state = tx.init(w)
    for g in grads:
        upd, state = tx.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, upd)
    np.testing.assert_allclose(np.asarray(w), want, atol=1e-6)


def test_torch_adam_parity():
    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(5,)).astype(np.float32)
    grads = [rng.normal(size=(5,)).astype(np.float32) for _ in range(5)]
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch.optim.Adam([wt], lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=1e-2)
    for g in grads:
        wt.grad = torch.from_numpy(g.copy())
        opt_t.step()

    params = OptimParams(name_optimizer="adam", lr=1e-3, weight_decay=1e-2,
                         lr_scheduler=False)
    tx = O.build_optimizer(params)
    w = jnp.asarray(w0)
    state = tx.init(w)
    for g in grads:
        upd, state = tx.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, upd)
    np.testing.assert_allclose(np.asarray(w), wt.detach().numpy(), atol=1e-6)


def test_mystep_schedule_floor():
    p = OptimParams(name_lr_scheduler="mystep", lr=1e-2, step_size=2,
                    gamma=0.1, min_lr=1e-5)
    f = O.lr_schedule(p)
    assert f(0) == pytest.approx(1e-2)
    assert f(2) == pytest.approx(1e-3)
    assert f(4) == pytest.approx(1e-4)
    assert f(8) == pytest.approx(1e-5)   # floored
    assert f(20) == pytest.approx(1e-5)


def test_schedules_match_torch():
    lin = torch.nn.Linear(2, 2)
    for name, mk_torch, p in [
        ("step",
         lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=3, gamma=0.5),
         OptimParams(name_lr_scheduler="step", lr=0.1, step_size=3,
                     gamma=0.5)),
        ("cosine",
         lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
             o, T_max=10, eta_min=1e-4),
         OptimParams(name_lr_scheduler="cosine", lr=0.1, t_max=10,
                     min_lr=1e-4)),
        ("multistep",
         lambda o: torch.optim.lr_scheduler.MultiStepLR(
             o, milestones=[2, 5], gamma=0.1),
         OptimParams(name_lr_scheduler="multistep", lr=0.1,
                     milestones=[2, 5], gamma=0.1)),
    ]:
        opt = torch.optim.SGD(lin.parameters(), lr=0.1)
        sch = mk_torch(opt)
        f = O.lr_schedule(p)
        for epoch in range(8):
            torch_lr = opt.param_groups[0]["lr"]
            assert f(epoch) == pytest.approx(torch_lr, rel=1e-5), \
                (name, epoch, f(epoch), torch_lr)
            opt.step()
            sch.step()


@pytest.mark.parametrize("last_epoch", [0, 2, 4])
def test_last_epoch_resume_matches_torch(last_epoch):
    """opt.last_epoch continues the decay mid-schedule, matching torch's
    recurrent resume semantics for the step family exactly (the reference
    passes it into every scheduler, instantiator.py:57-92)."""
    for mk_torch, p in [
        (lambda o: torch.optim.lr_scheduler.StepLR(
            o, step_size=3, gamma=0.5, last_epoch=last_epoch),
         OptimParams(name_lr_scheduler="step", lr=0.1, step_size=3,
                     gamma=0.5, last_epoch=last_epoch)),
        (lambda o: torch.optim.lr_scheduler.MultiStepLR(
            o, milestones=[2, 5], gamma=0.1, last_epoch=last_epoch),
         OptimParams(name_lr_scheduler="multistep", lr=0.1,
                     milestones=[2, 5], gamma=0.1,
                     last_epoch=last_epoch)),
    ]:
        lin = torch.nn.Linear(2, 2)
        opt = torch.optim.SGD(lin.parameters(), lr=0.1)
        for g in opt.param_groups:  # torch requires initial_lr on resume
            g["initial_lr"] = g["lr"]
        sch = mk_torch(opt)
        f = O.lr_schedule(p)
        for epoch in range(8):
            torch_lr = opt.param_groups[0]["lr"]
            assert f(epoch) == pytest.approx(torch_lr, rel=1e-6), \
                (p.name_lr_scheduler, last_epoch, epoch, f(epoch), torch_lr)
            opt.step()
            sch.step()
    # default -1 keeps the fresh-start behavior
    f0 = O.lr_schedule(OptimParams(name_lr_scheduler="step", lr=0.1,
                                   step_size=3, gamma=0.5))
    assert f0(0) == pytest.approx(0.1)
    # cosine family: closed form at the shifted epoch
    fc = O.lr_schedule(OptimParams(name_lr_scheduler="cosine", lr=0.1,
                                   t_max=10, min_lr=1e-4,
                                   last_epoch=last_epoch))
    fc0 = O.lr_schedule(OptimParams(name_lr_scheduler="cosine", lr=0.1,
                                    t_max=10, min_lr=1e-4))
    assert fc(0) == pytest.approx(fc0(last_epoch + 1))


def test_mycosine_matches_reference_formula():
    import math
    p = OptimParams(name_lr_scheduler="mycosine", lr=1e-3, coef=0.5,
                    min_lr=1e-9)
    p.max_epochs = 600
    f = O.lr_schedule(p)
    for e in (0, 1, 100, 599):
        want = max(1e-3 * 0.5 * (1 + math.cos((e - 1) * math.pi / 600)),
                   1e-9)
        assert f(e) == pytest.approx(want)


def test_plateau_reduces_after_patience():
    p = OptimParams(name_lr_scheduler="reduce_on_plateau", lr=1.0,
                    factor=0.5, patience=2, min_lr=0.1)
    sch = O.ReduceLROnPlateau(p)
    losses = [1.0, 1.0, 1.0, 1.0, 1.0]
    lrs = [sch.step(l) for l in losses]
    # first call sets best; then 2 bad epochs tolerated; 4th bad -> reduce
    assert lrs == [1.0, 1.0, 1.0, 0.5, 0.5]
