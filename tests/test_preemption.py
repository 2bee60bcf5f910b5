"""Graceful preemption (core/preempt.py + Runner.fit wiring).

SIGTERM → state saved at the next epoch boundary, passed.txt withheld so
the same command resumes. The reference has no failure-recovery story
(SURVEY.md §5.3): a preempted run loses everything.
"""
import os
import signal
import threading
import time

import pytest
from flax import serialization

from jmt_tpu.core import preempt
from jmt_tpu.core import checkpoint as ckpt
from jmt_tpu.data.synthetic import synthetic_dataset

from test_train_e2e import small_config


def test_sigterm_sets_flag_and_handler_hygiene():
    # order-independence: any earlier test that ran Runner.fit with
    # graceful_preemption left handlers installed (install() is
    # deliberately idempotent and fit does not uninstall) — start clean
    preempt.uninstall()
    preempt.clear()
    try:
        # not installed yet: an off-main-thread install must refuse
        res = []
        t = threading.Thread(target=lambda: res.append(preempt.install()))
        t.start(); t.join()
        assert res == [False]
        assert preempt.install() is True
        assert preempt.install() is True  # idempotent
        assert not preempt.requested()
        os.kill(os.getpid(), signal.SIGTERM)
        deadline = time.time() + 2.0
        while not preempt.requested() and time.time() < deadline:
            time.sleep(0.01)
        assert preempt.requested()
    finally:
        preempt.uninstall()
        preempt.clear()
    # uninstalled: SIGTERM routes to the default handler again — verify by
    # checking the registered handler is no longer ours
    assert signal.getsignal(signal.SIGTERM) is not preempt._handler


@pytest.mark.slow
def test_best_tracking_survives_preemption_resume(tmp_path):
    """A preemption resume must select the best model over the WHOLE run:
    best metrics, the best-snapshot weights and the tracker curves are
    persisted with the train state and restored by Runner.resume() (round-3
    advisor HIGH: without this, dump_best() after a resume silently
    overwrote better pre-preemption weights)."""
    import numpy as np
    from jmt_tpu.train.runner import Runner
    from jmt_tpu.core import preempt as P

    cfg = small_config(tmp_path, max_epochs=2)
    train = synthetic_dataset("train", n_videos=2, length=481, img_size=48)
    val = synthetic_dataset("val", n_videos=1, length=481, img_size=48)

    class PreemptAfterValidate(Runner):
        def validate(self, *a, **k):
            m = super().validate(*a, **k)
            P.request()
            return m

    try:
        r = PreemptAfterValidate(cfg, train, val)
        perfs = r.fit()
        # epoch 0 completed in full (validated, tracked, state saved), THEN
        # the boundary poll saw the flag
        assert perfs["preempted"] is True
        assert len(perfs["tracker"]["valid_v"]) == 1
        assert r.best["epoch"] == 0
        assert os.path.isfile(r.exp.preempted_marker)

        P.clear()
        r2 = Runner(cfg, train, val)
        assert r2.resume() is True
        # the whole-run tracking is back BEFORE any post-resume epoch runs
        assert r2.best["epoch"] == 0
        assert r2.best["avg"] == pytest.approx(r.best["avg"])
        assert [pytest.approx(x) for x in r.tracker["valid_v"]] \
            == r2.tracker["valid_v"]
        assert r2._best_snapshot is not None
        import jax
        ref_leaves = jax.tree.leaves(r._best_snapshot)
        got_leaves = jax.tree.leaves(r2._best_snapshot)
        assert len(ref_leaves) == len(got_leaves)
        for a, b in zip(ref_leaves, got_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        perfs2 = r2.fit()
        assert perfs2["preempted"] is False
        # both epochs are in the final curves; best spans the whole run
        assert len(perfs2["tracker"]["valid_v"]) == 2
        assert perfs2["best"]["avg"] >= r.best["avg"]
        assert not os.path.isfile(r2.exp.preempted_marker)  # finalize clears
    finally:
        preempt.uninstall()
        preempt.clear()


@pytest.mark.slow
def test_midepoch_preemption_resume_bit_identical(tmp_path):
    """cfg.preempt_save_steps: SIGTERM mid-epoch saves at the step boundary
    and the resumed run replays the epoch's data order past the saved step —
    final weights BIT-identical to an uninterrupted run (VERDICT r3 #4)."""
    import numpy as np
    import jax
    from jmt_tpu.train.runner import Runner
    from jmt_tpu.core import preempt as P

    train = synthetic_dataset("train", n_videos=4, length=481, img_size=48)
    val = synthetic_dataset("val", n_videos=1, length=481, img_size=48)

    # run A: uninterrupted
    cfg_a = small_config(tmp_path / "a", max_epochs=1)
    ra = Runner(cfg_a, train, val)
    perfs_a = ra.fit()
    assert perfs_a["preempted"] is False

    # run B: preempted at train step 1 of epoch 0, then resumed
    try:
        cfg_b = small_config(tmp_path / "b", max_epochs=1)
        cfg_b.preempt_save_steps = 1
        rb = Runner(cfg_b, train, val)
        P.request()  # pending before fit -> fires at the first step poll
        perfs_b = rb.fit()
        assert perfs_b["preempted"] is True
        # mid-epoch: the state was saved at epoch 0 (not advanced)
        state_path = os.path.join(rb.exp.weights_dir, ckpt.STATE_FILE)
        with open(state_path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        assert int(payload["epoch"]) == 0
        assert int(payload["extra"]["mid_epoch"]["step"]) == 1

        P.clear()
        rb2 = Runner(cfg_b, train, val)
        assert rb2.resume() is True
        assert rb2._mid_epoch is not None and rb2._mid_epoch["step"] == 1
        perfs_b2 = rb2.fit()
        assert perfs_b2["preempted"] is False
    finally:
        preempt.uninstall()
        preempt.clear()

    # the kill+resume run reproduced the uninterrupted run exactly:
    # weights bit-identical, epoch metrics identical
    for a, b in zip(jax.tree.leaves(ra.state.params()),
                    jax.tree.leaves(rb2.state.params())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert perfs_a["tracker"] == perfs_b2["tracker"]


@pytest.mark.slow
def test_preempted_fit_checkpoints_and_resumes(tmp_path):
    from jmt_tpu.train.runner import Runner
    cfg = small_config(tmp_path, max_epochs=2)
    train = synthetic_dataset("train", n_videos=2, length=481, img_size=48)
    val = synthetic_dataset("val", n_videos=1, length=481, img_size=48)
    try:
        r = Runner(cfg, train, val)
        preempt.request()  # pending before fit → exit after train epoch 0
        perfs = r.fit()
        assert perfs["preempted"] is True
        # no idempotence marker: a re-launch resumes instead of skipping
        assert not os.path.isfile(os.path.join(r.exp.path, "passed.txt"))
        # the full state was saved with the epoch advanced past the
        # completed train epoch
        state_path = os.path.join(r.exp.weights_dir, ckpt.STATE_FILE)
        with open(state_path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        assert int(payload["epoch"]) == 1
        # validation was skipped: no tracker entries for the preempted epoch
        assert perfs["tracker"]["valid_v"] == []

        preempt.clear()
        r2 = Runner(cfg, train, val)
        assert r2.resume() is True
        perfs2 = r2.fit()
        assert perfs2["preempted"] is False
        # only epoch 1 ran after resume; run completed and finalized
        assert len(perfs2["tracker"]["valid_v"]) == 1
        assert os.path.isfile(os.path.join(r2.exp.path, "passed.txt"))
    finally:
        preempt.uninstall()
        preempt.clear()
