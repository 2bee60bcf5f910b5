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
