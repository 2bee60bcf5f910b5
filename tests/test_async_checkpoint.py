"""AsyncCheckpointer: background-thread checkpoint writes.

The reference blocks its epoch loop on torch.save of every component
(main.py:984-995); jmt_tpu overlaps epoch-end checkpoint I/O with the next
epoch's device compute (core/checkpoint.AsyncCheckpointer, default-on via
cfg.async_checkpoint — the Runner fit e2e tests in test_train_e2e exercise
the wired path). Here: byte-identity with the sync writers, the atomic
tmp+rename contract, and error propagation at wait()/close().
"""
import os
from types import SimpleNamespace

import numpy as np
import pytest

from jmt_tpu.core import checkpoint as ckpt
from jmt_tpu.core.config import Config


def _tiny_state(epoch=3):
    return SimpleNamespace(
        trainable={"fusion_model":
                   {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}},
        frozen={"backbones":
                {"vision_r2d1": {"k": np.ones((4,), np.float32)}}},
        batch_stats={"backbones":
                     {"vision_r2d1": {"mean": np.zeros((4,), np.float32)}}},
        opt_state={"count": np.int32(7)},
        epoch=epoch,
    )


def test_async_train_state_byte_identical(tmp_path):
    st = _tiny_state()
    sync_dir, async_dir = str(tmp_path / "sync"), str(tmp_path / "async")
    ckpt.save_train_state(sync_dir, st)
    with ckpt.AsyncCheckpointer() as acp:
        acp.save_train_state(async_dir, st)
        acp.wait()  # barrier; also re-raises any background failure
        with open(os.path.join(async_dir, ckpt.STATE_FILE), "rb") as f:
            b_async = f.read()
    with open(os.path.join(sync_dir, ckpt.STATE_FILE), "rb") as f:
        b_sync = f.read()
    assert b_sync == b_async and len(b_sync) > 0
    # atomic-write contract: the tmp file was renamed away, not left behind
    assert not any(n.endswith(".tmp") for n in os.listdir(async_dir))


def test_async_export_components_byte_identical(tmp_path):
    st = _tiny_state()
    params = {**st.trainable, **st.frozen}
    sync_dir, async_dir = str(tmp_path / "sync"), str(tmp_path / "async")
    written = ckpt.export_components(sync_dir, params, st.batch_stats)
    # fusion_w + all_backbones + vision_r2d1 components are all present
    assert set(written) == {"fusion_w", "all_backbones", "vision_r2d1"}
    with ckpt.AsyncCheckpointer() as acp:
        acp.export_components(async_dir, params, st.batch_stats)
    for name in written:
        with open(os.path.join(sync_dir, f"{name}.msgpack"), "rb") as f:
            b_sync = f.read()
        with open(os.path.join(async_dir, f"{name}.msgpack"), "rb") as f:
            b_async = f.read()
        assert b_sync == b_async, name


def test_async_failure_surfaces_at_wait(tmp_path):
    blocked = tmp_path / "blocked"
    blocked.write_text("a file where a directory must go")
    acp = ckpt.AsyncCheckpointer()
    acp.save_train_state(str(blocked), _tiny_state())
    with pytest.raises(OSError):
        acp.wait()
    # the failed future is cleared: the checkpointer remains usable
    ok_dir = str(tmp_path / "ok")
    acp.save_train_state(ok_dir, _tiny_state())
    acp.close()
    assert os.path.isfile(os.path.join(ok_dir, ckpt.STATE_FILE))


def test_async_checkpoint_config_knob_coerces():
    assert Config(async_checkpoint="False").async_checkpoint is False
    assert Config(async_checkpoint="True").async_checkpoint is True
    assert Config().async_checkpoint is True
