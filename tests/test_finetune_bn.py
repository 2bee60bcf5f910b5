"""finetune_bn="frozen": running-stats BN while finetuning.

Reference parity is "batch" (model.eval() + selective .train(True),
reference train.py:27-42: finetuned backbones run train-mode BN). The
"frozen" mode is a TPU-native opt-in: BN uses running stats, grads still
flow to conv weights and BN scale/bias — so batch_stats must stay
BIT-IDENTICAL across steps while the trainable backbone params move.
"""
import numpy as np
import pytest

import jax

from jmt_tpu.core.config import Config
from jmt_tpu.models.jmt_model import model_from_config
from jmt_tpu.train import optim as O
from jmt_tpu.train.loops import make_train_step, init_state


def _setup(finetune_bn: str):
    cfg = Config.from_dict({
        "train_params": {}, "val_params": {}, "test_params": {},
        "model_params": {
            "l_vision_backbones": "R2D1",
            "l_audio_backbones": "ResNet18",
            "freeze_vision_R2D1": False,
            "freeze_audio_ResNet18": False,
            "joint_modalities": "TRANSFORMER",
            "output_format": "SELF_ATTEN",
            "compute_dtype": "float32",
            "finetune_bn": finetune_bn}})
    model = model_from_config(cfg)
    tx = O.build_optimizer(cfg.model_params.opt)
    rng = np.random.default_rng(0)
    arrays = {
        "clips": rng.integers(0, 255, size=(1, 2, 8, 32, 32, 3),
                              dtype=np.uint8),
        "audio": (0.1 * rng.normal(size=(1, 2, 45599))).astype(np.float32),
        "labels_v": rng.uniform(-1, 1, (1, 2)).astype(np.float32),
        "labels_a": rng.uniform(-1, 1, (1, 2)).astype(np.float32)}
    state = init_state(model, cfg, jax.random.PRNGKey(0), arrays, tx)
    step = make_train_step(model, tx)
    return state, step, arrays


def _leaf_delta(a, b):
    ds = [float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
          for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))]
    return max(ds)


@pytest.mark.slow
def test_frozen_bn_finetune_stats_fixed_params_move():
    state, step, arrays = _setup("frozen")
    bs0 = jax.tree.map(np.asarray, state.batch_stats)
    tr0 = jax.tree.map(np.asarray, state.trainable)
    state, loss, _, _ = step(state, arrays, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert _leaf_delta(bs0, state.batch_stats) == 0.0  # stats untouched
    assert _leaf_delta(tr0, state.trainable) > 0.0     # grads flowed
    # the finetuned backbone conv weights specifically moved
    assert _leaf_delta(tr0["backbones"], state.trainable["backbones"]) > 0.0


@pytest.mark.slow
def test_batch_bn_finetune_updates_stats():
    state, step, arrays = _setup("batch")
    bs0 = jax.tree.map(np.asarray, state.batch_stats)
    state, loss, _, _ = step(state, arrays, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert _leaf_delta(bs0, state.batch_stats) > 0.0   # reference parity


def test_config_validates_finetune_bn():
    with pytest.raises(AssertionError):
        Config.from_dict({
            "train_params": {}, "val_params": {}, "test_params": {},
            "model_params": {"finetune_bn": "nope"}})
