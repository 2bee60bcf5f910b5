"""remat_backbones: rematerialized finetune step matches non-remat exactly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jmt_tpu.core.config import Config
from jmt_tpu.models.jmt_model import model_from_config
from jmt_tpu.train import optim as O
from jmt_tpu.train.loops import make_train_step, init_state


def _run(remat: bool) -> float:
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
            "remat_backbones": remat}})
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
    state, loss, _, _ = step(state, arrays, jax.random.PRNGKey(1))
    # second step exercises the updated params through remat too
    state, loss, _, _ = step(state, arrays, jax.random.PRNGKey(2))
    return float(loss)


@pytest.mark.slow
def test_remat_matches_nonremat():
    l0 = _run(False)
    l1 = _run(True)
    assert l0 == pytest.approx(l1, abs=1e-5), (l0, l1)
    assert np.isfinite(l0)
