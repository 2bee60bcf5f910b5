"""Train-step (forward+backward+update) profiling on the attached chip.

Measures the full jitted train step — device preprocessing, backbones,
fusion, CCC loss, gradients, SGD update — for the freeze policies that
matter:

  frozen          recipe-of-record: backbones frozen (grads only through
                  the fusion stack; frozen params are constants, no
                  backward FLOPs through them — train/state.py design)
  finetune        all backbones trainable, no remat
  finetune_remat  all backbones trainable, nn.remat on the backbones
                  (jax.checkpoint: ~1 extra forward for O(depth) less HBM)

Each variant is a separate heavy XLA compile (~5-10 min on the axon relay);
select them individually:

    PYTHONPATH=. python tools/profile_train_step.py frozen [B] [iters]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


VARIANTS = {
    "frozen": dict(finetune=(), remat=False),
    "finetune": dict(finetune=("R2D1", "I3D", "ResNet18"), remat=False),
    "finetune_remat": dict(finetune=("R2D1", "I3D", "ResNet18"), remat=True),
    # stage-granular checkpoints (cfg.remat_granularity="stage"):
    # per-residual-block (R2D1) / per-inception-module (I3D)
    "finetune_remat_stage": dict(finetune=("R2D1", "I3D", "ResNet18"),
                                 remat=True, granularity="stage"),
    # single-backbone finetune isolations: (this - frozen) ~= that
    # backbone's backward+update cost (VERDICT-r2 #4 bwd attribution)
    "ft_r2d1": dict(finetune=("R2D1",), remat=False),
    "ft_i3d": dict(finetune=("I3D",), remat=False),
    "ft_audio": dict(finetune=("ResNet18",), remat=False),
    # frozen-BN finetune (model_params.finetune_bn="frozen", NOT parity):
    # running-stats BN with grads flowing — removes the train-BN batch-stat
    # reductions that dominate the I3D backward; also the i3d finetune
    # isolation under it, to attribute the win
    "finetune_frozenbn": dict(finetune=("R2D1", "I3D", "ResNet18"),
                              remat=False, finetune_bn="frozen"),
    "ft_i3d_frozenbn": dict(finetune=("I3D",), remat=False,
                            finetune_bn="frozen"),
}


def main(variant="frozen", b=8, s=16, iters=8):
    from jmt_tpu.models.jmt_model import JMTModel
    from jmt_tpu.train.loops import make_train_step, init_state
    from jmt_tpu.train.state import partition_params, param_count

    spec = VARIANTS[variant]
    model = JMTModel(
        vision_backbones=("R2D1", "I3D"),
        audio_backbones=("ResNet18", "wavLM"),
        intra_modal_fusion="encoder_plus_self_attention",
        joint_modalities="TRANSFORMER", output_format="SELF_ATTEN",
        finetune=spec["finetune"], remat=spec["remat"],
        remat_granularity=spec.get("granularity", "backbone"),
        finetune_bn=spec.get("finetune_bn", "batch"),
        dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    arrays = {
        "clips": rng.integers(0, 255, size=(b, s, 8, 112, 112, 3),
                              dtype=np.uint8),
        "audio": (rng.normal(size=(b, s, 45599)) * 0.1).astype(np.float32),
        "wavlm": rng.normal(size=(b, s, 768)).astype(np.float32),
        "labels_v": rng.uniform(-1, 1, (b, s)).astype(np.float32),
        "labels_a": rng.uniform(-1, 1, (b, s)).astype(np.float32),
    }
    tx = optax.sgd(1e-4, momentum=0.9)

    class _FreezeCfg:
        class model_params:
            freeze_vision_R2D1 = "R2D1" not in spec["finetune"]
            freeze_vision_I3D = "I3D" not in spec["finetune"]
            freeze_audio_ResNet18 = "ResNet18" not in spec["finetune"]
            l_vision_backbones = ("R2D1", "I3D")
            l_audio_backbones = ("ResNet18", "wavLM")

    state = init_state(model, _FreezeCfg, jax.random.PRNGKey(0), arrays, tx)
    step = make_train_step(model, tx)
    dev = jax.device_put(arrays)
    key = jax.random.PRNGKey(1)

    def one(state):
        state, loss, _, _ = step(state, dev, key)
        return state, loss

    # warmup (compile)
    t0 = time.perf_counter()
    state, loss = one(state)
    float(loss)
    compile_s = time.perf_counter() - t0
    state, loss = one(state)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = one(state)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    out = {
        "variant": variant,
        "train_step_ms": round(dt * 1e3, 2),
        "clips_per_s": round(b * s / dt, 2),
        "compile_s": round(compile_s, 1),
        "trainable_params": param_count(state.trainable),
        "frozen_params": param_count(state.frozen),
        "batch": [b, s],
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    variant = sys.argv[1] if len(sys.argv) > 1 else "frozen"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    main(variant, b=b, iters=iters)
