"""Jitted train/eval steps + epoch runners.

Replaces the reference's hot path (train.py:91-333): instead of a Python
loop over batch items with AMP autocast and in-loop disk reads, ONE jitted
step consumes raw uint8 clips + raw audio and runs the entire pipeline on
device — color augmentation, log-mel front-end, all backbones over the
flattened (B*S) clip batch, intra/inter-modal fusion, CCC loss, and the
optimizer update. bf16 matmuls replace torch.cuda.amp (no loss scaling
needed on TPU). Batches are sharded over the mesh's data axis; XLA inserts
the gradient all-reduce.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from jmt_tpu.ops.ccc import ccc_loss
from jmt_tpu.ops.mel import log_mel
from jmt_tpu.data.transforms import preprocess_clips, sample_color_factors
from jmt_tpu.train.state import TrainState, merge_params


def device_batch(batch) -> Dict[str, Any]:
    """Host Batch -> dict of arrays for the jitted steps."""
    out = {
        "clips": batch.clips,           # uint8 (B,S,8,112,112,3)
        "audio": batch.audio,           # f32 (B,S,45599)
        "labels_v": batch.labels_v,
        "labels_a": batch.labels_a,
    }
    if batch.wavlm is not None:
        out["wavlm"] = batch.wavlm
    return out


def _preprocess(model, arrays: Dict[str, Any], key: Optional[jax.Array],
                augment: bool, more_vision_augm: bool = False,
                more_audio_augm: bool = False):
    """Device-side preprocessing shared by train/eval steps.

    more_*_augm: the reference's optional heavy augmentation paths
    (use_more_vision_data_augm / use_more_audio_data_augm) — static flags,
    train only.
    """
    clips = None
    spec = None
    # backbones cast to the compute dtype anyway; emitting bf16 from the
    # preprocessing halves HBM traffic into the conv stacks
    out_dtype = model.dtype or jnp.float32
    if key is not None:
        kv, ka, kc = jax.random.split(key, 3)
    if len(model.vision_backbones) > 0:
        c = arrays["clips"]
        b, s = c.shape[:2]
        flat = c.reshape(b * s, *c.shape[2:])
        if augment and more_vision_augm:
            from jmt_tpu.data.transforms import more_vision_augment
            flat = more_vision_augment(flat, kv)
        elif augment:
            bf, cf = sample_color_factors(kc, b * s)
            flat = preprocess_clips(flat, bf, cf, augment=True)
        else:
            flat = preprocess_clips(flat)
        clips = flat.astype(out_dtype).reshape(b, s, *flat.shape[1:])
    if "ResNet18" in model.audio_backbones:
        if augment and more_audio_augm:
            from jmt_tpu.ops.audio_augment import more_audio_augment
            a = arrays["audio"]
            b, s = a.shape[:2]
            mel = more_audio_augment(a.reshape(b * s, -1), ka)
            mel = mel.reshape(b, s, *mel.shape[1:])
        else:
            mel = log_mel(arrays["audio"], batch_dims=2)  # (B,S,64,T)
        spec = mel.astype(out_dtype)[..., None]  # (B,S,64,T,1)
    return spec, clips


def compiler_options_from_cfg(cfg) -> Optional[Dict[str, str]]:
    """XLA compiler-option overrides for the jitted steps.

    cfg.xla_scoped_vmem_kib > 0 raises XLA's scoped-VMEM fusion budget
    (--xla_tpu_scoped_vmem_limit_kib; Mosaic/XLA default 16 MB on v5e
    with 128 MB physical VMEM) — sweepable on-chip via
    tools/vmem_sweep.py before changing the default."""
    kib = getattr(cfg, "xla_scoped_vmem_kib", 0)
    if kib:
        return {"xla_tpu_scoped_vmem_limit_kib": str(int(kib))}
    return None


def make_train_step(model, tx, more_vision_augm: bool = False,
                    more_audio_augm: bool = False,
                    compiler_options: Optional[Dict[str, str]] = None
                    ) -> Callable:
    """Returns jitted train_step(state, arrays, key) ->
    (state, loss, vouts, aouts)."""

    @functools.partial(jax.jit, donate_argnums=(0,),
                       compiler_options=compiler_options)
    def train_step(state: TrainState, arrays: Dict[str, Any],
                   key: jax.Array):
        pre_key, drop_key = jax.random.split(key)
        spec, clips = _preprocess(model, arrays, pre_key, augment=True,
                                  more_vision_augm=more_vision_augm,
                                  more_audio_augm=more_audio_augm)
        wavlm = arrays.get("wavlm")

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            (vouts, aouts), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                spec, clips, wavlm, train=True,
                rngs={"dropout": drop_key}, mutable=["batch_stats"])
            # flatten exactly like train.py:303-311 (quirk-compatible).
            # row_weight (B,) masks static-batch PADDING rows out of the
            # gradient (replaces the reference's drop_last=True, main.py:655)
            rw = arrays.get("row_weight")
            w = (None if rw is None else
                 jnp.broadcast_to(rw[:, None].astype(vouts.dtype),
                                  vouts.shape).reshape(-1))
            v_loss = ccc_loss(vouts.reshape(-1),
                              arrays["labels_v"].reshape(-1), weight=w)
            a_loss = ccc_loss(aouts.reshape(-1),
                              arrays["labels_a"].reshape(-1), weight=w)
            return v_loss + a_loss, (vouts, aouts,
                                     updates.get("batch_stats",
                                                 state.batch_stats))

        (loss, (vouts, aouts, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(trainable=trainable, frozen=state.frozen,
                               batch_stats=new_bs, opt_state=opt_state,
                               epoch=state.epoch)
        return new_state, loss, vouts, aouts

    return train_step


def make_calibration_step(model,
                          compiler_options: Optional[Dict[str, str]] = None
                          ) -> Callable:
    """Jitted calib_step(state, arrays) -> per-eligible-conv activation
    absmax (f32 vector, trace order) for the eval forward. Feed the result
    to ``quant.act_scales_from_maxes`` and pass those scales to
    ``make_eval_step(int8=True, act_scales=...)`` — static scales let the
    quantize fuse into the producing op (measured +20% over bf16 on v5e
    where dynamic per-call scales were neutral; bench.py int8 leg)."""
    from jmt_tpu.ops import quant

    @functools.partial(jax.jit, compiler_options=compiler_options)
    def calib_step(state: TrainState, arrays: Dict[str, Any]):
        coll: list = []
        with quant.int8_calibration(coll):
            spec, clips = _preprocess(model, arrays, None, augment=False)
            params = merge_params(state.trainable, state.frozen)
            model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                spec, clips, arrays.get("wavlm"), train=False)
        return jnp.stack(coll) if coll else jnp.zeros((0,), jnp.float32)

    return calib_step


def make_eval_step(model,
                   compiler_options: Optional[Dict[str, str]] = None,
                   int8: bool = False, act_scales=None) -> Callable:
    """Returns jitted eval_step(state, arrays) -> (vouts, aouts).

    int8=True routes every eligible backbone conv through the s8xs8->s32
    MXU path (ops/quant.py int8_inference — the context is active while
    jit TRACES the body, which is exactly when conv_nd consults it).
    act_scales: static per-conv activation scales (make_calibration_step +
    quant.act_scales_from_maxes) — the fast int8 mode. Inference only;
    training is never quantized."""
    from jmt_tpu.ops import quant

    @functools.partial(jax.jit, compiler_options=compiler_options)
    def eval_step(state: TrainState, arrays: Dict[str, Any]):
        with quant.int8_inference(int8, act_scales=act_scales):
            spec, clips = _preprocess(model, arrays, None, augment=False)
            params = merge_params(state.trainable, state.frozen)
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                spec, clips, arrays.get("wavlm"), train=False)

    return eval_step


def init_state(model, cfg, rng: jax.Array, sample_arrays: Dict[str, Any],
               tx, variables_hook: Optional[Callable] = None) -> TrainState:
    """Initialize params/batch_stats from a sample batch and build the
    trainable/frozen partition per the config's freeze policy.

    variables_hook(params, batch_stats) -> (params, batch_stats) runs
    BEFORE partitioning/optimizer init — the pretrained-graft point
    (models.pretrained; reference main.py:218-302)."""
    from jmt_tpu.train.state import frozen_prefixes, partition_params

    spec, clips = _preprocess(model, sample_arrays, None, augment=False)
    variables = model.init(rng, spec, clips, sample_arrays.get("wavlm"))
    from flax.core import unfreeze
    params = jax.tree.map(np.asarray, unfreeze(variables["params"]))
    batch_stats = jax.tree.map(
        np.asarray, unfreeze(variables.get("batch_stats", {})))
    if variables_hook is not None:
        params, batch_stats = variables_hook(params, batch_stats)
    trainable, frz = partition_params(params, frozen_prefixes(cfg))
    opt_state = tx.init(trainable)
    return TrainState(trainable=trainable, frozen=frz,
                      batch_stats=batch_stats, opt_state=opt_state, epoch=0)


def batches_from_dataset(dataset, batch_size: int, shuffle: bool,
                         rng: Optional[np.random.Generator] = None,
                         drop_last: bool = False,
                         wavlm_store=None):
    """Minimal host batcher over a WindowedDataset (collate + optional
    wavLM feature join)."""
    from jmt_tpu.data.datasets import collate

    order = np.arange(len(dataset))
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    for i in range(0, len(order), batch_size):
        idx = order[i:i + batch_size]
        if drop_last and len(idx) < batch_size:
            return
        batch = collate([dataset[int(j)] for j in idx])
        if wavlm_store is not None:
            batch.wavlm = wavlm_store.lookup_batch(batch.wav_paths)
        yield batch
