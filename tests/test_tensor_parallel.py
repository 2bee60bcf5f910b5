"""Tensor-parallel serving shardings: sharded == unsharded numerics.

parallel/tp.py shards the channel axes of the param tree over a
``model`` mesh and relies on XLA GSPMD propagation — semantics must be
preserved up to float reassociation. Runs the real flagship graph
(R2D1 vision + ResNet18/wavLM audio + intra-modal + JMT fusion) on the
fake 8-device CPU mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jmt_tpu.models.jmt_model import JMTModel
from jmt_tpu.parallel.tp import (make_model_mesh, tp_shardings,
                                 shard_params, replicate)
from jmt_tpu.train.loops import _preprocess


def _model_and_batch():
    model = JMTModel(
        vision_backbones=("R2D1",),
        audio_backbones=("ResNet18", "wavLM"),
        intra_modal_fusion="encoder_plus_self_attention",
        joint_modalities="TRANSFORMER", output_format="SELF_ATTEN",
        num_heads=1, num_layers=1, dtype=None)  # f32 for exactness
    rng = np.random.default_rng(0)
    arrays = {
        "clips": rng.integers(0, 255, size=(1, 2, 8, 32, 32, 3),
                              dtype=np.uint8),
        "audio": (0.1 * rng.normal(size=(1, 2, 45599))).astype(np.float32),
        "wavlm": rng.normal(size=(1, 2, 768)).astype(np.float32),
    }
    spec, clips = _preprocess(model, arrays, None, augment=False)
    variables = model.init(jax.random.PRNGKey(0), spec, clips,
                           arrays["wavlm"])
    return model, variables, arrays


def test_tp_spec_rules():
    mesh = make_model_mesh(2)
    params = {
        "conv": {"kernel": np.zeros((3, 3, 3, 64, 512)),
                 "bn": {"scale": np.zeros(512), "bias": np.zeros(512)}},
        "head": {"kernel": np.zeros((128, 2)), "bias": np.zeros(2)},
        "odd": {"kernel": np.zeros((16, 129))},
    }
    sh = tp_shardings(params, mesh)
    assert sh["conv"]["kernel"].spec == (None, None, None, None, "model")
    assert sh["conv"]["bn"]["scale"].spec == ("model",)
    assert sh["head"]["kernel"].spec == ()      # small head: replicated
    assert sh["head"]["bias"].spec == ()
    assert sh["odd"]["kernel"].spec == ()       # 129 % 2 != 0


@pytest.mark.slow
def test_tp_flagship_matches_single_device():
    model, variables, arrays = _model_and_batch()

    def fwd(variables, arrays):
        spec, clips = _preprocess(model, arrays, None, augment=False)
        return model.apply(variables, spec, clips, arrays["wavlm"],
                           train=False)

    v_ref, a_ref = jax.jit(fwd)(variables, arrays)

    mesh = make_model_mesh(4)
    vs = {"params": shard_params(variables["params"], mesh),
          "batch_stats": shard_params(variables["batch_stats"], mesh)}
    # at least one big kernel must actually be sharded (not a no-op test)
    shards = jax.tree.leaves(jax.tree.map(
        lambda x: len(x.sharding.device_set), vs["params"]))
    assert max(shards) == 4
    v_tp, a_tp = jax.jit(fwd)(vs, replicate(arrays, mesh))

    np.testing.assert_allclose(np.asarray(v_tp), np.asarray(v_ref),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a_tp), np.asarray(a_ref),
                               rtol=0, atol=2e-5)


@pytest.mark.slow
def test_tp_inference_server_matches_plain():
    """serve.InferenceServer(model_mesh=...) — AOT-compiled TP buckets
    produce the same predictions as the single-device server."""
    from jmt_tpu.serve import InferenceServer

    model, variables, arrays = _model_and_batch()
    kw = dict(seq=2, buckets=(1,), img_size=32)
    plain = InferenceServer(model, variables["params"],
                            variables["batch_stats"], **kw)
    tp = InferenceServer(model, variables["params"],
                         variables["batch_stats"],
                         model_mesh=make_model_mesh(4), **kw)
    v0, a0 = plain.predict(arrays["clips"], arrays["audio"],
                           arrays["wavlm"])
    v1, a1 = tp.predict(arrays["clips"], arrays["audio"], arrays["wavlm"])
    np.testing.assert_allclose(v1, v0, rtol=0, atol=2e-5)
    np.testing.assert_allclose(a1, a0, rtol=0, atol=2e-5)
