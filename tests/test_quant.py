"""int8 quantized inference (ops/quant.py).

Unit accuracy bounds for the quantizers, the trace-time context routing,
and end-to-end closeness of the int8 eval step to the f32 one. The
throughput claim is measured on the chip by bench.py --int8 (STATUS.md);
these tests pin CORRECTNESS on the CPU backend (same XLA semantics:
s8 x s8 -> s32 conv, dequant by s_x * s_w[c]).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jmt_tpu.ops import quant
from jmt_tpu.ops.conv import conv_nd


def test_weight_quantization_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, 32, 16)).astype(np.float32))
    q, s = quant.quantize_weight_per_channel(w)
    assert q.dtype == jnp.int8 and s.shape == (16,)
    back = np.asarray(q, np.float32) * np.asarray(s)
    # symmetric quantization error <= scale/2 = max|w_c| / 254 per channel
    err = np.abs(back - np.asarray(w))
    bound = np.asarray(s) / 2 + 1e-7
    assert (err <= bound).all()


def test_int8_conv_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 32, 64)).astype(np.float32) / 10)
    ref = conv_nd(x, w, strides=(1, 1), padding="SAME")
    with quant.int8_inference():
        got = conv_nd(x, w, strides=(1, 1), padding="SAME")
    assert got.dtype == ref.dtype
    rel = (np.linalg.norm(np.asarray(got - ref))
           / np.linalg.norm(np.asarray(ref)))
    assert rel < 0.02, rel  # ~1% expected from 8-bit activations+weights


def test_context_is_trace_time_and_restores():
    x = jnp.ones((1, 8, 8, 32), jnp.float32)
    w = jnp.ones((3, 3, 32, 8), jnp.float32)
    assert not quant.quant_enabled()
    with quant.int8_inference():
        assert quant.quant_enabled()
        with quant.int8_inference(False):
            assert not quant.quant_enabled()
        assert quant.quant_enabled()
    assert not quant.quant_enabled()
    # jit traced INSIDE the context keeps the int8 lowering when called
    # outside it (the flag is consumed at trace time)
    @jax.jit
    def f(x, w):
        with quant.int8_inference():
            return conv_nd(x, w, strides=(1, 1), padding="SAME")
    y = f(x, w)  # all-ones input: q/deq is exact, conv of ones = 9*32
    np.testing.assert_allclose(np.asarray(y)[0, 2, 2], 9 * 32, rtol=1e-5)


def test_small_contraction_stays_unquantized():
    # Cin=3 stem-like conv: below _MIN_CONTRACTION, must be exact f32
    x = jnp.asarray(np.random.default_rng(2)
                    .normal(size=(1, 8, 8, 3)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(3)
                    .normal(size=(3, 3, 3, 8)).astype(np.float32))
    ref = conv_nd(x, w, strides=(1, 1), padding="SAME")
    with quant.int8_inference():
        got = conv_nd(x, w, strides=(1, 1), padding="SAME")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_calibration_records_eligible_convs_only_and_is_exact():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 32)).astype(np.float32))
    w_big = jnp.asarray(rng.normal(size=(3, 3, 32, 8)).astype(np.float32))
    x3 = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    w_small = jnp.asarray(rng.normal(size=(3, 3, 3, 8)).astype(np.float32))
    ref_big = conv_nd(x, w_big, strides=(1, 1), padding="SAME")
    coll = []
    with quant.int8_calibration(coll):
        got_big = conv_nd(x, w_big, strides=(1, 1), padding="SAME")
        conv_nd(x3, w_small, strides=(1, 1), padding="SAME")
    # only the eligible conv recorded; calibration forward is EXACT
    assert len(coll) == 1
    np.testing.assert_array_equal(np.asarray(got_big), np.asarray(ref_big))
    np.testing.assert_allclose(float(coll[0]),
                               float(jnp.max(jnp.abs(x))), rtol=1e-6)


def test_static_scales_match_dynamic_on_calibration_batch():
    """margin=1 static scales == the dynamic per-call scale on the same
    input, so the two modes must agree BITWISE there."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 32, 16)).astype(np.float32))
    coll = []
    with quant.int8_calibration(coll):
        conv_nd(x, w, strides=(1, 1), padding="SAME")
    scales = quant.act_scales_from_maxes(np.asarray(coll))
    with quant.int8_inference():
        dyn = conv_nd(x, w, strides=(1, 1), padding="SAME")
    with quant.int8_inference(act_scales=scales):
        stat = conv_nd(x, w, strides=(1, 1), padding="SAME")
    np.testing.assert_array_equal(np.asarray(stat), np.asarray(dyn))


def test_static_scales_exhaustion_raises():
    x = jnp.ones((1, 8, 8, 32), jnp.float32)
    w = jnp.ones((3, 3, 32, 8), jnp.float32)
    with quant.int8_inference(act_scales=[0.5]):
        conv_nd(x, w, strides=(1, 1), padding="SAME")
        with pytest.raises(RuntimeError, match="exhausted"):
            conv_nd(x, w, strides=(1, 1), padding="SAME")


@pytest.mark.slow
def test_int8_eval_step_close_to_f32(tmp_path):
    """Full flagship-shaped eval step, int8 vs f32: V/A outputs stay close
    (the honest accuracy number for the chip bench's int8 leg)."""
    from jmt_tpu.core.config import Config
    from jmt_tpu.data.synthetic import synthetic_dataset
    from jmt_tpu.train.runner import Runner
    from jmt_tpu.train.loops import make_eval_step
    from jmt_tpu.data.loader import PrefetchLoader

    cfg = Config.from_dict({
        "exp_id": "q8", "outd": str(tmp_path / "exps"),
        "train_params": {"loader_params": {"batch_size": 2}},
        "val_params": {"loader_params": {"batch_size": 2}},
        "model_params": {
            "l_vision_backbones": "R2D1", "l_audio_backbones": "ResNet18",
            "joint_modalities": "TRANSFORMER", "output_format": "SELF_ATTEN",
            "num_heads": 1, "num_layers": 1, "max_epochs": 1,
            "compute_dtype": "float32"},
        "SEED": 0, "mesh_data_parallel": 1,
    })
    train = synthetic_dataset("train", n_videos=2, length=481, img_size=48)
    r = Runner(cfg, train, train)
    r.initialize()
    batch = next(iter(PrefetchLoader(train, 2, shuffle=False)))
    arrays, _ = r._device_arrays(batch, 2)
    v0, a0 = r.eval_step(r.state, arrays)
    q_step = make_eval_step(r.model, int8=True)
    v1, a1 = q_step(r.state, arrays)
    v0f, a0f, v1, a1 = (np.asarray(t).reshape(-1) for t in (v0, a0, v1, a1))
    # outputs live in ~[-1, 1]; int8 backbone drift must stay within the
    # bound bench.py's int8 leg reports (the shared constant)
    bound = quant.FLAGSHIP_VA_ABS_BOUND
    assert np.max(np.abs(v1 - v0f)) < bound, np.max(np.abs(v1 - v0f))
    assert np.max(np.abs(a1 - a0f)) < bound, np.max(np.abs(a1 - a0f))

    # static calibrated scales (the fast int8 mode, bench default):
    # calibrate on THIS batch, evaluate on a PERTURBED one — values past a
    # calibrated range clip, and the drift must still hold the same bound
    from jmt_tpu.train.loops import make_calibration_step
    maxes = np.asarray(make_calibration_step(r.model)(r.state, arrays))
    assert maxes.size > 0 and (maxes > 0).all()
    scales = quant.act_scales_from_maxes(maxes)
    arrays2 = dict(arrays)
    arrays2["clips"] = np.roll(np.asarray(arrays["clips"]), 3, axis=3)
    arrays2["audio"] = np.asarray(arrays["audio"]) * 1.2
    vr, ar = r.eval_step(r.state, arrays2)
    s_step = make_eval_step(r.model, int8=True, act_scales=scales)
    vs, as_ = s_step(r.state, arrays2)
    vr, ar, vs, as_ = (np.asarray(t).reshape(-1) for t in (vr, ar, vs, as_))
    assert np.max(np.abs(vs - vr)) < bound, np.max(np.abs(vs - vr))
    assert np.max(np.abs(as_ - ar)) < bound, np.max(np.abs(as_ - ar))


def test_server_static_int8_requires_scales():
    from jmt_tpu.serve import InferenceServer
    with pytest.raises(ValueError, match="int8_scales"):
        InferenceServer(object(), {}, {}, int8="static")


@pytest.mark.slow
def test_server_calibrate_switches_to_static(tmp_path):
    """InferenceServer.calibrate: measures scales on a request, recompiles
    static; a server CONSTRUCTED with the persisted scales must reproduce
    the calibrated server's predictions exactly, and both must stay within
    the shared drift bound of the unquantized server."""
    import jax
    import jax.numpy as jnp
    from jmt_tpu.serve import InferenceServer
    from jmt_tpu.models.jmt_model import JMTModel
    from jmt_tpu.train.loops import _preprocess

    model = JMTModel(vision_backbones=("R2D1",),
                     audio_backbones=("ResNet18",),
                     intra_modal_fusion="None",
                     joint_modalities="TRANSFORMER",
                     output_format="SELF_ATTEN",
                     num_heads=1, num_layers=1, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, (1, 2, 8, 16, 16, 3), dtype=np.uint8)
    audio = (rng.normal(size=(1, 2, 4096)) * .1).astype(np.float32)
    arrays = {"clips": clips, "audio": audio}
    spec, c = _preprocess(model, arrays, None, augment=False)
    variables = model.init(jax.random.PRNGKey(0), spec, c, None)
    kw = dict(seq=2, buckets=(1,), img_size=16, audio_samples=4096)
    ref = InferenceServer(model, variables["params"],
                          variables["batch_stats"], **kw)
    v0, a0 = ref.predict(clips, audio)

    srv = InferenceServer(model, variables["params"],
                          variables["batch_stats"], int8=True, **kw)
    scales = srv.calibrate(clips, audio)
    assert srv.int8 == "static" and len(scales) > 0
    v1, a1 = srv.predict(clips, audio)
    bound = quant.FLAGSHIP_VA_ABS_BOUND
    assert np.max(np.abs(v1 - v0)) < bound
    assert np.max(np.abs(a1 - a0)) < bound

    srv2 = InferenceServer(model, variables["params"],
                           variables["batch_stats"], int8="static",
                           int8_scales=scales, **kw)
    v2, a2 = srv2.predict(clips, audio)
    np.testing.assert_array_equal(v2, v1)
    np.testing.assert_array_equal(a2, a1)
