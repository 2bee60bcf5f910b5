"""Data-parallel mesh: sharded train step == single-device numerics.

The TPU-world fake backend (8 virtual CPU devices, conftest.py) — the analog
of the reference's... nothing; it has no multi-device tests because its only
parallelism is nn.DataParallel (SURVEY.md §2.1 Parallelism).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from jmt_tpu.core.config import Config
from jmt_tpu.parallel.mesh import make_mesh, shard_batch, pad_batch_to
from jmt_tpu.train import optim as O
from jmt_tpu.train.loops import make_train_step, make_eval_step, init_state


def tiny_cfg():
    return Config.from_dict({
        "train_params": {}, "val_params": {}, "test_params": {},
        "model_params": {
            "l_vision_backbones": "R2D1",
            "l_audio_backbones": "ResNet18",
            "joint_modalities": "TRANSFORMER",
            "output_format": "SELF_ATTEN",
            "compute_dtype": "float32",
        },
    })


def tiny_arrays(b=8, s=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "clips": rng.integers(0, 255, size=(b, s, 8, 32, 32, 3),
                              dtype=np.uint8),
        "audio": (rng.normal(size=(b, s, 45599)) * 0.1).astype(np.float32),
        "labels_v": rng.uniform(-1, 1, size=(b, s)).astype(np.float32),
        "labels_a": rng.uniform(-1, 1, size=(b, s)).astype(np.float32),
    }


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    assert len(jax.devices()) >= 8
    from jmt_tpu.models.jmt_model import model_from_config
    cfg = tiny_cfg()
    model = model_from_config(cfg)
    tx = O.build_optimizer(cfg.model_params.opt)
    arrays = tiny_arrays()
    state = init_state(model, cfg, jax.random.PRNGKey(0), arrays, tx)
    step = make_train_step(model, tx)
    key = jax.random.PRNGKey(1)

    # single device (no explicit sharding)
    s1, l1, v1, a1 = step(jax.tree.map(jnp.array, state),
                          jax.tree.map(jnp.array, arrays), key)

    # 8-way data parallel
    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    st = jax.device_put(state, repl)
    arr = shard_batch(mesh, arrays)
    s8, l8, v8, a8 = step(st, arr, key)

    assert float(l1) == pytest.approx(float(l8), abs=2e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v8), atol=2e-4)
    # updated params identical across paths (grad all-reduce correctness)
    for x, y in zip(jax.tree.leaves(s1.trainable),
                    jax.tree.leaves(s8.trainable)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4)


@pytest.mark.slow
def test_sharded_eval_step_runs():
    from jmt_tpu.models.jmt_model import model_from_config
    cfg = tiny_cfg()
    model = model_from_config(cfg)
    tx = O.build_optimizer(cfg.model_params.opt)
    arrays = tiny_arrays(b=8)
    state = init_state(model, cfg, jax.random.PRNGKey(0), arrays, tx)
    mesh = make_mesh(8)
    st = jax.device_put(state, NamedSharding(mesh, P()))
    arr = shard_batch(mesh, arrays)
    ev = make_eval_step(model)
    v, a = ev(st, arr)
    assert v.shape == (8, 2)
    assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_runner_fit_mesh8_matches_mesh1(tmp_path):
    """The PRODUCTION Runner path on the 8-device mesh == single device:
    same config/seed, mesh_data_parallel 1 vs 8, identical final trainable
    params and train CCC (VERDICT item 2 done-criterion). Uses a ragged
    final batch so pad+row-weight masking is exercised ON the mesh."""
    from jmt_tpu.data.synthetic import synthetic_dataset
    from jmt_tpu.train.runner import Runner

    def run(mesh_n, tag):
        cfg = Config.from_dict({
            "exp_id": tag, "outd": str(tmp_path / tag),
            "mesh_data_parallel": mesh_n,
            "train_params": {"loader_params": {"batch_size": 8,
                                               "shuffle": True}},
            "val_params": {"loader_params": {"batch_size": 8}},
            "test_params": {},
            "model_params": {
                "l_vision_backbones": "R2D1",
                "l_audio_backbones": "ResNet18",
                "joint_modalities": "TRANSFORMER",
                "output_format": "SELF_ATTEN",
                "compute_dtype": "float32",
                "max_epochs": 1,
            },
            "SEED": 3,
        })
        # 5 train windows -> one full batch of 8? no: 5 -> ONE ragged batch
        # (padded 5->8); 1 val video -> ragged eval batch too
        train = synthetic_dataset("train", n_videos=5, length=481,
                                  stride=481, img_size=32,
                                  check_coverage=False)
        val = synthetic_dataset("val", n_videos=1, length=481, stride=481,
                                img_size=32, check_coverage=False)
        r = Runner(cfg, train, val)
        perfs = r.fit()
        return r, perfs

    r1, p1 = run(1, "m1")
    r8, p8 = run(8, "m8")
    assert r8.mesh.size == 8
    for a, b in zip(jax.tree.leaves(r1.state.trainable),
                    jax.tree.leaves(r8.state.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
    assert p1["best"]["valid_v"] == pytest.approx(p8["best"]["valid_v"],
                                                  abs=2e-4)
    assert p1["best"]["valid_a"] == pytest.approx(p8["best"]["valid_a"],
                                                  abs=2e-4)


def test_pad_batch_to():
    arrays = tiny_arrays(b=3)
    padded, n_real = pad_batch_to(arrays, 8)
    assert n_real == 3
    assert padded["clips"].shape[0] == 8
    assert not padded["clips"][3:].any()
    np.testing.assert_array_equal(padded["audio"][:3], arrays["audio"])


def test_graft_entry_single_chip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    v, a = out
    assert v.shape == (1, 4)
    assert np.isfinite(np.asarray(v, dtype=np.float32)).all()


def test_hybrid_mesh_shapes_and_sharding():
    """make_mesh(n_dcn=2): (dcn, data) grid, batch sharded over both axes,
    replicated spec unchanged."""
    from jmt_tpu.parallel.mesh import batch_sharding, replicated_sharding
    mesh = make_mesh(4, n_dcn=2)
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.devices.shape == (2, 4)
    sh = batch_sharding(mesh)
    assert sh.spec == P(("dcn", "data"))
    assert replicated_sharding(mesh).spec == P()
    # n_data=-1 divides the device pool across slices
    mesh2 = make_mesh(-1, n_dcn=2)
    assert mesh2.devices.shape == (2, len(jax.devices()) // 2)


@pytest.mark.slow
def test_hybrid_dcn_mesh_matches_single_device():
    """2-slice x 4-device hybrid mesh (batch sharded over dcn AND data,
    hierarchical gradient all-reduce) == single-device numerics."""
    from jmt_tpu.models.jmt_model import model_from_config
    cfg = tiny_cfg()
    model = model_from_config(cfg)
    tx = O.build_optimizer(cfg.model_params.opt)
    arrays = tiny_arrays()
    state = init_state(model, cfg, jax.random.PRNGKey(0), arrays, tx)
    step = make_train_step(model, tx)
    key = jax.random.PRNGKey(1)

    s1, l1, v1, a1 = step(jax.tree.map(jnp.array, state),
                          jax.tree.map(jnp.array, arrays), key)

    mesh = make_mesh(4, n_dcn=2)
    st = jax.device_put(state, NamedSharding(mesh, P()))
    arr = shard_batch(mesh, arrays)
    s8, l8, v8, a8 = step(st, arr, key)

    assert float(l1) == pytest.approx(float(l8), abs=2e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v8), atol=2e-4)
    for x, y in zip(jax.tree.leaves(s1.trainable),
                    jax.tree.leaves(s8.trainable)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4)
