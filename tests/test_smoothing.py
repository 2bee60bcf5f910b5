"""Smoothing parity vs scipy.ndimage.uniform_filter1d (val.py:359-370)."""
import numpy as np
import pytest

import jax.numpy as jnp

from jmt_tpu.ops.smoothing import uniform_filter1d, clip_and_smooth

scipy_ndimage = pytest.importorskip("scipy.ndimage")


@pytest.mark.parametrize("size", [3, 20, 50])
@pytest.mark.parametrize("n", [1, 19, 100, 4001])
def test_uniform_filter_matches_scipy(size, n):
    rng = np.random.default_rng(0)
    x = rng.normal(size=n).astype(np.float32)
    got = np.asarray(uniform_filter1d(jnp.asarray(x), size))
    want = scipy_ndimage.uniform_filter1d(x.astype(np.float64), size,
                                          mode="constant")
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_clip_and_smooth_pipeline():
    rng = np.random.default_rng(1)
    v = (rng.normal(size=300) * 2).astype(np.float32)
    a = (rng.normal(size=300) * 2).astype(np.float32)
    got_v, got_a = clip_and_smooth(jnp.asarray(v), jnp.asarray(a))
    want_v = scipy_ndimage.uniform_filter1d(np.clip(v, -1, 1).astype(np.float64),
                                            20, mode="constant")
    want_a = scipy_ndimage.uniform_filter1d(np.clip(a, -1, 1).astype(np.float64),
                                            50, mode="constant")
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_a), want_a, atol=2e-5)
