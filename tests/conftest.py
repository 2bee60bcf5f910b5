"""Test config: force CPU JAX with a virtual 8-device mesh.

The TPU-world analog of a fake backend (SURVEY.md §4 plan item 5): multi-chip
sharding tests run against --xla_force_host_platform_device_count=8.
Must run before anything imports jax.
"""
import os

# hard override: the environment presets JAX_PLATFORMS=axon (real TPU tunnel)
# AND a sitecustomize.py registers the axon backend at interpreter startup,
# which locks in the platform before any env mutation here. The only reliable
# in-process override is jax.config.update.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
