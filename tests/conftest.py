"""Test config: force CPU JAX with a virtual 8-device mesh.

The TPU-world analog of a fake backend (SURVEY.md §4 plan item 5): multi-chip
sharding tests run against --xla_force_host_platform_device_count=8.
Must run before anything imports jax.
"""
import os

# hard override: the environment presets JAX_PLATFORMS=axon (real TPU tunnel);
# tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
