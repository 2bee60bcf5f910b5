"""Persistent XLA compilation cache wiring.

The reference has nothing like this (torch eager + cuDNN autotune hide
compile latency); on TPU the cost model is inverted — every jitted graph
is XLA-compiled once (minutes for the big train steps), so production
restarts, preemption recovery, and serving cold-starts are dominated by
recompilation. JAX ships a content-addressed persistent cache; this
module is the one place that turns it on so every entry point (CLI,
bench, serve, wavlm_extract) behaves the same.

Enable via ``Config.compilation_cache_dir`` or the
``JMT_COMPILATION_CACHE_DIR`` environment variable (config wins).
"""
from __future__ import annotations

import os
from typing import Optional

ENV_VAR = "JMT_COMPILATION_CACHE_DIR"
_enabled_dir: Optional[str] = None


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path``.

    ``path=None`` falls back to ``$JMT_COMPILATION_CACHE_DIR``; if that
    is unset too, this is a no-op returning None. Idempotent; returns
    the active cache dir. Must run before the first jit compilation to
    cover it (later calls still cover subsequent compiles).
    """
    global _enabled_dir
    path = path or os.environ.get(ENV_VAR)
    if not path:
        return None
    path = os.path.abspath(os.path.expanduser(path))
    if _enabled_dir == path:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: the workload's graphs are few and large, so
        # the default min-compile-time/min-size heuristics only lose hits
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except OSError as e:
        # a broken cache dir (read-only fs, quota) must never take down
        # an entry point — run uncached instead
        import warnings
        warnings.warn(f"compilation cache disabled ({path}: {e})",
                      RuntimeWarning)
        return None
    _enabled_dir = path
    return path
