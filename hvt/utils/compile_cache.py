"""Persistent XLA compilation cache.

The reference has no analog (PyTorch eager + cuDNN autotune persist nothing);
under jit every program is compiled by XLA, and on modest hosts a full train
step takes minutes to compile. JAX ships a content-addressed persistent cache
keyed on the HLO + compile options + runtime version; enabling it makes the
second run of every entry point (and every re-run of the test suite or bench)
skip compilation entirely.

Opt-out / redirect via HVT_COMPILE_CACHE:
  unset      -> <repo>/.cache/jax (created on demand)
  "0"/"off"  -> disabled
  a path     -> that directory
"""

from __future__ import annotations

import os
import pathlib


def enable(path: str | None = None) -> str | None:
    """Enable the persistent compilation cache; returns the directory used
    (None when disabled). Safe to call more than once and before or after
    backends initialize — the cache config is not backend state."""
    env = os.environ.get("HVT_COMPILE_CACHE")
    if env is not None and env.lower() in ("0", "off", "false", ""):
        return None
    cache_dir = path or env
    if cache_dir is None:
        cache_dir = str(pathlib.Path(__file__).resolve().parents[2] / ".cache" / "jax")
    try:
        pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every program: the long pole here is many small-to-medium
        # compiles, not one giant one, and the default 1s/small-entry floors
        # would skip most of them.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return cache_dir
