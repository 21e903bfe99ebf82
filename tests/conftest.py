"""Test harness: force an 8-device virtual CPU platform before JAX loads.

Exercises the mesh/pjit path without a TPU (SURVEY.md §4). Must run before
any `import jax` in the test session, hence module-level in conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers a TPU platform and resets
# jax_platforms to "axon,cpu" — pin the cpu backend back for tests, so
# parity tests get exact f32 (the TPU would do bf16 MXU passes).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's dominant cost on this 1-core
# host is XLA compiles; re-runs hit the cache and skip them.
from hvt.utils import compile_cache  # noqa: E402

compile_cache.enable()

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolate_kernel_mesh():
    """The kernel mesh (hvt.parallel.set_kernel_mesh) is process-global
    state set by Trainers and benches; clear it around every test so a
    Trainer test can't leak a stale mesh into a direct kernel test."""
    from hvt import parallel

    parallel.set_kernel_mesh(None)
    yield
    parallel.set_kernel_mesh(None)
