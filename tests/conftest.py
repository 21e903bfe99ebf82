"""Test harness: force an 8-device virtual CPU platform before JAX loads.

Exercises the mesh/pjit path without a TPU (SURVEY.md §4). Must run before
any `import jax` in the test session, hence module-level in conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
