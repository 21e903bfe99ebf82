"""Hot compute ops: jnp reference implementations + Pallas TPU kernels.

Kernel dispatch is normally decided by the *process* backend (real Mosaic
lowering on TPU, jnp reference / interpret mode elsewhere, so the CPU test
suite runs everywhere). ``force_tpu_lowering`` overrides that for
cross-platform **lowering** contexts — e.g. ``jax.export`` producing a
native TPU artifact from a CPU host: export is lowering, not execution,
and Mosaic lowering does not need a TPU present.
"""

import contextlib

_FORCE_TPU_LOWERING = False


def tpu_lowering_forced() -> bool:
    """True inside a ``force_tpu_lowering()`` block: dispatch sites must
    emit real Mosaic kernels even though the process backend is not TPU."""
    return _FORCE_TPU_LOWERING


@contextlib.contextmanager
def force_tpu_lowering():
    """Treat the trace as TPU-targeted regardless of the process backend."""
    global _FORCE_TPU_LOWERING
    prev = _FORCE_TPU_LOWERING
    _FORCE_TPU_LOWERING = True
    try:
        yield
    finally:
        _FORCE_TPU_LOWERING = prev
