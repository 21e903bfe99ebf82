"""CI coverage for the driver gate `__graft_entry__.py`.

Round 3 ended with the driver's multi-chip gate red because the gate file
was edited (an all-MoE dryrun config left zero `mlp/fc1` params, so its own
TP assertion tripped on an empty set) and never re-executed — nothing in the
suite ran it. These tests make that impossible: the exact functions the
driver calls (`entry`, `dryrun_multichip`) run inside CI, so the gate can
never again be edited without being executed.

Covers the gate's own contract (__graft_entry__.py:6-41); reference analog:
the composer launcher's smoke invocation (reference slurm/train.bash:14-16).
"""

import jax
import pytest

import __graft_entry__ as graft


def test_entry_traces():
    """entry() returns (fn, args) that trace: the driver compile-checks this
    single-chip. A full ResNet-50 224px compile is minutes on this 1-core
    host, so CI asserts traceability (eval_shape runs the whole jaxpr
    machinery — config/model/prep wiring errors all surface) and leaves the
    XLA compile to the driver's real-chip check."""
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    leaves = jax.tree.leaves(out)
    assert leaves, "entry() forward produced no outputs"
    assert all(leaf.shape[0] == 8 for leaf in leaves)


@pytest.mark.slow
def test_dryrun_multichip_two_devices():
    """The driver's multi-chip correctness gate, run in-suite on a 2-device
    mesh: every layout it exercises (multitask+ZeRO, SwinV2 DP×TP with
    dense fc1→TP AND MoE w1/w2→EP in the same state, DP×spatial,
    DP×pipe) must compile and execute. Raises (assertion or exception) on
    any regression — exactly what the driver checks with n=8."""
    graft.dryrun_multichip(2)
