"""AOT topology compile checks for the ZeRO-1 layout contract.

Preferred gate: compile the real multi-chip train step against an
**abstract v5e topology** (``hvt/tools/aot_tpu.py``) — the TPU compiler
runs locally, no hardware needed — so the sharding/collective story is
validated at the actual target's lowering, not just on virtual CPU
devices.

Fallback gate (round-5, VERDICT r4 item 7): libtpu can only serve one
process at a time on this host, so whenever the real chip holds the
lock the topology description raises and the TPU gate would silently
skip — taking the ZeRO layout-contract pins with it. The contract
(out-shardings fixed point + donation aliasing + sharded-update
argument shrink) is a GSPMD property, not a TPU one, so when the TPU
topology is unavailable the SAME assertions run on the 8-virtual-CPU
mesh instead. The chosen gate is printed so a CI log always shows which
lowering proved the contract; only the HBM live-memory regression bound
is TPU-gate-only (it is a claim about HBM temp scheduling).
"""

import jax
import numpy as np
import pytest

from hvt.tools import aot_tpu


@pytest.fixture(scope="module")
def gate():
    """(name, devices) — 'tpu-topology' preferred, 'cpu-mesh' fallback."""
    try:
        return "tpu-topology", aot_tpu.topology_devices("v5e:2x4")
    except Exception as e:  # libtpu busy (real chip holds the lock) / absent
        print(f"\n[aot] TPU topology unavailable ({e!r}); "
              "running ZeRO layout-contract on the CPU mesh instead")
        return "cpu-mesh", np.asarray(jax.devices("cpu")[:8])


def test_zero_layout_contract(gate):
    kind, devices = gate
    print(f"[aot] ZeRO layout-contract gate: {kind}")
    results = {n: o for n, o in aot_tpu.run_layouts(devices, ["dp", "zero"])}
    dp, zero = results["dp"], results["zero"]
    assert dp["first"]["live_mib"] > 0
    # The ZeRO-1 contract: state arguments shrink vs dp...
    assert zero["first"]["argument_bytes"] < dp["first"]["argument_bytes"]
    # ...the update is donated into the state buffers (broken donation was
    # the observable symptom of the round-4 layout drift)...
    assert zero["first"]["alias_bytes"] > 0
    assert zero["steady"]["alias_bytes"] > 0
    # ...and the state layout is a fixed point, asserted BOTH on the
    # shardings themselves and on the memory proxy: the steady-state
    # executable (outputs' shardings fed back as inputs) reproduces its
    # own input layout and memory.
    assert zero["layout_fixed_point"] is True
    assert zero["steady"] == zero["first"]
    if kind == "tpu-topology":
        # HBM-specific: net live memory must not regress vs plain dp
        # (the round-4 sharded-update fix; without it GSPMD gathered
        # mu/nu and temps ballooned). Meaningless on the CPU scheduler.
        assert zero["first"]["live_mib"] <= dp["first"]["live_mib"] * 1.05
