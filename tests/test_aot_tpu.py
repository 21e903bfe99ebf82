"""AOT TPU topology compile checks (hvt/tools/aot_tpu.py).

These compile the real multi-chip train step against an **abstract v5e
topology** — the TPU compiler runs locally, no hardware needed — so the
sharding/collective story is validated at the actual target's lowering,
not just on virtual CPU devices. Slow-ish (libtpu compiles on one host
core) but the only CI check that exercises TPU lowering of the mesh
layouts.
"""

import pytest

from hvt.tools import aot_tpu


@pytest.fixture(scope="module")
def devices():
    try:
        return aot_tpu.topology_devices("v5e:2x4")
    except Exception as e:  # pragma: no cover - environment without libtpu
        pytest.skip(f"TPU topology description unavailable: {e}")


def test_dp_and_zero_layouts_compile_for_tpu(devices):
    results = dict(
        out for _, out in [
            (n, (n, o)) for n, o in aot_tpu.run_layouts(devices, ["dp", "zero"])
        ]
    )
    dp, zero = results["dp"], results["zero"]
    assert dp["first"]["live_mib"] > 0
    # The ZeRO-1 contract: state arguments shrink vs dp...
    assert zero["first"]["argument_mib"] < dp["first"]["argument_mib"]
    # ...the net live memory does not regress (the round-4 sharded-update
    # fix; without it GSPMD gathered mu/nu and temps ballooned)...
    assert zero["first"]["live_mib"] <= dp["first"]["live_mib"] * 1.05
    # ...and the state layout is a fixed point: the steady-state executable
    # (outputs' shardings fed back as inputs) has identical memory.
    assert zero["steady"] == zero["first"]
