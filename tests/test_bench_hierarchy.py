"""CI for hvt.tools.bench_hierarchy — the hierarchical-objective chip bench.

Runs the tool's full construction + a couple of steps on the CPU backend at
micro scale so the chip invocations (BENCH.md "hierarchical objectives on
chip") can never drift from the code. Covers the reference's two research
objectives: multitask (reference hierarchy.py:65-94) and hxe (the stub at
reference hierarchy.py:183-185, real in hvt/objectives.py:HXELoss).
"""

import numpy as np
import pytest

from hvt.tools import bench_hierarchy


@pytest.fixture()
def micro_recipe(monkeypatch):
    monkeypatch.setitem(
        bench_hierarchy.RECIPES,
        "resnet_micro",
        {
            "batch": 4,
            "model_args": {},
            "optim": {"name": "DecoupledSGDW", "lr": 0.1, "momentum": 0.9,
                      "weight_decay": 1.0e-4},
            "algorithms": [
                {"cls": "LabelSmoothing", "args": {"smoothing": 0.08}},
                {"cls": "GradientClipping",
                 "args": {"clipping_type": "norm", "clipping_threshold": 2.0}},
            ],
        },
    )


@pytest.mark.parametrize("variant", ["multitask", "hxe", "flat"])
def test_measure_micro(micro_recipe, variant):
    row = bench_hierarchy.measure(
        "resnet_micro", variant, batch_per_chip=4, steps=2, windows=1,
        image_size=32, num_leaf_classes=12,
    )
    assert row["variant"] == variant
    assert np.isfinite(row["loss_at_warmup"])
    assert row["images_per_sec_per_chip"] > 0
