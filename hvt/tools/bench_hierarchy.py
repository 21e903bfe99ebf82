"""Chip throughput of the HIERARCHICAL pretrain objectives (the namesake).

bench.py measures the flat-CE headline steps; this tool measures the same
step composition with the project's hierarchical objectives swapped in —
the reference's actual research workloads:

* ``--variant multitask`` — MultitaskHead (one linear per tier) + the
  coefficient-weighted per-tier CE (reference hierarchy.py:65-94, coeffs
  from configs/pretrain/r50_multitask_base.yaml),
* ``--variant hxe`` — flat species logits + tree-factorized hierarchical
  cross-entropy (the reference's stub at hierarchy.py:183-185, implemented
  for real in hvt/objectives.py:HXELoss),
* ``--variant flat`` — the bench.py baseline, re-measured here so the
  hierarchy overhead is read against a same-process control.

Labels come from the synthetic taxonomy (hvt/data/synthetic.py): tier t of
class i is i % 2**(t+1), giving per-tier counts (2, 4, ..., 64, 10000).
The species tier — which dominates both the multitask head matmul and the
HXE segment reductions — is the exact iNat21 width; the upper tiers are
narrower than iNat21's (3, 13, ..., 4884), which under-counts the multitask
head by ~6k output columns (<0.3% of the R50 step's FLOPs).

Timing methodology is bench.py's: device-resident data, donation-chained
states, and a host fetch of the loss as the barrier (block_until_ready
returns early on the axon runtime). Prints one JSON line per workload.

Usage:
    python -m hvt.tools.bench_hierarchy --model resnet50 --variant multitask
    python -m hvt.tools.bench_hierarchy --model swinv2_tiny --variant hxe
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NUM_LEAF_CLASSES = 10000  # iNat21 species count
WARMUP_STEPS = 5

# Reference multitask coefficients (configs/pretrain/r50_multitask_base.yaml:3,
# ~2^((6-i)/2) from kingdom to species).
MULTITASK_COEFFS = [8.0, 5.65, 4.0, 2.82, 2.0, 1.41, 1.0]

RECIPES = {
    "resnet50": {
        "batch": 256,
        "model_args": {"stem_s2d": True},
        "optim": {"name": "DecoupledSGDW", "lr": 2.048, "momentum": 0.875,
                  "weight_decay": 5.0e-4},
        "algorithms": [
            {"cls": "EMA", "args": {"half_life": "100ba",
                                    "update_interval": "20ba"}},
            {"cls": "LabelSmoothing", "args": {"smoothing": 0.08}},
            {"cls": "GradientClipping",
             "args": {"clipping_type": "norm", "clipping_threshold": 2.0}},
        ],
    },
    "swinv2_tiny": {
        "batch": 128,
        "model_args": {"fuse": True},
        "optim": {"name": "DecoupledAdamW", "lr": 1.0e-3,
                  "weight_decay": 0.05},
        "algorithms": [
            {"cls": "LabelSmoothing", "args": {"smoothing": 0.1}},
            {"cls": "GradientClipping",
             "args": {"clipping_type": "norm", "clipping_threshold": 5.0}},
        ],
    },
}


def measure(model_name: str, variant: str, batch_per_chip: int,
            steps: int, windows: int, image_size: int = 224,
            num_leaf_classes: int = NUM_LEAF_CLASSES) -> dict:
    from hvt import config as config_lib
    from hvt import hierarchy, objectives, parallel
    from hvt.data import DevicePrep
    from hvt.data.synthetic import synthetic_class_names
    from hvt.models import build_model
    from hvt.train import optim as optim_lib
    from hvt.train import schedule as schedule_lib
    from hvt.train import state as state_lib
    from hvt.train import step as step_lib
    from hvt.train.algorithms import parse_algorithms

    recipe = RECIPES[model_name]
    n_chips = jax.device_count()
    batch = batch_per_chip * n_chips

    class_names = synthetic_class_names(num_leaf_classes)
    tier_table, tier_counts = hierarchy.assign_tier_indices(class_names)

    hierarchy_cfg = {"variant": "" if variant == "flat" else variant}
    if variant == "multitask":
        hierarchy_cfg["multitask_coeffs"] = MULTITASK_COEFFS
    cfg = config_lib.loads({
        "model": {"name": model_name, "args": dict(recipe["model_args"])},
        "optim": dict(recipe["optim"]),
        "algorithms": [dict(a) for a in recipe["algorithms"]],
        "hierarchy": hierarchy_cfg,
    })
    algos = parse_algorithms(cfg)
    mesh = parallel.make_mesh(cfg.mesh)
    parallel.set_kernel_mesh(mesh)
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)

    num_classes = tier_counts if variant == "multitask" else num_leaf_classes
    model = build_model(cfg, num_classes)
    objective = objectives.build_objective(cfg, None, class_names=class_names)

    mult = schedule_lib.cosine_with_warmup(100, 10_000, 0.0)
    no_decay = getattr(model, "no_weight_decay_substrings", ())
    tx = optim_lib.build_optimizer(
        cfg.optim, mult, grad_clip_norm=algos.grad_clip_norm,
        no_decay_substrings=no_decay,
    )
    settings = step_lib.StepSettings(
        num_classes=num_classes, smoothing=algos.label_smoothing,
        ema=algos.ema,
    )
    train_step = step_lib.build_train_step(model, objective, tx, prep, settings)

    replicated = parallel.replicated(mesh)
    sharded = parallel.batch_sharding(mesh)

    state = jax.jit(
        lambda: state_lib.create(
            model, tx, jax.random.key(0),
            prep.normalize(jnp.zeros((2, image_size, image_size, 3), jnp.uint8)),
            ema=algos.ema is not None,
        ),
        out_shardings=replicated,
    )()

    host_images = np.random.default_rng(0).integers(
        0, 256, (batch, image_size, image_size, 3), dtype=np.uint8
    )
    flat_labels = np.random.default_rng(1).integers(
        0, num_leaf_classes, (batch,), dtype=np.int32
    )
    host_labels = (
        tier_table[flat_labels].astype(np.int32)
        if variant == "multitask" else flat_labels
    )
    images = jax.device_put(host_images, sharded)
    labels = jax.device_put(host_labels, sharded)
    mask = jax.device_put(np.ones((batch,), np.float32), sharded)
    base_rng = jax.jit(lambda: jax.random.key(0), out_shardings=replicated)()

    for _ in range(WARMUP_STEPS):
        state, stats = train_step(state, images, labels, mask, base_rng, scale=1.0)
    # stats["loss_sum"] is already the batch-mean loss (the objective returns a
    # masked mean; hvt/train/step.py sums *means* across microbatches and the
    # MetricAccumulator later divides by 'batches') — the fetch is the barrier.
    loss = float(stats["loss_sum"])
    assert np.isfinite(loss), f"non-finite loss {loss}"

    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, stats = train_step(state, images, labels, mask, base_rng,
                                      scale=1.0)
        float(stats["loss_sum"])
        rates.append(steps * batch / (time.perf_counter() - t0) / n_chips)

    return {
        "model": model_name,
        "variant": variant or "flat",
        "batch_per_chip": batch_per_chip,
        "images_per_sec_per_chip": float(np.median(rates)),
        "spread": [float(min(rates)), float(max(rates))],
        "loss_at_warmup": loss,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="resnet50", choices=sorted(RECIPES))
    ap.add_argument("--variant", default="multitask",
                    choices=("flat", "multitask", "hxe"))
    ap.add_argument("--batch", type=int, default=None,
                    help="per-chip batch (default: the model's recipe batch)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    from hvt.utils import compile_cache

    compile_cache.enable()
    batch = args.batch or RECIPES[args.model]["batch"]
    row = measure(args.model, args.variant, batch, args.steps, args.windows)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
