"""Throughput benchmark: images/sec/chip on the headline pretrain step.

Measures the jit-compiled ResNet-50 iNat21-shaped training step (global batch
sharded over all local chips, 224x224 bf16, DecoupledSGDW, label smoothing,
EMA, grad clipping — the reference's r50 pretrain recipe,
configs/pretrain/inat21.yaml) on device-resident synthetic data, isolating
chip throughput from host input (the north-star metric is input-bound
images/sec/chip, BASELINE.md).

Prints exactly one JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against a fixed reference point: 3023 images/sec/chip — MLPerf-class ResNet-50
training throughput on an A100-80GB (the reference trains on 4xA100-class
GPUs, slurm/train.bash:2-7). value/vs_baseline > 1 means one TPU chip
outpaces one reference-class GPU chip.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Fixed comparison point (see module docstring).
A100_R50_IMAGES_PER_SEC = 3023.0

BATCH_PER_CHIP = int(os.environ.get("HVT_BENCH_BATCH", 256))
IMAGE_SIZE = int(os.environ.get("HVT_BENCH_IMAGE_SIZE", 224))
NUM_CLASSES = 10000  # iNat21
WARMUP_STEPS = 5
MEASURE_STEPS = int(os.environ.get("HVT_BENCH_STEPS", 20))


def main():
    from hvt import config as config_lib
    from hvt import objectives, parallel
    from hvt.data import DevicePrep
    from hvt.models import build_model
    from hvt.train import optim as optim_lib
    from hvt.train import schedule as schedule_lib
    from hvt.train import state as state_lib
    from hvt.train import step as step_lib
    from hvt.train.algorithms import parse_algorithms

    n_chips = jax.device_count()
    batch = BATCH_PER_CHIP * n_chips

    model_args = {}
    if os.environ.get("HVT_BENCH_S2D") == "1":
        model_args["stem_s2d"] = True
    cfg = config_lib.loads(
        {
            "model": {"name": "resnet50", "args": model_args},
            "optim": {"name": "DecoupledSGDW", "lr": 2.048, "momentum": 0.875,
                      "weight_decay": 5.0e-4},
            "algorithms": [
                {"cls": "EMA", "args": {"half_life": "100ba", "update_interval": "20ba"}},
                {"cls": "LabelSmoothing", "args": {"smoothing": 0.08}},
                {"cls": "GradientClipping",
                 "args": {"clipping_type": "norm", "clipping_threshold": 2.0}},
            ],
        }
    )
    algos = parse_algorithms(cfg)
    mesh = parallel.make_mesh(cfg.mesh)
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
    model = build_model(cfg, NUM_CLASSES)

    mult = schedule_lib.cosine_with_warmup(100, 10_000, 0.0)
    tx = optim_lib.build_optimizer(cfg.optim, mult, grad_clip_norm=algos.grad_clip_norm)
    settings = step_lib.StepSettings(
        num_classes=NUM_CLASSES, smoothing=algos.label_smoothing, ema=algos.ema
    )
    train_step = step_lib.build_train_step(
        model, objectives.soft_cross_entropy, tx, prep, settings
    )

    replicated = parallel.replicated(mesh)
    sharded = parallel.batch_sharding(mesh)

    rng = jax.random.key(0)
    state = jax.jit(
        lambda: state_lib.create(
            model, tx, rng,
            prep.normalize(jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.uint8)),
            ema=True,
        ),
        out_shardings=replicated,
    )()

    host_images = np.random.default_rng(0).integers(
        0, 256, (batch, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.uint8
    )
    host_labels = np.random.default_rng(1).integers(
        0, NUM_CLASSES, (batch,), dtype=np.int32
    )
    images = jax.device_put(host_images, sharded)
    labels = jax.device_put(host_labels, sharded)
    mask = jax.device_put(np.ones((batch,), np.float32), sharded)
    base_rng = jax.device_put(rng, replicated)

    for _ in range(WARMUP_STEPS):
        state, stats = train_step(state, images, labels, mask, base_rng, scale=1.0)
    # block_until_ready is unreliable on the experimental axon runtime
    # (returns before device completion); a host fetch of a value that
    # depends on every step (states chain via donation) is a true barrier.
    float(stats["loss_sum"])

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, stats = train_step(state, images, labels, mask, base_rng, scale=1.0)
    float(stats["loss_sum"])
    elapsed = time.perf_counter() - t0

    ips = MEASURE_STEPS * batch / elapsed
    ips_per_chip = ips / n_chips
    print(
        json.dumps(
            {
                "metric": "resnet50_inat21_train_images_per_sec_per_chip",
                "value": round(ips_per_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips_per_chip / A100_R50_IMAGES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
