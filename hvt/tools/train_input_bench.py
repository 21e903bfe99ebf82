"""Real-input training throughput: does the input pipeline OVERLAP the chip?

Every BENCH.md train row uses device-resident synthetic data; this tool
measures the actual train path — native JPEG decode → prefetch queue →
H2D transfer → compiled train step — against a real ImageFolder, and
reports whether the wall clock behaves like max(host, device) (the
pipeline overlaps: prefetch threads decode the next batch and the H2D
transfer rides while the chip runs the current step) or like their sum
(the input path serializes). This is the only measured evidence on the
north star's "input-bound" clause (BASELINE.md; VERDICT r4 item 4) a
1-host-core environment can produce. Reference: the torch DataLoader
worker pool the reference leans on (reference data.py:173-178).

Three rates per regime, one JSON line each:

* ``host_only``   — loader alone (decode+augment+collate), no device work,
* ``device_only`` — bench.py's device-resident step, no host work,
* ``combined``    — the real train loop, loader-fed,

plus the two predictions: ``overlap`` = 1/max(1/h, 1/d) and
``serial`` = 1/(1/h + 1/d). ``overlap_efficiency`` maps combined onto the
[serial, overlap] segment (1.0 = perfect overlap, 0.0 = fully serial).

Two regimes by fixture choice:

* ``--regime host-bound``   (default): iNat-shaped 500x375 JPEGs — decode
  dominates on 1 core; combined should pin to the host rate.
* ``--regime device-bound``: 150x112 thumbnails — decode is cheap;
  combined should pin to the device rate, proving the host path hides.

Usage:
    python -m hvt.tools.train_input_bench [--regime host-bound]
        [--root DIR] [--batch 256] [--steps 20] [--workers 2]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_fixture(root: str, num_images: int, size) -> str:
    from PIL import Image

    rng = np.random.default_rng(0)
    d = pathlib.Path(root) / "train" / (
        "00000_animalia_chordata_aves_passeriformes_corvidae_corvus_corax"
    )
    d.mkdir(parents=True, exist_ok=True)
    for i in range(num_images):
        f = d / f"img{i:03d}.jpg"
        if not f.exists():
            arr = rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8)
            Image.fromarray(arr).save(f, quality=85)
    return str(pathlib.Path(root))


def _build(root: str, batch: int, workers: int, image: int,
           model_name: str = "resnet50", classes: int = 10000,
           prefetch: int = 2):
    from hvt import config as config_lib
    from hvt import objectives, parallel
    from hvt.data import DevicePrep
    from hvt.data import loader as loader_lib
    from hvt.models import build_model
    from hvt.train import optim as optim_lib
    from hvt.train import schedule as schedule_lib
    from hvt.train import state as state_lib
    from hvt.train import step as step_lib
    from hvt.train.algorithms import parse_algorithms

    cfg = config_lib.loads({
        "model": {"name": model_name,
                  "args": {"stem_s2d": True} if model_name == "resnet50" else {}},
        "optim": {"name": "DecoupledSGDW", "lr": 2.048, "momentum": 0.875,
                  "weight_decay": 5.0e-4},
        "algorithms": [
            {"cls": "EMA", "args": {"half_life": "100ba",
                                    "update_interval": "20ba"}},
            {"cls": "LabelSmoothing", "args": {"smoothing": 0.08}},
            {"cls": "GradientClipping",
             "args": {"clipping_type": "norm", "clipping_threshold": 2.0}},
        ],
        "train_dataset": {"path": "bench", "global_batch_size": batch,
                          "drop_last": True, "shuffle": True,
                          "crop_size": image},
        "eval_dataset": {"path": "bench", "global_batch_size": batch},
        "machine": {"datasets": {"bench": root}},
        "loader": {"num_workers": workers, "prefetch_batches": prefetch},
    })
    algos = parse_algorithms(cfg)
    mesh = parallel.make_mesh(cfg.mesh)
    parallel.set_kernel_mesh(mesh)
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
    model = build_model(cfg, classes)
    tx = optim_lib.build_optimizer(
        cfg.optim, schedule_lib.cosine_with_warmup(100, 10_000, 0.0),
        grad_clip_norm=algos.grad_clip_norm,
        no_decay_substrings=getattr(model, "no_weight_decay_substrings", ()),
    )
    settings = step_lib.StepSettings(
        num_classes=classes, smoothing=algos.label_smoothing, ema=algos.ema,
    )
    train_step = step_lib.build_train_step(
        model, objectives.soft_cross_entropy, tx, prep, settings
    )
    state = jax.jit(
        lambda: state_lib.create(
            model, tx, jax.random.key(0),
            prep.normalize(jnp.zeros((2, image, image, 3), jnp.uint8)),
            ema=True,
        ),
        out_shardings=parallel.replicated(mesh),
    )()
    ldr, _ = loader_lib.build_loader(cfg, is_train=True,
                                     process_index=0, process_count=1)
    sharded = parallel.batch_sharding(mesh)
    replicated = parallel.replicated(mesh)
    rng_key = jax.jit(lambda: jax.random.key(0), out_shardings=replicated)()
    return train_step, state, ldr, sharded, rng_key, mesh


def _batches(ldr, steps: int):
    """steps batches, wrapping epochs (the fixture is small by design)."""
    epoch, got = 0, 0
    while got < steps:
        for b in ldr.epoch(epoch):
            yield b
            got += 1
            if got >= steps:
                return
        epoch += 1


def measure(root: str, batch: int, steps: int, workers: int,
            image: int = 224, model_name: str = "resnet50",
            classes: int = 10000, prefetch: int = 2) -> dict:
    from hvt import parallel

    train_step, state, ldr, sharded, rng_key, mesh = _build(
        root, batch, workers, image, model_name, classes, prefetch
    )

    # warm: compile + thread-pool spin-up + device touch
    warm = next(_batches(ldr, 1))
    images = jax.device_put(warm.images, sharded)
    labels = jax.device_put(warm.labels.astype(np.int32), sharded)
    mask = jax.device_put(warm.mask.astype(np.float32), sharded)
    for _ in range(3):
        state, stats = train_step(state, images, labels, mask, rng_key,
                                  scale=1.0)
    float(stats["loss_sum"])  # barrier (axon: block_until_ready lies)

    # host-only: loader alone
    n = 0
    t0 = time.perf_counter()
    for b in _batches(ldr, steps):
        n += int(b.mask.sum())
    host_rate = n / (time.perf_counter() - t0)

    # device-only: resident batch, no host work
    t0 = time.perf_counter()
    for _ in range(steps):
        state, stats = train_step(state, images, labels, mask, rng_key,
                                  scale=1.0)
    float(stats["loss_sum"])
    device_rate = steps * batch / (time.perf_counter() - t0)

    # h2d-only: transfer pre-decoded host batches, no loader, no step.
    # One fused sum over every transferred image array is the barrier
    # (fetching each would add the tunnel's ~0.25 s latency per batch).
    host_batches = list(_batches(ldr, min(steps, 8)))
    t0 = time.perf_counter()
    puts = [parallel.put_batch(mesh, b) for b in host_batches]
    total = jax.jit(
        lambda *xs: sum(x.astype(jnp.int32).sum() for x in xs)
    )(*[p[0] for p in puts])
    int(total)
    h2d_rate = len(puts) * batch / (time.perf_counter() - t0)

    # h2d+step: the double-buffered transfer queue feeding the step from
    # pre-decoded host batches — H2D↔compute overlap with the loader out
    # of the picture.
    t0 = time.perf_counter()
    for _b, (im, lb, mk) in parallel.prefetch_to_device(
            iter(host_batches), mesh, depth=prefetch):
        state, stats = train_step(state, im, lb, mk, rng_key, scale=1.0)
    float(stats["loss_sum"])
    h2d_step_rate = len(host_batches) * batch / (time.perf_counter() - t0)

    # combined: the real Trainer-fed loop — the loader's decode threads AND
    # the double-buffered H2D queue (parallel.prefetch_to_device, the exact
    # path hvt/train/loop.py runs; raw per-step device_put measured 36%
    # BELOW even the serial prediction on this tunnel, whose blocking H2D
    # round trip is ~0.25 s — the queue is what hides it).
    t0 = time.perf_counter()
    n = 0
    for _b, (images, labels, mask) in parallel.prefetch_to_device(
            _batches(ldr, steps), mesh, depth=prefetch):
        state, stats = train_step(state, images, labels, mask, rng_key,
                                  scale=1.0)
        n += batch
    float(stats["loss_sum"])
    combined = n / (time.perf_counter() - t0)

    overlap = 1.0 / max(1.0 / host_rate, 1.0 / device_rate, 1.0 / h2d_rate)
    serial = 1.0 / (1.0 / host_rate + 1.0 / device_rate + 1.0 / h2d_rate)
    eff = (combined - serial) / max(overlap - serial, 1e-9)
    return {
        "host_only_img_s": round(host_rate, 1),
        "device_only_img_s": round(device_rate, 1),
        "h2d_only_img_s": round(h2d_rate, 1),
        "h2d_step_img_s": round(h2d_step_rate, 1),
        "combined_img_s": round(combined, 1),
        "predicted_overlap_img_s": round(overlap, 1),
        "predicted_serial_img_s": round(serial, 1),
        "overlap_efficiency": round(float(eff), 3),
        "batch": batch,
        "steps": steps,
        "workers": workers,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--regime", default="host-bound",
                    choices=("host-bound", "device-bound"))
    ap.add_argument("--root", default=None)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--prefetch", type=int, default=2,
                    help="device-transfer queue depth (loader prefetch too)")
    args = ap.parse_args()

    from hvt.utils import compile_cache

    compile_cache.enable()
    if args.root:
        root = args.root
    elif args.regime == "host-bound":
        root = make_fixture("/tmp/hvt-input-bench-big", 512, (500, 375))
    else:
        root = make_fixture("/tmp/hvt-input-bench-small", 512, (150, 112))
    row = measure(root, args.batch, args.steps, args.workers,
                  prefetch=args.prefetch)
    row["regime"] = args.regime
    print(json.dumps(row))


if __name__ == "__main__":
    main()
