"""Input-pipeline throughput probe: images/sec of decode + augment per path.

The north-star criterion is *input-bound* training throughput (BASELINE.md),
so the host pipeline's img/s ceiling is a first-class number. The reference
has no analog (it relies on torch DataLoader workers, reference
data.py:173-178); hvt owns its pipeline (PIL path + C++ batch decoder) and
this tool makes the BENCH.md data-pipeline numbers re-runnable.

Usage:
    python -m hvt.tools.loader_bench --root /data/inat21/train \
        [--batches 8] [--batch-size 64] [--threads 1,2,4,8] [--eval]

Without --root it synthesizes a JPEG fixture (iNat-shaped 500x375 photos)
under /tmp so the probe runs anywhere. Prints one JSON line per
(path, threads) combination.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import time

import numpy as np


def make_fixture(root: str, num_images: int = 64, size=(500, 375)) -> str:
    """Synthesize a tiny ImageFolder of iNat-shaped JPEGs."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = pathlib.Path(root) / split / (
            "00000_animalia_chordata_aves_passeriformes_corvidae_corvus_corax"
        )
        d.mkdir(parents=True, exist_ok=True)
        for i in range(num_images):
            f = d / f"img{i:03d}.jpg"
            if not f.exists():
                arr = rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8)
                Image.fromarray(arr).save(f, quality=85)
    return str(pathlib.Path(root))


def bench_pipeline(
    root: str, batch_size: int, batches: int, threads: int,
    use_native: bool, is_train: bool, augment: str = "none",
) -> dict:
    from hvt import config as config_lib
    from hvt.data import loader as loader_lib
    from hvt.data import native as native_lib

    # The hot-recipe augmentation pair, host-side or device-side (device
    # mode delivers bare crops — the A/B behind BENCH.md "device-side
    # RandAugment": the host path's PIL post pass vs the decode ceiling).
    algorithms = []
    if augment != "none":
        device = augment == "device"
        algorithms = [
            {"cls": "RandAugment",
             "args": {"depth": 1, "severity": 9, "device": device}},
            {"cls": "ColOut",
             "args": {"p_row": 0.05, "p_col": 0.05, "device": device}},
        ]
    cfg = config_lib.loads({
        "train_dataset": {"path": "bench", "global_batch_size": batch_size,
                          "drop_last": True, "shuffle": False,
                          "crop_size": 224},
        "eval_dataset": {"path": "bench", "global_batch_size": batch_size},
        "machine": {"datasets": {"bench": root}},
        "loader": {"num_workers": threads, "prefetch_batches": 0},
        "algorithms": algorithms,
    })
    ldr, _ = loader_lib.build_loader(
        cfg, is_train=is_train, process_index=0, process_count=1
    )
    if use_native and not native_lib.available():
        return {"skipped": "native decoder unavailable"}
    if use_native and not ldr.use_native:
        return {"skipped": "transform not native-eligible"}
    ldr.use_native = use_native

    it = ldr.epoch(0)
    next(it)  # warm (thread pool spin-up, first-touch)
    n = 0
    t0 = time.perf_counter()
    for _ in range(batches):
        try:
            batch = next(it)
        except StopIteration:
            it = ldr.epoch(n)  # wrap to a fresh epoch (different aug seeds)
            batch = next(it)
        n += int(batch.mask.sum())
    dt = time.perf_counter() - t0
    return {
        "path": "native" if use_native else "pil",
        "mode": "train" if is_train else "eval",
        "augment": augment,
        "threads": threads,
        "images": n,
        "seconds": round(dt, 3),
        "images_per_sec": round(n / dt, 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=None,
                        help="ImageFolder root (default: synthetic fixture)")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--batches", type=int, default=8)
    parser.add_argument("--threads", default="1")
    parser.add_argument("--eval", action="store_true",
                        help="eval transforms (resize+center-crop) instead of "
                             "RandomResizedCrop+flip")
    parser.add_argument("--augment", default="none",
                        choices=("none", "host", "device"),
                        help="hot-recipe RandAugment+ColOut: host = PIL post "
                             "pass, device = bare crops (policy runs in-step)")
    args = parser.parse_args()

    root = args.root or make_fixture("/tmp/hvt-loader-bench")
    is_train = not args.eval
    for threads in [int(t) for t in args.threads.split(",")]:
        for use_native in (False, True):
            res = bench_pipeline(
                root, args.batch_size, args.batches, threads,
                use_native, is_train, augment=args.augment,
            )
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
