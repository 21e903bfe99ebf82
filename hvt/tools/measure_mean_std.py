"""Per-channel mean/std of a dataset at 256² (reference
tools/measure_mean_std.py:10-65) — the source of the channel_mean/channel_std
values in split configs (e.g. configs/pretrain/inat21_rand_species.yaml).

Streams sums and sums-of-squares; values are in [0, 1] scale like the
reference (ToTensor semantics).

    python -m hvt.tools.measure_mean_std --input <dataset-dir>/train
"""

from __future__ import annotations

import argparse
import concurrent.futures
import pathlib

import numpy as np
from PIL import Image
from tqdm.auto import tqdm


def _accumulate(path: str, size: int) -> tuple[np.ndarray, np.ndarray]:
    with Image.open(path) as img:
        img = img.convert("RGB").resize((size, size), Image.BILINEAR)
        arr = np.asarray(img, dtype=np.float64) / 255.0
    return arr.sum(axis=(0, 1)), (arr * arr).sum(axis=(0, 1))


def load_statistics(directory: str, size: int = 256, num_workers: int = 8):
    split_dir = pathlib.Path(directory)
    paths = []
    for class_dir in sorted(p for p in split_dir.iterdir() if p.is_dir()):
        paths.extend(str(p) for p in sorted(class_dir.iterdir()))
    if not paths:
        raise FileNotFoundError(f"no images under {directory}")

    total = np.zeros(3)
    total_sq = np.zeros(3)
    with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
        for s, sq in tqdm(
            pool.map(lambda p: _accumulate(p, size), paths), total=len(paths)
        ):
            total += s
            total_sq += sq

    divisor = len(paths) * size * size
    mean = total / divisor
    std = np.sqrt(total_sq / divisor - mean * mean)
    return mean, std


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="Directory of class folders.")
    parser.add_argument("--size", type=int, default=256)
    args = parser.parse_args()
    mean, std = load_statistics(args.input, args.size)
    print(args.input, "mean:", mean.tolist(), "std:", std.tolist())


if __name__ == "__main__":
    main()
