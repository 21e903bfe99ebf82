"""ImageFolder scanning with flat or hierarchical (7-tier) labels.

Replaces torchvision's ImageFolder + the reference's HierarchicalImageFolder
(reference data.py:26-33, hierarchy.py:188-227). Scanning is pure host
metadata work: it yields file paths plus an int32 label table so the loader
can decode lazily.
"""

from __future__ import annotations

import dataclasses
import os
import pathlib
from typing import Optional, Sequence

import numpy as np

from hvt import hierarchy

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".gif", ".webp", ".ppm", ".tif", ".tiff")


@dataclasses.dataclass(frozen=True)
class DatasetInfo:
    """Misc dataset facts threaded to model/loss builders (reference data.py:79-90).

    num_classes is an int for flat training and a tuple of per-tier counts for
    hierarchical multitask training; tree_dists is the class×class tree-distance
    matrix (built only for eval-style runs, reference data.py:166-168).
    """

    num_classes: int | tuple[int, ...]
    tree_dists: Optional[np.ndarray] = None

    @property
    def fine_grained_num_classes(self) -> int:
        if isinstance(self.num_classes, tuple):
            return self.num_classes[-1]
        return self.num_classes


@dataclasses.dataclass(frozen=True)
class FolderDataset:
    """A scanned on-disk split: parallel arrays of paths and labels."""

    root: str
    paths: tuple[str, ...]
    # (N,) int32 for flat labels; (N, N_TIERS) int32 for hierarchical.
    labels: np.ndarray
    classes: tuple[str, ...]
    num_classes: int | tuple[int, ...]

    def __len__(self) -> int:
        return len(self.paths)

    @property
    def hierarchical(self) -> bool:
        return self.labels.ndim == 2


def _scan_classes(split_dir: pathlib.Path) -> list[str]:
    classes = sorted(e.name for e in os.scandir(split_dir) if e.is_dir())
    if not classes:
        raise FileNotFoundError(f"no class directories under {split_dir}")
    return classes


def _scan_files(split_dir: pathlib.Path, classes: Sequence[str]) -> list[tuple[str, int]]:
    samples = []
    for idx, cls in enumerate(classes):
        cls_dir = split_dir / cls
        for name in sorted(os.listdir(cls_dir)):
            if name.lower().endswith(IMG_EXTENSIONS):
                samples.append((str(cls_dir / name), idx))
    if not samples:
        raise FileNotFoundError(f"no images under {split_dir}")
    return samples


def scan_image_folder(
    root: str | os.PathLike,
    split: str,
    hierarchical: bool = False,
) -> FolderDataset:
    """Scan ``<root>/<split>/<class>/*`` into a FolderDataset.

    With hierarchical=True the class dirs must be 7-tier taxonomy names and
    each sample's label is its per-tier index vector
    (reference hierarchy.py:202-227).
    """
    split_dir = pathlib.Path(root) / split
    classes = _scan_classes(split_dir)
    samples = _scan_files(split_dir, classes)
    paths = tuple(p for p, _ in samples)
    flat = np.asarray([i for _, i in samples], dtype=np.int32)

    if hierarchical:
        table, num_classes = hierarchy.assign_tier_indices(classes)
        labels = table[flat]  # (N, N_TIERS)
    else:
        labels = flat
        num_classes = len(classes)

    return FolderDataset(
        root=str(root),
        paths=paths,
        labels=labels,
        classes=tuple(classes),
        num_classes=num_classes,
    )
