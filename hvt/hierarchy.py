"""Taxonomy core: labels, tree distances, parent lookups.

Pure Python/numpy domain logic with the same observable semantics as the
reference's hierarchy module (reference hierarchy.py:230-485):

* 7-tier taxonomic labels parsed from iNat21-style directory names
  ``00001_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_badius``,
  with repeated lower-tier names disambiguated by prefix concatenation
  (reference hierarchy.py:242-286),
* tree distance between two labels in [0, 7] (reference hierarchy.py:315-330),
* the N×N uint8 tree-distance matrix over the union of train+val classes,
  cached on disk (reference hierarchy.py:391-426; cache is ``.npy`` here
  instead of ``.pt``),
* per-tier class index assignment for hierarchical (multitask) datasets
  (reference hierarchy.py:202-227),
* child→parent index vectors for parent-constrained top-down prediction
  (reference hierarchy.py:429-485),
* ``LeafCountLookup`` used by the subtree split tool
  (reference hierarchy.py:333-368).

Everything here is trace-free host code; the arrays it produces (tree-distance
matrix, tier index table) are constants that get closed over by jitted
losses/metrics.
"""

from __future__ import annotations

import collections
import dataclasses
import os
import pathlib
from typing import Iterable, Sequence

import numpy as np

#: kingdom, phylum, class, order, family, genus, species
N_TIERS = 7
TIER_NAMES = ("kingdom", "phylum", "cls", "order", "family", "genus", "species")

TREE_DIST_CACHE = "tree_dist_cache.npy"


@dataclasses.dataclass(frozen=True)
class HierarchicalLabel:
    """One taxonomic label; tier values are prefix-disambiguated strings."""

    raw: str
    number: int
    tiers: tuple[str, ...]  # length N_TIERS, kingdom..species

    @classmethod
    def parse(cls, name: str) -> "HierarchicalLabel":
        """Parse ``<index>_<kingdom>_..._<species>``.

        Lower-tier names are not unique in iNat21 (the same order name can
        appear under two classes), so each tier value is the "-"-joined path
        from the kingdom down to that tier, making equal strings refer to
        equal tree nodes (reference hierarchy.py:242-286).
        """
        index, *parts = name.split("_")
        number = int(index)

        tiers: list[str] = []
        prefix = ""
        for part in parts:
            prefix = part if not prefix else f"{prefix}-{part}"
            tiers.append(prefix)

        if len(tiers) != N_TIERS:
            raise ValueError(f"label {name!r} has {len(tiers)} tiers, expected {N_TIERS}")

        return cls(raw=name, number=number, tiers=tuple(tiers))

    @property
    def clean_tiers(self) -> list[str]:
        return list(self.tiers)

    @property
    def cleaned(self) -> str:
        return "_".join([str(self.number).rjust(5, "0"), *self.tiers])

    # Named accessors (match reference field names, hierarchy.py:234-240).
    @property
    def kingdom(self) -> str:
        return self.tiers[0]

    @property
    def phylum(self) -> str:
        return self.tiers[1]

    @property
    def cls(self) -> str:
        return self.tiers[2]

    @property
    def order(self) -> str:
        return self.tiers[3]

    @property
    def family(self) -> str:
        return self.tiers[4]

    @property
    def genus(self) -> str:
        return self.tiers[5]

    @property
    def species(self) -> str:
        return self.tiers[6]

    def dist(self, other: "HierarchicalLabel") -> int:
        """Tree distance: 0 (same species) … 7 (different kingdoms).

        Distance k means the deepest shared tier is N_TIERS-1-k
        (reference hierarchy.py:315-330).
        """
        for depth in range(N_TIERS - 1, -1, -1):
            if self.tiers[depth] == other.tiers[depth]:
                return N_TIERS - 1 - depth
        return N_TIERS


def _class_dirs(directory: pathlib.Path) -> list[str]:
    return sorted(entry.name for entry in os.scandir(directory) if entry.is_dir())


def union_labels(directory: str | pathlib.Path) -> list[HierarchicalLabel]:
    """Sorted parsed labels over the union of train/ and val/ class dirs
    (reference hierarchy.py:405-409)."""
    directory = pathlib.Path(directory)
    names = {p.name for p in (directory / "train").iterdir() if p.is_dir()}
    names |= {p.name for p in (directory / "val").iterdir() if p.is_dir()}
    return [HierarchicalLabel.parse(name) for name in sorted(names)]


# ---------------------------------------------------------------------------
# Tier index assignment (multitask datasets)
# ---------------------------------------------------------------------------


def assign_tier_indices(
    class_names: Sequence[str],
) -> tuple[np.ndarray, tuple[int, ...]]:
    """Per-tier integer indices for each class, in first-seen order over the
    sorted class list (reference hierarchy.py:202-227).

    Returns:
        table: int32 array of shape (num_classes, N_TIERS); row i holds class
            i's index at each tier.
        num_classes: per-tier class counts, kingdom..species.
    """
    tier_lookup: list[dict[str, int]] = [{} for _ in range(N_TIERS)]
    table = np.zeros((len(class_names), N_TIERS), dtype=np.int32)

    for row, name in enumerate(class_names):
        label = HierarchicalLabel.parse(name)
        for tier, value in enumerate(label.tiers):
            lut = tier_lookup[tier]
            if value not in lut:
                lut[value] = len(lut)
            table[row, tier] = lut[value]

    return table, tuple(len(lut) for lut in tier_lookup)


# ---------------------------------------------------------------------------
# Tree-distance matrix
# ---------------------------------------------------------------------------


def tree_dist_matrix(labels: Sequence[HierarchicalLabel]) -> np.ndarray:
    """N×N uint8 matrix of pairwise tree distances.

    Vectorized over the reference's O(N²) Python double loop
    (reference hierarchy.py:412-419): for each tier, compare integer codes of
    the tier values; the distance is N_TIERS minus the number of deepest
    matching tiers.
    """
    n = len(labels)
    # codes[t, i]: integer id of label i's value at tier t.
    codes = np.empty((N_TIERS, n), dtype=np.int64)
    for t in range(N_TIERS):
        values = [lab.tiers[t] for lab in labels]
        _, inv = np.unique(values, return_inverse=True)
        codes[t] = inv

    # same[t] is an n×n bool matrix: tier-t values equal.
    dist = np.full((n, n), N_TIERS, dtype=np.uint8)
    for depth in range(N_TIERS):
        same = codes[depth][:, None] == codes[depth][None, :]
        # Deepest shared tier wins; iterate top-down so later (deeper) tiers
        # overwrite with smaller distances.
        dist[same] = N_TIERS - 1 - depth

    assert (np.diagonal(dist) == 0).all(), "diagonal of tree-dist matrix must be 0"
    return dist


def build_tree_dist_matrix(directory: str | pathlib.Path) -> np.ndarray:
    """Tree-dist matrix over train∪val classes, cached at
    ``<directory>/tree_dist_cache.npy`` (reference hierarchy.py:391-426)."""
    directory = pathlib.Path(directory)
    cache = directory / TREE_DIST_CACHE
    if cache.is_file():
        return np.load(cache)

    matrix = tree_dist_matrix(union_labels(directory))
    np.save(cache, matrix)
    return matrix


# ---------------------------------------------------------------------------
# Parent lookups (top-down constrained prediction)
# ---------------------------------------------------------------------------


def parent_lookup_from_classes(classes: Sequence[str]) -> list[np.ndarray]:
    """(N_TIERS-1) parent vectors straight from a class-name list (the same
    construction as :func:`build_parent_label_lookup` without a disk scan —
    used where the classes are already known, e.g. prediction)."""
    table, num_classes = assign_tier_indices(list(classes))
    vectors = []
    for tier in range(1, N_TIERS):
        vec = np.zeros((num_classes[tier],), dtype=np.int64)
        vec[table[:, tier]] = table[:, tier - 1]
        vectors.append(vec)
    return vectors


def build_parent_label_lookup(
    directory: str | pathlib.Path,
) -> list[np.ndarray]:
    """(N_TIERS-1) vectors mapping child-class index → parent-class index.

    vectors[t][c] is the tier-t class index of the parent of tier-(t+1) class c
    (reference hierarchy.py:429-485; indices use the same first-seen-over-sorted
    assignment as :func:`assign_tier_indices`).
    """
    labels = union_labels(directory)
    return parent_lookup_from_classes([lab.raw for lab in labels])


# ---------------------------------------------------------------------------
# Leaf counts (subtree split tool)
# ---------------------------------------------------------------------------


class LeafCountLookup:
    """Species (leaf) counts under every taxonomic node
    (reference hierarchy.py:333-368)."""

    def __init__(self, labels: Iterable[HierarchicalLabel]):
        self._lookup: dict[tuple[str, str], int] = collections.defaultdict(int)
        self.total = 0
        for label in labels:
            for tier_name, value in zip(TIER_NAMES, label.tiers):
                self._lookup[(value, tier_name)] += 1
            self.total += 1

    def closest(self, n: int | float) -> tuple[str, str, int]:
        """Node (label, tier, count) whose leaf count is closest to n
        (or to n·total when n is a fraction)."""
        if isinstance(n, float):
            if not 0 <= n <= 1:
                raise ValueError("fractional n must be in [0, 1]")
            n = int(self.total * n)

        if not self._lookup:
            raise RuntimeError("no values in lookup!")

        best = min(self._lookup.items(), key=lambda kv: abs(kv[1] - n))
        (label, tier), count = best
        return label, tier, count
