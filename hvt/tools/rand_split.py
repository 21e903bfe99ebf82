"""Pretrain/downstream taxonomy split (reference tools/rand_split.py:19-254).

Holds out a fraction of taxa as the downstream task:

* ``species`` — a seeded random fraction of species,
* ``genus`` — a seeded random fraction of genera (all their species go
  downstream),
* ``subtree`` — the single taxonomic node whose species count is closest to
  frac·total (via LeafCountLookup.closest).

Output: ``<out>/{pretrain,downstream}/{train,val}/<class>/`` copied in
parallel.

    python -m hvt.tools.rand_split --kind species --input DS --frac 0.2 --output OUT
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import random
import shutil

from hvt import hierarchy
from hvt.tools import toolkit


def get_classes(input_dir: pathlib.Path) -> set[str]:
    train = {p.stem for p in (input_dir / "train").iterdir()}
    val = {p.stem for p in (input_dir / "val").iterdir()}
    return train | val


def tier_values(classes: set[str], tier: str) -> set[str]:
    return {getattr(hierarchy.HierarchicalLabel.parse(c), tier) for c in classes}


def sample(values: set, fraction: float, seed: int) -> set:
    """Seeded sample over the sorted set (reference tools/rand_split.py:122-128
    — sorting first makes the split reproducible)."""
    k = int(len(values) * fraction)
    rng = random.Random(seed)
    return set(rng.sample(sorted(values), k))


def copy_data(
    input_dir: pathlib.Path, output_dir: pathlib.Path, classes: set[str], logger=None
):
    """Mirror input train/val structure for the selected classes, copying
    class dirs in parallel threads."""
    jobs = []
    for split in ("val", "train"):  # val first: faster feedback
        (output_dir / split).mkdir(parents=True, exist_ok=True)
        for class_dir in sorted((input_dir / split).iterdir()):
            if class_dir.name not in classes:
                continue
            jobs.append(
                functools.partial(
                    shutil.copytree,
                    str(class_dir),
                    output_dir / split / class_dir.name,
                    dirs_exist_ok=False,
                )
            )
    toolkit.run_jobs(jobs, label=f"copy {output_dir.name}", logger=logger)


def choose_downstream(
    input_dir: pathlib.Path, kind: str, fraction: float, seed: int, logger=None
) -> set[str]:
    all_classes = get_classes(input_dir)
    if kind in ("species", "genus"):
        chosen = sample(tier_values(all_classes, kind), fraction, seed)
        return {
            c
            for c in all_classes
            if getattr(hierarchy.HierarchicalLabel.parse(c), kind) in chosen
        }
    if kind == "subtree":
        lookup = hierarchy.LeafCountLookup(
            hierarchy.HierarchicalLabel.parse(c) for c in sorted(all_classes)
        )
        label, tier, count = lookup.closest(fraction)
        if logger:
            logger.info(
                "Picked a subtree. [label: %s, tier: %s, count: %d]", label, tier, count
            )
        return {
            c
            for c in all_classes
            if getattr(hierarchy.HierarchicalLabel.parse(c), tier) == label
        }
    raise ValueError(kind)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", required=True, choices=["species", "genus", "subtree"])
    parser.add_argument("--input", required=True)
    parser.add_argument("--frac", required=True, type=float)
    parser.add_argument("--output", required=True)
    parser.add_argument("--seed", default=42, type=int)
    args = parser.parse_args()

    input_dir = pathlib.Path(args.input)
    output_dir = pathlib.Path(args.output)
    logger = toolkit.tool_logger("rand-split", output_dir)

    all_classes = get_classes(input_dir)
    logger.info("Found %d input classes.", len(all_classes))

    downstream = choose_downstream(input_dir, args.kind, args.frac, args.seed, logger)
    pretrain = all_classes - downstream
    logger.info(
        "Split into pretrain/downstream. [pretrain: %d, downstream: %d]",
        len(pretrain),
        len(downstream),
    )

    copy_data(input_dir, output_dir / "downstream", downstream, logger)
    copy_data(input_dir, output_dir / "pretrain", pretrain, logger)
    logger.info("Done.")


if __name__ == "__main__":
    main()
