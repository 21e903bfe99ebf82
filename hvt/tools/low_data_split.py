"""k-shot / stratified-fraction training subsets
(reference tools/low_data_split.py:16-188).

Subsets train/ (val/ is copied untouched): ``--shots k`` samples k images per
class; ``--fraction f`` keeps a stratified f of the training data
(sklearn train_test_split, random_state 42 as in the reference).

    python -m hvt.tools.low_data_split --input DS --output OUT --shots 10
"""

from __future__ import annotations

import argparse
import collections
import functools
import pathlib
import random
import shutil

from hvt.tools import toolkit


def load_split(split_dir: pathlib.Path) -> tuple[list[pathlib.Path], list[str]]:
    paths, classes = [], []
    for class_dir in sorted(split_dir.iterdir()):
        for image in sorted(class_dir.iterdir()):
            paths.append(image)
            classes.append(class_dir.name)
    return paths, classes


def few_shot_split(paths, classes, shots: int, seed: int = 42):
    """k random images per class (reference tools/low_data_split.py:61-72)."""
    by_class = collections.defaultdict(list)
    for i, cls in enumerate(classes):
        by_class[cls].append(i)
    rng = random.Random(seed)
    out_paths, out_classes = [], []
    for cls, idxs in by_class.items():
        for i in rng.sample(idxs, k=shots):
            out_paths.append(paths[i])
            out_classes.append(cls)
    return out_paths, out_classes


def stratified_split(paths, classes, fraction: float):
    assert 0 < fraction < 1, f"fraction must be in (0, 1), got {fraction}"
    import sklearn.model_selection

    kept_paths, _, kept_classes, _ = sklearn.model_selection.train_test_split(
        paths, classes, train_size=fraction, random_state=42, stratify=classes
    )
    return kept_paths, kept_classes


def save_split(paths, classes, output_dir: pathlib.Path, logger=None) -> None:
    output_dir.mkdir(parents=True, exist_ok=True)
    for cls in set(classes):
        (output_dir / cls).mkdir(parents=True, exist_ok=True)
    jobs = [
        functools.partial(shutil.copy2, str(path), output_dir / cls / path.name)
        for path, cls in zip(paths, classes)
    ]
    toolkit.run_jobs(jobs, label=f"copy {output_dir.name}", logger=logger)


def _log_distribution(logger, tag, classes):
    logger.info("%s class distribution: %s", tag, toolkit.CountSummary.of(classes))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--fraction", default=1.0, type=float)
    parser.add_argument("--shots", default=0, type=int)
    args = parser.parse_args()

    assert args.shots == 0 or args.fraction == 1.0, (
        "cannot use both --shots and --fraction"
    )

    input_dir = pathlib.Path(args.input)
    output_dir = pathlib.Path(args.output)
    logger = toolkit.tool_logger("low-data-split", output_dir)

    train_paths, train_classes = load_split(input_dir / "train")
    val_paths, val_classes = load_split(input_dir / "val")
    _log_distribution(logger, "Train", train_classes)
    _log_distribution(logger, "Val", val_classes)

    if args.fraction < 1.0:
        train_paths, train_classes = stratified_split(
            train_paths, train_classes, args.fraction
        )
    elif args.shots > 0:
        train_paths, train_classes = few_shot_split(
            train_paths, train_classes, args.shots
        )
    else:
        raise ValueError("specify --shots or --fraction")

    _log_distribution(logger, "Subset train", train_classes)
    save_split(train_paths, train_classes, output_dir / "train", logger)
    save_split(val_paths, val_classes, output_dir / "val", logger)
    logger.info("Done. [train: %d, val: %d]", len(train_classes), len(val_classes))


if __name__ == "__main__":
    main()
