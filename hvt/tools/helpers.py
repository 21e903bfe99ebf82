"""Logging helpers for offline tools (reference tools/helpers.py:8-43)."""

from __future__ import annotations

import collections
import logging
import pathlib
import statistics
import sys


class ClassDistribution:
    """min/mean/max per-class sample counts."""

    def __init__(self, seq):
        self.counts = collections.Counter(seq)

    def min(self):
        return self.counts.most_common()[-1]

    def max(self):
        return self.counts.most_common(1)[0]

    def mean(self):
        return statistics.mean(self.counts.values())


def create_logger(name: str, output_dir: pathlib.Path) -> logging.Logger:
    """stdout + <output_dir>/log.txt logger."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter(
        fmt="[%(asctime)s] [%(filename)s:%(lineno)d %(levelname)s] %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )

    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(fmt)
    logger.addHandler(console)

    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    file_handler = logging.FileHandler(output_dir / "log.txt", mode="w")
    file_handler.setFormatter(fmt)
    logger.addHandler(file_handler)

    logger.info("Made directory %s", output_dir)
    return logger
