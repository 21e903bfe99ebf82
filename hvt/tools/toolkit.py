"""Shared utilities for the offline dataset tools.

Covers the behavioral surface of the reference's tool helpers (reference
tools/helpers.py:8-43 — combined console+file logging, per-class count
stats — and tools/concurrency.py:9-35 — parallel file operations with
progress feedback), with hvt's own shapes: a functional job runner that
reports progress through the tool's logger at ~10% increments (no tqdm, no
future bookkeeping), a frozen stats dataclass, and a pipe-delimited log
format written to ``<out>/<tool>.log``.
"""

from __future__ import annotations

import dataclasses
import logging
import pathlib
import sys
from collections import Counter
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Optional, Sequence

_LOG_PATTERN = "%(asctime)s | %(name)s | %(levelname)s | %(message)s"


def tool_logger(tool: str, out_dir: pathlib.Path | str) -> logging.Logger:
    """Logger for one tool run: stderr + ``<out_dir>/<tool>.log``.

    Idempotent per tool name — repeated calls reuse the configured logger
    (so library code can call it without duplicating handlers).
    """
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    log = logging.getLogger(f"hvt.tools.{tool}")
    log.setLevel(logging.INFO)
    log.propagate = False
    if not log.handlers:
        formatter = logging.Formatter(_LOG_PATTERN)
        for handler in (
            logging.StreamHandler(sys.stderr),
            logging.FileHandler(out / f"{tool}.log"),
        ):
            handler.setFormatter(formatter)
            log.addHandler(handler)
    log.info("tool output directory: %s", out)
    return log


@dataclasses.dataclass(frozen=True)
class CountSummary:
    """Per-class sample-count summary of a label sequence."""

    smallest: tuple[str, int]
    largest: tuple[str, int]
    mean: float
    num_classes: int

    @classmethod
    def of(cls, labels: Sequence[str]) -> "CountSummary":
        counts = Counter(labels)
        ordered = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
        return cls(
            smallest=ordered[0],
            largest=ordered[-1],
            mean=sum(counts.values()) / len(counts),
            num_classes=len(counts),
        )

    def __str__(self) -> str:
        return (
            f"{self.num_classes} classes, "
            f"min={self.smallest[1]} ({self.smallest[0]}), "
            f"mean={self.mean:.2f}, "
            f"max={self.largest[1]} ({self.largest[0]})"
        )


def run_jobs(
    jobs: Iterable[Callable[[], object]],
    *,
    label: str,
    logger: Optional[logging.Logger] = None,
    max_workers: Optional[int] = None,
) -> int:
    """Execute zero-arg callables on a thread pool; returns the job count.

    Progress is reported through ``logger`` (or stdout) at roughly 10%
    increments. The first raised exception propagates to the caller.
    """
    jobs = list(jobs)
    if not jobs:
        return 0

    def report(done: int) -> None:
        pct = round(100 * done / len(jobs))
        msg = f"{label}: {done}/{len(jobs)} ({pct}%)"
        if logger is not None:
            logger.info("%s", msg)
        else:
            print(msg, flush=True)

    stride = max(1, len(jobs) // 10)
    done = 0
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        for _ in pool.map(lambda job: job(), jobs):
            done += 1
            if done % stride == 0 or done == len(jobs):
                report(done)
    return done
