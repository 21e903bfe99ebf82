"""Memory-aware automatic gradient accumulation (``grad_accum: "auto"``).

The reference delegates "auto" to Composer's automatic microbatching, which
reacts to CUDA OOMs at runtime by splitting the batch (reference
main.py:38-41, configs.py:105). XLA compiles the whole step ahead of time,
so the TPU-native equivalent is *static*: lower the candidate train step,
read the executable's compile-time memory analysis, and double the
microbatch count until the program fits in per-device HBM. No OOM is ever
hit — the decision happens before the first byte is allocated.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

log = logging.getLogger(__name__)


def required_bytes(compiled) -> Optional[int]:
    """Per-device bytes the executable needs, from XLA's memory analysis.

    Donated inputs alias outputs, so the live set is arguments + outputs +
    temporaries − aliased. Returns None when the backend offers no analysis
    (e.g. CPU) — callers treat that as "cannot decide, don't split".
    """
    try:
        mem = compiled.memory_analysis()
    except Exception:
        return None
    if mem is None:
        return None
    try:
        return int(
            mem.argument_size_in_bytes
            + mem.output_size_in_bytes
            + mem.temp_size_in_bytes
            - mem.alias_size_in_bytes
        )
    except AttributeError:
        return None


def device_bytes_limit(device) -> Optional[int]:
    """Usable HBM on one device, or None when the runtime doesn't say.

    Some PJRT runtimes (e.g. the experimental axon plugin) report no
    memory_stats; HVT_DEVICE_HBM_GB overrides so ``grad_accum: auto`` can
    still size microbatches there (v5e: 16, v4: 32).
    """
    import os

    override = os.environ.get("HVT_DEVICE_HBM_GB")
    if override:
        return int(float(override) * 2**30)
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return None
    limit = stats.get("bytes_limit")
    return int(limit) if limit else None


def choose_grad_accum(
    measure: Callable[[int], Optional[int]],
    batch_size: int,
    limit_bytes: Optional[int],
    *,
    headroom: float = 0.92,
    max_accum: Optional[int] = None,
) -> int:
    """Smallest power-of-two accumulation whose step fits in memory.

    measure(accum) returns the candidate executable's per-device byte
    requirement (or None when unknowable). Candidates must divide
    batch_size; max_accum defaults to batch_size itself.
    """
    if limit_bytes is None:
        log.info("grad_accum auto: no device memory limit reported; using 1")
        return 1
    budget = headroom * limit_bytes
    cap = max_accum or batch_size
    accum = 1
    while True:
        need = measure(accum)
        if need is None:
            log.info("grad_accum auto: no memory analysis available; using %d", accum)
            return accum
        if need <= budget:
            log.info(
                "grad_accum auto: %d microbatches (%.2f GiB of %.2f GiB budget)",
                accum, need / 2**30, budget / 2**30,
            )
            return accum
        nxt = accum * 2
        while nxt <= cap and batch_size % nxt:
            nxt *= 2
        if nxt > cap:
            raise MemoryError(
                f"train step needs {need / 2**30:.2f} GiB per device even at "
                f"grad_accum={accum} (budget {budget / 2**30:.2f} GiB); "
                "reduce global_batch_size or the model size"
            )
        log.info(
            "grad_accum auto: %d microbatches need %.2f GiB > %.2f GiB budget; "
            "trying %d", accum, need / 2**30, budget / 2**30, nxt,
        )
        accum = nxt
