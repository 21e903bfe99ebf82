"""Run logging + throughput instrumentation.

Replaces the reference's logger stack (reference main.py:79-96): a
per-process file logger (FileLogger analog: ``logs/log{rank}.txt``), stdout
on rank 0, an optional wandb sink (active only if wandb is importable — it
is not part of this environment), and a SpeedMonitor measuring samples/sec
over a sliding window (reference main.py:92, window_size=50) plus
images/sec/chip — the north-star metric (BASELINE.md).
"""

from __future__ import annotations

import collections
import json
import pathlib
import time
from typing import Any, Optional

try:  # wandb is optional (absent in this environment)
    import wandb  # type: ignore

    _HAS_WANDB = True
except ImportError:
    wandb = None
    _HAS_WANDB = False


class RunLogger:
    def __init__(
        self,
        save_folder: str | pathlib.Path,
        run_name: str,
        rank: int = 0,
        use_wandb: bool = False,
        wandb_entity: str = "",
        wandb_project: str = "",
        tags: Optional[list[str]] = None,
        world: int = 1,
    ):
        self.rank = rank
        self.run_name = run_name
        log_dir = pathlib.Path(save_folder) / "logs"
        log_dir.mkdir(parents=True, exist_ok=True)
        self._file = open(log_dir / f"log{rank}.txt", "a")
        self._wandb_run = None
        # Rank-consistent descriptor of the run (entity/project/id): rank 0
        # creates the run, every rank adopts the descriptor — the analog of
        # the reference's broadcast-based run adoption (monkey_patch.py:14-31).
        self.run_info: dict[str, str] = {}
        if use_wandb and not _HAS_WANDB and rank == 0:
            import warnings

            warnings.warn(
                "wandb logging/upload requested (save.wandb: true) but the "
                "wandb package is not installed — metrics stay in the jsonl "
                "logs and checkpoints are not uploaded as artifacts"
            )
        if use_wandb and _HAS_WANDB and rank == 0:
            self._wandb_run = wandb.init(
                name=run_name, entity=wandb_entity or None,
                project=wandb_project or None, tags=tags or [],
            )
            self.run_info = {
                "entity": getattr(self._wandb_run, "entity", "") or "",
                "project": getattr(self._wandb_run, "project", "") or "",
                "run_id": getattr(self._wandb_run, "id", "") or "",
            }
        # The broadcast is a collective: EVERY process must enter it whenever
        # wandb adoption is requested, even a process whose image lacks the
        # wandb package (heterogeneous hosts) — gating it on _HAS_WANDB would
        # hang the ranks that do have it.
        if use_wandb and world > 1:
            from hvt import parallel

            self.run_info = parallel.broadcast_small_json(self.run_info, world)

    def log(self, step: int, metrics: dict[str, Any], prefix: str = "") -> None:
        record = {
            "step": step,
            "time": time.time(),
            **{(f"{prefix}/{k}" if prefix else k): _scalar(v) for k, v in metrics.items()},
        }
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self.rank == 0:
            printable = ", ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
                if k not in ("time",)
            )
            print(f"[{self.run_name}] {printable}", flush=True)
        if self._wandb_run is not None:
            self._wandb_run.log(record, step=step)

    def log_config(self, config_yaml: str) -> None:
        """Print + persist the resolved config; push to wandb.config when a
        run exists (reference utils.py:7-12)."""
        if self.rank == 0:
            print(config_yaml, flush=True)
        self._file.write(config_yaml + "\n")
        self._file.flush()
        if self._wandb_run is not None:
            import yaml as _yaml

            self._wandb_run.config.update(_yaml.safe_load(config_yaml))

    def log_artifact(
        self,
        path: str | pathlib.Path,
        name: str,
        *,
        artifact_type: str = "checkpoint",
        aliases: Optional[list[str]] = None,
        metadata: Optional[dict] = None,
    ) -> bool:
        """Upload a file/directory as a wandb Artifact with aliases.

        The reference uploads every checkpoint as an artifact with
        ``latest``/``ep{N}-ba{M}`` aliases (reference monkey_patch.py:33-91);
        downstream runs consume them through ``wandb://`` URIs. Its uploader
        skips ``.txt`` files and symlinks (reference monkey_patch.py:76-80) —
        mirrored here for directory uploads. No-ops (returning False) on
        non-zero ranks and when no run exists.
        """
        if self._wandb_run is None:
            return False
        path = pathlib.Path(path)
        if path.is_symlink() or path.suffix == ".txt":
            return False
        artifact = wandb.Artifact(
            name=name, type=artifact_type,
            metadata={"timestamp": time.time(), **(metadata or {})},
        )
        if path.is_dir():
            for sub in sorted(path.rglob("*")):
                if sub.is_symlink() or sub.suffix == ".txt" or not sub.is_file():
                    continue
                artifact.add_file(str(sub), name=str(sub.relative_to(path)))
        else:
            artifact.add_file(str(path))
        self._wandb_run.log_artifact(artifact, aliases=list(aliases or []))
        return True

    def close(self) -> None:
        self._file.close()
        if self._wandb_run is not None:
            self._wandb_run.finish()


def publish_run_metrics(config, metrics: dict, prefix: str) -> None:
    """One-shot metric publication for the downstream entry points
    (linear_probe/simpleshot/predict) through the same logging stack as
    training: jsonl under <save_root>/<run_name>/logs plus the optional
    wandb sink (the reference logs these to wandb — reference
    linear_probe.py:202,238 / simpleshot.py:200-207); a clean no-op without
    the wandb package."""
    import os

    from hvt import config as config_lib

    logger = RunLogger(
        os.path.join(config.machine.save_root, config.run_name),
        config.run_name,
        use_wandb=config.save.wandb,
        wandb_entity=config.wandb.entity,
        wandb_project=config.wandb.project,
        tags=list(config.tags),
    )
    logger.log_config(config_lib.to_yaml(config))
    logger.log(0, metrics, prefix=prefix)
    logger.close()


def _scalar(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def memory_stats(devices=None) -> dict[str, float]:
    """Per-device HBM usage (MemoryMonitor analog, reference main.py:96).

    Pass the devices to inspect (e.g. the training mesh's local devices);
    defaulting to jax.local_devices() would initialize the process-default
    backend, which a CPU-mesh run must not touch.
    """
    if devices is None:
        import jax

        devices = jax.local_devices()
    stats: dict[str, float] = {}
    for i, dev in enumerate(devices):
        m = getattr(dev, "memory_stats", lambda: None)()
        if m:
            stats[f"memory/device{i}_bytes_in_use"] = float(m.get("bytes_in_use", 0))
            peak = m.get("peak_bytes_in_use")
            if peak is not None:
                stats[f"memory/device{i}_peak_bytes"] = float(peak)
    return stats


class SpeedMonitor:
    """Sliding-window samples/sec (reference SpeedMonitor, window_size=50)."""

    def __init__(self, window_size: int = 50, num_chips: int = 1):
        self.window: collections.deque = collections.deque(maxlen=window_size)
        self.num_chips = max(1, num_chips)

    def batch_end(self, num_samples: int) -> None:
        self.window.append((time.perf_counter(), num_samples))

    def metrics(self) -> dict[str, float]:
        if len(self.window) < 2:
            return {}
        t0, _ = self.window[0]
        t1 = self.window[-1][0]
        # samples completed between the first and last tick
        samples = sum(n for _, n in list(self.window)[1:])
        elapsed = max(t1 - t0, 1e-9)
        ips = samples / elapsed
        return {
            "samples_per_sec": ips,
            "samples_per_sec_per_chip": ips / self.num_chips,
        }
