"""Orbax checkpointing + pretrained-backbone loading.

Replaces the reference's Composer CheckpointSaver + wandb artifact URIs
(reference main.py:69-78, monkey_patch.py:33-91, algorithmic.py:35-85):

* periodic/last-only saves of the full TrainState under
  ``<save_root>/<run_name>/checkpoints/<step>`` with a keep policy,
* resume via ``load_path`` (reference main.py:118),
* backbone-only loading with head stripping for downstream runs
  (reference algorithmic.py:67-85 deletes ``fc.``/``head.`` keys) — here the
  head is the ``head`` top-level params collection, and ``strict`` controls
  whether missing/unexpected keys raise or warn.

Checkpoint URIs are local paths; a ``ckpt://<path>[:step]`` scheme replaces
the reference's ``wandb://`` scheme (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import logging
import pathlib
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

log = logging.getLogger(__name__)


def _abstract(tree):
    def conv(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    return jax.tree.map(conv, tree)


class Checkpointer:
    """Save/restore TrainState with an Orbax CheckpointManager."""

    def __init__(self, directory: str | pathlib.Path, max_to_keep: int = 1):
        self.directory = pathlib.Path(directory).absolute()
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep if max_to_keep > 0 else 1,
                create=True,
            ),
        )

    def save(self, step: int, state) -> None:
        """Asynchronous save: Orbax performs the device→host copy before
        ``manager.save`` returns (safe even though the Trainer donates the
        state buffers into the next step), and the host→disk write proceeds
        in a background thread overlapped with training — the reference's
        1024-epoch recipe checkpoints every epoch, so save latency is train
        time. Any prior in-flight write is joined first; ``latest_step``/
        ``restore``/``close`` also join, so readers never see a torn step."""
        self.manager.wait_until_finished()
        self.manager.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        """Join any in-flight background write (needed before reading the
        checkpoint files from disk, e.g. for a wandb-artifact upload)."""
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self.manager.wait_until_finished()
        return self.manager.latest_step()

    def restore(self, state, step: Optional[int] = None):
        """Restore into the structure/shardings of `state` (same-run resume)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self.manager.restore(step, args=ocp.args.StandardRestore(_abstract(state)))

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()


# ---------------------------------------------------------------------------
# Cross-run (backbone) loading
# ---------------------------------------------------------------------------

_CKPT_URI = re.compile(r"^ckpt://(?P<path>[^:]+)(?::(?P<step>\d+))?$")
_WANDB_URI = re.compile(r"^wandb://(?P<artifact>[\w./-]+:[\w./-]+)\?(?P<file>[\w./-]+)$")


def resolve_wandb_uri(uri: str, cache_dir: str = "/tmp/hvt-wandb-cache") -> str:
    """``wandb://entity/proj/name:alias?file`` → local file path
    (reference algorithmic.py:122-147). Requires the optional wandb package
    and an authenticated run; raises a clear error otherwise."""
    m = _WANDB_URI.match(uri)
    if not m:
        raise ValueError(f"uri {uri!r} doesn't match wandb://<artifact>?<file>")
    try:
        import wandb  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "wandb:// checkpoint URIs need the wandb package (not installed); "
            "use ckpt://<local-path> or swin://<path> instead"
        ) from e
    api = wandb.Api()
    artifact = api.artifact(m.group("artifact"))
    root = pathlib.Path(cache_dir) / m.group("artifact").replace("/", "_")
    downloaded = artifact.get_path(m.group("file")).download(root=str(root))
    return str(downloaded)


def parse_checkpoint_uri(uri: str) -> tuple[pathlib.Path, Optional[int]]:
    """'ckpt:///a/b:36' → (/a/b, 36); bare paths pass through."""
    m = _CKPT_URI.match(uri)
    if m:
        return pathlib.Path(m.group("path")), (
            int(m.group("step")) if m.group("step") else None
        )
    return pathlib.Path(uri), None


def load_raw(uri: str) -> dict:
    """Load a checkpoint as a raw numpy pytree (no target structure needed)."""
    path, step = parse_checkpoint_uri(uri)
    # Accept either a manager root (checkpoints/<step>/...) or a direct step dir.
    if (path / "_CHECKPOINT_METADATA").exists() or any(path.glob("*/_CHECKPOINT_METADATA")):
        with ocp.CheckpointManager(path.absolute()) as mgr:
            step = mgr.latest_step() if step is None else step
            if step is None:
                raise FileNotFoundError(f"no checkpoint steps under {path}")
            return mgr.restore(step, args=ocp.args.StandardRestore())
    raise FileNotFoundError(f"no checkpoint found at {uri}")


def strip_head(params: dict) -> dict:
    """Drop the classification-head collection (reference algorithmic.py:70-74)."""
    return {k: v for k, v in params.items() if k != "head"}


def merge_backbone(
    current: dict, loaded: dict, strict: bool = False
) -> dict:
    """Overlay loaded backbone params onto current params by path.

    strict=False logs missing/unexpected keys (reference algorithmic.py:76-85);
    strict=True raises on any mismatch.
    """
    missing: list[str] = []
    unexpected: list[str] = []

    def walk(cur, new, path):
        if isinstance(cur, dict) and isinstance(new, dict):
            out = {}
            for k in cur:
                if k in new:
                    out[k] = walk(cur[k], new[k], f"{path}/{k}")
                else:
                    missing.append(f"{path}/{k}")
                    out[k] = cur[k]
            for k in new:
                if k not in cur:
                    unexpected.append(f"{path}/{k}")
            return out
        if hasattr(new, "shape") and hasattr(cur, "shape") and tuple(new.shape) != tuple(
            cur.shape
        ):
            raise ValueError(f"shape mismatch at {path}: {cur.shape} vs {new.shape}")
        return np.asarray(new) if not isinstance(new, jax.Array) else new

    merged = walk(current, loaded, "")
    if missing:
        msg = f"missing keys in checkpoint: {', '.join(missing)}"
        if strict:
            raise KeyError(msg)
        log.warning(msg)
    if unexpected:
        msg = f"unexpected keys in checkpoint: {', '.join(unexpected)}"
        if strict:
            raise KeyError(msg)
        log.warning(msg)
    return merged


def adapt_stem_layout(src: dict, target: dict) -> dict:
    """Remap the ResNet stem param path between the plain and space-to-depth
    flavors (``stem/Conv_0/kernel`` ↔ ``stem/kernel``).

    The s2d stem holds the identical (7, 7, 3, w) kernel under a flat path
    (hvt.models.resnet.SpaceToDepthStem); without this remap a pretrained
    load across stem flavors would silently leave the stem at init
    (merge_backbone merges by path). BatchNorm paths match in both flavors.
    """
    s, t = src.get("stem"), target.get("stem")
    if not isinstance(s, dict) or not isinstance(t, dict):
        return src
    if "Conv_0" in s and "kernel" in t:  # plain checkpoint → s2d model
        s = dict(s)
        s["kernel"] = s.pop("Conv_0")["kernel"]
        return dict(src, stem=s)
    if "kernel" in s and "Conv_0" in t:  # s2d checkpoint → plain model
        s = dict(s)
        s["Conv_0"] = {"kernel": s.pop("kernel")}
        return dict(src, stem=s)
    return src


def load_pretrained(
    uri: str, params: dict, batch_stats: dict | None, strict: bool = False
) -> tuple[dict, dict | None]:
    """PretrainedBackbone algorithm analog (reference algorithmic.py:35-85):
    fetch checkpoint, take its params AND batch statistics (EMA versions
    when present), strip the head, and merge into the current variables.

    The reference loads the torch state dict, which carries BatchNorm
    running statistics alongside the weights — a frozen pretrained backbone
    (linear probe / simpleshot, reference models.py:155-205) normalizes
    with the *trained* running stats, so they must transfer with the
    parameters.

    URI schemes: ``ckpt://``/bare path (hvt Orbax checkpoints, EMA weights
    preferred), ``swin://``/``torch://`` (torch-format files of either model
    family, hvt.models.torch_compat), ``wandb://`` (an artifact holding a
    torch-format file, reference algorithmic.py:122-147)."""
    if uri.startswith("wandb://"):
        uri = f"torch://{resolve_wandb_uri(uri)}"
    if uri.startswith(("swin://", "torch://")):
        from hvt.models import torch_compat

        src, src_stats = torch_compat.load_torch_variables(uri)
    else:
        raw = load_raw(uri)
        src = raw.get("params", raw)
        src_stats = raw.get("batch_stats") or {}
        if raw.get("ema_params") is not None:
            src = raw["ema_params"]
            src_stats = raw.get("ema_batch_stats") or src_stats
    src = adapt_stem_layout(dict(src), params)
    src = strip_head(dict(src))
    target = dict(params)
    backbone_current = strip_head(target)
    merged = merge_backbone(backbone_current, src, strict=strict)
    merged.update({k: target[k] for k in target if k == "head"})

    merged_stats = batch_stats
    if batch_stats and src_stats:
        merged_stats = merge_backbone(
            strip_head(dict(batch_stats)), strip_head(dict(src_stats)),
            strict=strict,
        )
    return merged, merged_stats


def load_pretrained_backbone(
    uri: str, params: dict, strict: bool = False
) -> dict:
    """Params-only variant of :func:`load_pretrained` (kept for callers with
    no batch statistics, e.g. the SwinV2 family)."""
    merged, _ = load_pretrained(uri, params, None, strict=strict)
    return merged
