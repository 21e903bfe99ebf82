"""Durations and learning-rate schedules.

Implements the reference's Composer time grammar ("36ep", "100ba", "8ep")
and its two schedulers: CosineAnnealingWithWarmupScheduler (default,
reference configs.py:53-54) and ConstantWithWarmupScheduler
(reference configs/pretrain/r50_multitask_long.yaml:9-12).

Schedules are step → multiplier functions (multiplier of the base lr); the
optimizer factory composes them with the base lr. Keeping the *multiplier*
separate matters because Composer's decoupled weight decay scales by the
schedule multiplier, not by the absolute lr (see hvt.train.optim).
"""

from __future__ import annotations

import dataclasses
import re

import jax.numpy as jnp
import optax

_DURATION_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(ep|ba|dur)\s*$")


@dataclasses.dataclass(frozen=True)
class Duration:
    value: float
    unit: str  # "ep" | "ba" | "dur"

    def to_steps(self, steps_per_epoch: int, total_steps: int | None = None) -> int:
        if self.unit == "ba":
            return int(self.value)
        if self.unit == "ep":
            return int(self.value * steps_per_epoch)
        if self.unit == "dur":
            if total_steps is None:
                raise ValueError("'dur' duration needs total_steps")
            return int(self.value * total_steps)
        raise ValueError(self.unit)


def parse_duration(text: str | int | float) -> Duration:
    """'36ep' → Duration(36, 'ep'); bare numbers mean batches."""
    if isinstance(text, (int, float)):
        return Duration(float(text), "ba")
    m = _DURATION_RE.match(text)
    if not m:
        raise ValueError(f"cannot parse duration {text!r} (want e.g. '36ep', '100ba')")
    return Duration(float(m.group(1)), m.group(2))


def cosine_with_warmup(
    warmup_steps: int, total_steps: int, alpha_f: float = 0.0
) -> optax.Schedule:
    """Linear warmup 0→1 over warmup_steps, then cosine 1→alpha_f over the
    remaining steps (Composer CosineAnnealingWithWarmupScheduler semantics)."""

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        frac = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        frac = jnp.clip(frac, 0.0, 1.0)
        cos = alpha_f + (1.0 - alpha_f) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def constant_with_warmup(warmup_steps: int) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        return jnp.minimum(warm, 1.0)

    return schedule


def build_multiplier_schedule(
    scheduler_cfg, steps_per_epoch: int, total_steps: int
) -> optax.Schedule:
    """Config → step→multiplier schedule (reference main.py:63-64 builds the
    Composer scheduler by name)."""
    args = dict(scheduler_cfg.args)
    warmup = parse_duration(args.pop("t_warmup", "8ep")).to_steps(steps_per_epoch, total_steps)

    name = scheduler_cfg.name
    if name in ("CosineAnnealingWithWarmupScheduler", "cosine_with_warmup"):
        alpha_f = float(args.pop("alpha_f", 0.0))
        return cosine_with_warmup(warmup, total_steps, alpha_f)
    if name in ("ConstantWithWarmupScheduler", "constant_with_warmup"):
        args.pop("alpha", None)
        return constant_with_warmup(warmup)
    raise ValueError(f"unknown scheduler {name!r}")
