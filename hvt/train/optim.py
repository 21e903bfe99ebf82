"""Optimizer factories (optax) with Composer-compatible semantics.

Reference optim.py:5-58 builds one of four optimizers with a no-weight-decay
parameter grouping (1-D params, biases, and the model's `no_weight_decay()`
names get wd=0). Here:

* ``sgd`` — Nesterov momentum SGD with *coupled* decay (wd added to grads),
  matching torch.optim.SGD,
* ``adamw`` — torch.optim.AdamW: decoupled decay scaled by the full lr,
* ``decoupledsgdw`` / ``decoupledadamw`` — Composer's decoupled variants:
  decay scaled by the *schedule multiplier* (current_lr / base_lr), not by
  the absolute lr. This distinction is load-bearing for parity: the headline
  config runs DecoupledSGDW at lr 2.0 (reference configs/pretrain/inat21.yaml:24-27),
  where coupling wd to the full lr would double-count a factor of 2.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax


def decay_mask(params, extra_no_decay: Iterable[str] = ()) -> dict:
    """True where weight decay applies: ndim > 1 and path not in the skip set.

    The ndim rule covers BatchNorm/LayerNorm scales and all biases (1-D),
    equivalent to the reference's grouping (reference optim.py:48-58).
    `extra_no_decay` entries are path substrings (the analog of
    model.no_weight_decay() names, e.g. SwinV2's logit_scale / cpb_mlp,
    reference swinv2.py:810-816).
    """
    extra = tuple(extra_no_decay)

    def check(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        if any(s in path_str for s in extra):
            return False
        return jnp.ndim(leaf) > 1

    return jax.tree_util.tree_map_with_path(check, params)


def _schedule_scaled_decay(
    weight_decay: float, multiplier: optax.Schedule, mask
) -> optax.GradientTransformation:
    """Adds ``-wd · mult(step) · p`` to updates (after lr scaling), i.e.
    Composer-decoupled weight decay."""

    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("decoupled decay needs params")
        mult = multiplier(state.count)
        mask_tree = mask(params) if callable(mask) else mask

        def apply(u, p, m):
            return u - weight_decay * mult * p if m else u

        updates = jax.tree.map(apply, updates, params, mask_tree)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def build_optimizer(
    optim_cfg,
    multiplier: optax.Schedule,
    *,
    grad_clip_norm: Optional[float] = None,
    no_decay_substrings: Iterable[str] = (),
) -> optax.GradientTransformation:
    """Config → optax chain. `multiplier` is the step→[0,1] lr multiplier;
    absolute lr(step) = lr · multiplier(step).

    Gradient clipping (the reference's GradientClipping algorithm,
    configs/pretrain/inat21.yaml:43-46) is prepended so it sees raw grads.
    """
    name = optim_cfg.name.lower()
    lr, wd = float(optim_cfg.lr), float(optim_cfg.weight_decay)
    momentum = float(optim_cfg.momentum)
    lr_schedule = lambda step: lr * multiplier(step)  # noqa: E731
    mask = lambda params: decay_mask(params, no_decay_substrings)  # noqa: E731

    if name == "sgd":
        # torch SGD: coupled decay (into the gradient, before momentum).
        chain = [
            optax.add_decayed_weights(wd, mask) if wd else optax.identity(),
            optax.trace(decay=momentum, nesterov=True),
            optax.scale_by_learning_rate(lr_schedule),
        ]
    elif name == "adamw":
        # torch AdamW: decay scaled by full lr — optax.adamw matches exactly.
        return _with_clip(
            optax.adamw(lr_schedule, weight_decay=wd, mask=mask), grad_clip_norm
        )
    elif name == "decoupledadamw":
        chain = [
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(lr_schedule),
            _schedule_scaled_decay(wd, multiplier, mask) if wd else optax.identity(),
        ]
    elif name == "decoupledsgdw":
        chain = [
            optax.trace(decay=momentum, nesterov=False),
            optax.scale_by_learning_rate(lr_schedule),
            _schedule_scaled_decay(wd, multiplier, mask) if wd else optax.identity(),
        ]
    else:
        raise ValueError(f"unknown optimizer {optim_cfg.name!r}")

    return _with_clip(optax.chain(*chain), grad_clip_norm)


def _with_clip(
    tx: optax.GradientTransformation, grad_clip_norm: Optional[float]
) -> optax.GradientTransformation:
    if grad_clip_norm is None:
        return tx
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
