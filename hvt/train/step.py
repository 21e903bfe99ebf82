"""The jit-compiled train/eval steps — the framework's hot loop.

This layer replaces Composer's Trainer internals (reference main.py:104-131;
SURVEY.md §3.1 hot loop): one XLA program per step fuses device-side
normalization (reference data.py:153-164), progressive resizing
(configs/pretrain/inat21.yaml:38-42), label smoothing (algorithmic.py:88-119),
mixup, the model forward/backward, gradient clipping, the optimizer, EMA
(configs/pretrain/inat21.yaml:32-35), and metric partial sums. Gradient
reduction over the data mesh axis is inserted by XLA (GSPMD), not written here.

Shapes are static: the progressive-resize scale is a compile-time constant, so
the training loop holds one compiled executable per scale bucket
(SURVEY.md §7 'Progressive resizing under jit').
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hvt import metrics as metrics_lib
from hvt.data import device as device_prep
from hvt.train import ema as ema_lib
from hvt.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class StepSettings:
    """Static knobs baked into the compiled step."""

    num_classes: Any  # int | tuple[int, ...]
    smoothing: float = 0.0
    mixup_alpha: Optional[float] = None
    cutmix_alpha: Optional[float] = None
    grad_accum: int = 1
    ema: Optional[ema_lib.EmaConfig] = None
    # Sharpness-aware minimization: every `sam_interval` steps, recompute
    # gradients at params + rho·g/|g| (the SAM algorithm the reference's
    # recipes request, configs/recipes/hot.yaml:36-39).
    sam_rho: Optional[float] = None
    sam_interval: int = 1
    # Device-side RandAugment (depth, severity, stratified): applied to the
    # uint8 microbatch before ColOut/normalization, mirroring the host order
    # RandAugment → ColOut (hvt.data.transforms.TrainTransform.post_augment).
    randaugment: Optional[tuple[int, int, bool]] = None
    # Device-side ColOut (p_row, p_col): applied to the uint8 microbatch
    # before normalization (hvt.data.device.colout).
    colout: Optional[tuple[float, float]] = None


def _forward(model, params, batch_stats, x, train: bool, rng=None):
    """→ (out, new_batch_stats, aux_loss). ``aux_loss`` sums everything the
    model sowed into the ``aux_losses`` collection (the MoE load-balancing
    loss, hvt.ops.moe); a python 0.0 — not a traced zero — for models that
    sow nothing, so the non-MoE graph is unchanged."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    rngs = {"dropout": rng} if (train and rng is not None) else None
    if train:
        mut_cols = ["batch_stats", "aux_losses"] if batch_stats else ["aux_losses"]
        out, mut = model.apply(
            variables, x, train=True, mutable=mut_cols, rngs=rngs
        )
        aux = sum(jax.tree.leaves(mut.get("aux_losses", {})), 0.0)
        return out, mut.get("batch_stats", batch_stats), aux
    out = model.apply(variables, x, train=train, rngs=rngs)
    return out, batch_stats, 0.0


def build_train_step(
    model,
    objective: Callable,
    tx: optax.GradientTransformation,
    prep: device_prep.DevicePrep,
    settings: StepSettings,
    out_state_shardings=None,
) -> Callable:
    """Returns step(state, images, labels, mask, rng, scale) — jitted with the
    state donated; `scale` is static (progressive resizing bucket).

    ``out_state_shardings``: optional TrainState-shaped tree of
    NamedShardings pinning the output state layout (the Trainer passes the
    init-time layout under ZeRO-1 so the state's shardings are stable
    step-to-step and donation aliases; stats stay unconstrained)."""

    def microbatch_loss(params, batch_stats, images, labels, mask, rng, scale):
        if settings.randaugment:
            from hvt.data import randaugment as ra_lib

            rng, key = jax.random.split(rng)
            images = ra_lib.rand_augment(key, images, *settings.randaugment)
        if settings.colout:
            rng, key = jax.random.split(rng)
            images = device_prep.colout(key, images, *settings.colout)
        x = prep.normalize(images)
        if scale < 1.0:
            x = device_prep.progressive_resize(x, scale)
        targets = device_prep.prepare_targets(
            labels, settings.num_classes, settings.smoothing
        )
        if settings.mixup_alpha:
            rng, key = jax.random.split(rng)
            x, targets = device_prep.mixup(key, x, targets, settings.mixup_alpha)
        if settings.cutmix_alpha:
            rng, key = jax.random.split(rng)
            x, targets = device_prep.cutmix(key, x, targets, settings.cutmix_alpha)
        rng, dropout_rng = jax.random.split(rng)
        out, new_bs, aux = _forward(
            model, params, batch_stats, x, train=True, rng=dropout_rng
        )
        loss = objective(out, targets, mask) + aux
        return loss, (out, new_bs)

    def step(state: TrainState, images, labels, mask, rng, scale: float):
        rng = jax.random.fold_in(rng, state.step)
        accum = settings.grad_accum

        if accum == 1:
            grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)
            (loss, (out, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, images, labels, mask, rng, scale
            )
            stats = metrics_lib.batch_stats(out, labels, mask)

            if settings.sam_rho:
                rho = settings.sam_rho

                def sam_grads(g):
                    gnorm = jnp.maximum(optax.global_norm(g), 1e-12)
                    adv = jax.tree.map(
                        lambda p, gi: p + (rho / gnorm) * gi.astype(p.dtype),
                        state.params, g,
                    )
                    (_, _aux), g2 = grad_fn(
                        adv, state.batch_stats, images, labels, mask, rng, scale
                    )
                    return g2

                do_sam = (state.step % settings.sam_interval) == 0
                grads = jax.lax.cond(do_sam, sam_grads, lambda g: g, grads)
        else:
            # Microbatch scan: grads averaged, BN stats chained through.
            b = images.shape[0]
            if b % accum:
                raise ValueError(f"batch {b} not divisible by grad_accum {accum}")
            mb = b // accum
            resh = lambda a: a.reshape(accum, mb, *a.shape[1:])  # noqa: E731
            mb_data = (resh(images), resh(labels), resh(mask))
            grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)

            def body(carry, xs):
                bs, grads_acc, loss_acc, stats_acc, i = carry
                im, la, mk = xs
                (l, (o, bs2)), g = grad_fn(
                    state.params, bs, im, la, mk, jax.random.fold_in(rng, i), scale
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                s = metrics_lib.batch_stats(o, la, mk)
                stats_acc = jax.tree.map(jnp.add, stats_acc, s)
                return (bs2, grads_acc, l + loss_acc, stats_acc, i + 1), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            zero_stats = {
                k: jnp.zeros((), jnp.float32)
                for k in ("correct@1", "correct@5", "ce_sum", "count")
            }
            (new_bs, grads, loss_sum, stats, _), _ = jax.lax.scan(
                body,
                (state.batch_stats, zero_grads, 0.0, zero_stats, 0),
                mb_data,
            )
            grads = jax.tree.map(lambda g: g / accum, grads)
            loss = loss_sum / accum

            if settings.sam_rho:
                # SAM under accumulation: a second microbatch scan at the
                # perturbed point params + rho·g/|g|, with the same per-
                # microbatch rng folds so dropout/mixup draws match the first
                # pass (grad_accum == 1 SAM reuses its rng the same way).
                # First-pass BN statistics are kept, as in the accum == 1
                # branch (the second pass's _aux is discarded).
                rho = settings.sam_rho

                def sam_grads(g):
                    gnorm = jnp.maximum(optax.global_norm(g), 1e-12)
                    adv = jax.tree.map(
                        lambda p, gi: p + (rho / gnorm) * gi.astype(p.dtype),
                        state.params, g,
                    )

                    def body2(carry, xs):
                        bs, grads_acc, i = carry
                        im, la, mk = xs
                        (_, (_, bs2)), g2 = grad_fn(
                            adv, bs, im, la, mk,
                            jax.random.fold_in(rng, i), scale,
                        )
                        return (bs2, jax.tree.map(jnp.add, grads_acc, g2), i + 1), None

                    (_, g2_sum, _), _ = jax.lax.scan(
                        body2, (state.batch_stats, zero_grads, 0), mb_data
                    )
                    return jax.tree.map(lambda x: x / accum, g2_sum)

                do_sam = (state.step % settings.sam_interval) == 0
                grads = jax.lax.cond(do_sam, sam_grads, lambda g: g, grads)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema_p = new_ema_bs = None
        if settings.ema is not None:
            new_ema_p = ema_lib.update(settings.ema, state.step, state.ema_params, new_params)
            new_ema_bs = ema_lib.update(
                settings.ema, state.step, state.ema_batch_stats, new_bs
            )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema_p,
            ema_batch_stats=new_ema_bs,
        )
        stats = dict(stats)
        stats["loss_sum"] = loss.astype(jnp.float32)
        stats["batches"] = jnp.ones((), jnp.float32)
        stats["grad_norm"] = optax.global_norm(grads).astype(jnp.float32)
        return new_state, stats

    if out_state_shardings is not None:
        # Pin the output state layout (ZeRO-1: without this, GSPMD drifts
        # the steady state to fully-data-sharded params re-gathered every
        # step and compiles a second executable after step 1 — see
        # parallel.zero_update_shardings).
        return jax.jit(
            step,
            static_argnames=("scale",),
            donate_argnums=(0,),
            out_shardings=(out_state_shardings, None),
        )
    return jax.jit(step, static_argnames=("scale",), donate_argnums=(0,))


def build_eval_step(
    model,
    prep: device_prep.DevicePrep,
    tree_dists=None,
) -> Callable:
    """Returns eval(params, batch_stats, images, labels, mask) → metric sums.

    tree_dists (class×class) is closed over as a constant — the gather fuses
    into the step (the reference's TreeDistance metric, hierarchy.py:126-154,
    without its memory leak).
    """
    # Held as numpy until trace time: converting inside the traced function
    # embeds the matrix as a constant of the mesh-targeted executable instead
    # of eagerly allocating it on the process-default backend.
    td = None if tree_dists is None else np.asarray(tree_dists)

    def step(params, batch_stats, images, labels, mask):
        x = prep.normalize(images)
        out, _, _ = _forward(model, params, batch_stats, x, train=False)
        dists = None if td is None else jnp.asarray(td)
        return metrics_lib.batch_stats(out, labels, mask, tree_dists=dists)

    return jax.jit(step)


def build_feature_step(model, prep: device_prep.DevicePrep) -> Callable:
    """Frozen pooled features (linear probe / simpleshot; reference
    models.py:186-205)."""

    def step(params, batch_stats, images):
        x = prep.normalize(images)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, x, train=False, features_only=True)

    return jax.jit(step)
