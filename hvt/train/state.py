"""Train state pytree."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    """Everything the jitted step mutates, as one donated pytree.

    ema_params/ema_batch_stats mirror Composer's EMA algorithm state
    (reference configs/pretrain/inat21.yaml:32-35): evaluation uses the EMA
    weights when enabled, training continues on the raw weights.
    """

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    ema_batch_stats: Optional[Any] = None

    @property
    def eval_params(self):
        return self.params if self.ema_params is None else self.ema_params

    @property
    def eval_batch_stats(self):
        return (
            self.batch_stats if self.ema_batch_stats is None else self.ema_batch_stats
        )


def create(model, tx, rng, sample_input, ema: bool) -> TrainState:
    # init with train=False: variable collections (incl. batch_stats) are
    # created either way, and eval mode needs no dropout rngs.
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats) if ema else None,
    )
