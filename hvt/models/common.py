"""Shared model building blocks and initializers."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def drop_path(x: jax.Array, rate: float, deterministic: bool, rng=None) -> jax.Array:
    """Per-sample stochastic depth (timm DropPath semantics): zero the whole
    residual branch for a sample with probability `rate`, rescale survivors."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
