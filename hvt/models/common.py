"""Shared model building blocks and initializers."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class GroupedBatchNorm(nn.Module):
    """BatchNorm whose training statistics are computed per batch *group* —
    the semantics of the reference's per-GPU DDP BatchNorm (each of the
    reference's 4 GPUs normalizes over its own 512-sample shard,
    SURVEY.md §7 'Numerical parity' hard part). ``groups=1`` is exactly
    global-batch BN (hvt's GSPMD default); ``groups=N`` emulates N data-
    parallel workers regardless of the actual mesh (ghost batch norm).

    Parameter/variable tree matches flax ``nn.BatchNorm`` (params
    ``scale``/``bias``, batch_stats ``mean``/``var``), so the flag can flip
    on existing checkpoints; running statistics are updated with the pooled
    (global) moments either way.
    """

    groups: int = 1
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None
    scale_init: nn.initializers.Initializer = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (c,)
        )

        dtype = self.dtype or x.dtype
        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
            y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
            return (y * scale + bias).astype(dtype)

        b = x.shape[0]
        g = self.groups
        if b % g:
            raise ValueError(f"batch {b} not divisible by bn groups {g}")
        xg = x.astype(jnp.float32).reshape(g, b // g, *x.shape[1:])
        axes = tuple(range(1, xg.ndim - 1))  # per-group batch+spatial
        mean_g = jnp.mean(xg, axis=axes, keepdims=True)  # (g, 1, .., c)
        var_g = jnp.mean(jnp.square(xg - mean_g), axis=axes, keepdims=True)

        y = (xg - mean_g) * jax.lax.rsqrt(var_g + self.epsilon)
        y = y.reshape(x.shape) * scale + bias

        if not self.is_initializing():
            # Pooled (law-of-total-variance) global moments for the running
            # statistics, matching what a single global-batch BN would track.
            gm = jnp.mean(mean_g.reshape(g, c), axis=0)
            gv = jnp.mean(var_g.reshape(g, c), axis=0) + jnp.mean(
                jnp.square(mean_g.reshape(g, c) - gm), axis=0
            )
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * gm
            ra_var.value = m * ra_var.value + (1 - m) * gv
        return y.astype(dtype)


class PallasBatchNorm(nn.Module):
    """Drop-in ``nn.BatchNorm`` whose training statistics and gradient
    reductions run through Pallas channel-reduction kernels
    (hvt/ops/bn_stats_pallas.py).

    **Measured: keep this OFF for the conv models** (the ``bn_pallas``
    flag defaults to False). On TPU, XLA fuses the BN statistics and
    gradient reductions *into the adjacent convolutions* (multi-output
    kOutput fusions running at HBM speed of light — see BENCH.md roofline);
    an opaque custom call in that position forces extra layout copies and a
    separate stats pass, measured 36% slower on a conv+BN+ReLU pair at
    ResNet-50 stage-1 shapes. The module is kept as an ablation tool and as
    the harness for the channel-reduction kernels, which are useful where a
    reduction cannot fuse into a producer.

    Parameter/variable tree matches flax ``nn.BatchNorm`` (params
    ``scale``/``bias``, batch_stats ``mean``/``var``) so the flag can flip
    on existing checkpoints. Off-TPU (and whenever the kernels decline a
    shape) the same custom-VJP formulas evaluate in jnp — numerics are
    identical up to reduction order. Eval mode is the standard elementwise
    running-stat normalization either way.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None
    scale_init: nn.initializers.Initializer = nn.initializers.ones
    use_pallas: bool = True  # pallas-vs-jnp inside bn_train; module opt-in is bn_pallas

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from hvt.ops import bn_stats_pallas

        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (c,)
        )
        dtype = self.dtype or x.dtype

        if self.use_running_average:
            y = (x.astype(jnp.float32) - ra_mean.value) * jax.lax.rsqrt(
                ra_var.value + self.epsilon
            )
            return (y * scale + bias).astype(dtype)

        y2d, mean, var = bn_stats_pallas.bn_train(
            x.reshape(-1, c),
            scale.astype(jnp.float32),
            bias.astype(jnp.float32),
            self.epsilon,
            dtype,
            self.use_pallas,
            False,
        )
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        return y2d.reshape(x.shape)


class TransformerMlp(nn.Module):
    """Two-layer GELU MLP with the ``mlp/fc1`` / ``mlp/fc2`` parameter paths
    that hvt.parallel.TP_RULES key on (fc1 column-parallel, fc2 row-parallel
    over the mesh's model axis). Exact (erf) GELU, matching torch nn.GELU /
    HF ACT2FN["gelu"]."""

    hidden: int
    out: int
    dtype: jnp.dtype | None = None
    kernel_init: nn.initializers.Initializer = trunc02

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, kernel_init=self.kernel_init,
                     name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, kernel_init=self.kernel_init,
                        name="fc2")(x)


def drop_path(x: jax.Array, rate: float, deterministic: bool, rng=None) -> jax.Array:
    """Per-sample stochastic depth (timm DropPath semantics): zero the whole
    residual branch for a sample with probability `rate`, rescale survivors."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
