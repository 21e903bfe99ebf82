"""Training objectives: flat soft CE, multitask CE, and real hierarchical CE.

All objectives share the signature ``loss(outputs, targets, mask) -> scalar``:

* ``outputs`` — logits (B, C) for flat/hxe, or a list of per-tier logits for
  multitask (the MultitaskHead contract, reference hierarchy.py:43-47),
* ``targets`` — *soft* label distributions (one-hot, possibly smoothed and/or
  mixup-mixed): (B, C) or a per-tier list,
* ``mask`` — (B,) validity weights for padded eval batches (1.0 during
  drop-last training).

The reference's flat path is Composer's soft_cross_entropy
(reference models.py:111-112); the multitask path is a coefficient-weighted
sum of per-tier CEs (reference hierarchy.py:65-94). The hxe path is a stub in
the reference (reference hierarchy.py:183-185, models.py:105-106) despite its
config knobs (reference configs.py:93-96) — implemented here for real,
following the conditional-factorization form of Bertinetto et al.,
"Making Better Mistakes" (arXiv:1912.09393): the species softmax is
aggregated to each ancestor tier, and the loss is a weighted sum of
conditional log-probabilities  -Σ_t w_t · log p(anc_t | anc_{t-1}).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hvt import hierarchy


def _masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def soft_cross_entropy(
    logits: jax.Array, targets: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """CE against a probability-distribution target, masked mean over batch."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_example = -jnp.sum(targets * logp, axis=-1)
    if mask is None:
        return jnp.mean(per_example)
    return _masked_mean(per_example, mask)


def multitask_cross_entropy(
    outputs: Sequence[jax.Array],
    targets: Sequence[jax.Array],
    coeffs: Sequence[float],
    mask: jax.Array | None = None,
) -> jax.Array:
    """coeffs · [CE per tier] (reference hierarchy.py:76-94)."""
    assert len(outputs) == len(targets) == len(coeffs), (
        f"{len(outputs)} != {len(targets)} != {len(coeffs)}"
    )
    losses = jnp.stack(
        [soft_cross_entropy(o, t, mask) for o, t in zip(outputs, targets)]
    )
    return jnp.dot(jnp.asarray(coeffs, dtype=losses.dtype), losses)


# ---------------------------------------------------------------------------
# Hierarchical cross-entropy (HXE)
# ---------------------------------------------------------------------------


def hxe_tier_weights(variant: str, alpha: float, n_tiers: int = hierarchy.N_TIERS) -> np.ndarray:
    """Per-tier weights w_t, kingdom→species.

    "uniform": all ones. "exponential": exp(-alpha · height), height = distance
    above the species tier (species h=0 … kingdom h=n_tiers-1), so small alpha
    ≈ flat CE emphasis, large alpha emphasizes fine tiers
    (config knobs: reference configs.py:93-96).
    """
    if variant == "uniform":
        return np.ones((n_tiers,), dtype=np.float32)
    if variant == "exponential":
        heights = np.arange(n_tiers - 1, -1, -1, dtype=np.float32)
        return np.exp(-alpha * heights).astype(np.float32)
    raise ValueError(f"unknown hxe_tree_weights: {variant!r}")


@dataclasses.dataclass(frozen=True)
class HXELoss:
    """Tree-factorized cross-entropy over flat species logits.

    Built from the dataset's tier table (class index → per-tier ancestor
    index, hvt.hierarchy.assign_tier_indices). Works with soft species
    targets (label smoothing / mixup compose linearly: the loss is the
    expectation of the hard-label HXE under the target distribution).
    """

    tier_table: np.ndarray  # (n_species, N_TIERS) int32
    weights: np.ndarray  # (N_TIERS,) float32
    num_classes: tuple[int, ...]  # per-tier class counts

    @classmethod
    def from_config(cls, hierarchy_cfg, class_names: Sequence[str]) -> "HXELoss":
        table, num_classes = hierarchy.assign_tier_indices(list(class_names))
        weights = hxe_tier_weights(hierarchy_cfg.hxe_tree_weights, hierarchy_cfg.hxe_alpha)
        return cls(tier_table=table, weights=weights, num_classes=num_classes)

    def __call__(
        self, logits: jax.Array, targets: jax.Array, mask: jax.Array | None = None
    ) -> jax.Array:
        """logits (B, n_species); targets soft (B, n_species)."""
        n_tiers = self.tier_table.shape[1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # (B, S)

        # log p(ancestor at tier t) via segmented logsumexp over species.
        tier_logps = []  # each (B, n_t)
        for t in range(n_tiers):
            seg = jnp.asarray(self.tier_table[:, t])
            n_t = self.num_classes[t]
            if n_t == logp.shape[-1]:
                tier_logps.append(logp)
                continue
            # logsumexp per segment: subtract segment max, exp, segment-sum, log.
            seg_max = jax.ops.segment_max(
                logp.T, seg, num_segments=n_t, indices_are_sorted=False
            )  # (n_t, B)
            shifted = jnp.exp(logp.T - seg_max[seg])
            seg_sum = jax.ops.segment_sum(shifted, seg, num_segments=n_t)
            tier_logps.append((jnp.log(seg_sum) + seg_max).T)  # (B, n_t)

        # Soft target mass per tier: q_t[c] = Σ_{s: anc_t(s)=c} q[s].
        per_example = jnp.zeros(logits.shape[:1], dtype=jnp.float32)
        prev = jnp.zeros(logits.shape[:1], dtype=jnp.float32)  # E_q[log p(anc_{t-1})]
        for t in range(n_tiers):
            seg = jnp.asarray(self.tier_table[:, t])
            n_t = self.num_classes[t]
            if n_t == logits.shape[-1]:
                q_t = targets
            else:
                q_t = jax.ops.segment_sum(targets.T, seg, num_segments=n_t).T
            exp_logp = jnp.sum(q_t * tier_logps[t], axis=-1)  # E_q[log p(anc_t)]
            # conditional term log p(anc_t | anc_{t-1}) = log p(anc_t) − log p(anc_{t-1})
            per_example = per_example - float(self.weights[t]) * (exp_logp - prev)
            prev = exp_logp

        if mask is None:
            return jnp.mean(per_example)
        return _masked_mean(per_example, mask)


def binary_cross_entropy(
    logits: jax.Array, targets: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """Per-class sigmoid BCE summed over classes, masked mean over batch.

    The MosaicML ResNet recipes train with BCE targets
    (configs/recipes/hot.yaml:4 names it; the reference's schema rejects the
    key — here it works)."""
    logits = logits.astype(jnp.float32)
    per_class = (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    per_example = jnp.sum(per_class, axis=-1)
    if mask is None:
        return jnp.mean(per_example)
    return _masked_mean(per_example, mask)


def build_objective(config, dataset_info, class_names: Sequence[str] | None = None):
    """Select the loss per config.hierarchy.variant (reference models.py:103-114)."""
    variant = config.hierarchy.variant
    if variant == "" and config.model.loss_name == "binary_cross_entropy":
        return binary_cross_entropy
    if config.model.loss_name not in ("", "binary_cross_entropy", "cross_entropy", "soft_cross_entropy"):
        raise ValueError(f"unknown model.loss_name {config.model.loss_name!r}")
    if variant == "multitask":
        coeffs = tuple(config.hierarchy.multitask_coeffs)

        def loss(outputs, targets, mask=None):
            return multitask_cross_entropy(outputs, targets, coeffs, mask)

        return loss
    if variant == "hxe":
        if class_names is None:
            raise ValueError("hxe objective needs the dataset's class names")
        return HXELoss.from_config(config.hierarchy, class_names)
    if variant == "":
        return soft_cross_entropy
    raise ValueError(f"unknown hierarchy.variant: {variant!r}")
