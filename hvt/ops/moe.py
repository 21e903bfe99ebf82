"""Mixture-of-experts MLP with expert parallelism — beyond reference parity.

The reference has no MoE (its vendored SwinV2 is dense, reference
swinv2.py:43-868); this is the TPU-native expert-parallel capability in the
lineage of Swin-MoE (microsoft/Swin-Transformer's MoE variant of the same
vendored model family), built the GShard way:

* **top-1 (Switch) routing** with a static per-expert capacity — everything
  is fixed-shape einsums over one-hot dispatch/combine tensors, so XLA sees
  a dense program (no dynamic shapes, no host control flow),
* **expert parallelism rides the mesh's ``model`` axis**: the stacked
  expert weights (E, ...) shard their expert dim over ``model``
  (hvt.parallel.TP_RULES), the dispatched token buffer is constrained to
  P(model, data), and GSPMD inserts the all-to-alls — no hand-written
  collectives (the standard GShard/Switch lowering),
* the **load-balancing auxiliary loss** (Switch: E * Σ_e f_e·P_e) is sown
  into the ``aux_losses`` collection; the train step sums that collection
  into the objective (hvt/train/step.py _forward). Dropped tokens (over
  capacity) contribute zero MLP output and ride the block's residual.

Deterministic router (no jitter noise): argmax of the softmax — inference
and training route identically, which keeps the eval path free of rngs.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

trunc02 = nn.initializers.truncated_normal(stddev=0.02)
zeros_init = nn.initializers.zeros


class MoeMlp(nn.Module):
    """Drop-in MoE replacement for the transformer ``Mlp``.

    Input (B, ..., C) is flattened to (groups=B, tokens, C); each token is
    routed to one of ``num_experts`` two-layer GELU MLPs (fc1: C→hidden,
    fc2: hidden→C — the dense Mlp's shape, stacked expert-major).
    """

    num_experts: int
    hidden: int
    out: int
    capacity_factor: float = 1.25
    aux_weight: float = 0.01
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from hvt import parallel

        orig_shape = x.shape
        g = orig_shape[0]
        m = orig_shape[-1]
        s = math.prod(orig_shape[1:-1])
        e = self.num_experts
        cap = max(1, int(math.ceil(s / e * self.capacity_factor)))
        tokens = x.reshape(g, s, m)

        # Router in f32 (softmax over few logits — precision matters more
        # than bandwidth here; GShard does the same).
        wg = self.param("router", trunc02, (m, e))
        logits = tokens.astype(jnp.float32) @ wg
        probs = jax.nn.softmax(logits, axis=-1)  # (g, s, e)
        onehot = jax.nn.one_hot(jnp.argmax(probs, -1), e, dtype=jnp.float32)

        # Switch load-balancing loss: e * mean_g Σ_e f_e·P_e (=1 when
        # perfectly balanced). Sown — collected by the train step.
        f_frac = jnp.mean(onehot, axis=1)  # (g, e) fraction routed to e
        p_mean = jnp.mean(probs, axis=1)  # (g, e) mean router prob
        aux = e * jnp.mean(jnp.sum(f_frac * p_mean, axis=-1))
        self.sow(
            "aux_losses", "moe_load_balance",
            self.aux_weight * aux,
            reduce_fn=lambda a, b: a + b, init_fn=lambda: jnp.float32(0.0),
        )

        # Position of each token within its expert (0-based); tokens past
        # the static capacity are dropped (ride the residual).
        ranks = (jnp.cumsum(onehot, axis=1) - 1.0) * onehot  # (g, s, e)
        dispatch = onehot * (ranks < cap)
        slot = jax.nn.one_hot(ranks.astype(jnp.int32), cap) * dispatch[..., None]
        gate = jnp.sum(probs * dispatch, axis=-1)  # (g, s), 0 for dropped

        w1 = self.param("w1", trunc02, (e, m, self.hidden))
        b1 = self.param("b1", zeros_init, (e, self.hidden))
        w2 = self.param("w2", trunc02, (e, self.hidden, self.out))
        b2 = self.param("b2", zeros_init, (e, self.out))

        cdt = self.dtype or tokens.dtype
        slot = slot.astype(cdt)
        # Dispatch to expert-major (e, g, cap, m): GSPMD all-to-alls the
        # token dim onto the model axis here (ep_constraint).
        expert_in = parallel.ep_constraint(
            jnp.einsum("gsec,gsm->egcm", slot, tokens.astype(cdt))
        )
        h = nn.gelu(
            jnp.einsum("egcm,emh->egch", expert_in, w1.astype(cdt))
            + b1.astype(cdt)[:, None, None, :],
            approximate=False,
        )
        expert_out = parallel.ep_constraint(
            jnp.einsum("egch,ehm->egcm", h, w2.astype(cdt))
            + b2.astype(cdt)[:, None, None, :]
        )
        combine = slot * gate.astype(cdt)[:, :, None, None]
        y = jnp.einsum("gsec,egcm->gsm", combine, expert_out)
        return y.reshape(orig_shape[:-1] + (self.out,)).astype(x.dtype)
