"""Fused windowed cosine attention — Pallas TPU kernel.

Why a kernel: XLA materializes the (nW·B, heads, N, N) attention logits in
HBM between the QKᵀ matmul, the bias/mask add, the softmax, and the AV
matmul. Per Swin stage that tensor is an order of magnitude larger than the
q/k/v it came from (N=49..256 tokens per window), so the op is HBM-bound.
This kernel keeps the whole normalize → QKᵀ → +bias → softmax → AV chain for
one window block in VMEM, reading q/k/v once and writing only the output
(SURVEY.md §7 'Pallas windowed attention').

Contract (matches hvt.ops.window_attention.window_attention_reference,
which mirrors reference swinv2.py:204-264):

    out = softmax(exp(clamp(logit_scale)) · q̂k̂ᵀ + z) · v

where z = 16·sigmoid(cpb_bias) [+ shift mask] is precomputed per (window-id,
head) OUTSIDE the kernel — it is batch-independent, so its memory footprint
is (nW, heads, N, N), tiny, and reused by every sample in the batch.

Differentiation: forward runs the kernel; backward rematerializes the
attention through the jnp reference path (jax.vjp) — numerically identical,
and the forward memory saving (no stored N×N logits) is exactly what
rematerialization wants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _merge_bias_mask(bias: jax.Array, mask: jax.Array | None) -> jax.Array:
    """(heads,N,N) bias [+ (nW,N,N) mask] → (nWZ, heads, N, N) combined."""
    if mask is None:
        return bias[None]
    return bias[None] + mask[:, None].astype(bias.dtype)


def _attention_kernel(q_ref, k_ref, v_ref, scale_ref, z_ref, o_ref):
    """One window: q/k/v (1, H, N, D); z (1, H, N, N); scale (H, 1, 1)."""
    q = q_ref[0].astype(jnp.float32)  # (H, N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]

    qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)

    attn = jax.lax.dot_general(
        qn, kn,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, N, N)
    attn = attn * scale_ref[:] + z_ref[0].astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)

    out = jax.lax.dot_general(
        attn.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, N, D)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _forward(q, k, v, scale, z, interpret=False):
    nwb, h, n, d = q.shape
    nwz = z.shape[0]

    grid = (nwb,)
    qkv_spec = pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((1, h, n, n), lambda i: (i % nwz, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((h, 1, 1), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    flops_per_win = 2 * h * n * n * d * 2
    return pl.pallas_call(
        _attention_kernel,
        out_shape=jax.ShapeDtypeStruct((nwb, h, n, d), q.dtype),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, scale_spec, z_spec],
        out_specs=pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_win * nwb,
            bytes_accessed=3 * q.size * q.dtype.itemsize + q.size * q.dtype.itemsize,
            transcendentals=nwb * h * n * n,
        ),
        interpret=interpret,
    )(q, k, v, scale, z)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _window_attention(q, k, v, logit_scale, bias, mask, interpret=False):
    scale = jnp.exp(jnp.minimum(logit_scale.astype(jnp.float32), jnp.log(100.0)))
    z = _merge_bias_mask(bias, mask)
    return _forward(q, k, v, scale, z, interpret=interpret)


def _fwd(q, k, v, logit_scale, bias, mask, interpret=False):
    return _window_attention(q, k, v, logit_scale, bias, mask, interpret), (
        q, k, v, logit_scale, bias, mask,
    )


def _bwd(interpret, residuals, g):
    from hvt.ops.window_attention import window_attention_reference

    q, k, v, logit_scale, bias, mask = residuals
    if mask is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_, ls_, b_: window_attention_reference(
                q_, k_, v_, ls_, b_, None
            ),
            q, k, v, logit_scale, bias,
        )
        dq, dk, dv, dls, db = vjp(g)
        return dq, dk, dv, dls, db, None
    _, vjp = jax.vjp(window_attention_reference, q, k, v, logit_scale, bias, mask)
    return vjp(g)


_window_attention.defvjp(_fwd, _bwd)


def window_attention_kernel(q, k, v, logit_scale, bias, mask=None, interpret=False):
    """Public entry: same contract as window_attention_reference."""
    return _window_attention(q, k, v, logit_scale, bias, mask, interpret)
