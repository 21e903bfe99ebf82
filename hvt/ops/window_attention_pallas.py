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

Differentiation: custom VJP with a fused backward kernel. The backward grid
is (nwz, batch) with batch innermost so the shared dz (bias+mask gradient)
block accumulates in VMEM across all windows that share it; dq/dk/dv are
recomputed-from-inputs flash-style, so no N×N tensor ever hits HBM in either
direction.
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


def _attention_kernel(g_blk: int, q_ref, k_ref, v_ref, scale_ref, z_ref, o_ref):
    """G windows per program: q/k/v (G, H, N, D); z (Gz, H, N, N) with
    Gz ∈ {G, 1}; scale (H, 1, 1). (window, head) merge into the single batch
    dim Mosaic's matmul supports — a leading-dims merge, layout-free."""
    h, n, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    q = q_ref[...].astype(jnp.float32).reshape(g_blk * h, n, d)
    k = k_ref[...].astype(jnp.float32).reshape(g_blk * h, n, d)
    v = v_ref[...].reshape(g_blk * h, n, d)

    qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)

    attn = jax.lax.dot_general(
        qn, kn,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G·H, N, N)
    scale_b = jnp.broadcast_to(scale_ref[:][None], (g_blk, h, 1, 1))
    z = jnp.broadcast_to(z_ref[...].astype(jnp.float32), (g_blk, h, n, n))
    attn = attn * scale_b.reshape(g_blk * h, 1, 1) + z.reshape(g_blk * h, n, n)
    attn = jax.nn.softmax(attn, axis=-1)

    out = jax.lax.dot_general(
        attn.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G·H, N, D)
    o_ref[...] = out.reshape(g_blk, h, n, d).astype(o_ref.dtype)


def _pick_block(
    nwb: int, nwz: int, heads: int, target: int = 8, max_merged: int = 64
) -> int:
    """Windows per program: a divisor of nwb that also divides the z period
    (so each block sees a contiguous run of window ids with a well-defined z
    block), with the merged batch dim g·heads capped at ``max_merged`` —
    beyond 64 Mosaic's matmul lowering fails, and the backward caps lower
    still to fit its live N×N buffers in scoped VMEM (see _backward)."""
    g = min(target, nwb)
    while g > 1 and (nwb % g or (nwz > 1 and nwz % g) or g * heads > max_merged):
        g -= 1
    return g


@functools.partial(jax.jit, static_argnames=("interpret",))
def _forward(q, k, v, scale, z, interpret=False):
    nwb, h, n, d = q.shape
    nwz = z.shape[0]
    g = _pick_block(nwb, nwz, h)
    gz = g if nwz > 1 else 1

    grid = (nwb // g,)
    qkv_spec = pl.BlockSpec((g, h, n, d), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    # Window id of element j is j % nwz; a block of g consecutive elements
    # starts at (i·g) % nwz, a multiple of g since g | nwz (or nwz == 1).
    z_spec = pl.BlockSpec((gz, h, n, n),
                          lambda i: ((i * g) % nwz // gz if nwz > 1 else 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((h, 1, 1), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    flops_per_win = 2 * h * n * n * d * 2
    return pl.pallas_call(
        functools.partial(_attention_kernel, g),
        out_shape=jax.ShapeDtypeStruct((nwb, h, n, d), q.dtype),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, scale_spec, z_spec],
        out_specs=pl.BlockSpec((g, h, n, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_win * nwb,
            bytes_accessed=3 * q.size * q.dtype.itemsize + q.size * q.dtype.itemsize,
            transcendentals=nwb * h * n * n,
        ),
        interpret=interpret,
    )(q, k, v, scale, z)


def _attention_bwd_kernel(
    g_blk: int, gz: int,
    q_ref, k_ref, v_ref, scale_ref, z_ref, g_ref,
    dq_ref, dk_ref, dv_ref, dz_ref, dscale_ref,
):
    """Backward for a block of g_blk contiguous windows; dz/dscale accumulate
    across grid steps. Grid is (window-blocks, batch) with batch innermost,
    so the dz output block (indexed by the window-block dim) stays resident
    in VMEM while every sample accumulates into it — the standard Pallas
    reduction layout."""
    wb = pl.program_id(0)
    b = pl.program_id(1)
    h, n, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]

    q = q_ref[...].astype(jnp.float32).reshape(g_blk * h, n, d)
    k = k_ref[...].astype(jnp.float32).reshape(g_blk * h, n, d)
    v = v_ref[...].astype(jnp.float32).reshape(g_blk * h, n, d)
    g = g_ref[...].astype(jnp.float32).reshape(g_blk * h, n, d)
    scale = jnp.broadcast_to(
        scale_ref[:][None], (g_blk, h, 1, 1)
    ).reshape(g_blk * h, 1, 1)

    inv_qn = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    inv_kn = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
    qn = q * inv_qn
    kn = k * inv_kn

    batched = (((2,), (2,)), ((0,), (0,)))  # contract last dim, batch merged
    cos = jax.lax.dot_general(qn, kn, batched, preferred_element_type=jnp.float32)
    z = jnp.broadcast_to(
        z_ref[...].astype(jnp.float32), (g_blk, h, n, n)
    ).reshape(g_blk * h, n, n)
    attn = jax.nn.softmax(cos * scale + z, axis=-1)

    # dv = attnᵀ g — contract over queries (axis 1 of both).
    dv = jax.lax.dot_general(
        attn, g, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # dp = g vᵀ — contract over head_dim.
    dp = jax.lax.dot_general(g, v, batched, preferred_element_type=jnp.float32)
    ds = attn * (dp - jnp.sum(dp * attn, axis=-1, keepdims=True))

    ds4 = ds.reshape(g_blk, h, n, n)
    dz_contrib = ds4 if gz == g_blk else jnp.sum(ds4, axis=0, keepdims=True)

    @pl.when(b == 0)
    def _init_dz():
        dz_ref[...] = dz_contrib.astype(dz_ref.dtype)

    @pl.when(b != 0)
    def _acc_dz():
        dz_ref[...] = dz_ref[...] + dz_contrib.astype(dz_ref.dtype)

    # Keep the partial 2D (H, N): reduce window and key axes here; the final
    # N-reduction happens outside (1-D shapes break Mosaic layout).
    dscale_contrib = jnp.sum(
        (ds * cos).reshape(g_blk, h, n, n), axis=(0, 3)
    )  # (H, N)

    @pl.when((b == 0) & (wb == 0))
    def _init_dscale():
        dscale_ref[:] = dscale_contrib.astype(dscale_ref.dtype)

    @pl.when((b != 0) | (wb != 0))
    def _acc_dscale():
        dscale_ref[:] = dscale_ref[:] + dscale_contrib.astype(dscale_ref.dtype)

    dcos = ds * scale
    # dqn = dcos kn ; dkn = dcosᵀ qn
    dqn = jax.lax.dot_general(
        dcos, kn, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dkn = jax.lax.dot_general(
        dcos, qn, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # L2-normalize backward: dx = (dxn − xn·⟨dxn, xn⟩) / ‖x‖.
    dq = (dqn - qn * jnp.sum(dqn * qn, axis=-1, keepdims=True)) * inv_qn
    dk = (dkn - kn * jnp.sum(dkn * kn, axis=-1, keepdims=True)) * inv_kn

    dq_ref[...] = dq.reshape(g_blk, h, n, d).astype(dq_ref.dtype)
    dk_ref[...] = dk.reshape(g_blk, h, n, d).astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(g_blk, h, n, d).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _backward(q, k, v, scale, z, g, interpret=False):
    nwb, h, n, d = q.shape
    nwz = z.shape[0]
    assert nwb % nwz == 0, (nwb, nwz)
    nb = nwb // nwz

    # Window-blocked like the forward: g windows per program (measured
    # 9.6 → 6.0 ms at stage-1 (4096, 3, 49, 32) vs per-window). The live
    # set is ~12 f32 (g·h, N, N)-class buffers, tile-padded to
    # (⌈N/8⌉·8, ⌈N/128⌉·128) — cap g·h so they fit the 16 MB scoped-VMEM
    # budget with headroom (g·h=48 at N=49 needs 16.7 MB and fails).
    n_sub = -(-n // 8) * 8
    n_lane = -(-n // 128) * 128
    vmem_cap = max(1, int(12e6 // (n_sub * n_lane * 48)))
    g_blk = _pick_block(nwb, nwz, h, target=8, max_merged=min(64, vmem_cap))
    gz = g_blk if nwz > 1 else 1

    if nwz > 1:
        # Element block index for (wb, b): windows [b·nwz + wb·g, +g).
        grid = (nwz // g_blk, nb)
        qkv_idx = lambda wb, b: (b * (nwz // g_blk) + wb, 0, 0, 0)
        z_idx = lambda wb, b: (wb, 0, 0, 0)
        inner = nb
    else:
        # nwz == 1: block g_blk consecutive batch elements; dz is one block
        # summed over the block axis in-kernel.
        assert nb % g_blk == 0, (nb, g_blk)
        grid = (1, nb // g_blk)
        qkv_idx = lambda wb, b: (b, 0, 0, 0)
        z_idx = lambda wb, b: (0, 0, 0, 0)

    qkv_spec = pl.BlockSpec((g_blk, h, n, d), qkv_idx, memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((gz, h, n, n), z_idx, memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((h, 1, 1), lambda wb, b: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    dscale_spec = pl.BlockSpec((h, n), lambda wb, b: (0, 0),
                               memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_attention_bwd_kernel, g_blk, gz),
        out_shape=(
            jax.ShapeDtypeStruct((nwb, h, n, d), q.dtype),  # dq
            jax.ShapeDtypeStruct((nwb, h, n, d), q.dtype),  # dk
            jax.ShapeDtypeStruct((nwb, h, n, d), q.dtype),  # dv
            jax.ShapeDtypeStruct((nwz, h, n, n), jnp.float32),  # dz
            jax.ShapeDtypeStruct((h, n), jnp.float32),  # dscale partial
        ),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, scale_spec, z_spec, qkv_spec],
        out_specs=(
            qkv_spec, qkv_spec, qkv_spec, z_spec, dscale_spec,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * h * n * n * d * nwb,
            bytes_accessed=8 * q.size * q.dtype.itemsize,
            transcendentals=nwb * h * n * n,
        ),
        interpret=interpret,
    )(q, k, v, scale, z, g)


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
    q, k, v, logit_scale, bias, mask = residuals
    ls32 = logit_scale.astype(jnp.float32)
    clamp = jnp.log(100.0)
    scale = jnp.exp(jnp.minimum(ls32, clamp))
    z = _merge_bias_mask(bias, mask)

    nwb, nwz = q.shape[0], z.shape[0]
    if nwb % nwz:
        # Shouldn't happen for window-partitioned inputs; fall back to the
        # reference VJP for odd shapes.
        from hvt.ops.window_attention import window_attention_reference

        if mask is None:
            _, vjp = jax.vjp(
                lambda q_, k_, v_, ls_, b_: window_attention_reference(
                    q_, k_, v_, ls_, b_, None
                ),
                q, k, v, logit_scale, bias,
            )
            return (*vjp(g), None)
        _, vjp = jax.vjp(window_attention_reference, q, k, v, logit_scale, bias, mask)
        return vjp(g)

    dq, dk, dv, dz, dscale = _backward(q, k, v, scale, z, g, interpret=interpret)
    dscale = jnp.sum(dscale, axis=1).reshape(-1, 1, 1)  # (H, N) partial -> (H, 1, 1)
    # z = bias[None] (+ mask[:, None]): bias grad sums the window axis; the
    # mask is a non-learned constant.
    dbias = jnp.sum(dz, axis=0).astype(bias.dtype)
    # scale = exp(min(ls, log 100)) ⇒ dls = dscale·scale·1[ls < log 100].
    dls = (dscale * scale * (ls32 < clamp)).astype(logit_scale.dtype)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        dls, dbias, dmask,
    )


_window_attention.defvjp(_fwd, _bwd)


def window_attention_kernel(q, k, v, logit_scale, bias, mask=None, interpret=False):
    """Public entry: same contract as window_attention_reference."""
    return _window_attention(q, k, v, logit_scale, bias, mask, interpret)


# ---------------------------------------------------------------------------
# Packed-qkv kernels: consume the raw (nWB, N, 3C) projection output
# ---------------------------------------------------------------------------
#
# The head-split transposes around the per-head kernels dominate SwinV2's
# layout cost: (nWB, N, 3, H, D) → three (nWB, H, N, D) arrays materializes
# padded HBM copies in the forward AND their add_any counterparts in the
# backward (profiled at ~25% of the train step). These kernels take the qkv
# matmul's natural output layout; the head split is ONE in-VMEM transpose per
# program ((g, N, 3H, D) → (g, 3H, N, D)), after which the math runs on the
# same merged (g·H) batch dim as the split kernels. No HBM transpose exists
# in either direction, and the gradient (dqkv, same packed layout) feeds the
# qkv matmul's VJP directly.


def packed_heads_forward(qkv, z, scale_ref, heads: int, g: int, n: int, c: int):
    """Per-head cosine attention on packed (g, N, 3C) f32 qkv → (g, N, C) f32.

    Head split via per-head VMEM lane slices (Mosaic supports neither a
    lane-dim shape cast nor sub-128 lane blocks, so slicing is the split).
    The single in-VMEM implementation shared by the packed kernels here and
    the fused block halves (hvt/ops/fused_halves_pallas.py) — the math must
    stay bit-identical between the two families."""
    hd = c // heads
    batched = (((2,), (2,)), ((0,), (0,)))
    outs = []
    for i in range(heads):
        q = qkv[:, :, i * hd : (i + 1) * hd]
        k = qkv[:, :, c + i * hd : c + (i + 1) * hd]
        v = qkv[:, :, 2 * c + i * hd : 2 * c + (i + 1) * hd]
        qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
        kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
        attn = jax.lax.dot_general(
            qn, kn, batched, preferred_element_type=jnp.float32
        )  # (g, N, N)
        zi = jnp.broadcast_to(z[:, i], (g, n, n))
        attn = jax.nn.softmax(attn * scale_ref[i, 0, 0] + zi, axis=-1)
        outs.append(
            jax.lax.dot_general(
                attn, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(outs, axis=-1)


def packed_heads_backward(
    qkv, gout, z, scale_ref, heads: int, g: int, n: int, c: int, gz: int
):
    """Backward of packed_heads_forward, recomputed flash-style from qkv.

    → (dqkv (g, N, 3C), dz_contrib (gz, H, N, N), dscale_contrib (H, N)),
    all f32; dz is pre-summed over the block's windows when gz == 1. Shared
    by _packed_bwd_kernel and the fused attention half."""
    hd = c // heads
    batched = (((2,), (2,)), ((0,), (0,)))
    dqs, dks, dvs, dzs, dscales = [], [], [], [], []
    for i in range(heads):
        q = qkv[:, :, i * hd : (i + 1) * hd]
        k = qkv[:, :, c + i * hd : c + (i + 1) * hd]
        v = qkv[:, :, 2 * c + i * hd : 2 * c + (i + 1) * hd]
        go = gout[:, :, i * hd : (i + 1) * hd]
        scale = scale_ref[i, 0, 0]

        inv_qn = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
        inv_kn = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
        qn = q * inv_qn
        kn = k * inv_kn

        cos = jax.lax.dot_general(qn, kn, batched, preferred_element_type=jnp.float32)
        zi = jnp.broadcast_to(z[:, i], (g, n, n))
        attn = jax.nn.softmax(cos * scale + zi, axis=-1)

        dvs.append(
            jax.lax.dot_general(
                attn, go, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
        dp = jax.lax.dot_general(go, v, batched, preferred_element_type=jnp.float32)
        ds = attn * (dp - jnp.sum(dp * attn, axis=-1, keepdims=True))

        dzs.append(ds if gz == g else jnp.sum(ds, axis=0, keepdims=True))
        dscales.append(jnp.sum(ds * cos, axis=(0, 2)).reshape(1, n))

        dcos = ds * scale
        dqn = jax.lax.dot_general(
            dcos, kn, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dkn = jax.lax.dot_general(
            dcos, qn, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dqs.append((dqn - qn * jnp.sum(dqn * qn, axis=-1, keepdims=True)) * inv_qn)
        dks.append((dkn - kn * jnp.sum(dkn * kn, axis=-1, keepdims=True)) * inv_kn)

    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (g, N, 3C) packed order
    return dqkv, jnp.stack(dzs, axis=1), jnp.concatenate(dscales, axis=0)


def _packed_fwd_kernel(g_blk: int, heads: int, qkv_ref, scale_ref, z_ref, o_ref):
    g, n, c3 = qkv_ref.shape
    c = c3 // 3
    qkv = qkv_ref[...].astype(jnp.float32)
    z = z_ref[...].astype(jnp.float32)  # (gz, H, N, N)
    out = packed_heads_forward(qkv, z, scale_ref, heads, g, n, c)
    o_ref[...] = out.astype(o_ref.dtype)


def _packed_pick(
    nwb: int, nwz: int, heads: int, n: int, target: int = 8,
    bytes_per_unit: int = 48,
) -> int:
    """Same divisibility rules as _pick_block with the scoped-VMEM cap on the
    live (g·H, N, N) f32 working set (tile-padded). bytes_per_unit is the
    empirically-calibrated live f32 bytes per (g·h, n_sub, n_lane) unit: ~48
    for the backward's ~12 live buffers, ~24 for the lighter forward."""
    n_sub = -(-n // 8) * 8
    n_lane = -(-n // 128) * 128
    vmem_cap = max(1, int(12e6 // (n_sub * n_lane * bytes_per_unit)))
    return _pick_block(nwb, nwz, heads, target=target, max_merged=min(64, vmem_cap))


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _packed_forward(qkv, scale, z, heads, interpret=False):
    nwb, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    nwz = z.shape[0]
    # target/bytes tuned empirically: larger merged g·h (e.g. 48 at stage 3)
    # measures 2-3x SLOWER despite fitting VMEM — same cap as the backward.
    g = _packed_pick(nwb, nwz, heads, n)
    gz = g if nwz > 1 else 1

    grid = (nwb // g,)
    qkv_spec = pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec(
        (gz, heads, n, n),
        lambda i: ((i * g) % nwz // gz if nwz > 1 else 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    scale_spec = pl.BlockSpec((heads, 1, 1), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_packed_fwd_kernel, g, heads),
        out_shape=jax.ShapeDtypeStruct((nwb, n, c), qkv.dtype),
        grid=grid,
        in_specs=[qkv_spec, scale_spec, z_spec],
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * heads * n * n * hd * nwb,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=nwb * heads * n * n,
        ),
        interpret=interpret,
    )(qkv, scale, z)


def _packed_bwd_kernel(
    g_blk: int, heads: int, gz: int,
    qkv_ref, scale_ref, z_ref, g_ref,
    dqkv_ref, dz_ref, dscale_ref,
):
    """Backward mirror of _packed_fwd_kernel (shared per-head loop in
    packed_heads_backward); dz and dscale accumulate across the batch grid
    dim like _attention_bwd_kernel."""
    wb = pl.program_id(0)
    b = pl.program_id(1)
    g, n, c3 = qkv_ref.shape
    c = c3 // 3

    qkv = qkv_ref[...].astype(jnp.float32)
    gout = g_ref[...].astype(jnp.float32)  # (g, N, C)
    z = z_ref[...].astype(jnp.float32)

    dqkv, dz_contrib, dscale_contrib = packed_heads_backward(
        qkv, gout, z, scale_ref, heads, g, n, c, gz
    )
    dqkv_ref[...] = dqkv.astype(dqkv_ref.dtype)

    @pl.when(b == 0)
    def _init_dz():
        dz_ref[...] = dz_contrib.astype(dz_ref.dtype)

    @pl.when(b != 0)
    def _acc_dz():
        dz_ref[...] = dz_ref[...] + dz_contrib.astype(dz_ref.dtype)

    @pl.when((b == 0) & (wb == 0))
    def _init_dscale():
        dscale_ref[:] = dscale_contrib.astype(dscale_ref.dtype)

    @pl.when((b != 0) | (wb != 0))
    def _acc_dscale():
        dscale_ref[:] = dscale_ref[:] + dscale_contrib.astype(dscale_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _packed_backward(qkv, scale, z, g_out, heads, interpret=False):
    nwb, n, c3 = qkv.shape
    nwz = z.shape[0]
    assert nwb % nwz == 0, (nwb, nwz)
    nb = nwb // nwz
    c = c3 // 3
    hd = c // heads

    g_blk = _packed_pick(nwb, nwz, heads, n)
    gz = g_blk if nwz > 1 else 1

    if nwz > 1:
        grid = (nwz // g_blk, nb)
        qkv_idx = lambda wb, b: (b * (nwz // g_blk) + wb, 0, 0)
        z_idx = lambda wb, b: (wb, 0, 0, 0)
    else:
        assert nb % g_blk == 0, (nb, g_blk)
        grid = (1, nb // g_blk)
        qkv_idx = lambda wb, b: (b, 0, 0)
        z_idx = lambda wb, b: (0, 0, 0, 0)

    qkv_spec = pl.BlockSpec((g_blk, n, c3), qkv_idx, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g_blk, n, c), qkv_idx, memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((gz, heads, n, n), z_idx, memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((heads, 1, 1), lambda wb, b: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    dscale_spec = pl.BlockSpec((heads, n), lambda wb, b: (0, 0),
                               memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_packed_bwd_kernel, g_blk, heads, gz),
        out_shape=(
            jax.ShapeDtypeStruct((nwb, n, c3), qkv.dtype),  # dqkv (packed)
            jax.ShapeDtypeStruct((nwz, heads, n, n), jnp.float32),  # dz
            jax.ShapeDtypeStruct((heads, n), jnp.float32),  # dscale partial
        ),
        grid=grid,
        in_specs=[qkv_spec, scale_spec, z_spec, out_spec],
        out_specs=(qkv_spec, z_spec, dscale_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * heads * n * n * hd * nwb,
            bytes_accessed=3 * qkv.size * qkv.dtype.itemsize,
            transcendentals=nwb * heads * n * n,
        ),
        interpret=interpret,
    )(qkv, scale, z, g_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _packed_attention(qkv, logit_scale, bias, mask, heads, interpret=False):
    scale = jnp.exp(jnp.minimum(logit_scale.astype(jnp.float32), jnp.log(100.0)))
    z = _merge_bias_mask(bias, mask)
    return _packed_forward(qkv, scale, z, heads, interpret=interpret)


def _packed_fwd(qkv, logit_scale, bias, mask, heads, interpret=False):
    return _packed_attention(qkv, logit_scale, bias, mask, heads, interpret), (
        qkv, logit_scale, bias, mask,
    )


def _packed_bwd(heads, interpret, residuals, g_out):
    qkv, logit_scale, bias, mask = residuals
    ls32 = logit_scale.astype(jnp.float32)
    clamp = jnp.log(100.0)
    scale = jnp.exp(jnp.minimum(ls32, clamp))
    z = _merge_bias_mask(bias, mask)

    dqkv, dz, dscale = _packed_backward(
        qkv, scale, z, g_out, heads, interpret=interpret
    )
    dscale = jnp.sum(dscale, axis=1).reshape(-1, 1, 1)
    dbias = jnp.sum(dz, axis=0).astype(bias.dtype)
    dls = (dscale * scale * (ls32 < clamp)).astype(logit_scale.dtype)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dqkv.astype(qkv.dtype), dls, dbias, dmask


_packed_attention.defvjp(_packed_fwd, _packed_bwd)


def window_attention_packed(qkv, logit_scale, bias, mask=None, *, num_heads,
                            interpret=False):
    """Packed entry: qkv (nWB, N, 3C) → out (nWB, N, C). Same math as
    window_attention_kernel with the head split done inside the kernels."""
    return _packed_attention(qkv, logit_scale, bias, mask, num_heads, interpret)
