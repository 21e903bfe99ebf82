"""Fused SwinV2 block halves, take two — Pallas TPU kernels with fused VJPs.

The first-generation mega-kernels (hvt.ops.swin_block_pallas) keep one image
per grid step and do the window grouping *inside* the kernel; the 5-D
window-grouping transposes plus per-head stack/concat chains make Mosaic's
layout assignment explode (>8 min compiles at stage-1 shapes), and their
gradients rematerialize through the jnp path, so training never benefits.

These kernels instead stay in the layouts the production packed attention
kernels (hvt.ops.window_attention_pallas) already compile fast in, and are
differentiable end-to-end with fused *backward* kernels:

  attention half: xw (nWB, N, C) window tokens →
                  qkv proj → cosine window attention (+bias/mask) → out proj
                  → res-post-norm          (reference swinv2.py:390-431,
                  minus roll/partition/residual which stay in XLA)
  mlp half:       x (T, C) flat tokens →
                  fc1 → GELU → fc2 → res-post-norm   (swinv2.py:433-434)

Forward traffic per half drops from ~5 activation passes (write+read qkv or
the 4C hidden, write+read the branch pre-norm) to read-x + write-branch; the
backward recomputes everything from x in VMEM and writes dx plus
VMEM-accumulated parameter gradients (f32), so no intermediate ever hits HBM
in either direction.

LayerNorm placement note: the reference normalizes after window_reverse+roll
(swinv2.py:431), but LN is per-token and both ops are token permutations, so
normalizing inside the kernel (pre-reverse) is exact.

GELU uses the Abramowitz–Stegun 7.1.26 erf polynomial (|err| ≤ 1.5e-7 —
Mosaic has no erf lowering); its analytic derivative uses the same
polynomial, so fwd/bwd are consistent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hvt.ops.window_attention_pallas import (
    _merge_bias_mask,
    _packed_pick,
    packed_heads_backward,
    packed_heads_forward,
)

_LN_EPS = 1e-5


def _erf(x: jax.Array) -> jax.Array:
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _gelu(x: jax.Array) -> jax.Array:
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _gelu_grad(x: jax.Array) -> jax.Array:
    cdf = 0.5 * (1.0 + _erf(x * _INV_SQRT2))
    return cdf + x * _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)


def _ln_fwd(x: jax.Array, scale: jax.Array, bias: jax.Array):
    """LayerNorm over the last dim in f32; returns (out, normed, inv_std)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    normed = xc * inv
    return normed * scale + bias, normed, inv


def _ln_bwd(g: jax.Array, normed: jax.Array, inv: jax.Array, scale: jax.Array):
    """dx for y = normed·scale + bias given upstream g. (dscale/dbias are
    simple sums the caller accumulates.)"""
    gn = g * scale
    mean_gn = jnp.mean(gn, axis=-1, keepdims=True)
    mean_gn_n = jnp.mean(gn * normed, axis=-1, keepdims=True)
    return (gn - mean_gn - normed * mean_gn_n) * inv


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """bf16-in / f32-out 2D matmul (single MXU pass, f32 accumulate — the
    same arithmetic XLA uses for a bf16 Dense layer)."""
    return jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _dot_t(a: jax.Array, b: jax.Array) -> jax.Array:
    """aᵀ @ b via dim-0 contraction (weight-gradient shape), f32 out."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _rows_per_block(t: int, target: int = 512) -> int:
    """Largest divisor of t that is ≤ target and a multiple of 8 (sublane
    tile), falling back to the largest divisor ≤ target."""
    best = 1
    for r in range(8, target + 1, 8):
        if t % r == 0:
            best = r
    if best > 1:
        return best
    for r in range(min(target, t), 0, -1):
        if t % r == 0:
            return r
    return 1


# ---------------------------------------------------------------------------
# MLP half: branch = norm2(fc2(gelu(fc1(x))))  on flat (T, C) tokens
# ---------------------------------------------------------------------------


def _mlp_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref, lnb_ref, o_ref):
    x = x_ref[...]
    pre = _dot(x, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    hidden = _gelu(pre)
    out = _dot(hidden, w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    branch, _, _ = _ln_fwd(
        out, lns_ref[...].astype(jnp.float32), lnb_ref[...].astype(jnp.float32)
    )
    o_ref[...] = branch.astype(o_ref.dtype)


def _mlp_bwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref, g_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dlns_ref, dlnb_ref,
):
    i = pl.program_id(0)
    x = x_ref[...]
    g = g_ref[...].astype(jnp.float32)
    lns = lns_ref[...].astype(jnp.float32)

    # Recompute forward (nothing was saved).
    pre = _dot(x, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    hidden = _gelu(pre)
    out = _dot(hidden, w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    mu = jnp.mean(out, axis=-1, keepdims=True)
    xc = out - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    normed = xc * inv

    dout = _ln_bwd(g, normed, inv, lns)
    dlns = jnp.sum(g * normed, axis=0, keepdims=True)  # (1, C)
    dlnb = jnp.sum(g, axis=0, keepdims=True)

    # fc2 backward.
    dhidden = jax.lax.dot_general(
        dout.astype(jnp.bfloat16), w2_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2 = _dot_t(hidden, dout)
    db2 = jnp.sum(dout, axis=0, keepdims=True)

    dpre = dhidden * _gelu_grad(pre)
    dx = jax.lax.dot_general(
        dpre.astype(jnp.bfloat16), w1_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw1 = _dot_t(x, dpre)
    db1 = jnp.sum(dpre, axis=0, keepdims=True)

    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2
        dlns_ref[...] = dlns
        dlnb_ref[...] = dlnb

    @pl.when(i != 0)
    def _acc():
        dw1_ref[...] = dw1_ref[...] + dw1
        db1_ref[...] = db1_ref[...] + db1
        dw2_ref[...] = dw2_ref[...] + dw2
        db2_ref[...] = db2_ref[...] + db2
        dlns_ref[...] = dlns_ref[...] + dlns
        dlnb_ref[...] = dlnb_ref[...] + dlnb


def _mlp_target_rows(c: int) -> int:
    """Row-block target scaled down with width so the backward's live
    (rows, hidden) f32 buffers stay within scoped VMEM at every stage."""
    return max(64, (512 * 96) // c)


def _mlp_specs(t: int, c: int, hidden: int):
    r = _rows_per_block(t, target=_mlp_target_rows(c))
    grid = (t // r,)
    row = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return r, grid, row, const


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_forward(x, w1, b1, w2, b2, lns, lnb, interpret=False):
    t, c = x.shape
    hidden = w1.shape[1]
    r, grid, row, const = _mlp_specs(t, c, hidden)
    return pl.pallas_call(
        _mlp_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
        grid=grid,
        in_specs=[row, const(c, hidden), const(1, hidden), const(hidden, c),
                  const(1, c), const(1, c), const(1, c)],
        out_specs=row,
        cost_estimate=pl.CostEstimate(
            flops=4 * t * c * hidden,
            bytes_accessed=2 * t * c * x.dtype.itemsize,
            transcendentals=t * hidden,
        ),
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
      lns.reshape(1, -1), lnb.reshape(1, -1))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_backward(x, w1, b1, w2, b2, lns, g, interpret=False):
    t, c = x.shape
    hidden = w1.shape[1]
    r, grid, row, const = _mlp_specs(t, c, hidden)
    return pl.pallas_call(
        _mlp_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t, c), x.dtype),          # dx
            jax.ShapeDtypeStruct((c, hidden), jnp.float32),  # dw1
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),  # db1
            jax.ShapeDtypeStruct((hidden, c), jnp.float32),  # dw2
            jax.ShapeDtypeStruct((1, c), jnp.float32),       # db2
            jax.ShapeDtypeStruct((1, c), jnp.float32),       # dlns
            jax.ShapeDtypeStruct((1, c), jnp.float32),       # dlnb
        ),
        grid=grid,
        in_specs=[row, const(c, hidden), const(1, hidden), const(hidden, c),
                  const(1, c), const(1, c), row],
        out_specs=(row, const(c, hidden), const(1, hidden), const(hidden, c),
                   const(1, c), const(1, c), const(1, c)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * t * c * hidden,
            bytes_accessed=4 * t * c * x.dtype.itemsize,
            transcendentals=2 * t * hidden,
        ),
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1), lns.reshape(1, -1), g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def mlp_half(x, w1, b1, w2, b2, lns, lnb, interpret=False):
    """branch = norm2(fc2(gelu(fc1(x)))) for flat tokens x (T, C)."""
    return _mlp_forward(x, w1, b1, w2, b2, lns, lnb, interpret=interpret)


def _mlp_half_fwd(x, w1, b1, w2, b2, lns, lnb, interpret=False):
    out = _mlp_forward(x, w1, b1, w2, b2, lns, lnb, interpret=interpret)
    return out, (x, w1, b1, w2, b2, lns)


def _mlp_half_bwd(interpret, res, g):
    x, w1, b1, w2, b2, lns = res
    dx, dw1, db1, dw2, db2, dlns, dlnb = _mlp_backward(
        x, w1, b1, w2, b2, lns, g, interpret=interpret
    )
    return (
        dx.astype(x.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(-1).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(-1).astype(b2.dtype),
        dlns.reshape(-1).astype(lns.dtype),
        dlnb.reshape(-1).astype(lns.dtype),
    )


mlp_half.defvjp(_mlp_half_fwd, _mlp_half_bwd)


# ---------------------------------------------------------------------------
# Attention half: branch = norm1(proj(window_attn(qkv(xw))))
# on window tokens xw (nWB, N, C)
# ---------------------------------------------------------------------------


def _per_window_dot(x3: jax.Array, w) -> jax.Array:
    """(g, N, A) @ (A, B) → (g, N, B) as g unrolled 2D dots.

    Mosaic rejects both the (g, N, A) → (g·N, A) sublane merge (N=49 is not
    tile-aligned) and bare rank-3×rank-2 contractions; per-window 2D matmuls
    plus a leading-axis stack are layout-free."""
    g = x3.shape[0]
    return jnp.stack([_dot(x3[j], w) for j in range(g)])


def _per_window_dot_rhs_t(x3: jax.Array, w) -> jax.Array:
    """(g, N, B) @ (A, B)ᵀ → (g, N, A): contract dim 1 of w (matmul VJP wrt
    the input)."""
    g = x3.shape[0]
    return jnp.stack(
        [
            jax.lax.dot_general(
                x3[j].astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for j in range(g)
        ]
    )


def _attn_fwd_kernel(
    heads: int,
    x_ref, wqkv_ref, bqkv_ref, scale_ref, z_ref, wproj_ref, bproj_ref,
    lns_ref, lnb_ref, o_ref,
):
    g, n, c = x_ref.shape
    x3 = x_ref[...]
    qkv = _per_window_dot(x3, wqkv_ref[...])  # (g, N, 3C) f32
    qkv = qkv + bqkv_ref[...].astype(jnp.float32)[None]
    z = z_ref[...].astype(jnp.float32)

    out = packed_heads_forward(qkv, z, scale_ref, heads, g, n, c)  # (g, N, C)
    proj = _per_window_dot(out, wproj_ref[...])
    proj = proj + bproj_ref[...].astype(jnp.float32)[None]
    branch, _, _ = _ln_fwd(
        proj, lns_ref[...].astype(jnp.float32), lnb_ref[...].astype(jnp.float32)
    )
    o_ref[...] = branch.astype(o_ref.dtype)


def _attn_bwd_kernel(
    heads: int, gz: int,
    x_ref, wqkv_ref, bqkv_ref, scale_ref, z_ref, wproj_ref, bproj_ref,
    lns_ref, g_ref,
    dx_ref, dwqkv_ref, dbqkv_ref, dscale_ref, dz_ref, dwproj_ref, dbproj_ref,
    dlns_ref, dlnb_ref,
):
    wb = pl.program_id(0)
    b = pl.program_id(1)
    first = (b == 0) & (wb == 0)
    g_blk, n, c = x_ref.shape

    x3 = x_ref[...]
    gout = g_ref[...].astype(jnp.float32)  # (g, N, C)
    z = z_ref[...].astype(jnp.float32)
    lns = lns_ref[...].astype(jnp.float32)

    # --- recompute forward ---
    qkv3 = _per_window_dot(x3, wqkv_ref[...])
    qkv3 = qkv3 + bqkv_ref[...].astype(jnp.float32)[None]
    attn_out = packed_heads_forward(qkv3, z, scale_ref, heads, g_blk, n, c)
    proj = _per_window_dot(attn_out, wproj_ref[...])
    proj = proj + bproj_ref[...].astype(jnp.float32)[None]
    mu = jnp.mean(proj, axis=-1, keepdims=True)
    xc = proj - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    normed = xc * inv

    # --- norm1 backward ---
    dproj = _ln_bwd(gout, normed, inv, lns)  # (g, N, C)
    dlns = jnp.sum(jnp.sum(gout * normed, axis=0), axis=0, keepdims=True)
    dlnb = jnp.sum(jnp.sum(gout, axis=0), axis=0, keepdims=True)

    # --- proj backward ---
    dao3 = _per_window_dot_rhs_t(dproj, wproj_ref[...])
    dwproj = sum(_dot_t(attn_out[j], dproj[j]) for j in range(g_blk))
    dbproj = jnp.sum(jnp.sum(dproj, axis=0), axis=0, keepdims=True)

    # --- attention backward (shared per-head loop, window_attention_pallas) ---
    dqkv, dz_contrib, dscale_contrib = packed_heads_backward(
        qkv3, dao3, z, scale_ref, heads, g_blk, n, c, gz
    )

    # --- qkv projection backward ---
    dx = _per_window_dot_rhs_t(dqkv, wqkv_ref[...])
    dwqkv = sum(_dot_t(x3[j], dqkv[j]) for j in range(g_blk))
    dbqkv = jnp.sum(jnp.sum(dqkv, axis=0), axis=0, keepdims=True)

    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(b == 0)
    def _init_dz():
        dz_ref[...] = dz_contrib.astype(dz_ref.dtype)

    @pl.when(b != 0)
    def _acc_dz():
        dz_ref[...] = dz_ref[...] + dz_contrib.astype(dz_ref.dtype)

    @pl.when(first)
    def _init_acc():
        dwqkv_ref[...] = dwqkv
        dbqkv_ref[...] = dbqkv
        dscale_ref[...] = dscale_contrib
        dwproj_ref[...] = dwproj
        dbproj_ref[...] = dbproj
        dlns_ref[...] = dlns
        dlnb_ref[...] = dlnb

    @pl.when(~first)
    def _acc():
        dwqkv_ref[...] = dwqkv_ref[...] + dwqkv
        dbqkv_ref[...] = dbqkv_ref[...] + dbqkv
        dscale_ref[...] = dscale_ref[...] + dscale_contrib
        dwproj_ref[...] = dwproj_ref[...] + dwproj
        dbproj_ref[...] = dbproj_ref[...] + dbproj
        dlns_ref[...] = dlns_ref[...] + dlns
        dlnb_ref[...] = dlnb_ref[...] + dlnb


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _attn_forward(x, wqkv, bqkv, scale, z, wproj, bproj, lns, lnb, heads,
                  interpret=False):
    nwb, n, c = x.shape
    nwz = z.shape[0]
    g = _packed_pick(nwb, nwz, heads, n)
    gz = g if nwz > 1 else 1

    grid = (nwb // g,)
    x_spec = pl.BlockSpec((g, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec(
        (gz, heads, n, n),
        lambda i: ((i * g) % nwz // gz if nwz > 1 else 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, heads),
        out_shape=jax.ShapeDtypeStruct((nwb, n, c), x.dtype),
        grid=grid,
        in_specs=[x_spec, const(c, 3 * c), const(1, 3 * c), const(heads, 1, 1),
                  z_spec, const(c, c), const(1, c), const(1, c), const(1, c)],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=(8 * c * c + 4 * heads * n * (c // heads) * 2) * n * nwb,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=nwb * heads * n * n,
        ),
        interpret=interpret,
    )(x, wqkv, bqkv.reshape(1, -1), scale, z, wproj, bproj.reshape(1, -1),
      lns.reshape(1, -1), lnb.reshape(1, -1))


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _attn_backward(x, wqkv, bqkv, scale, z, wproj, bproj, lns, g_out, heads,
                   interpret=False):
    nwb, n, c = x.shape
    nwz = z.shape[0]
    assert nwb % nwz == 0, (nwb, nwz)
    nb = nwb // nwz

    g_blk = _packed_pick(nwb, nwz, heads, n)
    gz = g_blk if nwz > 1 else 1

    if nwz > 1:
        grid = (nwz // g_blk, nb)
        x_idx = lambda wb, b: (b * (nwz // g_blk) + wb, 0, 0)
        z_idx = lambda wb, b: (wb, 0, 0, 0)
    else:
        assert nb % g_blk == 0, (nb, g_blk)
        grid = (1, nb // g_blk)
        x_idx = lambda wb, b: (b, 0, 0)
        z_idx = lambda wb, b: (0, 0, 0, 0)

    x_spec = pl.BlockSpec((g_blk, n, c), x_idx, memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((gz, heads, n, n), z_idx, memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda wb, b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, heads, gz),
        out_shape=(
            jax.ShapeDtypeStruct((nwb, n, c), x.dtype),          # dx
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),        # dwqkv
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),        # dbqkv
            jax.ShapeDtypeStruct((heads, n), jnp.float32),        # dscale partial
            jax.ShapeDtypeStruct((nwz, heads, n, n), jnp.float32),  # dz
            jax.ShapeDtypeStruct((c, c), jnp.float32),            # dwproj
            jax.ShapeDtypeStruct((1, c), jnp.float32),            # dbproj
            jax.ShapeDtypeStruct((1, c), jnp.float32),            # dlns
            jax.ShapeDtypeStruct((1, c), jnp.float32),            # dlnb
        ),
        grid=grid,
        in_specs=[x_spec, const(c, 3 * c), const(1, 3 * c), const(heads, 1, 1),
                  z_spec, const(c, c), const(1, c), const(1, c), x_spec],
        out_specs=(
            x_spec, const(c, 3 * c), const(1, 3 * c), const(heads, n), z_spec,
            const(c, c), const(1, c), const(1, c), const(1, c),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(24 * c * c + 10 * heads * n * (c // heads)) * n * nwb,
            bytes_accessed=4 * x.size * x.dtype.itemsize,
            transcendentals=2 * nwb * heads * n * n,
        ),
        interpret=interpret,
    )(x, wqkv, bqkv.reshape(1, -1), scale, z, wproj, bproj.reshape(1, -1),
      lns.reshape(1, -1), g_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def attention_half(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj,
                   lns, lnb, heads, interpret=False):
    """branch = norm1(proj(cosine_window_attention(qkv(x)))) for window
    tokens x (nWB, N, C). bias is the (H, N, N) cpb bias; mask the optional
    (nW, N, N) shift mask."""
    scale = jnp.exp(jnp.minimum(logit_scale.astype(jnp.float32), jnp.log(100.0)))
    z = _merge_bias_mask(bias, mask)
    return _attn_forward(x, wqkv, bqkv, scale, z, wproj, bproj, lns, lnb,
                         heads, interpret=interpret)


def _attn_half_fwd(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj,
                   lns, lnb, heads, interpret=False):
    out = attention_half(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj,
                         lns, lnb, heads, interpret)
    return out, (x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj, lns)


def _attn_half_bwd(heads, interpret, res, g_out):
    x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj, lns = res
    ls32 = logit_scale.astype(jnp.float32)
    clamp = jnp.log(100.0)
    scale = jnp.exp(jnp.minimum(ls32, clamp))
    z = _merge_bias_mask(bias, mask)

    (dx, dwqkv, dbqkv, dscale, dz, dwproj, dbproj, dlns, dlnb) = _attn_backward(
        x, wqkv, bqkv, scale, z, wproj, bproj, lns, g_out, heads,
        interpret=interpret,
    )
    dscale = jnp.sum(dscale, axis=1).reshape(-1, 1, 1)
    dbias = jnp.sum(dz, axis=0).astype(bias.dtype)
    dls = (dscale * scale * (ls32 < clamp)).astype(logit_scale.dtype)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (
        dx.astype(x.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.reshape(-1).astype(bqkv.dtype),
        dls,
        dbias,
        dmask,
        dwproj.astype(wproj.dtype),
        dbproj.reshape(-1).astype(bproj.dtype),
        dlns.reshape(-1).astype(lns.dtype),
        dlnb.reshape(-1).astype(lns.dtype),
    )


attention_half.defvjp(_attn_half_fwd, _attn_half_bwd)


def mlp_half_spmd(x, w1, b1, w2, b2, lns, lnb, interpret=False):
    """mlp_half, shard_mapped over the data axis when a multi-device kernel
    mesh is active (see hvt.parallel.shard_map_kernel). x's leading flat-token
    dim is batch-major, so sharding it over 'data' splits whole images."""
    from hvt import parallel

    fn = parallel.shard_map_kernel(
        lambda *a: mlp_half(*a, interpret), batch_argnums=(0,), n_args=7
    )
    return fn(x, w1, b1, w2, b2, lns, lnb)


def attention_half_spmd(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj,
                        lns, lnb, heads, interpret=False):
    """attention_half, shard_mapped over the data axis when a multi-device
    kernel mesh is active. x (nWB, N, C) is batch-major (window-minor), so a
    data-axis split keeps whole images per shard and the per-window shift
    mask indexing (window id = row % nW) stays valid."""
    from hvt import parallel

    fn = parallel.shard_map_kernel(
        lambda x_, wq_, bq_, ls_, b_, m_, wp_, bp_, s_, o_: attention_half(
            x_, wq_, bq_, ls_, b_, m_, wp_, bp_, s_, o_, heads, interpret
        ),
        batch_argnums=(0,),
        n_args=10,
    )
    return fn(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj, lns, lnb)


def fits_vmem(
    c: int, heads: int, n: int, mlp_hidden: int | None = None,
    train: bool = True,
) -> bool:
    """Conservative estimate of whether the fused kernel's resident set
    (weights [+ f32 weight-gradient accumulators when differentiated] +
    live activation blocks) fits the ~16 MB/core VMEM budget. SwinV2-T's
    stage 4 (C=768) exceeds it for training — callers fall back per-block."""
    if mlp_hidden is not None:
        r = _mlp_target_rows(c)
        weights = 2 * c * mlp_hidden * 2  # bf16 w1+w2
        grads = 2 * c * mlp_hidden * 4 if train else 0
        live = (6 if train else 3) * r * max(mlp_hidden, c) * 4
    else:
        weights = 4 * c * c * 2  # bf16 qkv+proj
        grads = 4 * c * c * 4 if train else 0
        n_pad = (-(-n // 8) * 8) * (-(-n // 128) * 128)
        live = 8 * n_pad * 48 + 6 * 8 * n * 4 * c
    return weights + grads + live < 12 * 2**20

