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

Round-4 redesign (BENCH.md "batch-blocked grid", +6.2% train): the window
token dim is padded to a multiple of 8 (49 → 56) so the qkv/proj
projections run as single large MXU matmuls per block, and the attention
kernels grid over (window id, batch) instead of flat windows — every image
in a block shares ONE window id, so the bias/mask block no longer scales
with the block size and blocks grow to 16-64 images (fewer, fatter grid
steps; these kernels are grid-overhead bound, not FLOP bound). The
backward caches per-head (cos, attn) to skip the second attention
recompute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hvt.ops.window_attention_pallas import (
    _merge_bias_mask,
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


def _gelu_and_grad(x: jax.Array):
    """(gelu(x), gelu'(x)) sharing ONE exp: the erf polynomial's
    exp(-(x/√2)²) IS the pdf's exp(-x²/2). The backward kernel otherwise
    pays three transcendental passes over the (rows, hidden) block (gelu
    recompute + erf + pdf) — exp is the VPU's most expensive op, and the
    MLP backward is VPU-bound at these shapes (BENCH.md round 4)."""
    ax = jnp.abs(x) * _INV_SQRT2
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    e = jnp.exp(-ax * ax)  # = exp(-x²/2)
    erf = jnp.sign(x) * (1.0 - poly * e)
    cdf = 0.5 * (1.0 + erf)
    # value written with _gelu's exact op order so fwd and bwd recompute
    # stay bit-identical
    return 0.5 * x * (1.0 + erf), cdf + x * _INV_SQRT_2PI * e


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


def _mlp_row_scales(dp_ref, m: int, tpi: int):
    """Per-row branch scales for a block of m whole images × tpi tokens:
    dp_ref (m, 8, 128) carries each image's stochastic-depth scale
    broadcast over an aligned (8, 128) tile (real-TPU Mosaic requires the
    minor two block dims 8/128-divisible, so the per-image scale rides a
    full tile); expand to (m·tpi, 1) for the row-wise multiply (sublane
    broadcast + leading-dim merge — no lane-dim shape casts)."""
    s = jnp.broadcast_to(
        dp_ref[:, 0:1, 0:1].astype(jnp.float32), (m, tpi, 1)
    )
    return s.reshape(m * tpi, 1)


def _mlp_fwd_kernel(resid, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref,
                    lnb_ref, *rest):
    """``resid`` = None, or (m, tpi): fused residual — the block is m whole
    images and the epilogue computes x + s·branch (s from the extra dp_ref
    input; see mlp_half)."""
    if resid is not None:
        dp_ref, o_ref = rest
    else:
        (o_ref,) = rest
    x = x_ref[...]
    pre = _dot(x, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    hidden = _gelu(pre)
    out = _dot(hidden, w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    branch, _, _ = _ln_fwd(
        out, lns_ref[...].astype(jnp.float32), lnb_ref[...].astype(jnp.float32)
    )
    if resid is not None:
        s = _mlp_row_scales(dp_ref, *resid)
        o_ref[...] = (x.astype(jnp.float32) + s * branch).astype(o_ref.dtype)
    else:
        o_ref[...] = branch.astype(o_ref.dtype)


def _mlp_bwd_kernel(
    resid,
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref, g_ref,
    *rest,
):
    if resid is not None:
        dp_ref = rest[0]
        rest = rest[1:]
    (dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dlns_ref, dlnb_ref) = rest
    i = pl.program_id(0)
    x = x_ref[...]
    g_raw = g_ref[...].astype(jnp.float32)
    if resid is not None:
        s = _mlp_row_scales(dp_ref, *resid)
        g = s * g_raw
    else:
        g = g_raw
    lns = lns_ref[...].astype(jnp.float32)

    # Recompute forward (nothing was saved); gelu and its derivative share
    # one exp (see _gelu_and_grad).
    pre = _dot(x, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    hidden, dgelu = _gelu_and_grad(pre)
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

    dpre = dhidden * dgelu
    dx = jax.lax.dot_general(
        dpre.astype(jnp.bfloat16), w1_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw1 = _dot_t(x, dpre)
    db1 = jnp.sum(dpre, axis=0, keepdims=True)

    if resid is not None:
        dx_ref[...] = (g_raw + dx).astype(dx_ref.dtype)
    else:
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


def _mlp_target_rows(c: int, hidden: int) -> int:
    """Row-block target from the scoped-VMEM budget (same knob as the
    attention kernels, _fused_attn_budget_bytes): the backward's live set
    per row is the bf16 (x, g) pair, the f32 hidden/dhidden/dpre trio, and
    the f32 dx — fatter blocks amortize the per-grid-step fixed overhead
    these kernels are bound by (BENCH.md round 4, VMEM budget sweep)."""
    per_row = 4 * c + 12 * hidden + 4 * c
    weights = 2 * c * hidden * (2 + 4)  # bf16 w1/w2 + f32 grad accumulators
    rows = (_fused_attn_budget_bytes() - weights) // per_row
    # Never shrink below the 16 MiB-limit-era sizing (512 scaled by width).
    return int(max(64, (512 * 96) // c, min(rows, 8192)))


def mlp_resid_images_per_block(t: int, tpi: int, c: int, hidden: int) -> int:
    """Images per row block for the fused-residual MLP: the block must hold
    WHOLE images (rb = m·tpi with m | t/tpi) so the per-image drop-path
    scale is constant over each image's rows, stay under the VMEM row
    target, and keep 8-aligned sublanes. 0 = unsupported (caller keeps the
    XLA-side residual)."""
    if tpi <= 0 or tpi % 8 or t % tpi:
        return 0
    b_loc = t // tpi
    target = _mlp_target_rows(c, hidden)
    if tpi > target:  # even one image's rows blow the VMEM row budget
        return 0
    for m in range(min(b_loc, target // tpi), 0, -1):
        if b_loc % m == 0:
            return m
    return 0


def _mlp_specs(t: int, c: int, hidden: int, tpi: int = 0):
    if tpi:
        m = mlp_resid_images_per_block(t, tpi, c, hidden)
        assert m > 0, (t, tpi)
        r = m * tpi
    else:
        r = _rows_per_block(t, target=_mlp_target_rows(c, hidden))
    grid = (t // r,)
    row = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return r, grid, row, const


@functools.partial(jax.jit, static_argnames=("interpret", "tpi"))
def _mlp_forward(x, w1, b1, w2, b2, lns, lnb, interpret=False, tpi=0,
                 dp=None):
    t, c = x.shape
    hidden = w1.shape[1]
    r, grid, row, const = _mlp_specs(t, c, hidden, tpi)
    resid = (r // tpi, tpi) if dp is not None else None
    in_specs = [row, const(c, hidden), const(1, hidden), const(hidden, c),
                const(1, c), const(1, c), const(1, c)]
    args = [x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
            lns.reshape(1, -1), lnb.reshape(1, -1)]
    if dp is not None:
        m = r // tpi
        in_specs.append(pl.BlockSpec(
            (m, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ))
        args.append(dp)
    return pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, resid),
        out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=row,
        compiler_params=_attn_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=4 * t * c * hidden,
            bytes_accessed=2 * t * c * x.dtype.itemsize,
            transcendentals=t * hidden,
        ),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret", "tpi"))
def _mlp_backward(x, w1, b1, w2, b2, lns, g, interpret=False, tpi=0,
                  dp=None):
    t, c = x.shape
    hidden = w1.shape[1]
    r, grid, row, const = _mlp_specs(t, c, hidden, tpi)
    resid = (r // tpi, tpi) if dp is not None else None
    in_specs = [row, const(c, hidden), const(1, hidden), const(hidden, c),
                const(1, c), const(1, c), row]
    args = [x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
            lns.reshape(1, -1), g]
    if dp is not None:
        m = r // tpi
        in_specs.append(pl.BlockSpec(
            (m, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ))
        args.append(dp)
    return pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, resid),
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
        in_specs=in_specs,
        out_specs=(row, const(c, hidden), const(1, hidden), const(hidden, c),
                   const(1, c), const(1, c), const(1, c)),
        compiler_params=_attn_compiler_params("arbitrary"),
        cost_estimate=pl.CostEstimate(
            flops=12 * t * c * hidden,
            bytes_accessed=4 * t * c * x.dtype.itemsize,
            transcendentals=2 * t * hidden,
        ),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def mlp_half(x, w1, b1, w2, b2, lns, lnb, interpret=False, tpi=0, dp=None):
    """branch = norm2(fc2(gelu(fc1(x)))) for flat tokens x (T, C).

    ``dp`` (B, 8, 128) f32 + ``tpi`` (tokens per image, static): fused
    residual — returns x + dp·branch with image-aligned row blocks (see
    mlp_resid_images_per_block); dp's cotangent is None (constant
    stochastic-depth scales)."""
    return _mlp_forward(x, w1, b1, w2, b2, lns, lnb, interpret=interpret,
                        tpi=tpi, dp=dp)


def _mlp_half_fwd(x, w1, b1, w2, b2, lns, lnb, interpret=False, tpi=0,
                  dp=None):
    out = _mlp_forward(x, w1, b1, w2, b2, lns, lnb, interpret=interpret,
                       tpi=tpi, dp=dp)
    return out, (x, w1, b1, w2, b2, lns, dp)


def _mlp_half_bwd(interpret, tpi, res, g):
    x, w1, b1, w2, b2, lns, dp = res
    dx, dw1, db1, dw2, db2, dlns, dlnb = _mlp_backward(
        x, w1, b1, w2, b2, lns, g, interpret=interpret, tpi=tpi, dp=dp
    )
    return (
        dx.astype(x.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(-1).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(-1).astype(b2.dtype),
        dlns.reshape(-1).astype(lns.dtype),
        dlnb.reshape(-1).astype(lns.dtype),
        None if dp is None else jnp.zeros_like(dp),
    )


mlp_half.defvjp(_mlp_half_fwd, _mlp_half_bwd)


# ---------------------------------------------------------------------------
# Chunked MLP half (round 5, VERDICT r4 item 5): big-C stages whose
# weights + f32 grad accumulators do NOT fit VMEM (SwinV2-B stage 3,
# swinv2_large stage 4) split the 4C hidden dim into K chunks.
#
#   forward:  grid (rows, K) with K innermost; each step streams chunk k's
#             (w1_k, w2_k), accumulates gelu(x@w1_k)@w2_k into an f32 VMEM
#             scratch, and at k = K-1 adds b2, LayerNorms, and writes BOTH
#             the branch and the pre-LN sum (the backward's residual).
#   backward: one invocation per chunk — per-chunk resident set is
#             6·C·(4C/K) bytes instead of 6·C·4C. The LN backward re-derives
#             its stats from the saved pre-LN sum (one extra bf16 (T, C)
#             write + K reads — C-width passes, 4x narrower than the
#             hidden-width passes the XLA fallback pays); dx sums over the
#             K per-chunk dx partials in XLA; weight grads concatenate.
#
# Accumulating weight grads for STREAMED chunks inside one kernel is
# impossible under Pallas's output-revisit rule (a chunk's dw block would be
# revisited non-consecutively across the row grid) — hence one call per
# chunk, which also keeps every call's VMEM bounded.
# ---------------------------------------------------------------------------


def _mlp_chunk_fwd_kernel(
    nchunks: int, want_pre: bool,
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref, lnb_ref,
    *out_refs,
):
    o_ref = out_refs[0]
    acc_ref = out_refs[-1]
    k = pl.program_id(1)
    x = x_ref[...]
    pre = _dot(x, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    part = _dot(_gelu(pre), w2_ref[...])

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(k != 0)
    def _acc():
        acc_ref[...] = acc_ref[...] + part

    @pl.when(k == nchunks - 1)
    def _finalize():
        out = acc_ref[...] + b2_ref[...].astype(jnp.float32)
        branch, _, _ = _ln_fwd(
            out, lns_ref[...].astype(jnp.float32),
            lnb_ref[...].astype(jnp.float32),
        )
        o_ref[...] = branch.astype(o_ref.dtype)
        if want_pre:
            out_refs[1][...] = out.astype(out_refs[1].dtype)


def _mlp_chunk_bwd_kernel(
    first_chunk: bool,
    x_ref, w1_ref, b1_ref, w2_ref, lns_ref, pre_ref, g_ref,
    *out_refs,
):
    """Backward for ONE hidden chunk, LN stats re-derived from the saved
    pre-LN sum. Chunk 0's call additionally emits db2/dlns/dlnb (they do
    not depend on the chunk)."""
    i = pl.program_id(0)
    x = x_ref[...]
    g = g_ref[...].astype(jnp.float32)
    lns = lns_ref[...].astype(jnp.float32)
    out = pre_ref[...].astype(jnp.float32)

    mu = jnp.mean(out, axis=-1, keepdims=True)
    xc = out - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    normed = xc * inv
    dout = _ln_bwd(g, normed, inv, lns)

    pre = _dot(x, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    hidden, dgelu = _gelu_and_grad(pre)
    dhidden = jax.lax.dot_general(
        dout.astype(jnp.bfloat16), w2_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpre = dhidden * dgelu
    dx = jax.lax.dot_general(
        dpre.astype(jnp.bfloat16), w1_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw1 = _dot_t(x, dpre)
    db1 = jnp.sum(dpre, axis=0, keepdims=True)
    dw2 = _dot_t(hidden, dout)

    dx_ref, dw1_ref, db1_ref, dw2_ref = out_refs[:4]
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2

    @pl.when(i != 0)
    def _acc():
        dw1_ref[...] = dw1_ref[...] + dw1
        db1_ref[...] = db1_ref[...] + db1
        dw2_ref[...] = dw2_ref[...] + dw2

    if first_chunk:
        db2_ref, dlns_ref, dlnb_ref = out_refs[4:]
        db2 = jnp.sum(dout, axis=0, keepdims=True)
        dlns = jnp.sum(g * normed, axis=0, keepdims=True)
        dlnb = jnp.sum(g, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _init2():
            db2_ref[...] = db2
            dlns_ref[...] = dlns
            dlnb_ref[...] = dlnb

        @pl.when(i != 0)
        def _acc2():
            db2_ref[...] = db2_ref[...] + db2
            dlns_ref[...] = dlns_ref[...] + dlns
            dlnb_ref[...] = dlnb_ref[...] + dlnb


def mlp_chunks(c: int, hidden: int, train: bool = True, cap: int = 4) -> int:
    """Smallest power-of-two K (≤ cap, dividing `hidden`) whose per-chunk
    resident set fits the fused-MLP routing threshold; 0 if none does."""
    k = 1
    while k <= cap:
        if hidden % k == 0 and fits_vmem(c, 0, 0, mlp_hidden=hidden // k,
                                         train=train):
            return k
        k *= 2
    return 0


@functools.partial(jax.jit, static_argnames=("nchunks", "want_pre", "interpret"))
def _mlp_chunked_forward(x, w1, b1, w2, b2, lns, lnb, nchunks,
                         want_pre=False, interpret=False):
    t, c = x.shape
    hidden = w1.shape[1]
    hk = hidden // nchunks
    r, _, row, const = _mlp_specs(t, c, hk)
    grid = (t // r, nchunks)
    row2 = pl.BlockSpec((r, c), lambda i, k: (i, 0), memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((c, hk), lambda i, k: (0, k), memory_space=pltpu.VMEM)
    b1_spec = pl.BlockSpec((1, hk), lambda i, k: (0, k), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((hk, c), lambda i, k: (k, 0), memory_space=pltpu.VMEM)
    cvec = pl.BlockSpec((1, c), lambda i, k: (0, 0), memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((t, c), x.dtype)]
    out_specs = [row2]
    if want_pre:
        out_shapes.append(jax.ShapeDtypeStruct((t, c), x.dtype))
        out_specs.append(row2)
    outs = pl.pallas_call(
        functools.partial(_mlp_chunk_fwd_kernel, nchunks, want_pre),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=[row2, w1_spec, b1_spec, w2_spec, cvec, cvec, cvec],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((r, c), jnp.float32)],
        compiler_params=_attn_compiler_params("arbitrary", "arbitrary"),
        cost_estimate=pl.CostEstimate(
            flops=4 * t * c * hidden,
            bytes_accessed=(2 + nchunks) * t * c * x.dtype.itemsize,
            transcendentals=t * hidden,
        ),
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
      lns.reshape(1, -1), lnb.reshape(1, -1))
    return outs if want_pre else (outs[0], None)


@functools.partial(jax.jit, static_argnames=("first_chunk", "interpret"))
def _mlp_chunk_backward(x, w1k, b1k, w2k, lns, pre, g, first_chunk,
                        interpret=False):
    t, c = x.shape
    hk = w1k.shape[1]
    r, grid, row, const = _mlp_specs(t, c, hk)
    out_shapes = [
        jax.ShapeDtypeStruct((t, c), x.dtype),        # dx partial
        jax.ShapeDtypeStruct((c, hk), jnp.float32),   # dw1 chunk
        jax.ShapeDtypeStruct((1, hk), jnp.float32),   # db1 chunk
        jax.ShapeDtypeStruct((hk, c), jnp.float32),   # dw2 chunk
    ]
    out_specs = [row, const(c, hk), const(1, hk), const(hk, c)]
    if first_chunk:
        out_shapes += [jax.ShapeDtypeStruct((1, c), jnp.float32)] * 3
        out_specs += [const(1, c)] * 3
    return pl.pallas_call(
        functools.partial(_mlp_chunk_bwd_kernel, first_chunk),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=[row, const(c, hk), const(1, hk), const(hk, c),
                  const(1, c), row, row],
        out_specs=tuple(out_specs),
        compiler_params=_attn_compiler_params("arbitrary"),
        cost_estimate=pl.CostEstimate(
            flops=12 * t * c * hk,
            bytes_accessed=5 * t * c * x.dtype.itemsize,
            transcendentals=2 * t * hk,
        ),
        interpret=interpret,
    )(x, w1k, b1k.reshape(1, -1), w2k, lns.reshape(1, -1), pre, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def mlp_half_chunked(x, w1, b1, w2, b2, lns, lnb, nchunks, interpret=False):
    """branch = norm2(fc2(gelu(fc1(x)))) with the hidden dim streamed in
    `nchunks` chunks (big-C routing; see the section comment)."""
    out, _ = _mlp_chunked_forward(x, w1, b1, w2, b2, lns, lnb, nchunks,
                                  want_pre=False, interpret=interpret)
    return out


def _mlp_chunked_fwd(x, w1, b1, w2, b2, lns, lnb, nchunks, interpret=False):
    out, pre = _mlp_chunked_forward(x, w1, b1, w2, b2, lns, lnb, nchunks,
                                    want_pre=True, interpret=interpret)
    return out, (x, w1, b1, w2, b2, lns, pre)


def _mlp_chunked_bwd(nchunks, interpret, res, g):
    x, w1, b1, w2, b2, lns, pre = res
    hidden = w1.shape[1]
    hk = hidden // nchunks
    dx = None
    dw1s, db1s, dw2s = [], [], []
    db2 = dlns = dlnb = None
    for k in range(nchunks):
        outs = _mlp_chunk_backward(
            x, jax.lax.slice_in_dim(w1, k * hk, (k + 1) * hk, axis=1),
            jax.lax.slice_in_dim(b1, k * hk, (k + 1) * hk, axis=0),
            jax.lax.slice_in_dim(w2, k * hk, (k + 1) * hk, axis=0),
            lns, pre, g, first_chunk=(k == 0), interpret=interpret,
        )
        dxk, dw1k, db1k, dw2k = outs[:4]
        if k == 0:
            db2, dlns, dlnb = outs[4:]
            dx = dxk.astype(jnp.float32)
        else:
            dx = dx + dxk.astype(jnp.float32)
        dw1s.append(dw1k)
        db1s.append(db1k)
        dw2s.append(dw2k)
    return (
        dx.astype(x.dtype),
        jnp.concatenate(dw1s, axis=1).astype(w1.dtype),
        jnp.concatenate(db1s, axis=1).reshape(-1).astype(b1.dtype),
        jnp.concatenate(dw2s, axis=0).astype(w2.dtype),
        db2.reshape(-1).astype(b2.dtype),
        dlns.reshape(-1).astype(lns.dtype),
        dlnb.reshape(-1).astype(lns.dtype),
    )


mlp_half_chunked.defvjp(_mlp_chunked_fwd, _mlp_chunked_bwd)


def mlp_half_chunked_spmd(x, w1, b1, w2, b2, lns, lnb, nchunks,
                          interpret=False):
    """mlp_half_chunked, shard_mapped over the data axis when a multi-device
    kernel mesh is active (x's flat-token dim is batch-major)."""
    from hvt import parallel

    fn = parallel.shard_map_kernel(
        lambda *a: mlp_half_chunked(*a, nchunks, interpret),
        batch_argnums=(0,), n_args=7,
    )
    return fn(x, w1, b1, w2, b2, lns, lnb)


# ---------------------------------------------------------------------------
# Attention half: branch = norm1(proj(window_attn(qkv(xw))))
# on window tokens xw (nWB, N, C)
# ---------------------------------------------------------------------------


def _heads_fwd_cached(qkv, z, scale_ref, heads: int, g: int, n: int, c: int):
    """packed_heads_forward caching each head's (cos, attn) so the fused
    backward loop skips the qk matmul and the softmax — the expensive part
    of the recompute. ONLY those two are cached: the q/k normalizations are
    cheap rsqrt+mult recomputes from the still-live qkv, and caching the
    (g, n, d=32) tensors lane-pads 4x and blew scoped VMEM at stage-2
    blocks (round-4 compile OOM). Math is op-identical to
    packed_heads_forward — the families must stay bit-identical."""
    hd = c // heads
    batched = (((2,), (2,)), ((0,), (0,)))
    outs, cache = [], []
    for i in range(heads):
        q = qkv[:, :, i * hd : (i + 1) * hd]
        k = qkv[:, :, c + i * hd : c + (i + 1) * hd]
        v = qkv[:, :, 2 * c + i * hd : 2 * c + (i + 1) * hd]
        inv_qn = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
        inv_kn = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
        qn = q * inv_qn
        kn = k * inv_kn
        cos = jax.lax.dot_general(qn, kn, batched, preferred_element_type=jnp.float32)
        zi = jnp.broadcast_to(z[:, i], (g, n, n))
        attn = jax.nn.softmax(cos * scale_ref[i, 0, 0] + zi, axis=-1)
        outs.append(
            jax.lax.dot_general(
                attn, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
        cache.append((cos, attn))
    return jnp.concatenate(outs, axis=-1), cache


def _heads_bwd_from_cache(
    qkv, cache, gout, scale_ref, heads: int, g: int, n: int, c: int, gz: int
):
    """Gradient loop of packed_heads_backward, fed from _heads_fwd_cached's
    (cos, attn) residuals (no qk-matmul/softmax recompute; normalizations
    recomputed from qkv). Returns (dqkv, dz_contrib, dscale_contrib) in the
    same packed layouts."""
    hd = c // heads
    batched = (((2,), (2,)), ((0,), (0,)))
    dqs, dks, dvs, dzs, dscales = [], [], [], [], []
    for i in range(heads):
        cos, attn = cache[i]
        q = qkv[:, :, i * hd : (i + 1) * hd]
        k = qkv[:, :, c + i * hd : c + (i + 1) * hd]
        v = qkv[:, :, 2 * c + i * hd : 2 * c + (i + 1) * hd]
        inv_qn = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
        inv_kn = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
        qn = q * inv_qn
        kn = k * inv_kn
        go = gout[:, :, i * hd : (i + 1) * hd]
        scale = scale_ref[i, 0, 0]

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


def _attn_half_fwd_body(
    heads: int, g: int, n: int, c: int,
    xf, wqkv_ref, bqkv_ref, scale_ref, z_ref, wproj_ref, bproj_ref,
    lns_ref, lnb_ref,
):
    """Shared forward body on flat padded tokens xf (g·n, C) → branch
    (g·n, C). Op order is the contract: the blocked and NHWC kernels must
    stay bit-identical (tests/test_fused_halves.py)."""
    qkv_f = _dot(xf, wqkv_ref[...]) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv_f.reshape(g, n, 3 * c)
    z = z_ref[...].astype(jnp.float32)

    out = packed_heads_forward(qkv, z, scale_ref, heads, g, n, c)  # (g, N, C)
    proj = _dot(out.reshape(g * n, c), wproj_ref[...])
    proj = proj + bproj_ref[...].astype(jnp.float32)
    branch, _, _ = _ln_fwd(
        proj, lns_ref[...].astype(jnp.float32), lnb_ref[...].astype(jnp.float32)
    )
    return branch


def _attn_fwd_kernel(
    heads: int,
    x_ref, wqkv_ref, bqkv_ref, scale_ref, z_ref, wproj_ref, bproj_ref,
    lns_ref, lnb_ref, o_ref,
):
    """The window-token dim n is PADDED to a multiple of 8 by attention_half
    (49 → 56 for window-7), which makes (g, n, C) → (g·n, C) a layout no-op
    (whole 8-sublane tiles per window), so the qkv and proj projections —
    the FLOP bulk of the half — each run as ONE large MXU matmul instead of
    g unrolled (49, C) dots. Padded key columns carry -1e9 in z, so softmax
    excludes them exactly; padded query rows produce garbage the caller
    slices away.

    Block layout: x (gb, 1, n, C) — gb images' SAME window id (batch-blocked
    grid, _attn_forward); z (1, H, n, n) is that window's combined
    bias+mask, resident across the inner batch grid axis."""
    g, _, n, c = x_ref.shape
    xf = x_ref[...].reshape(g * n, c)
    branch = _attn_half_fwd_body(
        heads, g, n, c, xf, wqkv_ref, bqkv_ref, scale_ref, z_ref,
        wproj_ref, bproj_ref, lns_ref, lnb_ref,
    )
    o_ref[...] = branch.reshape(g, 1, n, c).astype(o_ref.dtype)


def _attn_fwd_kernel_nhwc(
    heads: int, npad: int, resid: bool,
    x_ref, wqkv_ref, bqkv_ref, scale_ref, z_ref, wproj_ref, bproj_ref,
    lns_ref, lnb_ref, *rest,
):
    """NHWC direct-windowing forward (round 5, VERDICT r4 item 3): the
    block is fetched straight out of the 6-d window VIEW of the NHWC
    feature map — x_ref (gb, 1, ws, 1, ws, C) is gb images' SAME window id,
    gathered by the BlockSpec index map — so the XLA window_partition /
    window_reverse transposes (the boundary layout copies, BENCH.md
    round 4) never exist.

    Token layout: Mosaic cannot shape-cast the (ws, ws) grid into a flat
    ws² token dim (7-sublane merges move rows across 8-row tiles — the
    real-TPU lowering rejects what interpret mode accepted), so window
    row r lands at the 8-ALIGNED slot [r·slot, r·slot+ws) of the
    (gb, npad = ws·slot, C) VMEM scratch via plain sliced stores; the
    slack rows are zeros and the caller permutes bias/mask to the slotted
    token order (attention_half_nhwc). For window-7 npad is 56 — the same
    padded width the blocked kernel uses, so the matmul/VPU shapes are
    unchanged; only the pad rows are interleaved instead of trailing.

    ``resid`` (round 5): the residual add — and stochastic-depth's
    per-image branch scale s_i = mask_i/keep, fed as the (gb, 8, 128)
    broadcast dp_ref — runs in the epilogue: out = x + s·branch. x is
    already resident in VMEM, so the XLA-side drop-path+add pass (2-3
    HBM sweeps of the feature map per half, plus the layout flips XLA
    wraps around the boundary op) disappears. Rolls commute with the
    elementwise add, so shifted blocks fuse identically — the caller
    un-rolls the SUM instead of the branch."""
    if resid:
        dp_ref, o_ref, xw_ref = rest
    else:
        o_ref, xw_ref = rest
    g, _, ws, _, _, c = x_ref.shape
    slot = npad // ws
    for r in range(ws):
        xw_ref[:, r * slot : r * slot + ws, :] = x_ref[:, 0, r, 0, :, :]
        if slot != ws:
            xw_ref[:, r * slot + ws : (r + 1) * slot, :] = jnp.zeros(
                (g, slot - ws, c), xw_ref.dtype
            )
    branch = _attn_half_fwd_body(
        heads, g, npad, c, xw_ref[...].reshape(g * npad, c), wqkv_ref,
        bqkv_ref, scale_ref, z_ref, wproj_ref, bproj_ref, lns_ref, lnb_ref,
    )
    br = branch.reshape(g, npad, c)
    if resid:
        # Mosaic cannot broadcast (g,1,1) across sublanes AND lanes in one
        # op (and folds staged broadcasts back together) — so dp arrives
        # replicated over a full (rows8, 128) tile and the kernel SLICES
        # the (g, ws, 1) scale column it needs; the multiply below then
        # broadcasts on lanes only.
        s = dp_ref[:, 0:ws, 0:1].astype(jnp.float32)
        for r in range(ws):
            o_ref[:, 0, r, 0, :, :] = (
                x_ref[:, 0, r, 0, :, :].astype(jnp.float32)
                + s * br[:, r * slot : r * slot + ws, :]
            ).astype(o_ref.dtype)
    else:
        brc = br.astype(o_ref.dtype)
        for r in range(ws):
            o_ref[:, 0, r, 0, :, :] = brc[:, r * slot : r * slot + ws, :]


def _attn_half_bwd_body(
    heads: int, g_blk: int, n: int, c: int,
    xf, gout_f, wqkv_ref, bqkv_ref, scale_ref, z_ref, wproj_ref, bproj_ref,
    lns_ref,
):
    """Shared backward body on flat padded tokens xf/gout_f (g·n, C).
    Returns (dx_f, dwqkv, dbqkv, dscale, dz, dwproj, dbproj, dlns, dlnb);
    the kernels own the grid bookkeeping and accumulator writes."""
    z = z_ref[...].astype(jnp.float32)
    lns = lns_ref[...].astype(jnp.float32)

    # --- recompute forward (flat merged projections — see _attn_fwd_kernel;
    # per-head intermediates cached so the grad loop below skips the second
    # attention recompute) ---
    qkv_f = _dot(xf, wqkv_ref[...]) + bqkv_ref[...].astype(jnp.float32)
    qkv3 = qkv_f.reshape(g_blk, n, 3 * c)
    attn_out, head_cache = _heads_fwd_cached(
        qkv3, z, scale_ref, heads, g_blk, n, c
    )
    attn_out_f = attn_out.reshape(g_blk * n, c)
    proj = _dot(attn_out_f, wproj_ref[...]) + bproj_ref[...].astype(jnp.float32)
    mu = jnp.mean(proj, axis=-1, keepdims=True)
    xc = proj - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    normed = xc * inv

    # --- norm1 backward ---
    dproj = _ln_bwd(gout_f, normed, inv, lns)  # (g·N, C)
    dlns = jnp.sum(gout_f * normed, axis=0, keepdims=True)
    dlnb = jnp.sum(gout_f, axis=0, keepdims=True)

    # --- proj backward (flat: one MXU matmul per gradient) ---
    dao_f = jax.lax.dot_general(
        dproj.astype(jnp.bfloat16), wproj_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwproj = _dot_t(attn_out_f, dproj)
    dbproj = jnp.sum(dproj, axis=0, keepdims=True)

    # --- attention backward (cached cos/attn — no qk/softmax recompute;
    # gz=1: the whole block shares one window id, dz pre-summed over gb) ---
    dqkv, dz_contrib, dscale_contrib = _heads_bwd_from_cache(
        qkv3, head_cache, dao_f.reshape(g_blk, n, c), scale_ref, heads, g_blk,
        n, c, 1,
    )
    dqkv_f = dqkv.reshape(g_blk * n, 3 * c)

    # --- qkv projection backward ---
    dx = jax.lax.dot_general(
        dqkv_f.astype(jnp.bfloat16), wqkv_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwqkv = _dot_t(xf, dqkv_f)
    dbqkv = jnp.sum(dqkv_f, axis=0, keepdims=True)

    return (dx, dwqkv, dbqkv, dscale_contrib, dz_contrib, dwproj, dbproj,
            dlns, dlnb)


def _attn_bwd_kernel(
    heads: int,
    x_ref, wqkv_ref, bqkv_ref, scale_ref, z_ref, wproj_ref, bproj_ref,
    lns_ref, g_ref,
    dx_ref, dwqkv_ref, dbqkv_ref, dscale_ref, dz_ref, dwproj_ref, dbproj_ref,
    dlns_ref, dlnb_ref,
):
    """Batch-blocked like the forward: x (gb, 1, n, C) = gb images' SAME
    window id, z (1, H, n, n). Grid (nwz, nb/gb) with batch innermost, so
    dz (indexed by the window axis) accumulates in VMEM across the batch
    sweep; dscale/weight grads accumulate across the whole grid."""
    wb = pl.program_id(0)
    b = pl.program_id(1)
    first = (b == 0) & (wb == 0)
    g_blk, _, n, c = x_ref.shape

    xf = x_ref[...].reshape(g_blk * n, c)
    gout_f = g_ref[...].astype(jnp.float32).reshape(g_blk * n, c)
    (dx, dwqkv, dbqkv, dscale_contrib, dz_contrib, dwproj, dbproj, dlns,
     dlnb) = _attn_half_bwd_body(
        heads, g_blk, n, c, xf, gout_f, wqkv_ref, bqkv_ref, scale_ref,
        z_ref, wproj_ref, bproj_ref, lns_ref,
    )

    dx_ref[...] = dx.reshape(g_blk, 1, n, c).astype(dx_ref.dtype)

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


def _attn_bwd_kernel_nhwc(
    heads: int, npad: int, z_shared: bool, resid: bool,
    x_ref, wqkv_ref, bqkv_ref, scale_ref, z_ref, wproj_ref, bproj_ref,
    lns_ref, g_ref, *rest,
):
    """NHWC direct-windowing backward: x/g blocks are (gb, 1, ws, 1, ws, C)
    fetched straight from the 6-d window view and repacked into the
    8-aligned slotted token layout (see _attn_fwd_kernel_nhwc); the slack
    rows carry zeros for BOTH x and the upstream gradient (exactly what
    the blocked kernel's outside slice-VJP fed), so pad positions
    contribute nothing to any gradient; dx's slack rows are dropped by the
    slotted per-row stores.

    ``z_shared``: the no-shift-mask case, where z's leading dim is 1 and
    ONE dz block accumulates across the ENTIRE grid (unlike the blocked
    kernel, the window axis here is always real grid steps) — init at the
    first grid step, not at every window's first batch step.

    ``resid``: the VJP of out = x + s·branch(x) (see _attn_fwd_kernel_nhwc):
    the branch backward runs on s·g (chain rule through the per-image
    stochastic-depth scale, so every weight gradient picks up s exactly as
    the XLA drop-path backward did), and dx adds the residual pass-through
    g in the epilogue — the upstream gradient never makes a second HBM
    round trip through an XLA add."""
    if resid:
        dp_ref = rest[0]
        rest = rest[1:]
    (dx_ref, dwqkv_ref, dbqkv_ref, dscale_ref, dz_ref, dwproj_ref,
     dbproj_ref, dlns_ref, dlnb_ref, xw_ref, gw_ref) = rest
    wb = pl.program_id(0)
    b = pl.program_id(1)
    first = (b == 0) & (wb == 0)
    dz_is_first = first if z_shared else (b == 0)
    g_blk, _, ws, _, _, c = x_ref.shape
    slot = npad // ws

    if resid:
        # s·g computed at pack time — the (g, ws, 1) scale column sliced
        # from the replicated dp tile lane-broadcasts against each row's
        # (g, ws, C) slice (both-axes broadcasts are unimplemented in
        # Mosaic); the bf16 rounding of s·g matches the XLA drop-path
        # backward, which also scales at the activation dtype.
        s_ws = dp_ref[:, 0:ws, 0:1].astype(jnp.float32)
    for r in range(ws):
        xw_ref[:, r * slot : r * slot + ws, :] = x_ref[:, 0, r, 0, :, :]
        if resid:
            gw_ref[:, r * slot : r * slot + ws, :] = (
                s_ws * g_ref[:, 0, r, 0, :, :].astype(jnp.float32)
            ).astype(gw_ref.dtype)
        else:
            gw_ref[:, r * slot : r * slot + ws, :] = g_ref[:, 0, r, 0, :, :]
        if slot != ws:
            zpad = jnp.zeros((g_blk, slot - ws, c), xw_ref.dtype)
            xw_ref[:, r * slot + ws : (r + 1) * slot, :] = zpad
            gw_ref[:, r * slot + ws : (r + 1) * slot, :] = zpad.astype(
                gw_ref.dtype
            )
    gout = gw_ref[...].astype(jnp.float32).reshape(g_blk, npad, c)
    (dx, dwqkv, dbqkv, dscale_contrib, dz_contrib, dwproj, dbproj, dlns,
     dlnb) = _attn_half_bwd_body(
        heads, g_blk, npad, c, xw_ref[...].reshape(g_blk * npad, c),
        gout.reshape(g_blk * npad, c),
        wqkv_ref, bqkv_ref, scale_ref, z_ref, wproj_ref, bproj_ref, lns_ref,
    )

    dxs = dx.reshape(g_blk, npad, c)
    if resid:
        for r in range(ws):
            dx_ref[:, 0, r, 0, :, :] = (
                g_ref[:, 0, r, 0, :, :].astype(jnp.float32)
                + dxs[:, r * slot : r * slot + ws, :]
            ).astype(dx_ref.dtype)
    else:
        dxc = dxs.astype(dx_ref.dtype)
        for r in range(ws):
            dx_ref[:, 0, r, 0, :, :] = dxc[:, r * slot : r * slot + ws, :]

    @pl.when(dz_is_first)
    def _init_dz():
        dz_ref[...] = dz_contrib.astype(dz_ref.dtype)

    @pl.when(~dz_is_first)
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


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _fused_attn_budget_bytes() -> int:
    """Scoped-VMEM budget for the attention kernels' live set.

    v5e carries 128 MiB of VMEM; Mosaic's DEFAULT scoped-vmem limit is only
    16 MiB, which round 3 treated as the hardware budget — the round-4
    sweep (BENCH.md "VMEM budget sweep") raised the limit via
    CompilerParams.vmem_limit_bytes and measured 10/24/32/48 MiB on chip:
    the step drops 142.6 → 119.5 ms (b128 train) and saturates by ~32 MiB
    (grid-overhead amortized; the kernels then hit their VPU work).
    HVT_FUSED_VMEM_MB overrides for experiments."""
    import os

    return int(os.environ.get("HVT_FUSED_VMEM_MB", "32")) * 2**20


def _attn_compiler_params(*sems: str, n_inputs: int = 0) -> "pltpu.CompilerParams":  # noqa: D401
    """CompilerParams for the attention kernels: Mosaic's default scoped-VMEM
    limit is 16 MiB; raise it to cover the picked block's live set (the
    budget estimate tracks actual usage within ~10%), capped well under the
    chip's 128 MiB so operand double-buffering keeps its headroom."""
    # The pick estimate under-predicts Mosaic's actual stack by up to ~30%
    # at large blocks (measured: 48 MB budget → 60.8 MB stack), so the
    # limit is 2× the budget: the budget is the gb knob, the limit just
    # keeps Mosaic from rejecting what the picker chose.
    limit = min(100 * 2**20, max(32 * 2**20, 2 * _fused_attn_budget_bytes()))
    # NOTE: allow_input_fusion was tried for the boundary relayout copies
    # and is a measured dead end on this toolchain: the Pallas call becomes
    # a kCustom fusion and vmem_limit_bytes no longer reaches Mosaic (the
    # 16 MiB default reasserts itself and compilation fails at any raised
    # budget) — BENCH.md round 4.
    return pltpu.CompilerParams(
        dimension_semantics=sems or None, vmem_limit_bytes=limit
    )


def _fused_attn_pick(nb: int, heads: int, n: int, c: int, train: bool) -> int:
    """Images per grid step (batch-blocked grid — every window in the block
    shares ONE window id, so the z block never scales with the block size).
    Explicit scoped-VMEM estimate for THIS kernel's live set:

      per image: the (cos, attn) backward cache (2·H n×n f32 tiles), one
      live head's transients (~10 n×n-class f32 buffers), and the flat
      (n·gb, 3C) qkv/grad buffers; plus the resident weights and (train)
      their f32 gradient accumulators.

    Grid-step fixed overhead (~2-3 µs DMA/sync) dominated the round-3
    kernels at g≤8 windows/step (measured: block-size sweep, BENCH.md
    round 4) — this picker maximizes the block under a ~10 MB budget."""
    n_sub = -(-n // 8) * 8
    nl = _pad128(n)
    cache = (2 * heads if train else 0) * n_sub * nl * 4
    head_tmp = (10 if train else 6) * n_sub * nl * 4
    flat = (6 if train else 3) * n_sub * (_pad128(3 * c) + _pad128(c)) * 4 // 2
    per_image = cache + head_tmp + flat
    weights = (3 * c + c) * c * 2 + ((3 * c + c) * c * 4 if train else 0)
    budget = _fused_attn_budget_bytes() - weights
    gb = max(1, int(budget // max(1, per_image)))
    gb = min(gb, 64, nb)
    while nb % gb:
        gb -= 1
    return gb


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _attn_forward(x, wqkv, bqkv, scale, z, wproj, bproj, lns, lnb, heads,
                  interpret=False):
    nwb, n, c = x.shape
    nwz = z.shape[0]
    nb = nwb // nwz
    gb = _fused_attn_pick(nb, heads, n, c, train=False)

    # Batch-blocked grid: x viewed (nb, nwz, n, c) — a free reshape of the
    # batch-major window partition — so each grid step processes gb images'
    # SAME window id and the z block is one (1, H, n, n) window, resident
    # across the inner batch axis.
    xv = x.reshape(nb, nwz, n, c)
    x_spec = pl.BlockSpec((gb, 1, n, c), lambda w, b: (b, w, 0, 0),
                          memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((1, heads, n, n), lambda w, b: (w, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda w, b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, heads),
        out_shape=jax.ShapeDtypeStruct((nb, nwz, n, c), x.dtype),
        grid=(nwz, nb // gb),
        in_specs=[x_spec, const(c, 3 * c), const(1, 3 * c), const(heads, 1, 1),
                  z_spec, const(c, c), const(1, c), const(1, c), const(1, c)],
        out_specs=x_spec,
        compiler_params=_attn_compiler_params("arbitrary", "arbitrary", n_inputs=9),
        cost_estimate=pl.CostEstimate(
            flops=(8 * c * c + 4 * heads * n * (c // heads) * 2) * n * nwb,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=nwb * heads * n * n,
        ),
        interpret=interpret,
    )(xv, wqkv, bqkv.reshape(1, -1), scale, z, wproj, bproj.reshape(1, -1),
      lns.reshape(1, -1), lnb.reshape(1, -1))
    return out.reshape(nwb, n, c)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _attn_backward(x, wqkv, bqkv, scale, z, wproj, bproj, lns, g_out, heads,
                   interpret=False):
    nwb, n, c = x.shape
    nwz = z.shape[0]
    assert nwb % nwz == 0, (nwb, nwz)
    nb = nwb // nwz

    gb = _fused_attn_pick(nb, heads, n, c, train=True)

    # Batch-blocked grid, window axis outer / batch inner (see
    # _attn_forward): the dz block (one window id) stays VMEM-resident
    # while every image accumulates into it.
    xv = x.reshape(nb, nwz, n, c)
    gv = g_out.reshape(nb, nwz, n, c)
    x_spec = pl.BlockSpec((gb, 1, n, c), lambda w, b: (b, w, 0, 0),
                          memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((1, heads, n, n), lambda w, b: (w, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda w, b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, heads),
        out_shape=(
            jax.ShapeDtypeStruct((nb, nwz, n, c), x.dtype),      # dx
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),        # dwqkv
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),        # dbqkv
            jax.ShapeDtypeStruct((heads, n), jnp.float32),        # dscale partial
            jax.ShapeDtypeStruct((nwz, heads, n, n), jnp.float32),  # dz
            jax.ShapeDtypeStruct((c, c), jnp.float32),            # dwproj
            jax.ShapeDtypeStruct((1, c), jnp.float32),            # dbproj
            jax.ShapeDtypeStruct((1, c), jnp.float32),            # dlns
            jax.ShapeDtypeStruct((1, c), jnp.float32),            # dlnb
        ),
        grid=(nwz, nb // gb),
        in_specs=[x_spec, const(c, 3 * c), const(1, 3 * c), const(heads, 1, 1),
                  z_spec, const(c, c), const(1, c), const(1, c), x_spec],
        out_specs=(
            x_spec, const(c, 3 * c), const(1, 3 * c), const(heads, n), z_spec,
            const(c, c), const(1, c), const(1, c), const(1, c),
        ),
        compiler_params=_attn_compiler_params("arbitrary", "arbitrary", n_inputs=9),
        cost_estimate=pl.CostEstimate(
            flops=(24 * c * c + 10 * heads * n * (c // heads)) * n * nwb,
            bytes_accessed=4 * x.size * x.dtype.itemsize,
            transcendentals=2 * nwb * heads * n * n,
        ),
        interpret=interpret,
    )(xv, wqkv, bqkv.reshape(1, -1), scale, z, wproj, bproj.reshape(1, -1),
      lns.reshape(1, -1), gv)
    return (outs[0].reshape(nwb, n, c),) + outs[1:]


@functools.partial(jax.jit, static_argnames=("window", "heads", "interpret"))
def _attn_forward_nhwc(x, wqkv, bqkv, scale, z, wproj, bproj, lns, lnb,
                       window, heads, interpret=False, dp=None):
    """Forward over the NHWC feature map directly: grid (window id,
    batch/gb); the x BlockSpec gathers window (wy, wx) of gb images from
    the free 6-d view (B, H/ws, ws, W/ws, ws, C) — no window_partition.
    ``dp`` (B, 8, 128) f32, optional: per-image branch scales; when given the
    kernel returns x + dp·branch (fused residual + stochastic depth)."""
    b, h, w, c = x.shape
    ws = window
    hb, wb_ = h // ws, w // ws
    nwz = hb * wb_
    npad = z.shape[-1]
    zn = z.shape[0]  # 1 when there is no shift mask
    gb = _fused_attn_pick(b, heads, npad, c, train=False)

    xv = x.reshape(b, hb, ws, wb_, ws, c)
    x_spec = pl.BlockSpec(
        (gb, 1, ws, 1, ws, c),
        lambda wd, bi: (bi, wd // wb_, 0, wd % wb_, 0, 0),
        memory_space=pltpu.VMEM,
    )
    z_spec = pl.BlockSpec(
        (1, heads, npad, npad),
        (lambda wd, bi: (0, 0, 0, 0)) if zn == 1
        else (lambda wd, bi: (wd, 0, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda wd, bi: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [x_spec, const(c, 3 * c), const(1, 3 * c), const(heads, 1, 1),
                z_spec, const(c, c), const(1, c), const(1, c), const(1, c)]
    args = [xv, wqkv, bqkv.reshape(1, -1), scale, z, wproj,
            bproj.reshape(1, -1), lns.reshape(1, -1), lnb.reshape(1, -1)]
    if dp is not None:
        in_specs.append(pl.BlockSpec(
            (gb, dp.shape[1], 128), lambda wd, bi: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        args.append(dp)
    out = pl.pallas_call(
        functools.partial(_attn_fwd_kernel_nhwc, heads, npad, dp is not None),
        out_shape=jax.ShapeDtypeStruct((b, hb, ws, wb_, ws, c), x.dtype),
        grid=(nwz, b // gb),
        in_specs=in_specs,
        out_specs=x_spec,
        scratch_shapes=[pltpu.VMEM((gb, npad, c), x.dtype)],
        compiler_params=_attn_compiler_params("arbitrary", "arbitrary", n_inputs=9),
        cost_estimate=pl.CostEstimate(
            flops=(8 * c * c + 4 * heads * npad * (c // heads) * 2)
            * npad * b * nwz,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * nwz * heads * npad * npad,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, w, c)


@functools.partial(jax.jit, static_argnames=("window", "heads", "interpret"))
def _attn_backward_nhwc(x, wqkv, bqkv, scale, z, wproj, bproj, lns, g_out,
                        window, heads, interpret=False, dp=None):
    b, h, w, c = x.shape
    ws = window
    hb, wb_ = h // ws, w // ws
    nwz = hb * wb_
    npad = z.shape[-1]
    zn = z.shape[0]
    gb = _fused_attn_pick(b, heads, npad, c, train=True)

    xv = x.reshape(b, hb, ws, wb_, ws, c)
    gv = g_out.reshape(b, hb, ws, wb_, ws, c)
    x_spec = pl.BlockSpec(
        (gb, 1, ws, 1, ws, c),
        lambda wd, bi: (bi, wd // wb_, 0, wd % wb_, 0, 0),
        memory_space=pltpu.VMEM,
    )
    z_spec = pl.BlockSpec(
        (1, heads, npad, npad),
        (lambda wd, bi: (0, 0, 0, 0)) if zn == 1
        else (lambda wd, bi: (wd, 0, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda wd, bi: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [x_spec, const(c, 3 * c), const(1, 3 * c), const(heads, 1, 1),
                z_spec, const(c, c), const(1, c), const(1, c), x_spec]
    args = [xv, wqkv, bqkv.reshape(1, -1), scale, z, wproj,
            bproj.reshape(1, -1), lns.reshape(1, -1), gv]
    if dp is not None:
        in_specs.append(pl.BlockSpec(
            (gb, dp.shape[1], 128), lambda wd, bi: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        args.append(dp)
    outs = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel_nhwc, heads, npad, zn == 1, dp is not None
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hb, ws, wb_, ws, c), x.dtype),  # dx
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),           # dwqkv
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),           # dbqkv
            jax.ShapeDtypeStruct((heads, npad), jnp.float32),        # dscale
            jax.ShapeDtypeStruct((zn, heads, npad, npad), jnp.float32),  # dz
            jax.ShapeDtypeStruct((c, c), jnp.float32),               # dwproj
            jax.ShapeDtypeStruct((1, c), jnp.float32),               # dbproj
            jax.ShapeDtypeStruct((1, c), jnp.float32),               # dlns
            jax.ShapeDtypeStruct((1, c), jnp.float32),               # dlnb
        ),
        grid=(nwz, b // gb),
        in_specs=in_specs,
        out_specs=(
            x_spec, const(c, 3 * c), const(1, 3 * c), const(heads, npad),
            z_spec, const(c, c), const(1, c), const(1, c), const(1, c),
        ),
        scratch_shapes=[pltpu.VMEM((gb, npad, c), x.dtype),
                        pltpu.VMEM((gb, npad, c), g_out.dtype)],
        compiler_params=_attn_compiler_params("arbitrary", "arbitrary", n_inputs=9),
        cost_estimate=pl.CostEstimate(
            flops=(24 * c * c + 10 * heads * npad * (c // heads))
            * npad * b * nwz,
            bytes_accessed=4 * x.size * x.dtype.itemsize,
            transcendentals=2 * b * nwz * heads * npad * npad,
        ),
        interpret=interpret,
    )(*args)
    return (outs[0].reshape(b, h, w, c),) + outs[1:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _attention_half_nhwc_core(x, wqkv, bqkv, logit_scale, bias, mask, wproj,
                              bproj, lns, lnb, dp, window, heads,
                              interpret=False):
    """NHWC core on the PRE-PADDED (H, NP, NP) bias / optional (nW, NP, NP)
    mask (see attention_half_nhwc). ``dp`` (B, 8, 128) f32 or None: fused
    residual — out = x + dp·branch (dp is a constant per-image
    stochastic-depth scale; its cotangent is None like mask's)."""
    scale = jnp.exp(jnp.minimum(logit_scale.astype(jnp.float32), jnp.log(100.0)))
    z = _merge_bias_mask(bias, mask)
    return _attn_forward_nhwc(x, wqkv, bqkv, scale, z, wproj, bproj, lns,
                              lnb, window, heads, interpret=interpret, dp=dp)


def _attn_half_nhwc_fwd(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj,
                        lns, lnb, dp, window, heads, interpret=False):
    out = _attention_half_nhwc_core(x, wqkv, bqkv, logit_scale, bias, mask,
                                    wproj, bproj, lns, lnb, dp, window,
                                    heads, interpret)
    return out, (x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj, lns,
                 dp)


def _attn_half_nhwc_bwd(window, heads, interpret, res, g_out):
    x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj, lns, dp = res
    ls32 = logit_scale.astype(jnp.float32)
    clamp = jnp.log(100.0)
    scale = jnp.exp(jnp.minimum(ls32, clamp))
    z = _merge_bias_mask(bias, mask)

    (dx, dwqkv, dbqkv, dscale, dz, dwproj, dbproj, dlns, dlnb) = (
        _attn_backward_nhwc(
            x, wqkv, bqkv, scale, z, wproj, bproj, lns, g_out, window, heads,
            interpret=interpret, dp=dp,
        )
    )
    dscale = jnp.sum(dscale, axis=1).reshape(-1, 1, 1)
    dbias = jnp.sum(dz, axis=0).astype(bias.dtype)
    dls = (dscale * scale * (ls32 < clamp)).astype(logit_scale.dtype)
    dmask = None if mask is None else jnp.zeros_like(mask)
    ddp = None if dp is None else jnp.zeros_like(dp)
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
        ddp,
    )


_attention_half_nhwc_core.defvjp(_attn_half_nhwc_fwd, _attn_half_nhwc_bwd)


def nhwc_token_perm(window: int):
    """Token index → slotted row in the kernel's (npad = ws·slot, C)
    buffer: window row r occupies the 8-aligned slot [r·slot, r·slot+ws)
    (see _attn_fwd_kernel_nhwc). Returns (perm (ws²,), npad)."""
    import numpy as np

    slot = -(-window // 8) * 8
    i = np.arange(window * window)
    return (i // window) * slot + (i % window), window * slot


def attention_half_nhwc(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj,
                        lns, lnb, window, heads, interpret=False, dp=None):
    """attention_half on the (possibly pre-rolled) NHWC feature map x
    (B, H, W, C) directly — the BlockSpec index map does the window
    gathering, so the window_partition / window_reverse transposes (and
    their backward twins) never hit HBM (VERDICT r4 item 3). Tokens live
    in the kernels' 8-aligned slotted layout (nhwc_token_perm), so the
    bias/mask are scattered to the slotted order here, with -1e9 filling
    the slack KEY columns exactly as attention_half's trailing pad did;
    the scatter's VJP gathers dbias back to the (H, ws², ws²) layout."""
    n = window * window
    perm, npad = nhwc_token_perm(window)
    if npad != n:
        perm = jnp.asarray(perm)
        bias = jnp.full(
            (bias.shape[0], npad, npad), -1e9, bias.dtype
        ).at[:, perm[:, None], perm[None, :]].set(bias)
        if mask is not None:
            mask = jnp.zeros(
                (mask.shape[0], npad, npad), mask.dtype
            ).at[:, perm[:, None], perm[None, :]].set(mask)
    return _attention_half_nhwc_core(x, wqkv, bqkv, logit_scale, bias, mask,
                                     wproj, bproj, lns, lnb, dp, window,
                                     heads, interpret)


def attention_half_nhwc_spmd(x, wqkv, bqkv, logit_scale, bias, mask, wproj,
                             bproj, lns, lnb, window, heads, interpret=False,
                             dp=None):
    """attention_half_nhwc, shard_mapped over the data axis when a
    multi-device kernel mesh is active; x (B, H, W, C) — and the optional
    per-image dp scale (B, 8, 128) — split on batch."""
    from hvt import parallel

    if dp is None:
        fn = parallel.shard_map_kernel(
            lambda x_, wq_, bq_, ls_, b_, m_, wp_, bp_, s_, o_: (
                attention_half_nhwc(
                    x_, wq_, bq_, ls_, b_, m_, wp_, bp_, s_, o_, window,
                    heads, interpret
                )
            ),
            batch_argnums=(0,),
            n_args=10,
        )
        return fn(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj, lns,
                  lnb)
    fn = parallel.shard_map_kernel(
        lambda x_, wq_, bq_, ls_, b_, m_, wp_, bp_, s_, o_, d_: (
            attention_half_nhwc(
                x_, wq_, bq_, ls_, b_, m_, wp_, bp_, s_, o_, window, heads,
                interpret, dp=d_
            )
        ),
        batch_argnums=(0, 10),
        n_args=11,
    )
    return fn(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj, lns, lnb,
              dp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _attention_half_core(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj,
                         lns, lnb, heads, interpret=False):
    """Core on PRE-PADDED window tokens x (nWB, NP, C), NP a multiple of 8
    (see attention_half). bias is the padded (H, NP, NP) cpb bias with -1e9
    on padded entries; mask the optional padded (nW, NP, NP) shift mask."""
    scale = jnp.exp(jnp.minimum(logit_scale.astype(jnp.float32), jnp.log(100.0)))
    z = _merge_bias_mask(bias, mask)
    return _attn_forward(x, wqkv, bqkv, scale, z, wproj, bproj, lns, lnb,
                         heads, interpret=interpret)


def attention_half(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj,
                   lns, lnb, heads, interpret=False):
    """branch = norm1(proj(cosine_window_attention(qkv(x)))) for window
    tokens x (nWB, N, C). bias is the (H, N, N) cpb bias; mask the optional
    (nW, N, N) shift mask.

    The window-token dim is padded here to the next multiple of 8
    (49 → 56 for window-7) so the kernels run the qkv/proj projections as
    single large MXU matmuls (see _attn_fwd_kernel). Exactness: padded key
    columns get -1e9 in the combined bias, so softmax weights them zero for
    real queries; padded query rows are sliced away below, and the slice's
    VJP zero-pads the upstream gradient, which makes every padded-row/col
    gradient contribution exactly zero (padded x rows are zero, so even
    their dqkv rows cannot reach dwqkv/dbqkv)."""
    n = x.shape[1]
    npad = -(-n // 8) * 8
    if npad != n:
        pad = npad - n
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)),
                       constant_values=-1e9)
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, pad), (0, pad)))
    out = _attention_half_core(x, wqkv, bqkv, logit_scale, bias, mask,
                               wproj, bproj, lns, lnb, heads, interpret)
    return out[:, :n] if npad != n else out


def _attn_half_fwd(x, wqkv, bqkv, logit_scale, bias, mask, wproj, bproj,
                   lns, lnb, heads, interpret=False):
    out = _attention_half_core(x, wqkv, bqkv, logit_scale, bias, mask, wproj,
                               bproj, lns, lnb, heads, interpret)
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


_attention_half_core.defvjp(_attn_half_fwd, _attn_half_bwd)


def mlp_half_spmd(x, w1, b1, w2, b2, lns, lnb, interpret=False, tpi=0,
                  dp=None):
    """mlp_half, shard_mapped over the data axis when a multi-device kernel
    mesh is active (see hvt.parallel.shard_map_kernel). x's leading flat-token
    dim is batch-major, so sharding it over 'data' splits whole images —
    and the optional per-image dp scale (B, 8, 128) splits the same way."""
    from hvt import parallel

    if dp is None:
        fn = parallel.shard_map_kernel(
            lambda *a: mlp_half(*a, interpret), batch_argnums=(0,), n_args=7
        )
        return fn(x, w1, b1, w2, b2, lns, lnb)
    fn = parallel.shard_map_kernel(
        lambda *a: mlp_half(*a[:7], interpret, tpi, dp=a[7]),
        batch_argnums=(0, 7), n_args=8,
    )
    return fn(x, w1, b1, w2, b2, lns, lnb, dp)


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
    live activation blocks) fits the scoped-VMEM routing threshold —
    budget + 8 MiB headroom (HVT_FITS_VMEM_MB overrides). At the 32 MiB
    default budget SwinV2-T's stage 4 (C=768) now FUSES (chip A/B round 4:
    119.90 vs 120.68 ms — the raised Mosaic limit flipped round 3's
    fallback_xla verdict); swinv2_large-scale stage 4 (C=1536) still falls
    back per-block."""
    if mlp_hidden is not None:
        # Fusability is judged at the legacy width-scaled row block — a
        # minimum viable block; the budget knob (_mlp_target_rows) scales
        # blocks of components that fit.
        r = max(64, (512 * 96) // c)
        weights = 2 * c * mlp_hidden * 2  # bf16 w1+w2
        grads = 2 * c * mlp_hidden * 4 if train else 0
        live = (6 if train else 3) * r * max(mlp_hidden, c) * 4
    else:
        weights = 4 * c * c * 2  # bf16 qkv+proj
        grads = 4 * c * c * 4 if train else 0
        n_rows = -(-n // 8) * 8  # kernel token dim after window padding
        n_pad = n_rows * (-(-n // 128) * 128)
        live = 8 * n_pad * 48 + 6 * 8 * n_rows * 4 * c
    import os

    override = os.environ.get("HVT_FITS_VMEM_MB")
    if override is not None:
        thresh = int(override) * 2**20
    else:
        thresh = max(12 * 2**20, _fused_attn_budget_bytes() + 8 * 2**20)
    return weights + grads + live < thresh

