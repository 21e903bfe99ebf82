"""Pallas per-channel reduction kernels for BatchNorm training.

Measured status (see BENCH.md "roofline", round 2): on TPU, XLA fuses the
BatchNorm statistics and gradient reductions *into the adjacent
convolutions* (multi-output kOutput fusions at HBM speed of light), and a
standalone XLA channel reduce already streams at ~750 GB/s — identical to
this kernel. Routing BN through these kernels therefore does NOT speed up
the conv models (it breaks the conv+stats fusion; ~36% slower on a
conv+BN+ReLU pair at ResNet-50 stage-1 shapes), and ``bn_pallas`` defaults
to off. The kernels are kept as the measured-parity harness behind
``common.PallasBatchNorm`` and for positions where a reduction has no
producer to fuse into.

Reference behavior covered: BatchNorm training semantics of the reference's
timm ResNet-50 (reference models.py:200-233, torch BN with biased batch
moments and running-stat momentum 0.1 torch-convention = 0.9 here).

Three public entry points:

* ``channel_sums(x2d)`` — per-channel Σx and Σx² of a (rows, C) array.
* ``bn_bwd_reduce(g2d, x2d, mean, rstd)`` — per-channel Σg and Σ(g·x̂),
  the two reductions of the BatchNorm backward.
* ``bn_train(x2d, scale, bias, ...)`` — full training-mode BatchNorm with a
  custom VJP: both kernels above feed exactly the textbook BN gradient, and
  every elementwise piece stays in jnp so XLA fuses it with neighbors.

All kernels accumulate in f32 regardless of input dtype. Under a multi-chip
mesh the kernels run per data shard inside a shard_map and psum their
partial sums over the data axis (global-batch statistics, the documented
hvt semantics — resnet.py module docstring).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from hvt.ops.window_attention import _pallas_available

# Largest bf16 input block per kernel invocation. Small enough that the f32
# conversion temporaries stay well inside VMEM with double buffering, large
# enough to amortize grid overhead.
_MAX_BLOCK_BYTES = 1 << 20
_ROW_CANDIDATES = (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8)


def _pick_rows(m: int, c: int, itemsize: int = 2) -> Optional[int]:
    for cand in _ROW_CANDIDATES:
        if m % cand == 0 and cand * c * itemsize <= _MAX_BLOCK_BYTES:
            return cand
    return None


def _fold(c: int) -> int:
    """Rows-into-lanes fold factor for narrow channel counts.

    Mosaic wants ≥128-lane blocks; for C < 128 (R50 stage-1 C=64) we view
    (rows, C) as (rows/f, f·C) — channel j of the folded array is channel
    j % C, so per-channel sums are recovered by an (f, C)-reshape + sum."""
    if c >= 128 or 128 % c != 0:
        return 1
    return 128 // c


# ---------------------------------------------------------------------------
# Forward statistics kernel: Σx, Σx²
# ---------------------------------------------------------------------------


def _sums_kernel(x_ref, s_ref, q_ref):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    s = jnp.sum(x, axis=0, keepdims=True)
    q = jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        s_ref[...] = s
        q_ref[...] = q

    @pl.when(i != 0)
    def _acc():
        s_ref[...] += s
        q_ref[...] += q


def _sums_pallas(x2d: jax.Array, rows: int, interpret: bool):
    m, c = x2d.shape
    out = jax.ShapeDtypeStruct((1, c), jnp.float32)
    s, q = pl.pallas_call(
        _sums_kernel,
        grid=(m // rows,),
        in_specs=[pl.BlockSpec((rows, c), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((1, c), lambda i: (0, 0))] * 2,
        out_shape=[out, out],
        interpret=interpret,
    )(x2d)
    return s[0], q[0]


def _sums_jnp(x2d: jax.Array):
    xf = x2d.astype(jnp.float32)
    return jnp.sum(xf, axis=0), jnp.sum(xf * xf, axis=0)


def channel_sums(
    x2d: jax.Array, *, use_pallas: bool = True, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Per-channel (Σx, Σx²) of a (rows, C) array, f32 accumulation.

    Global sums: under an active multi-device kernel mesh the rows are
    sharded over the data axis and partial sums are psum'd."""
    m, c = x2d.shape
    if not (interpret or (use_pallas and _pallas_available())):
        return _sums_jnp(x2d)

    from hvt import parallel

    mesh = parallel.kernel_mesh()
    shards = mesh.shape[parallel.DATA_AXIS] if mesh is not None else 1
    f = _fold(c)
    local_m = m // shards
    if local_m % f != 0:
        return _sums_jnp(x2d)
    rows = _pick_rows(local_m // f, c * f, x2d.dtype.itemsize)
    if rows is None:
        return _sums_jnp(x2d)

    def local(x):
        s, q = _sums_pallas(x.reshape(-1, c * f), rows, interpret)
        if f > 1:
            s = jnp.sum(s.reshape(f, c), axis=0)
            q = jnp.sum(q.reshape(f, c), axis=0)
        if mesh is not None:
            s = jax.lax.psum(s, parallel.DATA_AXIS)
            q = jax.lax.psum(q, parallel.DATA_AXIS)
        return s, q

    if mesh is None:
        return local(x2d)
    P = jax.sharding.PartitionSpec
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(parallel.DATA_AXIS),
        out_specs=(P(), P()),
        check_vma=False,
    )(x2d)


# ---------------------------------------------------------------------------
# Backward reduction kernel: Σg, Σ(g·x̂)
# ---------------------------------------------------------------------------


def _bwd_reduce_kernel(g_ref, x_ref, mean_ref, rstd_ref, sg_ref, sgx_ref):
    i = pl.program_id(0)
    g = g_ref[...].astype(jnp.float32)
    xh = (x_ref[...].astype(jnp.float32) - mean_ref[...]) * rstd_ref[...]
    sg = jnp.sum(g, axis=0, keepdims=True)
    sgx = jnp.sum(g * xh, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        sg_ref[...] = sg
        sgx_ref[...] = sgx

    @pl.when(i != 0)
    def _acc():
        sg_ref[...] += sg
        sgx_ref[...] += sgx


def _bwd_reduce_pallas(g2d, x2d, mean_row, rstd_row, rows, interpret):
    m, c = x2d.shape
    out = jax.ShapeDtypeStruct((1, c), jnp.float32)
    sg, sgx = pl.pallas_call(
        _bwd_reduce_kernel,
        grid=(m // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, c), lambda i: (0, 0))] * 2,
        out_shape=[out, out],
        interpret=interpret,
    )(g2d, x2d, mean_row, rstd_row)
    return sg[0], sgx[0]


def _bwd_reduce_jnp(g2d, x2d, mean, rstd):
    gf = g2d.astype(jnp.float32)
    xh = (x2d.astype(jnp.float32) - mean) * rstd
    return jnp.sum(gf, axis=0), jnp.sum(gf * xh, axis=0)


def bn_bwd_reduce(
    g2d: jax.Array,
    x2d: jax.Array,
    mean: jax.Array,
    rstd: jax.Array,
    *,
    use_pallas: bool = True,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Per-channel (Σg, Σ g·(x−μ)·rstd) over the row dim of (rows, C) arrays."""
    m, c = x2d.shape
    if not (interpret or (use_pallas and _pallas_available())):
        return _bwd_reduce_jnp(g2d, x2d, mean, rstd)

    from hvt import parallel

    mesh = parallel.kernel_mesh()
    shards = mesh.shape[parallel.DATA_AXIS] if mesh is not None else 1
    f = _fold(c)
    local_m = m // shards
    if local_m % f != 0:
        return _bwd_reduce_jnp(g2d, x2d, mean, rstd)
    rows = _pick_rows(local_m // f, c * f, x2d.dtype.itemsize)
    if rows is None:
        return _bwd_reduce_jnp(g2d, x2d, mean, rstd)

    mean_row = jnp.tile(mean.astype(jnp.float32), f).reshape(1, c * f)
    rstd_row = jnp.tile(rstd.astype(jnp.float32), f).reshape(1, c * f)

    def local(g, x, mr, rr):
        sg, sgx = _bwd_reduce_pallas(
            g.reshape(-1, c * f), x.reshape(-1, c * f), mr, rr, rows, interpret
        )
        if f > 1:
            sg = jnp.sum(sg.reshape(f, c), axis=0)
            sgx = jnp.sum(sgx.reshape(f, c), axis=0)
        if mesh is not None:
            sg = jax.lax.psum(sg, parallel.DATA_AXIS)
            sgx = jax.lax.psum(sgx, parallel.DATA_AXIS)
        return sg, sgx

    if mesh is None:
        return local(g2d, x2d, mean_row, rstd_row)
    P = jax.sharding.PartitionSpec
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(parallel.DATA_AXIS), P(parallel.DATA_AXIS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(g2d, x2d, mean_row, rstd_row)


# ---------------------------------------------------------------------------
# Training-mode BatchNorm with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def bn_train(x2d, scale, bias, eps, out_dtype, use_pallas, interpret):
    """Training BatchNorm over the row dim: returns (y, mean, var).

    ``y`` is cast to ``out_dtype`` (so the cotangent arriving in the custom
    backward is the compute dtype, not f32 — the backward kernel then streams
    bf16); ``mean``/``var`` are f32 biased batch moments for running-stat
    updates. Matches flax ``nn.BatchNorm``'s fast-variance semantics
    (E[x²] − E[x]², f32 stats)."""
    return _bn_train_fwd(x2d, scale, bias, eps, out_dtype, use_pallas, interpret)[0]


def _bn_train_fwd(x2d, scale, bias, eps, out_dtype, use_pallas, interpret):
    n = x2d.shape[0]
    s, q = channel_sums(x2d, use_pallas=use_pallas, interpret=interpret)
    mean = s / n
    var = jnp.maximum(q / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xf = x2d.astype(jnp.float32)
    y = ((xf - mean) * rstd * scale.astype(jnp.float32) + bias.astype(jnp.float32))
    y = y.astype(out_dtype)
    return (y, mean, var), (x2d, mean, rstd, scale)


def _bn_train_bwd(eps, out_dtype, use_pallas, interpret, res, cts):
    x2d, mean, rstd, scale = res
    dy, dmean_ct, dvar_ct = cts
    n = x2d.shape[0]
    sg, sgx = bn_bwd_reduce(
        dy, x2d, mean, rstd, use_pallas=use_pallas, interpret=interpret
    )
    xf = x2d.astype(jnp.float32)
    xh = (xf - mean) * rstd
    dyf = dy.astype(jnp.float32)
    dx = scale.astype(jnp.float32) * rstd * (dyf - sg / n - xh * (sgx / n))
    # Exact contributions of the mean/var outputs (zero in the training loop,
    # where they only feed non-differentiated running-statistic updates).
    dx = dx + dmean_ct / n + dvar_ct * (2.0 / n) * (xf - mean)
    dgamma = (sgx).astype(scale.dtype)
    dbeta = sg.astype(scale.dtype)
    return dx.astype(x2d.dtype), dgamma, dbeta


bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)
