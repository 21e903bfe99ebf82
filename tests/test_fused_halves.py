"""Parity tests for the fused block-half kernels (hvt.ops.fused_halves_pallas)
against pure-jnp references, in interpret mode on CPU.

The kernels do their matmuls bf16-in/f32-out (the same arithmetic XLA uses
for a bf16 Dense layer), so tolerances are at bf16-matmul level relative to
the f32 references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvt.models import swinv2
from hvt.ops import fused_halves_pallas as fh
from hvt.ops import window_attention as wa


def _ln_ref(x, s, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * s + b


def _assert_close(a, b, tol, name=""):
    err = float(jnp.abs(a - b).max())
    scale = float(jnp.abs(b).max()) + 1e-9
    assert err <= tol * scale, f"{name}: rel err {err / scale:.4g} > {tol}"


def _mlp_ref(x, w1, b1, w2, b2, lns, lnb):
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    return _ln_ref(h @ w2 + b2, lns, lnb)


def test_mlp_half_matches_reference():
    rng = np.random.default_rng(0)
    t, c, hidden = 96, 64, 256
    x = jnp.asarray(rng.normal(size=(t, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, hidden)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(hidden,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(hidden, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    lns = jnp.asarray(rng.normal(size=(c,)) * 0.5 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)

    out = fh.mlp_half(x, w1, b1, w2, b2, lns, lnb, True)
    ref = _mlp_ref(x, w1, b1, w2, b2, lns, lnb)
    _assert_close(out, ref, 0.02, "mlp fwd")

    ct = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
    gk = jax.grad(
        lambda *a: jnp.vdot(fh.mlp_half(*a, True), ct), argnums=tuple(range(7))
    )(x, w1, b1, w2, b2, lns, lnb)
    gr = jax.grad(
        lambda *a: jnp.vdot(_mlp_ref(*a), ct), argnums=tuple(range(7))
    )(x, w1, b1, w2, b2, lns, lnb)
    names = ["dx", "dw1", "db1", "dw2", "db2", "dlns", "dlnb"]
    for name, a, b in zip(names, gk, gr):
        _assert_close(a, b, 0.03, f"mlp {name}")


def test_mlp_half_fused_residual_matches_composition():
    """Fused residual + stochastic depth for the MLP half (round 5): with
    image-aligned row blocks (tpi tokens per image), the kernel's
    out = x + s·branch must reproduce the XLA composition for per-image
    scales covering dropped / kept / eval cases — forward and gradients
    (the branch backward runs on s·g; dx adds the pass-through g)."""
    rng = np.random.default_rng(5)
    b, tpi, c, hidden = 4, 16, 64, 256
    t = b * tpi
    assert fh.mlp_resid_images_per_block(t, tpi, c, hidden) > 0
    x = jnp.asarray(rng.normal(size=(t, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, hidden)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(hidden,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(hidden, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    lns = jnp.asarray(rng.normal(size=(c,)) * 0.5 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    s = jnp.asarray([0.0, 1.25, 1.25, 1.0], jnp.float32)
    dp = jnp.broadcast_to(s[:, None, None], (b, 8, 128))
    s_rows = jnp.repeat(s, tpi)[:, None]

    def fused(x_, wv):
        return fh.mlp_half(x_, wv, b1, w2, b2, lns, lnb, True, tpi, dp=dp)

    def composed(x_, wv):
        return x_ + s_rows * _mlp_ref(x_, wv, b1, w2, b2, lns, lnb)

    _assert_close(fused(x, w1), composed(x, w1), 0.02, "mlp resid fwd")
    gx0 = jax.grad(lambda x_: jnp.sum(composed(x_, w1) ** 2))(x)
    gx1 = jax.grad(lambda x_: jnp.sum(fused(x_, w1) ** 2))(x)
    _assert_close(gx1, gx0, 0.03, "mlp resid dx")
    gw0 = jax.grad(lambda wv: jnp.sum(composed(x, wv) ** 2))(w1)
    gw1 = jax.grad(lambda wv: jnp.sum(fused(x, wv) ** 2))(w1)
    _assert_close(gw1, gw0, 0.03, "mlp resid dw1")


def _attn_ref(xw, wqkv, bqkv, ls, bias, mask, wproj, bproj, lns, lnb, heads):
    nwb, n, c = xw.shape
    d = c // heads
    qkv = xw @ wqkv + bqkv
    qkv = qkv.reshape(nwb, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    qn = q / jnp.sqrt((q * q).sum(-1, keepdims=True) + 1e-24)
    kn = k / jnp.sqrt((k * k).sum(-1, keepdims=True) + 1e-24)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qn, kn)
    scale = jnp.exp(jnp.minimum(ls, jnp.log(100.0)))
    attn = attn * scale[None] + bias[None]
    if mask is not None:
        attn = attn + jnp.tile(mask, (nwb // mask.shape[0], 1, 1))[:, None]
    attn = jax.nn.softmax(attn, -1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(nwb, n, c)
    return _ln_ref(out @ wproj + bproj, lns, lnb)


@pytest.mark.parametrize("shifted", [False, True])
def test_attention_half_matches_reference(shifted):
    rng = np.random.default_rng(1)
    nw, b, n, c, heads = 4, 2, 49, 96, 3
    nwb = nw * b
    xw = jnp.asarray(rng.normal(size=(nwb, n, c)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.normal(size=(heads, 1, 1)) * 0.5 + 1.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(heads, n, n)), jnp.float32)
    mask = (
        jnp.asarray(rng.normal(size=(nw, n, n)), jnp.float32) if shifted else None
    )
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    lns = jnp.asarray(rng.normal(size=(c,)) * 0.5 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)

    out = fh.attention_half(xw, wqkv, bqkv, ls, bias, mask, wproj, bproj,
                            lns, lnb, heads, True)
    ref = _attn_ref(xw, wqkv, bqkv, ls, bias, mask, wproj, bproj, lns, lnb, heads)
    _assert_close(out, ref, 0.02, "attn fwd")

    ct = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
    gk = jax.grad(
        lambda *a: jnp.vdot(
            fh.attention_half(a[0], a[1], a[2], a[3], a[4], mask, a[5], a[6],
                              a[7], a[8], heads, True),
            ct,
        ),
        argnums=tuple(range(9)),
    )(xw, wqkv, bqkv, ls, bias, wproj, bproj, lns, lnb)
    gr = jax.grad(
        lambda *a: jnp.vdot(
            _attn_ref(a[0], a[1], a[2], a[3], a[4], mask, a[5], a[6], a[7],
                      a[8], heads),
            ct,
        ),
        argnums=tuple(range(9)),
    )(xw, wqkv, bqkv, ls, bias, wproj, bproj, lns, lnb)
    names = ["dx", "dwqkv", "dbqkv", "dls", "dbias", "dwproj", "dbproj",
             "dlns", "dlnb"]
    for name, a, b in zip(names, gk, gr):
        _assert_close(a, b, 0.03, f"attn {name}")


@pytest.mark.parametrize("ws,h,w,shift", [
    (4, 8, 8, 0), (4, 8, 8, 2),      # no in-kernel token pad (16 % 8 == 0)
    (7, 14, 14, 0), (7, 14, 14, 3),  # production window: 49 -> 56 pad
])
def test_attention_half_nhwc_matches_windowed(ws, h, w, shift):
    """NHWC direct windowing (round 5, VERDICT r4 item 3): the 6-d
    BlockSpec gather + slotted in-kernel token layout must reproduce the
    windowed entry (partition -> attention_half -> reverse) to f32
    round-off — the slotted layout permutes the softmax/matmul summation
    order (real-TPU Mosaic rejects the 7x7 -> 49 shape cast that would
    have kept it bitwise, see _attn_fwd_kernel_nhwc), so exact equality
    is not expected anywhere."""
    rng = np.random.default_rng(2)
    b, c, heads = 4, 16, 2
    n = ws * ws
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.normal(size=(heads, 1, 1)) * 0.5 + 1.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(heads, n, n)), jnp.float32)
    mask = (
        jnp.asarray(wa.shift_attn_mask((h, w), ws, shift)) if shift else None
    )
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    lns = jnp.asarray(rng.normal(size=(c,)) * 0.5 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)

    def windowed(x_, wv, bb):
        xw = wa.window_partition(x_, ws)
        bw = fh.attention_half(xw, wv, bqkv, ls, bb, mask, wproj, bproj,
                               lns, lnb, heads, True)
        return wa.window_reverse(bw, ws, h, w)

    def nhwc(x_, wv, bb):
        return fh.attention_half_nhwc(x_, wv, bqkv, ls, bb, mask, wproj,
                                      bproj, lns, lnb, ws, heads, True)

    # Tolerances are bf16-requantization scale: the slotted token order
    # shifts f32 epsilon differences across bf16 rounding boundaries
    # before the proj matmul, giving isolated ~2e-4-relative outliers
    # (measured); everything else is f32 round-off.
    _assert_close(nhwc(x, wqkv, bias), windowed(x, wqkv, bias), 2e-3,
                  "nhwc fwd")
    gx0 = jax.grad(lambda x_: jnp.sum(windowed(x_, wqkv, bias) ** 2))(x)
    gx1 = jax.grad(lambda x_: jnp.sum(nhwc(x_, wqkv, bias) ** 2))(x)
    _assert_close(gx1, gx0, 5e-3, "nhwc dx")
    gw0 = jax.grad(lambda wv: jnp.sum(windowed(x, wv, bias) ** 2))(wqkv)
    gw1 = jax.grad(lambda wv: jnp.sum(nhwc(x, wv, bias) ** 2))(wqkv)
    _assert_close(gw1, gw0, 5e-3, "nhwc dwqkv")
    gb0 = jax.grad(lambda bb: jnp.sum(windowed(x, wqkv, bb) ** 2))(bias)
    gb1 = jax.grad(lambda bb: jnp.sum(nhwc(x, wqkv, bb) ** 2))(bias)
    _assert_close(gb1, gb0, 5e-3, "nhwc dbias")


@pytest.mark.parametrize("ws,h,w,shift", [
    (4, 8, 8, 0), (7, 14, 14, 3),
])
def test_attention_half_nhwc_fused_residual(ws, h, w, shift):
    """Fused residual + stochastic depth (round 5): the kernel epilogue's
    out = x + s·branch must reproduce the XLA composition
    x + s·attention_half_nhwc(x) — per-image s covers the three live
    cases (kept 1/keep, dropped 0, eval 1) — in forward and in every
    gradient (the branch backward runs on s·g; dx adds the pass-through
    g in the epilogue)."""
    rng = np.random.default_rng(3)
    b, c, heads = 4, 16, 2
    n = ws * ws
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.normal(size=(heads, 1, 1)) * 0.5 + 1.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(heads, n, n)), jnp.float32)
    mask = (
        jnp.asarray(wa.shift_attn_mask((h, w), ws, shift)) if shift else None
    )
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    lns = jnp.asarray(rng.normal(size=(c,)) * 0.5 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    # drop-path scales: image 0 dropped, 1-2 kept at 1/keep, 3 eval-style 1
    s = jnp.asarray([0.0, 1.25, 1.25, 1.0], jnp.float32)
    dp = jnp.broadcast_to(s[:, None, None], (b, 8, 128))

    def fused(x_, wv):
        return fh.attention_half_nhwc(x_, wv, bqkv, ls, bias, mask, wproj,
                                      bproj, lns, lnb, ws, heads, True,
                                      dp=dp)

    def composed(x_, wv):
        br = fh.attention_half_nhwc(x_, wv, bqkv, ls, bias, mask, wproj,
                                    bproj, lns, lnb, ws, heads, True)
        return x_ + s[:, None, None, None] * br

    _assert_close(fused(x, wqkv), composed(x, wqkv), 2e-3, "resid fwd")
    gx0 = jax.grad(lambda x_: jnp.sum(composed(x_, wqkv) ** 2))(x)
    gx1 = jax.grad(lambda x_: jnp.sum(fused(x_, wqkv) ** 2))(x)
    _assert_close(gx1, gx0, 5e-3, "resid dx")
    gw0 = jax.grad(lambda wv: jnp.sum(composed(x, wv) ** 2))(wqkv)
    gw1 = jax.grad(lambda wv: jnp.sum(fused(x, wv) ** 2))(wqkv)
    _assert_close(gw1, gw0, 5e-3, "resid dwqkv")


def test_swinblock_fuse_resid_eval_matches_unfused_route():
    """Model-level: fuse_resid must not change eval numerics (s = 1 —
    out = x + branch exactly), across shifted and unshifted blocks."""
    from hvt.models.swinv2 import SwinTransformerV2

    def build(fr):
        return SwinTransformerV2(
            depths=(2,), num_heads=(2,), embed_dim=16, window_size=4,
            num_classes=8, fuse=True, fuse_resid=fr, drop_path_rate=0.2,
        )

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    m1, m0 = build(True), build(False)
    v = m1.init({"params": jax.random.key(0)}, x, train=False)
    y1 = m1.apply(v, x, train=False)
    y0 = m0.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))


def test_attention_half_production_shift_layout():
    """Stage-1-shaped shifted case (nwz = 64 shift-mask windows, N = 49,
    C = 96, heads = 3) at a reduced batch: pins the z-block index maps and
    the accumulating backward grid against regressions."""
    rng = np.random.default_rng(2)
    nw, b, n, c, heads = 64, 1, 49, 96, 3
    nwb = nw * b
    xw = jnp.asarray(rng.normal(size=(nwb, n, c)) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.05, jnp.float32)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    ls = jnp.full((heads, 1, 1), 1.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(heads, n, n)), jnp.float32)
    mask = jnp.asarray(wa.shift_attn_mask((56, 56), 7, 3), jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32)
    bproj = jnp.zeros((c,), jnp.float32)
    lns = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)

    out = fh.attention_half(xw, wqkv, bqkv, ls, bias, mask, wproj, bproj,
                            lns, lnb, heads, True)
    ref = _attn_ref(xw, wqkv, bqkv, ls, bias, mask, wproj, bproj,
                    lns, lnb, heads)
    _assert_close(out, ref, 0.02, "attn stage1 fwd")

    ct = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
    gk = jax.grad(
        lambda a, w: jnp.vdot(
            fh.attention_half(a, w, bqkv, ls, bias, mask, wproj, bproj,
                              lns, lnb, heads, True),
            ct,
        ),
        argnums=(0, 1),
    )(xw, wqkv)
    gr = jax.grad(
        lambda a, w: jnp.vdot(
            _attn_ref(a, w, bqkv, ls, bias, mask, wproj, bproj, lns, lnb, heads),
            ct,
        ),
        argnums=(0, 1),
    )(xw, wqkv)
    _assert_close(gk[0], gr[0], 0.03, "attn stage1 dx")
    _assert_close(gk[1], gr[1], 0.03, "attn stage1 dwqkv")


def test_swinblock_stage4_fallback_parity(monkeypatch):
    """Blocks whose resident set exceeds the fused kernels' VMEM routing
    threshold must route BOTH halves through the fallback (XLA attention
    under fallback_xla, plain Mlp) and still match the fuse=False path
    exactly — same parameter tree, same outputs/grads. Pinned at the
    round-3 10 MiB budget where stage 4 (C=768) doesn't fit; at the
    round-4 32 MiB default it fuses (chip-measured better, BENCH.md), and
    the fallback wiring guarded here still serves swinv2_large-scale
    stage 4 (C=1536) at any budget."""
    monkeypatch.setenv("HVT_FUSED_VMEM_MB", "10")
    c, heads, n = 768, 24, 49
    assert not fh.fits_vmem(c, heads, n, train=True)
    assert not fh.fits_vmem(c, heads, n, mlp_hidden=4 * c, train=True)
    # swinv2_large's stage 4 exceeds even the raised default threshold.
    monkeypatch.delenv("HVT_FUSED_VMEM_MB", raising=False)
    assert not fh.fits_vmem(1536, 48, 49, mlp_hidden=4 * 1536, train=True)
    monkeypatch.setenv("HVT_FUSED_VMEM_MB", "10")

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 7, 7, c)) * 0.1, jnp.float32
    )

    def block(fuse):
        # fuse_mlp_chunked off: this test pins the PURE-fallback wiring
        # (round 5 routes non-fitting MLPs through the chunked kernels by
        # default — covered by test_swinblock_big_c_mlp_chunked_route).
        return swinv2.SwinBlock(
            dim=c, num_heads=heads, window=7, shift=0, dtype=jnp.float32,
            fuse=fuse, fallback_xla=True, fuse_mlp_chunked=False,
        )

    v = block(False).init(jax.random.key(0), x)
    noise = np.random.default_rng(7)
    v = jax.tree_util.tree_map(
        lambda leaf: leaf
        + jnp.asarray(noise.normal(size=leaf.shape) * 0.05, leaf.dtype),
        v,
    )
    assert (
        jax.tree_util.tree_structure(v)
        == jax.tree_util.tree_structure(block(True).init(jax.random.key(0), x))
    )

    o_std = block(False).apply(v, x, deterministic=False)
    o_fused = block(True).apply(v, x, deterministic=False)
    _assert_close(o_fused, o_std, 1e-5, "stage4 fallback fwd")

    ct = jnp.asarray(
        np.random.default_rng(1).normal(size=o_std.shape), jnp.float32
    )

    def loss(params, fuse):
        return jnp.vdot(
            block(fuse).apply({"params": params}, x, deterministic=False), ct
        )

    g_std = jax.grad(loss)(v["params"], False)
    g_fused = jax.grad(loss)(v["params"], True)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_std),
        jax.tree_util.tree_leaves(g_fused),
    ):
        name = "/".join(str(p) for p in path)
        _assert_close(b, a, 1e-5, f"stage4 fallback grad {name}")


def test_swinblock_big_c_mlp_chunked_route(monkeypatch):
    """Round 5 (VERDICT r4 item 5): a big-C block whose fused MLP does NOT
    fit VMEM routes through the CHUNKED kernels (hidden dim streamed in K
    chunks) instead of falling back to XLA, and matches the fuse=False
    path at bf16-matmul tolerance. Pinned at the round-3 10 MiB budget
    where SwinV2-T stage 4 (C=768, hidden 3072) needs K=2."""
    monkeypatch.setenv("HVT_FUSED_VMEM_MB", "10")
    c, heads = 768, 24
    assert not fh.fits_vmem(c, heads, 49, mlp_hidden=4 * c, train=True)
    k = fh.mlp_chunks(c, 4 * c, train=True)
    assert k == 2, k
    # swinv2_large stage 4 (C=1536) chunks too at the round-4 default.
    monkeypatch.delenv("HVT_FUSED_VMEM_MB", raising=False)
    assert fh.mlp_chunks(1536, 4 * 1536, train=True) in (2, 4)
    monkeypatch.setenv("HVT_FUSED_VMEM_MB", "10")

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 7, 7, c)) * 0.1, jnp.float32
    )

    def block(fuse):
        return swinv2.SwinBlock(
            dim=c, num_heads=heads, window=7, shift=0, dtype=jnp.float32,
            fuse=fuse, fallback_xla=True,
        )

    v = block(False).init(jax.random.key(0), x)
    o_std = block(False).apply(v, x, deterministic=False)
    o_fused = block(True).apply(v, x, deterministic=False)
    _assert_close(o_fused, o_std, 0.02, "chunked-mlp fwd")

    ct = jnp.asarray(
        np.random.default_rng(1).normal(size=o_std.shape), jnp.float32
    )

    def loss(params, fuse):
        return jnp.vdot(
            block(fuse).apply({"params": params}, x, deterministic=False), ct
        )

    g_std = jax.grad(loss)(v["params"], False)
    g_fused = jax.grad(loss)(v["params"], True)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_std),
        jax.tree_util.tree_leaves(g_fused),
    ):
        name = "/".join(str(p) for p in path)
        _assert_close(b, a, 0.03, f"chunked-mlp grad {name}")


def test_swinblock_fuse_flag_parity():
    """Full swinv2_micro: fuse=True must match fuse=False (same params)
    within bf16-matmul tolerance, forward (train+eval) and gradients.
    Params are perturbed first — res-post-norm is zero-init, which makes
    blocks near-identities and the comparison vacuous otherwise."""
    rng = jax.random.key(0)
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32
    )
    m_std = swinv2.swinv2_micro(10, fuse=False)
    m_fused = swinv2.swinv2_micro(10, fuse=True)
    v = m_std.init(rng, x, train=False)
    noise = np.random.default_rng(7)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    leaves = [
        leaf + jnp.asarray(noise.normal(size=leaf.shape) * 0.05, leaf.dtype)
        for leaf in leaves
    ]
    v = jax.tree_util.tree_unflatten(treedef, leaves)

    for train in (False, True):
        kwargs = {"train": train}
        if train:
            kwargs["rngs"] = {"dropout": jax.random.key(1)}
        o_std = m_std.apply(v, x, **kwargs)
        o_fused = m_fused.apply(v, x, **kwargs)
        _assert_close(o_fused, o_std, 0.02, f"swinblock fwd train={train}")

    ct = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10)), jnp.float32)

    def loss(params, model):
        out = model.apply(
            {"params": params}, x, train=True, rngs={"dropout": jax.random.key(1)}
        )
        return jnp.vdot(out, ct)

    g_std = jax.grad(loss)(v["params"], m_std)
    g_fused = jax.grad(loss)(v["params"], m_fused)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_std),
        jax.tree_util.tree_leaves(g_fused),
    ):
        name = "/".join(str(p) for p in path)
        # 0.06: with fuse_attn_train default-on the attention half's fused
        # backward reorders bf16 reductions slightly differently (worst
        # observed rel err 0.055 on a near-zero bias grad).
        _assert_close(b, a, 0.06, f"swinblock grad {name}")


def test_force_tpu_lowering_context_restores():
    """force_tpu_lowering: nested and exception-unwound uses restore the
    prior state (export code relies on this to not leak into a session)."""
    import pytest

    from hvt import ops as ops_pkg

    assert not ops_pkg.tpu_lowering_forced()
    with ops_pkg.force_tpu_lowering():
        assert ops_pkg.tpu_lowering_forced()
        with ops_pkg.force_tpu_lowering():  # nesting is idempotent
            assert ops_pkg.tpu_lowering_forced()
        assert ops_pkg.tpu_lowering_forced()
    assert not ops_pkg.tpu_lowering_forced()

    with pytest.raises(RuntimeError):
        with ops_pkg.force_tpu_lowering():
            raise RuntimeError("boom")
    assert not ops_pkg.tpu_lowering_forced()


def test_vmem_budget_scales_blocks_and_limit(monkeypatch):
    """Round-4 VMEM discovery (BENCH.md "VMEM budget sweep"): the
    HVT_FUSED_VMEM_MB budget must scale the attention gb pick, the MLP
    row target, and the fits_vmem routing threshold monotonically (stage 4
    fuses at the 32 MiB default, falls back at round 3's 10 MiB), and the
    Mosaic limit must stay 2x the budget (the pick estimate under-predicts
    the real stack by up to ~30%)."""
    from hvt.ops import fused_halves_pallas as fh

    monkeypatch.setenv("HVT_FUSED_VMEM_MB", "10")
    gb_small = fh._fused_attn_pick(8192, 3, 49, 96, train=True)
    rows_small = fh._mlp_target_rows(96, 384)
    assert not fh.fits_vmem(768, 24, 49, mlp_hidden=3072, train=True)

    monkeypatch.setenv("HVT_FUSED_VMEM_MB", "32")
    gb_big = fh._fused_attn_pick(8192, 3, 49, 96, train=True)
    rows_big = fh._mlp_target_rows(96, 384)
    assert fh.fits_vmem(768, 24, 49, mlp_hidden=3072, train=True)
    # ...but not swinv2_large-scale stage 4 (C=1536) at any default.
    assert not fh.fits_vmem(1536, 48, 49, mlp_hidden=6144, train=True)

    assert gb_big > gb_small
    assert rows_big > rows_small
    params = fh._attn_compiler_params("arbitrary", "arbitrary")
    assert params.vmem_limit_bytes == 64 * 2**20
