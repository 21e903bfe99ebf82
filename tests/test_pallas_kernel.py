"""Pallas windowed-attention kernel vs the jnp reference (interpret mode on
CPU; the same comparison runs on real TPU hardware via bench/CLI drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvt.ops import window_attention as wa
from hvt.ops import window_attention_pallas as wap


@pytest.mark.parametrize(
    "nwb,h,n,d,with_mask",
    [(4, 2, 16, 8, False), (8, 3, 49, 32, False), (8, 2, 16, 8, True)],
)
def test_kernel_matches_reference(nwb, h, n, d, with_mask):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(nwb, h, n, d)).astype(np.float32))
        for _ in range(3)
    )
    ls = jnp.asarray(rng.normal(size=(h, 1, 1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(h, n, n)).astype(np.float32))
    mask = None
    if with_mask:
        m = np.zeros((4, n, n), np.float32)
        m[1, :, : n // 2] = -100.0
        m[3, : n // 3, :] = -100.0
        mask = jnp.asarray(m)

    want = np.asarray(wa.window_attention_reference(q, k, v, ls, bias, mask))
    got = np.asarray(
        wap.window_attention_kernel(q, k, v, ls, bias, mask, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_kernel_gradients_match_reference():
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.normal(size=(4, 2, 16, 8)).astype(np.float32))
        for _ in range(3)
    )
    ls = jnp.asarray(rng.normal(size=(2, 1, 1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(2, 16, 16)).astype(np.float32))

    def loss_ref(*args):
        return (wa.window_attention_reference(*args, None) ** 2).sum()

    def loss_ker(*args):
        return (wap.window_attention_kernel(*args, None, interpret=True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, ls, bias)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3, 4))(q, k, v, ls, bias)
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_kernel_production_stage1_shape():
    """Stage-1 production shape (56x56 grid, C=96: 64 windows of 49 tokens,
    3 heads, head_dim 32) with the shifted-window mask, forward AND backward,
    in interpret mode. The blocked BlockSpec index maps (g=8 windows per
    program, z period 64) are exactly the ones the TPU executes — an
    index-map regression fails here, not in the next bench run."""
    rng = np.random.default_rng(2)
    nwb, h, n, d = 64, 3, 49, 32  # batch 1 image at stage 1
    nwz = 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(nwb, h, n, d)).astype(np.float32) * 0.5)
        for _ in range(3)
    )
    ls = jnp.asarray(rng.normal(size=(h, 1, 1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(h, n, n)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.random((nwz, n, n)) < 0.2, -100.0, 0.0).astype(np.float32)
    )

    want = np.asarray(wa.window_attention_reference(q, k, v, ls, bias, mask))
    got = np.asarray(
        wap.window_attention_kernel(q, k, v, ls, bias, mask, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def loss_ref(*args):
        return (wa.window_attention_reference(*args, mask) ** 2).sum()

    def loss_ker(*args):
        return (wap.window_attention_kernel(*args, mask, interpret=True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, ls, bias)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3, 4))(q, k, v, ls, bias)
    for name, a, b in zip("qkv, logit_scale, bias".split(), g_ref, g_ker):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=name
        )


def _packed_oracle(qkv, ls, bias, mask, heads):
    q, k, v = wa.split_heads(qkv, heads)
    out = wa.window_attention_reference(q, k, v, ls, bias, mask)
    nwb, n = qkv.shape[0], qkv.shape[1]
    return out.transpose(0, 2, 1, 3).reshape(nwb, n, qkv.shape[2] // 3)


@pytest.mark.parametrize(
    "nwb,h,n,d,nwz",
    [(8, 3, 49, 32, 1), (64, 3, 49, 32, 64), (16, 6, 49, 32, 4)],
)
def test_packed_kernel_matches_reference(nwb, h, n, d, nwz):
    """The packed (nWB, N, 3C) kernel vs reshape+reference, fwd and bwd —
    covers the blocked index maps and in-kernel lane slicing at stage-1 and
    deeper-stage head counts."""
    rng = np.random.default_rng(3)
    c = h * d
    qkv = jnp.asarray(rng.normal(size=(nwb, n, 3 * c)).astype(np.float32) * 0.5)
    ls = jnp.asarray(rng.normal(size=(h, 1, 1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(h, n, n)).astype(np.float32))
    mask = None
    if nwz > 1:
        mask = jnp.asarray(
            np.where(rng.random((nwz, n, n)) < 0.2, -100.0, 0.0).astype(np.float32)
        )

    from hvt.ops import window_attention_pallas as wap

    want = np.asarray(_packed_oracle(qkv, ls, bias, mask, h))
    got = np.asarray(
        wap.window_attention_packed(qkv, ls, bias, mask, num_heads=h, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def loss_ref(qkv_, ls_, bias_):
        return (_packed_oracle(qkv_, ls_, bias_, mask, h) ** 2).sum()

    def loss_ker(qkv_, ls_, bias_):
        return (
            wap.window_attention_packed(
                qkv_, ls_, bias_, mask, num_heads=h, interpret=True
            ) ** 2
        ).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, ls, bias)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(qkv, ls, bias)
    for name, a, b in zip(("qkv", "logit_scale", "bias"), g_ref, g_ker):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=name
        )
