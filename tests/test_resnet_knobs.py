"""The R50 perf knobs preserve semantics: remat_stages and bn_custom.

Both knobs exist for the bytes/step experiments (BENCH.md): selective
rematerialization trades HBM traffic for recompute, and the custom-VJP
BatchNorm controls what AD saves for backward. Neither may change the
function — same parameter tree (checkpoint-compatible), same outputs, same
gradients up to f32 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvt.models import resnet as R


def _loss_and_grads(model, x):
    v = model.init(jax.random.key(0), x, train=True)

    def loss(p, bs):
        out, mut = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out**2) / x.shape[0], mut["batch_stats"]

    (l, bs2), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(
        v["params"], v["batch_stats"]
    )
    return v, float(l), jax.device_get(g), jax.device_get(bs2)


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(np.float32)
    )


def _max_rel(a_tree, b_tree):
    return max(
        float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12))
        for a, b in zip(jax.tree.leaves(a_tree), jax.tree.leaves(b_tree))
    )


def test_remat_same_function_and_gradients(x):
    base = R.resnet_micro(10, dtype=jnp.float32)
    remat = R.resnet_micro(10, dtype=jnp.float32, remat_stages=[1, 2])

    vb, lb, gb, bsb = _loss_and_grads(base, x)
    vr, lr, gr, bsr = _loss_and_grads(remat, x)

    # identical parameter trees — checkpoints interchangeable
    assert jax.tree.structure(vb) == jax.tree.structure(vr)
    assert lb == pytest.approx(lr, rel=1e-6)
    assert _max_rel(gb, gr) < 1e-5
    assert _max_rel(bsb, bsr) < 1e-6


def test_bn_custom_same_function_and_gradients(x):
    base = R.resnet_micro(10, dtype=jnp.float32)
    custom = R.resnet_micro(10, dtype=jnp.float32, bn_custom=True)

    vb, lb, gb, bsb = _loss_and_grads(base, x)
    vc, lc, gc, bsc = _loss_and_grads(custom, x)

    assert jax.tree.structure(vb) == jax.tree.structure(vc)
    assert lb == pytest.approx(lc, rel=1e-5)
    assert _max_rel(gb, gc) < 1e-4
    assert _max_rel(bsb, bsc) < 1e-5

    # eval mode (running statistics) matches too
    out_b = base.apply(vb, x, train=False)
    out_c = custom.apply(vb, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_c), rtol=1e-5, atol=1e-5
    )


def test_remat_policy_validated():
    with pytest.raises(KeyError):
        m = R.resnet_micro(10, dtype=jnp.float32, remat_stages=[1],
                           remat_policy="bogus")
        m.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)), train=True)


def test_swin_remat_same_function_and_gradients(x):
    """model.args.remat on SwinV2 (per-block jax.checkpoint — the analog of
    the reference's activation checkpointing, reference swinv2.py:584-585)
    must not change outputs or gradients."""
    from hvt.models import swinv2 as S

    base = S.swinv2_micro(10, dtype=jnp.float32, use_pallas=False)
    remat = S.swinv2_micro(10, dtype=jnp.float32, use_pallas=False, remat=True)
    v = base.init(jax.random.key(0), x, train=False)
    vr = remat.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(vr)

    def loss(model, p):
        out = model.apply({"params": p}, x, train=True,
                          rngs={"dropout": jax.random.key(0)})
        return jnp.sum(out**2) / x.shape[0]

    lb, gb = jax.value_and_grad(lambda p: loss(base, p))(v["params"])
    lr_, gr = jax.value_and_grad(lambda p: loss(remat, p))(v["params"])
    assert float(lb) == pytest.approx(float(lr_), rel=1e-6)
    assert _max_rel(gb, gr) < 1e-5
