"""BatchNorm channel-reduction kernels (hvt/ops/bn_stats_pallas.py).

Covers: interpret-mode kernel parity vs jnp at production-relevant shapes
(including the C<128 rows-into-lanes fold), custom-VJP gradient parity vs
flax nn.BatchNorm, running-statistic semantics, the PallasBatchNorm module
drop-in (identical trees/numerics to nn.BatchNorm on the jnp path), and the
sharded psum path on the 8-virtual-device CPU mesh.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvt import parallel
from hvt.ops import bn_stats_pallas as bsp


@pytest.mark.parametrize("m,c", [(512, 256), (1024, 64), (256, 128)])
def test_channel_sums_interpret_matches_jnp(m, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    s_i, q_i = bsp.channel_sums(x, interpret=True)
    s_j, q_j = bsp._sums_jnp(x)
    np.testing.assert_allclose(s_i, s_j, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(q_i, q_j, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m,c", [(512, 256), (1024, 64)])
def test_bwd_reduce_interpret_matches_jnp(m, c):
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    rstd = jnp.asarray(rng.uniform(0.5, 2.0, size=(c,)), jnp.float32)
    out_i = bsp.bn_bwd_reduce(g, x, mean, rstd, interpret=True)
    out_j = bsp._bwd_reduce_jnp(g, x, mean, rstd)
    for a, b in zip(out_i, out_j):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("interpret", [False, True])
def test_bn_train_grads_match_flax(interpret):
    rng = np.random.default_rng(2)
    m, c = 2048, 64
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.2, 1.5, size=(c,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)

    def loss_flax(scale, bias, x):
        y, _ = bn.apply(
            {"params": {"scale": scale, "bias": bias},
             "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)}},
            x, mutable=["batch_stats"],
        )
        return jnp.sum(y**2) + jnp.sum(jnp.sin(y))

    def loss_mine(scale, bias, x):
        y, _, _ = bsp.bn_train(
            x, scale, bias, 1e-5, jnp.float32, False, interpret
        )
        return jnp.sum(y**2) + jnp.sum(jnp.sin(y))

    vf, gf = jax.value_and_grad(loss_flax, argnums=(0, 1, 2))(scale, bias, x)
    vm, gm = jax.value_and_grad(loss_mine, argnums=(0, 1, 2))(scale, bias, x)
    assert abs(float(vf) - float(vm)) <= 1e-4 * abs(float(vf))
    for a, b in zip(gf, gm):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)


def test_bn_train_moments_match_flax_running_update():
    rng = np.random.default_rng(3)
    m, c = 4096, 32
    x = jnp.asarray(rng.normal(size=(m, c)) * 2.0 + 0.5, jnp.float32)
    scale, bias = jnp.ones(c), jnp.zeros(c)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    _, upd = bn.apply(
        {"params": {"scale": scale, "bias": bias},
         "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)}},
        x, mutable=["batch_stats"],
    )
    _, mean, var = bsp.bn_train(x, scale, bias, 1e-5, jnp.float32, False, False)
    np.testing.assert_allclose(
        upd["batch_stats"]["mean"], 0.1 * mean, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        upd["batch_stats"]["var"], 0.9 + 0.1 * var, rtol=1e-4, atol=1e-4
    )


def test_pallas_batch_norm_module_matches_nn_batch_norm():
    """Same param/variable tree, same outputs and batch_stats updates on the
    jnp path (CPU); eval path uses running stats identically."""
    from hvt.models import common

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(8, 6, 6, 16)), jnp.float32)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    mine = common.PallasBatchNorm(use_running_average=False)
    v_ref = ref.init(jax.random.key(0), x)
    v_mine = mine.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(
        v_mine
    )
    y_ref, u_ref = ref.apply(v_ref, x, mutable=["batch_stats"])
    y_mine, u_mine = mine.apply(v_mine, x, mutable=["batch_stats"])
    np.testing.assert_allclose(y_ref, y_mine, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        u_ref["batch_stats"]["mean"], u_mine["batch_stats"]["mean"],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        u_ref["batch_stats"]["var"], u_mine["batch_stats"]["var"],
        rtol=1e-5, atol=1e-6,
    )

    ref_e = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    mine_e = common.PallasBatchNorm(use_running_average=True)
    ye_ref = ref_e.apply(v_ref, x)
    ye_mine = mine_e.apply(v_mine, x)
    np.testing.assert_allclose(ye_ref, ye_mine, rtol=1e-5, atol=1e-5)


def test_resnet_micro_bn_pallas_flag_matches_default():
    from hvt.models import resnet as rn

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 4)
    losses = []
    for flag in (False, True):
        model = rn.ResNet(
            stage_sizes=(1, 1), num_classes=4, width=8,
            dtype=jnp.float32, bn_pallas=flag,
        )
        v = model.init(jax.random.key(0), x, train=False)

        def loss(params):
            y, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)},
            )
            oh = jax.nn.one_hot(labels, 4)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(y) * oh, -1))

        val, grads = jax.value_and_grad(loss)(v["params"])
        assert np.isfinite(float(val))
        losses.append(float(val))
    assert abs(losses[0] - losses[1]) <= 1e-5 * max(abs(losses[0]), 1.0)


def test_channel_sums_sharded_psum_matches_unsharded():
    mesh = parallel.cpu_mesh(8)
    rng = np.random.default_rng(6)
    m, c = 1024, 128
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    s_ref, q_ref = bsp._sums_jnp(x)
    x_s = jax.device_put(x, parallel.batch_sharding(mesh))
    parallel.set_kernel_mesh(mesh)
    try:
        s, q = jax.jit(
            lambda x: bsp.channel_sums(x, interpret=True)
        )(x_s)
    finally:
        parallel.set_kernel_mesh(None)
    np.testing.assert_allclose(s, s_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(q, q_ref, rtol=1e-4, atol=1e-4)
