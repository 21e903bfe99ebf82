"""Mega-fused SwinV2 block-half kernels vs module math (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from hvt.models import swinv2 as S
from hvt.ops import window_attention as wa
from hvt.ops import swin_block_pallas as sbp


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    B, H, W, C, heads, win = 2, 14, 14, 16, 2, 7
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    attn_mod = S.WindowAttention(dim=C, window=win, num_heads=heads,
                                 dtype=jnp.float32, use_pallas=False)
    xw = wa.window_partition(x, win)
    params = attn_mod.init(jax.random.key(1), xw)["params"]
    lns = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    lnb = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    return x, attn_mod, params, lns, lnb, (B, H, W, C, heads, win)


def test_fused_attention_branch_matches(setup):
    x, attn_mod, params, lns, lnb, (B, H, W, C, heads, win) = setup
    xw = wa.window_partition(x, win)
    merged = wa.window_reverse(attn_mod.apply({"params": params}, xw), win, H, W)
    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
    want = ln.apply({"params": {"scale": lns, "bias": lnb}}, merged)

    scale = jnp.exp(jnp.minimum(params["logit_scale"].astype(jnp.float32),
                                jnp.log(100.0)))
    coords = jnp.asarray(wa.relative_coords_table(win, 0))
    rel = jnp.asarray(wa.relative_position_index(win))
    bias = wa.cpb_bias(params["cpb_w1"], params["cpb_b1"], params["cpb_w2"],
                       coords, rel, heads)
    qkv_bias = jnp.concatenate(
        [params["q_bias"], jnp.zeros_like(params["q_bias"]), params["v_bias"]]
    )
    got = sbp.fused_attention_branch(
        x, params["qkv_kernel"], qkv_bias, scale, bias[None],
        params["proj"]["kernel"], params["proj"]["bias"], lns, lnb,
        window=win, num_heads=heads, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_mlp_branch_matches(setup):
    x, _, _, lns, lnb, (B, H, W, C, heads, win) = setup
    mlp = S.Mlp(hidden=4 * C, out=C, dtype=jnp.float32)
    pm = mlp.init(jax.random.key(2), x)["params"]
    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
    want = ln.apply({"params": {"scale": lns, "bias": lnb}},
                    mlp.apply({"params": pm}, x))
    got = sbp.fused_mlp_branch(
        x, pm["fc1"]["kernel"], pm["fc1"]["bias"],
        pm["fc2"]["kernel"], pm["fc2"]["bias"], lns, lnb, interpret=True,
    )
    # the erf polynomial (|err|<=1.5e-7) gets amplified by the post-norm on
    # trunc02-init activations; relative agreement is what matters
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-3, rtol=1e-3)


def test_erf_polynomial_accuracy():
    x = jnp.linspace(-4, 4, 1001)
    got = np.asarray(sbp._erf(x))
    import scipy.special

    want = scipy.special.erf(np.asarray(x))
    assert np.abs(got - want).max() < 5e-6  # f32 rounding dominates the 1.5e-7 poly bound


def test_full_model_fused_matches_standard():
    """SwinV2 with fuse=True produces the same outputs from the same params
    (identical parameter tree — the flag is checkpoint-compatible)."""
    import jax

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    kwargs = dict(num_classes=7, embed_dim=16, depths=(2, 2), num_heads=(2, 4),
                  window_size=7, drop_path_rate=0.0, dtype=jnp.float32,
                  use_pallas=False)
    std = S.SwinTransformerV2(**kwargs)
    fused = S.SwinTransformerV2(**kwargs, fuse=True)

    v_std = std.init(jax.random.key(0), x, train=False)
    v_fused = fused.init(jax.random.key(0), x, train=False)
    # identical parameter trees and identical init values
    assert jax.tree_util.tree_structure(v_std) == jax.tree_util.tree_structure(v_fused)
    for a, b in zip(jax.tree.leaves(v_std), jax.tree.leaves(v_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_std = std.apply(v_std, x, train=False)
    out_fused = fused.apply(v_std, x, train=False)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_std),
                               atol=2e-4, rtol=1e-3)
