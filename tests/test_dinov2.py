"""DINOv2 family tests: flax implementation vs the HF transformers oracle.

The reference resolves backbones through timm (reference models.py:16-25)
and runs frozen-feature classification in linear_probe.py/simpleshot.py;
hvt.models.dinov2 is a native flax DINOv2 (ViT + LayerScale, SwiGLU for
giant). `transformers`' Dinov2ForImageClassification (torch, CPU,
config-instantiated — no network) is the numerical oracle: same weights ⇒
same logits — including the concat[cls, mean-patch] head input rule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hvt import config as C
from hvt.models import build_model
from hvt.models import dinov2 as D
from hvt.models import torch_compat

transformers = pytest.importorskip("transformers")


def _hf_cfg(use_swiglu=False):
    return transformers.Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        mlp_ratio=2, image_size=32, patch_size=8, num_labels=7,
        layer_norm_eps=1e-6, use_swiglu_ffn=use_swiglu,
        layerscale_value=1.0,
    )


def _randomize(tm, seed):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tm.parameters():
            p.normal_(0.0, 0.1, generator=gen)
    return tm


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(3)
    tm = _randomize(
        transformers.Dinov2ForImageClassification(_hf_cfg()).eval(), 4
    )
    fm = D.Dinov2(
        num_classes=7, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        mlp_ratio=2.0, dtype=jnp.float32,
    )
    params = torch_compat.convert_dinov2_state_dict(tm.state_dict())
    return tm, fm, params


def test_logits_match_hf_oracle(pair):
    tm, fm, params = pair
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).logits.numpy()
    out = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_swiglu_variant_matches_hf_oracle():
    """The giant variant's SwiGLU FFN path, pinned at micro geometry."""
    torch.manual_seed(5)
    tm = _randomize(
        transformers.Dinov2ForImageClassification(
            _hf_cfg(use_swiglu=True)
        ).eval(), 6,
    )
    fm = D.Dinov2(
        num_classes=7, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        mlp_ratio=2.0, use_swiglu=True, dtype=jnp.float32,
    )
    params = torch_compat.convert_dinov2_state_dict(tm.state_dict())
    x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).logits.numpy()
    out = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_features_are_cls_concat_mean_patch(pair):
    """features_only == [cls ‖ mean(patch)] of the final-norm output — the
    HF classifier input and hvt's linear-probe/SimpleShot feature."""
    tm, fm, params = pair
    x = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)
    feats = np.asarray(
        fm.apply({"params": params}, jnp.asarray(x), features_only=True)
    )
    assert feats.shape == (2, 64) and feats.dtype == np.float32
    with torch.no_grad():
        seq = tm.dinov2(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        ).last_hidden_state
        ref = torch.cat([seq[:, 0], seq[:, 1:].mean(dim=1)], dim=1).numpy()
    np.testing.assert_allclose(feats, ref, atol=2e-5)


def test_resize_pos_embed():
    rng = np.random.default_rng(3)
    pos = rng.normal(size=(1, 4 * 4 + 1, 8)).astype(np.float32)
    out = torch_compat.resize_pos_embed(pos, 6)
    assert out.shape == (1, 6 * 6 + 1, 8)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # cls slot kept
    np.testing.assert_array_equal(torch_compat.resize_pos_embed(pos, 4), pos)
    # Constant fields survive bicubic resizing exactly-ish.
    const = np.ones((1, 17, 8), np.float32)
    np.testing.assert_allclose(
        torch_compat.resize_pos_embed(const, 6), np.ones((1, 37, 8)),
        atol=1e-5,
    )


def test_multitask_head_and_factory():
    cfg = C.loads({
        "model": {"name": "dinov2_micro", "args": {"dtype": "float32"}},
        "hierarchy": {"variant": "multitask"},
    })
    model = build_model(cfg, (2, 3, 5))
    assert isinstance(model, D.Dinov2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)))
    assert isinstance(out, list) and [o.shape[-1] for o in out] == [2, 3, 5]
    # LayerScale lambdas are 1-D → no-decay grouping exempts them.
    assert variables["params"]["block0"]["ls1"].ndim == 1


def test_train_mode_grads_finite():
    model = D.dinov2_micro(4, drop_path_rate=0.2, dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3)), train=True,
    )
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(4, 32, 32, 3)), jnp.float32
    )
    y = jnp.array([0, 1, 2, 3])

    def loss_fn(params):
        logits = model.apply(
            {"params": params}, x, train=True,
            rngs={"dropout": jax.random.key(5)},
        )
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(4), y])

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))


def test_analytic_flops_vitb14_magnitude():
    model = D.dinov2_vitb14(1000)
    flops = D.analytic_flops(model, 224)
    # ViT-B/14 at 224² (257 tokens): ~23 GMACs forward.
    assert 1.5e10 < flops < 3e10


def test_torch_uri_family_detection(pair, tmp_path):
    """torch://<path> auto-detects the DINOv2 layout (and does NOT fall
    into the ViT branch, which also matches cls_token/encoder.layer.*)."""
    tm, fm, params = pair
    path = tmp_path / "dinov2.pt"
    torch.save(tm.state_dict(), path)
    p2, stats = torch_compat.load_torch_variables(f"torch://{path}")
    assert stats == {}
    for (kp, a), b in zip(
        jax.tree_util.tree_leaves_with_path(p2), jax.tree.leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(kp))
