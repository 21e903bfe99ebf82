"""EfficientNet family tests: flax implementation vs the HF transformers oracle.

The reference resolves EfficientNet names through timm (reference
models.py:16-25); hvt.models.efficientnet is a native flax implementation.
`transformers`' EfficientNetForImageClassification (torch, CPU,
config-instantiated — no network) is an independent implementation of the
same architecture, used as the numerical oracle: same weights AND same
BatchNorm running statistics ⇒ same logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hvt import config as C
from hvt.models import build_model
from hvt.models import efficientnet as E
from hvt.models import torch_compat

transformers = pytest.importorskip("transformers")

# Micro twin geometry. HF hard-codes the 32-channel stem and the
# round_filters(1280) top conv, so the twin keeps those; the stages are
# tiny. Stage 1 has expand_ratio 1 (no expansion layer) + stride 1; stage 2
# exercises the stride-2 5×5 asymmetric-SAME path and an identity repeat.
KERNELS = (3, 5)
IN_CH = (32, 16)
OUT_CH = (16, 24)
STRIDES = (1, 2)
REPEATS = (1, 2)
EXPANDS = (1, 6)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    cfg = transformers.EfficientNetConfig(
        width_coefficient=1.0,
        depth_coefficient=1.0,
        kernel_sizes=list(KERNELS),
        in_channels=list(IN_CH),
        out_channels=list(OUT_CH),
        strides=list(STRIDES),
        num_block_repeats=list(REPEATS),
        expand_ratios=list(EXPANDS),
        hidden_dim=1280,
        num_labels=7,
        image_size=32,
    )
    tm = transformers.EfficientNetForImageClassification(cfg).eval()
    # HF inits with std 0.02, which collapses 10+ layers of activations to
    # ~1e-22 — rescale weights and randomize the BN running statistics so
    # the comparison runs at O(1) activations and actually exercises the
    # stats conversion.
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in tm.parameters():
            p.normal_(0.0, 0.2, generator=gen)
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0.0, 0.2, generator=gen)
                mod.running_var.uniform_(0.5, 1.5, generator=gen)
    fm = E.EfficientNet(
        num_classes=7, stem_channels=32, top_channels=1280,
        kernels=KERNELS, in_ch=IN_CH, out_ch=OUT_CH, strides=STRIDES,
        repeats=REPEATS, expands=EXPANDS, dtype=jnp.float32,
    )
    params, stats = torch_compat.convert_efficientnet_state_dict(
        tm.state_dict()
    )
    return tm, fm, params, stats


def test_logits_match_hf_oracle(pair):
    tm, fm, params, stats = pair
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).logits.numpy()
    out = np.asarray(
        fm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_features_match_hf_pooler(pair):
    tm, fm, params, stats = pair
    x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    feats = np.asarray(
        fm.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            features_only=True,
        )
    )
    assert feats.shape == (2, 1280) and feats.dtype == np.float32
    with torch.no_grad():
        ref = tm.efficientnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        feats, ref.pooler_output.numpy(), atol=2e-4, rtol=1e-4
    )


def test_torch_uri_family_detection(pair, tmp_path):
    """torch://<path> auto-detects the EfficientNet layout and returns
    params AND batch_stats."""
    tm, fm, params, stats = pair
    path = tmp_path / "eff.pt"
    torch.save(tm.state_dict(), path)
    p2, s2 = torch_compat.load_torch_variables(f"torch://{path}")
    for (kp, a), b in zip(
        jax.tree_util.tree_leaves_with_path(p2), jax.tree.leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(kp))
    assert jax.tree_util.tree_structure(s2) == jax.tree_util.tree_structure(stats)


def test_multitask_head_returns_list():
    model = E.efficientnet_micro((2, 3, 5))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)))
    assert isinstance(out, list) and [o.shape[-1] for o in out] == [2, 3, 5]


def test_train_mode_updates_bn_stats_and_grads_finite():
    model = E.efficientnet_micro(4, drop_connect_rate=0.2)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3)), train=True,
    )
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 32, 32, 3)), jnp.float32
    )
    y = jnp.array([0, 1, 2, 3])

    def loss_fn(params):
        logits, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"dropout": jax.random.key(3)},
            mutable=["batch_stats"],
        )
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(4), y]), mut

    (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
    # the running statistics moved (momentum 0.99 keeps 99% of the old)
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(after, before)
    )


def test_factory_builds_and_features_shape():
    cfg = C.loads(
        {"model": {"name": "efficientnet_micro", "args": {"dtype": "float32"}}}
    )
    model = build_model(cfg, 6)
    assert isinstance(model, E.EfficientNet)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    feats = model.apply(variables, jnp.zeros((2, 32, 32, 3)), features_only=True)
    assert feats.shape == (2, model.num_features)


def test_trainer_fit_efficientnet_micro(tmp_path):
    """End-to-end: the Trainer's jitted step trains an EfficientNet on the
    2-device CPU mesh (BN stat updates ride the mutable collection)."""
    from hvt import parallel
    from hvt.train.loop import Trainer

    cfg = C.loads({
        "run_name": "efficientnet_micro_smoke",
        "max_duration": "3ba",
        "seed": 0,
        "model": {"name": "efficientnet_micro",
                  "args": {"dtype": "float32", "drop_connect_rate": 0.1}},
        "machine": {"save_root": str(tmp_path)},
        "train_dataset": {
            "source": "synthetic", "synthetic_num_classes": 4,
            "synthetic_num_samples": 24, "crop_size": 32,
            "global_batch_size": 8, "drop_last": True, "shuffle": True,
        },
        "eval_dataset": {
            "source": "synthetic", "synthetic_num_classes": 4,
            "synthetic_num_samples": 8, "crop_size": 32,
            "global_batch_size": 8,
        },
        "optim": {"name": "adamw", "lr": 1e-3, "weight_decay": 0.05},
        "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
        "algorithms": [{"cls": "LabelSmoothing", "args": {"smoothing": 0.1}}],
        "save": {"interval": None, "num_checkpoints_to_keep": 1, "wandb": False},
        "loader": {"num_workers": 1, "prefetch_batches": 1},
    })
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(2), log_interval=2)
    metrics = tr.fit()
    assert np.isfinite(metrics["cross-entropy"])
    assert int(tr.state.step) == 3
    tr.close()


def test_analytic_flops_b0_magnitude():
    model = E.efficientnet_b0(1000)
    flops = E.analytic_flops(model, 224)
    # EfficientNet-B0 at 224² ≈ 0.39 GMACs (paper convention).
    assert 3.0e8 < flops < 4.6e8


def test_variant_scaling_matches_hf_round_rules():
    """b3's widths/depths must follow the same round_filters/round_repeats
    arithmetic HF uses (spot values from the published geometry)."""
    b3 = E.efficientnet_b3(10)
    assert E.round_filters(32, b3.width_coefficient) == 40  # stem
    assert E.round_filters(1280, b3.width_coefficient) == 1536  # top
    plan = b3.block_plan()
    assert len(plan) == sum(
        E.round_repeats(r, b3.depth_coefficient) for r in E.REPEATS
    )
    assert plan[0]["in_dim"] == 40 and plan[-1]["out_dim"] == E.round_filters(
        320, 1.2
    )
