"""RegNet-Y family tests: flax implementation vs the HF transformers oracle.

The reference resolves RegNet names through timm (reference
models.py:16-25); hvt.models.regnet is a native flax implementation.
`transformers`' RegNetForImageClassification (torch, CPU,
config-instantiated — no network) is an independent implementation of the
same architecture, used as the numerical oracle: same weights ⇒ same
logits. BatchNorm running statistics convert alongside the weights and are
randomized here so the stats path is actually pinned (fresh-init stats are
the trivial mean-0/var-1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hvt import config as C
from hvt.models import build_model
from hvt.models import regnet as R
from hvt.models import torch_compat

transformers = pytest.importorskip("transformers")

DEPTHS = (1, 2)
WIDTHS = (16, 24)
GROUP_W = 8
STEM = 8


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    cfg = transformers.RegNetConfig(
        num_channels=3,
        embedding_size=STEM,
        hidden_sizes=list(WIDTHS),
        depths=list(DEPTHS),
        groups_width=GROUP_W,
        layer_type="y",
        num_labels=7,
    )
    tm = transformers.RegNetForImageClassification(cfg).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in tm.parameters():
            p.normal_(0.0, 0.1, generator=gen)
    for mod in tm.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.normal_(0.0, 0.05, generator=gen)
                mod.running_var.uniform_(0.5, 1.5, generator=gen)
    fm = R.RegNetY(
        num_classes=7, depths=DEPTHS, widths=WIDTHS, group_width=GROUP_W,
        stem_channels=STEM, dtype=jnp.float32,
    )
    params, stats = torch_compat.convert_regnet_state_dict(tm.state_dict())
    return tm, fm, params, stats


def test_logits_match_hf_oracle(pair):
    tm, fm, params, stats = pair
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).logits.numpy()
    out = np.asarray(
        fm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_features_are_pooled_prelogits(pair):
    tm, fm, params, stats = pair
    x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    feats = np.asarray(fm.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        features_only=True,
    ))
    assert feats.shape == (2, WIDTHS[-1]) and feats.dtype == np.float32
    with torch.no_grad():
        ref = tm.regnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        feats, ref.pooler_output.squeeze((2, 3)).numpy(), atol=3e-5
    )


def test_conversion_tree_matches_init_tree(pair):
    """The converted tree is exactly the init tree (same leaf paths and
    shapes) — catches silent key drops in the converter."""
    _, fm, params, stats = pair
    variables = fm.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    for ours, theirs in (
        (variables["params"], params),
        (variables["batch_stats"], stats),
    ):
        a = {jax.tree_util.keystr(p): v.shape
             for p, v in jax.tree.leaves_with_path(ours)}
        b = {jax.tree_util.keystr(p): v.shape
             for p, v in jax.tree.leaves_with_path(theirs)}
        assert a == b


def test_multitask_head_returns_list():
    model = R.regnety_micro((2, 3, 5), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)))
    assert isinstance(out, list) and [o.shape[-1] for o in out] == [2, 3, 5]


def test_train_mode_grads_finite_and_stats_move():
    model = R.regnety_micro(4, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 32, 32, 3)), jnp.float32
    )
    y = jnp.array([0, 1, 2, 3])

    def loss_fn(params):
        logits, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(4), y]), mut["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(new_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(after, before)
    )


def test_factory_builds_and_grouped_conv_kernel_shape():
    cfg = C.loads(
        {"model": {"name": "regnety_micro", "args": {"dtype": "float32"}}}
    )
    model = build_model(cfg, 6)
    assert isinstance(model, R.RegNetY)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    # Grouped 3×3: kernel is (3, 3, width/groups, width) — width 16, g 8
    # channels/group → 2 groups of 8.
    k = variables["params"]["stage0_block0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 8, 16)


def test_trainer_fit_regnety_micro(tmp_path):
    """End-to-end: the Trainer's jitted step trains a RegNet-Y on the
    2-device CPU mesh (BN stat sync + SGD, the conv-family composition)."""
    from hvt import parallel
    from hvt.train.loop import Trainer

    cfg = C.loads({
        "run_name": "regnety_micro_smoke",
        "max_duration": "3ba",
        "seed": 0,
        "model": {"name": "regnety_micro", "args": {"dtype": "float32"}},
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
        "optim": {"name": "decoupledsgdw", "lr": 0.1, "weight_decay": 1e-4},
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


def test_analytic_flops_regnety_040_magnitude():
    model = R.regnety_040(1000)
    flops = R.analytic_flops(model, 224)
    # RegNetY-4.0GF: the design-space compute budget is 4.0 GMACs at 224².
    assert 3.5e9 < flops < 4.6e9


def test_torch_uri_family_detection(pair, tmp_path):
    """torch://<path> auto-detects the RegNet layout (and does NOT fall
    into the ConvNeXt branch, which also matches encoder.stages.* keys)."""
    tm, fm, params, stats = pair
    path = tmp_path / "regnet.pt"
    torch.save(tm.state_dict(), path)
    p2, s2 = torch_compat.load_torch_variables(f"torch://{path}")
    for (kp, a), b in zip(
        jax.tree_util.tree_leaves_with_path(p2), jax.tree.leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(kp))
    assert jax.tree_util.tree_structure(s2) == jax.tree_util.tree_structure(stats)
