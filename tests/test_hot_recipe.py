"""The full hot-recipe composition in CI (reference configs/recipes/hot.yaml).

The reference's hot recipe names every algorithm at once — BlurPool,
ChannelsLast, EMA, ProgressiveResizing, LabelSmoothing, MixUp, SAM, ColOut,
RandAugment, StochasticDepth — under a BCE loss (it crashes the reference's
own loader, SURVEY.md §2.4 quirk 2; hvt makes it loadable and functional).
These tests drive the complete stack through the Trainer on a real tiny
ImageFolder so a break in any one algorithm's *composition* fails pytest,
plus a hand-computed mixup+BCE target check at the step level.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from hvt import config as C
from hvt import objectives, parallel
from hvt.data import DevicePrep, device
from hvt.models import build_model
from hvt.train import optim as optim_lib
from hvt.train import state as state_lib
from hvt.train import step as step_lib

NAMES = [
    "00001_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_badius",
    "00002_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_cooperii",
    "00003_animalia_chordata_aves_accipitriformes_pandionidae_pandion_haliaetus",
    "00004_plantae_tracheophyta_pinopsida_pinales_pinaceae_pinus_strobus",
]


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("hot-ds")
    rng = np.random.default_rng(0)
    for split, k in [("train", 6), ("val", 2)]:
        for name in NAMES:
            d = root / split / name
            d.mkdir(parents=True)
            for i in range(k):
                Image.fromarray(
                    rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
                ).save(d / f"{i}.jpg")
    return root


def test_hot_recipe_full_composition_trains(ds_root, tmp_path):
    from hvt.train.loop import Trainer

    base = C.load(machine="configs/machines/local.yaml",
                  exps=["configs/recipes/hot.yaml"])
    algos = C.to_dict(base)["algorithms"]
    # hot.yaml verbatim, except: SAM fires within the run, and progressive
    # resizing ramps across the 8 steps (delay 0.25, finetune 0.25).
    algos = [
        {"cls": "SAM", "args": {"rho": 0.5, "interval": 2}}
        if a["cls"] == "SAM" else
        {"cls": "ProgressiveResizing",
         "args": {"initial_scale": 0.5, "delay_fraction": 0.25,
                  "finetune_fraction": 0.25}}
        if a["cls"] == "ProgressiveResizing" else a
        for a in algos
    ]
    cfg = C.loads(
        C.to_dict(base),
        {
            "run_name": "hot-ci",
            "seed": 0,
            "max_duration": "8ba",
            "model": {"name": "resnet_micro_bottleneck"},
            "machine": {"datasets": {"fix": str(ds_root)},
                        "save_root": str(tmp_path)},
            "train_dataset": {"path": "fix", "crop_size": 32, "resize_size": 34,
                              "global_batch_size": 8, "drop_last": True,
                              "shuffle": True},
            "eval_dataset": {"path": "fix", "crop_size": 32, "resize_size": 34,
                             "global_batch_size": 8},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "optim": {"name": "DecoupledSGDW", "lr": 0.05, "momentum": 0.9,
                      "weight_decay": 1e-4},
            "algorithms": algos,
            "save": {"interval": None, "num_checkpoints_to_keep": 1,
                     "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        },
    )

    tr = Trainer(cfg, mesh=parallel.cpu_mesh(2), log_interval=4)

    # Every hot.yaml algorithm is wired into the composition it belongs to:
    assert tr.model.blurpool  # BlurPool → model surgery flag
    assert tr.model.stochastic_depth_rate == pytest.approx(0.1)
    assert tr.settings.smoothing == pytest.approx(0.08)  # LabelSmoothing
    assert tr.settings.mixup_alpha == pytest.approx(0.2)  # MixUp
    assert tr.settings.sam_rho == pytest.approx(0.5)  # SAM
    assert tr.settings.sam_interval == 2
    assert tr.settings.ema is not None  # EMA
    assert tr.objective is objectives.binary_cross_entropy  # BCE loss
    assert tr.train_loader.transform.randaugment_depth == 1  # RandAugment
    assert tr.train_loader.transform.colout_p == (0.05, 0.05)  # ColOut
    assert tr.algos.progressive is not None  # ProgressiveResizing

    # The resize schedule crosses at least two scale buckets inside the run.
    scales = {tr._scale_for_step(s) for s in range(tr.total_steps)}
    assert len(scales) >= 2 and 1.0 in scales and min(scales) <= 0.75

    metrics = tr.fit()
    assert int(tr.state.step) == 8
    assert np.isfinite(metrics["cross-entropy"])
    assert np.isfinite(metrics["acc@1"])

    # EMA state exists, is finite, and lags the raw params (updated but not
    # equal after 8 steps).
    assert tr.state.ema_params is not None
    ema_leaves = jax.tree.leaves(tr.state.ema_params)
    raw_leaves = jax.tree.leaves(tr.state.params)
    assert all(np.all(np.isfinite(np.asarray(a))) for a in ema_leaves)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(ema_leaves, raw_leaves)
    )
    tr.close()


def test_mixup_bce_target_hand_check():
    """The in-step composition LabelSmoothing → MixUp → BCE produces exactly
    BCE(logits, lam·smooth(y) + (1-lam)·smooth(roll(y))) — checked against a
    torch-computed loss on hand-mixed targets."""
    import torch
    import torch.nn.functional as TF

    num_classes = 4
    smoothing = 0.08
    alpha = 0.2
    cfg = C.loads({"optim": {"name": "sgd", "lr": 0.0, "momentum": 0.0,
                             "weight_decay": 0.0},
                   # f32 end-to-end: the check is exact, not bf16-fuzzy
                   "precision": {"compute_dtype": "float32"}})
    model = build_model(
        C.loads({"model": {"name": "resnet_micro"},
                 "precision": {"compute_dtype": "float32"}}),
        num_classes,
    )
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
    settings = step_lib.StepSettings(
        num_classes=num_classes, smoothing=smoothing, mixup_alpha=alpha
    )
    train_step = step_lib.build_train_step(
        model, objectives.binary_cross_entropy, tx, prep, settings
    )

    rng = np.random.default_rng(7)
    images = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, num_classes, (8,)).astype(np.int32)
    mask = np.ones((8,), np.float32)
    base_rng = jax.random.key(3)
    state = state_lib.create(
        model, tx, jax.random.key(0),
        prep.normalize(jnp.zeros((2, 32, 32, 3), jnp.uint8)), ema=False,
    )
    # --- replicate the step's rng stream, then hand-compute the target ----
    # (computed before the step runs: the step donates the state buffers)
    r = jax.random.fold_in(base_rng, 0)  # state.step == 0
    r, mix_key = jax.random.split(r)
    r, dropout_key = jax.random.split(r)
    lam = float(jax.random.beta(mix_key, alpha, alpha, dtype=jnp.float32))

    # hand-built targets: smooth then mix with a roll-by-one partner
    onehot = np.eye(num_classes, dtype=np.float32)[labels]
    smoothed = onehot * (1.0 - smoothing) + smoothing / num_classes
    mixed_targets = lam * smoothed + (1.0 - lam) * np.roll(smoothed, 1, axis=0)

    x = prep.normalize(jnp.asarray(images))
    x_mixed = lam * x + (1.0 - lam) * jnp.roll(x, 1, axis=0)
    out, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x_mixed, train=True, mutable=["batch_stats"],
        rngs={"dropout": dropout_key},
    )
    out = np.asarray(out, np.float32)

    _, stats = train_step(state, images, labels, mask, base_rng, scale=1.0)
    step_loss = float(stats["loss_sum"])

    expected = float(
        TF.binary_cross_entropy_with_logits(
            torch.tensor(out),
            torch.tensor(mixed_targets),
            reduction="sum",
        )
        / 8
    )
    assert step_loss == pytest.approx(expected, rel=1e-5)


def test_hot_recipe_device_augmentation_variant(ds_root, tmp_path):
    """The hot recipe with its two device-mode augmentations
    ({cls: RandAugment/ColOut, args: {device: true}}): the loader delivers
    bare crops (no PIL post pass) while the compiled step carries the
    policy — the full composition still trains with finite metrics."""
    from hvt.train.loop import Trainer

    base = C.load(machine="configs/machines/local.yaml",
                  exps=["configs/recipes/hot.yaml"])
    algos = []
    for a in C.to_dict(base)["algorithms"]:
        if a["cls"] == "RandAugment":
            a = {"cls": "RandAugment",
                 "args": {**a.get("args", {}), "device": True}}
        elif a["cls"] == "ColOut":
            a = {"cls": "ColOut",
                 "args": {**a.get("args", {}), "device": True}}
        elif a["cls"] == "SAM":
            a = {"cls": "SAM", "args": {"rho": 0.5, "interval": 2}}
        elif a["cls"] == "ProgressiveResizing":
            a = {"cls": "ProgressiveResizing",
                 "args": {"initial_scale": 0.5, "delay_fraction": 0.25,
                          "finetune_fraction": 0.25}}
        algos.append(a)
    cfg = C.loads(
        C.to_dict(base),
        {
            "run_name": "hot-ci-device",
            "seed": 0,
            "max_duration": "4ba",
            "model": {"name": "resnet_micro_bottleneck"},
            "machine": {"datasets": {"fix": str(ds_root)},
                        "save_root": str(tmp_path)},
            "train_dataset": {"path": "fix", "crop_size": 32, "resize_size": 34,
                              "global_batch_size": 8, "drop_last": True,
                              "shuffle": True},
            "eval_dataset": {"path": "fix", "crop_size": 32, "resize_size": 34,
                             "global_batch_size": 8},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "optim": {"name": "DecoupledSGDW", "lr": 0.05, "momentum": 0.9,
                      "weight_decay": 1e-4},
            "algorithms": algos,
            "save": {"interval": None, "num_checkpoints_to_keep": 1,
                     "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        },
    )
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(2), log_interval=4)
    # Device modes landed in the step settings, and the host transform is
    # bare (no PIL post ops → the native decode path needs no post pass).
    assert tr.settings.randaugment == (1, 9, True)
    assert tr.settings.colout == (0.05, 0.05)
    assert tr.train_loader.transform.randaugment_depth == 0
    assert tr.train_loader.transform.colout_p is None
    assert not tr.train_loader.transform.has_post_ops

    metrics = tr.fit()
    assert int(tr.state.step) == 4
    assert np.isfinite(metrics["cross-entropy"])
    assert all(
        np.all(np.isfinite(np.asarray(p)))
        for p in jax.tree.leaves(tr.state.params)
    )
    tr.close()
