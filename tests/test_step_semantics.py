"""Train-step semantics: gradient accumulation equivalence, HXE training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvt import config as C
from hvt import objectives, parallel
from hvt.data import DevicePrep
from hvt.models import swinv2 as S
from hvt.train import optim as optim_lib
from hvt.train import state as state_lib
from hvt.train import step as step_lib


def _setup(grad_accum):
    cfg = C.loads({"optim": {"name": "sgd", "lr": 0.01, "momentum": 0.0,
                              "weight_decay": 0.0}})
    # LayerNorm-only model: no batch statistics, so microbatching must be
    # bitwise-equivalent in exact arithmetic.
    model = S.swinv2_micro(4, dtype=jnp.float32, drop_path_rate=0.0)
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
    rng = jax.random.key(0)
    mesh = parallel.cpu_mesh(1)
    state = jax.jit(
        lambda: state_lib.create(
            model, tx, rng, prep.normalize(jnp.zeros((2, 16, 16, 3), jnp.uint8)),
            ema=False,
        ),
        out_shardings=parallel.replicated(mesh),
    )()
    settings = step_lib.StepSettings(num_classes=4, grad_accum=grad_accum)
    step = step_lib.build_train_step(
        model, objectives.soft_cross_entropy, tx, prep, settings
    )
    return state, step, rng


def test_grad_accum_matches_full_batch():
    images = np.random.default_rng(0).integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    labels = np.asarray([0, 1, 2, 3], np.int32)
    mask = np.ones((4,), np.float32)

    results = {}
    for accum in (1, 2):
        state, step, rng = _setup(accum)
        new_state, stats = step(state, images, labels, mask, rng, scale=1.0)
        results[accum] = (
            jax.device_get(new_state.params),
            float(stats["loss_sum"]),
            float(stats["count"]),
        )

    p1, l1, c1 = results[1]
    p2, l2, c2 = results[2]
    assert c1 == c2 == 4.0
    assert l1 == pytest.approx(l2, rel=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sam_grad_accum_matches_full_batch():
    """SAM's two-pass gradient under microbatch accumulation must equal the
    single-batch SAM step on a batch-statistics-free model (the second scan
    at the perturbed point averages exactly the full-batch SAM gradient)."""
    images = np.random.default_rng(1).integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    labels = np.asarray([0, 1, 2, 3], np.int32)
    mask = np.ones((4,), np.float32)

    def setup_sam(grad_accum):
        cfg = C.loads({"optim": {"name": "sgd", "lr": 0.01, "momentum": 0.0,
                                  "weight_decay": 0.0}})
        model = S.swinv2_micro(4, dtype=jnp.float32, drop_path_rate=0.0)
        prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
        tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
        rng = jax.random.key(0)
        mesh = parallel.cpu_mesh(1)
        state = jax.jit(
            lambda: state_lib.create(
                model, tx, rng,
                prep.normalize(jnp.zeros((2, 16, 16, 3), jnp.uint8)), ema=False,
            ),
            out_shardings=parallel.replicated(mesh),
        )()
        settings = step_lib.StepSettings(
            num_classes=4, grad_accum=grad_accum, sam_rho=0.05, sam_interval=1
        )
        step = step_lib.build_train_step(
            model, objectives.soft_cross_entropy, tx, prep, settings
        )
        return state, step, rng

    results = {}
    for accum in (1, 2):
        state, step, rng = setup_sam(accum)
        new_state, stats = step(state, images, labels, mask, rng, scale=1.0)
        results[accum] = jax.device_get(new_state.params)

    for a, b in zip(jax.tree.leaves(results[1]), jax.tree.leaves(results[2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_hxe_micro_training_decreases_loss():
    """End-to-end hxe objective through the Trainer on synthetic data."""
    from hvt.train.loop import Trainer

    cfg = C.loads(
        {
            "run_name": "hxe_micro",
            "max_duration": "6ba",
            "grad_accum": 1,
            "seed": 0,
            "hierarchy": {"variant": "hxe", "hxe_tree_weights": "exponential",
                          "hxe_alpha": 0.2},
            "model": {"name": "resnet_micro"},
            "machine": {"save_root": "/tmp/hvt-hxe-test"},
            "train_dataset": {"source": "synthetic", "synthetic_num_classes": 8,
                              "synthetic_num_samples": 32, "crop_size": 24,
                              "global_batch_size": 8, "drop_last": True,
                              "shuffle": True},
            "eval_dataset": {"source": "synthetic", "synthetic_num_classes": 8,
                             "synthetic_num_samples": 16, "crop_size": 24,
                             "global_batch_size": 8},
            "optim": {"name": "adamw", "lr": 3e-3, "weight_decay": 0.0},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 1.0}},
            "save": {"interval": None, "num_checkpoints_to_keep": 1,
                     "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(2), log_interval=100)
    assert isinstance(tr.objective, objectives.HXELoss)
    metrics = tr.fit()
    assert np.isfinite(metrics["cross-entropy"])
    tr.close()


def test_progressive_resizing_end_to_end():
    """ProgressiveResizing trains across scale buckets (one compiled step per
    bucket) without retrace errors; the scale schedule follows Composer's
    hold -> ramp -> full profile."""
    from hvt.train.loop import Trainer

    cfg = C.loads(
        {
            "run_name": "prog_micro",
            "max_duration": "10ba",
            "grad_accum": 1,
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"save_root": "/tmp/hvt-prog-test"},
            "train_dataset": {"source": "synthetic", "synthetic_num_classes": 4,
                              "synthetic_num_samples": 40, "crop_size": 32,
                              "global_batch_size": 8, "drop_last": True,
                              "shuffle": True},
            "eval_dataset": {"source": "synthetic", "synthetic_num_classes": 4,
                             "synthetic_num_samples": 8, "crop_size": 32,
                             "global_batch_size": 8},
            "optim": {"name": "sgd", "lr": 0.01, "momentum": 0.9,
                      "weight_decay": 0.0},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "algorithms": [
                {"cls": "ProgressiveResizing",
                 "args": {"initial_scale": 0.5, "delay_fraction": 0.4,
                          "finetune_fraction": 0.2}},
            ],
            "save": {"interval": None, "num_checkpoints_to_keep": 1,
                     "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(1), log_interval=100)
    assert tr._scale_for_step(0) == 0.5          # hold at initial_scale
    assert tr._scale_for_step(9) == 1.0          # finetune at full size
    mid = tr._scale_for_step(6)
    assert 0.5 < mid <= 1.0                       # ramp, quantized
    metrics = tr.fit()
    assert np.isfinite(metrics["cross-entropy"])
    assert int(tr.state.step) == 10
    tr.close()


def test_device_colout_in_train_step():
    """The compiled step applies device ColOut: the loss differs from the
    colout-off step on the same data/params, and stays finite."""
    cfg = C.loads({"optim": {"name": "sgd", "lr": 0.01, "momentum": 0.0,
                             "weight_decay": 0.0}})
    model = S.swinv2_micro(4, dtype=jnp.float32, drop_path_rate=0.0)
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
    rng = jax.random.key(0)
    mesh = parallel.cpu_mesh(1)
    make_state = jax.jit(
        lambda: state_lib.create(
            model, tx, rng, prep.normalize(jnp.zeros((2, 16, 16, 3), jnp.uint8)),
            ema=False,
        ),
        out_shardings=parallel.replicated(mesh),
    )
    images = np.random.default_rng(0).integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    labels = np.asarray([0, 1, 2, 3], np.int32)
    mask = np.ones((4,), np.float32)

    losses = {}
    for colout in (None, (0.15, 0.15)):
        settings = step_lib.StepSettings(num_classes=4, colout=colout)
        step = step_lib.build_train_step(
            model, objectives.soft_cross_entropy, tx, prep, settings
        )
        # fresh state each time — the compiled step donates it
        _, stats = step(make_state(), images, labels, mask, rng, scale=1.0)
        losses[colout] = float(stats["loss_sum"])
    assert np.isfinite(losses[(0.15, 0.15)])
    assert losses[None] != losses[(0.15, 0.15)]


def test_device_randaugment_in_step():
    """StepSettings.randaugment composes into the compiled step: the step
    runs with device RA (+ device ColOut, the hot-recipe device pair),
    produces finite loss/params, and the augmentation actually changes
    the pixels the model sees (different loss vs the bare step)."""
    cfg = C.loads({"optim": {"name": "sgd", "lr": 0.01, "momentum": 0.0,
                              "weight_decay": 0.0}})
    model = S.swinv2_micro(4, dtype=jnp.float32, drop_path_rate=0.0)
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
    rng = jax.random.key(0)
    mesh = parallel.cpu_mesh(1)
    def fresh_state():  # the step donates its input state
        return jax.jit(
            lambda: state_lib.create(
                model, tx, rng,
                prep.normalize(jnp.zeros((2, 16, 16, 3), jnp.uint8)), ema=False,
            ),
            out_shardings=parallel.replicated(mesh),
        )()

    images = np.random.default_rng(0).integers(
        0, 256, (4, 16, 16, 3), dtype=np.uint8)
    labels = np.asarray([0, 1, 2, 3], np.int32)
    mask = np.ones((4,), np.float32)

    losses = {}
    for name, settings in {
        "bare": step_lib.StepSettings(num_classes=4),
        "aug": step_lib.StepSettings(
            num_classes=4, randaugment=(1, 9), colout=(0.1, 0.1)),
    }.items():
        step = step_lib.build_train_step(
            model, objectives.soft_cross_entropy, tx, prep, settings)
        new_state, stats = step(
            fresh_state(), images, labels, mask, rng, scale=1.0)
        assert np.isfinite(float(stats["loss_sum"]))
        assert all(
            np.isfinite(np.asarray(p)).all()
            for p in jax.tree.leaves(new_state.params)
        )
        losses[name] = float(stats["loss_sum"])
    assert losses["aug"] != losses["bare"]
