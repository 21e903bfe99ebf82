"""The shipped configs/ tree composes cleanly and the recipes actually load
(the reference's recipes crash its own loader — SURVEY.md §2.4 quirk 2)."""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from hvt import config as C
from hvt import objectives as O
from hvt.data.folder import DatasetInfo
from hvt.train.algorithms import parse_algorithms

CONFIGS = pathlib.Path("configs")
ALL_YAMLS = sorted(CONFIGS.rglob("*.yaml"))


def test_config_tree_nonempty():
    assert len(ALL_YAMLS) >= 30


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: str(p.relative_to(CONFIGS)))
def test_every_config_composes(path):
    if "sweep" in path.name:
        pytest.skip("sweep specs are inputs to sweep.py, not config layers")
    cfg = C.load(machine="configs/machines/local.yaml", exps=[str(path)])
    # The algorithms list must parse into settings too.
    parse_algorithms(cfg)


def test_fixed_parity_configs_use_ghost_bn():
    """The fixed parity configs reproduce the reference's per-GPU DDP BN
    batches (4 GPUs, reference slurm/train.bash:2-7) via ghost BN — see
    PARITY.md "Intentional deviations"."""
    fixed = sorted((CONFIGS / "pretrain" / "fixed").glob("*.yaml"))
    assert len(fixed) == 5
    for path in fixed:
        cfg = C.load(
            machine="configs/machines/local.yaml",
            exps=["configs/pretrain/inat21.yaml", str(path)],
        )
        assert cfg.model.args.get("bn_groups") == 4, path


def test_recipe_stack_composes_with_pretrain():
    for recipe in ("mild", "medium", "hot", "hot_tpu"):
        cfg = C.load(
            machine="configs/machines/local.yaml",
            exps=[
                "configs/pretrain/inat21.yaml",
                "configs/pretrain/inat21_rand_species.yaml",
                f"configs/recipes/{recipe}.yaml",
            ],
        )
        settings = parse_algorithms(cfg)
        assert cfg.train_dataset.crop_size == 176
        assert cfg.model.loss_name == "binary_cross_entropy"
        if recipe.startswith("hot"):
            assert settings.sam_rho == 0.5
            assert settings.stochastic_depth_rate == 0.1
            assert settings.mixup_alpha == 0.2
        if recipe == "hot_tpu":
            # identical to hot except the augmentations run in-step
            assert settings.randaugment_device == (1, 9, True)
            assert settings.colout_device == (0.05, 0.05)


def test_bce_objective_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 6)).astype(np.float32)
    labels = rng.integers(0, 6, size=(4,))
    onehot = np.eye(6, dtype=np.float32)[labels]

    ours = float(O.binary_cross_entropy(jnp.asarray(logits), jnp.asarray(onehot)))
    theirs = float(
        TF.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(onehot), reduction="sum"
        )
        / 4
    )
    assert ours == pytest.approx(theirs, rel=1e-5)

    cfg = C.loads({"model": {"loss_name": "binary_cross_entropy"}})
    assert O.build_objective(cfg, DatasetInfo(6), None) is O.binary_cross_entropy
    with pytest.raises(ValueError):
        O.build_objective(
            C.loads({"model": {"loss_name": "nope"}}), DatasetInfo(6), None
        )


def test_sam_changes_gradients():
    import jax

    from hvt import objectives, parallel
    from hvt.data import DevicePrep
    from hvt.models import resnet as R
    from hvt.train import optim as optim_lib
    from hvt.train import state as state_lib
    from hvt.train import step as step_lib

    cfg = C.loads({"optim": {"name": "sgd", "lr": 0.1, "momentum": 0.0,
                              "weight_decay": 0.0}})
    model = R.resnet_micro(4)
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
    mesh = parallel.cpu_mesh(1)
    rng = jax.random.key(0)
    make_state = jax.jit(
        lambda: state_lib.create(
            model, tx, rng, prep.normalize(jnp.zeros((2, 32, 32, 3), jnp.uint8)),
            ema=False,
        ),
        out_shardings=parallel.replicated(mesh),
    )

    images = np.random.default_rng(0).integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    labels = np.asarray([0, 1, 2, 3], np.int32)
    mask = np.ones((4,), np.float32)

    outs = {}
    for tag, sam in [("plain", None), ("sam", 0.5)]:
        settings = step_lib.StepSettings(num_classes=4, sam_rho=sam, sam_interval=1)
        step = step_lib.build_train_step(
            model, objectives.soft_cross_entropy, tx, prep, settings
        )
        state, stats = step(
            make_state(), images, labels, mask, rng, scale=1.0
        )
        outs[tag] = (jax.device_get(state.params), float(stats["grad_norm"]))

    # same loss surface, different update point → different grads
    assert outs["plain"][1] != pytest.approx(outs["sam"][1], rel=1e-6)


def test_stochastic_depth_resnet():
    import jax

    from hvt.models import resnet as R

    model = R.ResNet(stage_sizes=(2,), width=8, num_classes=4,
                     stochastic_depth_rate=0.9, dtype=jnp.float32,
                     bn_scale_init_name="ones")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 3)),
                    dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    # eval: deterministic
    a = model.apply(variables, x, train=False)
    b = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # train: rng-dependent (block 2 has rate 0.9)
    t1, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(1)})
    t2, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_factory_wires_stochastic_depth():
    from hvt.models import build_model

    cfg = C.loads(
        {"model": {"name": "resnet50"},
         "algorithms": [{"cls": "StochasticDepth", "args": {"drop_rate": 0.15}}]}
    )
    model = build_model(cfg, 10)
    assert model.stochastic_depth_rate == 0.15

    swin_cfg = C.loads(
        {"model": {"name": "swinv2_tiny"},
         "algorithms": [{"cls": "StochasticDepth", "args": {"drop_rate": 0.3}}]}
    )
    swin = build_model(swin_cfg, 10)
    assert swin.drop_path_rate == 0.3
