"""ZeRO-1 optimizer-state sharding (`mesh: {zero: true}`).

Beyond reference parity (the reference replicates optimizer state per DDP
rank): still-replicated leaves under TrainState.opt_state shard dim 0 over
the `data` mesh axis (hvt/parallel.py tp_shardings(zero=True)). The
optimizer update computes each momentum shard locally from the replicated
gradient; the parameter update all-gathers once per step. These tests pin
(a) the sharding layout (including composition with TP rules), (b) that a
zero step is numerically identical to the replicated step, and (c) that
the sharding survives the donated step (no silent re-replication).
"""

import jax
import numpy as np

from hvt import config as C
from hvt import parallel

P = jax.sharding.PartitionSpec


def _cfg(run_name: str, zero: bool, model: str = "resnet_micro") -> "C.Config":
    return C.loads(
        {
            "run_name": run_name,
            "max_duration": "2ba",
            "grad_accum": 1,
            "seed": 3,
            "model": {"name": model},
            "machine": {"save_root": f"/tmp/hvt-{run_name}"},
            "mesh": {"zero": zero},
            "train_dataset": {"source": "synthetic", "synthetic_num_classes": 8,
                              "synthetic_num_samples": 32, "crop_size": 32,
                              "global_batch_size": 8, "drop_last": True,
                              "shuffle": True},
            "eval_dataset": {"source": "synthetic", "synthetic_num_classes": 8,
                             "synthetic_num_samples": 16, "crop_size": 32,
                             "global_batch_size": 8},
            "optim": {"name": "DecoupledAdamW", "lr": 1e-3,
                      "weight_decay": 0.05},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "algorithms": [
                {"cls": "LabelSmoothing", "args": {"smoothing": 0.08}},
            ],
            "save": {"interval": None, "num_checkpoints_to_keep": 1,
                     "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )


def _specs_by_path(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = "/".join(
            getattr(k, "key", getattr(k, "name", str(getattr(k, "idx", k))))
            for k in path
        )
        out[keys] = leaf
    return out


def test_zero_sharding_layout_and_tp_composition():
    """zero=True shards opt_state dim 0 over `data`; params/EMA/scalars stay
    replicated; TP-rule-matched optimizer mirrors keep their model-axis
    sharding (the rules win over zero)."""
    from hvt.train.loop import Trainer

    mesh = parallel.cpu_mesh(4, model=2)
    cfg = _cfg("zero_layout", zero=True, model="swinv2_micro")
    tr = Trainer(cfg, mesh=mesh, log_interval=100)
    by_path = _specs_by_path(tr.state)

    data_sharded = [
        k for k, v in by_path.items()
        if k.startswith("opt_state") and "data" in str(v.sharding.spec)
    ]
    model_sharded = [
        k for k, v in by_path.items()
        if k.startswith("opt_state") and "model" in str(v.sharding.spec)
    ]
    assert data_sharded, "no optimizer leaf sharded over data"
    assert any("fc1" in k for k in model_sharded), (
        "TP rule lost to zero on fc1 optimizer mirrors"
    )
    for k, v in by_path.items():
        if k.startswith("params") and "fc" not in k and "mlp" not in k:
            assert "data" not in str(v.sharding.spec), f"param sharded: {k}"
    tr.close()


def test_zero_step_matches_replicated_and_sharding_survives():
    from hvt.train.loop import Trainer

    results = {}
    for name, zero in (("repl", False), ("zero", True)):
        mesh = parallel.cpu_mesh(4)
        tr = Trainer(_cfg(f"zero_{name}", zero=zero), mesh=mesh,
                     log_interval=100)
        batch = next(iter(tr.train_loader.epoch(0)))
        images, labels, mask = parallel.put_batch(mesh, batch)
        state, stats = tr.train_step(
            tr.state, images, labels, mask, tr.base_rng, scale=1.0
        )
        if zero:
            by_path = _specs_by_path(state)
            still = [
                k for k, v in by_path.items()
                if k.startswith("opt_state")
                and "data" in str(v.sharding.spec)
            ]
            assert still, "optimizer sharding lost through the donated step"
        results[name] = (
            float(stats["loss_sum"]),
            jax.tree.map(np.asarray, jax.device_get(state.params)),
        )
        tr.close()

    loss_r, params_r = results["repl"]
    loss_z, params_z = results["zero"]
    np.testing.assert_allclose(loss_z, loss_r, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(params_r), jax.tree.leaves(params_z)):
        np.testing.assert_allclose(a, b, atol=1e-7, rtol=1e-6)


def test_zero_reduces_compiled_argument_memory():
    """XLA's compile-time memory analysis proves the claim: with zero=True
    the per-device argument bytes drop by ~ opt_state * (1 - 1/data)."""
    import jax.numpy as jnp

    from hvt import objectives
    from hvt.data import DevicePrep
    from hvt.models import build_model
    from hvt.train import optim as optim_lib
    from hvt.train import schedule
    from hvt.train import state as state_lib
    from hvt.train import step as step_lib

    def arg_bytes(zero):
        mesh = parallel.cpu_mesh(4)
        parallel.set_kernel_mesh(mesh)
        cfg = C.loads({"model": {"name": "resnet_micro"},
                       "optim": {"name": "DecoupledAdamW", "lr": 1e-3,
                                 "weight_decay": 0.05}})
        model = build_model(cfg, 100)
        prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
        tx = optim_lib.build_optimizer(
            cfg.optim, schedule.cosine_with_warmup(10, 100, 0.0))
        st = step_lib.build_train_step(
            model, objectives.soft_cross_entropy, tx, prep,
            step_lib.StepSettings(num_classes=100))
        init = lambda: state_lib.create(  # noqa: E731
            model, tx, jax.random.key(0),
            prep.normalize(jnp.zeros((2, 32, 32, 3), jnp.uint8)), ema=False)
        abs_state = jax.eval_shape(init)
        sh = parallel.tp_shardings(mesh, abs_state, zero=zero)
        state_abs = jax.tree.map(
            lambda s, d: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=d),
            abs_state, sh)
        mk = lambda shape, dt, s: jax.ShapeDtypeStruct(  # noqa: E731
            shape, dt, sharding=s)
        imgs = mk((8, 32, 32, 3), jnp.uint8, parallel.image_sharding(mesh))
        lbls = mk((8,), jnp.int32, parallel.batch_sharding(mesh))
        msk = mk((8,), jnp.float32, parallel.batch_sharding(mesh))
        key = jax.eval_shape(lambda: jax.random.key(0))
        rng = mk(key.shape, key.dtype, parallel.replicated(mesh))
        parallel.set_kernel_mesh(None)
        return st.lower(
            state_abs, imgs, lbls, msk, rng, scale=1.0
        ).compile().memory_analysis().argument_size_in_bytes

    repl = arg_bytes(False)
    zero = arg_bytes(True)
    # AdamW mu+nu are ~2/3 of the state; sharding them 4 ways should cut
    # argument bytes by roughly half (conservatively: >= 30%).
    assert zero < 0.7 * repl, f"zero={zero} repl={repl}"
