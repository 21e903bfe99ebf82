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
