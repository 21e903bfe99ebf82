"""Mixture-of-experts MLP + expert parallelism (hvt/ops/moe.py).

Beyond reference parity (the reference's vendored SwinV2 is dense); EP is
the `ep` axis of the tp/pp/dp/sp/ep matrix — expert weights shard over the
mesh's `model` axis. Pinned here:

* MoE with one expert ≡ the dense Mlp (same weights) — routing collapses,
* top-1 routing against a per-token python-loop reference,
* static capacity actually drops over-capacity tokens (zero MLP output),
* the Switch load-balancing aux loss is sown and reaches the train loss,
* a Trainer step on a data x model mesh shards the expert weights.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hvt.models.swinv2 import Mlp
from hvt.ops.moe import MoeMlp


def test_single_expert_equals_dense_mlp():
    moe = MoeMlp(num_experts=1, hidden=8, out=6, capacity_factor=8.0,
                 dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 5, 6), jnp.float32)
    params = moe.init(jax.random.key(1), x)["params"]

    dense = Mlp(hidden=8, out=6, dtype=jnp.float32)
    dense_params = {
        "fc1": {"kernel": params["w1"][0], "bias": params["b1"][0]},
        "fc2": {"kernel": params["w2"][0], "bias": params["b2"][0]},
    }
    got = moe.apply({"params": params}, x)
    want = dense.apply({"params": dense_params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_top1_routing_matches_reference_loop():
    e, g, s, m, hid = 4, 2, 6, 8, 12
    moe = MoeMlp(num_experts=e, hidden=hid, out=m, capacity_factor=float(e),
                 dtype=jnp.float32)  # capacity >= s: nothing dropped
    x = jax.random.normal(jax.random.key(2), (g, s, m), jnp.float32)
    params = moe.init(jax.random.key(3), x)["params"]
    got = np.asarray(moe.apply({"params": params}, x))

    logits = np.asarray(x) @ np.asarray(params["router"])
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    want = np.zeros((g, s, m), np.float32)
    for gi in range(g):
        for si in range(s):
            ei = int(np.argmax(probs[gi, si]))
            h = np.asarray(
                jax.nn.gelu(jnp.asarray(x[gi, si] @ w1[ei] + b1[ei]),
                            approximate=False)
            )
            want[gi, si] = probs[gi, si, ei] * (h @ w2[ei] + b2[ei])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_capacity_drops_tokens():
    # Zero router weights → uniform softmax → argmax routes every token to
    # expert 0; capacity 1 keeps only the first token per group.
    e, g, s, m = 4, 2, 6, 8
    moe = MoeMlp(num_experts=e, hidden=8, out=m,
                 capacity_factor=e / s,  # cap = ceil(s/e * e/s) = 1
                 dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(4), (g, s, m), jnp.float32)
    params = moe.init(jax.random.key(5), x)["params"]
    params = dict(params, router=jnp.zeros_like(params["router"]))
    y = np.asarray(moe.apply({"params": params}, x))
    assert np.abs(y[:, 0]).max() > 0  # first token per group processed
    np.testing.assert_array_equal(y[:, 1:], 0)  # the rest dropped


def test_aux_loss_sown_value():
    # Uniform router: f = (1,0,..), p = 1/e → aux = e * (1 * 1/e) = 1.0,
    # scaled by aux_weight.
    e, g, s, m = 4, 2, 6, 8
    moe = MoeMlp(num_experts=e, hidden=8, out=m, aux_weight=0.5,
                 dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(6), (g, s, m), jnp.float32)
    params = moe.init(jax.random.key(7), x)["params"]
    params = dict(params, router=jnp.zeros_like(params["router"]))
    _, mut = moe.apply({"params": params}, x, mutable=["aux_losses"])
    aux = jax.tree.leaves(mut["aux_losses"])[0]
    np.testing.assert_allclose(float(aux), 0.5, atol=1e-6)


def test_trainer_step_with_expert_parallelism(tmp_path):
    """swinv2 with MoE blocks on a data=2 x model=2 mesh: expert weights
    sharded over the model axis (EP), finite loss, aux loss in the
    objective (train loss responds to aux_weight)."""
    from hvt import config as C
    from hvt import parallel
    from hvt.train.loop import Trainer

    def build(run_name, aux_weight):
        cfg = C.loads(
            {
                "run_name": run_name,
                "max_duration": "1ba",
                "grad_accum": 1,
                "seed": 0,
                "model": {
                    "name": "swinv2_micro",
                    "args": {
                        "dtype": "float32",
                        "moe_experts": 2,
                        "moe_from_stage": 0,
                        "moe_every": 1,
                        "moe_aux_weight": aux_weight,
                    },
                },
                "machine": {"save_root": str(tmp_path)},
                "train_dataset": {
                    "source": "synthetic", "synthetic_num_classes": 4,
                    "synthetic_num_samples": 16, "crop_size": 32,
                    "global_batch_size": 8, "drop_last": True, "shuffle": True,
                },
                "eval_dataset": {
                    "source": "synthetic", "synthetic_num_classes": 4,
                    "synthetic_num_samples": 8, "crop_size": 32,
                    "global_batch_size": 8,
                },
                "optim": {"name": "DecoupledAdamW", "lr": 1e-3,
                          "weight_decay": 0.01},
                "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
                "save": {"interval": None, "num_checkpoints_to_keep": 1,
                         "wandb": False},
                "loader": {"num_workers": 1, "prefetch_batches": 1},
            }
        )
        return Trainer(cfg, mesh=parallel.cpu_mesh(4, model=2), log_interval=1)

    trainer = build("moe_ep", 0.01)
    try:
        flat = jax.tree_util.tree_flatten_with_path(trainer.state.params)[0]
        moe_leaves = [
            (p, s) for p, s in flat
            if "moe" in "/".join(str(k) for k in p)
        ]
        assert moe_leaves, "no MoE params created"
        expert_specs = {
            str(s.sharding.spec) for p, s in moe_leaves
            if any("w1" in str(k) or "w2" in str(k) for k in p)
        }
        assert all("model" in s for s in expert_specs), expert_specs

        batch = next(iter(trainer.train_loader.epoch(0)))
        images, labels, mask = parallel.put_batch(trainer.mesh, batch)
        state, stats = trainer.train_step(
            trainer.state, images, labels, mask, trainer.base_rng, scale=1.0
        )
        assert int(state.step) == 1
        loss_small_aux = float(stats["loss_sum"])
        assert np.isfinite(loss_small_aux)
    finally:
        trainer.close()

    # The aux loss reaches the objective: same data/seed, bigger weight →
    # bigger loss (the load-balance term is ~aux_weight at init).
    trainer_big = build("moe_ep_big", 10.0)
    try:
        batch = next(iter(trainer_big.train_loader.epoch(0)))
        images, labels, mask = parallel.put_batch(trainer_big.mesh, batch)
        _, stats = trainer_big.train_step(
            trainer_big.state, images, labels, mask, trainer_big.base_rng,
            scale=1.0,
        )
        assert float(stats["loss_sum"]) > loss_small_aux + 1.0
    finally:
        trainer_big.close()

def test_dense_and_moe_blocks_compose_tp_and_ep(tmp_path):
    """Dense and MoE blocks in the SAME state on a data x model mesh: the
    dense blocks' mlp/fc1 leaves carry Megatron TP sharding AND the MoE
    blocks' w1/w2 leaves carry EP sharding — the exact invariant the
    driver's dryrun prints (__graft_entry__.py), previously untested (the
    test above forces all-MoE, which leaves zero fc1 params and broke the
    round-3 gate). swinv2_micro has depths (1, 1): moe_from_stage=1 keeps
    stage 0 dense and makes stage 1 MoE."""
    from hvt import config as C
    from hvt import parallel
    from hvt.train.loop import Trainer

    cfg = C.loads(
        {
            "run_name": "moe_tp_compose",
            "max_duration": "1ba",
            "grad_accum": 1,
            "seed": 0,
            "model": {
                "name": "swinv2_micro",
                "args": {
                    "dtype": "float32",
                    "moe_experts": 2,
                    "moe_from_stage": 1,
                    "moe_every": 1,
                },
            },
            "machine": {"save_root": str(tmp_path)},
            "train_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 16, "crop_size": 32,
                "global_batch_size": 8, "drop_last": True, "shuffle": True,
            },
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "optim": {"name": "DecoupledAdamW", "lr": 1e-3,
                      "weight_decay": 0.01},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "save": {"interval": None, "num_checkpoints_to_keep": 1,
                     "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    trainer = Trainer(cfg, mesh=parallel.cpu_mesh(4, model=2), log_interval=1)
    try:
        flat = jax.tree_util.tree_flatten_with_path(trainer.state.params)[0]
        fc1_specs = {
            str(s.sharding.spec)
            for p, s in flat
            if "fc1" in "/".join(str(k) for k in p)
        }
        assert fc1_specs, "no dense mlp/fc1 params — blocks are all-MoE"
        assert any("model" in s for s in fc1_specs), fc1_specs
        ep_specs = {
            str(s.sharding.spec)
            for p, s in flat
            if "moe" in "/".join(str(k) for k in p)
            and any(str(k) in ("w1", "w2") or "w1" in str(k) or "w2" in str(k)
                    for k in p)
        }
        assert ep_specs, "no MoE expert params — no block is MoE"
        assert all("model" in s for s in ep_specs), ep_specs

        batch = next(iter(trainer.train_loader.epoch(0)))
        images, labels, mask = parallel.put_batch(trainer.mesh, batch)
        state, stats = trainer.train_step(
            trainer.state, images, labels, mask, trainer.base_rng, scale=1.0
        )
        assert int(state.step) == 1
        assert np.isfinite(float(stats["loss_sum"]))
    finally:
        trainer.close()


def test_moe_experts_must_divide_model_axis(tmp_path):
    """moe_experts not divisible by the mesh model-axis size raises a clear
    config error at Trainer construction, not an opaque GSPMD divisibility
    failure inside jit (advisor finding, round 3)."""
    import pytest

    from hvt import config as C
    from hvt import parallel
    from hvt.train.loop import Trainer

    cfg = C.loads(
        {
            "run_name": "moe_indivisible",
            "max_duration": "1ba",
            "model": {
                "name": "swinv2_micro",
                "args": {"moe_experts": 3, "moe_from_stage": 0,
                         "moe_every": 1},
            },
            "machine": {"save_root": str(tmp_path)},
            "train_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 16, "crop_size": 32,
                "global_batch_size": 8, "drop_last": True, "shuffle": True,
            },
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "save": {"interval": None, "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    with pytest.raises(ValueError, match="divisible"):
        Trainer(cfg, mesh=parallel.cpu_mesh(4, model=2), log_interval=1)
