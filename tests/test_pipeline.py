"""Pipeline parallelism (mesh pipe axis, hvt.models.swinv2 pipe>1).

The reference has no pipeline parallelism (DDP only, SURVEY.md §2.2); this
is a TPU-native capability: the deep SwinV2 stage is split into chains whose
stacked params shard over the mesh's `pipe` axis and a statically-unrolled
GPipe schedule shifts microbatches via collective-permute (see
hvt/models/swinv2.py _pipelined_stage). These tests pin

* exact numerical equality of the pipelined forward vs the sequential
  stage (same weights, eval mode) — the schedule and the param-layout
  converters are both exercised by the comparison,
* the stack/unstack converter roundtrip (checkpoint portability across
  pipe topologies),
* a real train step on a data x pipe CPU mesh with the trunk params
  actually sharded over the pipe axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvt.models import swinv2


def _models(pipe, microbatches=0):
    common = dict(
        num_classes=11,
        embed_dim=16,
        depths=(2, 4),
        num_heads=(2, 4),
        window_size=4,
        drop_path_rate=0.1,
        dtype=jnp.float32,
        use_pallas=False,
    )
    pipelined = swinv2.SwinTransformerV2(
        pipe=pipe, pipe_microbatches=microbatches, **common
    )
    sequential = swinv2.SwinTransformerV2(**common)
    return pipelined, sequential


def test_pipelined_forward_matches_sequential():
    pipelined, sequential = _models(pipe=2, microbatches=2)
    x = jax.random.normal(jax.random.key(0), (4, 32, 32, 3), jnp.float32)
    variables = pipelined.init(jax.random.key(1), x)
    got = pipelined.apply(variables, x)

    seq_params = swinv2.unstack_pipe_params(pipelined, variables["params"])
    want = sequential.apply({"params": seq_params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_more_microbatches_than_stages():
    # M > P exercises the steady-state ticks (feed + collect on one tick).
    pipelined, sequential = _models(pipe=2, microbatches=4)
    x = jax.random.normal(jax.random.key(2), (8, 32, 32, 3), jnp.float32)
    variables = pipelined.init(jax.random.key(3), x)
    got = pipelined.apply(variables, x)
    seq_params = swinv2.unstack_pipe_params(pipelined, variables["params"])
    want = sequential.apply({"params": seq_params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pipelined_grads_match_sequential():
    """Param gradients through the schedule equal the sequential stage's —
    in particular the bubble lineages must contribute *exactly zero* (a
    zero-initialized buffer NaNs the cosine-attention backward via 0*NaN;
    regression for that)."""
    pipelined, sequential = _models(pipe=2, microbatches=2)
    x = jax.random.normal(jax.random.key(5), (4, 32, 32, 3), jnp.float32)
    variables = pipelined.init(jax.random.key(6), x)

    def loss_p(params):
        return jnp.sum(pipelined.apply({"params": params}, x) ** 2)

    def loss_s(params):
        return jnp.sum(sequential.apply({"params": params}, x) ** 2)

    g_pipe = jax.grad(loss_p)(variables["params"])
    g_seq = jax.grad(loss_s)(
        swinv2.unstack_pipe_params(pipelined, variables["params"])
    )
    g_pipe_unstacked = swinv2.unstack_pipe_params(pipelined, g_pipe)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pipe_unstacked)
    flat_s = dict(jax.tree_util.tree_flatten_with_path(dict(g_seq))[0])
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]),
            rtol=1e-4, atol=1e-5, err_msg=str(path),
        )


def test_stack_unstack_roundtrip():
    pipelined, _ = _models(pipe=2)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = pipelined.init(jax.random.key(4), x)["params"]
    back = swinv2.stack_pipe_params(
        pipelined, swinv2.unstack_pipe_params(pipelined, params)
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        dict(back),
    )


def test_depth_must_divide():
    model = swinv2.SwinTransformerV2(
        num_classes=3, embed_dim=16, depths=(2, 6), num_heads=(2, 4),
        window_size=4, pipe=2, dtype=jnp.float32, use_pallas=False,
    )
    # depth 6 into 2 chains of 3 blocks: chains are not phase-aligned
    # (odd blocks per chain) — must refuse, not silently misalign shifts.
    with pytest.raises(ValueError, match="phase-aligned"):
        model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)))


def test_train_step_on_pipe_mesh(tmp_path):
    """One Trainer step on a data=2 x pipe=2 CPU mesh: trunk params sharded
    over the pipe axis, finite loss, step advances."""
    from hvt import config as C
    from hvt import parallel
    from hvt.train.loop import Trainer

    cfg = C.loads(
        {
            "run_name": "pipe_mesh",
            "max_duration": "1ba",
            "grad_accum": 1,
            "seed": 0,
            "model": {
                "name": "swinv2_micro_deep",
                "args": {"dtype": "float32", "drop_path_rate": 0.1},
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
            "optim": {"name": "DecoupledAdamW", "lr": 1e-3, "weight_decay": 0.01},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "save": {"interval": None, "num_checkpoints_to_keep": 1, "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
            "mesh": {"pipe": 2},
        }
    )
    mesh = parallel.cpu_mesh(4, pipe=2)
    trainer = Trainer(cfg, mesh=mesh, log_interval=1)
    try:
        # The Trainer injects pipe (+ plain-XLA lowering) from the mesh.
        assert trainer.model.pipe == 2 and not trainer.model.use_pallas

        leaf = jax.tree.leaves(trainer.state.params["pipe_trunk"])[0]
        spec = leaf.sharding.spec
        assert spec and spec[0] == parallel.PIPE_AXIS, spec

        metrics = trainer.fit()
        assert np.isfinite(metrics["cross-entropy"])
        assert int(trainer.state.step) == 1
    finally:
        trainer.close()

def test_remat_pipelined_matches_unrematted():
    """remat=True must apply to the pipelined trunk too (advisor finding,
    round 3: the deepest stage silently skipped checkpointing). remat is a
    numerical identity — the rematted pipelined model's forward and grads
    must equal the un-rematted pipelined model's exactly."""
    common = dict(
        num_classes=11,
        embed_dim=16,
        depths=(2, 4),
        num_heads=(2, 4),
        window_size=4,
        drop_path_rate=0.0,
        dtype=jnp.float32,
        use_pallas=False,
        pipe=2,
        pipe_microbatches=2,
    )
    plain = swinv2.SwinTransformerV2(**common)
    rematted = swinv2.SwinTransformerV2(remat=True, **common)
    x = jax.random.normal(jax.random.key(7), (4, 32, 32, 3), jnp.float32)
    variables = plain.init(jax.random.key(8), x)

    def loss(model, params):
        return jnp.sum(model.apply({"params": params}, x) ** 2)

    f_plain, g_plain = jax.value_and_grad(lambda p: loss(plain, p))(
        variables["params"]
    )
    f_remat, g_remat = jax.value_and_grad(lambda p: loss(rematted, p))(
        variables["params"]
    )
    np.testing.assert_allclose(float(f_plain), float(f_remat), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g_plain,
        g_remat,
    )
