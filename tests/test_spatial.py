"""Spatial partitioning (the `spatial` mesh axis).

Beyond reference parity (the reference is DDP-only, SURVEY.md §2.2): image
batches shard their H dim over the mesh's `spatial` axis
(hvt/parallel.py image_sharding) and GSPMD partitions the convolutions
(halo exchanges) and BN/pool reductions (psums) from that one annotation.
These tests pin (a) the sharding layout, (b) numerical equivalence of a
dp x sp train step to the pure-dp step on the same devices, and (c) the
guard that keeps Pallas kernels (window-major tensors — unpartitionable
over H) off spatial meshes.
"""

import jax
import numpy as np
import pytest

from hvt import config as C
from hvt import parallel


def _micro_cfg(run_name: str, spatial: int = 1) -> "C.Config":
    return C.loads(
        {
            "run_name": run_name,
            "max_duration": "2ba",
            "grad_accum": 1,
            "seed": 7,
            "model": {"name": "resnet_micro"},
            "machine": {"save_root": f"/tmp/hvt-{run_name}"},
            "mesh": {"spatial": spatial},
            "train_dataset": {"source": "synthetic", "synthetic_num_classes": 8,
                              "synthetic_num_samples": 32, "crop_size": 32,
                              "global_batch_size": 8, "drop_last": True,
                              "shuffle": True},
            "eval_dataset": {"source": "synthetic", "synthetic_num_classes": 8,
                             "synthetic_num_samples": 16, "crop_size": 32,
                             "global_batch_size": 8},
            "optim": {"name": "DecoupledSGDW", "lr": 0.05, "momentum": 0.9,
                      "weight_decay": 1e-4},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "algorithms": [
                {"cls": "LabelSmoothing", "args": {"smoothing": 0.08}},
            ],
            "save": {"interval": None, "num_checkpoints_to_keep": 1,
                     "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )


def test_mesh_axes_and_image_sharding():
    """A spatial mesh is (data, spatial, model); images shard H over
    `spatial`, labels/mask stay batch-only."""
    mesh = parallel.cpu_mesh(4, spatial=2)
    assert dict(mesh.shape) == {"data": 2, "spatial": 2, "model": 1, "pipe": 1}
    assert parallel.spatial_size(mesh) == 2

    img_spec = parallel.image_sharding(mesh).spec
    assert img_spec == jax.sharding.PartitionSpec("data", "spatial")
    assert parallel.batch_sharding(mesh).spec == jax.sharding.PartitionSpec(
        "data"
    )

    # Degenerate spatial axis keeps the legacy layout.
    flat = parallel.cpu_mesh(4)
    assert parallel.spatial_size(flat) == 1
    assert parallel.image_sharding(flat).spec == jax.sharding.PartitionSpec(
        "data"
    )


def test_make_mesh_spatial_from_config():
    cfg = _micro_cfg("mesh_cfg", spatial=2)
    mesh = parallel.make_mesh(cfg.mesh, devices=jax.devices("cpu")[:4])
    assert dict(mesh.shape) == {"data": 2, "spatial": 2, "model": 1, "pipe": 1}
    with pytest.raises(ValueError, match="not divisible"):
        parallel.make_mesh(
            C.loads({"mesh": {"spatial": 3}}).mesh,
            devices=jax.devices("cpu")[:4],
        )


def test_spatial_train_step_matches_data_parallel():
    """One train step on a 2x2 (data x spatial) mesh reproduces the pure-dp
    step on the same 4 devices: same synthetic batch, same init, same loss
    and next-step params (up to f32 reduction reordering from the halo
    exchange / psum decomposition)."""
    from hvt.train.loop import Trainer

    losses = {}
    params = {}
    for name, mesh in (
        ("dp", parallel.cpu_mesh(4)),
        ("sp", parallel.cpu_mesh(4, spatial=2)),
    ):
        tr = Trainer(_micro_cfg(f"spatial_{name}", spatial=2 if name == "sp" else 1),
                     mesh=mesh, log_interval=100)
        batch = next(iter(tr.train_loader.epoch(0)))
        images, labels, mask = parallel.put_batch(mesh, batch)
        if name == "sp":
            assert "spatial" in str(images.sharding.spec)
        state, stats = tr.train_step(
            tr.state, images, labels, mask, tr.base_rng, scale=1.0
        )
        losses[name] = float(stats["loss_sum"])
        params[name] = jax.tree.map(np.asarray, jax.device_get(state.params))
        tr.close()

    assert np.isfinite(losses["dp"]) and np.isfinite(losses["sp"])
    np.testing.assert_allclose(losses["sp"], losses["dp"], rtol=1e-5)
    flat_dp = jax.tree.leaves(params["dp"])
    flat_sp = jax.tree.leaves(params["sp"])
    for a, b in zip(flat_dp, flat_sp):
        np.testing.assert_allclose(a, b, atol=5e-6, rtol=1e-5)


def test_pallas_kernels_refuse_spatial_mesh():
    """Window-major Pallas kernels cannot partition H: the shard_map wrap
    raises with routing instructions instead of computing garbage."""
    mesh = parallel.cpu_mesh(4, spatial=2)
    prev = parallel.declared_kernel_mesh()
    parallel.set_kernel_mesh(mesh)
    try:
        with pytest.raises(ValueError, match="spatial"):
            parallel.shard_map_kernel(lambda x: x, batch_argnums=(0,), n_args=1)
    finally:
        parallel.set_kernel_mesh(prev)


def test_swin_spatial_mesh_runs_via_xla_and_kernels_refuse():
    """The kernel_mesh guard's instruction is real: SwinV2 with the plain-XLA
    lowering ({fuse: false, use_pallas: false}) trains on a spatial mesh and
    matches pure-dp; with kernels enabled the trace raises the routing
    error instead of computing garbage."""
    from hvt.train.loop import Trainer

    def swin_cfg(run_name, spatial, fuse):
        base = _micro_cfg(run_name, spatial=spatial)
        return C.loads(
            C.to_dict(base),
            {
                "model": {"name": "swinv2_micro",
                          "args": {"fuse": fuse, "use_pallas": fuse}},
                "optim": {"name": "DecoupledAdamW", "lr": 1e-3,
                          "weight_decay": 0.05},
            },
        )

    losses = {}
    for name, mesh, cfg in (
        ("dp", parallel.cpu_mesh(4), swin_cfg("swin_sp_dp", 1, False)),
        ("sp", parallel.cpu_mesh(4, spatial=2), swin_cfg("swin_sp_sp", 2, False)),
    ):
        tr = Trainer(cfg, mesh=mesh, log_interval=100)
        batch = next(iter(tr.train_loader.epoch(0)))
        images, labels, mask = parallel.put_batch(mesh, batch)
        _, stats = tr.train_step(
            tr.state, images, labels, mask, tr.base_rng, scale=1.0
        )
        losses[name] = float(stats["loss_sum"])
        tr.close()
    np.testing.assert_allclose(losses["sp"], losses["dp"], rtol=1e-5)

    # Kernels on a spatial mesh refuse at trace time with instructions.
    mesh = parallel.cpu_mesh(4, spatial=2)
    tr = None
    with pytest.raises(ValueError, match="fuse: false"):
        tr = Trainer(swin_cfg("swin_sp_kern", 2, True), mesh=mesh,
                     log_interval=100)
        batch = next(iter(tr.train_loader.epoch(0)))
        images, labels, mask = parallel.put_batch(mesh, batch)
        tr.train_step(tr.state, images, labels, mask, tr.base_rng, scale=1.0)
    if tr is not None:
        tr.close()


def test_spatial_axis_intra_host_detector():
    """Cross-host spatial groups are refused in multi-host put_batch; the
    detector itself is checked with synthetic process placements."""
    import numpy as np

    class _Dev:
        def __init__(self, pidx):
            self.process_index = pidx

    # 2 data x 2 spatial, spatial groups within one host each.
    good = np.array([[[_Dev(0)], [_Dev(0)]], [[_Dev(1)], [_Dev(1)]]])
    assert parallel._spatial_axis_intra_host(good, axis=1)
    # spatial group straddles hosts 0 and 1.
    bad = np.array([[[_Dev(0)], [_Dev(1)]], [[_Dev(0)], [_Dev(1)]]])
    assert not parallel._spatial_axis_intra_host(bad, axis=1)


def test_spatial_enables_batch_below_device_count():
    """The motivating case: a global batch smaller than the device count
    cannot shard over a pure data axis (2 rows over 4 devices), but a
    2x2 data x spatial mesh trains it — H carries the extra parallelism."""
    from hvt.train.loop import Trainer

    def cfg(run_name, spatial):
        base = _micro_cfg(run_name, spatial=spatial)
        return C.loads(
            C.to_dict(base),
            {"train_dataset": {"global_batch_size": 2},
             "eval_dataset": {"global_batch_size": 2}},
        )

    # Pure DP over 4 devices: 2 rows don't divide 4 — put_batch must fail.
    tr = Trainer(cfg("small_dp", 1), mesh=parallel.cpu_mesh(4),
                 log_interval=100)
    batch = next(iter(tr.train_loader.epoch(0)))
    with pytest.raises(Exception):
        jax.block_until_ready(parallel.put_batch(parallel.cpu_mesh(4), batch))
    tr.close()

    # data=2 x spatial=2 uses all 4 devices on the same global batch.
    mesh = parallel.cpu_mesh(4, spatial=2)
    tr = Trainer(cfg("small_sp", 2), mesh=mesh, log_interval=100)
    batch = next(iter(tr.train_loader.epoch(0)))
    images, labels, mask = parallel.put_batch(mesh, batch)
    assert len(images.sharding.device_set) == 4
    _, stats = tr.train_step(
        tr.state, images, labels, mask, tr.base_rng, scale=1.0
    )
    assert np.isfinite(float(stats["loss_sum"]))
    tr.close()
