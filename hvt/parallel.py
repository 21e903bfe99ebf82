"""Device mesh and sharding layout — the TPU-native replacement for DDP/NCCL.

The reference's only parallelism is DDP data parallelism behind
``composer.utils.dist`` (SURVEY.md §2.2; reference main.py:44-48,
data.py:147). Here it is GSPMD: one global `jax.sharding.Mesh`, parameters
replicated, the batch sharded over the ``data`` axis. XLA compiles the
gradient reduction to ICI all-reduces — there is no hand-written comm layer.

A ``model`` axis is laid out (default size 1) so model-parallel shardings can
be introduced without re-plumbing; collectives ride ICI as long as the mesh
uses the default device order.

A ``spatial`` axis (default size 1) carries GSPMD **spatial partitioning**:
image inputs shard their H dimension over it (``image_sharding``), XLA
inserts the convolution halo exchanges and turns the BatchNorm/pool
reductions into cross-``spatial`` psums automatically. This is the
TPU-native lever for when per-chip batch would otherwise drop below 1 (very
large images or very large meshes) — the reference has no counterpart
(DDP only). Conv families (ResNet) partition cleanly; the SwinV2 Pallas
kernels operate on window-major tensors and cannot partition H, so
``spatial > 1`` requires their plain-XLA lowering (``shard_map_kernel``
raises with instructions otherwise).

A ``pipe`` axis (default size 1) carries **pipeline parallelism** for the
SwinV2 deep trunk (hvt.models.swinv2 ``pipe``): the trunk's blocks are
stacked over a leading stage dim sharded over this axis (each rank stores
and computes only its own stage), and a statically-unrolled GPipe schedule
shifts microbatch activations stage-to-stage — the shift lowers to ICI
collective-permutes under GSPMD. The scaling-book formulation (vmap over
stages + sharded stage dim), not a hand-written send/recv scheduler.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"
_AXES = (DATA_AXIS, SPATIAL_AXIS, MODEL_AXIS, PIPE_AXIS)


def make_mesh(
    mesh_cfg=None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the global mesh. data=-1 means 'all remaining devices'."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)

    model = getattr(mesh_cfg, "model", 1) if mesh_cfg is not None else 1
    spatial = getattr(mesh_cfg, "spatial", 1) if mesh_cfg is not None else 1
    pipe = getattr(mesh_cfg, "pipe", 1) if mesh_cfg is not None else 1
    data = getattr(mesh_cfg, "data", -1) if mesh_cfg is not None else -1
    if data == -1:
        if len(devices) % (model * spatial * pipe):
            raise ValueError(
                f"{len(devices)} devices not divisible by "
                f"spatial={spatial} x model={model} x pipe={pipe}"
            )
        data = len(devices) // (model * spatial * pipe)
    if data * spatial * model * pipe != len(devices):
        raise ValueError(
            f"mesh {data}x{spatial}x{model}x{pipe} (data x spatial x model "
            f"x pipe) does not match {len(devices)} devices"
        )
    return Mesh(devices.reshape(data, spatial, model, pipe), _AXES)


def divisor_mesh(batch_size: int, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Largest data-axis size that divides batch_size (bulk inference jobs
    where the batch is small or oddly sized)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n:
        n -= 1
    return Mesh(np.asarray(devices[:n]).reshape(n, 1, 1, 1), _AXES)


def cpu_mesh(
    n_devices: int, model: int = 1, spatial: int = 1, pipe: int = 1
) -> Mesh:
    """Mesh over virtual CPU devices (tests / multi-chip dry runs).

    Requires XLA_FLAGS=--xla_force_host_platform_device_count>=n. Requests
    the cpu backend explicitly because this environment force-registers a
    TPU platform regardless of JAX_PLATFORMS (see .claude/skills/verify).
    ``model > 1`` carves a tensor-parallel axis out of the device grid;
    ``spatial > 1`` a spatial-partitioning axis.
    """
    devices = jax.devices("cpu")[:n_devices]
    if len(devices) < n_devices:
        raise RuntimeError(
            f"only {len(devices)} cpu devices; set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}"
        )
    if n_devices % (model * spatial * pipe):
        raise ValueError(
            f"{n_devices} devices not divisible by spatial={spatial} x "
            f"model={model} x pipe={pipe}"
        )
    return Mesh(
        np.asarray(devices).reshape(
            n_devices // (model * spatial * pipe), spatial, model, pipe
        ),
        _AXES,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_size(mesh: Mesh) -> int:
    """Size of the spatial-partitioning axis (1 on legacy 2-axis meshes)."""
    return int(mesh.shape.get(SPATIAL_AXIS, 1))


def pipe_size(mesh: Mesh) -> int:
    """Size of the pipeline-parallel axis (1 on legacy meshes)."""
    return int(mesh.shape.get(PIPE_AXIS, 1))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for NHWC image batches: batch over ``data``; H additionally
    over ``spatial`` when that axis is real — GSPMD spatially partitions the
    convolutions (halo exchanges) and BN/pool reductions (psums) from this
    one annotation."""
    if spatial_size(mesh) > 1:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return batch_sharding(mesh)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spatial_axis_intra_host(devices, axis: int) -> bool:
    """True when every run of devices along the spatial axis lives in one
    process. Cross-host spatial sharding would require the loader to
    supply H-slices per host (it supplies full images), and the halo
    exchanges would ride DCN — refuse both."""
    dev = np.moveaxis(np.asarray(devices), axis, -1)
    for row in dev.reshape(-1, dev.shape[-1]):
        if len({d.process_index for d in row}) > 1:
            return False
    return True


# Memoized per mesh (Mesh hashes by devices+axis names — a handful per
# process): the layout is immutable, and put_batch is the per-batch host
# hot path.
_SPATIAL_OK: dict = {}


def _check_spatial_intra_host(mesh: Mesh) -> None:
    ok = _SPATIAL_OK.get(mesh)
    if ok is None:
        ok = _spatial_axis_intra_host(
            mesh.devices, mesh.axis_names.index(SPATIAL_AXIS)
        )
        _SPATIAL_OK[mesh] = ok
    if not ok:
        raise ValueError(
            "the spatial mesh axis spans hosts: each process's loader "
            "supplies full-H images, and conv halo exchanges would ride "
            "DCN. Lay the mesh out so every spatial group sits inside one "
            "host (spatial <= devices-per-host)."
        )


def put_batch(mesh: Mesh, batch) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Host-local numpy batch → global batch-sharded device arrays.

    Uses make_array_from_process_local_data so each host contributes its own
    shard (multi-host analog of the per-rank DistributedSampler,
    reference data.py:147). Images take ``image_sharding`` (H additionally
    sharded over a real spatial axis); labels/mask are batch-only.
    """
    sharding = batch_sharding(mesh)
    img_sharding = image_sharding(mesh)
    if jax.process_count() == 1:
        # One pytree transfer (one runtime round trip) — equivalent to the
        # per-array path on a single host, cheaper on latency-bound links.
        return jax.device_put(
            (batch.images, batch.labels, batch.mask),
            (img_sharding, sharding, sharding),
        )
    if spatial_size(mesh) > 1:
        _check_spatial_intra_host(mesh)
    images = jax.make_array_from_process_local_data(img_sharding, batch.images)
    labels = jax.make_array_from_process_local_data(sharding, batch.labels)
    mask = jax.make_array_from_process_local_data(sharding, batch.mask)
    return images, labels, mask


# ---------------------------------------------------------------------------
# Pallas kernels under the mesh: per-shard execution via shard_map
# ---------------------------------------------------------------------------
#
# Mosaic custom calls cannot be partitioned by GSPMD: under a multi-device
# jit, JAX refuses to lower them ("Mosaic kernels cannot be automatically
# partitioned. Please wrap the call in a shard_map", jax tpu_custom_call.py).
# Every batch-leading kernel in hvt.ops is embarrassingly parallel over the
# data axis, so the kernel entry points wrap themselves in a full-manual
# shard_map over the active mesh: batch args sharded over "data", parameters
# replicated (their cotangents are psum'd across the data axis by shard_map's
# transpose — the same all-reduce DDP would do). Single-device meshes skip
# the wrap entirely.
#
# The Trainer / bench declare the mesh with set_kernel_mesh BEFORE tracing;
# model code stays mesh-agnostic.

_KERNEL_MESH: Optional[Mesh] = None


def set_kernel_mesh(mesh: Optional[Mesh]) -> None:
    """Declare the mesh jitted programs will run under (None to clear)."""
    global _KERNEL_MESH
    _KERNEL_MESH = mesh


def declared_kernel_mesh() -> Optional[Mesh]:
    """The mesh as declared (unlike kernel_mesh(), which hides single-device
    meshes) — for callers that need to save/restore the global."""
    return _KERNEL_MESH


def kernel_mesh() -> Optional[Mesh]:
    """The active multi-device kernel mesh, or None when kernels can run
    unwrapped (no mesh declared, or a single-device mesh).

    Raises on a spatial mesh: every consumer wraps a Pallas kernel in a
    data-axis-only shard_map, which under ``spatial > 1`` would silently
    all-gather the H-sharded activations into every kernel instance —
    defeating the memory purpose of spatial partitioning."""
    mesh = _KERNEL_MESH
    if mesh is not None and mesh.devices.size > 1:
        if spatial_size(mesh) > 1:
            raise ValueError(
                "Pallas kernels operate on data-sharded tensors and cannot "
                "partition the image H dim over the spatial mesh axis. With "
                "mesh.spatial > 1 use the plain-XLA lowerings: model.args "
                "{fuse: false, use_pallas: false} for SwinV2 and leave "
                "bn_pallas off for ResNet (GSPMD partitions the XLA ops — "
                "including the pure-jnp bn_custom path — automatically)."
            )
        if pipe_size(mesh) > 1:
            raise ValueError(
                "Pallas kernels cannot run inside the pipelined trunk (the "
                "stage dim is vmapped and GSPMD cannot partition Mosaic "
                "calls). With mesh.pipe > 1 use the plain-XLA lowerings: "
                "model.args {fuse: false, use_pallas: false}."
            )
        return mesh
    return None


def shard_map_kernel(fn, batch_argnums: Sequence[int], n_args: int):
    """Wrap a batch-leading kernel in shard_map over the active mesh.

    ``batch_argnums`` index positional args whose leading dim is the
    (window-major-batch) batch dim — sharded over the data axis; every other
    arg is replicated. No-op when no multi-device mesh is active."""
    mesh = kernel_mesh()  # raises on spatial meshes — see kernel_mesh
    if mesh is None:
        return fn
    batch = frozenset(batch_argnums)
    in_specs = tuple(
        P(DATA_AXIS) if i in batch else P() for i in range(n_args)
    )
    # check_vma=False: pallas_call's out_shapes carry no varying-mesh-axes
    # metadata, which vma checking requires. Gradient correctness (the psum
    # of replicated-arg cotangents) is pinned by tests/test_spmd_kernels.py.
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=P(DATA_AXIS),
        check_vma=False,
    )


# ---------------------------------------------------------------------------
# Tensor parallelism over the model axis (GSPMD parameter sharding)
# ---------------------------------------------------------------------------
#
# The reference has no TP (DDP only, SURVEY.md §2.2); hvt lays it out the
# TPU-native way: parameters get PartitionSpecs over the mesh's "model" axis
# and XLA partitions the matmuls and inserts the all-reduces — no model-code
# changes, no hand-written collectives. Rules are path regexes, applied to
# EVERY TrainState leaf whose path matches (optimizer momentum and EMA trees
# mirror parameter paths, so they shard identically for free).
#
# Default rules: Megatron-style column/row split of the transformer MLP
# (fc1 column-parallel, fc2 row-parallel). Attention parameters stay
# replicated — the Pallas attention kernels execute per-data-shard inside a
# shard_map (see shard_map_kernel above), which replicates their parameter
# operands across the mesh; sharding those params would only buy all-gathers
# around every kernel. Note the fused MLP kernels (model.args.fuse) likewise
# replicate fc1/fc2 inside the kernel region: with model>1 they still run
# correctly but re-gather the TP-sharded weights each step — prefer
# fuse=false when actually running TP>1 on memory-constrained chips.

TP_RULES: tuple[tuple[str, PartitionSpec], ...] = (
    # Pipelined-trunk params (hvt.models.swinv2 pipe>1) carry a leading
    # stage dim stacked by nn.vmap — shard it over the pipe axis so each
    # pipeline rank stores only its own stage's blocks. TP composes: the
    # trunk's MLP kernels additionally split over the model axis. These
    # rules must precede the plain MLP rules (first match wins).
    (r"pipe_trunk/.*mlp/fc1/kernel$", P(PIPE_AXIS, None, MODEL_AXIS)),
    (r"pipe_trunk/.*mlp/fc1/bias$", P(PIPE_AXIS, MODEL_AXIS)),
    (r"pipe_trunk/.*mlp/fc2/kernel$", P(PIPE_AXIS, MODEL_AXIS, None)),
    (r"pipe_trunk/", P(PIPE_AXIS)),
    # Expert parallelism (hvt.ops.moe): stacked expert weights (E, ...)
    # shard their expert dim over the model axis — EP rides `model` (the
    # router stays replicated; GSPMD inserts the dispatch all-to-alls at
    # the ep_constraint boundary).
    (r"/moe/(w1|w2|b1|b2)$", P(MODEL_AXIS)),
    (r"mlp/fc1/kernel$", P(None, MODEL_AXIS)),
    (r"mlp/fc1/bias$", P(MODEL_AXIS)),
    (r"mlp/fc2/kernel$", P(MODEL_AXIS, None)),
)


def _match_spec(path: str, rules) -> PartitionSpec:
    import re

    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()


def tp_shardings(mesh: Mesh, tree, rules=TP_RULES, zero: bool = False):
    """Pytree of NamedShardings: rule-matched leaves shard over the model
    axis, everything else replicates. `tree` may hold arrays or
    ShapeDtypeStructs (only the structure and paths are used).

    ``zero=True`` adds ZeRO-1-style optimizer-state sharding: any
    still-replicated leaf under the TrainState's ``opt_state`` subtree
    shards its first data-size-divisible dimension over the ``data`` axis
    (out_shardings require exact divisibility; leaves with no such
    dimension stay replicated). The optimizer update then computes each
    momentum shard locally from the (replicated) gradient and the
    parameter update all-gathers once per step — AdamW's mu/nu (2× params
    of f32) stop being replicated per chip. Parameters, EMA, and batch
    stats keep their TP-or-replicated layout (eval and kernels read them
    directly)."""
    data = int(mesh.shape.get(DATA_AXIS, 1))

    def leaf_sharding(path, leaf):
        keys = "/".join(
            getattr(k, "key", getattr(k, "name", str(getattr(k, "idx", k))))
            for k in path
        )
        spec = _match_spec(keys, rules)
        # A spec that doesn't divide the leaf (or names a size-1 axis) is
        # fine — GSPMD treats size-1 axes as replication — but guard rank.
        if spec != P() and getattr(leaf, "ndim", 0) < len(spec):
            spec = P()
        if zero and spec == P() and keys.startswith("opt_state") and data > 1:
            for d in range(getattr(leaf, "ndim", 0)):
                if leaf.shape[d] >= data and leaf.shape[d] % data == 0:
                    spec = P(*([None] * d + [DATA_AXIS]))
                    break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def zero_update_shardings(mesh: Mesh, params_tree, rules=TP_RULES):
    """Per-leaf NamedShardings for the ZeRO-1 *optimizer update* tree
    (params-shaped): TP-rule-matched leaves keep their model-axis spec;
    everything else shards its first data-divisible dimension over the
    data axis — the layout the sharded mu/nu carry.

    Why this exists: with only the opt_state sharded (tp_shardings
    zero=True) and nothing constraining the update math, GSPMD chooses to
    **all-gather mu/nu and compute the AdamW update replicated** — AOT
    memory analysis on a v5e:2x4 topology measured +0.7-4.3 GiB of temps,
    a net live-memory LOSS at every batch size (BENCH.md round 4, "ZeRO-1
    on-TPU memory analysis"). Constraining the update tree to these specs
    keeps the moment math local to each data shard; the one all-gather
    ZeRO-1 budgets for happens where it belongs, at
    ``params + updates``."""
    data = int(mesh.shape.get(DATA_AXIS, 1))

    def leaf_sharding(path, leaf):
        keys = "/".join(
            getattr(k, "key", getattr(k, "name", str(getattr(k, "idx", k))))
            for k in path
        )
        spec = _match_spec(keys, rules)
        if spec != P() and getattr(leaf, "ndim", 0) < len(spec):
            spec = P()
        if spec == P() and data > 1:
            for d in range(getattr(leaf, "ndim", 0)):
                if leaf.shape[d] >= data and leaf.shape[d] % data == 0:
                    spec = P(*([None] * d + [DATA_AXIS]))
                    break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, params_tree)


def constrain_tx_updates(tx, shardings):
    """Wrap an optax transformation so its emitted updates are pinned to
    `shardings` (a params-shaped tree of NamedShardings) with
    with_sharding_constraint — the ZeRO-1 sharded-update contract (see
    zero_update_shardings)."""
    import optax

    def init(params):
        return tx.init(params)

    def update(updates, state, params=None):
        # NOTE (measured dead end): also constraining the INCOMING
        # gradients to `shardings` (forcing a reduce-scatter instead of
        # the all-reduce) changes NOTHING in the AOT memory analysis at
        # R50/b2048 — temps identical to the byte. The production-batch
        # temp inflation is backward activation scheduling, not gradient
        # collective choice (BENCH.md round 4, ZeRO section).
        updates, state = tx.update(updates, state, params)
        updates = jax.tree.map(
            jax.lax.with_sharding_constraint, updates, shardings
        )
        return updates, state

    return optax.GradientTransformation(init, update)


def pipe_constraint(x: jax.Array) -> jax.Array:
    """Pin a pipelined-trunk activation buffer (stage-major: dim 0 = pipeline
    stage, dim 1 = microbatch) to P(pipe, data) on the declared mesh.

    Called from model code (hvt.models.swinv2 pipe>1) so the stage dim of
    the state/shift buffers maps onto the pipe axis — the per-tick stage
    shift then lowers to an ICI collective-permute instead of a gather.
    No-op when no multi-device mesh with a real pipe axis is declared
    (single-device tests run the same math unsharded)."""
    mesh = declared_kernel_mesh()
    if mesh is None or pipe_size(mesh) <= 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(PIPE_AXIS, DATA_AXIS))
    )


def ep_constraint(x: jax.Array) -> jax.Array:
    """Pin an expert-major token buffer (dim 0 = expert, dim 1 = token
    group) to P(model, data): expert parallelism rides the ``model`` axis.
    GSPMD inserts the token all-to-alls at this boundary (the GShard
    lowering). No-op without a declared multi-device model axis."""
    mesh = declared_kernel_mesh()
    if mesh is None or int(mesh.shape.get(MODEL_AXIS, 1)) <= 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(MODEL_AXIS, DATA_AXIS))
    )


def broadcast_small_json(obj, world: int = 1, max_bytes: int = 65536):
    """Process-0 → all-processes broadcast of a small JSON-able object.

    The analog of the reference's ``dist.broadcast_object_list`` (reference
    monkey_patch.py:14-31 broadcasts the rank-0 wandb run's entity/project so
    every rank logs to one run). Rides the same collective fabric as training
    via multihost_utils; a single-process world returns the object as-is.
    """
    if world <= 1:
        return obj
    import json

    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        payload = json.dumps(obj).encode()
        if len(payload) > max_bytes:
            raise ValueError(f"object too large to broadcast ({len(payload)} bytes)")
        buf = np.zeros(max_bytes + 8, np.uint8)
        buf[:8] = np.frombuffer(np.int64(len(payload)).tobytes(), np.uint8)
        buf[8 : 8 + len(payload)] = np.frombuffer(payload, np.uint8)
    else:
        buf = np.zeros(max_bytes + 8, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int(np.frombuffer(out[:8].tobytes(), np.int64)[0])
    return json.loads(out[8 : 8 + n].tobytes().decode())


def prefetch_to_device(batch_iter, mesh: Mesh, depth: int = 2):
    """Yield (host_batch, device_arrays) with up to `depth` transfers running
    in a background thread.

    The double-buffered host-transfer step of SURVEY.md §7(8): device_put for
    the next batches overlaps the current step's compute. Runs the transfers
    on a worker thread because some PJRT backends block in device_put (the
    dev tunnel's H2D round trip is ~0.25 s).
    """
    import collections
    from concurrent.futures import ThreadPoolExecutor

    depth = max(1, depth)
    with ThreadPoolExecutor(1) as pool:
        queue: collections.deque = collections.deque()
        for batch in batch_iter:
            queue.append((batch, pool.submit(put_batch, mesh, batch)))
            if len(queue) >= depth:
                host, fut = queue.popleft()
                yield host, fut.result()
        while queue:
            host, fut = queue.popleft()
            yield host, fut.result()
