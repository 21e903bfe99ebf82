"""The Trainer: owns the jit-compiled loop the reference delegates to Composer.

Assembles loaders, model, objective, optimizer, schedules, algorithms,
checkpointing and logging from a Config (the reference's main.py:36-131 does
the same assembly then calls composer.Trainer), and runs:

* an initial evaluation before training (reference main.py:129-131),
* epoch loop: host loader → batch-sharded device arrays (threaded prefetch,
  one pytree transfer per batch) → one compiled train step per
  progressive-resize bucket; metric partial sums accumulate on device and
  are fetched only at log/epoch boundaries,
* per-``eval_interval`` evaluation (EMA weights when EMA is on),
* periodic + last checkpoint saves, resume via ``load_path``.

Resume is exact to the batch (Composer semantics, reference main.py:118):
the batch order within an epoch is a pure function of (seed, epoch), so a
checkpoint taken mid-epoch resumes at the next batch of the interrupted
epoch and reproduces the uninterrupted run bit for bit.
"""

from __future__ import annotations

import math
import os
import signal
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hvt import config as config_lib
from hvt import metrics as metrics_lib
from hvt import objectives as objectives_lib
from hvt import parallel
from hvt.data import DevicePrep, build_loader
from hvt.models import build_model
from hvt.train import algorithms as algorithms_lib
from hvt.train import checkpoint as checkpoint_lib
from hvt.train import optim as optim_lib
from hvt.train import schedule as schedule_lib
from hvt.train import state as state_lib
from hvt.train import step as step_lib
from hvt.utils.logging import RunLogger, SpeedMonitor, memory_stats


class Trainer:
    def __init__(
        self,
        config: config_lib.Config,
        mesh: Optional[jax.sharding.Mesh] = None,
        log_interval: int = 50,
    ):
        config_lib.assert_no_override(config)
        self.config = config
        self.mesh = mesh if mesh is not None else parallel.make_mesh(config.mesh)
        # Declared before any tracing: Pallas kernel entry points wrap
        # themselves in shard_map over this mesh (GSPMD cannot partition
        # Mosaic custom calls — see hvt.parallel.shard_map_kernel).
        parallel.set_kernel_mesh(self.mesh)
        self.log_interval = log_interval

        self.algos = algorithms_lib.parse_algorithms(config)

        # Rank/world are derived from the mesh, not the default backend, so
        # a Trainer on a CPU mesh never initializes the process-default
        # (TPU) client — the multichip dry run must stay hermetic to CPU.
        mesh_devices = list(self.mesh.devices.flat)
        process_ids = {d.process_index for d in mesh_devices}
        self.world = len(process_ids)
        if self.world == 1:
            self.rank = next(iter(process_ids))
            self.local_devices = mesh_devices
        else:
            # Multi-host: jax.distributed is initialized, the backend is
            # live, and the process query is the source of truth.
            self.rank = jax.process_index()
            self.local_devices = [
                d for d in mesh_devices if d.process_index == self.rank
            ]

        # Data ------------------------------------------------------------
        self.train_loader, self.info = build_loader(
            config, is_train=True, process_index=self.rank, process_count=self.world
        )
        self.eval_loader, eval_info = build_loader(
            config, is_train=False, process_index=self.rank, process_count=self.world
        )
        self.steps_per_epoch = self.train_loader.batches_per_epoch
        self.tree_dists = eval_info.tree_dists

        # Durations / schedule -------------------------------------------
        self.total_steps = schedule_lib.parse_duration(config.max_duration).to_steps(
            self.steps_per_epoch
        )
        self.total_epochs = max(1, math.ceil(self.total_steps / self.steps_per_epoch))
        multiplier = schedule_lib.build_multiplier_schedule(
            config.scheduler, self.steps_per_epoch, self.total_steps
        )
        self.lr_multiplier = multiplier

        # Model / objective / optimizer ----------------------------------
        # Pallas kernels compile for the mesh's platform, not the process
        # default — on a non-TPU mesh (CPU dry runs/tests inside a
        # TPU-registered process) default them off unless explicitly set.
        mesh_platform = self.mesh.devices.flat[0].platform
        if (
            mesh_platform not in ("tpu", "axon")
            and config.model.name.startswith("swinv2")
            and "use_pallas" not in config.model.args
        ):
            config = config_lib.loads(
                config_lib.to_dict(config), {"model": {"args": {"use_pallas": False}}}
            )
            self.config = config
        # Fused block halves (hvt.ops.fused_halves_pallas): the production
        # SwinV2 path on TPU (measured wins in BENCH.md); defaulted on for
        # TPU meshes, off elsewhere (interpret mode is test-only).
        if (
            mesh_platform in ("tpu", "axon")
            and config.model.name.startswith("swinv2")
            and "fuse" not in config.model.args
            and parallel.pipe_size(self.mesh) == 1
        ):
            config = config_lib.loads(
                config_lib.to_dict(config), {"model": {"args": {"fuse": True}}}
            )
            self.config = config
        # Pipeline parallelism: the mesh's pipe axis decides the model's
        # pipeline split; inject it (and the plain-XLA lowering it requires —
        # Mosaic calls cannot be GSPMD-partitioned over the vmapped stage
        # dim, hvt.parallel.kernel_mesh) so configs only say mesh: {pipe: N}.
        pipe = parallel.pipe_size(self.mesh)
        if pipe > 1:
            if not config.model.name.startswith("swinv2"):
                raise ValueError(
                    "mesh.pipe > 1 pipelines the SwinV2 deep trunk; conv "
                    "families have no homogeneous stage to pipeline — use "
                    "data/spatial parallelism for ResNet."
                )
            if config.model.args.get("fuse") or config.model.args.get("use_pallas"):
                raise ValueError(
                    "mesh.pipe > 1 requires the plain-XLA lowering: remove "
                    "model.args {fuse: true, use_pallas: true}"
                )
            config = config_lib.loads(
                config_lib.to_dict(config),
                {"model": {"args": {
                    "pipe": pipe, "use_pallas": False, "fuse": False,
                }}},
            )
            self.config = config
        # Expert parallelism shards the (E, ...) expert-weight dim over the
        # model axis; a non-divisible expert count would otherwise surface
        # as an opaque GSPMD divisibility error deep inside jit at init.
        moe_experts = int(config.model.args.get("moe_experts", 0) or 0)
        model_axis = self.mesh.shape.get(parallel.MODEL_AXIS, 1)
        if moe_experts and model_axis > 1 and moe_experts % model_axis:
            raise ValueError(
                f"model.args.moe_experts={moe_experts} must be divisible by "
                f"the mesh's model-axis size {model_axis} (expert weights "
                f"shard their expert dim over that axis)"
            )
        self.model = build_model(config, self.info.num_classes)
        class_names = getattr(self.train_loader.dataset, "classes", None)
        self.objective = objectives_lib.build_objective(config, self.info, class_names)
        no_decay = getattr(self.model, "no_weight_decay_substrings", ())
        self.tx = optim_lib.build_optimizer(
            config.optim,
            multiplier,
            grad_clip_norm=self.algos.grad_clip_norm,
            no_decay_substrings=no_decay,
        )

        self.prep = DevicePrep.from_config(config.train_dataset, config.precision)
        self.eval_prep = DevicePrep.from_config(config.eval_dataset, config.precision)

        def make_settings(accum: int) -> step_lib.StepSettings:
            return step_lib.StepSettings(
                num_classes=self.info.num_classes,
                smoothing=self.algos.label_smoothing,
                mixup_alpha=self.algos.mixup_alpha,
                cutmix_alpha=self.algos.cutmix_alpha,
                grad_accum=accum,
                ema=self.algos.ema,
                sam_rho=self.algos.sam_rho,
                sam_interval=self.algos.sam_interval,
                randaugment=self.algos.randaugment_device,
                colout=self.algos.colout_device,
            )

        if config.grad_accum == "auto":
            grad_accum = self._resolve_auto_grad_accum(make_settings)
        else:
            grad_accum = int(config.grad_accum)
        self.settings = make_settings(grad_accum)
        # ZeRO-1 (mesh.zero): the sharded-update contract. Constrain the
        # optimizer's update tree to the opt-state layout (otherwise GSPMD
        # all-gathers mu/nu and computes the update replicated — measured
        # +0.7-4.3 GiB of temps per device, parallel.zero_update_shardings)
        # and pin the step's output state to the init-time layout so the
        # state's shardings are stable step-to-step (no second executable,
        # donation aliases).
        out_state_shardings = None
        zero = bool(getattr(config.mesh, "zero", False)) and (
            self.mesh.shape.get(parallel.DATA_AXIS, 1) > 1
        )
        if zero:
            abs_state = jax.eval_shape(self._make_init_fn())
            out_state_shardings = parallel.tp_shardings(
                self.mesh, abs_state, zero=True
            )
            self.tx = parallel.constrain_tx_updates(
                self.tx,
                parallel.zero_update_shardings(self.mesh, abs_state.params),
            )
        self.train_step = step_lib.build_train_step(
            self.model, self.objective, self.tx, self.prep, self.settings,
            out_state_shardings=out_state_shardings,
        )
        self.eval_step = step_lib.build_eval_step(
            self.model, self.eval_prep, self.tree_dists
        )

        # State -----------------------------------------------------------
        self.state = self._init_state()
        if self.algos.pretrained_backbone is not None:
            uri, strict = self.algos.pretrained_backbone
            params, batch_stats = checkpoint_lib.load_pretrained(
                uri,
                jax.device_get(self.state.params),
                jax.device_get(self.state.batch_stats),
                strict=strict,
            )
            shardings = jax.tree.map(lambda a: a.sharding, self.state.params)
            replace = {"params": jax.device_put(params, shardings)}
            if batch_stats:
                bs_shardings = jax.tree.map(
                    lambda a: a.sharding, self.state.batch_stats
                )
                replace["batch_stats"] = jax.device_put(batch_stats, bs_shardings)
            self.state = self.state.replace(**replace)

        # Checkpointing / logging -----------------------------------------
        save_folder = os.path.join(config.machine.save_root, config.run_name)
        self.checkpointer = checkpoint_lib.Checkpointer(
            os.path.join(save_folder, "checkpoints"),
            max_to_keep=config.save.num_checkpoints_to_keep,
        )
        if config.load_path:
            self.state = self.checkpointer_restore(config.load_path)
        elif config.auto_resume and self.checkpointer.latest_step() is not None:
            # Idempotent re-submission: pick up this run's own latest
            # checkpoint (exact mid-epoch resume semantics, same as
            # load_path pointing at our checkpoints dir).
            step = self.checkpointer.latest_step()
            self.state = self.checkpointer.restore(self.state, step)
            print(f"[{config.run_name}] auto-resumed from step {step}")
        self.logger = RunLogger(
            save_folder,
            config.run_name,
            rank=self.rank,
            use_wandb=config.save.wandb,
            wandb_entity=config.wandb.entity,
            wandb_project=config.wandb.project,
            tags=list(config.tags),
            world=self.world,
        )
        self.logger.log_config(config_lib.to_yaml(config))
        self.speed = SpeedMonitor(window_size=50, num_chips=len(self.mesh.devices.flat))
        # Built inside jit so the key materializes directly on the mesh's
        # devices — never as an eager op on the process-default backend.
        seed = int(config.seed)
        self.base_rng = jax.jit(
            lambda: jax.random.key(seed),
            out_shardings=parallel.replicated(self.mesh),
        )()

    # -- construction helpers -------------------------------------------

    def _resolve_auto_grad_accum(self, make_settings) -> int:
        """Static memory-aware microbatching (the reference's Composer
        grad_accum "auto", main.py:38-41): lower candidate steps, read XLA's
        compile-time memory analysis, double until the program fits."""
        from hvt.train import microbatch

        gbs = int(self.config.train_dataset.global_batch_size)
        crop = int(self.config.train_dataset.crop_size)
        limit = microbatch.device_bytes_limit(self.mesh.devices.flat[0])
        if limit is None:
            return microbatch.choose_grad_accum(lambda a: None, gbs, None)

        sharded = parallel.batch_sharding(self.mesh)
        repl = parallel.replicated(self.mesh)

        def sds(shape, dtype, sharding):
            return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

        if isinstance(self.info.num_classes, tuple):
            labels = sds((gbs, len(self.info.num_classes)), jnp.int32, sharded)
        else:
            labels = sds((gbs,), jnp.int32, sharded)
        images = sds((gbs, crop, crop, 3), jnp.uint8,
                     parallel.image_sharding(self.mesh))
        mask = sds((gbs,), jnp.float32, sharded)
        key_shape = jax.eval_shape(lambda: jax.random.key(0))
        rng = sds(key_shape.shape, key_shape.dtype, repl)
        state_abs = jax.tree.map(
            lambda s: sds(s.shape, s.dtype, repl),
            jax.eval_shape(self._make_init_fn()),
        )

        def measure(accum: int):
            step = step_lib.build_train_step(
                self.model, self.objective, self.tx, self.prep,
                make_settings(accum),
            )
            lowered = step.lower(state_abs, images, labels, mask, rng, scale=1.0)
            try:
                compiled = lowered.compile()
            except Exception as e:
                # Some backends reject over-HBM programs at compile time
                # instead of reporting a size — that IS the answer.
                if any(s in str(e).lower() for s in
                       ("out of memory", "resource exhausted", "oom",
                        "exceeds the limit", "allocation")):
                    return float("inf")
                raise
            return microbatch.required_bytes(compiled)

        return microbatch.choose_grad_accum(measure, gbs, limit)

    def _make_init_fn(self):
        crop = self.config.train_dataset.crop_size
        seed = int(self.config.seed)

        def init():
            # Sample + rng are created inside the traced function so they
            # exist only as constants of the mesh-targeted executable (no
            # eager allocation on the process-default backend).
            sample = jnp.zeros((2, crop, crop, 3), jnp.uint8)
            rng = jax.random.key(seed)
            return state_lib.create(
                self.model, self.tx, rng, self.prep.normalize(sample),
                ema=self.algos.ema is not None,
            )

        return init

    def _init_state(self) -> state_lib.TrainState:
        init = self._make_init_fn()
        tp = self.mesh.shape.get(parallel.MODEL_AXIS, 1) > 1
        pipe = parallel.pipe_size(self.mesh) > 1
        zero = bool(getattr(self.config.mesh, "zero", False)) and (
            self.mesh.shape.get(parallel.DATA_AXIS, 1) > 1
        )
        if tp or zero or pipe:
            # Tensor parallelism: rule-matched parameters (and their
            # optimizer/EMA mirrors) shard over the model axis; XLA
            # partitions the matmuls and inserts the collectives.
            # Pipeline parallelism: the stacked pipe_trunk params (and
            # mirrors) shard their stage dim over the pipe axis.
            # ZeRO-1 (mesh.zero): optimizer state shards over the data
            # axis — see parallel.tp_shardings.
            out = parallel.tp_shardings(
                self.mesh, jax.eval_shape(init), zero=zero
            )
            return jax.jit(init, out_shardings=out)()
        return jax.jit(init, out_shardings=parallel.replicated(self.mesh))()

    def _save_checkpoint(self, step: int) -> None:
        """Save + (optionally) upload the checkpoint as a wandb artifact with
        the reference's ``latest``/``ep{N}-ba{M}`` aliases (reference
        monkey_patch.py:33-91). Upload is a clean no-op without wandb."""
        self.checkpointer.save(step, self.state)
        if self.config.save.wandb:
            # The artifact upload reads the files from disk — join the
            # (otherwise background) write first.
            self.checkpointer.wait()
            epoch = step // self.steps_per_epoch
            self.logger.log_artifact(
                self.checkpointer.directory / str(step),
                name=f"{self.config.run_name}-checkpoints",
                aliases=["latest", f"ep{epoch}-ba{step}"],
                metadata={"step": step, "epoch": epoch},
            )

    def checkpointer_restore(self, load_path: str) -> state_lib.TrainState:
        path, step = checkpoint_lib.parse_checkpoint_uri(load_path)
        ckpt = checkpoint_lib.Checkpointer(path)
        state = ckpt.restore(self.state, step)
        ckpt.close()
        return state

    # -- evaluation -------------------------------------------------------

    def evaluate(self) -> dict[str, float]:
        acc = metrics_lib.MetricAccumulator()
        params = self.state.eval_params
        batch_stats = self.state.eval_batch_stats
        dev_sums = None
        prefetched = parallel.prefetch_to_device(
            self.eval_loader.epoch(0), self.mesh,
            depth=self.config.loader.prefetch_batches,
        )
        for _batch, (images, labels, mask) in prefetched:
            stats = self.eval_step(params, batch_stats, images, labels, mask)
            dev_sums = (
                stats if dev_sums is None
                else jax.tree.map(jnp.add, dev_sums, stats)
            )
        if dev_sums is not None:
            acc.update(jax.device_get(dev_sums))
        return acc.compute()

    # -- training ---------------------------------------------------------

    def _scale_for_step(self, step: int) -> float:
        if self.algos.progressive is None:
            return 1.0
        return self.algos.progressive.scale_at(step / max(self.total_steps, 1))

    def request_preempt(self) -> None:
        """Ask the loop to checkpoint and exit at the next step boundary.

        Called by the SIGTERM handler ``fit`` installs (preemptible TPU VMs
        and SLURM both deliver SIGTERM ahead of the kill); safe to call from
        any thread. Beyond parity: the reference's failure recovery is
        manual resubmission only (SURVEY §5 — "none").
        """
        self._preempted = True

    def fit(self) -> dict[str, float]:
        """eval → train → final metrics (reference main.py:129-131)."""
        eval_metrics = self.evaluate()
        self.logger.log(int(self.state.step), eval_metrics, prefix="eval")
        if not self.config.is_train:
            return eval_metrics

        # Preemption-safe training: on SIGTERM, finish the in-flight step,
        # save a checkpoint, and return cleanly — an idempotent resubmission
        # with ``auto_resume: true`` then continues mid-epoch, bitwise-exactly
        # (the same guarantee as the resume test). The handler only sets a
        # flag; all work happens at the next step boundary in this thread.
        # Restoration is in a finally so a raising run (OOM, bad batch) does
        # not leave a flag-setting lambda swallowing the scheduler's SIGTERM;
        # a C-level prior handler reads back as None → restore SIG_DFL.
        self._preempted = False
        installed = threading.current_thread() is threading.main_thread()
        prev_sigterm = None
        if installed:
            prev_sigterm = signal.signal(
                signal.SIGTERM, lambda _sig, _frame: self.request_preempt()
            )
        try:
            return self._fit_loop(eval_metrics)
        finally:
            if installed:
                signal.signal(
                    signal.SIGTERM,
                    prev_sigterm if prev_sigterm is not None else signal.SIG_DFL,
                )

    def _fit_loop(self, eval_metrics) -> dict[str, float]:
        # eval_interval honors the full Composer time grammar: "Nep" at epoch
        # boundaries, "Nba" every N optimizer steps, "Fdur" as a fraction of
        # max_duration (reference main.py:109 passes it straight to Composer).
        eval_every = schedule_lib.parse_duration(self.config.eval_interval)
        eval_every_ep: Optional[int] = None
        eval_every_ba: Optional[int] = None
        if eval_every.unit == "ep":
            eval_every_ep = max(1, int(eval_every.value))
        else:
            eval_every_ba = max(
                1, eval_every.to_steps(self.steps_per_epoch, self.total_steps)
            )
        save_interval = self.config.save.interval
        save_every_ep: Optional[int] = None
        save_every_ba: Optional[int] = None
        if save_interval:
            dur = schedule_lib.parse_duration(save_interval)
            if dur.unit == "ep":
                save_every_ep = max(1, int(dur.value))
            else:
                save_every_ba = max(
                    1, dur.to_steps(self.steps_per_epoch, self.total_steps)
                )

        step = int(self.state.step)
        start_epoch = step // self.steps_per_epoch
        # Exact mid-epoch resume (Composer resumes at the batch, reference
        # main.py:118): the interrupted epoch continues at the next batch of
        # its deterministic (seed, epoch) order.
        resume_offset = step % self.steps_per_epoch
        last_eval_step = -1
        train_acc = metrics_lib.MetricAccumulator()

        # Per-batch stats stay on device and accumulate asynchronously; they
        # are fetched only at log/epoch boundaries. Fetching per step would
        # force a host sync every step (~20% throughput on the dev chip).
        dev_sums = None

        def drain():
            nonlocal dev_sums
            if dev_sums is not None:
                train_acc.update(jax.device_get(dev_sums))
                dev_sums = None

        # Optional jax.profiler trace (SURVEY.md §5 tracing): set
        # HVT_PROFILE_DIR and HVT_PROFILE_STEPS="start:stop".
        profile_dir = os.environ.get("HVT_PROFILE_DIR")
        prof_start = prof_stop = -1
        if profile_dir:
            lo, _, hi = os.environ.get("HVT_PROFILE_STEPS", "5:10").partition(":")
            prof_start, prof_stop = int(lo), int(hi or int(lo) + 5)

        for epoch in range(start_epoch, self.total_epochs):
            skip = resume_offset if epoch == start_epoch else 0
            prefetched = parallel.prefetch_to_device(
                self.train_loader.epoch(epoch, start_batch=skip), self.mesh,
                depth=self.config.loader.prefetch_batches,
            )
            for batch, (images, labels, mask) in prefetched:
                if step >= self.total_steps:
                    break
                if step == prof_start:
                    jax.profiler.start_trace(profile_dir)
                scale = self._scale_for_step(step)
                self.state, stats = self.train_step(
                    self.state, images, labels, mask, self.base_rng, scale=scale
                )
                dev_sums = (
                    stats if dev_sums is None
                    else jax.tree.map(jnp.add, dev_sums, stats)
                )
                # valid-sample count is known host-side — no device sync
                self.speed.batch_end(int(batch.mask.sum()))
                step += 1
                if step == prof_stop:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                if self._preempted:
                    break
                if eval_every_ba is not None and step % eval_every_ba == 0:
                    eval_metrics = self.evaluate()
                    self.logger.log(step, eval_metrics, prefix="eval")
                    last_eval_step = step
                if save_every_ba is not None and step % save_every_ba == 0:
                    self._save_checkpoint(step)
                if step % self.log_interval == 0:
                    drain()
                    m = train_acc.compute()
                    m["lr"] = float(
                        self.config.optim.lr * self.lr_multiplier(step)
                    )
                    m["scale"] = scale
                    m.update(self.speed.metrics())
                    m.update(memory_stats(self.local_devices))
                    self.logger.log(step, m, prefix="train")

            if self._preempted:
                break
            drain()
            epoch_metrics = train_acc.compute()
            train_acc.reset()
            self.logger.log(step, epoch_metrics, prefix="train-epoch")

            due_ep = eval_every_ep is not None and (epoch + 1) % eval_every_ep == 0
            if (due_ep or step >= self.total_steps) and last_eval_step != step:
                eval_metrics = self.evaluate()
                self.logger.log(step, eval_metrics, prefix="eval")
                last_eval_step = step

            if save_every_ep is not None and (epoch + 1) % save_every_ep == 0:
                self._save_checkpoint(step)

            if step >= self.total_steps:
                break

        if self._preempted:
            drain()
            print(
                f"[{self.config.run_name}] preempted (SIGTERM): "
                f"checkpointing at step {step} and exiting cleanly"
            )
        # Always save the final state (utils.save_last_only analog,
        # reference utils.py:38-43); on preemption this is the resume point.
        self._save_checkpoint(step)
        return eval_metrics

    def close(self):
        self.checkpointer.close()
        self.logger.close()
