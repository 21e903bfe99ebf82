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

Resume granularity is the optimizer step: a checkpoint taken mid-epoch
resumes with the correct step count and schedules, but the interrupted
epoch restarts from its first batch (a few batches may be revisited; the
``max_duration`` step budget is still honored exactly).
"""

from __future__ import annotations

import math
import os
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
        self.log_interval = log_interval

        self.algos = algorithms_lib.parse_algorithms(config)

        # Data ------------------------------------------------------------
        self.train_loader, self.info = build_loader(config, is_train=True)
        self.eval_loader, eval_info = build_loader(config, is_train=False)
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
        if mesh_platform not in ("tpu", "axon") and "use_pallas" not in config.model.args:
            config = config_lib.loads(
                config_lib.to_dict(config), {"model": {"args": {"use_pallas": False}}}
            )
            self.config = config
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

        grad_accum = 1 if config.grad_accum == "auto" else int(config.grad_accum)
        self.prep = DevicePrep.from_config(config.train_dataset, config.precision)
        self.eval_prep = DevicePrep.from_config(config.eval_dataset, config.precision)
        self.settings = step_lib.StepSettings(
            num_classes=self.info.num_classes,
            smoothing=self.algos.label_smoothing,
            mixup_alpha=self.algos.mixup_alpha,
            cutmix_alpha=self.algos.cutmix_alpha,
            grad_accum=grad_accum,
            ema=self.algos.ema,
            sam_rho=self.algos.sam_rho,
            sam_interval=self.algos.sam_interval,
        )
        if self.algos.sam_rho is not None and grad_accum != 1:
            raise NotImplementedError("SAM with grad_accum > 1 is not supported")
        self.train_step = step_lib.build_train_step(
            self.model, self.objective, self.tx, self.prep, self.settings
        )
        self.eval_step = step_lib.build_eval_step(
            self.model, self.eval_prep, self.tree_dists
        )

        # State -----------------------------------------------------------
        self.state = self._init_state()
        if self.algos.pretrained_backbone is not None:
            uri, strict = self.algos.pretrained_backbone
            params = checkpoint_lib.load_pretrained_backbone(
                uri, jax.device_get(self.state.params), strict=strict
            )
            replicated = parallel.replicated(self.mesh)
            self.state = self.state.replace(
                params=jax.device_put(params, replicated)
            )

        # Checkpointing / logging -----------------------------------------
        save_folder = os.path.join(config.machine.save_root, config.run_name)
        self.checkpointer = checkpoint_lib.Checkpointer(
            os.path.join(save_folder, "checkpoints"),
            max_to_keep=config.save.num_checkpoints_to_keep,
        )
        if config.load_path:
            self.state = self.checkpointer_restore(config.load_path)
        self.logger = RunLogger(
            save_folder,
            config.run_name,
            rank=jax.process_index(),
            use_wandb=config.save.wandb,
            wandb_entity=config.wandb.entity,
            wandb_project=config.wandb.project,
            tags=list(config.tags),
        )
        self.logger.log_config(config_lib.to_yaml(config))
        self.speed = SpeedMonitor(window_size=50, num_chips=len(self.mesh.devices.flat))
        self.base_rng = jax.device_put(
            jax.random.key(config.seed), parallel.replicated(self.mesh)
        )

    # -- construction helpers -------------------------------------------

    def _init_state(self) -> state_lib.TrainState:
        crop = self.config.train_dataset.crop_size
        sample = jnp.zeros((2, crop, crop, 3), jnp.uint8)
        rng = jax.random.key(self.config.seed)

        def init():
            return state_lib.create(
                self.model, self.tx, rng, self.prep.normalize(sample),
                ema=self.algos.ema is not None,
            )

        replicated = parallel.replicated(self.mesh)
        return jax.jit(init, out_shardings=replicated)()

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

    def fit(self) -> dict[str, float]:
        """eval → train → final metrics (reference main.py:129-131)."""
        eval_metrics = self.evaluate()
        self.logger.log(int(self.state.step), eval_metrics, prefix="eval")
        if not self.config.is_train:
            return eval_metrics

        eval_every = schedule_lib.parse_duration(self.config.eval_interval)
        eval_every_ep = (
            max(1, int(eval_every.value)) if eval_every.unit == "ep" else 1
        )
        save_interval = self.config.save.interval
        save_every_ep = None
        if save_interval:
            dur = schedule_lib.parse_duration(save_interval)
            save_every_ep = max(1, int(round(dur.to_steps(self.steps_per_epoch)
                                             / self.steps_per_epoch)))

        step = int(self.state.step)
        start_epoch = step // self.steps_per_epoch
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
            prefetched = parallel.prefetch_to_device(
                self.train_loader.epoch(epoch), self.mesh,
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
                if step % self.log_interval == 0:
                    drain()
                    m = train_acc.compute()
                    m["lr"] = float(
                        self.config.optim.lr * self.lr_multiplier(step)
                    )
                    m["scale"] = scale
                    m.update(self.speed.metrics())
                    m.update(memory_stats())
                    self.logger.log(step, m, prefix="train")

            drain()
            epoch_metrics = train_acc.compute()
            train_acc.reset()
            self.logger.log(step, epoch_metrics, prefix="train-epoch")

            if (epoch + 1) % eval_every_ep == 0 or step >= self.total_steps:
                eval_metrics = self.evaluate()
                self.logger.log(step, eval_metrics, prefix="eval")

            if save_every_ep is not None and (epoch + 1) % save_every_ep == 0:
                self.checkpointer.save(step, self.state)

            if step >= self.total_steps:
                break

        # Always save the final state (utils.save_last_only analog,
        # reference utils.py:38-43).
        self.checkpointer.save(step, self.state)
        return eval_metrics

    def close(self):
        self.checkpointer.close()
        self.logger.close()
