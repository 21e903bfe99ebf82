"""Algorithm registry: Composer event-hook algorithms → pure settings.

The reference instantiates Composer Algorithm classes by name
(reference main.py:98-102, algorithmic.py:24-32) and lets an event system
apply them. In a jit-compiled world each "algorithm" is either a model flag,
an input-pipeline knob, or a term fused into the train step — so parsing the
config list yields a plain settings struct consumed by the builders.

Every algorithm the reference's configs/recipes name is accepted
(BlurPool, ChannelsLast, EMA, GradientClipping, ProgressiveResizing,
LabelSmoothing, PretrainedBackbone, MixUp, SAM, ColOut, RandAugment,
StochasticDepth) — including the recipe-only ones that would crash the
reference's ``getattr`` registry (SURVEY.md §2.4 quirk 2).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

from hvt.train import ema as ema_lib
from hvt.train.schedule import parse_duration

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class ProgressiveResizing:
    """Composer semantics (configs/pretrain/inat21.yaml:38-42): hold
    initial_scale for delay_fraction of training, ramp linearly to 1.0,
    then train at full size for the last finetune_fraction."""

    initial_scale: float = 0.5
    delay_fraction: float = 0.4
    finetune_fraction: float = 0.2
    num_buckets: int = 4  # quantized scales → bounded recompilation

    def scale_at(self, frac_of_training: float) -> float:
        t = frac_of_training
        if t < self.delay_fraction:
            s = self.initial_scale
        elif t > 1.0 - self.finetune_fraction:
            s = 1.0
        else:
            ramp = (t - self.delay_fraction) / max(
                1.0 - self.finetune_fraction - self.delay_fraction, 1e-9
            )
            s = self.initial_scale + ramp * (1.0 - self.initial_scale)
        # Quantize to num_buckets steps between initial_scale and 1.0.
        width = (1.0 - self.initial_scale) / self.num_buckets
        if width <= 0:
            return 1.0
        k = round((s - self.initial_scale) / width)
        return min(1.0, self.initial_scale + k * width)


@dataclasses.dataclass
class AlgorithmSettings:
    blurpool: bool = False
    channels_last: bool = False  # NHWC is native on TPU; accepted as a no-op
    ema: Optional[ema_lib.EmaConfig] = None
    label_smoothing: float = 0.0
    grad_clip_norm: Optional[float] = None
    progressive: Optional[ProgressiveResizing] = None
    mixup_alpha: Optional[float] = None
    cutmix_alpha: Optional[float] = None
    sam_rho: Optional[float] = None
    sam_interval: int = 1
    stochastic_depth_rate: Optional[float] = None
    # (checkpoint URI, strict) — applied at init, after model construction,
    # mirroring the reference's algorithm-pass ordering (algorithmic.py:49-57).
    pretrained_backbone: Optional[tuple[str, bool]] = None
    # RandAugment (and host-mode ColOut) are consumed by the input pipeline
    # (hvt.data.loader.build_transform reads them from the raw config).
    # ColOut with args.device=true runs inside the compiled step instead
    # (hvt.data.device.colout) — (p_row, p_col) when device-side.
    colout_device: Optional[tuple[float, float]] = None
    # RandAugment with args.device=true runs inside the compiled step too
    # (hvt.data.randaugment.rand_augment) — (depth, severity, stratified)
    # when device-side; the host transform then delivers bare crops.
    # stratified=true (default) is the TPU-fast static-slice policy;
    # stratified=false restores iid per-sample op draws.
    randaugment_device: Optional[tuple[int, int, bool]] = None


def parse_algorithms(config) -> AlgorithmSettings:
    s = AlgorithmSettings()
    for algo in config.algorithms:
        cls, args = algo.cls, dict(algo.args)
        if cls == "BlurPool":
            s.blurpool = True
        elif cls == "ChannelsLast":
            s.channels_last = True
        elif cls == "EMA":
            s.ema = ema_lib.EmaConfig.from_args(args)
        elif cls == "LabelSmoothing":
            s.label_smoothing = float(args.get("smoothing", 0.1))
        elif cls == "GradientClipping":
            ctype = args.get("clipping_type", "norm")
            if ctype != "norm":
                raise ValueError(f"unsupported clipping_type {ctype!r}")
            s.grad_clip_norm = float(args.get("clipping_threshold", 1.0))
        elif cls == "ProgressiveResizing":
            s.progressive = ProgressiveResizing(
                initial_scale=float(args.get("initial_scale", 0.5)),
                delay_fraction=float(args.get("delay_fraction", 0.4)),
                finetune_fraction=float(args.get("finetune_fraction", 0.2)),
            )
        elif cls == "MixUp":
            s.mixup_alpha = float(args.get("alpha", 0.2))
        elif cls == "CutMix":
            s.cutmix_alpha = float(args.get("alpha", 1.0))
        elif cls == "SAM":
            s.sam_rho = float(args.get("rho", 0.05))
            s.sam_interval = int(args.get("interval", 1))
        elif cls == "StochasticDepth":
            s.stochastic_depth_rate = float(args.get("drop_rate", 0.1))
        elif cls == "PretrainedBackbone":
            s.pretrained_backbone = (
                str(args["checkpoint"]),
                bool(args.get("strict", False)),
            )
        elif cls == "ColOut":
            if bool(args.get("device", False)):
                s.colout_device = (
                    float(args.get("p_row", 0.05)),
                    float(args.get("p_col", 0.05)),
                )
            # else host-side: consumed by hvt.data.loader.build_transform
        elif cls == "RandAugment":
            if bool(args.get("device", False)):
                depth = int(args.get("depth", 1))
                # depth 0 must be a true no-op (like the host path's
                # ra_depth=0) — not a truthy setting that still splits rng.
                if depth > 0:
                    s.randaugment_device = (
                        depth,
                        int(args.get("severity", 9)),
                        bool(args.get("stratified", True)),
                    )
            # else host-side: consumed by hvt.data.loader.build_transform
        else:
            raise ValueError(f"unknown algorithm {cls!r}")
    return s
