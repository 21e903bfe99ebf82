"""Throughput benchmark: images/sec/chip on BOTH headline pretrain steps.

Measures the jit-compiled training step for the two north-star workloads
(BASELINE.md: "SwinV2-T & R50 iNat21 pretrain"):

* ResNet-50, iNat21 recipe — bf16, DecoupledSGDW, label smoothing, EMA,
  grad clipping (reference configs/pretrain/inat21.yaml),
* SwinV2-Tiny, 224x224 window-7 — bf16, DecoupledAdamW, label smoothing,
  grad clipping (the reference's flagship vendored model,
  reference swinv2.py:673-867).

Both use device-resident synthetic data (global batch sharded over all local
chips), isolating chip throughput from host input — the north-star metric is
input-bound images/sec/chip.

Prints exactly one JSON line. The top-level value stays the R50 number (so it
is comparable round to round); the "workloads" map carries both models:
    {"metric": "...", "value": N, "unit": "images/sec/chip",
     "vs_baseline": N, "workloads": {"resnet50": {...}, "swinv2_tiny": {...}}}

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against **synthetic anchors**: fixed constants chosen to represent one
reference-class GPU (the reference trains on A100-class nodes,
slurm/train.bash:2-7), not citations of a specific published run.
* 3023 img/s for ResNet-50 — the scale of per-A100 throughput in MLPerf v2.x
  ResNet-50 closed-division submissions (8×A100-SXM4-80GB nodes, mixed
  precision, LARS batch ~408/GPU; per-GPU ≈ 2.8-3.2k img/s).
* 760 img/s for SwinV2-Tiny — the scale of timm's benchmark.py train
  throughput for swinv2_tiny_window8_256-class models on one A100 (AMP +
  channels-last; published timm CSVs put swin-tiny-sized models at
  ~700-800 img/s train).
Neither anchor is reproducible to the digit from a citation (zero-egress
image; exact numbers vary by submission/config), so treat vs_baseline as a
stable round-over-round scale, not a claim about a specific A100 run —
BENCH.md "Comparison points" records this. value/vs_baseline > 1 means one
TPU chip outpaces one reference-class GPU.

Each workload is measured over HVT_BENCH_WINDOWS (default 3) windows of
HVT_BENCH_STEPS steps; the JSON carries min/median/max so round-over-round
deltas can be read against the noise floor. The headline value is the median.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Fixed comparison points (see module docstring).
A100_R50_IMAGES_PER_SEC = 3023.0
A100_SWINV2_TINY_IMAGES_PER_SEC = 760.0

IMAGE_SIZE = int(os.environ.get("HVT_BENCH_IMAGE_SIZE", 224))
NUM_CLASSES = 10000  # iNat21
WARMUP_STEPS = 5
MEASURE_STEPS = int(os.environ.get("HVT_BENCH_STEPS", 50))
# Repeat the measured window so every reported number carries a spread —
# round-over-round deltas are only meaningful against the noise floor.
MEASURE_WINDOWS = int(os.environ.get("HVT_BENCH_WINDOWS", 3))


def measure(cfg_overrides: dict, batch_per_chip: int,
            image_size: int = None) -> list[float]:
    """Build the full train step for one workload and time it.

    Timing uses a host fetch of a loss value data-dependent on every step
    (states chain via donation) as the barrier — jax.block_until_ready is
    unreliable on the experimental axon runtime (returns before device
    completion).
    """
    from hvt import config as config_lib
    from hvt import objectives, parallel
    from hvt.data import DevicePrep
    from hvt.models import build_model
    from hvt.train import optim as optim_lib
    from hvt.train import schedule as schedule_lib
    from hvt.train import state as state_lib
    from hvt.train import step as step_lib
    from hvt.train.algorithms import parse_algorithms

    n_chips = jax.device_count()
    batch = batch_per_chip * n_chips
    image_size = IMAGE_SIZE if image_size is None else image_size

    cfg = config_lib.loads(cfg_overrides)
    algos = parse_algorithms(cfg)
    mesh = parallel.make_mesh(cfg.mesh)
    parallel.set_kernel_mesh(mesh)
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
    model = build_model(cfg, NUM_CLASSES)

    mult = schedule_lib.cosine_with_warmup(100, 10_000, 0.0)
    no_decay = getattr(model, "no_weight_decay_substrings", ())
    tx = optim_lib.build_optimizer(
        cfg.optim, mult, grad_clip_norm=algos.grad_clip_norm,
        no_decay_substrings=no_decay,
    )
    # Mirror the Trainer's settings construction (hvt/train/loop.py) so
    # recipe workloads (mixup/SAM/device augmentation) measure the real
    # compiled step, not a subset.
    settings = step_lib.StepSettings(
        num_classes=NUM_CLASSES, smoothing=algos.label_smoothing,
        mixup_alpha=algos.mixup_alpha, cutmix_alpha=algos.cutmix_alpha,
        ema=algos.ema, sam_rho=algos.sam_rho, sam_interval=algos.sam_interval,
        randaugment=algos.randaugment_device, colout=algos.colout_device,
    )
    objective = (
        objectives.binary_cross_entropy
        if cfg.model.loss_name == "binary_cross_entropy"
        else objectives.soft_cross_entropy
    )
    train_step = step_lib.build_train_step(model, objective, tx, prep, settings)

    replicated = parallel.replicated(mesh)
    sharded = parallel.batch_sharding(mesh)

    state = jax.jit(
        lambda: state_lib.create(
            model, tx, jax.random.key(0),
            prep.normalize(jnp.zeros((2, image_size, image_size, 3), jnp.uint8)),
            ema=algos.ema is not None,
        ),
        out_shardings=replicated,
    )()

    host_images = np.random.default_rng(0).integers(
        0, 256, (batch, image_size, image_size, 3), dtype=np.uint8
    )
    host_labels = np.random.default_rng(1).integers(
        0, NUM_CLASSES, (batch,), dtype=np.int32
    )
    images = jax.device_put(host_images, sharded)
    labels = jax.device_put(host_labels, sharded)
    mask = jax.device_put(np.ones((batch,), np.float32), sharded)
    base_rng = jax.jit(
        lambda: jax.random.key(0), out_shardings=replicated
    )()

    for _ in range(WARMUP_STEPS):
        state, stats = train_step(state, images, labels, mask, base_rng, scale=1.0)
    float(stats["loss_sum"])  # true barrier (see docstring)

    rates = []
    for _ in range(MEASURE_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            state, stats = train_step(state, images, labels, mask, base_rng, scale=1.0)
        float(stats["loss_sum"])
        elapsed = time.perf_counter() - t0
        rates.append(MEASURE_STEPS * batch / elapsed / n_chips)

    # Drop device references so the next workload starts with free HBM.
    del state, stats, images, labels, mask, base_rng
    return rates


def _summarize(rates: list[float], baseline, batch_per_chip: int) -> dict:
    med = float(np.median(rates))
    out = {
        "value": round(med, 2),
        "batch_per_chip": batch_per_chip,
        "spread": {
            "min": round(min(rates), 2),
            "median": round(med, 2),
            "max": round(max(rates), 2),
            "windows": len(rates),
            "steps_per_window": MEASURE_STEPS,
        },
    }
    if baseline is not None:
        out["vs_baseline"] = round(med / baseline, 4)
    return out


def measure_eval(model_name: str, model_args: dict, batch_per_chip: int) -> list[float]:
    """Eval-forward (inference/serving) throughput for one workload."""
    from hvt import config as config_lib
    from hvt import parallel
    from hvt.data import DevicePrep
    from hvt.models import build_model
    from hvt.train import step as step_lib

    n_chips = jax.device_count()
    batch = batch_per_chip * n_chips
    cfg = config_lib.loads({"model": {"name": model_name, "args": model_args}})
    mesh = parallel.make_mesh(cfg.mesh)
    parallel.set_kernel_mesh(mesh)
    prep = DevicePrep.from_config(cfg.eval_dataset, cfg.precision)
    model = build_model(cfg, NUM_CLASSES)
    variables = jax.jit(
        lambda: model.init(
            jax.random.key(0),
            prep.normalize(jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.uint8)),
            train=False,
        ),
        out_shardings=parallel.replicated(mesh),
    )()
    eval_step = step_lib.build_eval_step(model, prep)
    sharded = parallel.batch_sharding(mesh)
    images = jax.device_put(
        np.random.default_rng(0).integers(
            0, 256, (batch, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.uint8
        ),
        sharded,
    )
    labels = jax.device_put(np.zeros((batch,), np.int32), sharded)
    mask = jax.device_put(np.ones((batch,), np.float32), sharded)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    for _ in range(WARMUP_STEPS):
        stats = eval_step(params, batch_stats, images, labels, mask)
    float(stats["ce_sum"])
    rates = []
    for _ in range(MEASURE_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            stats = eval_step(params, batch_stats, images, labels, mask)
        float(stats["ce_sum"])
        rates.append(MEASURE_STEPS * batch / (time.perf_counter() - t0) / n_chips)
    del params, batch_stats, images, labels, mask
    return rates


def measure_artifact(model_name: str, batch_per_chip: int,
                     native: bool = False,
                     quantize: "str | None" = None,
                     calibrate: int = 0) -> list[float]:
    """Serving-artifact throughput (jax.export StableHLO, weights baked in —
    hvt/tools/export_serving.py). Measures the deployed-serving path rather
    than the live eval step. ``native`` measures the matched-TPU artifact
    (fused Pallas kernels embedded, static batch) instead of the portable
    plain-XLA one; ``quantize="int8"`` measures the w8a8 dynamic-PTQ
    artifact (hvt/ops/quant.py — int8 rides the MXU at 2x the bf16 rate)."""
    from hvt import config as config_lib
    from hvt.tools import export_serving

    cfg = config_lib.loads({
        "run_name": "bench-artifact",
        "model": {"name": model_name},
        "machine": {"save_root": "/tmp/hvt-runs"},
        "eval_dataset": {"source": "synthetic",
                         "synthetic_num_classes": NUM_CLASSES,
                         "synthetic_num_samples": 16,
                         "crop_size": IMAGE_SIZE,
                         "global_batch_size": 16},
        "loader": {"num_workers": 1, "prefetch_batches": 1},
    })
    platform = jax.devices()[0].platform
    exported, _ = export_serving.build_exported(
        cfg,
        batch=(batch_per_chip * jax.device_count()) if native else 0,
        platforms=(platform,),
        native=native,
        quantize=quantize,
        calibrate=calibrate,
    )
    call = jax.jit(lambda x: exported.call(x))
    n_chips = jax.device_count()
    batch = batch_per_chip * n_chips
    images = jax.device_put(np.random.default_rng(0).integers(
        0, 256, (batch, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.uint8))

    def fine(out):
        return out[-1] if isinstance(out, tuple) else out

    for _ in range(WARMUP_STEPS):
        out = call(images)
    float(fine(out).astype(jnp.float32).sum())  # true barrier (axon)
    rates = []
    for _ in range(MEASURE_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            out = call(images)
        float(fine(out).astype(jnp.float32).sum())
        rates.append(MEASURE_STEPS * batch / (time.perf_counter() - t0) / n_chips)
    del images, out
    return rates


def main():
    from hvt.utils import compile_cache

    compile_cache.enable()
    r50_batch = int(os.environ.get("HVT_BENCH_BATCH", 256))
    # 128/chip measured fastest (64: 716, 128: 743, 256: 722 img/s on the
    # dev chip) and matches the reference's 2048 global batch on a 16-chip
    # slice.
    swin_batch = int(os.environ.get("HVT_BENCH_SWIN_BATCH", 128))

    # Space-to-depth stem: same math, denser MXU tiling, checkpoint-
    # compatible params — measured +1% (2509 -> 2534 img/s); default on.
    r50_args = {}
    if os.environ.get("HVT_BENCH_S2D", "1") == "1":
        r50_args["stem_s2d"] = True
    # Custom-VJP BatchNorm ablation (saves one bf16 residual per BN instead
    # of two f32 AD intermediates). Measured NEUTRAL (99.4 vs 99.3 ms/step):
    # XLA already converts the f32 AD saves to bf16 in the compiled program —
    # see BENCH.md "bytes/step". Default off, matching the Trainer.
    if os.environ.get("HVT_BENCH_BN", "flax") == "custom":
        r50_args["bn_custom"] = True
    # Selective remat experiment knob, e.g. HVT_BENCH_REMAT=1,2 (stage list).
    if os.environ.get("HVT_BENCH_REMAT"):
        r50_args["remat_stages"] = [
            int(s) for s in os.environ["HVT_BENCH_REMAT"].split(",")
        ]
        r50_args["remat_policy"] = os.environ.get("HVT_BENCH_REMAT_POLICY", "nothing")
    r50_algos = [
        {"cls": "EMA", "args": {"half_life": "100ba", "update_interval": "20ba"}},
        {"cls": "LabelSmoothing", "args": {"smoothing": 0.08}},
        {"cls": "GradientClipping",
         "args": {"clipping_type": "norm", "clipping_threshold": 2.0}},
    ]
    # BlurPool A/B: the reference's inat21 recipe includes BlurPool
    # (reference configs/pretrain/inat21.yaml:30); the default workload
    # omits it to stay comparable to the MLPerf-class anchor (which is
    # blurpool-free). HVT_BENCH_BLURPOOL=1 measures the recipe's true cost.
    if os.environ.get("HVT_BENCH_BLURPOOL") == "1":
        r50_algos.insert(0, {"cls": "BlurPool"})
    # Device-side augmentation A/B (hot-recipe device pair): measures the
    # chip cost of in-step RandAugment (+ColOut) vs the bare step —
    # the host-side saving is measured separately (BENCH.md).
    if os.environ.get("HVT_BENCH_DEVICE_RA") == "1":
        r50_algos += [
            {"cls": "RandAugment",
             "args": {"depth": 1, "severity": 9, "device": True}},
            {"cls": "ColOut",
             "args": {"p_row": 0.05, "p_col": 0.05, "device": True}},
        ]
    # HVT_BENCH_SKIP_R50=1 measures only the SwinV2 workload (dev A/B runs);
    # the official record always carries both.
    r50 = None
    if os.environ.get("HVT_BENCH_SKIP_R50") != "1":
        r50 = measure(
            {
                "model": {"name": "resnet50", "args": r50_args},
                "optim": {"name": "DecoupledSGDW", "lr": 2.048,
                          "momentum": 0.875, "weight_decay": 5.0e-4},
                "algorithms": r50_algos,
            },
            r50_batch,
        )

    swin = None
    if os.environ.get("HVT_BENCH_SKIP_SWIN") != "1":
        # Fused block halves (measured win, see BENCH.md); HVT_BENCH_FUSE=0
        # reverts to the packed-attention + XLA path.
        swin_args = {"fuse": os.environ.get("HVT_BENCH_FUSE", "1") == "1"}
        if os.environ.get("HVT_BENCH_FUSE_ATTN") == "1":
            swin_args["fuse_attn_train"] = True
        # Stage-4 fallback A/B: XLA attention vs packed kernels where the
        # fused half doesn't fit VMEM.
        if os.environ.get("HVT_BENCH_FALLBACK_XLA") == "1":
            swin_args["fallback_xla"] = True
        # NHWC direct-windowing A/B (round 5): =0 reverts the fused
        # attention half to the windowed entry (XLA window_partition/
        # reverse transposes at the kernel boundary).
        if os.environ.get("HVT_BENCH_FUSE_NHWC") == "0":
            swin_args["fuse_nhwc"] = False
        # Chunked big-C fused MLP A/B (round 5): =0 reverts non-fitting
        # MLPs to the XLA fallback (matters for swinv2_base+, not Tiny).
        if os.environ.get("HVT_BENCH_MLP_CHUNKED") == "0":
            swin_args["fuse_mlp_chunked"] = False
        # Fused residual + drop-path in the NHWC attention epilogue
        # (round 5): =0 reverts to the XLA-side drop-path+add.
        if os.environ.get("HVT_BENCH_FUSE_RESID") == "0":
            swin_args["fuse_resid"] = False
        swin = measure(
            {
                "model": {"name": "swinv2_tiny", "args": swin_args},
                "optim": {"name": "DecoupledAdamW", "lr": 1.0e-3,
                          "weight_decay": 0.05},
                "algorithms": [
                    {"cls": "LabelSmoothing", "args": {"smoothing": 0.1}},
                    {"cls": "GradientClipping",
                     "args": {"clipping_type": "norm", "clipping_threshold": 5.0}},
                ],
            },
            swin_batch,
        )

    if r50 is not None:
        r50_summary = _summarize(r50, A100_R50_IMAGES_PER_SEC, r50_batch)
        record = {
            "metric": "resnet50_inat21_train_images_per_sec_per_chip",
            "value": r50_summary["value"],
            "unit": "images/sec/chip",
            "vs_baseline": r50_summary["vs_baseline"],
            "workloads": {"resnet50": r50_summary},
        }
    else:
        swin_summary = _summarize(
            swin, A100_SWINV2_TINY_IMAGES_PER_SEC, swin_batch
        )
        record = {
            "metric": "swinv2_tiny_inat21_train_images_per_sec_per_chip",
            "value": swin_summary["value"],
            "unit": "images/sec/chip",
            "vs_baseline": swin_summary["vs_baseline"],
            "workloads": {},
        }
    if swin is not None:
        record["workloads"]["swinv2_tiny"] = _summarize(
            swin, A100_SWINV2_TINY_IMAGES_PER_SEC, swin_batch
        )

    # Opt-in: the COMPLETE hot recipe (configs/recipes/hot_tpu.yaml) as one
    # compiled step — BlurPool, EMA, LabelSmoothing, MixUp, SAM(10),
    # device ColOut+RandAugment, StochasticDepth, BCE loss, at the recipe's
    # 176px train crop (ProgressiveResizing steady state for the main 40-80%
    # of training). The north-star recipes' true chip throughput.
    if os.environ.get("HVT_BENCH_HOT") == "1":
        hot = measure(
            {
                "model": {"name": "resnet50", "args": r50_args,
                          "loss_name": "binary_cross_entropy"},
                "optim": {"name": "DecoupledSGDW", "lr": 2.048,
                          "momentum": 0.875, "weight_decay": 5.0e-4},
                "algorithms": [
                    {"cls": "BlurPool"},
                    {"cls": "EMA",
                     "args": {"half_life": "100ba", "update_interval": "20ba"}},
                    {"cls": "LabelSmoothing", "args": {"smoothing": 0.08}},
                    {"cls": "MixUp", "args": {"alpha": 0.2}},
                    {"cls": "SAM", "args": {"rho": 0.5, "interval": 10}},
                    {"cls": "ColOut",
                     "args": {"p_col": 0.05, "p_row": 0.05, "device": True}},
                    {"cls": "RandAugment",
                     "args": {"depth": 1, "severity": 9, "device": True}},
                    {"cls": "StochasticDepth",
                     "args": {"target_layer_name": "ResNetBottleneck",
                              "stochastic_method": "sample",
                              "drop_distribution": "linear",
                              "drop_rate": 0.1}},
                    {"cls": "GradientClipping",
                     "args": {"clipping_type": "norm",
                              "clipping_threshold": 2.0}},
                ],
            },
            r50_batch,
            image_size=176,
        )
        record["workloads"]["resnet50_hot_recipe"] = _summarize(
            hot, None, r50_batch
        )

    # Opt-in inference workloads (serving-relevant eval forwards; default off
    # so the driver's round-end run stays train-focused).
    if os.environ.get("HVT_BENCH_EVAL") == "1":
        r50_eval = measure_eval("resnet50", dict(r50_args), 256)
        record["workloads"]["resnet50_eval"] = _summarize(r50_eval, None, 256)
        if os.environ.get("HVT_BENCH_SKIP_SWIN") != "1":
            swin_eval = measure_eval("swinv2_tiny", dict(swin_args), 64)
            record["workloads"]["swinv2_tiny_eval"] = _summarize(swin_eval, None, 64)

    # Opt-in serving-artifact workloads (the deployed path: jax.export
    # StableHLO with weights baked in; see BENCH.md "serving artifacts").
    if os.environ.get("HVT_BENCH_ARTIFACT") == "1":
        record["workloads"]["resnet50_artifact"] = _summarize(
            measure_artifact("resnet50", 256), None, 256
        )
        if os.environ.get("HVT_BENCH_SKIP_SWIN") != "1":
            record["workloads"]["swinv2_tiny_artifact"] = _summarize(
                measure_artifact("swinv2_tiny", 64), None, 64
            )
    # Opt-in native-artifact workload (matched-TPU export with the fused
    # Pallas kernels embedded; export_serving --native). SwinV2 only — the
    # R50 artifact has no kernels to keep, it is identical to the portable
    # one.
    if (os.environ.get("HVT_BENCH_ARTIFACT_NATIVE") == "1"
            and os.environ.get("HVT_BENCH_SKIP_SWIN") != "1"):
        record["workloads"]["swinv2_tiny_artifact_native"] = _summarize(
            measure_artifact("swinv2_tiny", 64, native=True), None, 64
        )
    # Opt-in int8-PTQ artifact workloads (export_serving --quantize int8):
    # the A/B against the fp artifacts above — same export path, int8
    # Conv/Dense bodies.
    if os.environ.get("HVT_BENCH_ARTIFACT_INT8") == "1":
        # HVT_BENCH_INT8_CALIBRATE=N switches to static calibrated
        # activation scales (no in-graph absmax reductions).
        cal = int(os.environ.get("HVT_BENCH_INT8_CALIBRATE", 0))
        record["workloads"]["resnet50_artifact_int8"] = _summarize(
            measure_artifact("resnet50", 256, quantize="int8", calibrate=cal),
            None, 256,
        )
        if os.environ.get("HVT_BENCH_SKIP_SWIN") != "1":
            record["workloads"]["swinv2_tiny_artifact_int8"] = _summarize(
                measure_artifact("swinv2_tiny", 64, quantize="int8",
                                 calibrate=cal), None, 64,
            )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
