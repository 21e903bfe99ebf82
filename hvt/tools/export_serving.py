"""Serialize the serving forward to a portable StableHLO artifact.

No reference counterpart (the reference has no deployment/export story;
its only model artifact is a torch checkpoint that needs the full Python
stack to replay). This tool completes hvt's TPU-native deployment path
next to serve.py's live HTTP server and hvt/tools/export_torch.py's
interop checkpoints: ``jax.export`` serializes the *computation itself* —
uint8 decode-side input → on-device normalization → eval forward, with
the resolved weights baked in as constants — so a serving fleet can replay
it with nothing but jax (or any StableHLO runtime); no flax, no hvt, no
model code, no checkpoint plumbing.

Design notes (TPU semantics):

* **Plain XLA lowering by default** (``use_pallas``/``fuse`` forced off):
  Mosaic custom calls would pin the artifact to one libtpu build, and
  symbolic batch dims do not flow through Pallas grids. ``--native`` flips
  the trade: it keeps the fused Pallas kernels in the artifact (the live
  eval step's routing — measured 41% faster than plain XLA for SwinV2-T,
  BENCH.md) at the cost of a **static batch** and a **matched-TPU
  contract** (the embedded Mosaic modules are compiled by the libtpu the
  artifact lands on; portability across TPU generations/releases is not
  guaranteed the way plain StableHLO is).
* **Symbolic batch by default** (``--batch 0``): the batch dimension is a
  ``jax.export`` symbolic dim, so one artifact serves any request batch
  with no retrace and no padding contract. ``--batch N`` pins a static
  shape instead (needed if a runtime lacks dynamic-shape support).
* **Batch buckets** (``--batch 1,8,64``): one artifact directory holding
  one export per pinned batch. This is the usability story for pinned
  (especially ``--native``) artifacts: the HTTP server dispatches each
  coalesced request group at the smallest bucket that fits, so single
  requests pay a batch-1 forward while bursts ride the big bucket.
* **int8 quantization** (``--quantize int8``): w8a8 dynamic PTQ via
  hvt/ops/quant.py — int8 kernels baked in as constants, per-tensor
  activation scales computed in-graph, classifier head kept fp. Plain HLO
  (no custom calls), so it composes with symbolic batch, buckets, and
  multi-platform lowering; on v5e the MXU runs int8 at 2x its bf16 rate
  and the bandwidth-bound eval forward halves its activation bytes.
* **Multi-platform**: ``--platforms tpu,cpu`` lowers once per platform
  into one artifact; the embedded module dispatches on the backend it
  lands on, so the same file serves TPU pods and CPU canaries.

Usage:

    python -m hvt.tools.export_serving --machine m.yaml --exp e.yaml ... \
        --output dir/ [--batch 0] [--platforms tpu,cpu] [--raw-weights] \
        [--native] [--quantize int8]

Writes ``<output>/serving.jaxexport`` (serialized ``jax.export.Exported``)
and ``<output>/manifest.json`` (class names, input spec, preprocessing
contract). Reload with :func:`load`, or with plain
``jax.export.deserialize`` anywhere jax is installed.
"""

from __future__ import annotations

import argparse
import json
import pathlib
from typing import Optional, Sequence

MANIFEST_NAME = "manifest.json"
ARTIFACT_NAME = "serving.jaxexport"


def build_exported(config, *, use_ema: bool = True, batch: int = 0,
                   platforms: Sequence[str] = ("tpu", "cpu"),
                   native: bool = False, quantize: Optional[str] = None,
                   calibrate: int = 0):
    """→ (jax.export.Exported, manifest dict) for the eval forward.

    ``batch == 0`` exports a symbolic batch dimension; ``batch > 0`` pins
    it. The forward maps uint8 NHWC center-crops (the contract of
    ``EvalTransform``) to fine-grained logits — or a tuple of per-tier
    logits for multitask models.

    ``native`` keeps the fused Pallas kernels in the artifact (the live
    eval step's lowering) instead of forcing plain XLA. Requires a static
    batch (Pallas grids are shape-specialized) and a tpu-only platform
    list; the artifact is pinned to matched TPU deployments.

    ``quantize="int8"`` rewrites every Conv/Dense to w8a8 dynamic int8
    (hvt/ops/quant.py) — plain HLO, so the artifact stays as portable as
    the default lowering. Mutually exclusive with ``native`` (the fused
    Mosaic kernels consume full-precision params directly).
    ``calibrate=N`` (with int8) records static activation scales over N
    eval batches instead of in-graph dynamic absmax — one reduction pass
    per layer removed from the serving graph.
    """
    prepared = _prepare(config, use_ema=use_ema, native=native,
                        platforms=platforms, quantize=quantize,
                        calibrate=calibrate)
    return _export_one(prepared, batch=batch, platforms=platforms,
                       native=native)


def _prepare(config, *, use_ema: bool, native: bool,
             platforms: Sequence[str], quantize: Optional[str] = None,
             calibrate: int = 0) -> dict:
    """Everything batch-independent: validate, build the model/loader once,
    resolve + bake the weights, and return the traceable forward. Shared by
    single exports and batch-bucket exports (which lower the SAME prepared
    forward once per bucket instead of re-reading the checkpoint)."""
    import jax
    import jax.numpy as jnp

    from hvt import config as config_lib
    from hvt.data import DevicePrep, build_loader
    from hvt.downstream import predict as predict_lib
    from hvt.models import build_model

    if quantize not in (None, "int8"):
        raise ValueError(f"unknown --quantize {quantize!r}: expected int8")
    if quantize and native:
        raise ValueError(
            "--quantize is incompatible with --native: the fused Mosaic "
            "kernels consume full-precision params directly, so the int8 "
            "Conv/Dense rewrite would silently not apply to them"
        )
    if native:
        if len(tuple(platforms)) != 1 or tuple(platforms)[0] not in (
            "tpu", "axon",  # axon: a TPU behind an experimental PJRT plugin
        ):
            raise ValueError(
                f"--native lowers Mosaic custom calls, which only a TPU "
                f"backend can execute; use --platforms tpu (got {platforms})"
            )
        # The live eval step's kernel routing, made explicit (the config
        # defaults are platform/mesh-conditional; an exported artifact
        # must not depend on where the *export* ran).
        knobs = {"use_pallas": True, "fuse": True}
    else:
        # Portable lowering: no Mosaic custom calls in the artifact.
        knobs = {"use_pallas": False, "fuse": False}
    # Every builder tolerates these knobs; they are no-ops for ResNet.
    config = config_lib.loads(
        config_lib.to_dict(config), {"model": {"args": knobs}}
    )

    loader, info = build_loader(config, is_train=False)
    classes = list(getattr(loader.dataset, "classes", ()))
    data_cfg = config.eval_dataset
    crop = data_cfg.crop_size

    prep = DevicePrep.from_config(data_cfg, config.precision)
    model = build_model(config, info.num_classes)
    variables = model.init(
        jax.random.key(config.seed),
        prep.normalize(jnp.zeros((2, crop, crop, 3), jnp.uint8)),
        train=False,
    )
    params, batch_stats = predict_lib._resolve_weights(config, variables, use_ema)
    # Host numpy pytrees → baked into the exported module as constants.
    params = jax.device_get(params)
    batch_stats = jax.device_get(batch_stats)

    multitask = isinstance(info.num_classes, tuple)

    def forward(images):
        x = prep.normalize(images)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        # Lists are not a stable serialization surface; fix tuples.
        return tuple(out) if multitask else out

    if calibrate and quantize != "int8":
        raise ValueError("calibrate requires --quantize int8")
    act_scales = None
    if quantize == "int8":
        from hvt.ops import quant

        if calibrate:
            # Static activation scales from real eval batches (running
            # absmax, full-precision math — hvt/ops/quant.py).
            cal_batches = []
            for i, b in enumerate(loader.epoch(0)):
                if i >= calibrate:
                    break
                cal_batches.append(jnp.asarray(b.images))
            if not cal_batches:
                raise ValueError("calibration loader yielded no batches")
            act_scales = quant.collect_act_scales(forward, cal_batches)
        forward = quant.wrap_int8(forward, act_scales=act_scales)

    return {
        "quantize": quantize,
        "act_scales": (
            None if act_scales is None
            else {"batches": int(calibrate), "layers": len(act_scales)}
        ),
        "forward": forward,
        "config": config,
        "info": info,
        "classes": classes,
        "data_cfg": data_cfg,
        "crop": crop,
        "multitask": multitask,
        "use_ema": use_ema,
    }


def _export_one(prepared: dict, *, batch: int, platforms: Sequence[str],
                native: bool):
    """Lower the prepared forward for one batch spec → (Exported, manifest)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from hvt import parallel

    if native and not (batch and batch > 0):
        raise ValueError(
            "--native needs a static batch (--batch N): Mosaic grids "
            "are shape-specialized, symbolic dims do not flow through"
        )

    crop = prepared["crop"]
    pinned = batch if (batch and batch > 0) else None
    if pinned is not None:
        spec_batch = pinned
    else:
        (spec_batch,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((spec_batch, crop, crop, 3), jnp.uint8)
    forward = prepared["forward"]
    if native:
        from hvt import ops as ops_pkg

        # Export is lowering, not execution: force the Mosaic lowering even
        # from a non-TPU host (the dispatch sites otherwise pick the jnp /
        # interpret path based on the process backend). The artifact is
        # single-device, so the kernels must lower unwrapped (no shard_map):
        # clear the process kernel-mesh global for the trace and restore it
        # after — a live Trainer in this process keeps its mesh.
        prev_mesh = parallel.declared_kernel_mesh()
        parallel.set_kernel_mesh(None)
        try:
            with ops_pkg.force_tpu_lowering():
                exported = jax_export.export(
                    jax.jit(forward),
                    platforms=tuple(platforms),
                    disabled_checks=[
                        jax_export.DisabledSafetyCheck.custom_call(
                            "tpu_custom_call"
                        )
                    ],
                )(spec)
        finally:
            parallel.set_kernel_mesh(prev_mesh)
    else:
        exported = jax_export.export(
            jax.jit(forward), platforms=tuple(platforms)
        )(spec)

    info = prepared["info"]
    data_cfg = prepared["data_cfg"]
    multitask = prepared["multitask"]
    config = prepared["config"]
    manifest = {
        "model": config.model.name,
        "multitask": multitask,
        "num_classes": list(info.num_classes) if multitask else info.num_classes,
        "classes": prepared["classes"],
        "input": {
            "shape": [pinned if pinned is not None else "b", crop, crop, 3],
            "dtype": "uint8",
            "layout": "NHWC",
            "range": "0-255 RGB",
        },
        # Host-side contract before the graph takes over: EvalTransform
        # (resize shorter side, center-crop). Normalization is INSIDE the
        # exported graph, matching the reference's device_transforms split
        # (reference data.py:154-164).
        "preprocessing": {
            "resize_size": data_cfg.resize_size,
            "crop_size": crop,
            "note": "resize shorter side then center-crop on the host; "
                    "mean/std normalization is inside the graph",
        },
        "output": "per-tier logits tuple (coarse->fine)" if multitask
                  else "logits",
        "compute_dtype": str(config.precision.compute_dtype),
        "ema_weights": bool(prepared["use_ema"]),
        # native: Mosaic custom calls embedded — fastest on matched TPUs,
        # but pinned to deployments whose libtpu accepts the payloads;
        # false: plain StableHLO, portable to any XLA backend.
        "native": bool(native),
        # int8: w8a8 PTQ (hvt/ops/quant.py) — int8 kernels baked in;
        # activation scales either dynamic per-tensor (in-graph absmax) or
        # static calibrated constants; still plain HLO, as portable as an
        # unquantized artifact.
        "quantization": prepared.get("quantize"),
        "activation_scales": (
            prepared.get("act_scales") or
            ({"mode": "dynamic"} if prepared.get("quantize") else None)
        ),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
    }
    return exported, manifest


def export_artifact(config, output: str, *, use_ema: bool = True,
                    batch: "int | Sequence[int]" = 0,
                    platforms: Sequence[str] = ("tpu", "cpu"),
                    native: bool = False,
                    quantize: Optional[str] = None,
                    calibrate: int = 0) -> pathlib.Path:
    """Build and write the artifact directory; returns its path.

    ``batch`` may be a list of pinned sizes (batch buckets): the directory
    then carries ``serving-b{N}.jaxexport`` per bucket and the manifest
    lists them under ``batch_buckets``/``files``; consumers pick the
    smallest bucket that fits a request group (hvt/downstream/serve.py).
    """
    out = pathlib.Path(output)
    out.mkdir(parents=True, exist_ok=True)
    batches = list(batch) if isinstance(batch, (list, tuple)) else [batch]
    if len(batches) > 1:
        if len(set(batches)) != len(batches) or any(b <= 0 for b in batches):
            raise ValueError(
                f"batch buckets must be distinct pinned sizes, got {batches}"
            )
        batches = sorted(batches)
    # One model/loader/weight resolution shared by every bucket; only the
    # lowering runs per batch spec.
    prepared = _prepare(config, use_ema=use_ema, native=native,
                        platforms=platforms, quantize=quantize,
                        calibrate=calibrate)
    files = {}
    manifest = None
    for b in batches:
        exported, manifest = _export_one(
            prepared, batch=b, platforms=platforms, native=native
        )
        name = ARTIFACT_NAME if len(batches) == 1 else f"serving-b{b}.jaxexport"
        (out / name).write_bytes(exported.serialize())
        files[str(b)] = name
    if len(batches) > 1:
        manifest["batch_buckets"] = batches
        manifest["files"] = files
        # input.shape reflects the largest bucket; per-file shapes are the
        # bucket sizes.
        manifest["input"]["shape"][0] = batches[-1]
    (out / MANIFEST_NAME).write_text(json.dumps(manifest, indent=1))
    return out


def load_all(path: str):
    """→ ({pinned_batch_or_0: jax.export.Exported}, manifest).

    Single-export directories (the default layout) map their one export
    under its pinned batch, or 0 for a symbolic batch dimension.
    """
    from jax import export as jax_export

    p = pathlib.Path(path)
    manifest = json.loads((p / MANIFEST_NAME).read_text())
    if "files" in manifest:
        return {
            int(b): jax_export.deserialize(
                bytearray((p / name).read_bytes())
            )
            for b, name in manifest["files"].items()
        }, manifest
    exported = jax_export.deserialize(
        bytearray((p / ARTIFACT_NAME).read_bytes())
    )
    pinned = manifest["input"]["shape"][0]
    key = pinned if isinstance(pinned, int) else 0
    return {key: exported}, manifest


def load(path: str):
    """→ (jax.export.Exported, manifest dict) from an artifact directory.

    Call the model with ``exported.call(images_uint8)`` (eagerly or under
    jit); only jax is required, not hvt.
    """
    from jax import export as jax_export

    p = pathlib.Path(path)
    manifest = json.loads((p / MANIFEST_NAME).read_text())
    if "files" in manifest:
        raise ValueError(
            f"{path} is a batch-bucket artifact (buckets "
            f"{manifest['batch_buckets']}); use load_all()"
        )
    exported = jax_export.deserialize(
        bytearray((p / ARTIFACT_NAME).read_bytes())
    )
    return exported, manifest


def verify_artifact(path: str) -> dict:
    """Pre-deploy check: load every export in the artifact, confirm the
    manifest/file agreement, and — when the running backend is among the
    lowered platforms — execute each at its smallest shape with zero
    pixels, checking finite logits of the declared arity. Returns the
    summary dict (also printed by ``--verify``)."""
    import jax
    import numpy as np

    buckets, manifest = load_all(path)
    backend = jax.default_backend()
    tpu_like = {"tpu", "axon"}
    lowered_for = set(manifest.get("platforms", ()))
    executable = backend in lowered_for or (
        backend in tpu_like and bool(lowered_for & tpu_like)
    )
    crop = manifest["preprocessing"]["crop_size"]
    checked = []
    for pinned, exported in sorted(buckets.items()):
        shape_batch = exported.in_avals[0].shape[0]
        if pinned:  # pinned export must declare its own batch
            assert shape_batch == pinned, (shape_batch, pinned)
        if executable:
            b = pinned if pinned else 1
            out = exported.call(np.zeros((b, crop, crop, 3), np.uint8))
            tiers = out if isinstance(out, tuple) else (out,)
            want = (len(manifest["num_classes"])
                    if manifest["multitask"] else 1)
            assert len(tiers) == want, (len(tiers), want)
            assert all(
                np.isfinite(np.asarray(t, dtype=np.float32)).all()
                for t in tiers
            ), "non-finite logits"
        checked.append(pinned if pinned else "symbolic")
    return {
        "artifact": str(path),
        "model": manifest["model"],
        "native": manifest.get("native", False),
        "quantization": manifest.get("quantization"),
        "platforms": sorted(lowered_for),
        "buckets": checked,
        "executed": bool(executable),
        "backend": backend,
        "status": "ok" if executable else "ok (loaded; backend "
                  f"{backend!r} not among lowered platforms, not executed)",
    }


def main(argv: Optional[Sequence[str]] = None) -> None:
    import sys

    from hvt import config as config_lib

    # --verify mode: no config tree needed, just the artifact directory.
    argv_list = list(sys.argv[1:] if argv is None else argv)
    if argv_list[:1] == ["--verify"]:
        vparser = argparse.ArgumentParser(
            description="validate a serving artifact before deploy")
        vparser.add_argument("--verify", required=True,
                             help="artifact directory to check")
        vargs = vparser.parse_args(argv_list)
        print(json.dumps(verify_artifact(vargs.verify)))
        return

    parser = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    config_lib.add_exp_args(parser)
    parser.add_argument("--output", required=True,
                        help="artifact directory to write")
    parser.add_argument("--batch", default="0",
                        help="0 = symbolic batch dim; N pins a static batch; "
                             "N1,N2,... writes one export per batch bucket")
    parser.add_argument("--platforms", default="tpu,cpu",
                        help="comma-separated lowering platforms")
    parser.add_argument("--raw-weights", action="store_true",
                        help="use raw params even when the checkpoint has EMA")
    parser.add_argument("--native", action="store_true",
                        help="keep the fused Pallas kernels in the artifact "
                             "(matched-TPU deployments; needs --batch N and "
                             "--platforms tpu)")
    parser.add_argument("--quantize", choices=["int8"], default=None,
                        help="post-training quantization: int8 = w8a8 "
                             "dynamic (per-channel weights, per-tensor "
                             "activations; head kept fp); incompatible "
                             "with --native")
    parser.add_argument("--calibrate", type=int, default=0,
                        help="with --quantize int8: record static "
                             "activation scales over N eval batches "
                             "(removes the in-graph absmax reductions); "
                             "0 = dynamic scales")
    args = parser.parse_args(argv)
    from hvt.utils import compile_cache

    compile_cache.enable()  # re-exports skip the lowering-side compiles
    config = config_lib.load(machine=args.machine, exps=args.exp)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    if args.native and platforms == ("tpu", "cpu"):
        platforms = ("tpu",)  # --native narrows the *default* platform list
    batches = [int(b) for b in str(args.batch).split(",") if b.strip()]
    if not batches:
        parser.error(f"invalid --batch {args.batch!r}: expected 0, N, or "
                     f"a comma-separated bucket list like 1,8,64")
    out = export_artifact(
        config,
        args.output,
        use_ema=not args.raw_weights,
        batch=batches if len(batches) > 1 else batches[0],
        platforms=platforms,
        native=args.native,
        quantize=args.quantize,
        calibrate=args.calibrate,
    )
    manifest = json.loads((out / MANIFEST_NAME).read_text())
    names = list(manifest.get("files", {ARTIFACT_NAME: ARTIFACT_NAME}).values())
    print(json.dumps({
        "artifact": str(out),
        "files": names,
        "model": manifest["model"],
        "classes": len(manifest["classes"]),
        "platforms": manifest["platforms"],
        "native": manifest["native"],
        "quantization": manifest.get("quantization"),
        "activation_scales": manifest.get("activation_scales"),
        "batch_buckets": manifest.get("batch_buckets"),
        "bytes": sum((out / n).stat().st_size for n in names),
    }))


if __name__ == "__main__":
    main()
