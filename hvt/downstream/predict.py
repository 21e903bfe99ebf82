"""Batch inference: checkpoint → per-image top-k predictions.

The reference has no prediction entry point — its downstream evaluations go
through sklearn classifiers over cached features (reference
linear_probe.py / simpleshot.py). A production deployment of the same
models needs plain batch inference, so hvt adds one: the same config
surface (machine + exp layers), the same loader/device-prep stack the
trainer uses, a jitted forward over the eval split, and one JSONL row per
image with the top-k class names and probabilities.

Weights resolve in this order:
* ``config.load_path`` — a full hvt training checkpoint (Orbax TrainState);
  EMA weights are used when present (matching how the Trainer evaluates,
  reference configs/pretrain/inat21.yaml EMA algorithm), unless
  ``use_ema=False``.
* otherwise the pretrained-backbone URIs (``ckpt://``, ``swin://``,
  ``wandb://``) via the PretrainedBackbone algorithm or
  ``model.pretrained_checkpoint`` — head weights then come from the
  checkpoint only if it has a matching head.
"""

from __future__ import annotations

import json
import pathlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hvt import config as config_lib
from hvt import parallel
from hvt.data import DevicePrep, build_loader
from hvt.downstream import features as features_lib
from hvt.models import build_model
from hvt.train import checkpoint as checkpoint_lib


def _resolve_weights(config, variables, use_ema: bool):
    """→ (params, batch_stats) as host numpy pytrees."""
    if config.load_path:
        raw = checkpoint_lib.load_raw(config.load_path)
        params = raw["params"]
        batch_stats = raw.get("batch_stats") or {}
        if use_ema and raw.get("ema_params") is not None:
            params = raw["ema_params"]
            batch_stats = raw.get("ema_batch_stats") or batch_stats
        return params, batch_stats
    return features_lib.load_pretrained_variables(
        config,
        jax.device_get(variables["params"]),
        jax.device_get(variables.get("batch_stats", {})),
    )


def _top_down_decode(tier_logits, lookups):
    """Constrained hierarchical decode: per-tier argmax where each tier's
    candidates are restricted to children of the previous tier's prediction
    (the constrained top-down rule of the reference's hierarchical nearest
    centroid, reference hierarchy.py:538-597, applied to logits). Returns
    (tier_preds list, masked fine-tier logits, per-row allowed-child count
    of the fine tier)."""
    neg = jnp.float32(-1e30)
    preds = [jnp.argmax(tier_logits[0].astype(jnp.float32), axis=-1)]
    masked = tier_logits[0].astype(jnp.float32)
    n_allowed = jnp.full(masked.shape[:1], masked.shape[-1], jnp.int32)
    for t in range(1, len(tier_logits)):
        parents = jnp.asarray(lookups[t - 1])  # (n_t,) child → parent idx
        allowed = parents[None, :] == preds[-1][:, None]
        masked = jnp.where(allowed, tier_logits[t].astype(jnp.float32), neg)
        preds.append(jnp.argmax(masked, axis=-1))
        n_allowed = allowed.sum(axis=-1).astype(jnp.int32)
    return preds, masked, n_allowed


def taxonomy_lookups(classes, num_classes):
    """Validated parent lookups for constrained hierarchical decoding.

    A multitask model can be trained on non-hierarchy-named folders; in
    that case ``parent_lookup_from_classes`` would silently build garbage
    (or crash deep in assign_tier_indices), so validate the class-name
    format first (reference hierarchy.py:242-286 taxonomy dirnames)."""
    if not isinstance(num_classes, tuple):
        raise ValueError(
            "hierarchical decoding needs a multitask model "
            "(hierarchy.variant: multitask)"
        )
    from hvt import hierarchy as hierarchy_lib

    name = None
    try:
        for name in classes:
            hierarchy_lib.HierarchicalLabel.parse(name)
    except (ValueError, AssertionError) as e:
        raise ValueError(
            "hierarchical decoding needs taxonomy-formatted class "
            "directory names ('<index>_<kingdom>_..._<species>', "
            f"reference hierarchy.py:242-286); got {name!r}"
        ) from e
    return hierarchy_lib.parent_lookup_from_classes(classes)


def _decode_topk(out, lookups, k):
    """Model output (logits or per-tier logits) → (top_i, top_p, tiers,
    n_allowed). The decode shared by the live-model and artifact steps."""
    tiers = n_allowed = None
    if isinstance(out, (list, tuple)):  # multitask head
        if lookups is not None:
            tier_preds, masked, n_allowed = _top_down_decode(out, lookups)
            tiers = jnp.stack(tier_preds, axis=-1)  # (B, N_TIERS)
            out = masked  # constrained fine-tier logits
        else:
            out = out[-1]
    probs = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
    top_p, top_i = jax.lax.top_k(probs, k)
    return top_i, top_p, tiers, n_allowed


def build_topk_step(model, prep, lookups, k, quantize=None, act_scales=None):
    """→ jitted ``(params, batch_stats, images) → (top_i, top_p, tiers,
    n_allowed)``. Shared by batch inference (predict) and the HTTP server
    (hvt/downstream/serve.py) so the decode semantics live in one place.

    ``quantize="int8"`` runs the forward through the w8a8 PTQ rewrite
    (hvt/ops/quant.py) — the live-path twin of ``export_serving --quantize
    int8``, so accuracy A/Bs need no export. ``act_scales`` (from
    ``live_act_scales``) switches the named layers to static calibrated
    activation scales — the measured production recipe (BENCH.md: dynamic
    absmax reductions cost R50 −33% vs calibrated)."""
    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize {quantize!r}: expected int8")

    def apply_fn(variables, x):
        return model.apply(variables, x, train=False)

    if quantize == "int8":
        from hvt.ops import quant

        apply_fn = quant.wrap_int8(apply_fn, act_scales=act_scales)

    @jax.jit
    def step(params, batch_stats, images):
        x = prep.normalize(images)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = apply_fn(variables, x)
        return _decode_topk(out, lookups, k)

    return step


def live_act_scales(model, prep, params, batch_stats, loader, n):
    """Calibrate static int8 activation scales on the live model: running
    absmax over the first ``n`` eval batches (full-precision math,
    hvt/ops/quant.py collect_act_scales) → {module path: scale}. The
    live-path twin of ``export_serving --calibrate N``."""
    import jax.numpy as jnp

    from hvt.ops import quant

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    def forward(images):
        return model.apply(variables, prep.normalize(images), train=False)

    batches = []
    for i, b in enumerate(loader.epoch(0)):
        if i >= n:
            break
        batches.append(jnp.asarray(b.images))
    if not batches:
        raise ValueError("calibration loader yielded no batches")
    return quant.collect_act_scales(forward, batches)


def build_topk_step_from_exported(exported, lookups, k):
    """``build_topk_step`` over a deserialized serving artifact
    (hvt/tools/export_serving.py): the artifact owns normalize + forward,
    so only the top-k / hierarchical decode lives here. Keeps the
    ``(params, batch_stats, images)`` signature so the HTTP server's
    batcher is agnostic to the weight source — both are ignored, the
    weights are baked into the artifact."""

    @jax.jit
    def step(params, batch_stats, images):
        del params, batch_stats
        return _decode_topk(exported.call(images), lookups, k)

    return step


def topk_record(classes, row, top_i, top_p, tiers, n_allowed, k) -> dict:
    """One image row of a step's output → the JSON-ready top-k record.

    Hierarchical decode: when the predicted parent has fewer than k
    children, top_k pads with out-of-branch classes at ~0 probability —
    trim to the branch's actual child count."""
    kk = k if n_allowed is None else min(k, int(n_allowed[row]))
    rec = {
        "classes": [classes[i] if classes else int(i) for i in top_i[row][:kk]],
        "class_ids": [int(i) for i in top_i[row][:kk]],
        "probs": [round(float(p), 6) for p in top_p[row][:kk]],
    }
    if tiers is not None:
        rec["tier_ids"] = [int(t) for t in tiers[row]]
    return rec


def predict(
    config: config_lib.Config,
    *,
    topk: int = 5,
    use_ema: bool = True,
    hierarchical: bool = False,
    limit_batches: Optional[int] = None,
    artifact: Optional[str] = None,
    quantize: Optional[str] = None,
    calibrate: int = 0,
):
    """Run inference over the eval split; yields one dict per image.

    ``hierarchical`` (multitask models only): decode top-down with the
    parent constraint — tier t's prediction is the best class among the
    children of tier t-1's prediction; top-k/probs then come from the
    constrained species tier.

    ``artifact``: run the forward from a StableHLO serving export
    (hvt/tools/export_serving.py) instead of building the model — no
    checkpoint or weights resolution; the config supplies only the dataset.

    ``quantize="int8"``: live-model runs only — the w8a8 PTQ forward
    (hvt/ops/quant.py), for accuracy A/Bs against full precision without
    an export; an artifact's quantization was fixed at export.
    ``calibrate=N``: static activation scales from the first N eval
    batches instead of in-graph dynamic absmax (the measured production
    recipe, BENCH.md)."""
    if artifact is not None and quantize is not None:
        raise ValueError(
            "quantize has no effect with an artifact: quantization was "
            "fixed at export time (export with --quantize int8 instead)"
        )
    if calibrate and quantize != "int8":
        raise ValueError("calibrate requires quantize='int8'")
    loader, info = build_loader(config, is_train=False)
    data_cfg = config.eval_dataset
    mesh = parallel.divisor_mesh(data_cfg.global_batch_size)
    parallel.set_kernel_mesh(mesh)
    prep = DevicePrep.from_config(data_cfg, config.precision)
    crop = data_cfg.crop_size

    k = min(topk, info.fine_grained_num_classes)
    classes = getattr(loader.dataset, "classes", ())
    lookups = (
        taxonomy_lookups(classes, info.num_classes) if hierarchical else None
    )

    pad_to = None
    if artifact is not None:
        from hvt.tools import export_serving

        buckets, manifest = export_serving.load_all(artifact)
        backend = jax.default_backend()
        lowered_for = set(manifest.get("platforms", ()))
        tpu_like = {"tpu", "axon"}
        if lowered_for and backend not in lowered_for and not (
            backend in tpu_like and lowered_for & tpu_like
        ):
            raise ValueError(
                f"artifact was lowered for platforms {sorted(lowered_for)} "
                f"but the running backend is {backend!r}; re-export with "
                f"--platforms {backend}"
            )
        pre = manifest["preprocessing"]
        if pre["crop_size"] != crop:
            raise ValueError(
                f"artifact was exported at crop_size={pre['crop_size']}, "
                f"dataset delivers {crop}"
            )
        gbs = data_cfg.global_batch_size
        if 0 in buckets:  # symbolic batch serves any loader batch
            exported = buckets[0]
        elif gbs in buckets:
            exported = buckets[gbs]
        elif len(buckets) > 1 and gbs < max(buckets):
            # Smallest bucket that fits — rows beyond the loader batch are
            # zero-padded and never yielded (same contract as the loader's
            # own masked last-batch padding).
            pad_to = min(b for b in buckets if b >= gbs)
            exported = buckets[pad_to]
        elif len(buckets) == 1:
            (pinned,) = buckets
            raise ValueError(
                f"artifact batch is pinned to {pinned}; set "
                f"eval_dataset.global_batch_size to {pinned} (or re-export "
                f"with --batch 0)"
            )
        else:
            raise ValueError(
                f"eval_dataset.global_batch_size={gbs} exceeds the "
                f"artifact's largest batch bucket ({sorted(buckets)}); "
                f"lower it or re-export with a bigger bucket"
            )
        params, batch_stats = None, {}
        step = build_topk_step_from_exported(exported, lookups, k)
    else:
        model = build_model(config, info.num_classes)
        variables = jax.jit(
            lambda: model.init(
                jax.random.key(config.seed),
                prep.normalize(jnp.zeros((2, crop, crop, 3), jnp.uint8)),
                train=False,
            ),
            out_shardings=parallel.replicated(mesh),
        )()
        params, batch_stats = _resolve_weights(config, variables, use_ema)
        params = jax.device_put(params, parallel.replicated(mesh))
        batch_stats = jax.device_put(batch_stats, parallel.replicated(mesh))
        act_scales = (
            live_act_scales(model, prep, params, batch_stats, loader, calibrate)
            if calibrate
            else None
        )
        step = build_topk_step(model, prep, lookups, k, quantize=quantize,
                               act_scales=act_scales)

    paths = getattr(loader.dataset, "paths", None)
    sharded = parallel.batch_sharding(mesh)
    for batch_idx, batch in enumerate(loader.epoch(0)):
        if limit_batches is not None and batch_idx >= limit_batches:
            break
        if pad_to is not None:
            pad = np.zeros(
                (pad_to - batch.images.shape[0], *batch.images.shape[1:]),
                batch.images.dtype,
            )
            # Padded rows sit beyond every loader row index, so the
            # mask-gated yield below never reads them; placement is left
            # to jit (a pinned-bucket batch need not divide the mesh).
            images = jnp.asarray(np.concatenate([batch.images, pad], axis=0))
        else:
            images = jax.device_put(batch.images, sharded)
        top_i, top_p, tiers, n_allowed = step(params, batch_stats, images)
        top_i, top_p = np.asarray(top_i), np.asarray(top_p)
        tiers = None if tiers is None else np.asarray(tiers)
        n_allowed = None if n_allowed is None else np.asarray(n_allowed)
        for row in range(batch.images.shape[0]):
            if batch.mask[row] <= 0:
                continue
            rec = topk_record(classes, row, top_i, top_p, tiers, n_allowed, k)
            label = batch.labels[row]
            rec["label"] = (
                [int(t) for t in label] if np.ndim(label) else int(label)
            )
            if paths is not None and batch.indices is not None:
                rec["path"] = str(paths[int(batch.indices[row])])
            yield rec


def run(config: config_lib.Config, output: Optional[str], **kwargs) -> dict:
    """Predict and write JSONL; returns {"count", "top1", "topk"} (accuracy
    against the folder labels, reported for convenience)."""
    n = 0
    hit1 = hitk = 0
    out_f = open(output, "w") if output else None
    try:
        for rec in predict(config, **kwargs):
            n += 1
            label = rec["label"][-1] if isinstance(rec["label"], list) else rec["label"]
            if label == rec["class_ids"][0]:
                hit1 += 1
            if label in rec["class_ids"]:
                hitk += 1
            if out_f is not None:
                out_f.write(json.dumps(rec) + "\n")
            else:
                print(json.dumps(rec))
    finally:
        if out_f is not None:
            out_f.close()
    summary = {
        "count": n,
        "top1": hit1 / n if n else 0.0,
        "topk": hitk / n if n else 0.0,
    }
    if output:
        print(f"[{config.run_name}] wrote {n} predictions to {output} "
              f"(top1={summary['top1']:.4f}, topk={summary['topk']:.4f})")
    return summary
