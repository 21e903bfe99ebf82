"""Frozen-feature extraction with on-disk caching.

Mirrors the reference's feature pipelines (reference linear_probe.py:43-168,
simpleshot.py:27-136): eval-style transforms, a frozen pretrained backbone
producing pre-logits pooled features, cached as
``<save_root>/<kind>-features/<run_name>/<dataset>-{train|eval}-features.npy``.

The extraction step runs on TPU (the only device use in these workloads,
reference linear_probe.py:156-163); classifier fitting stays in sklearn on
host, as in the reference.
"""

from __future__ import annotations

import os
import pathlib

import jax
import numpy as np

from hvt import config as config_lib
from hvt import parallel
from hvt.data import DevicePrep, build_loader
from hvt.models import build_model
from hvt.train import checkpoint as checkpoint_lib
from hvt.train import state as state_lib
from hvt.train import step as step_lib


def cache_path(config: config_lib.Config, kind: str, is_train: bool) -> str:
    """(reference linear_probe.py:43-54 / simpleshot.py:27-38)."""
    save_dir = os.path.join(config.machine.save_root, f"{kind}-features", config.run_name)
    os.makedirs(save_dir, exist_ok=True)
    data_cfg = config.train_dataset if is_train else config.eval_dataset
    split = "train" if is_train else "eval"
    return os.path.join(save_dir, f"{data_cfg.path or 'synthetic'}-{split}-features.npy")


def load_pretrained_variables(
    config: config_lib.Config, params: dict, batch_stats: dict | None
) -> tuple[dict, dict | None]:
    """Load the pretrained backbone per config (PretrainedBackbone algorithm
    args or model.pretrained_checkpoint), supporting ckpt:// and swin:// URIs.

    Returns (params, batch_stats): hvt ``ckpt://`` checkpoints carry
    BatchNorm running statistics, which must transfer with the weights — a
    frozen backbone normalizes with them (reference models.py:155-205 loads
    the full torch state dict)."""
    uri = None
    strict = False
    for algo in config.algorithms:
        if algo.cls == "PretrainedBackbone":
            uri = str(algo.args["checkpoint"])
            strict = bool(algo.args.get("strict", False))
    if uri is None:
        uri = config.model.pretrained_checkpoint
    if not uri:
        return params, batch_stats
    # checkpoint_lib.load_pretrained routes every scheme (ckpt://, swin://,
    # torch://, wandb://) and merges batch statistics with the weights.
    return checkpoint_lib.load_pretrained(uri, params, batch_stats, strict=strict)


def load_pretrained_params(config: config_lib.Config, params: dict) -> dict:
    """Params-only variant of :func:`load_pretrained_variables`."""
    return load_pretrained_variables(config, params, None)[0]


def extract_features(
    config: config_lib.Config,
    is_train: bool,
    kind: str,
    hierarchical_labels: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (features (N, D), labels (N,) or (N, 7)). Features cached on disk;
    labels come from the folder scan (no decode), in the same epoch-0 order
    the features were extracted in."""
    # The loaders pad the final batch; mask rows are dropped at the end.
    cfg_dict = config_lib.to_dict(config)
    if hierarchical_labels:
        cfg_dict["hierarchy"] = dict(cfg_dict["hierarchy"], variant="multitask")
    else:
        cfg_dict["hierarchy"] = dict(cfg_dict["hierarchy"], variant="")
    cfg_dict["is_train"] = True  # skip tree-dist building inside the loader
    loader_cfg = config_lib.loads(cfg_dict)

    loader, _info = build_loader(loader_cfg, is_train=is_train)
    # Labels come straight from the scanned dataset in epoch-0 batch order —
    # no image is decoded for them (the reference wastefully decodes the whole
    # split just to collect labels, reference linear_probe.py:129-141; on a
    # cache hit hvt opens no image at all).
    labels = np.asarray(loader.dataset.labels)[loader.epoch_indices(0)]

    cache = cache_path(config, kind, is_train)
    if os.path.isfile(cache):
        print(f"Using cached features at {cache}.")
        return np.load(cache), labels

    # Features are head-independent: build with a dummy 2-class head
    # (reference linear_probe.py:143-144).
    flat_cfg = config_lib.loads(
        dict(cfg_dict, hierarchy=dict(cfg_dict["hierarchy"], variant=""))
    )
    # Feature extraction is forward-only: the window-blocked Pallas attention
    # kernel wins there (BENCH.md), so default it on for Swin backbones when
    # a real TPU is present (training keeps the XLA path by default).
    if config.model.name.startswith("swinv2") and any(
        d.platform in ("tpu", "axon") for d in jax.devices()
    ):
        flat_cfg = config_lib.loads(
            config_lib.to_dict(flat_cfg),
            {"model": {"args": {"use_pallas": flat_cfg.model.args.get("use_pallas", True)}}},
        )
    model = build_model(flat_cfg, 2)
    data_cfg = config.train_dataset if is_train else config.eval_dataset
    mesh = parallel.divisor_mesh(data_cfg.global_batch_size)
    parallel.set_kernel_mesh(mesh)
    prep = DevicePrep.from_config(data_cfg, config.precision)

    crop = data_cfg.crop_size
    rng = jax.random.key(config.seed)
    variables = jax.jit(
        lambda: model.init(rng, prep.normalize(
            jax.numpy.zeros((2, crop, crop, 3), jax.numpy.uint8)), train=False),
        out_shardings=parallel.replicated(mesh),
    )()
    params, batch_stats = load_pretrained_variables(
        config,
        jax.device_get(variables["params"]),
        jax.device_get(variables.get("batch_stats", {})),
    )
    params = jax.device_put(params, parallel.replicated(mesh))

    feature_step = step_lib.build_feature_step(model, prep)
    sharded = parallel.batch_sharding(mesh)
    feats = []
    for batch in loader.epoch(0):
        images = jax.device_put(batch.images, sharded)
        out = np.asarray(feature_step(params, batch_stats, images))
        feats.append(out[batch.mask > 0])
    features = np.concatenate(feats, axis=0).astype(np.float32)

    np.save(cache, features)
    return features, labels


def l2_normalize(features: np.ndarray) -> np.ndarray:
    """(reference simpleshot.py:139-145)."""
    assert features.ndim == 2
    norms = np.linalg.norm(features, ord=2, axis=1, keepdims=True)
    return features / norms


def center(features: np.ndarray) -> np.ndarray:
    """Divides by the per-example mean — preserving the reference's quirk
    (reference simpleshot.py:148-154 divides rather than subtracting the
    train mean; SURVEY.md §2.4 quirk 5).

    Degenerate on (near-)zero-mean features: post-LayerNorm backbones like
    DINOv2 produce rows whose mean sits at float epsilon (exactly 0.0 for
    some rows), so the division yields inf/NaN — exactly what the
    reference would do. Use the l2n variant for such backbones
    (configs/simpleshot/dinov2_b14.yaml); pinned in
    tests/test_downstream.py."""
    assert features.ndim == 2
    mean = np.mean(features, axis=1, keepdims=True)
    return features / mean


def tree_distance(labels: np.ndarray, preds: np.ndarray, *, tree_dists: np.ndarray) -> float:
    """(reference linear_probe.py:57-58)."""
    return float(np.sum(tree_dists[preds, labels]) / labels.size)
