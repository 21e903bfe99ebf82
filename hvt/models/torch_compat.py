"""Torch SwinV2 checkpoint interop.

The reference loads Microsoft-format SwinV2 checkpoints through its
``swin://<path>`` URI scheme, filtering non-persistent buffers
(reference swinv2.py:870-895). This module provides the same capability for
hvt: parse the URI, read the torch state dict, drop the non-persistent
buffers, and convert tensor layouts to this package's flax parameter tree
(torch Linear stores (out, in); flax Dense stores (in, out); conv kernels go
OIHW → HWIO).
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np

# Buffers that are derived, not learned (reference swinv2.py:887-894).
NON_PERSISTENT = ("relative_position_index", "relative_coords_table", "logit_clamp_max")

_SWIN_URI = re.compile(r"^swin://(.+)$")


def parse_swin_uri(uri: str) -> str:
    m = _SWIN_URI.match(uri)
    if not m:
        raise ValueError(f"uri {uri!r} doesn't match swin://<path>")
    return m.group(1)


def filter_buffers(state_dict: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    return {
        k: v for k, v in state_dict.items()
        if not any(name in k for name in NON_PERSISTENT)
    }


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def infer_depths(state_dict: Mapping[str, np.ndarray]) -> tuple[int, ...]:
    """Stage depths from ``layers.{s}.blocks.{i}.*`` key names."""
    counts: dict[int, int] = {}
    pat = re.compile(r"^layers\.(\d+)\.blocks\.(\d+)\.")
    for key in state_dict:
        m = pat.match(key)
        if m:
            s, i = int(m.group(1)), int(m.group(2))
            counts[s] = max(counts.get(s, 0), i + 1)
    if not counts:
        raise ValueError("no layers.*.blocks.* keys — not a Swin state dict?")
    return tuple(counts[s] for s in sorted(counts))


def convert_swin_state_dict(
    state_dict: Mapping[str, np.ndarray], depths: tuple[int, ...] | None = None
) -> dict:
    """Torch SwinV2 state dict → hvt.models.swinv2 flax params tree."""
    sd = {k: _np(v) for k, v in filter_buffers(state_dict).items()}
    if depths is None:
        depths = infer_depths(sd)
    params: dict = {}

    def dense(prefix, has_bias=True):
        out = {"kernel": sd[f"{prefix}.weight"].T}
        if has_bias:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def norm(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params["patch_embed"] = {
        # OIHW → HWIO
        "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
        "bias": sd["patch_embed.proj.bias"],
    }
    if "patch_embed.norm.weight" in sd:
        params["patch_norm"] = norm("patch_embed.norm")
    if "absolute_pos_embed" in sd:
        ape = sd["absolute_pos_embed"]  # (1, L, C)
        side = int(round(np.sqrt(ape.shape[1])))
        params["absolute_pos_embed"] = ape.reshape(1, side, side, ape.shape[-1])

    for s, depth in enumerate(depths):
        for i in range(depth):
            p = f"layers.{s}.blocks.{i}"
            params[f"stage{s}_block{i}"] = {
                "norm1": norm(f"{p}.norm1"),
                "norm2": norm(f"{p}.norm2"),
                "attn": {
                    "qkv_kernel": sd[f"{p}.attn.qkv.weight"].T,
                    "q_bias": sd[f"{p}.attn.q_bias"],
                    "v_bias": sd[f"{p}.attn.v_bias"],
                    "logit_scale": sd[f"{p}.attn.logit_scale"],
                    "cpb_w1": sd[f"{p}.attn.cpb_mlp.0.weight"].T,
                    "cpb_b1": sd[f"{p}.attn.cpb_mlp.0.bias"],
                    "cpb_w2": sd[f"{p}.attn.cpb_mlp.2.weight"].T,
                    "proj": dense(f"{p}.attn.proj"),
                },
                "mlp": {
                    "fc1": dense(f"{p}.mlp.fc1"),
                    "fc2": dense(f"{p}.mlp.fc2"),
                },
            }
        if f"layers.{s}.downsample.reduction.weight" in sd:
            params[f"stage{s}_merge"] = {
                "reduction": dense(f"layers.{s}.downsample.reduction", has_bias=False),
                "norm": norm(f"layers.{s}.downsample.norm"),
            }

    params["norm"] = norm("norm")
    if "head.weight" in sd:
        params["head"] = dense("head")
    else:
        tiers = {}
        t = 0
        while f"head.heads.{t}.weight" in sd:
            tiers[f"tier{t}"] = dense(f"head.heads.{t}")
            t += 1
        if tiers:
            params["head"] = tiers
    return params


def export_swin_state_dict(params: Mapping) -> dict[str, np.ndarray]:
    """hvt.models.swinv2 flax params tree → torch SwinV2 state dict.

    The exact inverse of :func:`convert_swin_state_dict`, so hvt-trained
    SwinV2 weights round-trip into the Microsoft/reference torch format
    (reference swinv2.py:870-895 consumes these via ``swin://``) — a user of
    the reference can take an hvt checkpoint back to their torch tooling.
    Derived buffers (relative_position_index, relative_coords_table) are
    non-persistent in the reference and are not emitted.
    """
    params = jax_to_np(params)
    sd: dict[str, np.ndarray] = {}

    def dense(prefix, leaf, has_bias=True):
        sd[f"{prefix}.weight"] = leaf["kernel"].T
        if has_bias:
            sd[f"{prefix}.bias"] = leaf["bias"]

    def norm(prefix, leaf):
        sd[f"{prefix}.weight"] = leaf["scale"]
        sd[f"{prefix}.bias"] = leaf["bias"]

    sd["patch_embed.proj.weight"] = params["patch_embed"]["kernel"].transpose(3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = params["patch_embed"]["bias"]
    if "patch_norm" in params:
        norm("patch_embed.norm", params["patch_norm"])
    if "absolute_pos_embed" in params:
        ape = params["absolute_pos_embed"]  # (1, H, W, C)
        sd["absolute_pos_embed"] = ape.reshape(1, -1, ape.shape[-1])

    block_pat = re.compile(r"^stage(\d+)_block(\d+)$")
    merge_pat = re.compile(r"^stage(\d+)_merge$")
    for key, leaf in params.items():
        m = block_pat.match(key)
        if m:
            s, i = m.group(1), m.group(2)
            p = f"layers.{s}.blocks.{i}"
            norm(f"{p}.norm1", leaf["norm1"])
            norm(f"{p}.norm2", leaf["norm2"])
            attn = leaf["attn"]
            sd[f"{p}.attn.qkv.weight"] = attn["qkv_kernel"].T
            sd[f"{p}.attn.q_bias"] = attn["q_bias"]
            sd[f"{p}.attn.v_bias"] = attn["v_bias"]
            sd[f"{p}.attn.logit_scale"] = attn["logit_scale"]
            sd[f"{p}.attn.cpb_mlp.0.weight"] = attn["cpb_w1"].T
            sd[f"{p}.attn.cpb_mlp.0.bias"] = attn["cpb_b1"]
            sd[f"{p}.attn.cpb_mlp.2.weight"] = attn["cpb_w2"].T
            dense(f"{p}.attn.proj", attn["proj"])
            dense(f"{p}.mlp.fc1", leaf["mlp"]["fc1"])
            dense(f"{p}.mlp.fc2", leaf["mlp"]["fc2"])
            continue
        m = merge_pat.match(key)
        if m:
            s = m.group(1)
            dense(f"layers.{s}.downsample.reduction", leaf["reduction"], has_bias=False)
            norm(f"layers.{s}.downsample.norm", leaf["norm"])

    norm("norm", params["norm"])
    head = params.get("head")
    if head is not None:
        if "kernel" in head:
            dense("head", head)
        else:
            t = 0
            while f"tier{t}" in head:
                dense(f"head.heads.{t}", head[f"tier{t}"])
                t += 1
    return sd


def jax_to_np(tree):
    """Recursively materialize a (possibly device-resident) param tree as
    host numpy, preserving the dict structure."""
    if isinstance(tree, Mapping):
        return {k: jax_to_np(v) for k, v in tree.items()}
    return np.asarray(tree)


def save_swin_checkpoint(params: Mapping, path: str) -> int:
    """Write an hvt Swin params tree as a reference-format ``.pt`` file
    (``{"model": state_dict}``, reference swinv2.py:883-885) loadable by the
    reference's Checkpoint parser and by hvt's own ``swin://`` URIs.
    Returns the number of state-dict keys written."""
    import torch

    sd = {k: torch.tensor(np.asarray(v, np.float32))
          for k, v in export_swin_state_dict(params).items()}
    torch.save({"model": sd}, path)
    return len(sd)


def load_swin_checkpoint(uri: str, depths: tuple[int, ...] | None = None) -> dict:
    """swin://path → flax params. The .pt file holds {"model": state_dict}
    (reference swinv2.py:883-885)."""
    import torch

    path = parse_swin_uri(uri)
    blob = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = blob.get("model", blob)
    return convert_swin_state_dict(state_dict, depths)


# ---------------------------------------------------------------------------
# ResNet family (timm/torchvision naming: conv1/bn1, layer{s}.{b}, fc)
# ---------------------------------------------------------------------------


def infer_resnet_stage_sizes(state_dict: Mapping[str, np.ndarray]) -> tuple[int, ...]:
    """Stage sizes from ``layer{s}.{b}.*`` key names."""
    counts: dict[int, int] = {}
    pat = re.compile(r"^layer(\d+)\.(\d+)\.")
    for key in state_dict:
        m = pat.match(key)
        if m:
            s, b = int(m.group(1)), int(m.group(2))
            counts[s] = max(counts.get(s, 0), b + 1)
    if not counts:
        raise ValueError("no layer{s}.{b} keys — not a torch ResNet state dict?")
    return tuple(counts[s] for s in sorted(counts))


def convert_resnet_state_dict(
    state_dict: Mapping[str, np.ndarray], stem_s2d: bool = False
) -> tuple[dict, dict]:
    """Torch/timm ResNet state dict → (flax params, batch_stats) for
    hvt.models.resnet.

    Covers both block families (bottleneck conv1-3, basic conv1-2), the
    downsample shortcut, and the multitask-head surgery naming
    (``fc.heads.{t}``, reference hierarchy.py:50-62). BatchNorm running
    statistics convert alongside the weights — they are part of the model.
    ``stem_s2d=True`` targets the space-to-depth stem's param path
    (``stem/kernel``); the kernel itself is the standard (7, 7, 3, w) tensor
    either way (hvt.models.resnet.SpaceToDepthStem).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def convbn(dst: str, conv_key: str, bn_key: str):
        p, s = params, stats
        *parents, leaf = dst.split("/")
        for part in parents:
            p = p.setdefault(part, {})
            s = s.setdefault(part, {})
        p[leaf] = {
            "Conv_0": {"kernel": sd[f"{conv_key}.weight"].transpose(2, 3, 1, 0)},
            "BatchNorm_0": {"scale": sd[f"{bn_key}.weight"],
                            "bias": sd[f"{bn_key}.bias"]},
        }
        s[leaf] = {"BatchNorm_0": {"mean": sd[f"{bn_key}.running_mean"],
                                   "var": sd[f"{bn_key}.running_var"]}}

    convbn("stem", "conv1", "bn1")
    if stem_s2d:
        # same kernel, flat param path (stem/kernel + stem/BatchNorm_0)
        stem = params.pop("stem")
        params["stem"] = {"kernel": stem["Conv_0"]["kernel"],
                          "BatchNorm_0": stem["BatchNorm_0"]}

    for s, blocks in enumerate(infer_resnet_stage_sizes(sd), start=1):
        for b in range(blocks):
            src = f"layer{s}.{b}"
            dst = f"stage{s}_block{b}"
            for i in (1, 2, 3):
                if f"{src}.conv{i}.weight" in sd:
                    convbn(f"{dst}/conv{i}", f"{src}.conv{i}", f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                convbn(f"{dst}/downsample", f"{src}.downsample.0", f"{src}.downsample.1")

    if "fc.weight" in sd:
        params["head"] = {"kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]}
    else:
        tiers = {}
        t = 0
        while f"fc.heads.{t}.weight" in sd:
            tiers[f"tier{t}"] = {"kernel": sd[f"fc.heads.{t}.weight"].T,
                                 "bias": sd[f"fc.heads.{t}.bias"]}
            t += 1
        if tiers:
            params["head"] = tiers
    return params, stats


def export_resnet_state_dict(params: Mapping, batch_stats: Mapping) -> dict[str, np.ndarray]:
    """(flax params, batch_stats) → torch/timm ResNet state dict — the exact
    inverse of :func:`convert_resnet_state_dict`. ``num_batches_tracked``
    buffers are emitted as zeros (torch tracks them; hvt does not need to)."""
    params = jax_to_np(params)
    batch_stats = jax_to_np(batch_stats)
    sd: dict[str, np.ndarray] = {}

    def convbn(src_p: Mapping, src_s: Mapping, conv_key: str, bn_key: str):
        if "Conv_0" in src_p:
            kernel = src_p["Conv_0"]["kernel"]
            bn = src_p["BatchNorm_0"]
        else:  # space-to-depth stem: flat kernel param
            kernel = src_p["kernel"]
            bn = src_p["BatchNorm_0"]
        sd[f"{conv_key}.weight"] = kernel.transpose(3, 2, 0, 1)
        sd[f"{bn_key}.weight"] = bn["scale"]
        sd[f"{bn_key}.bias"] = bn["bias"]
        sd[f"{bn_key}.running_mean"] = src_s["BatchNorm_0"]["mean"]
        sd[f"{bn_key}.running_var"] = src_s["BatchNorm_0"]["var"]
        sd[f"{bn_key}.num_batches_tracked"] = np.zeros((), np.int64)

    convbn(params["stem"], batch_stats["stem"], "conv1", "bn1")
    pat = re.compile(r"^stage(\d+)_block(\d+)$")
    for key in params:
        m = pat.match(key)
        if not m:
            continue
        s, b = m.group(1), m.group(2)
        src = f"layer{s}.{b}"
        for i in (1, 2, 3):
            if f"conv{i}" in params[key]:
                convbn(params[key][f"conv{i}"], batch_stats[key][f"conv{i}"],
                       f"{src}.conv{i}", f"{src}.bn{i}")
        if "downsample" in params[key]:
            convbn(params[key]["downsample"], batch_stats[key]["downsample"],
                   f"{src}.downsample.0", f"{src}.downsample.1")

    head = params.get("head")
    if head is not None:
        if "kernel" in head:
            sd["fc.weight"] = head["kernel"].T
            sd["fc.bias"] = head["bias"]
        else:
            t = 0
            while f"tier{t}" in head:
                sd[f"fc.heads.{t}.weight"] = head[f"tier{t}"]["kernel"].T
                sd[f"fc.heads.{t}.bias"] = head[f"tier{t}"]["bias"]
                t += 1
    return sd


def save_resnet_checkpoint(params: Mapping, batch_stats: Mapping, path: str) -> int:
    """Write hvt ResNet variables as a torch-format ``.pt``
    (``{"model": state_dict}``, matching the Swin convention here).
    Returns the number of state-dict keys written."""
    import torch

    sd = {}
    for k, v in export_resnet_state_dict(params, batch_stats).items():
        dtype = torch.int64 if v.dtype == np.int64 else torch.float32
        sd[k] = torch.tensor(np.asarray(v), dtype=dtype)
    torch.save({"model": sd}, path)
    return len(sd)


# ---------------------------------------------------------------------------
# ViT (HF transformers and timm layouts)
# ---------------------------------------------------------------------------


def _strip_prefix(sd: dict, prefix: str) -> dict:
    if any(k.startswith(prefix) for k in sd):
        return {
            (k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in sd.items()
        }
    return sd


def convert_vit_state_dict(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Torch ViT state dict → hvt.models.vit flax params tree.

    Accepts both layouts the reference ecosystem produces: timm
    (``blocks.{i}.attn.qkv``, the layout ``timm.create_model`` checkpoints
    use, reference models.py:16-25) and HF transformers
    (``[vit.]encoder.layer.{i}.attention.attention.{query,key,value}`` —
    the parity oracle in tests/test_vit.py). HF's separate q/k/v Linears
    are concatenated into the fused qkv Dense (out-dim order [q;k;v],
    heads-major within each — identical to timm's qkv layout).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    sd = _strip_prefix(sd, "vit.")
    params: dict = {}

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def norm(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    hf = any(k.startswith("encoder.layer.") for k in sd)
    if hf:
        params["cls_token"] = sd["embeddings.cls_token"]
        params["pos_embed"] = sd["embeddings.position_embeddings"]
        proj = "embeddings.patch_embeddings.projection"
    else:
        params["cls_token"] = sd["cls_token"]
        params["pos_embed"] = sd["pos_embed"]
        proj = "patch_embed.proj"
    params["patch_embed"] = {
        "kernel": sd[f"{proj}.weight"].transpose(2, 3, 1, 0),  # OIHW → HWIO
        "bias": sd[f"{proj}.bias"],
    }

    def n_blocks(prefix):
        pat = re.compile(rf"^{re.escape(prefix)}(\d+)\.")
        idx = [int(m.group(1)) for k in sd if (m := pat.match(k))]
        if not idx:
            raise ValueError(f"no {prefix}* keys — not a ViT state dict?")
        return max(idx) + 1

    if hf:
        for i in range(n_blocks("encoder.layer.")):
            p = f"encoder.layer.{i}"
            qkv_w = np.concatenate(
                [sd[f"{p}.attention.attention.{n}.weight"]
                 for n in ("query", "key", "value")], axis=0)
            qkv_b = np.concatenate(
                [sd[f"{p}.attention.attention.{n}.bias"]
                 for n in ("query", "key", "value")], axis=0)
            params[f"block{i}"] = {
                "norm1": norm(f"{p}.layernorm_before"),
                "norm2": norm(f"{p}.layernorm_after"),
                "attn": {
                    "qkv": {"kernel": qkv_w.T, "bias": qkv_b},
                    "proj": dense(f"{p}.attention.output.dense"),
                },
                "mlp": {
                    "fc1": dense(f"{p}.intermediate.dense"),
                    "fc2": dense(f"{p}.output.dense"),
                },
            }
        params["norm"] = norm("layernorm")
    else:
        for i in range(n_blocks("blocks.")):
            p = f"blocks.{i}"
            params[f"block{i}"] = {
                "norm1": norm(f"{p}.norm1"),
                "norm2": norm(f"{p}.norm2"),
                "attn": {
                    "qkv": dense(f"{p}.attn.qkv"),
                    "proj": dense(f"{p}.attn.proj"),
                },
                "mlp": {
                    "fc1": dense(f"{p}.mlp.fc1"),
                    "fc2": dense(f"{p}.mlp.fc2"),
                },
            }
        params["norm"] = norm("norm")

    head = "classifier" if hf else "head"
    if f"{head}.weight" in sd:
        params["head"] = dense(head)
    return params


def resize_pos_embed(pos: np.ndarray, new_grid: int) -> np.ndarray:
    """Bicubically resize a (1, g²+1, D) position embedding to a
    (1, new_grid²+1, D) one, keeping the class-token slot — the HF/DINOv2
    interpolate_pos_encoding rule applied STATICALLY at load time, so the
    compiled graph keeps static shapes."""
    import jax

    n = pos.shape[1] - 1
    g = int(round(n ** 0.5))
    if g * g != n:
        raise ValueError(f"pos embed grid {n} is not square")
    if g == new_grid:
        return pos
    cls, grid = pos[:, :1], pos[0, 1:].reshape(g, g, -1)
    grid = np.asarray(jax.image.resize(
        jnp_asarray_f32(grid), (new_grid, new_grid, grid.shape[-1]),
        method="bicubic",
    ), dtype=pos.dtype)
    return np.concatenate(
        [cls, grid.reshape(1, new_grid * new_grid, -1)], axis=1
    )


def jnp_asarray_f32(x: np.ndarray):
    import jax.numpy as jnp

    return jnp.asarray(x, jnp.float32)


def convert_dinov2_state_dict(
    state_dict: Mapping[str, np.ndarray], grid: int | None = None
) -> dict:
    """Torch DINOv2 state dict → hvt.models.dinov2 flax params tree.

    Accepts the HF transformers layout (``dinov2.embeddings.*``,
    ``dinov2.encoder.layer.{i}.*`` — the parity oracle in
    tests/test_dinov2.py). HF's separate q/k/v Linears concatenate into
    the fused qkv Dense ([q;k;v] out-dim order, heads-major within each);
    the SwiGLU layout (``mlp.weights_in|weights_out``, giant variant) and
    the plain MLP (``mlp.fc1|fc2``) both convert. ``grid`` optionally
    resizes the position embedding to a new patch grid (resize_pos_embed)
    for loading patch-14 checkpoints at other resolutions.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    sd = _strip_prefix(sd, "dinov2.")
    params: dict = {}

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def norm(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params["cls_token"] = sd["embeddings.cls_token"]
    pos = sd["embeddings.position_embeddings"]
    if grid is not None:
        pos = resize_pos_embed(pos, grid)
    params["pos_embed"] = pos
    proj = "embeddings.patch_embeddings.projection"
    params["patch_embed"] = {
        "kernel": sd[f"{proj}.weight"].transpose(2, 3, 1, 0),  # OIHW → HWIO
        "bias": sd[f"{proj}.bias"],
    }

    i = 0
    while f"encoder.layer.{i}.norm1.weight" in sd:
        p = f"encoder.layer.{i}"
        qkv_w = np.concatenate(
            [sd[f"{p}.attention.attention.{n}.weight"]
             for n in ("query", "key", "value")], axis=0)
        qkv_b = np.concatenate(
            [sd[f"{p}.attention.attention.{n}.bias"]
             for n in ("query", "key", "value")], axis=0)
        if f"{p}.mlp.weights_in.weight" in sd:  # SwiGLU (giant)
            mlp = {"weights_in": dense(f"{p}.mlp.weights_in"),
                   "weights_out": dense(f"{p}.mlp.weights_out")}
        else:
            mlp = {"fc1": dense(f"{p}.mlp.fc1"),
                   "fc2": dense(f"{p}.mlp.fc2")}
        params[f"block{i}"] = {
            "norm1": norm(f"{p}.norm1"),
            "norm2": norm(f"{p}.norm2"),
            "attn": {
                "qkv": {"kernel": qkv_w.T, "bias": qkv_b},
                "proj": dense(f"{p}.attention.output.dense"),
            },
            "mlp": mlp,
            "ls1": sd[f"{p}.layer_scale1.lambda1"],
            "ls2": sd[f"{p}.layer_scale2.lambda1"],
        }
        i += 1
    if i == 0:
        raise ValueError("no encoder.layer.* keys — not a DINOv2 state dict?")

    params["norm"] = norm("layernorm")
    if "classifier.weight" in sd:
        params["head"] = dense("classifier")
    return params


# ---------------------------------------------------------------------------
# ConvNeXt (HF transformers and timm layouts)
# ---------------------------------------------------------------------------


def convert_convnext_state_dict(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Torch ConvNeXt state dict → hvt.models.convnext flax params tree.

    Accepts timm (``stages.{s}.blocks.{i}.conv_dw``/``.mlp.fc{1,2}``/
    ``.gamma``) and HF transformers (``[convnext.]encoder.stages.{s}.
    layers.{i}.dwconv``/``.pwconv{1,2}``/``.layer_scale_parameter`` — the
    parity oracle in tests/test_convnext.py) layouts.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    sd = _strip_prefix(sd, "convnext.")
    params: dict = {}

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def norm(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def conv(prefix):
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0),
                "bias": sd[f"{prefix}.bias"]}

    hf = any(k.startswith("encoder.stages.") for k in sd)
    if hf:
        params["stem_conv"] = conv("embeddings.patch_embeddings")
        params["stem_norm"] = norm("embeddings.layernorm")
        stage_prefix, block_sub = "encoder.stages.", "layers"
    else:
        params["stem_conv"] = conv("stem.0")
        params["stem_norm"] = norm("stem.1")
        stage_prefix, block_sub = "stages.", "blocks"

    stages = sorted({
        int(m.group(1))
        for k in sd
        if (m := re.match(rf"^{re.escape(stage_prefix)}(\d+)\.", k))
    })
    for s in stages:
        sp = f"{stage_prefix}{s}"
        if hf and s > 0:
            params[f"downsample{s}_norm"] = norm(f"{sp}.downsampling_layer.0")
            params[f"downsample{s}_conv"] = conv(f"{sp}.downsampling_layer.1")
        elif not hf and f"{sp}.downsample.1.weight" in sd:
            params[f"downsample{s}_norm"] = norm(f"{sp}.downsample.0")
            params[f"downsample{s}_conv"] = conv(f"{sp}.downsample.1")
        blocks = sorted({
            int(m.group(1))
            for k in sd
            if (m := re.match(
                rf"^{re.escape(sp)}\.{block_sub}\.(\d+)\.", k))
        })
        for i in blocks:
            p = f"{sp}.{block_sub}.{i}"
            if hf:
                params[f"stage{s}_block{i}"] = {
                    "dwconv": conv(f"{p}.dwconv"),
                    "norm": norm(f"{p}.layernorm"),
                    "mlp": {"fc1": dense(f"{p}.pwconv1"),
                            "fc2": dense(f"{p}.pwconv2")},
                    "gamma": sd[f"{p}.layer_scale_parameter"],
                }
            else:
                params[f"stage{s}_block{i}"] = {
                    "dwconv": conv(f"{p}.conv_dw"),
                    "norm": norm(f"{p}.norm"),
                    "mlp": {"fc1": dense(f"{p}.mlp.fc1"),
                            "fc2": dense(f"{p}.mlp.fc2")},
                    "gamma": sd[f"{p}.gamma"],
                }

    if hf:
        params["norm"] = norm("layernorm")
        if "classifier.weight" in sd:
            params["head"] = dense("classifier")
    else:
        params["norm"] = norm("head.norm" if "head.norm.weight" in sd
                              else "norm")
        if "head.fc.weight" in sd:
            params["head"] = dense("head.fc")
    return params


def convert_efficientnet_state_dict(
    state_dict: Mapping[str, np.ndarray],
) -> tuple[dict, dict]:
    """Torch EfficientNet state dict → (flax params, batch_stats) for
    hvt.models.efficientnet.

    Accepts the HF transformers layout (``efficientnet.embeddings.*``,
    ``efficientnet.encoder.blocks.{i}.*`` — the parity oracle in
    tests/test_efficientnet.py). BatchNorm running statistics convert
    alongside the weights — they are part of the model. Conv kernels
    transpose (O, I, kh, kw) → (kh, kw, I, O); the depthwise kernel
    (C, 1, k, k) lands as (k, k, 1, C) for feature_group_count=C.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    sd = _strip_prefix(sd, "efficientnet.")
    params: dict = {}
    stats: dict = {}

    def conv(prefix, bias=False):
        out = {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def bn(dst_parent: dict, stats_parent: dict, name: str, prefix: str):
        dst_parent[name] = {"scale": sd[f"{prefix}.weight"],
                            "bias": sd[f"{prefix}.bias"]}
        stats_parent[name] = {"mean": sd[f"{prefix}.running_mean"],
                              "var": sd[f"{prefix}.running_var"]}

    params["stem_conv"] = conv("embeddings.convolution")
    bn(params, stats, "stem_bn", "embeddings.batchnorm")

    i = 0
    while f"encoder.blocks.{i}.depthwise_conv.depthwise_conv.weight" in sd:
        src = f"encoder.blocks.{i}"
        p, s = {}, {}
        if f"{src}.expansion.expand_conv.weight" in sd:
            p["expand_conv"] = conv(f"{src}.expansion.expand_conv")
            bn(p, s, "expand_bn", f"{src}.expansion.expand_bn")
        p["dwconv"] = conv(f"{src}.depthwise_conv.depthwise_conv")
        bn(p, s, "dw_bn", f"{src}.depthwise_conv.depthwise_norm")
        p["se_reduce"] = conv(f"{src}.squeeze_excite.reduce", bias=True)
        p["se_expand"] = conv(f"{src}.squeeze_excite.expand", bias=True)
        p["project_conv"] = conv(f"{src}.projection.project_conv")
        bn(p, s, "project_bn", f"{src}.projection.project_bn")
        params[f"block{i}"] = p
        stats[f"block{i}"] = s
        i += 1

    params["top_conv"] = conv("encoder.top_conv")
    bn(params, stats, "top_bn", "encoder.top_bn")
    if "classifier.weight" in sd:
        params["head"] = {"kernel": sd["classifier.weight"].T,
                          "bias": sd["classifier.bias"]}
    else:
        tiers = {}
        t = 0
        while f"classifier.heads.{t}.weight" in sd:
            tiers[f"tier{t}"] = {"kernel": sd[f"classifier.heads.{t}.weight"].T,
                                 "bias": sd[f"classifier.heads.{t}.bias"]}
            t += 1
        if tiers:
            params["head"] = tiers
    return params, stats


def convert_regnet_state_dict(
    state_dict: Mapping[str, np.ndarray],
) -> tuple[dict, dict]:
    """Torch RegNet-Y state dict → (flax params, batch_stats) for
    hvt.models.regnet.

    Accepts the HF transformers layout (``regnet.embedder.*``,
    ``regnet.encoder.stages.{s}.layers.{b}.*`` — the parity oracle in
    tests/test_regnet.py). The Y layer's nn.Sequential indices map
    0→conv1, 1→grouped conv2, 2→squeeze-excite, 3→conv3; grouped conv
    kernels (O, I/g, 3, 3) land as (3, 3, I/g, O), which is exactly
    flax's layout for ``feature_group_count=g``.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    sd = _strip_prefix(sd, "regnet.")
    params: dict = {}
    stats: dict = {}

    def conv(prefix, bias=False):
        out = {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def bn(dst_parent: dict, stats_parent: dict, name: str, prefix: str):
        dst_parent[name] = {"scale": sd[f"{prefix}.weight"],
                            "bias": sd[f"{prefix}.bias"]}
        stats_parent[name] = {"mean": sd[f"{prefix}.running_mean"],
                              "var": sd[f"{prefix}.running_var"]}

    params["stem_conv"] = conv("embedder.embedder.convolution")
    bn(params, stats, "stem_bn", "embedder.embedder.normalization")

    s_idx = 0
    while f"encoder.stages.{s_idx}.layers.0.layer.0.convolution.weight" in sd:
        b_idx = 0
        while (f"encoder.stages.{s_idx}.layers.{b_idx}.layer.0."
               "convolution.weight") in sd:
            src = f"encoder.stages.{s_idx}.layers.{b_idx}"
            p, st = {}, {}
            p["conv1"] = conv(f"{src}.layer.0.convolution")
            bn(p, st, "bn1", f"{src}.layer.0.normalization")
            p["conv2"] = conv(f"{src}.layer.1.convolution")
            bn(p, st, "bn2", f"{src}.layer.1.normalization")
            p["se_reduce"] = conv(f"{src}.layer.2.attention.0", bias=True)
            p["se_expand"] = conv(f"{src}.layer.2.attention.2", bias=True)
            p["conv3"] = conv(f"{src}.layer.3.convolution")
            bn(p, st, "bn3", f"{src}.layer.3.normalization")
            if f"{src}.shortcut.convolution.weight" in sd:
                p["sc_conv"] = conv(f"{src}.shortcut.convolution")
                bn(p, st, "sc_bn", f"{src}.shortcut.normalization")
            params[f"stage{s_idx}_block{b_idx}"] = p
            stats[f"stage{s_idx}_block{b_idx}"] = st
            b_idx += 1
        s_idx += 1

    if "classifier.1.weight" in sd:
        params["head"] = {"kernel": sd["classifier.1.weight"].T,
                          "bias": sd["classifier.1.bias"]}
    else:
        tiers = {}
        t = 0
        while f"classifier.heads.{t}.weight" in sd:
            tiers[f"tier{t}"] = {"kernel": sd[f"classifier.heads.{t}.weight"].T,
                                 "bias": sd[f"classifier.heads.{t}.bias"]}
            t += 1
        if tiers:
            params["head"] = tiers
    return params, stats


# ---------------------------------------------------------------------------
# Family-detecting torch:// loader
# ---------------------------------------------------------------------------

_TORCH_URI = re.compile(r"^torch://(.+)$")


def load_torch_variables(uri: str) -> tuple[dict, dict]:
    """``torch://<path>`` (or ``swin://<path>``) → (flax params, batch_stats).

    Detects the model family from the state-dict key names: ``layers.*``
    (SwinV2, reference swinv2.py) or ``layer1.*``/``conv1`` (timm ResNet).
    SwinV2 has no batch statistics (LayerNorm) — its stats tree is empty.
    """
    import torch

    m = _TORCH_URI.match(uri) or _SWIN_URI.match(uri)
    if not m:
        raise ValueError(f"uri {uri!r} doesn't match torch://<path> or swin://<path>")
    blob = torch.load(m.group(1), map_location="cpu", weights_only=True)
    sd = blob.get("model", blob.get("state_dict", blob))
    if any(k.startswith("layers.") for k in sd):
        return convert_swin_state_dict(sd), {}
    if any(k.startswith("layer1.") for k in sd) or "conv1.weight" in sd:
        return convert_resnet_state_dict(sd)
    # DINOv2 before ViT: both carry cls_token/encoder.layer.* keys, but
    # only DINOv2 has LayerScale lambdas.
    if any("layer_scale1" in k for k in sd) or any(
        k.startswith("dinov2.") for k in sd
    ):
        return convert_dinov2_state_dict(sd), {}
    if any("cls_token" in k for k in sd) or any(
        k.startswith(("encoder.layer.", "vit.encoder.layer.")) for k in sd
    ):
        return convert_vit_state_dict(sd), {}
    # RegNet before ConvNeXt: both carry encoder.stages.* keys, but only
    # RegNet has the embedder stem / per-stage `layers.{b}.layer.` nesting.
    if any(k.startswith(("regnet.", "embedder.")) for k in sd):
        return convert_regnet_state_dict(sd)
    if any(
        k.startswith(("stages.", "encoder.stages.", "convnext.")) for k in sd
    ) or "stem.0.weight" in sd:
        return convert_convnext_state_dict(sd), {}
    if any(
        k.startswith(("efficientnet.", "encoder.blocks.", "embeddings.convolution"))
        for k in sd
    ):
        return convert_efficientnet_state_dict(sd)
    raise ValueError(
        f"torch checkpoint {uri!r}: unrecognized family (expected SwinV2 "
        "'layers.*', ResNet 'layer{s}.{b}'/'conv1', DINOv2 'layer_scale1', ViT "
        "'cls_token'/'encoder.layer.*', RegNet 'embedder.*', ConvNeXt "
        "'stages.*', or EfficientNet 'encoder.blocks.*' key names)"
    )
