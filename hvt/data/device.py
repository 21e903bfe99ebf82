"""Device-side batch preparation — pure functions composed into the jitted step.

The reference runs normalization as a Composer DataSpec device transform
(reference data.py:136,153-164) and label smoothing / mixup as Trainer event
hooks (reference algorithmic.py:88-119, configs/recipes/hot.yaml:36-39).
Here they are jnp functions fused by XLA into the forward pass: uint8 pixels
cross PCIe/ICI, everything float happens on-chip in the compute dtype.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def scale_channel_stats(
    mean: tuple[float, ...], std: tuple[float, ...]
) -> tuple[tuple[float, ...], tuple[float, ...]]:
    """×255 when stats are given in [0, 1], since batches are uint8 0-255
    (reference data.py:130-136)."""
    if all(m < 1 for m in mean):
        mean = tuple(m * 255.0 for m in mean)
    if all(s < 1 for s in std):
        std = tuple(s * 255.0 for s in std)
    return mean, std


@dataclasses.dataclass(frozen=True)
class DevicePrep:
    """Normalization constants + compute dtype for on-device prep."""

    mean: tuple[float, ...]
    std: tuple[float, ...]
    compute_dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def from_config(cls, data_cfg, precision_cfg) -> "DevicePrep":
        mean, std = scale_channel_stats(
            tuple(data_cfg.channel_mean), tuple(data_cfg.channel_std)
        )
        return cls(mean=mean, std=std, compute_dtype=jnp.dtype(precision_cfg.compute_dtype))

    def normalize(self, images: jax.Array) -> jax.Array:
        """uint8 NHWC → normalized compute-dtype NHWC."""
        mean = jnp.asarray(self.mean, dtype=jnp.float32)
        std = jnp.asarray(self.std, dtype=jnp.float32)
        x = images.astype(jnp.float32)
        x = (x - mean) / std
        return x.astype(self.compute_dtype)


def one_hot(labels: jax.Array, num_classes: int, dtype=jnp.float32) -> jax.Array:
    return jax.nn.one_hot(labels, num_classes, dtype=dtype)


def smooth_labels(onehot: jax.Array, smoothing: float) -> jax.Array:
    """(1-s)·onehot + s/n (reference algorithmic.py:160-164)."""
    n = onehot.shape[-1]
    return onehot * (1.0 - smoothing) + smoothing / n


def mixup(
    key: jax.Array,
    images: jax.Array,
    onehot: jax.Array | list[jax.Array],
    alpha: float = 0.2,
) -> tuple[jax.Array, jax.Array | list[jax.Array]]:
    """MixUp with a shared Beta(alpha, alpha) coefficient and a batch roll.

    Rolling by one (instead of a random permutation) matches standard
    single-coefficient mixup implementations and keeps the op layout-friendly.
    Supports multitask targets (a list of per-tier one-hot arrays).
    """
    lam = jax.random.beta(key, alpha, alpha, dtype=jnp.float32)
    mixed_images = (
        lam.astype(images.dtype) * images
        + (1.0 - lam).astype(images.dtype) * jnp.roll(images, 1, axis=0)
    )

    def mix_target(t):
        return lam * t + (1.0 - lam) * jnp.roll(t, 1, axis=0)

    if isinstance(onehot, list):
        return mixed_images, [mix_target(t) for t in onehot]
    return mixed_images, mix_target(onehot)


def cutmix(
    key: jax.Array,
    images: jax.Array,
    onehot: jax.Array | list[jax.Array],
    alpha: float = 1.0,
) -> tuple[jax.Array, jax.Array | list[jax.Array]]:
    """CutMix: paste a random box from the rolled batch; targets mix by area."""
    kbeta, kx, ky = jax.random.split(key, 3)
    lam = jax.random.beta(kbeta, alpha, alpha, dtype=jnp.float32)

    _, h, w, _ = images.shape
    cut_ratio = jnp.sqrt(1.0 - lam)
    cut_h = (cut_ratio * h).astype(jnp.int32)
    cut_w = (cut_ratio * w).astype(jnp.int32)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)

    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)

    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]
    box = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))

    rolled = jnp.roll(images, 1, axis=0)
    mixed_images = jnp.where(box, rolled, images)

    area = ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / float(h * w)
    lam_eff = 1.0 - area

    def mix_target(t):
        return lam_eff * t + (1.0 - lam_eff) * jnp.roll(t, 1, axis=0)

    if isinstance(onehot, list):
        return mixed_images, [mix_target(t) for t in onehot]
    return mixed_images, mix_target(onehot)


def colout(
    key: jax.Array, images: jax.Array, p_row: float = 0.05, p_col: float = 0.05
) -> jax.Array:
    """Device-side ColOut (reference recipe configs/recipes/hot.yaml:40-43):
    per-sample row/column dropping inside the compiled train step.

    Drops exactly ``round(p·H)`` rows and ``round(p·W)`` columns per sample
    (independent indices per image) and bilinear-resizes back to (H, W) so
    the step keeps static shapes. The host path
    (hvt/data/transforms.colout) drops each row independently with
    probability p — a binomial count; the device law fixes the count at its
    expectation. Same resize-back convention as the host path. Moving this
    off the host frees ~1.7 ms/img/core of PIL/numpy work in the hot
    recipe; the on-device gather + resize measures 3.2% of the R50 b256
    train step (2583 → 2502 img/s, BENCH.md) — a net win only when the run
    is host-input-bound, hence opt-in (`args.device: true`).
    """
    b, h, w, c = images.shape
    # Keep at least one row/col, like the host path (transforms.py colout).
    keep_h = max(1, h - int(round(p_row * h)))
    keep_w = max(1, w - int(round(p_col * w)))
    if keep_h >= h and keep_w >= w:
        return images
    kr, kc = jax.random.split(key)

    def keep_idx(k, n, keep):
        return jnp.sort(jax.random.permutation(k, n)[:keep])

    rows = jax.vmap(lambda k: keep_idx(k, h, keep_h))(jax.random.split(kr, b))
    cols = jax.vmap(lambda k: keep_idx(k, w, keep_w))(jax.random.split(kc, b))
    x = jnp.take_along_axis(images, rows[:, :, None, None], axis=1)
    x = jnp.take_along_axis(x, cols[:, None, :, None], axis=2)
    x = jax.image.resize(x.astype(jnp.float32), (b, h, w, c), method="bilinear")
    return jnp.clip(jnp.round(x), 0, 255).astype(images.dtype)


def progressive_resize(
    images: jax.Array, scale: float, method: str = "linear"
) -> jax.Array:
    """Downscale a batch on device (ProgressiveResizing analog,
    configs/pretrain/inat21.yaml:38-42). `scale` must be a Python float so
    the output shape is static; callers bucket scales to a small fixed set
    to bound recompilation (SURVEY.md §7 hard parts)."""
    if scale >= 1.0:
        return images
    b, h, w, c = images.shape
    nh = max(1, int(h * scale + 0.5))
    nw = max(1, int(w * scale + 0.5))
    # Round to a multiple of 8 for friendlier TPU tiling.
    nh = max(8, (nh // 8) * 8)
    nw = max(8, (nw // 8) * 8)
    return jax.image.resize(images, (b, nh, nw, c), method=method)


def prepare_targets(
    labels: jax.Array,
    num_classes: int | tuple[int, ...],
    smoothing: float = 0.0,
    dtype=jnp.float32,
) -> jax.Array | list[jax.Array]:
    """int labels → (smoothed) one-hot; multitask gets a per-tier list.

    The reference smooths each tier independently before the loss
    (reference algorithmic.py:97-110).
    """
    if isinstance(num_classes, tuple):
        out = []
        for tier, n in enumerate(num_classes):
            oh = one_hot(labels[:, tier], n, dtype=dtype)
            out.append(smooth_labels(oh, smoothing) if smoothing else oh)
        return out
    oh = one_hot(labels, num_classes, dtype=dtype)
    return smooth_labels(oh, smoothing) if smoothing else oh
