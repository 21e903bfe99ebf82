"""Windowed cosine attention — SwinV2's inner loop.

Semantics follow the reference WindowAttention (reference swinv2.py:204-264):

    attn = clamp_exp(logit_scale) · (q̂ · k̂ᵀ) + 16·σ(cpb_bias) [+ shift_mask]
    out  = softmax(attn) · v

with q̂, k̂ L2-normalized per head (cosine attention), logit_scale clamped at
log(100) (reference swinv2.py:135-138,230), and the continuous relative
position bias produced by a 2-layer MLP over log-spaced coordinates
(reference swinv2.py:141-190,233-247).

Two interchangeable implementations:

* :func:`window_attention_reference` — pure jnp, the parity oracle,
* :func:`window_attention` — dispatches to the Pallas TPU kernel when
  available/enabled, else the reference path. The window length (49 or 64
  tokens) is far below MXU tile width, so the kernel's job is fusing the
  normalize→matmul→bias→mask→softmax→matmul chain and batching windows onto
  the MXU without HBM round-trips (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def relative_coords_table(window_size: int, pretrained_window_size: int = 0) -> np.ndarray:
    """(2w-1, 2w-1, 2) log-spaced relative coordinates in [-1, 1]
    (reference swinv2.py:147-173)."""
    w = window_size
    coords = np.arange(-(w - 1), w, dtype=np.float32)
    table = np.stack(np.meshgrid(coords, coords, indexing="ij"), axis=-1)
    denom = (pretrained_window_size - 1) if pretrained_window_size > 0 else (w - 1)
    table = table / max(denom, 1)
    table = table * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table  # (2w-1, 2w-1, 2)


def relative_position_index(window_size: int) -> np.ndarray:
    """(w², w²) flat index into the (2w-1)² bias table
    (reference swinv2.py:176-190)."""
    w = window_size
    coords = np.stack(
        np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    ).reshape(2, -1)  # (2, w²)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, w², w²)
    rel = rel.transpose(1, 2, 0) + (w - 1)  # to [0, 2w-2]
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) → (B·nW, window², C) (reference swinv2.py:69-86)."""
    b, h, w, c = x.shape
    if h % window or w % window:
        raise ValueError(
            f"feature grid {h}x{w} is not divisible by window_size {window} "
            f"(image size must keep every stage's grid a multiple of the "
            f"window; the reference has the same constraint — e.g. use "
            f"window 7 at 224 px or the *_window12_192 / *_window8_256 "
            f"variants at their native sizes)"
        )
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(windows: jax.Array, window: int, h: int, w: int) -> jax.Array:
    """(B·nW, window², C) → (B, H, W, C) (reference swinv2.py:89-103)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // window) * (w // window))
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def shift_attn_mask(resolution: tuple[int, int], window: int, shift: int) -> np.ndarray:
    """(nW, w², w²) additive mask (0 / -100) for shifted windows
    (reference swinv2.py:357-384). Pure numpy — a compile-time constant."""
    h, w = resolution
    img = np.zeros((1, h, w, 1), dtype=np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    # numpy window partition
    img = img.reshape(1, h // window, window, w // window, window, 1)
    img = img.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def cpb_bias(
    cpb_w1: jax.Array,
    cpb_b1: jax.Array,
    cpb_w2: jax.Array,
    coords: jax.Array,
    rel_index: jax.Array,
    num_heads: int,
) -> jax.Array:
    """Continuous relative position bias → (heads, w², w²)
    (reference swinv2.py:233-246): 2-layer MLP (512 hidden, ReLU, no bias on
    the output layer) over the coords table, gathered per token pair, scaled
    16·sigmoid."""
    table = coords.reshape(-1, 2)  # ((2w-1)², 2)
    hidden = jax.nn.relu(table @ cpb_w1 + cpb_b1)  # ((2w-1)², 512)
    bias_table = hidden @ cpb_w2  # ((2w-1)², heads)
    n = rel_index.shape[0]
    bias = bias_table[rel_index.reshape(-1)].reshape(n, n, num_heads)
    bias = 16.0 * jax.nn.sigmoid(bias)
    return bias.transpose(2, 0, 1)  # (heads, w², w²)


def window_attention_reference(
    q: jax.Array,  # (nWB, heads, N, head_dim)
    k: jax.Array,
    v: jax.Array,
    logit_scale: jax.Array,  # (heads, 1, 1)
    bias: jax.Array,  # (heads, N, N)
    mask: jax.Array | None = None,  # (nW, N, N) additive
) -> jax.Array:
    """Pure-jnp cosine window attention (the parity oracle). Returns
    (nWB, heads, N, head_dim)."""
    compute_dtype = q.dtype
    qn = q / jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32), axis=-1, keepdims=True), 1e-12)
    kn = k / jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True), 1e-12)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qn.astype(jnp.float32), kn.astype(jnp.float32))
    scale = jnp.exp(jnp.minimum(logit_scale, jnp.log(1.0 / 0.01)))
    attn = attn * scale
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        n_windows = mask.shape[0]
        b = q.shape[0] // n_windows
        attn = attn.reshape(b, n_windows, *attn.shape[1:]) + mask[None, :, None].astype(
            attn.dtype
        )
        attn = attn.reshape(-1, *attn.shape[2:])
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(compute_dtype), v)
    return out


@functools.cache
def _on_tpu() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        # the axon platform is a TPU behind an experimental PJRT plugin
        return jax.default_backend() in ("tpu", "axon") or any(
            d.platform in ("tpu", "axon") for d in jax.devices()
        )
    except Exception:
        return False


def _pallas_available() -> bool:
    from hvt import ops as ops_pkg

    # force_tpu_lowering: cross-platform lowering (jax.export --native)
    # must emit Mosaic kernels even from a CPU host.
    return ops_pkg.tpu_lowering_forced() or _on_tpu()


def window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    logit_scale: jax.Array,
    bias: jax.Array,
    mask: jax.Array | None = None,
    use_pallas: bool = True,
) -> jax.Array:
    """Dispatch: Pallas TPU kernel when on TPU, jnp reference otherwise."""
    if use_pallas and _pallas_available():
        from hvt import parallel
        from hvt.ops import window_attention_pallas as wap

        fn = parallel.shard_map_kernel(
            wap.window_attention_kernel, batch_argnums=(0, 1, 2), n_args=6
        )
        return fn(q, k, v, logit_scale, bias, mask)
    return window_attention_reference(q, k, v, logit_scale, bias, mask)


def split_heads(qkv: jax.Array, num_heads: int):
    """(nWB, N, 3C) packed projection — columns [q all heads | k | v] — →
    q, k, v (nWB, heads, N, head_dim)."""
    nwb, n, c3 = qkv.shape
    c = c3 // 3
    qkv5 = qkv.reshape(nwb, n, 3, num_heads, c // num_heads)
    return (qkv5[:, :, i].transpose(0, 2, 1, 3) for i in range(3))


def window_attention_qkv(
    qkv: jax.Array,  # (nWB, N, 3C) — packed projection: [q | k | v] columns
    logit_scale: jax.Array,
    bias: jax.Array,
    mask: jax.Array | None = None,
    *,
    num_heads: int,
    use_pallas: bool = True,
) -> jax.Array:
    """Attention on the packed projection layout → (nWB, N, C).

    On TPU this runs the packed Pallas kernel, which does the head split on
    VMEM values — the (nWB, N, 3, H, D) → (nWB, H, N, D) HBM transposes
    (and their backward add_any copies, ~25% of a SwinV2 train step) never
    exist. Off-TPU it reshapes around the jnp reference."""
    if use_pallas and _pallas_available():
        from hvt import parallel
        from hvt.ops import window_attention_pallas as wap

        fn = parallel.shard_map_kernel(
            lambda qkv_, ls_, b_, m_: wap.window_attention_packed(
                qkv_, ls_, b_, m_, num_heads=num_heads
            ),
            batch_argnums=(0,),
            n_args=4,
        )
        return fn(qkv, logit_scale, bias, mask)
    nwb, n, c3 = qkv.shape
    q, k, v = split_heads(qkv, num_heads)
    out = window_attention_reference(q, k, v, logit_scale, bias, mask)
    return out.transpose(0, 2, 1, 3).reshape(nwb, n, c3 // 3)
