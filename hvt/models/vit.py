"""Vision Transformer (ViT) in flax.linen, NHWC, TPU-first.

The reference resolves ViT architectures through timm
(reference models.py:16-25: ``timm.create_model(config.model.name, ...)``) —
`vit_*_patch16_224` strings are among the most common timm names a
hierarchical-vision user would reach for beyond the shipped R50/SwinV2
configs. This module is a native flax implementation of the standard
(AugReg / original-paper) ViT: conv patchify, prepended class token,
learned absolute position embeddings, pre-norm transformer blocks
(LN → MHA → residual; LN → GELU-MLP → residual), final LN, classify from
the class token.

Design notes (TPU):

* qkv is a single fused Dense(3D) — one MXU matmul instead of three; the
  197-token global attention is a dense (B·H, N, N) batched matmul that XLA
  tiles onto the MXU directly, so no Pallas kernel is needed (unlike
  SwinV2's 49-token windows, where the win came from fusing the layout ops
  around tiny attention — BENCH.md).
* The MLP uses the shared ``mlp/fc1|fc2`` parameter paths, so
  hvt.parallel.TP_RULES shard it Megatron-style over the mesh's ``model``
  axis with no model-code changes.
* bf16 compute, f32 head/features, like the other families.

Parity oracle: ``transformers.ViTForImageClassification`` (torch, CPU) —
same weights ⇒ same logits (tests/test_vit.py); weight conversion for both
HF (`vit.encoder.layer.*`) and timm (`blocks.*`) checkpoint layouts lives in
hvt.models.torch_compat.convert_vit_state_dict.

Surgeries follow factory conventions (reference models.py:16-51):
``num_classes`` tuple → MultitaskHead; ``features_only`` at call time →
pooled pre-logits features (timm ``forward_head(pre_logits=True)``).
"""

from __future__ import annotations

from typing import Any, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hvt.models import common
from hvt.models.heads import MultitaskHead

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def _attend_flash(q, k, v, n_real: int, sm_scale: float):
    """Differentiable flash attention on (B, H, N, hd) q/k/v via the
    bundled TPU Pallas op (jax.experimental.pallas.ops.tpu.flash_attention):
    the (B, H, N, N) score matrix never hits HBM in either direction. The
    sequence is padded to the kernel's 128-block multiple (ViT-B: 197 →
    256); segment ids wall the padding off — pad rows attend only pad
    (sliced away, and their cotangents are exactly zero)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, n, hd = q.shape
    n_pad = -(-n // fa.MIN_BLOCK_SIZE) * fa.MIN_BLOCK_SIZE
    pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
    q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    seg = (jnp.arange(n_pad)[None, :] < n_real).astype(jnp.int32)
    seg = jnp.broadcast_to(seg, (b, n_pad))
    out = fa.flash_attention(
        q, k, v, segment_ids=fa.SegmentIds(seg, seg), sm_scale=sm_scale
    )
    return out[:, :, :n, :]


def flash_available() -> bool:
    """The bundled flash kernel is Mosaic — TPU lowerings only (the same
    predicate the SwinV2 kernels use, hvt/models/swinv2.py)."""
    from hvt import ops as ops_pkg

    return (
        ops_pkg.tpu_lowering_forced()
        or jax.default_backend() in ("tpu",)
        or any(d.platform in ("tpu", "axon") for d in jax.devices())
    )


class Attention(nn.Module):
    """Global multi-head self-attention with fused qkv.

    ``use_flash`` routes the score/softmax/value contraction through the
    bundled TPU flash-attention Pallas op
    (jax.experimental.pallas.ops.tpu.flash_attention). **Measured SLOWER
    than the plain XLA einsums on this toolchain at every tested length**
    (BENCH.md round 4 "ViT flash refutation": 197 tokens 2.3× slower,
    1025 tokens 2.5× slower — 435.9 vs 173.0 ms/step at 512px/b16), so
    the default is the dense path unconditionally; the route stays as an
    explicit opt-in for future toolchains / much longer sequences, with
    the wrapper's padding/segment logic CI-pinned against the plain path
    (tests/test_vit.py). The two paths differ only by flash's
    blockwise-softmax rescaling."""

    dim: int
    num_heads: int
    dtype: Any = None
    use_flash: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = nn.Dense(3 * d, dtype=self.dtype, kernel_init=trunc02,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        # Default: dense. Flash measured slower at 197 AND 1025 tokens on
        # this chip (see class docstring) — opt-in only.
        flash = bool(self.use_flash) and flash_available()
        if flash:
            out = _attend_flash(q, k, v, n_real=n, sm_scale=hd ** -0.5)
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
            attn = jax.nn.softmax(
                attn.astype(jnp.float32), axis=-1
            ).astype(q.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, kernel_init=trunc02,
                        name="proj")(out)


class Block(nn.Module):
    """Pre-norm transformer block (LN→attn→+, LN→mlp→+)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    ln_eps: float = 1e-6
    dtype: Any = None
    use_flash: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def dp(y):
            if not train or self.drop_path == 0.0:
                return y
            return common.drop_path(
                y, self.drop_path, deterministic=False,
                rng=self.make_rng("dropout"),
            )

        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        x = x + dp(Attention(self.dim, self.num_heads, dtype=self.dtype,
                             use_flash=self.use_flash, name="attn")(h))
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        x = x + dp(common.TransformerMlp(
            int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
            name="mlp")(h))
        return x


class PatchEmbed(nn.Module):
    """Patchify as reshape/transpose + ONE MXU matmul.

    Mathematically identical to the usual p×p/stride-p conv. Chip-measured
    NEUTRAL on ViT-B/16 (144.2 vs 144.8 ms/step — XLA's conv lowering
    already handled the stride-p patchify in ~0.16 ms; the trace's big
    "convolution" fusions are the attention A·V batched matmuls, which XLA
    lowers as convolutions on TPU). Kept in this form because it does not
    depend on that conv-lowering quality and reads as what it is. The
    parameter tree is the conv's (``kernel`` (p, p, C, D) + ``bias``), so
    checkpoints and the HF/timm converters are unchanged; the flatten
    order (p_h, p_w, C) matches the conv kernel's (kh, kw, in) layout."""

    embed_dim: int
    patch_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.patch_size
        b, h, w, c = x.shape
        kernel = self.param("kernel", trunc02, (p, p, c, self.embed_dim))
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        x = x.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (h // p) * (w // p), p * p * c
        )
        w_flat = kernel.astype(x.dtype).reshape(p * p * c, self.embed_dim)
        return jnp.dot(x, w_flat) + bias.astype(x.dtype)


class VisionTransformer(nn.Module):
    """Standard ViT. embed_dim 768 / depth 12 / heads 12 → ViT-B/16."""

    num_classes: Union[int, tuple[int, ...]] = 1000
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    # "token": classify from the class token (timm/HF ViT default);
    # "avg": global average over patch tokens (timm global_pool="avg").
    pool: str = "token"
    ln_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    remat: bool = False
    use_flash: bool | None = None

    @property
    def num_features(self) -> int:
        return self.embed_dim

    @property
    def no_weight_decay_substrings(self) -> tuple[str, ...]:
        """Optimizer no-decay names (timm ViT no_weight_decay():
        pos_embed, cls_token)."""
        return ("pos_embed", "cls_token")

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        features_only: bool = False,
    ) -> jax.Array | list[jax.Array]:
        b = x.shape[0]
        x = x.astype(self.dtype)
        x = PatchEmbed(
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            dtype=self.dtype,
            name="patch_embed",
        )(x)  # (B, N, D)
        n = x.shape[1]

        cls = self.param("cls_token", trunc02, (1, 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim))
                             .astype(x.dtype), x], axis=1)
        pos = self.param("pos_embed", trunc02, (1, n + 1, self.embed_dim))
        x = x + pos.astype(x.dtype)

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        block_cls = (
            nn.remat(Block, static_argnums=(2,)) if self.remat else Block
        )
        for i in range(self.depth):
            x = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                drop_path=float(dpr[i]),
                ln_eps=self.ln_eps,
                dtype=self.dtype,
                use_flash=self.use_flash,
                name=f"block{i}",
            )(x, train)

        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x)
        if self.pool == "avg":
            feats = jnp.mean(x[:, 1:], axis=1)
        else:
            feats = x[:, 0]
        feats = feats.astype(jnp.float32)
        if features_only:
            return feats
        if isinstance(self.num_classes, tuple):
            return MultitaskHead(self.num_classes, dtype=jnp.float32,
                                 name="head")(feats)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        kernel_init=trunc02, name="head")(feats)


def analytic_flops(model: VisionTransformer, img_size: int) -> int:
    """Analytic forward FLOPs, one MAC = one FLOP (the reference's SwinV2
    convention, reference swinv2.py:847-867)."""
    d = model.embed_dim
    res = img_size // model.patch_size
    n = res * res + 1
    flops = res * res * d * 3 * model.patch_size**2  # patch embed
    per_block = (
        2 * n * d  # norms
        + n * d * 3 * d  # qkv
        + 2 * model.num_heads * n * n * (d // model.num_heads)  # attn matmuls
        + n * d * d  # proj
        + int(2 * n * d * d * model.mlp_ratio)  # mlp
    )
    flops += model.depth * per_block
    flops += n * d  # final norm
    ncls = model.num_classes
    heads = sum(ncls) if isinstance(ncls, tuple) else ncls
    return flops + d * heads


def _variant(embed_dim, depth, num_heads, patch_size):
    def build(
        num_classes,
        *,
        blurpool: bool = False,  # factory uniformity; ViT has no blurpool
        dtype: Any = jnp.bfloat16,
        **kwargs,
    ):
        del blurpool
        # Framework-wide knobs other families read (the factory/Trainer/
        # export inject them uniformly — "every builder tolerates these",
        # hvt/tools/export_serving.py). `use_pallas` maps to the flash-
        # attention route (ViT's one Pallas-backed component); `fuse` and
        # `bn_scale_init` are no-ops here.
        kwargs.pop("bn_scale_init", None)
        kwargs.pop("fuse", None)
        if "use_pallas" in kwargs:
            kwargs.setdefault("use_flash", kwargs.pop("use_pallas"))
        if isinstance(dtype, str):
            dtype = jnp.dtype(dtype)
        return VisionTransformer(
            num_classes=num_classes,
            patch_size=patch_size,
            embed_dim=embed_dim,
            depth=depth,
            num_heads=num_heads,
            dtype=dtype,
            **kwargs,
        )

    return build


# timm geometry for the vit_{tiny,small,base,large}_patch16_224 names.
vit_tiny_patch16_224 = _variant(192, 12, 3, 16)
vit_small_patch16_224 = _variant(384, 12, 6, 16)
vit_base_patch16_224 = _variant(768, 12, 12, 16)
vit_base_patch32_224 = _variant(768, 12, 12, 32)
vit_large_patch16_224 = _variant(1024, 24, 16, 16)
vit_micro = _variant(32, 2, 2, 8)  # tests only
