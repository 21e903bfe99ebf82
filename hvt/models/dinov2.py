"""DINOv2 (ViT + LayerScale) in flax.linen, TPU-first.

The reference resolves backbones through timm (reference models.py:16-25)
and its downstream entry points — linear probe (reference
linear_probe.py:43-255) and SimpleShot (reference simpleshot.py:27-224) —
run frozen-feature classification on whatever backbone the config names.
DINOv2 (Oquab et al. 2023) is the standard frozen feature extractor for
exactly that workload (timm `vit_*_patch14_dinov2` names), so it gets a
native family here: standard pre-norm ViT blocks with **LayerScale** on
both residual branches, patch 14, and (for the giant variant) a SwiGLU
FFN. Classification-head semantics follow the HF port: the linear head
reads the **concatenation of the class token and the mean patch token**
(2·D features), which is also what ``features_only`` returns — the
linear-probe / SimpleShot feature.

TPU notes match hvt.models.vit (whose Attention module this reuses): the
global attention is dense XLA batched matmuls (flash refuted on this
toolchain, BENCH.md round 4); the MLP keeps the shared ``mlp/fc1|fc2``
paths so hvt.parallel.TP_RULES shard it over the mesh's ``model`` axis;
LayerScale lambdas are 1-D so the optimizer's no-decay grouping exempts
them automatically.

Parity oracle: ``transformers.Dinov2ForImageClassification`` (torch, CPU,
config-instantiated — no network): same weights ⇒ same logits
(tests/test_dinov2.py); weight conversion (fusing HF's separate q/k/v
linears into the fused qkv) lives in
hvt.models.torch_compat.convert_dinov2_state_dict, with
``resize_pos_embed`` for loading patch-14 checkpoints at other
resolutions (bicubic over the patch grid, cls slot kept — the HF
interpolate_pos_encoding rule, statically applied at load time so the
compiled graph keeps static shapes).
"""

from __future__ import annotations

from typing import Any, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hvt.models import common
from hvt.models.heads import MultitaskHead
from hvt.models.vit import Attention, PatchEmbed

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class SwiGLUFFN(nn.Module):
    """HF Dinov2SwiGLUFFN: Dense(2h) → silu(x1)·x2 → Dense(d), with
    h = round8(int(d · mlp_ratio · 2/3)) (giant variant only)."""

    dim: int
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = (int(int(self.dim * self.mlp_ratio) * 2 / 3) + 7) // 8 * 8
        h = nn.Dense(2 * hidden, dtype=self.dtype, kernel_init=trunc02,
                     name="weights_in")(x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, kernel_init=trunc02,
                        name="weights_out")(nn.silu(x1) * x2)


class Dinov2Block(nn.Module):
    """Pre-norm block with LayerScale on both branches:
    x += dp(ls1·attn(LN x)); x += dp(ls2·ffn(LN x))."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    layerscale_init: float = 1.0
    use_swiglu: bool = False
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

        ls_init = nn.initializers.constant(self.layerscale_init)
        ls1 = self.param("ls1", ls_init, (self.dim,))
        ls2 = self.param("ls2", ls_init, (self.dim,))

        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, dtype=self.dtype,
                      use_flash=self.use_flash, name="attn")(h)
        x = x + dp(h * ls1.astype(h.dtype))
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        if self.use_swiglu:
            h = SwiGLUFFN(self.dim, self.mlp_ratio, dtype=self.dtype,
                          name="mlp")(h)
        else:
            h = common.TransformerMlp(
                int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                name="mlp")(h)
        return x + dp(h * ls2.astype(h.dtype))


class Dinov2(nn.Module):
    """embed_dim 768 / depth 12 / heads 12 / patch 14 → dinov2_vitb14."""

    num_classes: Union[int, tuple[int, ...]] = 1000
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    layerscale_init: float = 1.0
    use_swiglu: bool = False
    ln_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    remat: bool = False
    use_flash: bool | None = None

    @property
    def num_features(self) -> int:
        # Head input is [cls ‖ mean(patch)] (HF Dinov2ForImageClassification).
        return 2 * self.embed_dim

    @property
    def no_weight_decay_substrings(self) -> tuple[str, ...]:
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
            nn.remat(Dinov2Block, static_argnums=(2,))
            if self.remat else Dinov2Block
        )
        for i in range(self.depth):
            x = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                drop_path=float(dpr[i]),
                layerscale_init=self.layerscale_init,
                use_swiglu=self.use_swiglu,
                ln_eps=self.ln_eps,
                dtype=self.dtype,
                use_flash=self.use_flash,
                name=f"block{i}",
            )(x, train)

        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x)
        feats = jnp.concatenate(
            [x[:, 0], jnp.mean(x[:, 1:], axis=1)], axis=-1
        ).astype(jnp.float32)
        if features_only:
            return feats
        if isinstance(self.num_classes, tuple):
            return MultitaskHead(self.num_classes, dtype=jnp.float32,
                                 name="head")(feats)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        kernel_init=trunc02, name="head")(feats)


def analytic_flops(model: Dinov2, img_size: int) -> int:
    """Analytic forward FLOPs, one MAC = one FLOP (reference convention,
    reference swinv2.py:847-867)."""
    d = model.embed_dim
    res = img_size // model.patch_size
    n = res * res + 1
    flops = res * res * d * 3 * model.patch_size**2  # patch embed
    if model.use_swiglu:
        hidden = (int(int(d * model.mlp_ratio) * 2 / 3) + 7) // 8 * 8
        mlp = n * d * 2 * hidden + n * hidden * d
    else:
        mlp = int(2 * n * d * d * model.mlp_ratio)
    per_block = (
        2 * n * d  # norms
        + n * d * 3 * d  # qkv
        + 2 * model.num_heads * n * n * (d // model.num_heads)  # attn matmuls
        + n * d * d  # proj
        + 2 * n * d  # layer scales
        + mlp
    )
    flops += model.depth * per_block + n * d  # blocks + final norm
    ncls = model.num_classes
    heads = sum(ncls) if isinstance(ncls, tuple) else ncls
    return flops + 2 * d * heads


def _variant(embed_dim, depth, num_heads, use_swiglu=False):
    def build(
        num_classes,
        *,
        blurpool: bool = False,  # factory uniformity; no blurpool here
        dtype: Any = jnp.bfloat16,
        **kwargs,
    ):
        del blurpool
        kwargs.pop("bn_scale_init", None)
        kwargs.pop("fuse", None)
        if "use_pallas" in kwargs:
            kwargs.setdefault("use_flash", kwargs.pop("use_pallas"))
        if isinstance(dtype, str):
            dtype = jnp.dtype(dtype)
        return Dinov2(
            num_classes=num_classes,
            embed_dim=embed_dim,
            depth=depth,
            num_heads=num_heads,
            use_swiglu=use_swiglu,
            dtype=dtype,
            **kwargs,
        )

    return build


# facebook/dinov2-{small,base,large,giant} geometry (timm
# vit_{small,base,large,giant}_patch14_dinov2); giant uses the SwiGLU FFN.
dinov2_vits14 = _variant(384, 12, 6)
dinov2_vitb14 = _variant(768, 12, 12)
dinov2_vitl14 = _variant(1024, 24, 16)
dinov2_vitg14 = _variant(1536, 40, 24, use_swiglu=True)


def dinov2_micro(num_classes, *, dtype: Any = jnp.float32, **kwargs):
    """Tests only: 2 blocks at dim 32, patch 8 — one plain-MLP block
    geometry plus (via use_swiglu) the SwiGLU path."""
    for knob in ("bn_scale_init", "fuse", "blurpool"):
        kwargs.pop(knob, None)
    if "use_pallas" in kwargs:
        kwargs.setdefault("use_flash", kwargs.pop("use_pallas"))
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    return Dinov2(
        num_classes=num_classes,
        patch_size=8,
        embed_dim=32,
        depth=2,
        num_heads=2,
        dtype=dtype,
        **kwargs,
    )
