"""ConvNeXt in flax.linen, NHWC, TPU-first.

Another timm family the reference can name but hvt previously could not
(reference models.py:16-25 resolves any timm string; `convnext_*` is the
modern conv baseline a hierarchical-vision user would try next to R50).
Standard ConvNeXt (Liu et al. 2022): 4×4/4 conv stem + LayerNorm, four
stages of blocks (7×7 depthwise conv → LN → pointwise 4× GELU MLP →
layer-scale → stochastic-depth residual) with 2×2/2 LN+conv downsampling
between stages, final pooled-LN head.

TPU notes:

* NHWC throughout — the depthwise 7×7 lowers to an XLA depthwise conv the
  TPU backend handles natively; the 1×1 "pointwise convs" are plain Dense
  layers on the channel axis (pure MXU matmuls over B·H·W rows, no layout
  games needed).
* The pointwise pair uses the shared ``mlp/fc1|fc2`` parameter paths, so
  hvt.parallel.TP_RULES shard the 4× expansion Megatron-style over the
  mesh's ``model`` axis with no model-code changes.
* Layer-scale gamma is 1-D, so the optimizer's no-decay grouping (1-D
  params, hvt/train/optim.py, reference optim.py:48-58) already exempts it.
* bf16 compute, f32 head/features, like the other families.

Parity oracle: ``transformers.ConvNextForImageClassification`` (torch,
CPU) — same weights ⇒ same logits (tests/test_convnext.py); weight
conversion for HF (`convnext.encoder.stages.*`) and timm (`stages.*`)
layouts lives in hvt.models.torch_compat.convert_convnext_state_dict.

Surgeries follow factory conventions (reference models.py:16-51):
``num_classes`` tuple → MultitaskHead; ``features_only`` at call time →
pooled pre-logits features.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hvt.models import common
from hvt.models.heads import MultitaskHead

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class ConvNeXtBlock(nn.Module):
    """dwconv7×7 → LN → fc1(4×) → GELU → fc2 → γ· → drop_path residual."""

    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    ln_eps: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        shortcut = x
        x = nn.Conv(
            self.dim,
            (7, 7),
            padding=3,
            feature_group_count=self.dim,
            dtype=self.dtype,
            kernel_init=trunc02,
            name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x)
        x = common.TransformerMlp(4 * self.dim, self.dim, dtype=self.dtype,
                                  name="mlp")(x)
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.layer_scale_init),
            (self.dim,),
        )
        x = x * gamma.astype(x.dtype)
        if train and self.drop_path > 0.0:
            x = common.drop_path(
                x, self.drop_path, deterministic=False,
                rng=self.make_rng("dropout"),
            )
        return shortcut + x


class ConvNeXt(nn.Module):
    """depths (3,3,9,3) / dims (96,192,384,768) → ConvNeXt-T."""

    num_classes: Union[int, tuple[int, ...]] = 1000
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    layer_scale_init: float = 1e-6
    ln_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @property
    def num_features(self) -> int:
        return int(self.dims[-1])

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        features_only: bool = False,
    ) -> jax.Array | list[jax.Array]:
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
            dtype=self.dtype, kernel_init=trunc02, name="stem_conv",
        )(x)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="stem_norm")(x)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        block_cls = (
            nn.remat(ConvNeXtBlock, static_argnums=(2,))
            if self.remat else ConvNeXtBlock
        )
        block_idx = 0
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                                 name=f"downsample{stage}_norm")(x)
                x = nn.Conv(
                    dim, (2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, kernel_init=trunc02,
                    name=f"downsample{stage}_conv",
                )(x)
            for i in range(depth):
                x = block_cls(
                    dim=dim,
                    drop_path=float(dpr[block_idx]),
                    layer_scale_init=self.layer_scale_init,
                    ln_eps=self.ln_eps,
                    dtype=self.dtype,
                    name=f"stage{stage}_block{i}",
                )(x, train)
                block_idx += 1

        # Pool then norm (HF ConvNextModel / timm head_norm_first=False).
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        feats = nn.LayerNorm(epsilon=self.ln_eps, name="norm")(feats)
        if features_only:
            return feats
        if isinstance(self.num_classes, tuple):
            return MultitaskHead(self.num_classes, dtype=jnp.float32,
                                 name="head")(feats)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        kernel_init=trunc02, name="head")(feats)


def analytic_flops(model: ConvNeXt, img_size: int) -> int:
    """Analytic forward FLOPs, one MAC = one FLOP (reference convention,
    reference swinv2.py:847-867)."""
    res = img_size // 4
    flops = res * res * model.dims[0] * 3 * 16  # stem conv
    for stage, (depth, dim) in enumerate(zip(model.depths, model.dims)):
        if stage > 0:
            flops += (res // 2) * (res // 2) * model.dims[stage - 1] * dim * 4
            res //= 2
        per_block = (
            res * res * dim * 49  # depthwise 7x7
            + res * res * dim  # LN
            + 2 * res * res * dim * 4 * dim  # fc1 + fc2
        )
        flops += depth * per_block
    ncls = model.num_classes
    heads = sum(ncls) if isinstance(ncls, tuple) else ncls
    return flops + model.dims[-1] * heads


def _variant(depths, dims):
    def build(
        num_classes,
        *,
        blurpool: bool = False,  # factory uniformity; ConvNeXt has no blurpool
        dtype: Any = jnp.bfloat16,
        **kwargs,
    ):
        del blurpool
        # Framework-wide knobs other families read; no-ops for ConvNeXt
        # (the factory/Trainer/export inject them uniformly — "every
        # builder tolerates these", hvt/tools/export_serving.py).
        for knob in ("bn_scale_init", "use_pallas", "fuse"):
            kwargs.pop(knob, None)
        if isinstance(dtype, str):
            dtype = jnp.dtype(dtype)
        return ConvNeXt(
            num_classes=num_classes,
            depths=depths,
            dims=dims,
            dtype=dtype,
            **kwargs,
        )

    return build


# timm/HF geometry for the convnext_{tiny,small,base,large} names.
convnext_tiny = _variant((3, 3, 9, 3), (96, 192, 384, 768))
convnext_small = _variant((3, 3, 27, 3), (96, 192, 384, 768))
convnext_base = _variant((3, 3, 27, 3), (128, 256, 512, 1024))
convnext_large = _variant((3, 3, 27, 3), (192, 384, 768, 1536))
convnext_micro = _variant((1, 1, 2, 1), (16, 32, 64, 128))  # tests only
