"""EfficientNet (V1) in flax.linen, NHWC, TPU-first.

Another timm family the reference can name but previously had no hvt
counterpart (reference models.py:16-25 resolves any timm string;
``efficientnet_b*`` is the classic scaled-conv baseline). Standard
EfficientNet (Tan & Le 2019): TF-SAME 3×3/2 stem, seven MBConv stages
(1×1 expand → k×k depthwise → squeeze-excite → 1×1 project, BN+swish,
per-sample stochastic depth on the identity blocks), 1×1 top conv to
round_filters(1280), global mean pool, dropout + linear head. Width and
depth scale per variant via the round_filters / round_repeats rules.

TPU notes:

* NHWC throughout; the depthwise k×k lowers to XLA's native depthwise
  conv, the 1×1 expand/project convs are MXU matmuls over B·H·W rows.
* TF "SAME" asymmetric padding for the stride-2 convs is written as an
  explicit ((k//2−1, k//2), …) pad + VALID conv — bit-identical to the
  TF/HF ZeroPad2d(correct_pad)+valid composition, and XLA folds the pad
  into the conv.
* BatchNorm follows the family's TF semantics: momentum 0.99 =
  keep-99%-of-running (flax's convention matches TF; HF's torch port
  passes 0.99 to torch's inverted momentum — a porting quirk that only
  affects training-mode stat updates, not eval parity).
* Stochastic depth is per-sample drop-path (the paper's drop_connect and
  timm's behavior); HF applies elementwise Dropout there instead — both
  are identity in eval mode, which is where parity is pinned.

Parity oracle: ``transformers.EfficientNetForImageClassification``
(torch, CPU, config-instantiated — no network): same weights ⇒ same
logits (tests/test_efficientnet.py); weight conversion lives in
hvt.models.torch_compat.convert_efficientnet_state_dict (params AND
batch_stats — running statistics are part of the model).

Surgeries follow factory conventions (reference models.py:16-51):
``num_classes`` tuple → MultitaskHead; ``features_only`` at call time →
pooled pre-dropout features (HF pooler_output).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hvt.models import common
from hvt.models.heads import MultitaskHead

normal02 = nn.initializers.normal(stddev=0.02)

# The seven base stages (b0 geometry; identical across variants, only
# width/depth scaling differs) — kernel, in, out, stride, repeats, expand.
KERNELS = (3, 3, 5, 3, 5, 5, 3)
IN_CH = (32, 16, 24, 40, 80, 112, 192)
OUT_CH = (16, 24, 40, 80, 112, 192, 320)
STRIDES = (1, 2, 2, 2, 1, 2, 1)
REPEATS = (1, 2, 2, 3, 3, 4, 1)
EXPANDS = (1, 6, 6, 6, 6, 6, 6)


def round_filters(channels: float, width: float, divisor: int = 8) -> int:
    """EfficientNet width scaling (TF reference rule, HF
    modeling_efficientnet.round_filters)."""
    channels *= width
    new = max(divisor, int(channels + divisor / 2) // divisor * divisor)
    if new < 0.9 * channels:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def _same_pad(k: int) -> tuple[tuple[int, int], tuple[int, int]]:
    """TF-SAME asymmetric padding for a stride-2 k×k conv (HF correct_pad
    with adjust=True): one less on top/left."""
    c = k // 2
    return ((c - 1, c), (c - 1, c))


class MBConv(nn.Module):
    """expand 1×1 → depthwise k×k → squeeze-excite → project 1×1, with a
    per-sample drop-path residual on identity blocks."""

    in_dim: int
    out_dim: int
    stride: int
    expand_ratio: int
    kernel: int
    skip: bool  # stride 1 repeat block (HF: not id_skip)
    drop_path: float = 0.0
    se_ratio: float = 0.25
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                name=name,
            )

        shortcut = x
        exp_dim = self.in_dim * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(exp_dim, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=normal02, name="expand_conv")(h)
            h = nn.silu(bn("expand_bn")(h))

        if self.stride == 2:
            h = jnp.pad(h, ((0, 0),) + _same_pad(self.kernel) + ((0, 0),))
            dw_pad = "VALID"
        else:
            dw_pad = "SAME"
        h = nn.Conv(
            exp_dim, (self.kernel, self.kernel), strides=self.stride,
            padding=dw_pad, feature_group_count=exp_dim, use_bias=False,
            dtype=self.dtype, kernel_init=normal02, name="dwconv",
        )(h)
        h = nn.silu(bn("dw_bn")(h))

        # Squeeze-excite: the reduce dim derives from the block INPUT
        # channels (pre-expansion), per the TF reference / HF port.
        dim_se = max(1, int(self.in_dim * self.se_ratio))
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.Conv(dim_se, (1, 1), dtype=self.dtype, kernel_init=normal02,
                    name="se_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(exp_dim, (1, 1), dtype=self.dtype, kernel_init=normal02,
                    name="se_expand")(s)
        h = h * nn.sigmoid(s)

        h = nn.Conv(self.out_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=normal02, name="project_conv")(h)
        h = bn("project_bn")(h)

        if self.skip:
            if train and self.drop_path > 0.0:
                h = common.drop_path(
                    h, self.drop_path, deterministic=False,
                    rng=self.make_rng("dropout"),
                )
            h = h + shortcut
        return h


class EfficientNet(nn.Module):
    """width/depth (1.0, 1.0) → EfficientNet-B0."""

    num_classes: Union[int, tuple[int, ...]] = 1000
    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    drop_connect_rate: float = 0.2
    dropout_rate: float = 0.2  # classifier dropout (train only)
    se_ratio: float = 0.25
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    stem_channels: int = 32
    top_channels: int = 1280
    kernels: Sequence[int] = KERNELS
    in_ch: Sequence[int] = IN_CH
    out_ch: Sequence[int] = OUT_CH
    strides: Sequence[int] = STRIDES
    repeats: Sequence[int] = REPEATS
    expands: Sequence[int] = EXPANDS
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @property
    def num_features(self) -> int:
        return round_filters(self.top_channels, self.width_coefficient)

    def block_plan(self) -> list[dict]:
        """The flattened per-block geometry (HF EfficientNetEncoder order:
        blocks of all stages concatenated, drop rate linear in the flat
        index)."""
        num_blocks = sum(
            round_repeats(r, self.depth_coefficient) for r in self.repeats
        )
        plan, idx = [], 0
        for i in range(len(self.kernels)):
            in_dim = round_filters(self.in_ch[i], self.width_coefficient)
            out_dim = round_filters(self.out_ch[i], self.width_coefficient)
            for j in range(round_repeats(self.repeats[i], self.depth_coefficient)):
                plan.append(dict(
                    in_dim=out_dim if j > 0 else in_dim,
                    out_dim=out_dim,
                    stride=1 if j > 0 else int(self.strides[i]),
                    expand_ratio=int(self.expands[i]),
                    kernel=int(self.kernels[i]),
                    skip=j > 0 and (1 if j > 0 else self.strides[i]) == 1,
                    drop_path=self.drop_connect_rate * idx / num_blocks,
                ))
                idx += 1
        return plan

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        features_only: bool = False,
    ) -> jax.Array | list[jax.Array]:
        x = x.astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x = nn.Conv(
            round_filters(self.stem_channels, self.width_coefficient),
            (3, 3), strides=2, padding="VALID", use_bias=False,
            dtype=self.dtype, kernel_init=normal02, name="stem_conv",
        )(x)
        x = nn.silu(nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=self.bn_eps, dtype=self.dtype, name="stem_bn",
        )(x))

        block_cls = (
            nn.remat(MBConv, static_argnums=(2,)) if self.remat else MBConv
        )
        for idx, spec in enumerate(self.block_plan()):
            x = block_cls(
                se_ratio=self.se_ratio,
                bn_momentum=self.bn_momentum,
                bn_eps=self.bn_eps,
                dtype=self.dtype,
                name=f"block{idx}",
                **spec,
            )(x, train)

        x = nn.Conv(
            self.num_features, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=normal02, name="top_conv",
        )(x)
        x = nn.silu(nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=self.bn_eps, dtype=self.dtype, name="top_bn",
        )(x))

        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if features_only:
            return feats
        if train and self.dropout_rate > 0.0:
            feats = nn.Dropout(self.dropout_rate, deterministic=False)(
                feats, rng=self.make_rng("dropout")
            )
        if isinstance(self.num_classes, tuple):
            return MultitaskHead(self.num_classes, dtype=jnp.float32,
                                 name="head")(feats)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        kernel_init=normal02, name="head")(feats)


def analytic_flops(model: EfficientNet, img_size: int) -> int:
    """Analytic forward FLOPs, one MAC = one FLOP (reference convention,
    reference swinv2.py:847-867)."""
    res = -(-img_size // 2)
    stem = round_filters(model.stem_channels, model.width_coefficient)
    flops = res * res * stem * 3 * 9
    for spec in model.block_plan():
        if spec["stride"] == 2:
            res = -(-res // 2)
        exp = spec["in_dim"] * spec["expand_ratio"]
        per = 0
        if spec["expand_ratio"] != 1:
            # expand conv runs at the block's input resolution
            r_in = res * 2 if spec["stride"] == 2 else res
            per += r_in * r_in * spec["in_dim"] * exp
        per += res * res * exp * spec["kernel"] ** 2  # depthwise
        dim_se = max(1, int(spec["in_dim"] * model.se_ratio))
        per += exp * dim_se * 2  # squeeze-excite 1×1s on the pooled vector
        per += res * res * exp * spec["out_dim"]  # project
        flops += per
    last = model.block_plan()[-1]["out_dim"]
    flops += res * res * last * model.num_features  # top conv
    ncls = model.num_classes
    heads = sum(ncls) if isinstance(ncls, tuple) else ncls
    return flops + model.num_features * heads


def _variant(width, depth, dropout):
    def build(
        num_classes,
        *,
        blurpool: bool = False,  # factory uniformity; no blurpool here
        dtype: Any = jnp.bfloat16,
        **kwargs,
    ):
        del blurpool
        for knob in ("bn_scale_init", "use_pallas", "fuse"):
            kwargs.pop(knob, None)
        if isinstance(dtype, str):
            dtype = jnp.dtype(dtype)
        return EfficientNet(
            num_classes=num_classes,
            width_coefficient=width,
            depth_coefficient=depth,
            dropout_rate=dropout,
            dtype=dtype,
            **kwargs,
        )

    return build


# timm/HF geometry for the efficientnet_b{0..5} names (width, depth,
# classifier dropout; the native resolutions 224/240/260/300/380/456 are a
# dataset-config concern, not a model attribute).
efficientnet_b0 = _variant(1.0, 1.0, 0.2)
efficientnet_b1 = _variant(1.0, 1.1, 0.2)
efficientnet_b2 = _variant(1.1, 1.2, 0.3)
efficientnet_b3 = _variant(1.2, 1.4, 0.3)
efficientnet_b4 = _variant(1.4, 1.8, 0.4)
efficientnet_b5 = _variant(1.6, 2.2, 0.4)


def efficientnet_micro(num_classes, *, dtype: Any = jnp.float32, **kwargs):
    """Tests only: two tiny stages, one stride-2 5×5 (exercises the
    asymmetric-SAME path), SE, and one identity block."""
    for knob in ("bn_scale_init", "use_pallas", "fuse", "blurpool"):
        kwargs.pop(knob, None)
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    return EfficientNet(
        num_classes=num_classes,
        stem_channels=8,
        top_channels=64,
        kernels=(3, 5),
        in_ch=(8, 16),
        out_ch=(16, 24),
        strides=(1, 2),
        repeats=(1, 2),
        expands=(1, 6),
        dtype=dtype,
        **kwargs,
    )
