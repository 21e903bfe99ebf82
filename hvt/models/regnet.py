"""RegNet-Y in flax.linen, NHWC, TPU-first.

Another timm family the reference can name but hvt previously could not
(reference models.py:16-25 resolves any timm string; ``regnety_*`` is the
designed-search conv family from Radosavovic et al. 2020, "Designing
Network Design Spaces"). Geometry: 3×3/2 conv stem, four stages of
stride-2 Y bottleneck blocks (1×1 → 3×3 **grouped** conv → squeeze-excite
→ 1×1, BN+ReLU, post-add ReLU); head = global mean pool → Linear.

TPU notes:

* NHWC throughout. The 3×3 grouped conv lowers through XLA's
  ``feature_group_count`` — on TPU each group is an independent MXU
  contraction; group widths here (8-232 channels) keep the contraction
  dim MXU-viable, unlike depthwise (group=1) convs which fall to the VPU
  path. The 1×1s are plain matmuls over B·H·W rows.
* torch's symmetric padding=1 on the stride-2 3×3 convs is NOT XLA-SAME
  (which pads (0,1) at 224px); written as an explicit ((1,1),(1,1)) pad +
  VALID conv — bit-identical to torch, and XLA folds the pad in.
* BatchNorm uses torch defaults: eps 1e-5, keep-90% running stats
  (torch momentum 0.1 == flax momentum 0.9).
* SE reduction derives from the block INPUT width (round(in/4)), per
  pycls/HF — not the expanded width like EfficientNet's se_ratio rule.

Parity oracle: ``transformers.RegNetForImageClassification`` (torch, CPU,
config-instantiated — no network): same weights ⇒ same logits
(tests/test_regnet.py); weight conversion (params AND batch_stats) lives
in hvt.models.torch_compat.convert_regnet_state_dict.

Surgeries follow factory conventions (reference models.py:16-51):
``num_classes`` tuple → MultitaskHead; ``features_only`` at call time →
pooled features (HF pooler_output).
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from hvt.models.heads import MultitaskHead

# HF RegNet _init_weights: kaiming_normal(fan_out, relu) on convs.
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _pad_same_torch(x: jax.Array, k: int) -> jax.Array:
    """torch Conv2d(padding=k//2) as an explicit symmetric pad (correct for
    stride-2 convs where XLA-SAME would pad asymmetrically)."""
    p = k // 2
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))


class YBlock(nn.Module):
    """1×1 → grouped 3×3 (stride) → SE → 1×1, BN+ReLU, post-add ReLU.

    Mirrors HF RegNetYLayer (modeling_regnet.py): groups =
    max(1, out // group_width); SE reduce width = round(in / 4); the
    projection shortcut (1×1/s conv + BN) fires iff shape changes.
    """

    in_dim: int
    out_dim: int
    stride: int
    group_width: int
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
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

        groups = max(1, self.out_dim // self.group_width)

        h = nn.Conv(self.out_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_out, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))

        if self.stride == 2:
            h = _pad_same_torch(h, 3)
            pad = "VALID"
        else:
            pad = "SAME"
        h = nn.Conv(
            self.out_dim, (3, 3), strides=self.stride, padding=pad,
            feature_group_count=groups, use_bias=False, dtype=self.dtype,
            kernel_init=kaiming_out, name="conv2",
        )(h)
        h = nn.relu(bn("bn2")(h))

        # Squeeze-excite off the block INPUT width (pycls rule).
        dim_se = max(1, int(round(self.in_dim / 4)))
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.Conv(dim_se, (1, 1), dtype=self.dtype,
                    kernel_init=kaiming_out, name="se_reduce")(s)
        s = nn.relu(s)
        s = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                    kernel_init=kaiming_out, name="se_expand")(s)
        h = h * nn.sigmoid(s)

        h = nn.Conv(self.out_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_out, name="conv3")(h)
        h = bn("bn3")(h)

        if self.in_dim != self.out_dim or self.stride != 1:
            sc = nn.Conv(
                self.out_dim, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, kernel_init=kaiming_out, name="sc_conv",
            )(x)
            sc = bn("sc_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class RegNetY(nn.Module):
    """depths (2,6,12,2) / widths (128,192,512,1088) / group 64 → Y-4.0GF."""

    num_classes: Union[int, tuple[int, ...]] = 1000
    depths: Sequence[int] = (2, 6, 12, 2)
    widths: Sequence[int] = (128, 192, 512, 1088)
    group_width: int = 64
    stem_channels: int = 32
    downsample_in_first_stage: bool = True
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @property
    def num_features(self) -> int:
        return int(self.widths[-1])

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        features_only: bool = False,
    ) -> jax.Array | list[jax.Array]:
        x = x.astype(self.dtype)
        x = _pad_same_torch(x, 3)
        x = nn.Conv(
            self.stem_channels, (3, 3), strides=2, padding="VALID",
            use_bias=False, dtype=self.dtype, kernel_init=kaiming_out,
            name="stem_conv",
        )(x)
        x = nn.relu(nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=self.bn_eps, dtype=self.dtype, name="stem_bn",
        )(x))

        block_cls = (
            nn.remat(YBlock, static_argnums=(2,)) if self.remat else YBlock
        )
        in_dim = self.stem_channels
        for stage, (depth, width) in enumerate(zip(self.depths, self.widths)):
            first_stride = (
                2 if stage > 0 or self.downsample_in_first_stage else 1
            )
            for i in range(depth):
                x = block_cls(
                    in_dim=in_dim,
                    out_dim=width,
                    stride=first_stride if i == 0 else 1,
                    group_width=self.group_width,
                    bn_momentum=self.bn_momentum,
                    bn_eps=self.bn_eps,
                    dtype=self.dtype,
                    name=f"stage{stage}_block{i}",
                )(x, train)
                in_dim = width

        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if features_only:
            return feats
        if isinstance(self.num_classes, tuple):
            return MultitaskHead(self.num_classes, dtype=jnp.float32,
                                 name="head")(feats)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(feats)


def analytic_flops(model: RegNetY, img_size: int) -> int:
    """Analytic forward FLOPs, one MAC = one FLOP (reference convention,
    reference swinv2.py:847-867)."""
    res = -(-img_size // 2)  # stem stride 2, ceil for the symmetric pad
    flops = res * res * model.stem_channels * 3 * 9
    in_dim = model.stem_channels
    for stage, (depth, width) in enumerate(zip(model.depths, model.widths)):
        groups = max(1, width // model.group_width)
        for i in range(depth):
            stride = 2 if i == 0 and (stage > 0 or model.downsample_in_first_stage) else 1
            r_in = res
            if stride == 2:
                res = -(-res // 2)
            per = r_in * r_in * in_dim * width  # conv1 at input res
            per += res * res * width * (width // groups) * 9  # grouped 3×3
            dim_se = max(1, int(round(in_dim / 4)))
            per += width * dim_se * 2  # SE 1×1s on the pooled vector
            per += res * res * width * width  # conv3
            if in_dim != width or stride != 1:
                per += res * res * in_dim * width  # shortcut
            flops += per
            in_dim = width
    ncls = model.num_classes
    heads = sum(ncls) if isinstance(ncls, tuple) else ncls
    return flops + model.widths[-1] * heads


def _variant(depths, widths, group_width):
    def build(
        num_classes,
        *,
        blurpool: bool = False,  # factory uniformity; RegNet has no blurpool
        dtype: Any = jnp.bfloat16,
        **kwargs,
    ):
        del blurpool
        for knob in ("bn_scale_init", "use_pallas", "fuse"):
            kwargs.pop(knob, None)
        if isinstance(dtype, str):
            dtype = jnp.dtype(dtype)
        return RegNetY(
            num_classes=num_classes,
            depths=depths,
            widths=widths,
            group_width=group_width,
            dtype=dtype,
            **kwargs,
        )

    return build


# pycls/torchvision/HF geometry for the regnety_* names (timm spelling;
# suffix = design-space compute budget).
regnety_004 = _variant((1, 3, 6, 6), (48, 104, 208, 440), 8)
regnety_008 = _variant((1, 3, 8, 2), (64, 128, 320, 768), 16)
regnety_016 = _variant((2, 6, 17, 2), (48, 120, 336, 888), 24)
regnety_040 = _variant((2, 6, 12, 2), (128, 192, 512, 1088), 64)
regnety_080 = _variant((2, 4, 10, 1), (168, 448, 896, 2016), 56)
regnety_160 = _variant((2, 4, 11, 1), (224, 448, 1232, 3024), 112)
regnety_320 = _variant((2, 5, 13, 1), (232, 696, 1392, 3712), 232)
def regnety_micro(num_classes, *, dtype: Any = jnp.float32, **kwargs):
    """Tests only: two tiny stages (one stride-2 grouped 3×3, SE, one
    identity block), 8-channel stem."""
    for knob in ("bn_scale_init", "use_pallas", "fuse", "blurpool"):
        kwargs.pop(knob, None)
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    return RegNetY(
        num_classes=num_classes,
        depths=(1, 2),
        widths=(16, 24),
        group_width=8,
        stem_channels=8,
        dtype=dtype,
        **kwargs,
    )
