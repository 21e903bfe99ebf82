"""ResNet v1.5 in flax.linen, NHWC, TPU-first.

Functional equivalent of the reference's timm `resnet50` backbone
(reference models.py:16-51 creates it via `timm.create_model`), with the
reference's surgeries expressed as constructor flags instead of runtime
monkey-patching:

* ``num_classes: int | tuple`` — a tuple swaps the final Dense for a
  MultitaskHead (reference hierarchy.py:50-62 does this by surgery),
* ``blurpool=True`` — anti-aliased downsampling (Composer's BlurPool
  algorithm applies the same rewrite to stride-2 convs and the stem maxpool),
* ``features_only`` at call time — pooled pre-logits features, the analog of
  timm's ``forward_features`` + ``forward_head(pre_logits=True)``
  (reference models.py:186-205).

Weight init matches the reference's quirky ``weight_init``
(reference models.py:208-213): kaiming-normal (fan-in) conv/dense kernels and
**uniform(0,1) BatchNorm scale** — that oddity is observable behavior, kept
for accuracy parity; pass ``bn_scale_init="ones"`` for the standard choice.

Layout notes: NHWC + bf16 compute keeps convs on the MXU with native tiling;
BatchNorm statistics are computed over the *global* (mesh-sharded) batch —
XLA inserts the cross-replica reductions.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hvt.models import common
from hvt.models.heads import MultitaskHead

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def uniform01(key, shape, dtype=jnp.float32):
    """BatchNorm scale ~ U(0,1): reference models.py:211-213 (torch.rand)."""
    return jax.random.uniform(key, shape, dtype)


BN_SCALE_INITS: dict[str, Callable] = {
    "uniform01": uniform01,
    "ones": nn.initializers.ones,
}

# Rematerialization policies for per-block jax.checkpoint (selective remat:
# trade recompute FLOPs for HBM traffic on the bandwidth-bound train step —
# see BENCH.md "bytes/step"). Convolutions are not dot_general, so the
# dots_saveable policy still recomputes every conv; "nothing" is full
# per-block recompute.
REMAT_POLICIES: dict[str, Any] = {
    "nothing": jax.checkpoint_policies.nothing_saveable,
    "dots": jax.checkpoint_policies.dots_saveable,
}


def maybe_remat(block_cls, stage: int, remat_stages, remat_policy: str):
    """Wrap a block class in nn.remat when its (1-based) stage is listed.

    The lifted transform keeps the parameter tree unchanged (checkpoints are
    interchangeable with the un-rematted model); `train` is static argnum 2
    (self is 0).
    """
    if stage not in tuple(remat_stages):
        return block_cls
    return nn.remat(
        block_cls,
        static_argnums=(2,),
        policy=REMAT_POLICIES[remat_policy],
    )


def make_batch_norm(
    train: bool, dtype, scale_init, bn_groups: int = 1, bn_pallas: bool = False,
    bn_custom: bool = False,
):
    """BatchNorm flavor selector; the explicit name keeps the parameter tree
    identical across all four:

    * ``bn_groups > 1`` — per-group statistics (emulates the reference's
      per-GPU DDP BatchNorm; see common.GroupedBatchNorm).
    * ``bn_custom`` — custom-VJP jnp BatchNorm (PallasBatchNorm's jnp path):
      same math, but the backward saves only the bf16 input + per-channel
      stats instead of AD's two f32 intermediates. Measured perf-neutral on
      TPU (XLA already converts the f32 saves — BENCH.md "bytes/step");
      ships as the residual-audit ablation. ``bn_pallas`` wins if both set.
    * ``bn_pallas`` — common.PallasBatchNorm with Pallas channel reductions.
      Default OFF: XLA's conv+stats fusion measures faster (BENCH.md).
    * default: plain flax ``nn.BatchNorm``.
    """
    if bn_groups > 1:
        return common.GroupedBatchNorm(
            groups=bn_groups,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            scale_init=scale_init,
            name="BatchNorm_0",
        )
    if bn_custom and not bn_pallas:
        # Custom-VJP BatchNorm in plain jnp: identical math, but the backward
        # recomputes x-hat from the bf16 input instead of letting AD save two
        # full-size f32 intermediates per BN (flax's `x - mean` and the
        # normalized product are saved in f32) — the dominant HBM traffic of
        # the R50 train step (BENCH.md "bytes/step"). No Mosaic custom call,
        # so XLA's conv+stats fusion is preserved.
        return common.PallasBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            scale_init=scale_init,
            use_pallas=False,
            name="BatchNorm_0",
        )
    if bn_pallas:
        return common.PallasBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            scale_init=scale_init,
            name="BatchNorm_0",
        )
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        scale_init=scale_init,
        name="BatchNorm_0",
    )


def _blur_kernel(channels: int) -> np.ndarray:
    """Depthwise 3×3 binomial blur filter (BlurPool anti-aliasing)."""
    k1 = np.array([1.0, 2.0, 1.0])
    k2 = np.outer(k1, k1)
    k2 = k2 / k2.sum()
    # HWIO with feature_group_count=channels: (3, 3, 1, channels)
    return np.tile(k2[:, :, None, None], (1, 1, 1, channels))


def blur_2d(x: jax.Array, stride: int = 1) -> jax.Array:
    """Depthwise binomial blur; optionally strided (anti-aliased subsample)."""
    c = x.shape[-1]
    kernel = jnp.asarray(_blur_kernel(c), dtype=x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm + optional ReLU; blurpool-aware striding."""

    features: int
    kernel_size: int
    stride: int = 1
    act: bool = True
    blurpool: bool = False
    dtype: Any = None
    bn_scale_init: Callable = uniform01
    bn_groups: int = 1
    bn_pallas: bool = False
    bn_custom: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        stride = self.stride
        if self.blurpool and self.stride > 1:
            # Anti-aliased: blur first, then the conv at its original stride
            # (Composer BlurConv2d semantics).
            x = blur_2d(x, stride=1)
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=kaiming_normal,
        )(x)
        x = make_batch_norm(
            train, self.dtype, self.bn_scale_init, self.bn_groups, self.bn_pallas,
            self.bn_custom,
        )(x)
        if self.act:
            x = nn.relu(x)
        return x


class SpaceToDepthStem(nn.Module):
    """7×7/2 stem conv computed as a 4×4/1 conv over space-to-depth input.

    Mathematically identical to ConvBN(width, 7, stride=2) — the parameter is
    still the standard (7, 7, 3, width) kernel, rearranged at apply time into
    a (4, 4, 12, width) kernel over 2×2 space-to-depth pixels, so checkpoints
    stay interchangeable with the plain stem. The rearrangement maps source
    tap u = 2·du + a + 3 (du ∈ [-2, 1], a ∈ {0, 1}); the du = -2 phase with
    a = 0 falls outside the 7-tap window and stays zero.

    Why: TPUs tile convolutions over ≥8-deep input channels; a 3-channel 7×7
    stride-2 stem wastes most of the MXU, while the equivalent 12-channel 4×4
    stride-1 form tiles densely (standard MLPerf ResNet trick).
    """

    width: int
    dtype: Any = None
    bn_scale_init: Callable = uniform01
    bn_groups: int = 1
    bn_pallas: bool = False
    bn_custom: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        kernel = self.param("kernel", kaiming_normal, (7, 7, 3, self.width))
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0 and c == 3

        # Input: 2x2 space-to-depth -> (B, H/2, W/2, 12), channel-fastest
        # within each (a, b) phase pair to match the kernel gather below.
        x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

        # Kernel: (7,7,3,width) -> (4,4,12,width), zero where u or v = -1.
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8,8,3,w)
        k = k.reshape(4, 2, 4, 2, 3, self.width)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, self.width)

        y = jax.lax.conv_general_dilated(
            x2.astype(self.dtype),
            k.astype(self.dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = make_batch_norm(
            train, self.dtype, self.bn_scale_init, self.bn_groups, self.bn_pallas,
            self.bn_custom,
        )(y)
        return nn.relu(y)


class Bottleneck(nn.Module):
    """1×1 → 3×3 (stride) → 1×1×4 bottleneck with projection shortcut."""

    features: int  # inner width; output is 4x
    stride: int = 1
    blurpool: bool = False
    drop_path_rate: float = 0.0
    dtype: Any = None
    bn_scale_init: Callable = uniform01
    bn_groups: int = 1
    bn_pallas: bool = False
    bn_custom: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        conv = functools.partial(
            ConvBN,
            blurpool=self.blurpool,
            dtype=self.dtype,
            bn_scale_init=self.bn_scale_init,
            bn_groups=self.bn_groups,
            bn_pallas=self.bn_pallas,
            bn_custom=self.bn_custom,
        )
        out_features = self.features * 4
        shortcut = x
        if x.shape[-1] != out_features or self.stride != 1:
            shortcut = conv(
                out_features, 1, stride=self.stride, act=False, name="downsample"
            )(x, train)

        y = conv(self.features, 1, name="conv1")(x, train)
        y = conv(self.features, 3, stride=self.stride, name="conv2")(y, train)
        y = conv(out_features, 1, act=False, name="conv3")(y, train)
        if self.drop_path_rate > 0.0 and train:
            y = common.drop_path(y, self.drop_path_rate, False, self.make_rng("dropout"))
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """ResNet v1.5. stage_sizes=[3,4,6,3] → ResNet-50."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: Union[int, tuple[int, ...]] = 1000
    width: int = 64
    blurpool: bool = False
    # Linear per-block stochastic depth up to this rate (the StochasticDepth
    # algorithm, configs/recipes/hot.yaml:48-53; 'sample' method).
    stochastic_depth_rate: float = 0.0
    # Space-to-depth stem: same math, denser MXU tiling (see SpaceToDepthStem).
    # Note: changes the stem param path (stem/kernel vs stem/Conv_0/kernel).
    stem_s2d: bool = False
    dtype: Any = jnp.bfloat16
    bn_scale_init_name: str = "uniform01"
    # BN statistics per batch group: 1 = global-batch (GSPMD default);
    # N emulates the reference's N-GPU per-device DDP BatchNorm
    # (parity knob, see common.GroupedBatchNorm and PARITY.md).
    bn_groups: int = 1
    # Ablation knob: route BN through the Pallas channel-reduction kernels
    # (common.PallasBatchNorm). Off by default — XLA's conv+stats fusion
    # measures faster on TPU (see BENCH.md roofline).
    bn_pallas: bool = False
    bn_custom: bool = False
    # Selective rematerialization: 1-based stage indices whose blocks run
    # under jax.checkpoint (recompute activations in backward instead of
    # saving them — a bandwidth/FLOPs trade on the HBM-bound R50 step).
    remat_stages: Sequence[int] = ()
    remat_policy: str = "nothing"

    @property
    def num_features(self) -> int:
        return self.width * 2 ** (len(self.stage_sizes) - 1) * 4

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        features_only: bool = False,
    ) -> jax.Array | list[jax.Array]:
        bn_scale_init = BN_SCALE_INITS[self.bn_scale_init_name]
        x = x.astype(self.dtype)

        # Stem: 7×7/2 conv + 3×3/2 maxpool.
        if self.stem_s2d:
            x = SpaceToDepthStem(
                self.width, dtype=self.dtype, bn_scale_init=bn_scale_init,
                bn_groups=self.bn_groups, bn_pallas=self.bn_pallas, bn_custom=self.bn_custom, name="stem",
            )(x, train)
        else:
            x = ConvBN(
                self.width,
                7,
                stride=2,
                blurpool=False,  # Composer BlurPool skips the stem conv by default
                dtype=self.dtype,
                bn_scale_init=bn_scale_init,
                bn_groups=self.bn_groups,
                bn_pallas=self.bn_pallas,
                bn_custom=self.bn_custom,
                name="stem",
            )(x, train)
        if self.blurpool:
            # BlurMaxPool: stride-1 maxpool then anti-aliased subsample.
            x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
            x = blur_2d(x, stride=2)
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        total_blocks = sum(self.stage_sizes)
        block_idx = 0
        for stage, blocks in enumerate(self.stage_sizes):
            block_cls = maybe_remat(
                Bottleneck, stage + 1, self.remat_stages, self.remat_policy
            )
            for block in range(blocks):
                dp = self.stochastic_depth_rate * block_idx / max(total_blocks - 1, 1)
                x = block_cls(
                    features=self.width * (2**stage),
                    stride=2 if stage > 0 and block == 0 else 1,
                    blurpool=self.blurpool,
                    drop_path_rate=dp,
                    dtype=self.dtype,
                    bn_scale_init=bn_scale_init,
                    bn_groups=self.bn_groups,
                    bn_pallas=self.bn_pallas,
                    bn_custom=self.bn_custom,
                    name=f"stage{stage + 1}_block{block}",
                )(x, train)
                block_idx += 1

        # Global average pool → pre-logits features (timm forward_head
        # with pre_logits=True; reference models.py:199-203).
        x = jnp.mean(x, axis=(1, 2))
        x = x.astype(jnp.float32)
        if features_only:
            return x

        if isinstance(self.num_classes, tuple):
            return MultitaskHead(self.num_classes, dtype=jnp.float32, name="head")(x)
        return nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            kernel_init=kaiming_normal,
            name="head",
        )(x)


def analytic_flops(model: "ResNet", img_size: int) -> int:
    """Analytic forward FLOPs in the reference's convention (one
    multiply-accumulate = one FLOP, matching reference swinv2.py:847-867 and
    hvt.models.swinv2.analytic_flops)."""
    bottleneck = isinstance(model, ResNet) and not isinstance(model, BasicResNet)
    expansion = 4 if bottleneck else 1
    flops = 0
    res = img_size // 2  # stem conv /2
    flops += res * res * model.width * 3 * 49
    res //= 2  # maxpool /2
    in_ch = model.width
    for stage, blocks in enumerate(model.stage_sizes):
        width = model.width * (2**stage)
        for block in range(blocks):
            stride = 2 if stage > 0 and block == 0 else 1
            out_res = res // stride
            out_ch = width * expansion
            if bottleneck:
                flops += res * res * in_ch * width  # 1x1
                flops += out_res * out_res * width * width * 9  # 3x3 (stride)
                flops += out_res * out_res * width * out_ch  # 1x1 expand
            else:
                flops += out_res * out_res * in_ch * width * 9
                flops += out_res * out_res * width * width * 9
            if in_ch != out_ch or stride != 1:
                flops += out_res * out_res * in_ch * out_ch  # downsample
            in_ch = out_ch
            res = out_res
    ncls = model.num_classes
    heads = sum(ncls) if isinstance(ncls, tuple) else ncls
    flops += in_ch * heads
    return flops


def resnet50(
    num_classes: Union[int, tuple[int, ...]],
    *,
    blurpool: bool = False,
    stochastic_depth_rate: float = 0.0,
    stem_s2d: bool = False,
    dtype: Any = jnp.bfloat16,
    bn_scale_init: str = "uniform01",
    bn_groups: int = 1,
    bn_pallas: bool = False,
    bn_custom: bool = False,
    remat_stages: Sequence[int] = (),
    remat_policy: str = "nothing",
    **unused,
) -> ResNet:
    return ResNet(
        stage_sizes=(3, 4, 6, 3),
        num_classes=num_classes,
        blurpool=blurpool,
        stochastic_depth_rate=stochastic_depth_rate,
        stem_s2d=stem_s2d,
        dtype=dtype,
        bn_scale_init_name=bn_scale_init,
        bn_groups=bn_groups,
        bn_pallas=bn_pallas,
        bn_custom=bn_custom,
        remat_stages=tuple(remat_stages),
        remat_policy=remat_policy,
    )


def _warn_ignored_basic_kwargs(name: str, unused: dict) -> None:
    """A config knob that silently no-ops is worse than a rejected one: the
    BasicResNet test models do not implement stochastic depth, so say so."""
    if unused.get("stochastic_depth_rate"):
        import warnings

        warnings.warn(
            f"{name} (BasicResNet) ignores stochastic_depth_rate="
            f"{unused['stochastic_depth_rate']}; only the bottleneck family "
            "(resnet50) implements stochastic depth",
            stacklevel=3,
        )


def resnet101(
    num_classes: Union[int, tuple[int, ...]],
    *,
    blurpool: bool = False,
    stochastic_depth_rate: float = 0.0,
    stem_s2d: bool = False,
    dtype: Any = jnp.bfloat16,
    bn_scale_init: str = "uniform01",
    bn_groups: int = 1,
    bn_pallas: bool = False,
    bn_custom: bool = False,
    remat_stages: Sequence[int] = (),
    remat_policy: str = "nothing",
    **unused,
) -> "ResNet":
    return ResNet(
        remat_stages=tuple(remat_stages),
        remat_policy=remat_policy,
        stage_sizes=(3, 4, 23, 3),
        bn_custom=bn_custom,
        num_classes=num_classes,
        blurpool=blurpool,
        stochastic_depth_rate=stochastic_depth_rate,
        stem_s2d=stem_s2d,
        dtype=dtype,
        bn_scale_init_name=bn_scale_init,
        bn_groups=bn_groups,
        bn_pallas=bn_pallas,
    )


def resnet152(
    num_classes: Union[int, tuple[int, ...]],
    *,
    blurpool: bool = False,
    stochastic_depth_rate: float = 0.0,
    stem_s2d: bool = False,
    dtype: Any = jnp.bfloat16,
    bn_scale_init: str = "uniform01",
    bn_groups: int = 1,
    bn_pallas: bool = False,
    bn_custom: bool = False,
    remat_stages: Sequence[int] = (),
    remat_policy: str = "nothing",
    **unused,
) -> "ResNet":
    return ResNet(
        remat_stages=tuple(remat_stages),
        remat_policy=remat_policy,
        stage_sizes=(3, 8, 36, 3),
        bn_custom=bn_custom,
        num_classes=num_classes,
        blurpool=blurpool,
        stochastic_depth_rate=stochastic_depth_rate,
        stem_s2d=stem_s2d,
        dtype=dtype,
        bn_scale_init_name=bn_scale_init,
        bn_groups=bn_groups,
        bn_pallas=bn_pallas,
    )


def resnet34(
    num_classes: Union[int, tuple[int, ...]],
    *,
    blurpool: bool = False,
    dtype: Any = jnp.bfloat16,
    bn_scale_init: str = "uniform01",
    **unused,
) -> "ResNet":
    _warn_ignored_basic_kwargs("resnet34", unused)
    return BasicResNet(
        bn_groups=int(unused.get("bn_groups", 1)),
        bn_pallas=bool(unused.get("bn_pallas", False)),
        bn_custom=bool(unused.get("bn_custom", False)),
        remat_stages=tuple(unused.get("remat_stages", ())),
        remat_policy=str(unused.get("remat_policy", "nothing")),
        stage_sizes=(3, 4, 6, 3),
        num_classes=num_classes,
        blurpool=blurpool,
        dtype=dtype,
        bn_scale_init_name=bn_scale_init,
    )


def resnet18(
    num_classes: Union[int, tuple[int, ...]],
    *,
    blurpool: bool = False,
    dtype: Any = jnp.bfloat16,
    bn_scale_init: str = "uniform01",
    **unused,
) -> "ResNet":
    """Small variant for tests/debug configs."""
    _warn_ignored_basic_kwargs("resnet18", unused)
    return BasicResNet(
        bn_groups=int(unused.get("bn_groups", 1)),
        bn_pallas=bool(unused.get("bn_pallas", False)),
        bn_custom=bool(unused.get("bn_custom", False)),
        remat_stages=tuple(unused.get("remat_stages", ())),
        remat_policy=str(unused.get("remat_policy", "nothing")),
        stage_sizes=(2, 2, 2, 2),
        num_classes=num_classes,
        blurpool=blurpool,
        dtype=dtype,
        bn_scale_init_name=bn_scale_init,
    )


def resnet_micro_bottleneck(
    num_classes: Union[int, tuple[int, ...]],
    *,
    blurpool: bool = False,
    stochastic_depth_rate: float = 0.0,
    stem_s2d: bool = False,
    dtype: Any = jnp.float32,
    bn_scale_init: str = "ones",
    bn_groups: int = 1,
    bn_pallas: bool = False,
    bn_custom: bool = False,
    remat_stages: Sequence[int] = (),
    remat_policy: str = "nothing",
    **unused,
) -> ResNet:
    """Tiny 2-stage *bottleneck* ResNet: the full resnet50 block family
    (stochastic depth, blurpool, s2d stem) at test scale — the CI stand-in
    for the hot-recipe composition (configs/recipes/hot.yaml)."""
    return ResNet(
        stage_sizes=(1, 1),
        width=8,
        num_classes=num_classes,
        blurpool=blurpool,
        stochastic_depth_rate=stochastic_depth_rate,
        stem_s2d=stem_s2d,
        dtype=dtype,
        bn_scale_init_name=bn_scale_init,
        bn_groups=bn_groups,
        bn_pallas=bn_pallas,
        bn_custom=bn_custom,
        remat_stages=tuple(remat_stages),
        remat_policy=remat_policy,
    )


def resnet_micro(
    num_classes: Union[int, tuple[int, ...]],
    *,
    blurpool: bool = False,
    dtype: Any = jnp.float32,
    bn_scale_init: str = "ones",
    **unused,
) -> "ResNet":
    """Tiny 2-stage ResNet for tests and CPU smoke runs."""
    _warn_ignored_basic_kwargs("resnet_micro", unused)
    return BasicResNet(
        bn_groups=int(unused.get("bn_groups", 1)),
        bn_pallas=bool(unused.get("bn_pallas", False)),
        bn_custom=bool(unused.get("bn_custom", False)),
        remat_stages=tuple(unused.get("remat_stages", ())),
        remat_policy=str(unused.get("remat_policy", "nothing")),
        stage_sizes=(1, 1),
        width=8,
        num_classes=num_classes,
        blurpool=blurpool,
        dtype=dtype,
        bn_scale_init_name=bn_scale_init,
    )


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    blurpool: bool = False
    dtype: Any = None
    bn_scale_init: Callable = uniform01
    bn_groups: int = 1
    bn_pallas: bool = False
    bn_custom: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        conv = functools.partial(
            ConvBN,
            blurpool=self.blurpool,
            dtype=self.dtype,
            bn_scale_init=self.bn_scale_init,
            bn_groups=self.bn_groups,
            bn_pallas=self.bn_pallas,
            bn_custom=self.bn_custom,
        )
        shortcut = x
        if x.shape[-1] != self.features or self.stride != 1:
            shortcut = conv(self.features, 1, stride=self.stride, act=False, name="downsample")(
                x, train
            )
        y = conv(self.features, 3, stride=self.stride, name="conv1")(x, train)
        y = conv(self.features, 3, act=False, name="conv2")(y, train)
        return nn.relu(y + shortcut)


class BasicResNet(ResNet):
    """ResNet with basic (2-conv) blocks — resnet18/34 family."""

    @property
    def num_features(self) -> int:
        return self.width * 2 ** (len(self.stage_sizes) - 1)

    @nn.compact
    def __call__(self, x, train=False, features_only=False):
        bn_scale_init = BN_SCALE_INITS[self.bn_scale_init_name]
        x = x.astype(self.dtype)
        x = ConvBN(
            self.width, 7, stride=2, dtype=self.dtype,
            bn_scale_init=bn_scale_init, bn_groups=self.bn_groups,
            bn_pallas=self.bn_pallas, bn_custom=self.bn_custom, name="stem",
        )(x, train)
        if self.blurpool:
            x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
            x = blur_2d(x, stride=2)
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, blocks in enumerate(self.stage_sizes):
            block_cls = maybe_remat(
                BasicBlock, stage + 1, self.remat_stages, self.remat_policy
            )
            for block in range(blocks):
                x = block_cls(
                    features=self.width * (2**stage),
                    stride=2 if stage > 0 and block == 0 else 1,
                    blurpool=self.blurpool,
                    dtype=self.dtype,
                    bn_scale_init=bn_scale_init,
                    bn_groups=self.bn_groups,
                    bn_pallas=self.bn_pallas,
                    bn_custom=self.bn_custom,
                    name=f"stage{stage + 1}_block{block}",
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = x.astype(jnp.float32)
        if features_only:
            return x
        if isinstance(self.num_classes, tuple):
            return MultitaskHead(self.num_classes, dtype=jnp.float32, name="head")(x)
        return nn.Dense(
            self.num_classes, dtype=jnp.float32, kernel_init=kaiming_normal, name="head"
        )(x)
