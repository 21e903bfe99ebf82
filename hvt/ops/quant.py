"""Post-training int8 quantization for the serving forward (w8a8, dynamic).

No reference counterpart (the reference has no deployment story at all —
SURVEY.md §2; hvt's serving stack is beyond-parity). This module exists
because the serving hardware rewards it twice: the v5e MXU runs int8
matmuls/convs at 2x its bf16 rate (394 TOPS vs 197 TFLOPS), and the eval
forward is bandwidth-bound (BENCH.md roofline accounting), so int8
activations halve the HBM bytes the step actually pays for.

Scheme — the standard PTQ recipe that holds ResNet-class top-1 within a
few tenths of a point without calibration data:

* **Weights**: per-output-channel symmetric absmax scales, rounded to
  int8 at trace time. Exported weights are constants, so XLA constant-
  folds the rounding — the artifact stores int8 kernels, no runtime cost.
* **Activations**: dynamic per-tensor symmetric absmax, computed in-graph
  per forward. No calibration set needed (the reference ships none), and
  the absmax reduction fuses into the producer fusion on TPU.
* **Accumulation**: int32 (``preferred_element_type``), rescaled to the
  layer's original output dtype; bias added in float.

Coverage: every ``nn.Conv`` / ``nn.Dense`` call in the model, intercepted
via ``flax.linen.intercept_methods`` — no model-code changes, any flax
model works. Deliberately kept full precision:

* modules whose path matches ``skip`` (default: the classifier ``head`` —
  the classic last-layer accuracy guard, <1% of serving FLOPs),
* the ResNet space-to-depth stem and the SwinV2 qkv projection (raw
  ``self.param`` matmuls, not flax layer calls — first-layer/attention
  quantization is where PTQ accuracy goes to die anyway),
* convs with non-default dilation (none in the model zoo).

Entry point: ``wrap_int8(forward)`` → the same callable with int8
Conv/Dense bodies; ``hvt.tools.export_serving --quantize int8`` applies it
to the artifact forward. ``simulate=True`` runs the identical math with
float ops (fake-quant) — the CI oracle for the int8 lowering.

**Static (calibrated) activation scales**: dynamic per-tensor absmax costs
one reduction pass per quantized layer. ``collect_act_scales(forward,
batches)`` records each layer's absmax over a few calibration batches
(eager, full-precision math), and ``wrap_int8(..., act_scales=...)`` bakes
those scales in as constants — no in-graph reductions, the production
recipe (``export_serving --quantize int8 --calibrate N``). Layers unseen
during calibration fall back to dynamic scales.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_EPS = 1e-8


def quantize_weight(kernel: jax.Array, reduce_axes: Sequence[int]):
    """→ (int8 kernel, f32 per-out-channel scale, broadcastable to kernel).

    Symmetric absmax over ``reduce_axes`` (everything but the output-channel
    axis). ``dequant = q.astype(f32) * scale`` reproduces the kernel to
    within scale/2 per element.
    """
    w = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(reduce_axes), keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act(x: jax.Array, scale=None):
    """→ (int8 x, f32 scalar scale). Symmetric absmax — dynamic (computed
    from x in-graph) unless a static calibrated ``scale`` is given."""
    xf = x.astype(jnp.float32)
    if scale is None:
        scale = jnp.maximum(jnp.max(jnp.abs(xf)), _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _module_key(mod) -> str:
    """Stable per-layer key shared by calibration and the int8 rewrite."""
    return "/".join(str(p) for p in (mod.path if mod is not None else ()))


def collect_act_scales(
    forward: Callable,
    batches,
    *,
    skip: Sequence[str] = ("head",),
) -> dict:
    """Calibrate: → {module path: f32 scale} over a few forward batches.

    Runs ``forward`` eagerly at full precision with a recording
    interceptor: each quantizable Conv/Dense input's absmax is tracked
    across ``batches`` (running max — the standard absmax calibration),
    then converted to the symmetric int8 scale absmax/127.
    """
    absmax: dict = {}

    def recorder(next_fun, args, kwargs, context):
        mod = context.module
        if (
            context.method_name == "__call__"
            and isinstance(mod, (nn.Dense, nn.Conv))
            and not any(
                s in str(part) for part in (mod.path or ()) for s in skip
            )
            and (isinstance(mod, nn.Dense) or _supported_conv(mod))
        ):
            key = _module_key(mod)
            seen = float(jnp.max(jnp.abs(args[0].astype(jnp.float32))))
            absmax[key] = max(absmax.get(key, 0.0), seen)
        return next_fun(*args, **kwargs)

    for batch in batches:
        with nn.intercept_methods(recorder):
            forward(batch)
    return {k: max(v, _EPS) / 127.0 for k, v in absmax.items()}


def _norm_padding(padding, spatial_rank: int):
    """nn.Conv padding forms → lax form ('SAME'/'VALID' or pair sequence)."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * spatial_rank
    pads = []
    for p in padding:
        pads.append((p, p) if isinstance(p, int) else tuple(p))
    return pads


def _out_dtype(mod, x):
    return mod.dtype if mod.dtype is not None else x.dtype


def _quant_conv(mod: nn.Conv, x: jax.Array, *, simulate: bool,
                act_scale=None):
    """int8 twin of nn.Conv.__call__ for the shapes the model zoo uses."""
    spatial = len(mod.kernel_size)
    in_features = x.shape[-1]
    kshape = tuple(mod.kernel_size) + (
        in_features // mod.feature_group_count,
        mod.features,
    )
    kernel = mod.param("kernel", mod.kernel_init, kshape, mod.param_dtype)
    bias = (
        mod.param("bias", mod.bias_init, (mod.features,), mod.param_dtype)
        if mod.use_bias
        else None
    )

    wq, sw = quantize_weight(kernel, reduce_axes=range(kernel.ndim - 1))
    xq, sx = quantize_act(x, act_scale)
    strides = mod.strides if mod.strides is not None else (1,) * spatial
    if isinstance(strides, int):
        strides = (strides,) * spatial
    dn = ("NHWC", "HWIO", "NHWC") if spatial == 2 else None
    if simulate:
        y = jax.lax.conv_general_dilated(
            xq.astype(jnp.float32),
            wq.astype(jnp.float32),
            window_strides=tuple(strides),
            padding=_norm_padding(mod.padding, spatial),
            dimension_numbers=dn,
            feature_group_count=mod.feature_group_count,
        )
    else:
        y = jax.lax.conv_general_dilated(
            xq,
            wq,
            window_strides=tuple(strides),
            padding=_norm_padding(mod.padding, spatial),
            dimension_numbers=dn,
            feature_group_count=mod.feature_group_count,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    # sw is (1, ..., 1, O) over kernel dims; align it to the channel-last
    # output by reshaping to (1,)*spatial+1 x O.
    y = y * (sx * sw.reshape((1,) * (y.ndim - 1) + (-1,)))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(_out_dtype(mod, x))


def _quant_dense(mod: nn.Dense, x: jax.Array, *, simulate: bool,
                 act_scale=None):
    """int8 twin of nn.Dense.__call__ (contract last dim, any leading dims)."""
    kernel = mod.param(
        "kernel", mod.kernel_init, (x.shape[-1], mod.features), mod.param_dtype
    )
    bias = (
        mod.param("bias", mod.bias_init, (mod.features,), mod.param_dtype)
        if mod.use_bias
        else None
    )
    wq, sw = quantize_weight(kernel, reduce_axes=(0,))
    xq, sx = quantize_act(x, act_scale)
    dims = (((x.ndim - 1,), (0,)), ((), ()))
    if simulate:
        y = jax.lax.dot_general(
            xq.astype(jnp.float32), wq.astype(jnp.float32), dims
        )
    else:
        y = jax.lax.dot_general(
            xq, wq, dims, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    y = y * (sx * sw.reshape((1,) * (y.ndim - 1) + (-1,)))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(_out_dtype(mod, x))


def _supported_conv(mod: nn.Conv) -> bool:
    """Only the conv shapes the model zoo uses; anything exotic stays fp."""
    one = lambda d: d is None or d == 1 or (
        not isinstance(d, int) and all(v == 1 for v in d)
    )
    return (
        len(mod.kernel_size) == 2
        and one(mod.input_dilation)
        and one(mod.kernel_dilation)
        and getattr(mod, "mask", None) is None
    )


def make_interceptor(skip: Sequence[str] = ("head",), *, simulate: bool = False,
                     act_scales: "dict | None" = None):
    """→ a flax interceptor replacing Conv/Dense bodies with int8 twins.

    ``skip``: module-path components that keep full precision (substring
    match on any path element, e.g. ``("head",)`` spares the classifier
    and every submodule under it). ``act_scales``: calibrated static
    scales by module path (``collect_act_scales``); layers not in the dict
    use dynamic scales.
    """
    skip = tuple(skip)

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        path = mod.path if mod is not None else ()
        if any(s in str(part) for part in path for s in skip):
            return next_fun(*args, **kwargs)
        scale = (act_scales or {}).get(_module_key(mod))
        if isinstance(mod, nn.Dense):
            return _quant_dense(mod, args[0], simulate=simulate,
                                act_scale=scale)
        if isinstance(mod, nn.Conv) and _supported_conv(mod):
            return _quant_conv(mod, args[0], simulate=simulate,
                               act_scale=scale)
        return next_fun(*args, **kwargs)

    return interceptor


def wrap_int8(
    forward: Callable,
    *,
    skip: Sequence[str] = ("head",),
    simulate: bool = False,
    act_scales: "dict | None" = None,
) -> Callable:
    """Wrap a traceable forward so every Conv/Dense inside runs int8.

    The wrapper is itself traceable (jit/export-safe); ``simulate=True``
    lowers the same math through float ops (the CI cross-check for the
    int8 graph — products of two 127-bounded ints summed over the model's
    fan-ins stay exact in f32 to ~2^24). ``act_scales`` switches layers it
    names to static calibrated scales (no in-graph absmax reductions).
    """

    @functools.wraps(forward)
    def wrapped(*args, **kwargs):
        with nn.intercept_methods(
            make_interceptor(skip, simulate=simulate, act_scales=act_scales)
        ):
            return forward(*args, **kwargs)

    return wrapped
