"""Model factory: config → flax module (reference models.py:16-51).

The reference creates timm models then performs head surgery for multitask
and wraps frozen variants; in hvt all of that is constructor/call-time
configuration: ``num_classes`` may be a tuple (multitask head), BlurPool is a
flag (derived from the algorithms list, like Composer's surgery), and the
linear-probe / simpleshot variants call the model with ``features_only=True``.
"""

from __future__ import annotations

from typing import Union

from hvt.models import resnet

VALID_VARIANTS = (
    "full-tuning",
    "linear-probe",
    "simpleshot",
    "simpleshot-l2n",
    "simpleshot-cl2n",
)


def _swin(name):
    def build(num_classes, **kwargs):
        from hvt.models import swinv2  # deferred: keep resnet-only paths light

        return getattr(swinv2, name)(num_classes, **kwargs)

    return build


def _lazy(module_name, name):
    def build(num_classes, **kwargs):
        import importlib

        module = importlib.import_module(f"hvt.models.{module_name}")
        return getattr(module, name)(num_classes, **kwargs)

    return build


def _registry():
    return {
        "resnet50": resnet.resnet50,
        "resnet101": resnet.resnet101,
        "resnet152": resnet.resnet152,
        "resnet34": resnet.resnet34,
        "resnet18": resnet.resnet18,
        "resnet_micro": resnet.resnet_micro,
        "resnet_micro_bottleneck": resnet.resnet_micro_bottleneck,
        "swinv2_micro": _swin("swinv2_micro"),
        "swinv2_micro_deep": _swin("swinv2_micro_deep"),
        "swinv2_tiny": _swin("swinv2_tiny"),
        "swinv2_tiny_window8_256": _swin("swinv2_tiny_window8_256"),
        "swinv2_tiny_window16_256": _swin("swinv2_tiny_window16_256"),
        "swinv2_small": _swin("swinv2_small"),
        "swinv2_base": _swin("swinv2_base"),
        "swinv2_large": _swin("swinv2_large"),
        "swinv2_large_window12_192": _swin("swinv2_large_window12_192"),
        # ViT / ConvNeXt (timm-zoo breadth beyond the reference's shipped
        # configs; same timm names, reference models.py:16-25).
        "vit_tiny_patch16_224": _lazy("vit", "vit_tiny_patch16_224"),
        "vit_small_patch16_224": _lazy("vit", "vit_small_patch16_224"),
        "vit_base_patch16_224": _lazy("vit", "vit_base_patch16_224"),
        "vit_base_patch32_224": _lazy("vit", "vit_base_patch32_224"),
        "vit_large_patch16_224": _lazy("vit", "vit_large_patch16_224"),
        "vit_micro": _lazy("vit", "vit_micro"),
        "convnext_tiny": _lazy("convnext", "convnext_tiny"),
        "convnext_small": _lazy("convnext", "convnext_small"),
        "convnext_base": _lazy("convnext", "convnext_base"),
        "convnext_large": _lazy("convnext", "convnext_large"),
        "convnext_micro": _lazy("convnext", "convnext_micro"),
        "efficientnet_b0": _lazy("efficientnet", "efficientnet_b0"),
        "efficientnet_b1": _lazy("efficientnet", "efficientnet_b1"),
        "efficientnet_b2": _lazy("efficientnet", "efficientnet_b2"),
        "efficientnet_b3": _lazy("efficientnet", "efficientnet_b3"),
        "efficientnet_b4": _lazy("efficientnet", "efficientnet_b4"),
        "efficientnet_b5": _lazy("efficientnet", "efficientnet_b5"),
        "efficientnet_micro": _lazy("efficientnet", "efficientnet_micro"),
        "regnety_004": _lazy("regnet", "regnety_004"),
        "regnety_008": _lazy("regnet", "regnety_008"),
        "regnety_016": _lazy("regnet", "regnety_016"),
        "regnety_040": _lazy("regnet", "regnety_040"),
        "regnety_080": _lazy("regnet", "regnety_080"),
        "regnety_160": _lazy("regnet", "regnety_160"),
        "regnety_320": _lazy("regnet", "regnety_320"),
        "regnety_micro": _lazy("regnet", "regnety_micro"),
        "dinov2_vits14": _lazy("dinov2", "dinov2_vits14"),
        "dinov2_vitb14": _lazy("dinov2", "dinov2_vitb14"),
        "dinov2_vitl14": _lazy("dinov2", "dinov2_vitl14"),
        "dinov2_vitg14": _lazy("dinov2", "dinov2_vitg14"),
        "dinov2_micro": _lazy("dinov2", "dinov2_micro"),
    }


def build_model(config, num_classes: Union[int, tuple[int, ...]]):
    """Returns the flax module. Multitask requires hierarchy.variant=multitask
    (reference models.py:20-23)."""
    if isinstance(num_classes, tuple) and config.hierarchy.variant != "multitask":
        raise ValueError(
            "tuple num_classes requires hierarchy.variant == 'multitask'"
        )
    if config.model.variant not in VALID_VARIANTS:
        raise ValueError(
            f"unknown model.variant {config.model.variant!r} (valid: {VALID_VARIANTS})"
        )

    registry = _registry()
    name = config.model.name
    if name in registry:
        builder = registry[name]
    elif ":" in name:
        # Open-name escape hatch, the analog of the reference accepting any
        # timm string (reference models.py:16-25): ``module.path:symbol``
        # resolves by import to a builder with the registry signature
        # ``builder(num_classes, **kwargs) -> flax module``.
        import importlib

        module_name, _, symbol = name.partition(":")
        try:
            module = importlib.import_module(module_name)
        except ImportError as e:
            raise ValueError(
                f"model {name!r}: cannot import module {module_name!r}"
            ) from e
        builder = getattr(module, symbol, None)
        if not callable(builder):
            raise ValueError(
                f"model {name!r}: {module_name}.{symbol} is not a callable "
                "model builder (expected builder(num_classes, **kwargs))"
            )
    else:
        raise ValueError(
            f"unknown model {name!r}. The reference resolves model names "
            "through timm (reference models.py:16-25); hvt ships native flax "
            f"implementations of the models its configs use: {sorted(registry)}. "
            "For another architecture, register a flax implementation in "
            "hvt.models.factory._registry, or use the open-name form "
            "'module.path:symbol' to resolve a builder by import."
        )

    blurpool = any(a.cls == "BlurPool" for a in config.algorithms)
    kwargs = dict(config.model.args)
    kwargs.setdefault("dtype", config.precision.compute_dtype)
    for algo in config.algorithms:
        if algo.cls == "StochasticDepth":
            if name.startswith("resnet"):
                kwargs.setdefault(
                    "stochastic_depth_rate", float(algo.args.get("drop_rate", 0.1))
                )
            else:
                kwargs.setdefault(
                    "drop_path_rate", float(algo.args.get("drop_rate", 0.1))
                )
    return builder(num_classes, blurpool=blurpool, **kwargs)


def features_only(config) -> bool:
    """Frozen-feature variants (reference models.py:42-49)."""
    return config.model.variant in (
        "linear-probe",
        "simpleshot",
        "simpleshot-l2n",
        "simpleshot-cl2n",
    )
