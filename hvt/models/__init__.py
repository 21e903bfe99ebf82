"""Model zoo: ResNet (flax.linen, NHWC) and SwinV2 (jnp + Pallas kernels)."""

from hvt.models.factory import build_model

__all__ = ["build_model"]
