"""Classification heads shared across backbones."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax


class MultitaskHead(nn.Module):
    """One linear classifier per taxonomy tier; returns a list of logits.

    Parity with the reference's MultitaskHead (reference hierarchy.py:19-47,
    duplicated at swinv2.py:12-40): each tier gets an independent
    Dense(num_features → num_classes[tier]) over the shared pooled features.
    """

    num_classes: Sequence[int]
    dtype: Any = None
    kernel_init: Any = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        for n in self.num_classes:
            assert n > 0, "every tier needs at least one class"
        return [
            nn.Dense(
                n,
                dtype=self.dtype,
                kernel_init=self.kernel_init,
                name=f"tier{i}",
            )(x)
            for i, n in enumerate(self.num_classes)
        ]
