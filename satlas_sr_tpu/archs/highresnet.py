"""HighResNet — SRCNN with recursive pairwise revisit fusion, TPU-native.

Capability parity with ssr/archs/highresnet_arch.py:9-77: identical encoder /
super-resolver to SRCNN, but fusion is a RecursiveFusion of log2(T) pairwise
FusionBlock applications sharing ONE set of weights (reference quirk at
arch_util.py:331-335, preserved).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax

from ..registry import ARCH_REGISTRY
from .blocks import RecursiveFusion
from .srcnn import SRCNN


@ARCH_REGISTRY.register("HighResNet")
class HighResNet(SRCNN):
    skip_paddings: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        y: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        enc = self._encode(x, mask, train)
        fused = RecursiveFusion(
            self.hidden_channels, self.kernel_size, self.revisits, self.dtype, name="fusion"
        )(enc, train)
        return self._super_resolve(fused, train)
