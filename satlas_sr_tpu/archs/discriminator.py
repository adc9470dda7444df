"""U-Net discriminator with spectral norm (Real-ESRGAN style), TPU-native.

Capability parity with `SSR_UNetDiscriminatorSN`
(ssr/archs/discriminator_arch.py:11-71): conv0 + three stride-2 SN down convs,
three bilinear-upsample SN convs with skip adds, two extra SN convs and a
1-channel per-pixel logit head.

Spectral-norm u/v vectors live in the `spectral` collection (see
ops/spectral_norm.py); the GAN train step passes update_stats=True and
mutable=['spectral'] so power iteration is part of the jitted program.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import ARCH_REGISTRY
from ..ops.resize import upsample_bilinear
from ..ops.spectral_norm import SNConv
from .rrdbnet import lrelu


@ARCH_REGISTRY.register("SSR_UNetDiscriminatorSN")
class UNetDiscriminatorSN(nn.Module):
    num_in_ch: int
    num_feat: int = 64
    skip_connection: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        nf = self.num_feat
        sn = lambda name, feats, k, s, p: SNConv(
            feats, (k, k), (s, s), p, use_bias=False, dtype=self.dtype, name=name
        )
        x0 = lrelu(nn.Conv(nf, (3, 3), padding=1, name="conv0", dtype=self.dtype)(x))
        x1 = lrelu(sn("conv1", nf * 2, 4, 2, 1)(x0, update_stats))
        x2 = lrelu(sn("conv2", nf * 4, 4, 2, 1)(x1, update_stats))
        x3 = lrelu(sn("conv3", nf * 8, 4, 2, 1)(x2, update_stats))

        x3 = upsample_bilinear(x3, 2)
        x4 = lrelu(sn("conv4", nf * 4, 3, 1, 1)(x3, update_stats))
        if self.skip_connection:
            x4 = x4 + x2
        x4 = upsample_bilinear(x4, 2)
        x5 = lrelu(sn("conv5", nf * 2, 3, 1, 1)(x4, update_stats))
        if self.skip_connection:
            x5 = x5 + x1
        x5 = upsample_bilinear(x5, 2)
        x6 = lrelu(sn("conv6", nf, 3, 1, 1)(x5, update_stats))
        if self.skip_connection:
            x6 = x6 + x0

        out = lrelu(sn("conv7", nf, 3, 1, 1)(x6, update_stats))
        out = lrelu(sn("conv8", nf, 3, 1, 1)(out, update_stats))
        out = nn.Conv(1, (3, 3), padding=1, name="conv9", dtype=self.dtype)(out)
        return out
