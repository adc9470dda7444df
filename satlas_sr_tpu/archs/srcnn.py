"""SRCNN (WorldStrat baseline) — revisits fused as channels, TPU-native.

Capability parity with ssr/archs/srcnn_arch.py:12-218: per-revisit
DoubleConv2d encoder, channel-concat fusion (DoubleConv2d + N ResidualBlocks),
PixelShuffle super-resolver, then a bilinear (antialiased) resize to
output_size. Optional torch-lower-median reference frame concat and an
optional OneHot(12) mask encoder.

Input is 5-D [B, T, H, W, C] (the `use_3d` path of the reference dataset);
output is [B, 1, H_out, W_out, C_out] keeping the revisit placeholder dim.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import ARCH_REGISTRY
from ..ops.median import lower_median
from ..ops.resize import resize_bilinear
from .blocks import DoubleConv2d, OneHot, PixelShuffleBlock, ResidualBlock


@ARCH_REGISTRY.register("SRCNN")
class SRCNN(nn.Module):
    in_channels: int = 3
    mask_channels: int = 0
    revisits: int = 8
    hidden_channels: int = 128
    out_channels: int = 3
    kernel_size: int = 3
    residual_layers: int = 1
    output_size: int = 128
    zoom_factor: int = 4
    sr_kernel_size: int = 1
    use_reference_frame: bool = False
    dtype: Any = jnp.float32

    def _encode(self, x: jax.Array, mask: Optional[jax.Array], train: bool):
        """Shared per-revisit encoding: [B,T,H,W,C] -> [B,T,H,W,hidden(+mask)]."""
        if self.use_reference_frame:
            ref = lower_median(x, axis=1, keepdims=True)
            x = jnp.concatenate([x, jnp.broadcast_to(ref, x.shape)], axis=-1)
        b, t, h, w, c = x.shape
        flat = x.reshape(b * t, h, w, c)
        enc = DoubleConv2d(self.hidden_channels, self.kernel_size, self.dtype, name="encoder")(
            flat, train
        )
        if mask is not None and self.mask_channels > 0:
            m = mask.reshape(b * t, h, w, mask.shape[-1])
            m = OneHot(12)(m)
            m = DoubleConv2d(1, 3, self.dtype, name="mask_encoder")(m, train)
            m = jax.nn.sigmoid(m)
            enc = jnp.concatenate([enc, m], axis=-1)
        return enc.reshape(b, t, h, w, enc.shape[-1])

    def _super_resolve(self, fused: jax.Array, train: bool) -> jax.Array:
        """[B,H,W,hidden] -> [B,1,out,out,C] via pixel-shuffle SR + resize."""
        y = PixelShuffleBlock(
            self.hidden_channels,
            self.out_channels,
            self.sr_kernel_size,
            self.zoom_factor,
            self.dtype,
            name="sr",
        )(fused, train)
        out_hw = (
            (self.output_size, self.output_size)
            if isinstance(self.output_size, int)
            else tuple(self.output_size)
        )
        y = resize_bilinear(y, out_hw, antialias=True)
        return y[:, None]

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        y: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        enc = self._encode(x, mask, train)
        b, t, h, w, c = enc.shape
        # Revisits-as-channels, revisit-major ordering (srcnn_arch.py:183-185).
        fused_in = enc.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
        fused = DoubleConv2d(self.hidden_channels, self.kernel_size, self.dtype, name="fusion_conv")(
            fused_in, train
        )
        for i in range(self.residual_layers):
            fused = ResidualBlock(
                self.hidden_channels, self.kernel_size, self.dtype, name=f"fusion_res{i}"
            )(fused, train)
        return self._super_resolve(fused, train)
