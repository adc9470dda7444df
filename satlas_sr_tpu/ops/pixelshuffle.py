"""Pixel (un)shuffle with PyTorch channel-ordering semantics, on NHWC arrays.

Used by: RRDBNet scale 1/2 input folding (ssr/archs/rrdbnet_arch.py:95-98,117-120)
and the SRCNN/HighResNet PixelShuffleBlock (ssr/archs/arch_util.py:564-598).

Torch's nn.PixelShuffle(r) maps channel index c*r*r + i*r + j of the input to
spatial offset (i, j) of channel c; we reproduce exactly that ordering so that
imported checkpoints see identical feature wiring.
"""

from __future__ import annotations

import jax


def pixel_shuffle(x: jax.Array, scale: int) -> jax.Array:
    """[N, H, W, C*r*r] -> [N, H*r, W*r, C] with torch channel ordering."""
    n, h, w, crr = x.shape
    r = scale
    c = crr // (r * r)
    assert c * r * r == crr, f"channels {crr} not divisible by scale^2 {r * r}"
    x = x.reshape(n, h, w, c, r, r)  # (..., c, i, j)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, c
    return x.reshape(n, h * r, w * r, c)


def pixel_unshuffle(x: jax.Array, scale: int) -> jax.Array:
    """[N, H*r, W*r, C] -> [N, H, W, C*r*r] — inverse of pixel_shuffle."""
    n, hr, wr, c = x.shape
    r = scale
    h, w = hr // r, wr // r
    assert h * r == hr and w * r == wr
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, i, j
    return x.reshape(n, h, w, c * r * r)
