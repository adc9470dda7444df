"""Image resizing with PyTorch-compatible semantics, NHWC layout.

The reference uses three resize flavours on the hot paths:
- nearest x2 inside the RRDBNet upsample stages (ssr/archs/rrdbnet_arch.py:127-134)
- nearest x4 for discriminator LR conditioning (ssr/models/ssr_esrgan_model.py:133)
- bilinear x2 (align_corners=False) inside the U-Net discriminator
  (ssr/archs/discriminator_arch.py:50-60)
- bilinear resize with antialias for SRCNN output (ssr/archs/srcnn_arch.py:118-123)

For integer upsampling, nearest == repeat and bilinear(align_corners=False) ==
half-pixel-centres linear interpolation, both reproduced exactly here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_nearest(x: jax.Array, scale: int) -> jax.Array:
    """Nearest-neighbour integer upsample of an NHWC array.

    Exactly matches torch.nn.functional.interpolate(mode='nearest') for integer
    scale factors (each source pixel becomes a scale x scale block).
    """
    if scale == 1:
        return x
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x


def _linear_weights(out_size: int, in_size: int, dtype):
    """Source indices + lerp weights for half-pixel-centre linear interpolation."""
    # Half-pixel centres: src = (dst + 0.5) * (in/out) - 0.5, clamped.
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) * (in_size / out_size) - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo.astype(jnp.float32)).astype(dtype)
    return lo, hi, w_hi


def _interp_matrix(out_size: int, in_size: int) -> jnp.ndarray:
    """Dense [out, in] half-pixel-centre linear interpolation matrix.

    Spatial gathers (jnp.take) lower to per-row dynamic-slice while-loops on
    TPU — profiled at ~4 ms per 128-row resize in the GAN step. A dense
    interpolation matmul instead rides the MXU and fuses; sizes here are tiny
    (<=384^2 f32)."""
    lo, hi, w_hi = _linear_weights(out_size, in_size, jnp.float32)
    m = jnp.zeros((out_size, in_size), jnp.float32)
    rows = jnp.arange(out_size)
    m = m.at[rows, lo].add(1.0 - w_hi)
    m = m.at[rows, hi].add(w_hi)  # lo == hi at clamped edges: weights sum to 1
    return m


def _nearest_matrix(out_size: int, in_size: int) -> jnp.ndarray:
    """Dense 0/1 [out, in] selection matrix for torch-default nearest resize.

    torch.nn.functional.interpolate(mode='nearest') picks src = floor(dst *
    in/out) (see upsampling_nearest's area_pixel_compute_source_index with
    align_corners=False legacy semantics). A selection matmul keeps the resize
    on the MXU and fusable, like _interp_matrix; 0/1 weights make the matmul
    bit-exact for float inputs.
    """
    src = jnp.floor(
        jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size)
    ).astype(jnp.int32)
    src = jnp.minimum(src, in_size - 1)
    m = jnp.zeros((out_size, in_size), jnp.float32)
    m = m.at[jnp.arange(out_size), src].set(1.0)
    return m


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest resize of NHWC to an arbitrary size, matching torch's
    F.interpolate(x, size) DEFAULT mode ('nearest').

    Parity: the reference resizes CLIPLoss / CLIPScore inputs with the default
    mode (ssr/losses/basic_loss.py:39-40, ssr/metrics/clipscore.py:31-32) —
    nearest, NOT bilinear. Do not "upgrade" this (same trap as rand_crop,
    data/s2naip.py).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if oh != h:
        xf = jnp.einsum("oh,nhwc->nowc", _nearest_matrix(oh, h), xf,
                        precision=jax.lax.Precision.HIGHEST)
    if ow != w:
        xf = jnp.einsum("pw,nhwc->nhpc", _nearest_matrix(ow, w), xf,
                        precision=jax.lax.Precision.HIGHEST)
    return xf.astype(dtype)


def upsample_bilinear(x: jax.Array, scale: int) -> jax.Array:
    """Bilinear upsample (align_corners=False), matching torch's F.interpolate."""
    n, h, w, c = x.shape
    return resize_bilinear(x, (h * scale, w * scale))


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int], antialias: bool = False) -> jax.Array:
    """Bilinear resize of NHWC with half-pixel centres (align_corners=False).

    With antialias=True and a downscale this matches torch/kornia antialiased
    resize via jax.image.resize (triangle kernel scaled to the footprint).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    if antialias and (oh < h or ow < w):
        return jax.image.resize(x, (n, oh, ow, c), method="linear", antialias=True)
    dtype = x.dtype

    def _pow2_upscale(o, i):
        return o % i == 0 and ((o // i) & (o // i - 1)) == 0

    if dtype == jnp.bfloat16 and _pow2_upscale(oh, h) and _pow2_upscale(ow, w):
        # bf16 compute path (e.g. the U-Net discriminator's three upsamples
        # inside the GAN train step): power-of-two-upscale half-pixel weights
        # (0.25/0.75 for x2; eighths for x4...) are EXACT in bf16, and the
        # MXU accumulates bf16 matmuls in f32 — so a default-precision bf16
        # einsum matches the 6-pass f32 path to bf16 rounding while skipping
        # the f32 converts the profile showed around every D resize.
        # Non-dyadic ratios (flow resizes, SRCNN heads) keep the exact-f32
        # path below regardless of dtype; parity tests run f32.
        y = x
        if oh != h:
            y = jnp.einsum("oh,nhwc->nowc", _interp_matrix(oh, h).astype(dtype), y,
                           preferred_element_type=jnp.float32)
        if ow != w:
            y = jnp.einsum("pw,nhwc->nhpc", _interp_matrix(ow, w).astype(dtype), y,
                           preferred_element_type=jnp.float32)
        return y.astype(dtype)
    xf = x.astype(jnp.float32)
    # Separable interpolation as two small exact matmuls (no spatial gathers).
    if oh != h:
        mh = _interp_matrix(oh, h)
        xf = jnp.einsum("oh,nhwc->nowc", mh, xf,
                        precision=jax.lax.Precision.HIGHEST)
    if ow != w:
        mw = _interp_matrix(ow, w)
        xf = jnp.einsum("pw,nhwc->nhpc", mw, xf,
                        precision=jax.lax.Precision.HIGHEST)
    return xf.astype(dtype)
