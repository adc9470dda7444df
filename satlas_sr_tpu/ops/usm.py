"""Unsharp-mask GT sharpening (Real-ESRGAN style), on device inside the jitted step.

Replicates the behaviour of the USM sharpener the reference applies to ground
truth in feed_data (ssr/models/ssr_esrgan_model.py:31,109): a 51x51 Gaussian
blur (OpenCV kernel with sigma derived from the kernel size), residual
thresholding into a soft mask, and a weighted sharpen blended by the blurred
mask. Runs as two separable 1-D convolutions per blur — VPU-friendly and fused
by XLA into the surrounding step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_kernel_1d(ksize: int) -> np.ndarray:
    """OpenCV getGaussianKernel(ksize, sigma=0): sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) * 0.5
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    k = k / k.sum()
    return k.astype(np.float32)


def _blur_separable(img: jax.Array, kernel_1d: jax.Array) -> jax.Array:
    """Depthwise separable Gaussian blur of NHWC with reflect padding."""
    k = kernel_1d.shape[0]
    pad = (k - 1) // 2
    dtype = img.dtype
    x = img.astype(jnp.float32)
    n, h, w, c = x.shape
    # Rows: pad H, contract a sliding window via conv on a merged NC batch.
    xr = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    xr = jnp.moveaxis(xr, 3, 1).reshape(n * c, h + 2 * pad, w, 1)
    kr = kernel_1d.reshape(k, 1, 1, 1)
    xr = jax.lax.conv_general_dilated(
        xr, kr, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # Cols.
    xr = jnp.pad(xr, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    kc = kernel_1d.reshape(1, k, 1, 1)
    xr = jax.lax.conv_general_dilated(
        xr, kc, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = jnp.moveaxis(xr.reshape(n, c, h, w), 1, 3)
    return out.astype(dtype)


def usm_sharp(
    img: jax.Array,
    weight: float = 0.5,
    radius: int = 50,
    threshold: float = 10.0,
) -> jax.Array:
    """Unsharp-mask sharpen an NHWC float image in [0, 1].

    radius is rounded up to odd (OpenCV convention). The residual mask is
    thresholded on the 0-255 scale and then blurred into a soft mask.
    """
    ksize = radius + 1 if radius % 2 == 0 else radius
    kernel = jnp.asarray(_gaussian_kernel_1d(ksize))
    blur = _blur_separable(img, kernel)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = _blur_separable(mask, kernel)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img
