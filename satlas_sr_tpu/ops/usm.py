"""Unsharp-mask GT sharpening (Real-ESRGAN style), on device inside the jitted step.

Replicates the behaviour of the USM sharpener the reference applies to ground
truth in feed_data (ssr/models/ssr_esrgan_model.py:31,109): a 51x51 Gaussian
blur (OpenCV kernel with sigma derived from the kernel size), residual
thresholding into a soft mask, and a weighted sharpen blended by the blurred
mask.

Each separable 1-D blur is applied as a dense banded [n, n] matrix multiply
(reflect padding folded into the matrix) instead of a degenerate C=1
convolution — the same MXU trick as ops/resize.resize_bilinear. At the GT
shapes this runs on the systolic array at trivial cost, where the conv
formulation lowered to low-intensity single-channel convolutions.
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


@functools.lru_cache(maxsize=16)
def _blur_matrix(ksize: int, n: int) -> np.ndarray:
    """Dense [n, n] matrix applying the 1-D Gaussian with reflect padding.

    out[i] = sum_t k[t] * x[reflect(i + t - pad)] — the reflect fold (np.pad
    'reflect' / OpenCV BORDER_REFLECT_101 semantics, no edge repeat) is baked
    into the matrix so the blur is one exact matmul per axis. Pads wider than
    the input fold repeatedly (period 2(n-1)), matching np.pad.
    """
    k = _gaussian_kernel_1d(ksize).astype(np.float64)
    pad = (ksize - 1) // 2
    m = np.zeros((n, n), dtype=np.float64)
    period = 2 * (n - 1) if n > 1 else 1
    for i in range(n):
        for t in range(ksize):
            p = abs(i + t - pad) % period if n > 1 else 0
            if p >= n:
                p = period - p
            m[i, p] += k[t]
    return m.astype(np.float32)


def _blur_separable(img: jax.Array, ksize: int) -> jax.Array:
    """Separable Gaussian blur of NHWC with reflect padding, via two matmuls."""
    dtype = img.dtype
    x = img.astype(jnp.float32)
    _, h, w, _ = x.shape
    mh = jnp.asarray(_blur_matrix(ksize, h))
    x = jnp.einsum("ij,njwc->niwc", mh, x, precision=jax.lax.Precision.HIGHEST)
    mw = jnp.asarray(_blur_matrix(ksize, w))
    x = jnp.einsum("ij,nhjc->nhic", mw, x, precision=jax.lax.Precision.HIGHEST)
    return x.astype(dtype)


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
    blur = _blur_separable(img, ksize)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = _blur_separable(mask, ksize)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img
