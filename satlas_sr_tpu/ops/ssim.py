"""Differentiable SSIM (training loss flavour) on NHWC arrays.

Replicates the kornia ssim_loss used by the L2 model's WorldStrat loss
(ssr/models/ssr_l2_model.py:39: window_size=5, reduction='none') and the
optional SSIMLoss (ssr/losses/basic_loss.py:50-60): Gaussian window with
sigma=1.5, reflect padding, C1=(0.01*max_val)^2, C2=(0.03*max_val)^2, and a
loss map of (1 - ssim)/2.

The metric-flavour SSIM (basicsr calculate_ssim parity, 11x11 window on uint8
numpy images with valid cropping) lives in satlas_sr_tpu/metrics/psnr_ssim.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    half = window_size // 2
    x = np.arange(window_size, dtype=np.float64) - half
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _filter_separable_reflect(x: jax.Array, k1d: jax.Array) -> jax.Array:
    """Same-size separable filtering with reflect padding, depthwise, NHWC."""
    k = k1d.shape[0]
    pad = k // 2
    n, h, w, c = x.shape
    xr = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    xr = jnp.moveaxis(xr, 3, 1).reshape(n * c, h + 2 * pad, w + 2 * pad, 1)
    # Force true-f32 accumulation whatever the surrounding step's
    # matmul_precision is. Under the TPU default (bf16 passes) the filtered
    # E[x^2] carries absolute error ~1e-3 at image magnitudes — LARGER than
    # SSIM's C2 = 9e-4 — so sigma_x + sigma_y + C2 can cross zero and the
    # ssim map overflows to inf (observed: L2 trainer forward inf at ~iter
    # 127, then NaN params). The window is 5-tap separable; HIGHEST costs
    # nothing measurable here.
    kr = k1d.reshape(k, 1, 1, 1)
    xr = jax.lax.conv_general_dilated(
        xr, kr, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    kc = k1d.reshape(1, k, 1, 1)
    xr = jax.lax.conv_general_dilated(
        xr, kc, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.moveaxis(xr.reshape(n, c, h, w), 1, 3)


def ssim_map(
    x: jax.Array,
    y: jax.Array,
    window_size: int = 5,
    max_val: float = 1.0,
    sigma: float = 1.5,
) -> jax.Array:
    """Per-pixel SSIM map of two NHWC images (same shape as inputs)."""
    k1d = jnp.asarray(_gaussian_1d(window_size, sigma))
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    mu_x = _filter_separable_reflect(xf, k1d)
    mu_y = _filter_separable_reflect(yf, k1d)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    # Variances are mathematically >= 0; the E[x^2] - mu^2 form can only go
    # negative by floating-point cancellation. Clamping guarantees
    # den >= C1*C2 > 0 for ANY input and ANY conv precision (defense in
    # depth behind the HIGHEST-precision filter above) — without it a
    # negative sigma sum can cancel C2 exactly and the map divides by zero.
    # sigma_xy is a covariance and may be legitimately negative: not clamped.
    sigma_x = jnp.maximum(_filter_separable_reflect(xf * xf, k1d) - mu_xx, 0.0)
    sigma_y = jnp.maximum(_filter_separable_reflect(yf * yf, k1d) - mu_yy, 0.0)
    sigma_xy = _filter_separable_reflect(xf * yf, k1d) - mu_xy
    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return num / den


def ssim_loss(
    x: jax.Array,
    y: jax.Array,
    window_size: int = 5,
    max_val: float = 1.0,
) -> jax.Array:
    """kornia-compatible SSIM loss map: (1 - ssim)/2, same shape as inputs."""
    return (1.0 - ssim_map(x, y, window_size=window_size, max_val=max_val)) / 2.0
