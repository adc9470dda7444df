"""Device-batched PSNR/SSIM for validation loops.

The reference computes metrics per image on host numpy after pulling each
output off-device (nondist_validation, SURVEY.md §3.2) — at val_set scale
(8192 pairs) the host metric loop dominates. These jitted batch versions
reproduce basicsr's calculate_psnr / calculate_ssim semantics (crop_border,
11x11 Gaussian window sigma 1.5, valid-region SSIM windows, L=255) over whole
uint8 batches on device.

Numerics note: computed in float32 on device vs float64 on host; agreement is
~1e-3 dB PSNR / ~1e-6 SSIM (tested), well inside the ±0.05 dB parity budget.
Enable per-config with val.fast_metrics / test.fast_metrics; the numpy
implementations remain the reference oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .psnr_ssim import _gaussian_window


@functools.partial(jax.jit, static_argnames=("crop_border",))
def batch_psnr(img: jax.Array, img2: jax.Array, crop_border: int = 0) -> jax.Array:
    """uint8 NHWC batches -> [B] PSNR values (basicsr semantics)."""
    if crop_border:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border]
    a = img.astype(jnp.float32)
    b = img2.astype(jnp.float32)
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return jnp.where(mse == 0, jnp.inf, 10.0 * jnp.log10(255.0 * 255.0 / mse))


@functools.partial(jax.jit, static_argnames=("crop_border",))
def batch_ssim(img: jax.Array, img2: jax.Array, crop_border: int = 0) -> jax.Array:
    """uint8 NHWC batches -> [B] SSIM values (11x11 Gaussian, valid windows)."""
    if crop_border:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border]
    a = img.astype(jnp.float32)
    b = img2.astype(jnp.float32)
    window = jnp.asarray(_gaussian_window(11, 1.5), jnp.float32)
    c = a.shape[-1]
    # depthwise valid conv via feature_group_count
    kernel = jnp.broadcast_to(window[:, :, None, None], (11, 11, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    mu1 = filt(a)
    mu2 = filt(b)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = filt(a * a) - mu1_sq
    sigma2 = filt(b * b) - mu2_sq
    sigma12 = filt(a * b) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))


FAST_METRICS = {
    "calculate_psnr": batch_psnr,
    "calculate_ssim": batch_ssim,
}


def fast_metric_fn(metric_opt: dict):
    """Return a batched device fn for a metric config, or None if unsupported."""
    if metric_opt.get("test_y_channel"):
        return None
    fn = FAST_METRICS.get(metric_opt.get("type"))
    if fn is None:
        return None
    crop = int(metric_opt.get("crop_border", 0))
    return lambda sr, gt: fn(sr, gt, crop_border=crop)
