"""USM sharpener parity vs an independent numpy implementation of the
Real-ESRGAN USMSharp operator (51-tap OpenCV Gaussian, reflect padding,
threshold mask, soft-mask blend) — the GT transform of the GAN step
(ssr_esrgan_model.py:109)."""

import numpy as np

import jax.numpy as jnp

from satlas_sr_tpu.ops.usm import usm_sharp


def _cv2_gaussian_kernel(ksize: int) -> np.ndarray:
    """cv2.getGaussianKernel(ksize, 0): sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return k / k.sum()


def _blur_np(img: np.ndarray, k1d: np.ndarray) -> np.ndarray:
    """Separable reflect-pad blur, HWC float."""
    pad = len(k1d) // 2
    out = np.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="reflect")
    out = np.apply_along_axis(lambda r: np.convolve(r, k1d, mode="valid"), 0, out)
    out = np.pad(out, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    out = np.apply_along_axis(lambda r: np.convolve(r, k1d, mode="valid"), 1, out)
    return out


def _usm_np(img: np.ndarray, weight=0.5, radius=50, threshold=10) -> np.ndarray:
    ksize = radius + 1 if radius % 2 == 0 else radius
    k = _cv2_gaussian_kernel(ksize)
    blur = _blur_np(img, k)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype(np.float64)
    soft_mask = _blur_np(mask, k)
    sharp = np.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


def test_usm_matches_numpy_oracle(rng):
    img = rng.rand(72, 72, 3).astype(np.float32)
    # add structure so the threshold mask is non-trivial
    img[20:40, 20:40] = 0.9
    img[50:60, 10:30] = 0.1
    ours = np.asarray(usm_sharp(jnp.asarray(img[None])))[0]
    ref = _usm_np(img.astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_usm_small_radius(rng):
    img = rng.rand(40, 40, 3).astype(np.float32)
    ours = np.asarray(usm_sharp(jnp.asarray(img[None]), radius=7))[0]
    ref = _usm_np(img.astype(np.float64), radius=7)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_usm_input_smaller_than_blur_window(rng):
    """The 51-tap blur on inputs narrower than its 25-px pad must match the
    oracle's repeated np.pad reflection (regression: the banded blur matrix
    must fold with period 2(n-1), not assume one fold)."""
    img = rng.rand(8, 8, 3).astype(np.float32)
    ours = np.asarray(usm_sharp(jnp.asarray(img[None])))[0]
    ref = _usm_np(img.astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_usm_single_row_input(rng):
    """n == 1 along an axis: the blur is the identity there (constant signal)."""
    img = rng.rand(1, 40, 3).astype(np.float32)
    out = np.asarray(usm_sharp(jnp.asarray(img[None])))[0]
    assert out.shape == (1, 40, 3)
    assert np.isfinite(out).all()
