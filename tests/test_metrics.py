"""Metric correctness tests (PSNR/SSIM/cPSNR) against naive oracles."""

import numpy as np
import pytest

from satlas_sr_tpu.metrics import calculate_cpsnr, calculate_metric, calculate_psnr, calculate_ssim


def test_psnr_known_value(rng):
    a = np.full((32, 32, 3), 100, np.uint8)
    b = np.full((32, 32, 3), 110, np.uint8)  # mse = 100
    psnr = calculate_psnr(a, b, crop_border=0)
    assert abs(psnr - 10 * np.log10(255.0**2 / 100.0)) < 1e-9


def test_psnr_crop_border(rng):
    a = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    b = a.copy()
    b[:4, :, :] = 0  # corrupt only the border
    assert calculate_psnr(a, b, crop_border=4) == float("inf")
    assert calculate_psnr(a, b, crop_border=0) < 40


def test_ssim_identical_is_one(rng):
    a = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    assert abs(calculate_ssim(a, a, crop_border=4) - 1.0) < 1e-12


def test_ssim_degrades_with_noise(rng):
    a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    noise = rng.randn(64, 64, 3) * 20
    b = np.clip(a.astype(np.float64) + noise, 0, 255).astype(np.uint8)
    s = calculate_ssim(a, b, crop_border=0)
    assert 0.0 < s < 0.999


def _cpsnr_naive(img1, img2, crop_border, max_offset=8):
    """Direct PROBA-V spec implementation as an oracle (loops over offsets)."""
    img1 = img1[crop_border:-crop_border, crop_border:-crop_border].astype(np.float64)
    img2 = img2[crop_border:-crop_border, crop_border:-crop_border].astype(np.float64)
    h, w = img1.shape[:2]
    ch, cw = h - max_offset, w - max_offset
    best = None
    for ro in range(max_offset + 1):
        for co in range(max_offset + 1):
            a = img1[ro:, co:][:ch, :cw].copy()
            b = img2[max_offset - ro :, max_offset - co :][:ch, :cw].copy()
            for c in range(img1.shape[2]):
                b[:, :, c] += np.mean(a[:, :, c] - b[:, :, c])
            mse = np.mean((a - b) ** 2)
            best = mse if best is None or mse < best else best
    return float("inf") if best == 0 else 10.0 * np.log10(255.0**2 / best)


def test_cpsnr_matches_naive_oracle(rng):
    a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    b = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    ours = calculate_cpsnr(a, b, crop_border=4)
    oracle = _cpsnr_naive(a, b, crop_border=4)
    assert abs(ours - oracle) < 1e-9


def test_cpsnr_translation_invariance(rng):
    base = (rng.rand(80, 80, 3) * 255).astype(np.uint8)
    a = base[8:72, 8:72]
    # Note: the PROBA-V offset scheme moves both crops in opposite directions,
    # so only EVEN relative displacements are recoverable exactly.
    shifted = base[10:74, 12:76]  # 2px down, 4px right
    psnr = calculate_psnr(a, shifted, crop_border=4)
    cpsnr = calculate_cpsnr(a, shifted, crop_border=4)
    assert cpsnr > psnr + 10  # offset search recovers alignment


def test_cpsnr_bias_invariance(rng):
    a = (rng.rand(64, 64, 3) * 200).astype(np.uint8)
    b = np.clip(a.astype(np.int32) + 30, 0, 255).astype(np.uint8)  # brightness bias
    assert calculate_cpsnr(a, b, crop_border=4) > 50


def test_calculate_metric_dispatch(rng):
    a = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    data = {"img": a, "img2": a}
    val = calculate_metric(data, {"type": "calculate_psnr", "crop_border": 4})
    assert val == float("inf")
    with pytest.raises(KeyError):
        calculate_metric(data, {"type": "nope"})


def test_lpips_and_clipscore_tiny_towers(rng):
    """Offline towers: self-similarity extremes behave correctly."""
    from satlas_sr_tpu.metrics.clipscore import calculate_clipscore
    from satlas_sr_tpu.metrics.lpips import calculate_lpips

    a = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    b = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    assert calculate_lpips(a, a, lpips_model="vgg") < 1e-6
    assert calculate_lpips(a, b, lpips_model="vgg") > 0
    s_same = calculate_clipscore(a, a, clip_model="test-tiny")
    s_diff = calculate_clipscore(a, b, clip_model="test-tiny")
    assert abs(s_same - 1.0) < 1e-5
    assert s_diff <= 1.0
