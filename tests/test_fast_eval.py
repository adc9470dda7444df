"""Device-batched PSNR/SSIM equivalence with the numpy reference metrics."""

import numpy as np

import jax.numpy as jnp

from satlas_sr_tpu.metrics import calculate_psnr, calculate_ssim
from satlas_sr_tpu.metrics.fast_eval import batch_psnr, batch_ssim, fast_metric_fn


def test_batch_psnr_matches_numpy(rng):
    a = (rng.rand(4, 40, 40, 3) * 255).astype(np.uint8)
    b = (rng.rand(4, 40, 40, 3) * 255).astype(np.uint8)
    fast = np.asarray(batch_psnr(jnp.asarray(a), jnp.asarray(b), crop_border=4))
    for i in range(4):
        ref = calculate_psnr(a[i], b[i], crop_border=4)
        assert abs(fast[i] - ref) < 1e-3, (fast[i], ref)


def test_batch_psnr_identical_inf(rng):
    a = (rng.rand(2, 16, 16, 3) * 255).astype(np.uint8)
    fast = np.asarray(batch_psnr(jnp.asarray(a), jnp.asarray(a)))
    assert np.isinf(fast).all()


def test_batch_ssim_matches_numpy(rng):
    a = (rng.rand(3, 48, 48, 3) * 255).astype(np.uint8)
    noise = rng.randn(3, 48, 48, 3) * 15
    b = np.clip(a.astype(np.float64) + noise, 0, 255).astype(np.uint8)
    fast = np.asarray(batch_ssim(jnp.asarray(a), jnp.asarray(b), crop_border=4))
    for i in range(3):
        ref = calculate_ssim(a[i], b[i], crop_border=4)
        assert abs(fast[i] - ref) < 2e-5, (fast[i], ref)


def test_fast_metric_fn_dispatch():
    assert fast_metric_fn({"type": "calculate_psnr", "crop_border": 4}) is not None
    assert fast_metric_fn({"type": "calculate_ssim", "crop_border": 0}) is not None
    assert fast_metric_fn({"type": "calculate_cpsnr", "crop_border": 4}) is None
    assert fast_metric_fn({"type": "calculate_psnr", "test_y_channel": True}) is None


def test_validation_with_fast_metrics(tmp_path, rng):
    """End-to-end: fast and slow paths give the same validation averages."""
    from satlas_sr_tpu.utils.imgio import write_png
    from satlas_sr_tpu.models import build_model

    for c in range(3):
        chip = f"{40 + c}_{50 + c}"
        write_png(str(tmp_path / "naip" / chip / f"{chip}.png"),
                  (rng.rand(128, 128, 3) * 254 + 1).astype(np.uint8))
        write_png(str(tmp_path / "sentinel2" / chip / "tci.png"),
                  (rng.rand(3 * 32, 32, 3) * 254 + 1).astype(np.uint8))

    def make_opt(fast):
        return {
            "name": "fastval", "model_type": "SSRESRGANModel", "scale": 4,
            "manual_seed": 0, "is_train": False, "datasets": {},
            "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 6, "num_out_ch": 3,
                          "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
            "path": {},
            "val": {"fast_metrics": fast,
                    "metrics": {"psnr": {"type": "calculate_psnr", "crop_border": 4,
                                         "test_y_channel": False},
                                "ssim": {"type": "calculate_ssim", "crop_border": 4,
                                         "test_y_channel": False}}},
        }

    from satlas_sr_tpu.data import S2NAIPDataset, SequentialEvalLoader

    ds_opt = {"name": "validation", "phase": "val", "sentinel2_path": str(tmp_path / "sentinel2"),
              "naip_path": str(tmp_path / "naip"), "n_s2_images": 2, "scale": 4}

    results = {}
    for fast in (False, True):
        model = build_model(make_opt(fast))
        loader = SequentialEvalLoader(S2NAIPDataset(dict(ds_opt)), batch_size=3)
        results[fast] = model.validation(loader, 0, save_img=False,
                                         dataset_name="validation")
    assert abs(results[True]["psnr"] - results[False]["psnr"]) < 1e-3
    assert abs(results[True]["ssim"] - results[False]["ssim"]) < 1e-4
