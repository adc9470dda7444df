"""test.py CLI end-to-end: eval with GT + metric suite on synthetic data."""

import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from satlas_sr_tpu.archs import RRDBNet
from satlas_sr_tpu.utils import torch_io
from satlas_sr_tpu.utils.imgio import write_png


def _make_tree(root, rng, chips=3, frames=3):
    for c in range(chips):
        chip = f"{300 + c}_{400 + c}"
        naip = (rng.rand(128, 128, 3) * 254 + 1).astype(np.uint8)
        write_png(str(root / "naip" / chip / f"{chip}.png"), naip)
        img = (rng.rand(frames * 32, 32, 3) * 254 + 1).astype(np.uint8)
        write_png(str(root / "sentinel2" / chip / "tci.png"), img)
    return str(root / "sentinel2"), str(root / "naip")


def test_test_pipeline_esrgan(tmp_path, rng):
    from satlas_sr_tpu.test import test_pipeline

    s2, naip = _make_tree(tmp_path, rng)

    # Export tiny generator weights in the reference .pth format (params_ema).
    model = RRDBNet(num_in_ch=6, num_out_ch=3, num_feat=8, num_block=1, num_grow_ch=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 6)))
    weights_path = str(tmp_path / "net_g.pth")
    torch_io.save_torch_state_dict(
        weights_path, torch_io.rrdbnet_to_torch(variables), param_key="params_ema"
    )

    opt = {
        "name": "test_cli_esrgan",
        "model_type": "SSRESRGANModel",
        "scale": 4,
        "num_gpu": 1,
        "manual_seed": 0,
        "datasets": {},
        "test_datasets": {
            "test": {
                "name": "test", "type": "S2NAIPDataset", "phase": "test", "scale": 4,
                "sentinel2_path": s2, "naip_path": naip, "n_s2_images": 2,
                "use_shuffle": False,
            }
        },
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 6, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
        "path": {"pretrain_network_g": weights_path, "param_key_g": "params_ema",
                 "strict_load_g": True, "resume_state": None},
        "test": {
            "save_img": True,
            "metrics": {
                "psnr": {"type": "calculate_psnr", "crop_border": 4, "test_y_channel": False},
                "ssim": {"type": "calculate_ssim", "crop_border": 4, "test_y_channel": False},
                "cpsnr": {"type": "calculate_cpsnr", "crop_border": 4, "test_y_channel": False},
            },
        },
        "logger": {"print_freq": 1, "save_checkpoint_freq": 1000},
    }
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)

    results = test_pipeline(str(tmp_path), argv=["-opt", str(opt_path)])
    assert "test" in results
    metrics = results["test"]

    # machine-readable summary written alongside the visualizations
    import json

    summary = json.load(
        open(tmp_path / "results" / "test_cli_esrgan" / "results.json"))
    assert summary["name"] == "test_cli_esrgan"
    assert summary["results"]["test"] == pytest.approx(
        {k: float(v) for k, v in metrics.items()})
    for key in ("psnr", "ssim", "cpsnr"):
        assert key in metrics and np.isfinite(metrics[key]), metrics
    # random weights vs random GT -> low but positive PSNR
    assert 0 < metrics["psnr"] < 30
    assert 0 <= metrics["ssim"] <= 1
    vis = tmp_path / "results" / "test_cli_esrgan" / "visualization" / "test"
    pngs = list(vis.glob("*.png"))
    assert len(pngs) >= 6  # 3 sr + 3 gt images


def test_esrgan_eval_uses_imported_ema(tmp_path, rng):
    """Imported params_ema drive the eval forward (reference test() parity)."""
    from satlas_sr_tpu.models import build_model

    s2, naip = _make_tree(tmp_path, rng)
    model = RRDBNet(num_in_ch=6, num_out_ch=3, num_feat=8, num_block=1, num_grow_ch=4)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 6)))
    weights_path = str(tmp_path / "net_g.pth")
    sd = torch_io.rrdbnet_to_torch(variables)
    torch_io.save_torch_state_dict(weights_path, sd, param_key="params_ema")

    opt = {
        "name": "eval_ema", "model_type": "SSRESRGANModel", "scale": 4,
        "manual_seed": 0, "is_train": False, "datasets": {},
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 6, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
        "path": {"pretrain_network_g": weights_path, "param_key_g": "params_ema"},
    }
    m = build_model(opt)
    x = (rng.rand(1, 32, 32, 6) * 255).astype(np.uint8)
    out = m.eval_outputs({"lr": x})
    assert out.shape == (1, 128, 128, 3)
    # must equal direct forward with the imported params
    ref = model.apply(
        torch_io.rrdbnet_from_torch(sd, num_block=1),
        jnp.asarray(x, jnp.float32) / 255.0,
    )
    ref_u8 = np.asarray((jnp.clip(ref, 0, 1) * 255).astype(jnp.uint8))
    # jit vs eager float reassociation can flip the uint8 rounding by 1
    assert np.abs(out.astype(np.int32) - ref_u8.astype(np.int32)).max() <= 1


def _synthetic_lpips_pth(path, rng):
    """lpips-package-format checkpoint: torchvision VGG16 convs + lin heads."""
    import torch

    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
            512, 512, 512]
    state = {}
    idx, in_ch, taps = 0, 3, []
    for item in plan:
        if item == "M":
            idx += 1
            continue
        w = rng.randn(item, in_ch, 3, 3).astype(np.float32) * 0.05
        b = np.zeros((item,), np.float32)
        state[f"features.{idx}.weight"] = torch.from_numpy(w)
        state[f"features.{idx}.bias"] = torch.from_numpy(b)
        in_ch = item
        idx += 2  # conv + relu
    for i, c in enumerate([64, 128, 256, 512, 512]):
        state[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.randn(1, c, 1, 1)).astype(np.float32)
        )
    torch.save(state, path)


def test_untrained_tower_metrics_are_tagged(tmp_path, rng):
    """Random-tower LPIPS must be marked `(untrained-tower)` in results; the
    marker disappears once real-format weights are supplied (VERDICT r1 #5)."""
    from satlas_sr_tpu.test import test_pipeline

    s2, naip = _make_tree(tmp_path, rng, chips=1)
    model = RRDBNet(num_in_ch=6, num_out_ch=3, num_feat=8, num_block=1, num_grow_ch=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 6)))
    weights_path = str(tmp_path / "net_g.pth")
    torch_io.save_torch_state_dict(
        weights_path, torch_io.rrdbnet_to_torch(variables), param_key="params_ema"
    )
    lpips_pth = str(tmp_path / "lpips_vgg.pth")
    _synthetic_lpips_pth(lpips_pth, rng)

    def run(name, lpips_opt):
        opt = {
            "name": name, "model_type": "SSRESRGANModel", "scale": 4,
            "num_gpu": 1, "manual_seed": 0, "datasets": {},
            "test_datasets": {
                "test": {"name": "test", "type": "S2NAIPDataset", "phase": "test",
                         "scale": 4, "sentinel2_path": s2, "naip_path": naip,
                         "n_s2_images": 2, "use_shuffle": False}
            },
            "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 6, "num_out_ch": 3,
                          "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
            "path": {"pretrain_network_g": weights_path, "param_key_g": "params_ema",
                     "strict_load_g": True, "resume_state": None},
            "test": {"save_img": False,
                     "metrics": {"lpips": lpips_opt,
                                 "psnr": {"type": "calculate_psnr", "crop_border": 4,
                                          "test_y_channel": False}}},
            "logger": {"print_freq": 1, "save_checkpoint_freq": 1000},
        }
        opt_path = tmp_path / f"{name}.yml"
        with open(opt_path, "w") as f:
            yaml.safe_dump(opt, f)
        return test_pipeline(str(tmp_path), argv=["-opt", str(opt_path)])["test"]

    untrained = run("tag_untrained", {"type": "calculate_lpips", "better": "lower"})
    assert "lpips(untrained-tower)" in untrained, untrained
    assert "psnr" in untrained  # weight-free metric untouched

    trained = run("tag_trained", {"type": "calculate_lpips", "better": "lower",
                                  "lpips_weights_path": lpips_pth})
    assert "lpips" in trained and "lpips(untrained-tower)" not in trained, trained
