"""Proof the assembled trainer OPTIMIZES, not just runs (VERDICT r2 next #1).

Per-step math is oracle-tested elsewhere; these tests pin the emergent
property those oracles cannot see — a wrong update sign, scheduler
off-by-one, EMA/eval mixup or D collapse would all pass 1-2-step mechanical
checks but fail here:

- L2/SRCNN overfits a fixed 4-sample synthetic batch: PSNR must rise by a
  stated margin within ~120 steps.
- ESRGAN with the shipped gan weight (0.1) drives l_g_pix down ~monotonically
  on the same data while both discriminator losses stay bounded (no collapse).
- A ~150-iter train CLI run's metrics.jsonl shows a decreasing train loss and
  the validation PSNR rises across evals.

The reference's only quality control is human-watched validation during
training (ssr/train.py:129-133); these are automated trend assertions.
"""

import json
import os

import numpy as np
import yaml

from satlas_sr_tpu.utils.imgio import write_png


def _smooth_pairs(rng, n, hr_size=64, scale=4):
    """Learnable synthetic SR data: smooth per-sample sinusoids (HR) with the
    LR being the scale x scale block mean — a mapping a tiny net can fit fast,
    unlike iid noise."""
    yy, xx = np.mgrid[0:hr_size, 0:hr_size] / hr_size
    hrs = []
    for _ in range(n):
        f1, f2, ph = rng.uniform(1, 3), rng.uniform(1, 3), rng.uniform(0, 6)
        img = 0.5 + 0.45 * np.sin(2 * np.pi * (f1 * yy + f2 * xx) + ph)[..., None] \
            * np.array([1.0, 0.8, 0.6])
        hrs.append((img * 255).astype(np.uint8))
    hrs = np.stack(hrs)
    h = hr_size // scale
    lr = hrs.reshape(n, h, scale, h, scale, 3).mean((2, 4)).astype(np.uint8)
    return lr, hrs


def _psnr_from_mse(mse):
    return -10.0 * np.log10(max(mse, 1e-10))


def test_l2_overfit_raises_psnr(tmp_path, rng):
    """SRCNN under L2Model must gain >= 2.5 dB train PSNR in 120 steps on a
    fixed 4-sample batch (measured headroom ~4.8 dB)."""
    from satlas_sr_tpu.models import build_model

    lr, hr = _smooth_pairs(rng, 4)
    batch = {"lr": np.stack([lr, lr], 1), "hr": hr}  # [B, T=2, h, w, 3]

    opt = {
        "name": "overfit_l2", "model_type": "L2Model", "scale": 4,
        "manual_seed": 0, "is_train": True, "rank": 0, "world_size": 1,
        "seed_with_rank": 0, "datasets": {}, "path": {},
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1, "output_size": 64,
                      "zoom_factor": 4, "sr_kernel_size": 1},
        "train": {"ema_decay": 0,
                  "optim_g": {"type": "Adam", "lr": 2e-3, "betas": [0.9, 0.99]},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100000],
                                "gamma": 0.5},
                  "total_iter": 120, "warmup_iter": -1},
        "logger": {"print_freq": 1000, "save_checkpoint_freq": 100000},
        "val": None,
    }
    model = build_model(opt)
    mses = [float(model.train_iter(batch, it)["mse"]) for it in range(1, 121)]

    assert all(np.isfinite(mses)), "non-finite training loss"
    start = _psnr_from_mse(float(np.mean(mses[:10])))
    end = _psnr_from_mse(float(np.mean(mses[-10:])))
    assert end - start >= 2.5, (
        f"trainer is not optimizing: PSNR went {start:.2f} -> {end:.2f} dB "
        f"(+{end - start:.2f}), expected >= +2.5 dB in 120 steps")


def test_esrgan_overfit_pix_down_gan_stable(tmp_path, rng):
    """Full ESRGAN recipe (pixel + random-tower perceptual + vanilla GAN at
    the shipped 0.1 weight): l_g_pix must fall to <= 50% of its initial level
    within 60 steps (measured ~12%) and neither discriminator loss may leave
    a sane band (collapse = one side pinned near 0 or diverging)."""
    from satlas_sr_tpu.models import build_model

    lr, hr = _smooth_pairs(rng, 4)
    batch = {"lr": np.concatenate([lr, lr], -1), "hr": hr}  # [B, h, w, 6]

    opt = {
        "name": "overfit_gan", "model_type": "SSRESRGANModel", "scale": 4,
        "manual_seed": 0, "is_train": True, "rank": 0, "world_size": 1,
        "seed_with_rank": 0, "datasets": {}, "path": {},
        "l1_gt_usm": True, "percep_gt_usm": True, "gan_gt_usm": False,
        "feed_disc_lr": True,
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 6, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
        "network_d": {"type": "SSR_UNetDiscriminatorSN", "num_in_ch": 9,
                      "num_feat": 4},
        "train": {
            "ema_decay": 0.9,
            "optim_g": {"type": "Adam", "lr": 1e-3, "weight_decay": 0,
                        "betas": [0.9, 0.99]},
            "optim_d": {"type": "Adam", "lr": 1e-4, "weight_decay": 0,
                        "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [400000],
                          "gamma": 0.5},
            "total_iter": 60, "warmup_iter": -1,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                          "reduction": "mean"},
            "perceptual_opt": {"type": "PerceptualLoss",
                               "layer_weights": {"conv1_2": 0.1},
                               "vgg_type": "vgg19", "use_input_norm": True,
                               "perceptual_weight": 1.0, "style_weight": 0,
                               "range_norm": False, "criterion": "l1"},
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                        "real_label_val": 1.0, "fake_label_val": 0.0,
                        "loss_weight": 0.1},
            "net_d_iters": 1, "net_d_init_iters": 0,
        },
        "logger": {"print_freq": 1000, "save_checkpoint_freq": 100000},
        "val": None,
    }
    model = build_model(opt)
    pix, d_real, d_fake = [], [], []
    for it in range(1, 61):
        logs = model.train_iter(batch, it)
        pix.append(float(logs["l_g_pix"]))
        d_real.append(float(logs["l_d_real"]))
        d_fake.append(float(logs["l_d_fake"]))

    assert all(np.isfinite(pix + d_real + d_fake)), "non-finite GAN losses"
    first, last = float(np.mean(pix[:5])), float(np.mean(pix[-5:]))
    assert last <= 0.5 * first, (
        f"generator is not optimizing under the GAN recipe: l_g_pix "
        f"{first:.4f} -> {last:.4f} (expected <= 50% of initial)")
    # vanilla-GAN BCE near equilibrium sits around ln 2; collapse shows up as
    # one side pinned near 0 (D wins) or running away (D loses)
    for name, series in (("l_d_real", d_real), ("l_d_fake", d_fake)):
        assert 0.05 < min(series) and max(series) < 3.0, (
            f"discriminator unstable: {name} range "
            f"[{min(series):.4f}, {max(series):.4f}]")


def test_train_cli_smoke_metric_trend(tmp_path, rng):
    """~150-iter train CLI on learnable data: metrics.jsonl's train loss must
    trend down and the logged validation PSNR must rise across evals."""
    from satlas_sr_tpu.train import train_pipeline

    # S2 frames are 32x32 by format (parity: s2-naip_dataset.py reshape), so
    # scale 2 keeps the HR at a cheap 64x64 for this 1-core host
    lr, hr = _smooth_pairs(rng, 4, hr_size=64, scale=2)
    for c in range(4):
        chip = f"{700 + c}_{800 + c}"
        write_png(str(tmp_path / "naip" / chip / f"{chip}.png"), hr[c])
        write_png(str(tmp_path / "sentinel2" / chip / "tci.png"),
                  np.concatenate([lr[c], lr[c]], axis=0))  # 2 frames of 32x32

    opt = {
        "name": "cli_trend", "model_type": "L2Model", "scale": 2,
        "manual_seed": 0,
        "datasets": {
            "train": {"name": "train", "type": "S2NAIPDataset",
                      "sentinel2_path": str(tmp_path / "sentinel2"),
                      "naip_path": str(tmp_path / "naip"),
                      "n_s2_images": 2, "use_3d": True, "use_shuffle": True,
                      "batch_size_per_gpu": 4, "num_worker_per_gpu": 1},
            "val": {"name": "val", "type": "S2NAIPDataset", "phase": "val",
                    "sentinel2_path": str(tmp_path / "sentinel2"),
                    "naip_path": str(tmp_path / "naip"),
                    "n_s2_images": 2, "use_3d": True, "use_shuffle": False},
        },
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1, "output_size": 64,
                      "zoom_factor": 2, "sr_kernel_size": 1},
        "path": {"resume_state": None,
                 "experiments_root": str(tmp_path / "exp")},
        "train": {"ema_decay": 0.99,
                  "optim_g": {"type": "Adam", "lr": 2e-3, "betas": [0.9, 0.99]},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100000],
                                "gamma": 0.5},
                  "total_iter": 150, "warmup_iter": -1},
        "val": {"val_freq": 50, "save_img": False,
                "metrics": {"psnr": {"type": "calculate_psnr",
                                     "crop_border": 4,
                                     "test_y_channel": False}}},
        "logger": {"print_freq": 10, "save_checkpoint_freq": 100000},
    }
    with open(tmp_path / "opt.yml", "w") as f:
        yaml.safe_dump(opt, f)
    train_pipeline(str(tmp_path), argv=["-opt", str(tmp_path / "opt.yml")])

    exp = tmp_path / "exp" / "cli_trend"
    rows = [json.loads(l) for l in open(exp / "metrics.jsonl")]
    losses = [r["tot_loss"] for r in rows if "tot_loss" in r]
    assert len(losses) >= 10
    head, tail = np.mean(losses[:3]), np.mean(losses[-3:])
    assert tail < 0.7 * head, (
        f"train loss not trending down over the CLI run: {head:.4f} -> {tail:.4f}")

    # validation history rides metrics.jsonl too (rows with val_dataset)
    psnrs = [r["psnr"] for r in rows if r.get("val_dataset") == "val"]
    assert len(psnrs) >= 2, f"expected >=2 validation evals, got {psnrs}"
    assert psnrs[-1] > psnrs[0] + 1.0, (
        f"validation PSNR did not rise: {psnrs}")


def test_highresnet_overfit_raises_psnr(tmp_path, rng):
    """HighResNet (pairwise log2(T) fusion path + shared-FusionBlock quirk)
    under L2Model must also optimize: >= 2.5 dB in 120 steps on the same
    fixed 4-sample batch as the SRCNN test."""
    from satlas_sr_tpu.models import build_model

    lr, hr = _smooth_pairs(rng, 4)
    batch = {"lr": np.stack([lr, lr], 1), "hr": hr}  # [B, T=2, h, w, 3]

    opt = {
        "name": "overfit_hrn", "model_type": "L2Model", "scale": 4,
        "manual_seed": 0, "is_train": True, "rank": 0, "world_size": 1,
        "seed_with_rank": 0, "datasets": {}, "path": {},
        "network_g": {"type": "HighResNet", "in_channels": 3,
                      "mask_channels": 0, "revisits": 2,
                      "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1,
                      "output_size": 64, "zoom_factor": 4,
                      "sr_kernel_size": 1},
        "train": {"ema_decay": 0,
                  "optim_g": {"type": "Adam", "lr": 2e-3, "betas": [0.9, 0.99]},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100000],
                                "gamma": 0.5},
                  "total_iter": 120, "warmup_iter": -1},
        "logger": {"print_freq": 1000, "save_checkpoint_freq": 100000},
        "val": None,
    }
    model = build_model(opt)
    mses = [float(model.train_iter(batch, it)["mse"]) for it in range(1, 121)]

    assert all(np.isfinite(mses)), "non-finite training loss"
    start = _psnr_from_mse(float(np.mean(mses[:10])))
    end = _psnr_from_mse(float(np.mean(mses[-10:])))
    assert end - start >= 2.5, (
        f"HighResNet is not optimizing: PSNR went {start:.2f} -> {end:.2f} dB "
        f"(+{end - start:.2f}), expected >= +2.5 dB in 120 steps")
