"""Compile-warmup CLI: populates the jit caches for a config's programs from
synthetic data — no dataset, no weights, no experiment dirs created."""

import numpy as np
import yaml


def _train_opt(tmp_path):
    return {
        "name": "warmup_l2",
        "model_type": "L2Model",
        "scale": 4,
        "num_gpu": 1,
        "manual_seed": 0,
        "datasets": {
            "train": {
                "name": "train", "type": "S2NAIPDataset",
                "sentinel2_path": str(tmp_path / "s2"),
                "naip_path": str(tmp_path / "naip"),
                "n_s2_images": 2, "use_3d": True,
                "batch_size_per_gpu": 2, "num_worker_per_gpu": 1,
            },
            "val": {
                "name": "validation", "type": "S2NAIPDataset",
                "sentinel2_path": str(tmp_path / "s2"),
                "naip_path": str(tmp_path / "naip"),
                "n_s2_images": 2, "use_3d": True, "batch_size": 2,
            },
        },
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1, "output_size": 128,
                      "zoom_factor": 4, "sr_kernel_size": 1},
        "path": {"resume_state": None},
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-4, "weight_decay": 0,
                        "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [10], "gamma": 0.5},
            "total_iter": 2, "warmup_iter": -1,
        },
        "logger": {"print_freq": 1, "save_checkpoint_freq": 1000},
    }


def test_warmup_train_config(tmp_path, capsys):
    """Train-config warmup compiles the train step and each eval program
    without touching the data paths (they don't exist) or creating exp dirs."""
    from satlas_sr_tpu.warmup import main

    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(_train_opt(tmp_path), f)

    main(["-opt", str(opt_path)])
    out = capsys.readouterr().out
    assert "train step" in out
    assert "eval step 'val'" in out
    assert "cache populated" in out
    # warmup must not create experiment dirs (that's the train CLI's job)
    assert not (tmp_path / "experiments").exists()


def test_warmup_infer_config(tmp_path, capsys):
    """Infer-config warmup compiles the chunked InferenceEngine program."""
    from satlas_sr_tpu.warmup import main

    opt = {
        "data_dir": str(tmp_path / "none"),
        "save_path": str(tmp_path / "out"),
        "n_lr_images": 2,
        "batch_size": 2,
        "scale": 4,
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 6, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
        "path": {},
    }
    opt_path = tmp_path / "infer.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)

    main(["-opt", str(opt_path)])
    out = capsys.readouterr().out
    # the ENGINE batch (config 2 rounded up to the 8-device mesh) is warmed —
    # that is the program shape the real CLI runs
    assert "chunked inference" in out and "batch 8" in out


def test_warmup_whole_tile_config(tmp_path, capsys):
    """whole_tile infer warmup mirrors infer_grid's engine construction
    (grid-sized input, default spatial_shards)."""
    from satlas_sr_tpu.warmup import main

    opt = {
        "data_dir": str(tmp_path / "none"),
        "save_path": str(tmp_path / "out"),
        "n_lr_images": 2,
        "whole_tile": True,
        "grid_size": 2,
        "batch_size": 1,
        "scale": 4,
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 6, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
        "path": {},
    }
    opt_path = tmp_path / "grid.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)

    main(["-opt", str(opt_path)])
    out = capsys.readouterr().out
    assert "whole-tile inference" in out and "64x64" in out


def test_warmup_multiband_channels(tmp_path, capsys):
    """Multi-band configs: per-frame channels are 3 (tci) + 1 per extra band —
    the same derivation as the dataset loader and ESRGANModel's num_in_ch —
    not 3 per band (regression guard)."""
    from satlas_sr_tpu.warmup import main

    opt = _train_opt(tmp_path)
    opt["name"] = "warmup_allbands"
    # 3 bands -> 5 channels/frame; SRCNN in_channels must match
    for phase in ("train", "val"):
        opt["datasets"][phase]["s2_bands"] = ["tci", "b05", "b06"]
    opt["network_g"]["in_channels"] = 5

    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)

    main(["-opt", str(opt_path)])
    out = capsys.readouterr().out
    assert "train step" in out and "cache populated" in out


def test_warmup_forwards_force_yml(tmp_path, capsys):
    """--force_yml overrides reach the warmed program (a dropped override
    would silently warm the wrong shapes)."""
    from satlas_sr_tpu.warmup import main

    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(_train_opt(tmp_path), f)

    main(["-opt", str(opt_path),
          "--force_yml", "datasets:train:batch_size_per_gpu=3"])
    out = capsys.readouterr().out
    # 3 per device x 8 virtual devices = 24 rows
    assert "train step (24 rows)" in out


def test_warmup_halo_config(tmp_path, capsys):
    """halo infer warmup compiles the sliding-window program at the SAME
    shape run_halo_tiles will use (32x32 windows, min(256, windows/tile))."""
    from satlas_sr_tpu.warmup import main

    opt = {
        "data_dir": str(tmp_path / "none"),
        "save_path": str(tmp_path / "out"),
        "n_lr_images": 2,
        "halo": True,   # YAML shorthand for the default width (4)
        "grid_size": 4,  # 128px tile -> 5x5=25 windows
        "scale": 4,
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 6, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
        "path": {},
    }
    opt_path = tmp_path / "halo.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)

    main(["-opt", str(opt_path)])
    out = capsys.readouterr().out
    assert "halo inference" in out and "32x32" in out
