"""Config-system tests: parse_options semantics + shipped config validity."""

import glob
import os

import pytest
import yaml

from satlas_sr_tpu.utils.options import (
    apply_force_yml,
    parse_options,
    yaml_load,
)

OPTIONS_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "options")


def test_all_shipped_configs_parse():
    paths = sorted(glob.glob(os.path.join(OPTIONS_DIR, "*.yml")))
    assert len(paths) >= 11
    for p in paths:
        opt = yaml_load(p)
        assert "network_g" in opt, p
        if "model_type" in opt:  # training configs
            assert opt["model_type"] in (
                "SSRESRGANModel", "L2Model", "OSMObjESRGANModel",
            ), p
            assert "train" in opt and "optim_g" in opt["train"], p
        else:  # infer configs
            assert "data_dir" in opt and "n_lr_images" in opt, p


def test_parse_options_train_layout(tmp_path):
    opt_path = os.path.join(OPTIONS_DIR, "esrgan_s2naip_urban.yml")
    opt, args = parse_options(str(tmp_path), is_train=True, argv=["-opt", opt_path])
    assert opt["is_train"] is True
    assert opt["rank"] == 0 and opt["world_size"] == 1
    assert opt["path"]["models"].endswith("experiments/esrgan_s2naip_urban/models")
    assert opt["path"]["training_states"].endswith("training_states")
    assert opt["datasets"]["train"]["phase"] == "train"
    assert opt["datasets"]["train"]["scale"] == 4
    assert opt["datasets"]["val"]["phase"] == "val"
    assert opt["seed_with_rank"] == opt["manual_seed"]


def test_parse_options_debug_mode(tmp_path):
    opt_path = os.path.join(OPTIONS_DIR, "esrgan_s2naip_urban.yml")
    opt, _ = parse_options(str(tmp_path), is_train=True, argv=["-opt", opt_path, "--debug"])
    assert opt["name"].startswith("debug_")
    assert opt["val"]["val_freq"] == 8
    assert opt["logger"]["print_freq"] == 1


def test_parse_options_test_layout(tmp_path):
    opt_path = os.path.join(OPTIONS_DIR, "esrgan_s2naip_urban.yml")
    opt, _ = parse_options(str(tmp_path), is_train=False, argv=["-opt", opt_path])
    assert opt["path"]["results_root"].endswith("results/esrgan_s2naip_urban")
    assert opt["path"]["visualization"].endswith("visualization")


def test_force_yml_overrides():
    opt = {"train": {"ema_decay": 0.5, "optim_g": {"lr": 1e-4}}, "scale": 4}
    apply_force_yml(opt, ["train:ema_decay=0.999", "scale=2",
                          "train:optim_g:lr=2e-4"])
    assert opt["train"]["ema_decay"] == 0.999
    assert opt["scale"] == 2
    assert opt["train"]["optim_g"]["lr"] == 2e-4
    with pytest.raises(KeyError):
        apply_force_yml(opt, ["train:new_key=1"])


def test_force_yml_cli_integration(tmp_path):
    opt_path = os.path.join(OPTIONS_DIR, "esrgan_s2naip_urban.yml")
    opt, _ = parse_options(
        str(tmp_path), is_train=True,
        argv=["-opt", opt_path, "--force_yml", "train:ema_decay=0.9"],
    )
    assert opt["train"]["ema_decay"] == 0.9


def test_force_yml_manual_seed_feeds_seed_with_rank(tmp_path):
    # Overrides must land BEFORE seed derivation: a forced manual_seed that
    # missed seed_with_rank would seed the model and the data order from
    # different values and make the "reproducible" run irreproducible.
    opt_path = os.path.join(OPTIONS_DIR, "esrgan_s2naip_urban.yml")
    opt, _ = parse_options(
        str(tmp_path), is_train=True,
        argv=["-opt", opt_path, "--force_yml", "manual_seed=123"],
    )
    assert opt["manual_seed"] == 123
    assert opt["seed_with_rank"] == 123 + opt["rank"]


def test_make_exp_dirs_archives_existing(tmp_path):
    """A fresh (non-resume) run must not overwrite an existing experiment dir:
    it is renamed to <name>_archived_<stamp> first (basicsr mkdir_and_rename
    parity, ssr/train.py:41-45). Debug runs reuse the dir."""
    import os

    from satlas_sr_tpu.utils.options import make_exp_dirs

    root = tmp_path / "exp" / "run1"
    opt = {
        "name": "run1", "is_train": True,
        "path": {"experiments_root": str(root),
                 "models": str(root / "models"),
                 "training_states": str(root / "training_states"),
                 "visualization": str(root / "visualization")},
    }
    make_exp_dirs(opt)
    (root / "old_result.txt").write_text("precious")

    make_exp_dirs(opt, archive_existing=True)
    assert root.is_dir() and not (root / "old_result.txt").exists()
    archived = [d for d in (tmp_path / "exp").iterdir()
                if d.name.startswith("run1_archived_")]
    assert len(archived) == 1
    assert (archived[0] / "old_result.txt").read_text() == "precious"

    # debug runs reuse the dir without archiving
    opt["name"] = "debug_run1"
    (root / "dbg.txt").write_text("x")
    make_exp_dirs(opt, archive_existing=True)
    assert (root / "dbg.txt").exists()


def test_package_main_lists_real_clis(capsys):
    """`python -m satlas_sr_tpu` help stays in sync with the actual modules."""
    import importlib

    from satlas_sr_tpu.__main__ import CLIS, main

    assert main() == 0
    out = capsys.readouterr().out
    for name, _ in CLIS:
        assert f"satlas_sr_tpu.{name}" in out
        mod = importlib.import_module(f"satlas_sr_tpu.{name}")
        assert callable(getattr(mod, "main")), name
