"""Config linter + doctor CLI: typo detection over the YAML schema.

The reference reads every config key with dict.get — a misspelled
`ema_decay` silently trains a different model. These pin the lint
vocabulary (every shipped config must be clean, including the untouched
reference configs with their `dist_params`/`io_backend` blocks) and the
doctor's filesystem/consistency checks.
"""

import glob
import os

import pytest
import yaml

from satlas_sr_tpu.utils.lint import lint_options
from satlas_sr_tpu.doctor import run_doctor

OPTIONS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                        "options", "*.yml")))
REF_OPTIONS = sorted(glob.glob("/root/reference/ssr/options/*.yml"))


def _kind(opt):
    return "infer" if "data_dir" in opt else "train"


@pytest.mark.parametrize("path", OPTIONS, ids=[os.path.basename(p) for p in OPTIONS])
def test_shipped_configs_lint_clean(path):
    opt = yaml.safe_load(open(path))
    assert lint_options(opt, _kind(opt)) == []


@pytest.mark.parametrize(
    "path", REF_OPTIONS, ids=[os.path.basename(p) for p in REF_OPTIONS])
def test_reference_configs_lint_clean(path):
    """An untouched reference YAML (dist_params, io_backend, ...) must not
    produce noise — those keys are accepted-and-ignored by design."""
    opt = yaml.safe_load(open(path))
    assert lint_options(opt, _kind(opt)) == []


def test_typo_detection_with_suggestion():
    opt = {"name": "x", "train": {"ema_decy": 0.999}}
    (w,) = lint_options(opt, "train")
    assert "train:ema_decy" in w and "'ema_decay'" in w


def test_nested_dataset_typo():
    opt = {"datasets": {"train": {"n_s2_imgaes": 8}}}
    (w,) = lint_options(opt, "train")
    assert "datasets:train:n_s2_imgaes" in w and "'n_s2_images'" in w


def test_enum_value_checks():
    opt = {"train": {"gan_opt": {"gan_type": "vanila"},
                     "scheduler": {"type": "CosineAnnealing"}}}
    warnings = lint_options(opt, "train")
    joined = "\n".join(warnings)
    assert "'vanilla'" in joined  # did-you-mean for the value
    assert "CosineAnnealing" in joined
    assert len(warnings) == 2


def test_network_g_vocabulary_is_per_type():
    # num_block is an RRDBNet field; on SRCNN it's a typo.
    ok = lint_options({"network_g": {"type": "SSR_RRDBNet", "num_block": 23}},
                      "train")
    assert ok == []
    (w,) = lint_options({"network_g": {"type": "SRCNN", "num_block": 23}},
                        "train")
    assert "network_g:num_block" in w


def test_unknown_generator_type_warns_once():
    (w,) = lint_options({"network_g": {"type": "RRDBNetx", "anything": 1}},
                        "train")
    assert "RRDBNetx" in w and "SSR_RRDBNet" in w


def test_metric_blocks_accept_any_name():
    opt = {"val": {"metrics": {"my_psnr": {"type": "calculate_psnr",
                                           "crop_border": 4}}}}
    assert lint_options(opt, "train") == []
    opt["val"]["metrics"]["my_psnr"]["crop_boarder"] = 4
    (w,) = lint_options(opt, "train")
    assert "crop_boarder" in w and "'crop_border'" in w


def test_infer_schema():
    assert lint_options({"data_dir": "d", "halo": 4, "whole_tile": False},
                        "infer") == []
    (w,) = lint_options({"data_dir": "d", "halow": 4}, "infer")
    assert "'halo'" in w


# ------------------------------------------------------------------- doctor


def _mini_train_opt(tmp_path, with_data=True):
    s2 = tmp_path / "sentinel2"
    naip = tmp_path / "naip"
    if with_data:
        s2.mkdir(exist_ok=True)
        naip.mkdir(exist_ok=True)
    return {
        "name": "doc", "model_type": "L2Model", "scale": 4,
        "datasets": {"train": {"type": "S2NAIPDataset", "n_s2_images": 8,
                               "sentinel2_path": str(s2),
                               "naip_path": str(naip)}},
        "network_g": {"type": "SRCNN", "revisits": 8},
        "path": {},
        "train": {"total_iter": 1, "optim_g": {"type": "Adam", "lr": 1e-4}},
    }


def test_doctor_green_config(tmp_path, capsys):
    opt = _mini_train_opt(tmp_path)
    assert run_doctor(opt, check_runtime=False) == 0
    out = capsys.readouterr().out
    assert "0 error(s)" in out


def test_doctor_missing_paths_fail(tmp_path, capsys):
    opt = _mini_train_opt(tmp_path, with_data=False)
    opt["path"]["pretrain_network_g"] = str(tmp_path / "nope.pth")
    assert run_doctor(opt, check_runtime=False) == 1
    out = capsys.readouterr().out
    assert "missing" in out and "nope.pth" in out


def test_doctor_hints_fetchable_artifacts(tmp_path, capsys):
    """Missing files that map to reference-published artifacts get the exact
    fetch command (weights by basename, tile_weights/osm by key, dataset
    roots by set name)."""
    opt = _mini_train_opt(tmp_path, with_data=False)
    opt["path"]["pretrain_network_g"] = str(tmp_path / "w" / "esrgan_8S2.pth")
    ds = opt["datasets"]["train"]
    ds["sentinel2_path"] = str(tmp_path / "val_set" / "sentinel2")
    ds["naip_path"] = str(tmp_path / "val_set" / "naip")
    ds["tile_weights"] = str(tmp_path / "tw.json")
    ds["osm_objs_path"] = str(tmp_path / "osm_chips_to_masks.json")
    ds["old_naip_path"] = str(tmp_path / "old_naip")
    assert run_doctor(opt, check_runtime=False) == 1
    out = capsys.readouterr().out
    assert "python -m satlas_sr_tpu.fetch get" in out
    hint = [l for l in out.splitlines() if "fetch get" in l][0]
    for name in ("esrgan_8S2", "val_set", "train_tile_weights",
                 "osm_chips_to_masks", "old_naip"):
        assert name in hint
    assert hint.count("val_set") == 1  # deduplicated across s2+naip roots


def test_doctor_no_hint_when_all_present(tmp_path, capsys):
    opt = _mini_train_opt(tmp_path)
    assert run_doctor(opt, check_runtime=False) == 0
    assert "fetch get" not in capsys.readouterr().out


def test_doctor_strict_fails_on_warnings(tmp_path):
    opt = _mini_train_opt(tmp_path)
    opt["train"]["perceptual_opt"] = {"type": "PerceptualLoss",
                                      "layer_weights": {"conv5_4": 1.0}}
    assert run_doctor(opt, check_runtime=False) == 0
    assert run_doctor(opt, strict=True, check_runtime=False) == 1


def test_doctor_infer_channel_consistency(tmp_path, capsys):
    data = tmp_path / "corpus"
    data.mkdir()
    opt = {"data_dir": str(data), "save_path": str(tmp_path / "out"),
           "n_lr_images": 8,
           "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 36,
                         "num_out_ch": 3}}
    assert run_doctor(opt, check_runtime=False) == 1
    assert "24 channels" in capsys.readouterr().out


def test_parse_options_prints_lint_warnings(tmp_path, capsys):
    cfg = tmp_path / "c.yml"
    cfg.write_text(
        "name: lintcheck\nmodel_type: L2Model\nscale: 4\nmanual_seed: 1\n"
        "train:\n  total_iter: 1\n  ema_decy: 0.9\n")
    from satlas_sr_tpu.utils.options import parse_options

    parse_options(str(tmp_path), is_train=True, argv=["-opt", str(cfg)])
    assert "ema_decy" in capsys.readouterr().out


def test_doctor_f32_train_perf_hint(capsys):
    """The doctor surfaces the bf16 lever on f32 train configs (an OK-level
    hint, never a warning — f32 is the legitimate parity default) and stays
    quiet once the config already runs bfloat16. Round 5: the hint is
    family-aware — the L2 family measured OUT of the 0.05 dB bar
    (docs/sweeps/dtype_equiv_l2_r5.json), so there the doctor states the
    measured drift instead of recommending the flip."""
    base = {"name": "x", "model_type": "SSRESRGANModel", "scale": 4,
            "train": {"total_iter": 1}}
    run_doctor(dict(base), check_runtime=False)
    out = capsys.readouterr().out
    assert "bfloat16 measured" in out and "satlas_sr_tpu.tune" in out

    run_doctor({**base, "compute_dtype": "bfloat16"}, check_runtime=False)
    assert "bfloat16 measured" not in capsys.readouterr().out

    run_doctor({**base, "model_type": "L2Model"}, check_runtime=False)
    out = capsys.readouterr().out
    assert "drifts 0.127 dB" in out and "bfloat16 measured" not in out
