"""Dataset scan CLI: pre-training validation of an S2-NAIP tree."""

import json

import numpy as np
import yaml

from satlas_sr_tpu.scan_data import main, scan_dataset
from satlas_sr_tpu.utils.imgio import write_png
from tests.test_training import _make_tree


def _write_chip(root, chip, naip=None, s2=None, frames=4):
    rng = np.random.RandomState(7)
    if naip is None:
        naip = (rng.rand(128, 128, 3) * 254 + 1).astype(np.uint8)
    write_png(str(root / "naip" / chip / f"{chip}.png"), naip)
    if s2 is None:
        s2 = (rng.rand(frames * 32, 32, 3) * 254 + 1).astype(np.uint8)
    write_png(str(root / "sentinel2" / chip / "tci.png"), s2)


def _ds(tmp_path, n_s2_images=2):
    from satlas_sr_tpu.data.loader import build_dataset

    return build_dataset({
        "type": "S2NAIPDataset", "phase": "train", "scale": 4,
        "sentinel2_path": str(tmp_path / "sentinel2"),
        "naip_path": str(tmp_path / "naip"),
        "n_s2_images": n_s2_images,
    })


def test_scan_clean_tree(tmp_path, rng):
    _make_tree(tmp_path, rng)
    report = scan_dataset(_ds(tmp_path))
    assert report["chips_scanned"] == 4
    assert report["chips_unusable"] == 0
    assert report["good_frame_ratio_mean"] == 1.0
    assert report["frames"] == {"min": 4, "max": 4, "required": 2}


def test_scan_flags_each_issue(tmp_path, rng):
    _make_tree(tmp_path, rng)
    # black-pixel NAIP
    bad_naip = (rng.rand(128, 128, 3) * 254 + 1).astype(np.uint8)
    bad_naip[5, 5] = 0
    _write_chip(tmp_path, "900_900", naip=bad_naip)
    # bad band geometry (height not a multiple of 32)
    _write_chip(tmp_path, "901_901",
                s2=(rng.rand(40, 32, 3) * 254 + 1).astype(np.uint8))
    # too few frames (1 < required 2)
    _write_chip(tmp_path, "902_902", frames=1)
    # every frame has a black pixel: usable, but flagged
    s2 = (rng.rand(4 * 32, 32, 3) * 254 + 1).astype(np.uint8)
    s2[::32, 0] = 0
    _write_chip(tmp_path, "903_903", s2=s2)
    # truncated png -> decode failure on the band
    _write_chip(tmp_path, "904_904")
    p = tmp_path / "sentinel2" / "904_904" / "tci.png"
    p.write_bytes(p.read_bytes()[:100])

    report = scan_dataset(_ds(tmp_path))
    assert report["chips_scanned"] == 9
    assert report["issues"]["naip_black_pixels"]["examples"] == ["900_900"]
    assert report["issues"]["bands_invalid"]["count"] == 2  # 901 + truncated
    assert "904_904" in report["issues"]["bands_invalid"]["examples"]
    assert report["issues"]["too_few_frames"]["examples"] == ["902_902"]
    assert report["issues"]["all_frames_black"]["examples"] == ["903_903"]
    # all_frames_black chips still train (degraded) — not counted unusable
    assert report["chips_unusable"] == 4


def test_scan_cli_json_and_strict(tmp_path, rng, capsys):
    _make_tree(tmp_path, rng)
    cfg = {
        "name": "scan", "scale": 4,
        "datasets": {"train": {
            "name": "train", "type": "S2NAIPDataset",
            "sentinel2_path": str(tmp_path / "sentinel2"),
            "naip_path": str(tmp_path / "naip"), "n_s2_images": 2,
        }},
    }
    opt_path = tmp_path / "scan.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out_json = tmp_path / "report.json"
    assert main(["-opt", str(opt_path), "--json", str(out_json),
                 "--strict"]) == 0
    report = json.load(open(out_json))
    assert report["chips_usable"] == 4
    assert "chips usable:   4" in capsys.readouterr().out

    # a bad chip + --strict -> exit 1
    _write_chip(tmp_path, "905_905", frames=1)
    assert main(["-opt", str(opt_path), "--strict"]) == 1
    # unknown block name -> exit 2
    assert main(["-opt", str(opt_path), "--dataset", "nope"]) == 2
