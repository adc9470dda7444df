"""Tower dry-run harness (scripts/tower_dryrun.py) over synthetic weights.

Pre-stages the first real-artifact session: a directory holding one file of
each naming family must come back fully classified in one pass, with
parameter counts and forward fingerprints; junk must be reported as a gap
and flip the exit code.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

import torch

from test_tower_import import _lpips_state, _openai_state

_SPEC = importlib.util.spec_from_file_location(
    "tower_dryrun",
    os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                 "tower_dryrun.py"))
dryrun = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(dryrun)


def _vgg19_state(rng):
    from satlas_sr_tpu.losses.vgg import VGG19_PLAN, _TORCHVISION_CONV_IDX

    state, in_ch = {}, 3
    for item, idx in zip([i for i in VGG19_PLAN if i != "M"],
                         _TORCHVISION_CONV_IDX):
        _, out_ch = item
        w = rng.randn(out_ch, in_ch, 3, 3).astype(np.float32) * 0.05
        state[f"features.{idx}.weight"] = torch.from_numpy(w)
        state[f"features.{idx}.bias"] = torch.zeros(out_ch)
        in_ch = out_ch
    return state


@pytest.fixture
def weights_dir(tmp_path, rng):
    d = tmp_path / "weights"
    d.mkdir()
    torch.save(_vgg19_state(rng), str(d / "vgg19.pth"))
    torch.save(_lpips_state(rng, "vgg"), str(d / "lpips_vgg.pth"))
    torch.save(_lpips_state(rng, "alex"), str(d / "lpips_alex.pth"))
    torch.save(_openai_state(rng), str(d / "clip_vitb.pth"))
    return d


def _run(argv):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        try:
            rc = dryrun.main()
        except SystemExit as e:  # argparse errors
            rc = e.code
    return rc, buf.getvalue()


def test_dryrun_classifies_every_family(weights_dir, tmp_path, monkeypatch):
    out = tmp_path / "report.json"
    monkeypatch.setattr(sys, "argv", [
        "tower_dryrun.py", str(weights_dir),
        "--clip-models", "test-tiny-openai",
        "--out", str(out)])
    rc, text = _run(None)
    assert rc == 0, text
    report = json.loads(out.read_text())
    assert report["all_imported"] is True
    by_file = {r["file"]: r for r in report["files"]}
    assert len(by_file) == 4

    def towers(name):
        return {m["tower"] for m in by_file[name]["matches"]
                if "error" not in m}

    assert "vgg19" in towers("vgg19.pth")
    assert towers("lpips_vgg.pth") == {"lpips-vgg"}
    assert towers("lpips_alex.pth") == {"lpips-alex"}
    assert towers("clip_vitb.pth") == {"clip:test-tiny-openai"}
    # fingerprints present and deterministic-looking
    for r in report["files"]:
        for m in r["matches"]:
            if "error" not in m:
                assert m["n_params"] > 0 and m["fingerprint"]


def test_dryrun_flags_unknown_file(tmp_path, rng, monkeypatch):
    d = tmp_path / "w"
    d.mkdir()
    torch.save({"mystery.weight": torch.zeros(3, 3)}, str(d / "junk.pth"))
    out = tmp_path / "report.json"
    monkeypatch.setattr(sys, "argv", [
        "tower_dryrun.py", str(d), "--clip-models", "test-tiny",
        "--out", str(out)])
    rc, text = _run(None)
    assert rc == 2
    assert "NO MATCH" in text
    report = json.loads(out.read_text())
    assert report["all_imported"] is False
    assert report["files"][0]["imported"] is False


def test_dryrun_skips_forward_above_param_cap(weights_dir, tmp_path,
                                              monkeypatch):
    out = tmp_path / "report.json"
    monkeypatch.setattr(sys, "argv", [
        "tower_dryrun.py", str(weights_dir),
        "--clip-models", "test-tiny-openai",
        "--max-forward-params", "1", "--out", str(out)])
    rc, _ = _run(None)
    assert rc == 0
    report = json.loads(out.read_text())
    for r in report["files"]:
        for m in r["matches"]:
            if "error" not in m:
                assert m["fingerprint"].startswith("params:")
