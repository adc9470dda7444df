"""Band-order recovery for the multi-band checkpoints (round 4).

The released esrgan_{10m,20m,60m}.pth generators have no published
`s2_bands` order (reference README.md:76-80 links configs on a missing
branch). scripts/band_order_search.py recovers it empirically; this test
proves the method on a synthetic ground truth: generate NAIP "GT" BY the
model under a known band order, then the search must rank that order first
with a wide margin.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satlas_sr_tpu.archs import RRDBNet
from satlas_sr_tpu.utils import torch_io
from satlas_sr_tpu.utils.imgio import write_png

_SPEC = importlib.util.spec_from_file_location(
    "band_order_search",
    os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                 "band_order_search.py"))
bos = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bos)


def test_enumerate_orders():
    # tci (3ch) + 2 of 3 singles, tci pinned first -> P(3,2)=6 orders
    orders = bos.enumerate_orders(["tci", "b05", "b06", "b07"], 5)
    assert len(orders) == 6
    assert all(o[0] == "tci" and len(o) == 3 for o in orders)
    # tci-less width: pure permutations of singles
    orders = bos.enumerate_orders(["b05", "b06", "b07"], 3)
    assert len(orders) == 6
    # width 4 with tci available: tci+1 single, plus no tci-less option
    # (only 3 singles < 4)
    orders = bos.enumerate_orders(["tci", "b08"], 4)
    assert orders == [["tci", "b08"]]
    with pytest.raises(ValueError, match="--bands"):
        bos.enumerate_orders([f"b{i:02d}" for i in range(8)], 5,
                             max_candidates=10)


def test_search_recovers_true_band_order(tmp_path, rng, capsys, monkeypatch):
    n_frames, true_bands = 2, ["tci", "b05", "b06"]
    cpf = 5
    num_in_ch = n_frames * cpf

    model = RRDBNet(num_in_ch=num_in_ch, num_out_ch=3, num_feat=8,
                    num_block=1, num_grow_ch=4)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 32, 32, num_in_ch)))
    pth = str(tmp_path / "esrgan_synth.pth")
    torch_io.save_torch_state_dict(
        pth, torch_io.rrdbnet_to_torch(variables), param_key="params_ema")

    root = tmp_path / "val"
    for c in range(4):
        chip = f"{700 + c}_{800 + c}"
        d = root / "sentinel2" / chip
        per_band = {}
        for band in true_bands:
            ch = 3 if band == "tci" else 1
            img = (rng.rand(n_frames * 32, 32, ch) * 254 + 1).astype(np.uint8)
            write_png(str(d / f"{band}.png"), img)
            per_band[band] = img.reshape(n_frames, 32, 32, ch)
        # GT = the model's own SR of the TRUE stacking -> that order scores
        # (near-)infinite PSNR, any other order scores ordinary-low
        stack = np.concatenate([per_band[b] for b in true_bands], axis=-1)
        x = np.concatenate(list(stack), axis=-1)[None]
        with jax.default_matmul_precision("highest"):
            y = model.apply(variables, jnp.asarray(x, jnp.float32) / 255.0)
        hr = np.asarray(jnp.rint(jnp.clip(y[0], 0, 1) * 255), np.uint8)
        write_png(str(root / "naip" / chip / f"{chip}.png"), hr)

    out = tmp_path / "report.json"
    monkeypatch.setattr(sys, "argv", [
        "band_order_search.py", pth, str(root), "--n-frames", str(n_frames),
        "--limit", "3", "--out", str(out)])
    assert bos.main() == 0
    report = json.loads(out.read_text())
    assert report["winner"] == true_bands
    assert report["margin_db"] > 3.0  # decisively, not by luck
    assert report["ranking"][0]["psnr"] > report["ranking"][1]["psnr"]
    assert {tuple(r["bands"]) for r in report["ranking"]} == {
        ("tci", "b05", "b06"), ("tci", "b06", "b05")}
    assert "s2_bands: [tci, b05, b06]" in capsys.readouterr().out
