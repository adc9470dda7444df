"""Multi-band GT-free inference (beyond the reference).

The reference infer path reads tci-only series (ssr/utils/infer_utils.py:6-39)
so its released band-variant checkpoints (esrgan_{10m,20m,60m}.pth,
README.md:75-81) have no runnable inference story upstream. Here an infer
config carrying `s2_bands` treats data_dir as a dataset-style root of
{chip}/{band}.png dirs and stacks bands exactly like the training loader
(data/s2naip.py _load_bands semantics: tci 3ch required, others 1ch,
missing band files zero-fill).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satlas_sr_tpu.archs import RRDBNet
from satlas_sr_tpu.utils import torch_io
from satlas_sr_tpu.utils.imgio import read_png, write_png
from satlas_sr_tpu.utils.infer_utils import (channels_per_frame,
                                             format_s2naip_multiband,
                                             format_s2naip_multiband_batch,
                                             load_band_stack, normalize_bands)

N_FRAMES = 2
BANDS = ["tci", "b08"]  # 3 + 1 channels per frame


def _make_chip(root, chip, rng, frames=4, with_b08=True, black_frame=None,
               b08_frames=None):
    d = root / chip
    tci = (rng.rand(frames * 32, 32, 3) * 254 + 1).astype(np.uint8)
    if black_frame is not None:
        tci[black_frame * 32: black_frame * 32 + 4] = 0
    write_png(str(d / "tci.png"), tci)
    if with_b08:
        n = b08_frames if b08_frames is not None else frames
        b08 = (rng.rand(n * 32, 32, 1) * 254 + 1).astype(np.uint8)
        write_png(str(d / "b08.png"), b08)
    return str(d)


# ------------------------------------------------------------------ units


def test_normalize_bands_and_channels():
    assert normalize_bands(["b08", "tci"]) == ["tci", "b08"]
    assert normalize_bands(None) == ["tci"]
    assert channels_per_frame(None) == 3
    assert channels_per_frame(["tci", "b05", "b06"]) == 5


def test_load_band_stack_shapes_and_zero_fill(tmp_path, rng):
    chip = _make_chip(tmp_path, "c1", rng, frames=4)
    stack = load_band_stack(chip, BANDS)
    assert stack.shape == (4, 32, 32, 4)
    # missing band -> zeros at tci's frame count (training-loader parity)
    chip2 = _make_chip(tmp_path, "c2", rng, frames=3, with_b08=False)
    stack2 = load_band_stack(chip2, BANDS)
    assert stack2.shape == (3, 32, 32, 4)
    assert (stack2[..., 3] == 0).all() and (stack2[..., :3] > 0).any()


def test_load_band_stack_loud_failures(tmp_path, rng):
    chip = _make_chip(tmp_path, "c1", rng, frames=4, b08_frames=3)
    with pytest.raises(ValueError, match="frames but tci has"):
        load_band_stack(chip, BANDS)
    with pytest.raises(Exception):  # missing REQUIRED tci
        load_band_stack(str(tmp_path / "absent"), BANDS)


def test_format_multiband_prefers_good_tci_frames(tmp_path, rng):
    chip = _make_chip(tmp_path, "c1", rng, frames=3, black_frame=1)
    for trial in range(5):
        x, preview = format_s2naip_multiband(
            chip, BANDS, 2, np.random.RandomState(trial))
        assert x.shape == (32, 32, 2 * 4)
        # good-first selection never picks the black frame when enough goods
        assert (x[..., :3] > 0).any() and (x[..., 4:7] > 0).any()
    assert preview.shape == (32, 32, 3)


def test_format_multiband_batch_invariant_to_batching(tmp_path, rng):
    chips = [_make_chip(tmp_path, f"c{i}", rng) for i in range(4)]
    full, _ = format_s2naip_multiband_batch(chips, BANDS, N_FRAMES, seed=7)
    a, _ = format_s2naip_multiband_batch(chips[:2], BANDS, N_FRAMES, seed=7,
                                         index_offset=0)
    b, _ = format_s2naip_multiband_batch(chips[2:], BANDS, N_FRAMES, seed=7,
                                         index_offset=2)
    assert np.array_equal(full, np.concatenate([a, b]))


# ------------------------------------------------------------------- e2e


def _multiband_opt(tmp_path, data_dir, save_path):
    c = channels_per_frame(BANDS)
    net = dict(num_in_ch=N_FRAMES * c, num_out_ch=3, num_feat=8, num_block=1,
               num_grow_ch=4)
    model = RRDBNet(**net)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, N_FRAMES * c)))
    wpath = str(tmp_path / "net_g_mb.pth")
    torch_io.save_torch_state_dict(
        wpath, torch_io.rrdbnet_to_torch(variables), param_key="params_ema")
    return {
        "data_dir": str(data_dir), "save_path": str(save_path),
        "n_lr_images": N_FRAMES, "s2_bands": BANDS, "scale": 4,
        "batch_size": 4,
        "network_g": {"type": "SSR_RRDBNet", **net},
        "path": {"pretrain_network_g": wpath, "param_key_g": "params_ema",
                 "strict_load_g": True},
    }


def test_infer_multiband_end_to_end(tmp_path, rng):
    from satlas_sr_tpu.infer import run_inference

    data = tmp_path / "sentinel2"
    for i in range(3):
        _make_chip(data, f"{100 + i}_{200 + i}", rng,
                   with_b08=(i != 2))  # chip 2 exercises zero-fill
    save = tmp_path / "out"
    count = run_inference(_multiband_opt(tmp_path, data, save))
    assert count == 3
    for i in range(3):
        sr = read_png(str(save / str(i) / "sr.png"))
        lr = read_png(str(save / str(i) / "lr.png"))
        assert sr.shape == (128, 128, 3)
        assert lr.shape == (32, 32, 3)  # preview stays a tci image


def test_infer_multiband_network_channel_derivation(tmp_path):
    """build_network derives num_in_ch from s2_bands (the stale-YAML
    correction extends to band configs)."""
    from satlas_sr_tpu.utils.model_utils import build_network

    opt = {"scale": 4, "n_lr_images": 8, "s2_bands": ["tci", "b05", "b08"],
           "network_g": {"type": "SSR_RRDBNet", "num_feat": 8, "num_block": 1,
                         "num_grow_ch": 4}}
    model = build_network(opt)
    assert model.num_in_ch == 8 * 5


def test_infer_multiband_refusals(tmp_path, rng):
    from satlas_sr_tpu.infer import run_inference

    opt = _multiband_opt(tmp_path, tmp_path / "d", tmp_path / "o")
    with pytest.raises(ValueError, match="infer_grid"):
        run_inference(opt, grid_naming=True)
    opt["network_g"] = {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                        "revisits": 2, "hidden_channels": 16,
                        "out_channels": 3, "kernel_size": 3,
                        "residual_layers": 1, "output_size": 128,
                        "zoom_factor": 4, "sr_kernel_size": 1}
    opt["path"] = {}
    with pytest.raises(ValueError, match="SSR_RRDBNet"):
        run_inference(opt)


def test_doctor_consistency_with_bands(tmp_path, capsys):
    from satlas_sr_tpu.doctor import run_doctor

    data = tmp_path / "d"
    data.mkdir()
    opt = {"data_dir": str(data), "save_path": str(tmp_path / "o"),
           "n_lr_images": 8, "s2_bands": ["tci", "b08"],
           "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 24,
                         "num_out_ch": 3}}
    assert run_doctor(opt, check_runtime=False) == 1
    out = capsys.readouterr().out
    assert "32 channels" in out and "s2_bands" in out
