"""satlas_sr_tpu.prepare: raw raster -> S2-NAIP tree (reference
README.md:86-129 — the dataset structure + the raw-Sentinel-2 recipe the
reference only pseudo-codes)."""

import importlib.util
import json
import os

import numpy as np
import pytest

from satlas_sr_tpu.prepare import (
    NAIP_CHIP, NAIP_RES, S2_CHIP, S2_RES, TILE_M, WEB_MERCATOR_E,
    chip_raster, covered_tiles, main, normalize_band, tile_of, tile_origin)
from satlas_sr_tpu.utils.imgio import read_png, write_png


def test_tile_math_roundtrip():
    # grid constants line up: 2^17 tiles of 32 px at the README's 9.555 m/px
    assert S2_RES == pytest.approx(9.5546285, abs=1e-6)
    assert NAIP_RES == pytest.approx(S2_RES / 4)
    for col, row in [(0, 0), (12345, 67890), (2**17 - 1, 1)]:
        x, y = tile_origin(col, row)
        # top-left corner belongs to the tile; so does an interior point
        assert tile_of(x, y) == (col, row)
        assert tile_of(x + TILE_M / 2, y - TILE_M / 2) == (col, row)
    # world corners
    assert tile_of(-WEB_MERCATOR_E, WEB_MERCATOR_E) == (0, 0)


def _aligned_origin(col=1000, row=2000):
    return tile_origin(col, row)


def _rng_raster(rng, h, w, c=3, lo=1):
    # lo=1 keeps every pixel non-black (the dataset rejects black HR pixels)
    return rng.randint(lo, 256, size=(h, w, c)).astype(np.uint8)


def test_covered_tiles_full_and_partial():
    org = _aligned_origin()
    # 3x2 whole tiles plus a ragged margin that must be ignored
    tiles = covered_tiles(org, (2 * S2_CHIP + 7, 3 * S2_CHIP + 19), S2_RES)
    assert len(tiles) == 6
    cols = {c for c, _, _, _ in tiles}
    rows = {r for _, r, _, _ in tiles}
    assert cols == {1000, 1001, 1002} and rows == {2000, 2001}
    # pixel offsets are exact chip multiples on an aligned raster
    assert {(px, py) for _, _, px, py in tiles} == {
        (i * S2_CHIP, j * S2_CHIP) for i in range(3) for j in range(2)}


def test_misaligned_raster_refused():
    ox, oy = _aligned_origin()
    with pytest.raises(SystemExit, match="not aligned"):
        covered_tiles((ox + 0.5 * S2_RES, oy), (64, 64), S2_RES)


def test_normalize_band_semantics():
    # tci: 8-bit passthrough, refuse out-of-range
    a = np.array([[0, 255]], np.uint8)
    assert normalize_band(a, "tci") is a
    with pytest.raises(ValueError, match="passthrough"):
        normalize_band(np.array([[300]], np.uint16), "tci")
    # 16-bit bands: /8160, clip, scale (README.md:106)
    b = np.array([[0, 2040, 8160, 20000]], np.uint16)
    out = normalize_band(b, "b08")
    assert out.dtype == np.uint8
    assert out.tolist() == [[0, 64, 255, 255]]


def test_chip_s2_write_then_append_revisits(tmp_path, rng):
    org = _aligned_origin()
    r1 = _rng_raster(rng, 2 * S2_CHIP, 3 * S2_CHIP)
    r2 = _rng_raster(rng, 2 * S2_CHIP, 3 * S2_CHIP)
    s1 = chip_raster(r1, org, S2_RES, str(tmp_path), "s2")
    assert s1 == {"written": 6, "appended": 0, "skipped_blank": 0,
                  "tiles": s1["tiles"]}
    s2 = chip_raster(r2, org, S2_RES, str(tmp_path), "s2")
    assert s2["appended"] == 6 and s2["written"] == 0
    # each tile png is the two revisits stacked [T*32, 32, 3] in append order
    img = read_png(str(tmp_path / "sentinel2" / "1001_2000" / "tci.png"))
    assert img.shape == (2 * S2_CHIP, S2_CHIP, 3)
    np.testing.assert_array_equal(img[:S2_CHIP], r1[:S2_CHIP, S2_CHIP:2 * S2_CHIP])
    np.testing.assert_array_equal(img[S2_CHIP:], r2[:S2_CHIP, S2_CHIP:2 * S2_CHIP])


def test_chip_skips_blank_nodata(tmp_path, rng):
    org = _aligned_origin()
    r = _rng_raster(rng, S2_CHIP, 2 * S2_CHIP)
    r[:, :S2_CHIP] = 0  # reprojection nodata border
    s = chip_raster(r, org, S2_RES, str(tmp_path), "s2")
    assert s["written"] == 1 and s["skipped_blank"] == 1
    s = chip_raster(r, org, S2_RES, str(tmp_path), "s2", skip_blank=False)
    assert s["appended"] == 1 and s["written"] == 1


def test_chip_single_channel_band_and_mismatch(tmp_path, rng):
    org = _aligned_origin()
    b08 = rng.randint(0, 8161, size=(S2_CHIP, S2_CHIP, 1)).astype(np.uint16)
    s = chip_raster(b08, org, S2_RES, str(tmp_path), "s2", band="b08")
    assert s["written"] == 1
    img = read_png(str(tmp_path / "sentinel2" / "1000_2000" / "b08.png"))
    assert img.shape == (S2_CHIP, S2_CHIP, 1)
    with pytest.raises(SystemExit, match="channel"):
        chip_raster(b08, org, S2_RES, str(tmp_path), "s2", band="tci")
    with pytest.raises(SystemExit, match="unknown band"):
        chip_raster(b08, org, S2_RES, str(tmp_path), "s2", band="b99")


def test_chip_naip_role(tmp_path, rng):
    org = _aligned_origin()
    r = _rng_raster(rng, NAIP_CHIP, NAIP_CHIP)
    s = chip_raster(r, org, NAIP_RES, str(tmp_path), "naip", uuid="m_123")
    assert s["written"] == 1
    p = tmp_path / "naip" / "m_123" / "1000_2000" / "rgb.png"
    np.testing.assert_array_equal(read_png(str(p)), r)
    # single images, not time series: refuse a second pass, allow --overwrite
    with pytest.raises(SystemExit, match="exists"):
        chip_raster(r, org, NAIP_RES, str(tmp_path), "naip", uuid="m_123")
    s = chip_raster(r, org, NAIP_RES, str(tmp_path), "naip", uuid="m_123",
                    overwrite=True)
    assert s["written"] == 1


def test_wrong_resolution_refused(tmp_path, rng):
    with pytest.raises(SystemExit, match="m/px"):
        chip_raster(_rng_raster(rng, 32, 32), _aligned_origin(), NAIP_RES,
                    str(tmp_path), "s2")


def test_snap_to_grid_makes_reproject_chippable():
    """calculate_default_transform anchors at arbitrary source bounds;
    snap_to_grid must move the window onto the dataset pixel grid (west/
    north by < 1 px, coverage kept) so reproject -> chip composes."""
    from satlas_sr_tpu.prepare import snap_to_grid

    ox, oy = tile_origin(1000, 2000)
    # arbitrary misaligned origin strictly inside tile (999, 1999)'s last px
    mx, my = ox - 0.37 * S2_RES, oy + 0.61 * S2_RES
    sx, sy, w, h = snap_to_grid(mx, my, 64, 64, S2_RES)
    # snapped west/north onto the grid by < 1 px
    assert sx <= mx and sy >= my
    assert mx - sx < S2_RES and sy - my < S2_RES
    # grid-aligned: covered_tiles accepts it (no SystemExit), full coverage
    tiles = covered_tiles((sx, sy), (h, w), S2_RES)
    assert len(tiles) >= 1
    assert (sx + w * S2_RES) >= (mx + 64 * S2_RES) - 1e-6
    assert (sy - h * S2_RES) <= (my - 64 * S2_RES) + 1e-6
    # an already-aligned window is a fixed point
    assert snap_to_grid(ox, oy, 96, 64, S2_RES) == (ox, oy, 96, 64)


def test_normalize_band_rounds_float_passthrough():
    # bilinear reprojection delivers floats like 254.9; truncation would
    # bias a full DN down
    out = normalize_band(np.array([[254.9, 0.4]], np.float64), "tci")
    assert out.tolist() == [[255, 0]]


@pytest.mark.skipif(importlib.util.find_spec("rasterio") is not None,
                    reason="rasterio installed; refusal path not reachable")
def test_reproject_refuses_loudly_without_rasterio(tmp_path):
    from satlas_sr_tpu.prepare import reproject_raster

    with pytest.raises(SystemExit) as e:
        reproject_raster("src.jp2", str(tmp_path / "out.tif"), S2_RES)
    msg = str(e.value)
    # the refusal carries the full runnable recipe, not just an error
    assert "rasterio" in msg and "Resampling.bilinear" in msg
    assert "9.554628536" in msg


def test_cli_end_to_end_and_loader_integration(tmp_path, rng, capsys):
    """prepare both roles via the CLI, then prove S2NAIPDataset consumes the
    emitted tree: the tool's output IS the reference's on-disk format."""
    org = _aligned_origin()
    ox, oy = org
    data = tmp_path / "root"
    # two S2 revisits (the CLI appends in input order) over 2x1 tiles
    for i in range(2):
        p = tmp_path / f"s2_{i}.png"
        write_png(str(p), _rng_raster(rng, S2_CHIP, 2 * S2_CHIP))
        # --origin=... form: the x of any western-hemisphere origin is
        # negative and bare argparse values may not start with '-'
        assert main(["chip", "--input", str(p), "--out", str(data),
                     f"--origin={ox},{oy}"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tiles"] == 2 and out["appended"] == 2
    # matching NAIP chips (4x resolution, same grid)
    p = tmp_path / "naip.png"
    write_png(str(p), _rng_raster(rng, NAIP_CHIP, 2 * NAIP_CHIP))
    assert main(["chip", "--input", str(p), "--out", str(data),
                 "--role", "naip", f"--origin={ox},{oy}",
                 "--uuid", "m_20190601"]) == 0

    from satlas_sr_tpu.data.s2naip import S2NAIPDataset

    ds = S2NAIPDataset({
        "phase": "train", "n_s2_images": 2, "scale": 4,
        "sentinel2_path": str(data / "sentinel2"),
        "naip_path": str(data / "naip"),
    })
    assert len(ds) == 2
    item = ds[0]
    assert item["lr"].shape == (S2_CHIP, S2_CHIP, 6)  # T*C channel-stacked
    assert item["hr"].shape == (NAIP_CHIP, NAIP_CHIP, 3)
    assert item["Chip"] in ("1000_2000", "1001_2000")


def test_cli_requires_origin_for_png(tmp_path, rng):
    p = tmp_path / "s2.png"
    write_png(str(p), _rng_raster(rng, S2_CHIP, S2_CHIP))
    with pytest.raises(SystemExit, match="--origin"):
        main(["chip", "--input", str(p), "--out", str(tmp_path / "d")])
