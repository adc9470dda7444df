"""End-to-end inference CLI tests on a synthetic S2-NAIP tree.

Exercises the full infer / infer_grid paths: yaml config -> network build ->
.pth weight import -> batched jitted inference -> png save -> grid stitch
(reference call stacks SURVEY.md §3.3/§3.4).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satlas_sr_tpu.archs import RRDBNet
from satlas_sr_tpu.utils import torch_io
from satlas_sr_tpu.utils.imgio import read_png, write_png


N_FRAMES = 2
TINY_NET = dict(num_in_ch=N_FRAMES * 3, num_out_ch=3, num_feat=8, num_block=1, num_grow_ch=4)


def _make_weights(tmp_path):
    model = RRDBNet(**TINY_NET)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, N_FRAMES * 3)))
    sd = torch_io.rrdbnet_to_torch(variables)
    path = str(tmp_path / "net_g.pth")
    torch_io.save_torch_state_dict(path, sd, param_key="params_ema")
    return path


def _opt(tmp_path, data_dir, save_path):
    return {
        "data_dir": str(data_dir),
        "save_path": str(save_path),
        "n_lr_images": N_FRAMES,
        "scale": 4,
        "batch_size": 8,
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": N_FRAMES * 3, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
        "path": {"pretrain_network_g": _make_weights(tmp_path), "param_key_g": "params_ema",
                 "strict_load_g": True},
    }


def _write_s2_png(path, rng, n_frames=4, black_frame=None):
    data = (rng.rand(n_frames * 32, 32, 3) * 254 + 1).astype(np.uint8)
    if black_frame is not None:
        data[black_frame * 32 : black_frame * 32 + 4] = 0
    write_png(str(path), data)
    return data


def test_infer_end_to_end(tmp_path, rng):
    from satlas_sr_tpu.infer import run_inference

    data_dir = tmp_path / "sentinel2" / "sub"
    os.makedirs(data_dir)
    for i in range(3):
        _write_s2_png(data_dir / f"{i}.png", rng, n_frames=4, black_frame=1 if i == 0 else None)

    save = tmp_path / "out"
    count = run_inference(_opt(tmp_path, tmp_path / "sentinel2", save))
    assert count == 3
    for i in range(3):
        sr = read_png(str(save / str(i) / "sr.png"))
        lr = read_png(str(save / str(i) / "lr.png"))
        assert sr.shape == (128, 128, 3)
        assert lr.shape == (32, 32, 3)


def test_infer_skip_existing_resume_bit_identical(tmp_path, rng):
    """skip_existing: interrupted-corpus resume recomputes ONLY the missing
    outputs, and the resumed corpus is bit-identical to a straight full run
    (frame-selection RNG is salted by the ORIGINAL global corpus index, so
    filtering must not shift any survivor's salt)."""
    import shutil

    from satlas_sr_tpu.infer import run_inference

    data_dir = tmp_path / "sentinel2" / "sub"
    os.makedirs(data_dir)
    for i in range(5):
        # multiple good frames so per-index RNG actually changes selections
        _write_s2_png(data_dir / f"{i}.png", rng, n_frames=4)

    save = tmp_path / "out"
    opt = _opt(tmp_path, tmp_path / "sentinel2", save)
    assert run_inference(opt) == 5
    full = {i: read_png(str(save / str(i) / "sr.png")) for i in range(5)}

    # simulate an interrupted run: outputs 1 and 3 lost (3 only partially —
    # sr.png present but lr.png missing must count as NOT done)
    shutil.rmtree(save / "1")
    os.remove(save / "3" / "lr.png")
    kept_mtime = os.path.getmtime(save / "2" / "sr.png")

    opt["skip_existing"] = True
    assert run_inference(opt) == 2  # only the two incomplete outputs
    for i in range(5):
        np.testing.assert_array_equal(
            read_png(str(save / str(i) / "sr.png")), full[i])
    # the untouched output was not rewritten
    assert os.path.getmtime(save / "2" / "sr.png") == kept_mtime

    # a fully-complete corpus is a no-op
    assert run_inference(opt) == 0


def test_infer_skip_existing_refuses_mutated_corpus(tmp_path, rng):
    """Manifest guard: adding/removing an input between interrupt and resume
    shifts every later global index (output keys AND frame-RNG salts), so a
    skip_existing resume over a mutated corpus must refuse loudly; --force
    re-enumerates."""
    from satlas_sr_tpu.infer import run_inference

    data_dir = tmp_path / "sentinel2" / "sub"
    os.makedirs(data_dir)
    for i in range(4):
        _write_s2_png(data_dir / f"{i}.png", rng, n_frames=4)

    save = tmp_path / "out"
    opt = _opt(tmp_path, tmp_path / "sentinel2", save)
    opt["skip_existing"] = True
    assert run_inference(opt) == 4
    assert (save / ".ssr_corpus_manifest.json").exists()

    # pure tail append (sorts after every existing path): existing indices
    # are unchanged, so a growing corpus is accepted and only the new input
    # is computed; the manifest is extended in place
    _write_s2_png(data_dir / "8.png", rng, n_frames=4)
    assert run_inference(opt) == 1
    assert run_inference(opt) == 0  # extended manifest matches

    # removal shifts later indices -> refused
    os.remove(data_dir / "1.png")
    with pytest.raises(RuntimeError, match="corpus changed"):
        run_inference(opt)

    # same count as the manifest, different enumeration -> still refused
    _write_s2_png(data_dir / "9.png", rng, n_frames=4)
    with pytest.raises(RuntimeError, match="corpus changed"):
        run_inference(opt)

    # --force re-enumerates: accepts the new corpus and rewrites the manifest
    assert run_inference(opt, force=True) >= 0
    assert run_inference(opt) >= 0  # manifest now matches the new corpus


def test_infer_grid_skip_existing_refuses_mutated_corpus(tmp_path, rng):
    """Grid (chunked) mode has the same index-keyed salts: guard applies."""
    import yaml

    from satlas_sr_tpu.infer_grid import main as grid_main

    grid = 2
    tile_dir = tmp_path / "s2" / "tile_0_0"
    os.makedirs(tile_dir)
    for i in range(grid):
        for j in range(grid):
            _write_s2_png(tile_dir / f"{i}_{j}.png", rng, n_frames=N_FRAMES)

    save = tmp_path / "out"
    opt = _opt(tmp_path, tmp_path / "s2", save)
    opt["skip_existing"] = True
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    grid_main(["-opt", str(opt_path)])

    os.remove(tile_dir / "0_1.png")
    with pytest.raises(RuntimeError, match="corpus changed"):
        grid_main(["-opt", str(opt_path)])
    grid_main(["-opt", str(opt_path), "--force"])  # re-enumerates


def test_infer_halo_skip_existing_refuses_mutated_corpus(tmp_path, rng):
    """Seam-free (halo) mode salts frames by the same global corpus index:
    the guard must refuse a mutated corpus there too."""
    import yaml

    from satlas_sr_tpu.infer_grid import main as grid_main

    grid = 2
    for tile in ("tile_0_0", "tile_0_1"):
        tile_dir = tmp_path / "s2" / tile
        os.makedirs(tile_dir)
        for i in range(grid):
            for j in range(grid):
                _write_s2_png(tile_dir / f"{i}_{j}.png", rng, n_frames=N_FRAMES)

    save = tmp_path / "out"
    opt = _opt(tmp_path, tmp_path / "s2", save)
    opt["skip_existing"] = True
    opt["halo"] = 4
    opt["halo_window"] = 16
    opt["grid_size"] = grid
    opt["batch_size"] = 4
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    grid_main(["-opt", str(opt_path)])
    assert (save / ".ssr_corpus_manifest.json").exists()

    _write_s2_png(tmp_path / "s2" / "tile_0_0" / "extra.png", rng,
                  n_frames=N_FRAMES)
    with pytest.raises(RuntimeError, match="corpus changed"):
        grid_main(["-opt", str(opt_path)])
    grid_main(["-opt", str(opt_path), "--force"])


def test_infer_grid_skip_existing(tmp_path, rng):
    """Grid mode: per-chunk outputs skip; stitch skips fully-stitched tiles."""
    import yaml

    from satlas_sr_tpu.infer_grid import main as grid_main

    grid = 4
    tile_dir = tmp_path / "s2" / "tile_1_2"
    os.makedirs(tile_dir)
    for i in range(grid):
        for j in range(grid):
            _write_s2_png(tile_dir / f"{i}_{j}.png", rng, n_frames=N_FRAMES)

    save = tmp_path / "out"
    opt = _opt(tmp_path, tmp_path / "s2", save)
    opt["skip_existing"] = True
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    grid_main(["-opt", str(opt_path)])
    first = read_png(str(save / "tile_1_2" / "1_1.png"))
    os.remove(save / "tile_1_2" / "0_0.png")
    kept_mtime = os.path.getmtime(save / "tile_1_2" / "1_1.png")
    grid_main(["-opt", str(opt_path)])
    # missing chunk recomputed, existing chunk untouched, bit-identical
    assert (save / "tile_1_2" / "0_0.png").exists()
    assert os.path.getmtime(save / "tile_1_2" / "1_1.png") == kept_mtime
    np.testing.assert_array_equal(
        read_png(str(save / "tile_1_2" / "1_1.png")), first)


def test_infer_grid_end_to_end(tmp_path, rng):
    from satlas_sr_tpu.infer_grid import main as grid_main
    import yaml

    grid = 4  # scaled-down grid; stitch asserts on 16x16 in prod via 256 check
    tile_dir = tmp_path / "s2" / "tile_1_2"
    os.makedirs(tile_dir)
    for i in range(grid):
        for j in range(grid):
            _write_s2_png(tile_dir / f"{i}_{j}.png", rng, n_frames=N_FRAMES)

    save = tmp_path / "out"
    opt = _opt(tmp_path, tmp_path / "s2", save)
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    grid_main(["-opt", str(opt_path)])

    # 16 chunks < 256 -> stitch skipped, but per-chunk SR must exist with grid naming
    for i in range(grid):
        for j in range(grid):
            out = read_png(str(save / "tile_1_2" / f"{i}_{j}.png"))
            assert out.shape == (128, 128, 3)


def test_stitch_assembles_grid(tmp_path, rng):
    from satlas_sr_tpu.utils.infer_utils import stitch

    chunks = tmp_path / "chunks"
    os.makedirs(chunks)
    tiles = {}
    for i in range(16):
        for j in range(16):
            t = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
            tiles[(i, j)] = t
            write_png(str(chunks / f"{i}_{j}.png"), t)
    out_path = tmp_path / "stitched.png"
    stitch(str(chunks), 2048, str(out_path))
    stitched = read_png(str(out_path))
    assert stitched.shape == (2048, 2048, 3)
    np.testing.assert_array_equal(stitched[128:256, 256:384], tiles[(1, 2)])


def test_format_s2naip_prefers_good_frames(rng):
    from satlas_sr_tpu.utils.infer_utils import format_s2naip_data

    data = (rng.rand(4 * 32, 32, 3) * 254 + 1).astype(np.uint8)
    data[0:32][5, 5] = 0  # frame 0 has a zero element -> bad by infer predicate
    stacked, preview = format_s2naip_data(data, 3, np.random.RandomState(0))
    assert stacked.shape == (32, 32, 9)
    np.testing.assert_array_equal(preview, data[:32])
    # All 3 picked frames must come from the good set {1, 2, 3}.
    frames = data.reshape(4, 32, 32, 3)
    picked = [stacked[..., 3 * k : 3 * k + 3] for k in range(3)]
    for p in picked:
        assert any(np.array_equal(p, frames[i]) for i in (1, 2, 3))


def test_infer_grid_full_tile_stitches(tmp_path, rng):
    """A full 16x16-chunk tile passes the 256-chunk gate and stitches
    2048x2048 SR + 512x512 S2 images (ssr/infer_grid.py:70-85 parity)."""
    from satlas_sr_tpu.infer_grid import main as grid_main
    import yaml

    tile_dir = tmp_path / "s2" / "tile_7_9"
    os.makedirs(tile_dir)
    for i in range(16):
        for j in range(16):
            _write_s2_png(tile_dir / f"{i}_{j}.png", rng, n_frames=N_FRAMES)

    save = tmp_path / "out"
    opt = _opt(tmp_path, tmp_path / "s2", save)
    opt["batch_size"] = 32
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    grid_main(["-opt", str(opt_path)])

    sr = read_png(str(save / "tile_7_9" / "stitched_sr.png"))
    s2_img = read_png(str(save / "tile_7_9" / "stitched_s2.png"))
    assert sr.shape == (2048, 2048, 3)
    assert s2_img.shape == (512, 512, 3)
    # stitched S2 equals the first frame of each chunk in place
    first = read_png(str(tile_dir / "3_5.png")).reshape(-1, 32, 32, 3)[0]
    np.testing.assert_array_equal(s2_img[3 * 32 : 4 * 32, 5 * 32 : 6 * 32], first)
    # stitched SR equals the per-chunk sr output in place
    chunk = read_png(str(save / "tile_7_9" / "3_5.png"))
    np.testing.assert_array_equal(sr[3 * 128 : 4 * 128, 5 * 128 : 6 * 128], chunk)


def test_inference_engine_mesh_equals_single_device(rng):
    """Sharded 8-device execution gives the same outputs as unsharded."""
    from satlas_sr_tpu.inference import InferenceEngine

    model = RRDBNet(**TINY_NET)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, N_FRAMES * 3)))
    x = (rng.rand(16, 32, 32, N_FRAMES * 3) * 255).astype(np.uint8)
    eng_mesh = InferenceEngine(model, variables, batch_size=16, use_mesh=True)
    eng_solo = InferenceEngine(model, variables, batch_size=16, use_mesh=False)
    y_mesh = eng_mesh.run(x)
    y_solo = eng_solo.run(x)
    # identical math; uint8 rounding may flip by 1 at fusion boundaries
    assert np.abs(y_mesh.astype(int) - y_solo.astype(int)).max() <= 1
    # and the batch really is sharded over all devices
    put = eng_mesh._put(x)
    assert len(put.sharding.device_set) == 8


def test_infer_single_frame_esrgan_1s2(tmp_path, rng):
    """esrgan_1S2 shape: n_lr_images=1 -> num_in_ch=3 (BASELINE.json config)."""
    from satlas_sr_tpu.infer import run_inference

    model = RRDBNet(num_in_ch=3, num_out_ch=3, num_feat=8, num_block=1, num_grow_ch=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    weights = str(tmp_path / "net_g_1s2.pth")
    torch_io.save_torch_state_dict(weights, torch_io.rrdbnet_to_torch(variables),
                                   param_key="params_ema")
    data_dir = tmp_path / "s2" / "sub"
    os.makedirs(data_dir)
    _write_s2_png(data_dir / "0.png", rng, n_frames=3)
    opt = {
        "data_dir": str(tmp_path / "s2"), "save_path": str(tmp_path / "out"),
        "n_lr_images": 1, "scale": 4, "batch_size": 8,
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 3, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
        "path": {"pretrain_network_g": weights, "param_key_g": "params_ema"},
    }
    assert run_inference(opt) == 1
    assert read_png(str(tmp_path / "out" / "0" / "sr.png")).shape == (128, 128, 3)


def test_infer_multibatch_ordering_matches_per_image(tmp_path, rng):
    """With a small batch size and the 3-deep flight window + decode/write
    pools, every output file must still pair with ITS input (round-2
    pipeline: ordering regression guard)."""
    from satlas_sr_tpu.infer import run_inference
    from satlas_sr_tpu.inference import InferenceEngine
    from satlas_sr_tpu.utils.infer_utils import format_s2naip_batch
    from satlas_sr_tpu.utils.model_utils import build_network

    data_dir = tmp_path / "data"
    for i in range(10):  # 5 batches of 2 -> deeper than the flight window
        _write_s2_png(str(data_dir / f"chip{i:02d}" / "tci.png"), rng,
                      n_frames=N_FRAMES)
    opt = _opt(tmp_path, data_dir, tmp_path / "out")
    opt["batch_size"] = 2
    n = run_inference(opt, save_lr=False)
    assert n == 10

    # independent per-image reference outputs, same weights/engine path
    import glob

    model = build_network(opt)
    from satlas_sr_tpu.utils.checkpoint import load_network_variables

    variables = load_network_variables(
        "SSR_RRDBNet", opt["path"]["pretrain_network_g"],
        opt["network_g"], "params_ema")
    engine = InferenceEngine(model, variables, batch_size=2,
                             n_frames=N_FRAMES, matmul_precision="highest")
    pngs = sorted(glob.glob(str(data_dir / "**" / "*.png"), recursive=True))
    inputs, _ = format_s2naip_batch(pngs, N_FRAMES, seed=0)
    for i, path in enumerate(pngs):
        want = engine.run(inputs[i:i + 1])[0]
        got = read_png(str(tmp_path / "out" / str(i) / "sr.png"))
        assert np.array_equal(got, want), f"output {i} mismatched its input"


def test_infer_multiprocess_sharding_bitexact(tmp_path, rng):
    """(rank, world) shards the corpus into contiguous blocks: the 2-process
    union equals the 1-process outputs bit-for-bit (global-index frame
    seeding + global output numbering are process-count invariant)."""
    from satlas_sr_tpu.infer import run_inference

    data_dir = tmp_path / "data"
    for i in range(5):
        _write_s2_png(str(data_dir / f"chip{i}" / "tci.png"), rng, n_frames=4)

    ref = tmp_path / "ref"
    opt = _opt(tmp_path, data_dir, ref)
    opt["batch_size"] = 2
    assert run_inference(opt) == 5

    out = tmp_path / "sharded"
    opt2 = dict(opt, save_path=str(out))
    n0 = run_inference(opt2, rank=0, world=2)
    n1 = run_inference(opt2, rank=1, world=2)
    assert (n0, n1) == (3, 2)
    for i in range(5):
        np.testing.assert_array_equal(
            read_png(str(ref / str(i) / "sr.png")),
            read_png(str(out / str(i) / "sr.png")),
        )
        np.testing.assert_array_equal(
            read_png(str(ref / str(i) / "lr.png")),
            read_png(str(out / str(i) / "lr.png")),
        )


def test_infer_grid_multiprocess_tile_sharding(tmp_path, rng):
    """Grid mode shards WHOLE tiles across processes (a tile's chunks and its
    stitch stay together); sharded outputs equal the single-process run."""
    from satlas_sr_tpu.infer import run_inference
    from satlas_sr_tpu.infer_grid import stitch_tiles

    for tile in ("tile_1_1", "tile_2_2"):
        tile_dir = tmp_path / "s2" / tile
        os.makedirs(tile_dir)
        for i in range(16):
            for j in range(16):
                _write_s2_png(tile_dir / f"{i}_{j}.png", rng, n_frames=N_FRAMES)

    ref = tmp_path / "ref"
    opt = _opt(tmp_path, tmp_path / "s2", ref)
    opt["batch_size"] = 64
    assert run_inference(opt, save_lr=False, grid_naming=True) == 512
    stitch_tiles(str(tmp_path / "s2"), str(ref))

    out = tmp_path / "sharded"
    opt2 = dict(opt, save_path=str(out))
    counts = []
    for rank in (0, 1):
        counts.append(
            run_inference(opt2, save_lr=False, grid_naming=True, rank=rank, world=2)
        )
        stitch_tiles(str(tmp_path / "s2"), str(out), rank=rank, world=2)
    assert counts == [256, 256]  # one whole tile per process
    for tile in ("tile_1_1", "tile_2_2"):
        np.testing.assert_array_equal(
            read_png(str(ref / tile / "stitched_sr.png")),
            read_png(str(out / tile / "stitched_sr.png")),
        )
