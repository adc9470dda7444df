"""Tile-grid inference + stitching CLI.

Parity with ssr/infer_grid.py: per-chunk inference preserving
`{tile}/{i}_{j}.png` naming, then for every tile with all 256 chunks, stitch
the SR outputs into a 2048x2048 png and the first S2 frames into 512x512
(ssr/infer_grid.py:70-85).

The per-chunk loop — "embarrassingly parallel" per SURVEY.md §3.4 — runs as
device-sharded batches through the same InferenceEngine as infer.py.

Beyond the reference: `whole_tile: true` runs the generator ONCE over each
assembled 512x512 tile instead of 256 independent 32x32 chunks — a SEAMLESS
2048x2048 SR output (chunked inference zero-pads every interior chunk edge),
spatially sharded across devices via `spatial_shards` (XLA SPMD halo
exchange; see parallel/mesh.py mesh_2d).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from .infer import load_infer_variables, run_inference
from .inference import InferenceEngine
from .utils.imgio import write_png
from .utils.infer_utils import assemble_tile, stitch
from .utils.model_utils import build_network
from .utils.lint import report_lint
from .utils.options import yaml_load


def _skip_done_tiles(tiles, save_path: str, mode: str):
    """skip_existing filter shared by the seam-free modes: a tile is done
    when both stitched outputs exist (resume semantics — the reference
    recomputes every tile after an interruption)."""
    kept = [t for t in tiles
            if not (os.path.exists(os.path.join(save_path, t, "stitched_sr.png"))
                    and os.path.exists(os.path.join(save_path, t, "stitched_s2.png")))]
    if len(kept) != len(tiles):
        print(f"skip_existing: {len(tiles) - len(kept)} {mode} tiles already "
              f"stitched, {len(kept)} to compute.")
    return kept


def stitch_tiles(data_dir: str, save_path: str, rank: int = 0, world: int = 1,
                 skip_existing: bool = False) -> None:
    import glob as _glob

    # Derive tiles exactly like run_inference(grid_naming=True) does — from
    # the dirnames of the recursive png glob — so the multi-process tile
    # shards line up: each process stitches precisely the tiles whose chunks
    # it super-resolved (a png-less subdirectory must not shift the split).
    pngs = _glob.glob(os.path.join(data_dir, "**", "*.png"), recursive=True)
    tile_dirs = sorted({os.path.dirname(p) for p in pngs})
    if world > 1:
        from .infer import shard_contiguous

        tile_dirs = [tile_dirs[i] for i in shard_contiguous(len(tile_dirs), rank, world)]
    for tile_dir in tile_dirs:
        tile = os.path.basename(tile_dir)
        if skip_existing and \
                os.path.exists(os.path.join(save_path, tile, "stitched_sr.png")) and \
                os.path.exists(os.path.join(save_path, tile, "stitched_s2.png")):
            continue
        print("Stitching images for tile", tile)
        if len(os.listdir(tile_dir)) < 256:
            print(f"Tile {tile} contains less than 256 chunks, cannot stitch. Skipping.")
            continue
        sr_dir = os.path.join(save_path, tile)
        stitch(sr_dir, 2048, os.path.join(save_path, tile, "stitched_sr.png"))
        stitch(tile_dir, 512, os.path.join(save_path, tile, "stitched_s2.png"), sentinel2=True)


def default_spatial_shards(rows: int) -> int:
    """Largest power of 2 dividing both the local device count and `rows` —
    the whole-tile default when `spatial_shards` is unset. Shared with the
    warmup CLI so the pre-compiled program matches the real launch."""
    n = jax.local_device_count()
    spatial = 1
    while (spatial * 2 <= n and n % (spatial * 2) == 0
           and rows % (spatial * 2) == 0):
        spatial *= 2
    return spatial


def _discover_tiles(data_dir: str, grid_size: int, rank: int, world: int,
                    mode: str, detail: str):
    """Tile dirs with a full chunk grid, contiguously sharded over processes.

    Shared by whole-tile and halo modes so filtering/sharding cannot diverge
    between them."""
    tiles = []
    for tile in sorted(os.listdir(data_dir)):
        tile_dir = os.path.join(data_dir, tile)
        if not os.path.isdir(tile_dir):
            continue
        if len(os.listdir(tile_dir)) < grid_size * grid_size:
            print(f"Tile {tile} contains less than {grid_size * grid_size} "
                  "chunks, cannot super-resolve whole. Skipping.")
            continue
        tiles.append(tile)
    if world > 1:
        from .infer import shard_contiguous

        n_total = len(tiles)
        tiles = [tiles[i] for i in shard_contiguous(n_total, rank, world)]
        print(f"Process {rank}/{world}: {mode} inference on {len(tiles)} of "
              f"{n_total} tiles ({detail}).")
    else:
        print(f"{mode} inference on {len(tiles)} tiles ({detail}).")
    return tiles


def _build_index_map(data_dir: str):
    """path -> global corpus index over the sorted recursive png glob.

    Frame selection must match chunked mode exactly: run_inference seeds each
    chunk's RNG by this index, and BOTH seam-free modes must reproduce it."""
    import glob as _glob

    all_pngs = sorted(_glob.glob(os.path.join(data_dir, "**", "*.png"),
                                 recursive=True))
    return {p: i for i, p in enumerate(all_pngs)}


def run_whole_tile(opt: dict, rank: int = 0, world: int = 1,
                   force: bool = False) -> int:
    """One generator pass per WHOLE tile, spatially sharded over the mesh."""
    from .utils.model_utils import uses_3d_input

    data_dir = opt["data_dir"]
    save_path = opt["save_path"]
    n_lr_images = int(opt["n_lr_images"])
    seed = int(opt.get("manual_seed", 0) or 0)
    grid_size = int(opt.get("grid_size", 16))
    spatial = int(opt.get("spatial_shards", 0))
    if spatial <= 0:
        spatial = default_spatial_shards(grid_size * 32)

    use_3d = uses_3d_input(opt["network_g"]["type"])
    if use_3d:
        # the config's output_size targets ONE 32x32 chunk; the whole tile
        # scales it by grid_size (the bilinear head is size-parametric)
        g_opt = dict(opt["network_g"])
        g_opt["output_size"] = grid_size * 32 * int(opt["scale"])
        opt = {**opt, "network_g": g_opt}
    model = build_network(opt)
    variables = load_infer_variables(opt, model, n_lr_images, use_3d=use_3d)
    engine = InferenceEngine(
        model, variables, batch_size=int(opt.get("batch_size", 1)),
        use_3d=use_3d, n_frames=n_lr_images,
        matmul_precision=str(opt.get("matmul_precision", "highest")),
        spatial_shards=spatial,
    )

    tiles = _discover_tiles(
        data_dir, grid_size, rank, world, "Whole-tile",
        f"spatial_shards={spatial}, batch={engine.batch_size}")
    index_map = _build_index_map(data_dir)
    if opt.get("skip_existing"):
        # frame RNG is salted by global corpus index (index_map): a corpus
        # mutated between interrupt and resume shifts later salts, so the
        # resumed tiles would differ from an uninterrupted run — guard first
        from .infer import guard_corpus_manifest

        guard_corpus_manifest(save_path, list(index_map), data_dir,
                              rank=rank, force=force)
        tiles = _skip_done_tiles(tiles, save_path, "whole-tile")

    from concurrent.futures import ThreadPoolExecutor

    from .inference import BoundedWriter, batched, prefetch_map

    pool = ThreadPoolExecutor(max_workers=max(2, os.cpu_count() or 1))
    writer = BoundedWriter(pool, max_pending=8)
    groups = batched(tiles, engine.batch_size)
    previews: list = []

    def assemble_group(g):
        return [assemble_tile(os.path.join(data_dir, t), n_lr_images,
                              seed, grid_size, index_map=index_map) for t in g]

    def produce():
        for pairs in prefetch_map(pool, assemble_group, groups, depth=3):
            previews.append([p for _, p in pairs])
            yield np.stack([c for c, _ in pairs])

    count = 0
    for gi, outputs in enumerate(engine.run_many(produce())):
        for k, tile in enumerate(groups[gi]):
            out_dir = os.path.join(save_path, tile)
            writer.submit(write_png,
                          os.path.join(out_dir, "stitched_sr.png"), outputs[k])
            writer.submit(write_png,
                          os.path.join(out_dir, "stitched_s2.png"),
                          previews[gi][k])
            count += 1
        previews[gi] = None  # release; the writer future holds its own ref
    writer.drain()
    pool.shutdown(wait=True)
    print(f"Done: {count} whole tiles.")
    return count


def _window_starts(L: int, win: int, stride: int):
    """Sliding-window start offsets covering [0, L), last window edge-aligned."""
    if win >= L:
        return [0]
    starts = list(range(0, L - win + 1, stride))
    if starts[-1] != L - win:
        starts.append(L - win)
    return starts


def _responsibility(starts, win: int, L: int):
    """[(lo, hi)] output rows each window owns: overlap midpoints, edges to
    the tile border. Consecutive windows at stride = win - 2*halo meet at
    exactly halo pixels inside each window — every owned pixel has >= halo
    rows of real context on every non-border side."""
    bounds = [0]
    for a, b in zip(starts, starts[1:]):
        bounds.append((a + win + b) // 2)
    bounds.append(L)
    return list(zip(bounds[:-1], bounds[1:]))


def run_halo_tiles(opt: dict, rank: int = 0, world: int = 1,
                   force: bool = False) -> int:
    """Seam-free chunked inference via overlapping 32x32 windows
    (VERDICT r2 next #8).

    Measured on v5e (scripts/halo_bench.py, device time): the XLA conv
    emitter runs [*, 32, 32, C] batches ~2-3x faster per pixel than ANY other
    spatial extent (32*32 = 8*128 fills the vector tiling exactly) — large
    halo pieces (64..512 px) all land at 18-33% of chunked throughput, the
    same regime as whole-tile's 30%. The fastest seam-free decomposition is
    therefore sliding windows of the SAME 32x32 shape as chunked inference,
    overlapped by 2*halo pixels. Quality floor is per-NET (receptive-field
    tail): on the production 23-block RRDBNet, halo=6 measures <=1 uint8
    level on ~3e-5 of pixels vs whole-tile (bit-clean) at 40% of chunked
    throughput, while halo=4 reaches 8 levels on 0.25% of pixels at 57%.
    The default is the bit-clean 6; set `halo: 4` to trade the last bit of
    fidelity for 1.4x speed (tiny test nets measure <=1 level at 4).

    Each output pixel is owned by the window where it has >= halo context on
    every non-border side (overlap midpoints); windows at the tile border are
    edge-aligned so the conv's own zero padding applies there exactly as in a
    whole-tile pass (explicit zero-fill would bias-contaminate instead —
    measured ~190-level errors). Outputs stitched_{sr,s2}.png per tile; the
    reference's seam artifact (zero-pad context at every interior chunk edge,
    ssr/infer_grid.py:70-85) does not occur.

    `halo` (default 6) and `halo_window` (default 32) are configurable; 4-D
    (frame-stacked conv) families only — use whole_tile for 5-D models.
    """
    from .utils.model_utils import uses_3d_input

    data_dir = opt["data_dir"]
    save_path = opt["save_path"]
    n_lr_images = int(opt["n_lr_images"])
    seed = int(opt.get("manual_seed", 0) or 0)
    grid_size = int(opt.get("grid_size", 16))
    scale = int(opt.get("scale", 4))
    halo = opt.get("halo", 6)
    # `halo: true` in YAML (by analogy with `whole_tile: true`) means "use
    # the default width" — int(True) would silently run halo=1, below the
    # quality floor
    halo = 6 if halo is True else int(halo)
    L = grid_size * 32
    win = min(int(opt.get("halo_window", 32)), L)
    if win <= 2 * halo:
        raise ValueError(f"halo_window={win} must exceed 2*halo={2 * halo}")

    if uses_3d_input(opt["network_g"]["type"]):
        raise ValueError(
            "halo mode supports the 4-D conv families (e.g. SSR_RRDBNet); "
            "use whole_tile: true for the 5-D (use_3d) models")
    model = build_network(opt)
    variables = load_infer_variables(opt, model, n_lr_images, use_3d=False)

    starts = _window_starts(L, win, win - 2 * halo)
    owns = _responsibility(starts, win, L)
    n_win = len(starts) ** 2
    engine = InferenceEngine(
        model, variables, batch_size=int(opt.get("batch_size", min(256, n_win))),
        use_3d=False, n_frames=n_lr_images,
        matmul_precision=str(opt.get("matmul_precision", "highest")),
    )

    tiles = _discover_tiles(
        data_dir, grid_size, rank, world, "Halo",
        f"halo={halo}, window={win}, {n_win} windows/tile, "
        f"batch={engine.batch_size}")
    index_map = _build_index_map(data_dir)
    if opt.get("skip_existing"):
        # same index-salted frame RNG as whole-tile mode: guard the global
        # enumeration before skipping anything
        from .infer import guard_corpus_manifest

        guard_corpus_manifest(save_path, list(index_map), data_dir,
                              rank=rank, force=force)
        tiles = _skip_done_tiles(tiles, save_path, "halo")

    from concurrent.futures import ThreadPoolExecutor

    from .inference import BoundedWriter, prefetch_map

    pool = ThreadPoolExecutor(max_workers=max(2, os.cpu_count() or 1))
    writer = BoundedWriter(pool, max_pending=8)
    previews: list = []

    coords = [(si, sj) for si in starts for sj in starts]

    def assemble(tile):
        canvas, preview = assemble_tile(os.path.join(data_dir, tile),
                                        n_lr_images, seed, grid_size,
                                        index_map=index_map)
        return np.stack([canvas[si:si + win, sj:sj + win]
                         for si, sj in coords]), preview

    def produce():
        for windows, preview in prefetch_map(pool, assemble, tiles, depth=3):
            previews.append(preview)
            for k in range(0, n_win, engine.batch_size):
                yield windows[k:k + engine.batch_size]

    count = 0
    s = scale
    sr_canvas = None
    placed = 0
    n_side = len(starts)
    for outputs in engine.run_many(produce()):
        for out in outputs:
            if sr_canvas is None:
                sr_canvas = np.empty((L * s, L * s, 3), np.uint8)
            wi, wj = divmod(placed, n_side)
            si, sj = starts[wi], starts[wj]
            (ri0, ri1), (rj0, rj1) = owns[wi], owns[wj]
            sr_canvas[ri0 * s:ri1 * s, rj0 * s:rj1 * s] = \
                out[(ri0 - si) * s:(ri1 - si) * s, (rj0 - sj) * s:(rj1 - sj) * s]
            placed += 1
            if placed == n_win:
                tile = tiles[count]
                out_dir = os.path.join(save_path, tile)
                writer.submit(write_png, os.path.join(out_dir, "stitched_sr.png"),
                              sr_canvas)
                writer.submit(write_png, os.path.join(out_dir, "stitched_s2.png"),
                              previews[count])
                previews[count] = None  # release; writer future holds its ref
                count += 1
                sr_canvas, placed = None, 0
    writer.drain()
    pool.shutdown(wait=True)
    print(f"Done: {count} tiles (halo mode).")
    return count


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to the options file.")
    parser.add_argument("--launcher", choices=["none", "jax", "pytorch", "slurm"],
                        default="none", help="'jax' shards tiles across "
                        "jax.distributed processes (contiguous blocks).")
    parser.add_argument("--force", action="store_true",
                        help="with skip_existing: accept a corpus that changed "
                        "since save_path's manifest was written (re-enumerate).")
    args = parser.parse_args(argv)
    from .utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    from .utils.options import init_distributed

    rank, world = init_distributed(args.launcher)
    opt = yaml_load(args.opt)
    report_lint(opt, "infer", rank=rank)
    if opt.get("whole_tile"):
        run_whole_tile(opt, rank=rank, world=world, force=args.force)
        return
    if opt.get("halo"):
        run_halo_tiles(opt, rank=rank, world=world, force=args.force)
        return
    run_inference(opt, save_lr=False, grid_naming=True, rank=rank, world=world,
                  force=args.force)
    stitch_tiles(opt["data_dir"], opt["save_path"], rank=rank, world=world,
                 skip_existing=bool(opt.get("skip_existing")))


if __name__ == "__main__":
    main()
