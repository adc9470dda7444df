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
from .utils.options import yaml_load


def stitch_tiles(data_dir: str, save_path: str, rank: int = 0, world: int = 1) -> None:
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


def run_whole_tile(opt: dict, rank: int = 0, world: int = 1) -> int:
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
        print(f"Process {rank}/{world}: whole-tile inference on {len(tiles)} "
              f"of {n_total} tiles (spatial_shards={spatial}, "
              f"batch={engine.batch_size}).")
    else:
        print(f"Whole-tile inference on {len(tiles)} tiles "
              f"(spatial_shards={spatial}, batch={engine.batch_size}).")

    from concurrent.futures import ThreadPoolExecutor

    from .inference import BoundedWriter, batched, prefetch_map

    # frame selection must match chunked mode exactly: the chunked path seeds
    # each chunk's RNG by its GLOBAL index in the sorted recursive glob
    # (run_inference), so build the same index here
    import glob as _glob

    all_pngs = sorted(_glob.glob(os.path.join(data_dir, "**", "*.png"),
                                 recursive=True))
    index_map = {p: i for i, p in enumerate(all_pngs)}

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
    writer.drain()
    pool.shutdown(wait=True)
    print(f"Done: {count} whole tiles.")
    return count


def _halo_pieces(canvas: np.ndarray, piece: int, halo: int):
    """Cut a [L, L, C] canvas into (L/piece)^2 pieces, each carrying up to
    `halo` rows/cols of REAL neighbor context.

    Pieces touching a tile border are SMALLER (no explicit fill): feeding
    zero-filled halo pixels is not the same as the per-layer zero padding a
    SAME conv applies — conv_first turns filled zeros into bias-colored
    features that contaminate the crop (measured: halo-independent errors up
    to ~190 uint8 levels) — while truncating the piece lets the conv's own
    padding act at the true tile border exactly as the whole-tile pass does.
    Interior pieces measure BIT-exact vs whole-tile at halo=8 already.

    Returns [(array, oi, oj)] with (oi, oj) the LR crop offsets of the piece
    interior inside the network output.
    """
    L = canvas.shape[0]
    out = []
    for i0 in range(0, L, piece):
        for j0 in range(0, L, piece):
            si, sj = max(0, i0 - halo), max(0, j0 - halo)
            ei, ej = min(L, i0 + piece + halo), min(L, j0 + piece + halo)
            out.append((canvas[si:ei, sj:ej], i0 - si, j0 - sj))
    return out


def run_halo_tiles(opt: dict, rank: int = 0, world: int = 1) -> int:
    """Seam-free chunked inference at ~chunked throughput (VERDICT r2 next #8).

    Whole-tile mode is seamless but costs ~3.5x (one giant program streams
    feature maps through VMEM). This mode splits each assembled tile into
    `halo_chunk`-sized pieces with a `halo`-pixel input overlap of REAL
    neighbor data, crops each SR output back to the piece interior, and
    reassembles. Pixels further than the generator's effective receptive
    field from a piece edge are identical to the whole-tile pass (halo=8
    measures bit-exact on RRDBNet), and the overlap overhead is
    (1 + 2*halo/halo_chunk)^2 (halo=8, chunk=256 -> 13%). Border pieces are
    smaller rather than padded (see _halo_pieces), giving at most 4 compiled
    shapes. Outputs stitched_{sr,s2}.png per tile like whole-tile mode; the
    reference's seam artifact (zero-pad context at every interior 32x32 chunk
    edge, ssr/infer_grid.py:70-85) does not occur.

    4-D (frame-stacked conv) families only — the 5-D models bake output_size
    into the head; use whole_tile mode for those.
    """
    from .utils.model_utils import uses_3d_input

    data_dir = opt["data_dir"]
    save_path = opt["save_path"]
    n_lr_images = int(opt["n_lr_images"])
    seed = int(opt.get("manual_seed", 0) or 0)
    grid_size = int(opt.get("grid_size", 16))
    scale = int(opt.get("scale", 4))
    halo = int(opt.get("halo", 8))
    L = grid_size * 32
    piece = min(int(opt.get("halo_chunk", 256)), L)
    if L % piece:
        raise ValueError(f"halo_chunk={piece} must divide the tile size {L}")
    per_tile = (L // piece) ** 2
    n_side = L // piece

    if uses_3d_input(opt["network_g"]["type"]):
        raise ValueError(
            "halo mode supports the 4-D conv families (e.g. SSR_RRDBNet); "
            "use whole_tile: true for the 5-D (use_3d) models")
    model = build_network(opt)
    variables = load_infer_variables(opt, model, n_lr_images, use_3d=False)
    engine = InferenceEngine(
        model, variables, batch_size=int(opt.get("batch_size", per_tile)),
        use_3d=False, n_frames=n_lr_images,
        matmul_precision=str(opt.get("matmul_precision", "highest")),
    )

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
        print(f"Process {rank}/{world}: halo inference on {len(tiles)} of "
              f"{n_total} tiles (halo={halo}, chunk={piece}, "
              f"batch={engine.batch_size}).")
    else:
        print(f"Halo inference on {len(tiles)} tiles (halo={halo}, "
              f"chunk={piece}, batch={engine.batch_size}).")

    import glob as _glob
    from concurrent.futures import ThreadPoolExecutor

    from .inference import BoundedWriter, prefetch_map

    all_pngs = sorted(_glob.glob(os.path.join(data_dir, "**", "*.png"),
                                 recursive=True))
    index_map = {p: i for i, p in enumerate(all_pngs)}

    pool = ThreadPoolExecutor(max_workers=max(2, os.cpu_count() or 1))
    writer = BoundedWriter(pool, max_pending=8)

    def assemble(tile):
        canvas, preview = assemble_tile(os.path.join(data_dir, tile),
                                        n_lr_images, seed, grid_size,
                                        index_map=index_map)
        return _halo_pieces(canvas, piece, halo), preview

    count = 0
    s = scale
    for pieces, preview in prefetch_map(pool, assemble, tiles, depth=3):
        # group same-shape pieces (<=4 shapes: corner/edge-h/edge-w/interior)
        # so each group rides one statically-shaped engine batch
        groups: dict = {}
        for k, (arr, oi, oj) in enumerate(pieces):
            groups.setdefault(arr.shape, []).append((k, arr, oi, oj))
        sr_canvas = np.empty((L * s, L * s, 3), np.uint8)
        slices = [grp[gi:gi + engine.batch_size] for grp in groups.values()
                  for gi in range(0, len(grp), engine.batch_size)]
        for items in slices:
            outs = engine.run(np.stack([arr for _, arr, _, _ in items]))
            for (k, _, oi, oj), o in zip(items, outs):
                i0, j0 = divmod(k, n_side)
                sr_canvas[i0 * piece * s:(i0 + 1) * piece * s,
                          j0 * piece * s:(j0 + 1) * piece * s] = \
                    o[oi * s:oi * s + piece * s, oj * s:oj * s + piece * s]
        tile = tiles[count]
        out_dir = os.path.join(save_path, tile)
        writer.submit(write_png, os.path.join(out_dir, "stitched_sr.png"),
                      sr_canvas)
        writer.submit(write_png, os.path.join(out_dir, "stitched_s2.png"),
                      preview)
        count += 1
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
    args = parser.parse_args(argv)
    from .utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    from .utils.options import init_distributed

    rank, world = init_distributed(args.launcher)
    opt = yaml_load(args.opt)
    if opt.get("whole_tile"):
        run_whole_tile(opt, rank=rank, world=world)
        return
    if opt.get("halo"):
        run_halo_tiles(opt, rank=rank, world=world)
        return
    run_inference(opt, save_lr=False, grid_naming=True, rank=rank, world=world)
    stitch_tiles(opt["data_dir"], opt["save_path"], rank=rank, world=world)


if __name__ == "__main__":
    main()
