"""Tile-grid inference + stitching CLI.

Parity with ssr/infer_grid.py: per-chunk inference preserving
`{tile}/{i}_{j}.png` naming, then for every tile with all 256 chunks, stitch
the SR outputs into a 2048x2048 png and the first S2 frames into 512x512
(ssr/infer_grid.py:70-85).

The per-chunk loop — "embarrassingly parallel" per SURVEY.md §3.4 — runs as
device-sharded batches through the same InferenceEngine as infer.py.
"""

from __future__ import annotations

import argparse
import os

from .infer import run_inference
from .utils.infer_utils import stitch
from .utils.options import yaml_load


def stitch_tiles(data_dir: str, save_path: str) -> None:
    for tile in sorted(os.listdir(data_dir)):
        tile_dir = os.path.join(data_dir, tile)
        if not os.path.isdir(tile_dir):
            continue
        print("Stitching images for tile", tile)
        if len(os.listdir(tile_dir)) < 256:
            print(f"Tile {tile} contains less than 256 chunks, cannot stitch. Skipping.")
            continue
        sr_dir = os.path.join(save_path, tile)
        stitch(sr_dir, 2048, os.path.join(save_path, tile, "stitched_sr.png"))
        stitch(tile_dir, 512, os.path.join(save_path, tile, "stitched_s2.png"), sentinel2=True)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to the options file.")
    args = parser.parse_args(argv)
    from .utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    opt = yaml_load(args.opt)
    run_inference(opt, save_lr=False, grid_naming=True)
    stitch_tiles(opt["data_dir"], opt["save_path"])


if __name__ == "__main__":
    main()
