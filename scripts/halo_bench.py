"""Measure halo-chunked inference throughput vs the chunked baseline.

VERDICT r2 next #8 'done' criterion: seam-free halo mode must land within
~15% of chunked tiles/s. Production shapes: esrgan_8S2 RRDBNet (24 in-ch,
64 feat, 23 blocks), 512x512-LR tiles (16x16 grid of 32x32 chunks), scale 4.

- chunked: batches of 256 32x32 chunks (the bench.py headline path)
- halo:    4 pieces of (256+8)=264 per tile (corner pieces — a 2x2 split has
           no interior pieces), cropped to 256-interiors
Analytic overhead: 4*264^2 / 512^2 = 1.063x input pixels.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main():
    from satlas_sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from satlas_sr_tpu.inference import InferenceEngine
    from satlas_sr_tpu.infer_grid import _halo_pieces
    from satlas_sr_tpu.utils.model_utils import build_network
    from satlas_sr_tpu.infer import load_infer_variables

    halo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    piece = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_tiles = 8

    opt = {
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 24, "num_out_ch": 3,
                      "scale": 4, "num_feat": 64, "num_block": 23,
                      "num_grow_ch": 32},
        "scale": 4, "path": {}, "n_lr_images": 8, "compute_dtype": "bfloat16",
    }
    model = build_network(opt)
    variables = load_infer_variables(opt, model, 8, use_3d=False)
    rng = np.random.RandomState(0)
    canvases = [rng.randint(0, 256, (512, 512, 24)).astype(np.uint8)
                for _ in range(n_tiles)]

    # -- chunked baseline: 256 chunks/tile at batch 256
    eng_c = InferenceEngine(model, variables, batch_size=256,
                            matmul_precision="default")
    chunks = [c.reshape(16, 32, 16, 32, 24).transpose(0, 2, 1, 3, 4)
              .reshape(256, 32, 32, 24) for c in canvases]
    eng_c.run(chunks[0])  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        for ch in chunks:
            y = eng_c.run(ch)
    dt = time.perf_counter() - t0
    chunked_tps = 3 * n_tiles / dt
    print(f"chunked: {chunked_tps:.2f} tiles/s ({chunked_tps * 16:.0f} chunk-img/s)")

    # -- halo mode: per-tile shape-grouped piece batches
    n_side = 512 // piece
    eng_h = InferenceEngine(model, variables, batch_size=n_side * n_side,
                            matmul_precision="default")
    tile_groups = []
    for c in canvases:
        groups = {}
        for k, (arr, oi, oj) in enumerate(_halo_pieces(c, piece, halo)):
            groups.setdefault(arr.shape, []).append(arr)
        tile_groups.append([np.stack(v) for v in groups.values()])
    for g in tile_groups[0]:
        eng_h.run(g)  # compile each shape
    t0 = time.perf_counter()
    for _ in range(3):
        for gs in tile_groups:
            for g in gs:
                y = eng_h.run(g)
    dt = time.perf_counter() - t0
    halo_tps = 3 * n_tiles / dt
    print(f"halo (h={halo}, piece={piece}): {halo_tps:.2f} tiles/s "
          f"= {100 * halo_tps / chunked_tps:.1f}% of chunked")


if __name__ == "__main__":
    main()
