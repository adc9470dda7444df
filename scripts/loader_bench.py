"""Training data-pipeline feed rate: PrefetchLoader samples/s on this host.

Builds a synthetic S2-NAIP tree (production-shaped pngs: 128x128 NAIP chips,
[T*32, 32, 3] S2 series), then measures the train loader's steady-state
samples/s — the host-side ceiling on GAN-step throughput (the v5e chip
consumes ~205 samples/s at batch 32 bf16; see BENCH_NOTES.md). The loader
parallelises across num_worker_per_gpu threads with the GIL-free native
decoder, so the per-core number scales ~linearly with host cores.

Usage: python scripts/loader_bench.py [chips=64] [frames=8] [workers=4] [batch=32]
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main():
    chips = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    from satlas_sr_tpu.data import build_dataset, build_train_loader
    from satlas_sr_tpu.utils.imgio import write_png

    root = tempfile.mkdtemp(prefix="loader_bench_")
    rng = np.random.RandomState(0)
    for c in range(chips):
        chip = f"{1000 + c}_{2000 + c}"
        write_png(os.path.join(root, "naip", chip, f"{chip}.png"),
                  (rng.rand(128, 128, 3) * 254 + 1).astype(np.uint8))
        write_png(os.path.join(root, "sentinel2", chip, "tci.png"),
                  (rng.rand(frames * 32, 32, 3) * 254 + 1).astype(np.uint8))

    ds_opt = {
        "name": "bench", "type": "S2NAIPDataset", "phase": "train", "scale": 4,
        "sentinel2_path": os.path.join(root, "sentinel2"),
        "naip_path": os.path.join(root, "naip"),
        "n_s2_images": frames, "use_shuffle": True,
        "batch_size_per_gpu": batch, "num_worker_per_gpu": workers,
    }
    try:
        ds = build_dataset(ds_opt)
        loader = build_train_loader(ds, ds_opt, seed=0, rank=0, world_size=1)
        it = iter(loader)
        for _ in range(3):  # warm caches / fill the prefetch queue
            next(it)
        n_batches = 30
        t0 = time.perf_counter()
        for _ in range(n_batches):
            b = next(it)
        dt = time.perf_counter() - t0
        rate = n_batches * batch / dt
        print(f"chips={chips} frames={frames} workers={workers} batch={batch}: "
              f"{rate:.1f} samples/s host feed "
              f"({rate / max(workers, 1):.1f}/worker-thread; lr {b['lr'].shape})",
              flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
