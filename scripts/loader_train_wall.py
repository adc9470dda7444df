"""End-to-end wall rate of the REAL data path feeding the REAL GAN step.

bench.py --train times the jitted step against one fixed in-memory numpy
batch; this script closes the loop the round-3 rework changed: synthetic
S2-NAIP pngs on disk -> S2NAIPDataset -> PrefetchLoader (order-preserving
re-sequencer + O(1) sampler fast-forward) -> SSRESRGANModel.train_iter.
The steady-state samples/s here vs bench.py --train's number is the
loader's measured cost on TPU wall throughput (queued in BENCH_NOTES
"Round-3 (late): order-preserving train loader").

Usage: python scripts/loader_train_wall.py [iters=40] [workers=2] [batch=32]
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    frames = 8

    from satlas_sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from satlas_sr_tpu.data import build_dataset, build_train_loader
    from satlas_sr_tpu.models import build_model
    from satlas_sr_tpu.utils.imgio import write_png

    root = tempfile.mkdtemp(prefix="loader_train_wall_")
    rng = np.random.RandomState(0)
    for c in range(64):
        chip = f"{1000 + c}_{2000 + c}"
        write_png(os.path.join(root, "naip", chip, f"{chip}.png"),
                  (rng.rand(128, 128, 3) * 254 + 1).astype(np.uint8))
        write_png(os.path.join(root, "sentinel2", chip, "tci.png"),
                  (rng.rand(frames * 32, 32, 3) * 254 + 1).astype(np.uint8))

    ds_opt = {
        "name": "wall", "type": "S2NAIPDataset", "phase": "train", "scale": 4,
        "sentinel2_path": os.path.join(root, "sentinel2"),
        "naip_path": os.path.join(root, "naip"),
        "n_s2_images": frames, "use_shuffle": True,
        "batch_size_per_gpu": batch, "num_worker_per_gpu": workers,
    }

    # The production GAN step at bench.py --train's exact shapes/options so
    # the two numbers are directly comparable.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    opt = None
    # reuse bench.train_bench's opt dict by rebuilding it here via the same
    # builder path (bench keeps it inline; mirror the production shapes)
    opt = {
        "name": "loader_wall", "model_type": "SSRESRGANModel", "scale": 4,
        "manual_seed": 0, "is_train": True,
        "l1_gt_usm": True, "percep_gt_usm": True, "gan_gt_usm": False,
        "feed_disc_lr": True, "compute_dtype": "bfloat16",
        "datasets": {"train": {"n_s2_images": frames}},
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 24, "num_out_ch": 3,
                      "num_feat": 64, "num_block": 23, "num_grow_ch": 32},
        "network_d": {"type": "SSR_UNetDiscriminatorSN", "num_in_ch": 27,
                      "num_feat": 64},
        "path": {},
        "train": {
            "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
            "optim_d": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [400000],
                          "gamma": 0.5},
            "total_iter": 10, "warmup_iter": -1,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                          "reduction": "mean"},
            "perceptual_opt": {
                "type": "PerceptualLoss",
                "layer_weights": {"conv1_2": 0.1, "conv2_2": 0.1,
                                  "conv3_4": 1.0, "conv4_4": 1.0,
                                  "conv5_4": 1.0},
                "vgg_type": "vgg19", "use_input_norm": True,
                "perceptual_weight": 1.0, "style_weight": 0,
                "range_norm": False, "criterion": "l1",
            },
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                        "real_label_val": 1.0, "fake_label_val": 0.0,
                        "loss_weight": 0.1},
            "net_d_iters": 1, "net_d_init_iters": 0,
        },
        "logger": {"print_freq": 1, "save_checkpoint_freq": 100000},
    }
    del bench

    try:
        import jax

        ds = build_dataset(ds_opt)
        loader = build_train_loader(ds, ds_opt, seed=0, rank=0, world_size=1)
        model = build_model(opt)
        it = iter(loader)

        print("compiling train step ...", flush=True)
        logs = model.train_iter(next(it), 1)
        jax.block_until_ready(logs)

        # warm the prefetch queue, then time loader->step end to end.
        # Best-of-3 windows, same policy as bench.py --train (the hosted
        # tunnel shows multi-second stalls on bad days; see BENCH_NOTES).
        best = 0.0
        step = 2
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                logs = model.train_iter(next(it), step)
                step += 1
            jax.block_until_ready(logs)
            best = max(best, iters * batch / (time.perf_counter() - t0))
        print(f"loader->GAN-step wall rate: {best:.1f} samples/s "
              f"(batch={batch}, workers={workers}, bf16, best of 3x{iters})",
              flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
