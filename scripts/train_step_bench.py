"""Benchmark the full-size ESRGAN train step on the real chip.

Production shapes: RRDBNet 64/23/32 over 8-frame input, U-Net SN
discriminator 64-feat, full VGG19 perceptual taps, batch per chip 32.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    # remat -> whole-block; remat=rdb / remat=conv_outs pick the round-4
    # targeted policies (archs/rrdbnet.py _ScannedRRDB docstring)
    remat = False
    for a in sys.argv[3:]:
        if a == "remat":
            remat = True
        elif a.startswith("remat="):
            remat = a.split("=", 1)[1]
    # 'gated': net_d_init_iters far in the future -> every measured step takes
    # the lax.cond SKIP branch (G forward only, no G backward/step). Compares
    # against the default always-update config to quantify the gate's cost.
    gated = "gated" in sys.argv[3:]
    # accumN: N micro-batches of `batch` rows per optimizer step (effective
    # batch = N * batch at the activation footprint of `batch`)
    accum = 1
    for a in sys.argv[3:]:
        if a.startswith("accum"):
            accum = int(a[len("accum"):] or 2)

    from satlas_sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    from satlas_sr_tpu.models import build_model

    opt = {
        "name": "bench", "model_type": "SSRESRGANModel", "scale": 4,
        "manual_seed": 0, "is_train": True,
        "l1_gt_usm": True, "percep_gt_usm": True, "gan_gt_usm": False,
        "feed_disc_lr": True, "compute_dtype": dtype,
        "datasets": {"train": {"n_s2_images": 8}},
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 24, "num_out_ch": 3,
                      "num_feat": 64, "num_block": 23, "num_grow_ch": 32,
                      "remat": remat},
        "network_d": {"type": "SSR_UNetDiscriminatorSN", "num_in_ch": 27,
                      "num_feat": 64},
        "path": {},
        "train": {
            "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
            "optim_d": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [400000], "gamma": 0.5},
            "total_iter": 10, "warmup_iter": -1,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0, "reduction": "mean"},
            "perceptual_opt": {
                "type": "PerceptualLoss",
                "layer_weights": {"conv1_2": 0.1, "conv2_2": 0.1, "conv3_4": 1.0,
                                  "conv4_4": 1.0, "conv5_4": 1.0},
                "vgg_type": "vgg19", "use_input_norm": True,
                "perceptual_weight": 1.0, "style_weight": 0,
                "range_norm": False, "criterion": "l1",
            },
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                        "real_label_val": 1.0, "fake_label_val": 0.0,
                        "loss_weight": 0.1},
            "net_d_iters": 1, "net_d_init_iters": 1_000_000_000 if gated else 0,
            "accum_steps": accum,
        },
        "logger": {"print_freq": 1, "save_checkpoint_freq": 100000},
    }
    model = build_model(opt)
    rng = np.random.RandomState(0)
    batch_np = {
        "lr": (rng.rand(batch * accum, 32, 32, 24) * 255).astype(np.uint8),
        "hr": (rng.rand(batch * accum, 128, 128, 3) * 255).astype(np.uint8),
    }
    print(f"compiling train step (batch={batch}, {dtype}, remat={remat}, accum={accum})...",
          flush=True)
    t0 = time.perf_counter()
    logs = model.train_iter(batch_np, 1)
    print(f"compile+step1: {time.perf_counter() - t0:.1f}s "
          f"l_g_pix={logs['l_g_pix']:.4f}", flush=True)
    import jax

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        iters = 10
        for i in range(iters):
            logs = model.train_iter(batch_np, 2 + i)
        jax.block_until_ready(logs)  # logs are lazy device scalars now
        dt = time.perf_counter() - t0
        best = max(best, iters / dt)
    print(f"steady state: {best:.2f} steps/s = {best * batch * accum:.1f} samples/s "
          f"({1000 / best:.0f} ms/step)", flush=True)
    print("logs:", {k: round(v, 4) for k, v in sorted(logs.items())})

    if "profile" in sys.argv[3:]:
        out = "/tmp/train_profile"
        with jax.profiler.trace(out):
            for i in range(3):
                logs = model.train_iter(batch_np, 100 + i)
            jax.block_until_ready(logs)
        print("xplane trace written to", out, flush=True)


if __name__ == "__main__":
    main()
