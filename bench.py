"""Benchmark: 512x512 SR tiles/sec/chip on the flagship esrgan_8S2 model.

The BASELINE.json headline: a 512x512 SR output tile = a 4x4 grid of 128x128
chunk outputs (16 chunk inferences of [32, 32, 24] channel-stacked inputs).
Measures steady-state throughput of the jitted uint8->uint8 inference program
(bfloat16 compute) on the available accelerator, and compares against a
recorded host-CPU float32 baseline (bench_baseline.json; measured once on this
machine and cached).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra diagnostics (bf16-vs-f32 PSNR agreement) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "bench_baseline.json")
CHUNKS_PER_TILE = 16  # 4x4 grid of 128x128 outputs = one 512x512 tile


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_forward(dtype_name: str, precision: str):
    import jax
    import jax.numpy as jnp

    from satlas_sr_tpu.archs import RRDBNet

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_name]
    model = RRDBNet(num_in_ch=24, num_out_ch=3, scale=4, num_feat=64,
                    num_block=23, num_grow_ch=32, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 24)))
    if dtype != jnp.float32:
        # store weights in the compute dtype: halves weight HBM reads
        variables = jax.tree.map(lambda v: v.astype(dtype), variables)
    variables = jax.device_put(variables)

    @jax.jit
    def forward(x_uint8):
        with jax.default_matmul_precision(precision):
            x = x_uint8.astype(dtype) / jnp.asarray(255.0, dtype)
            y = model.apply(variables, x)
            return (jnp.clip(y.astype(jnp.float32), 0.0, 1.0) * 255.0).astype(jnp.uint8)

    return forward


def measure_imgs_per_sec(forward, batch: int, iters: int, warmup: int = 2,
                         trials: int = 3) -> float:
    """Steady-state device throughput: input device-resident (a real input
    pipeline overlaps transfers with compute); best-of-N to shed tunnel noise."""
    import jax

    rng = np.random.RandomState(0)
    x = jax.device_put((rng.rand(batch, 32, 32, 24) * 255).astype(np.uint8))
    for _ in range(warmup):
        forward(x).block_until_ready()
    best = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = forward(x)
        y.block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    return best


def psnr_agreement(forward_fast, forward_exact, batch: int = 8) -> float:
    """PSNR between bf16 and f32 outputs — parity sanity for the fast path."""
    rng = np.random.RandomState(1)
    x = (rng.rand(batch, 32, 32, 24) * 255).astype(np.uint8)
    a = np.asarray(forward_fast(x)).astype(np.float64)
    b = np.asarray(forward_exact(x)).astype(np.float64)
    mse = np.mean((a - b) ** 2)
    return float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


def cpu_baseline() -> float:
    """Host-CPU float32 tiles/sec (measured once, cached in-repo)."""
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["cpu_tiles_per_sec"]
    log("measuring host-CPU float32 baseline (one-time)...")
    import subprocess

    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "os.environ['JAX_PLATFORM_NAME']='cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "import sys; sys.path.insert(0, %r)\n"
        "from bench import build_forward, measure_imgs_per_sec\n"
        "fwd = build_forward('float32', 'highest')\n"
        "ips = measure_imgs_per_sec(fwd, batch=4, iters=2, warmup=1)\n"
        "print('CPU_IPS', ips)\n" % REPO
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO,
        timeout=3000,
    )
    ips = None
    for line in out.stdout.splitlines():
        if line.startswith("CPU_IPS"):
            ips = float(line.split()[1])
    if ips is None:
        log("CPU baseline failed:", out.stdout[-500:], out.stderr[-2000:])
        return float("nan")
    tiles = ips / CHUNKS_PER_TILE
    with open(BASELINE_FILE, "w") as f:
        json.dump(
            {"cpu_tiles_per_sec": tiles, "cpu_imgs_per_sec": ips,
             "note": "host CPU, float32, jax CPU backend, esrgan_8S2-shaped RRDBNet"},
            f, indent=1,
        )
    return tiles


def train_bench(batch: int, iters: int = 5, trials: int = 5) -> float:
    # trials=5 (was 3): the hosted tunnel shows sporadic multi-second
    # stalls on bad days (BENCH_NOTES "Round-4 bench refresh": p50 RTT
    # 31 ms with a 78 s outlier); best-of-N needs enough windows to
    # sample around them. Costs ~3 s of extra device time.
    """Full ESRGAN GAN step samples/s (G fwd/bwd + VGG percep + D fwd/bwd +
    spectral norm + EMA + both optimizers), bf16, lazy logs."""
    import jax

    from satlas_sr_tpu.models import build_model

    opt = {
        "name": "bench_train", "model_type": "SSRESRGANModel", "scale": 4,
        "manual_seed": 0, "is_train": True,
        "l1_gt_usm": True, "percep_gt_usm": True, "gan_gt_usm": False,
        "feed_disc_lr": True, "compute_dtype": "bfloat16",
        "datasets": {"train": {"n_s2_images": 8}},
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 24, "num_out_ch": 3,
                      "num_feat": 64, "num_block": 23, "num_grow_ch": 32},
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
            "net_d_iters": 1, "net_d_init_iters": 0,
        },
        "logger": {"print_freq": 1, "save_checkpoint_freq": 100000},
    }
    model = build_model(opt)
    rng = np.random.RandomState(0)
    batch_np = {
        "lr": (rng.rand(batch, 32, 32, 24) * 255).astype(np.uint8),
        "hr": (rng.rand(batch, 128, 128, 3) * 255).astype(np.uint8),
    }
    logs = model.train_iter(batch_np, 1)  # compile
    jax.block_until_ready(logs)
    best = 0.0
    step = 2
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            logs = model.train_iter(batch_np, step)
            step += 1
        jax.block_until_ready(logs)
        best = max(best, iters * batch / (time.perf_counter() - t0))
    return best


def _stall_watchdog(interval_s: float = 120.0):
    """Backend init through the hosted TPU tunnel blocks in an
    uninterruptible retry loop when the tunnel is down — explain the silence
    on stderr instead of hanging mutely until the harness timeout. The
    daemon thread dies with the process; once devices are up it is
    cancelled."""
    import threading

    done = threading.Event()

    def nag():
        waited = 0
        while not done.wait(interval_s):
            waited += int(interval_s)
            log(f"WATCHDOG: jax backend still initialising after {waited}s "
                f"— TPU tunnel/plugin likely unreachable (bench will proceed "
                f"automatically if it recovers)")

    threading.Thread(target=nag, daemon=True).start()
    return done


def _devices_or_die(timeout_s: float):
    """jax.devices() bounded by a deadline: a dead TPU tunnel blocks backend
    init in an uninterruptible retry loop, and a silent harness timeout
    records NOTHING for the round. Past the deadline, emit the standard JSON
    line with an explicit error field (value 0.0 — unambiguously not a
    measurement) and exit nonzero so the failure is attributable."""
    import threading

    box = {}

    def probe():
        try:
            import jax

            box["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report rather than hang
            box["error"] = str(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in box:
        return box["devices"]
    why = box.get("error", f"backend init exceeded {timeout_s:.0f}s "
                           f"(TPU tunnel/plugin unreachable)")
    log(f"FATAL: {why}")
    print(json.dumps({
        "metric": "512x512 SR tiles/sec/chip (esrgan_8S2)",
        "value": 0.0,
        "unit": "tiles/s",
        "vs_baseline": None,
        "error": why,
    }))
    sys.exit(3)


def main():
    watchdog_done = _stall_watchdog()

    from satlas_sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    backend_timeout = float(os.environ.get("BENCH_BACKEND_TIMEOUT", "900"))
    devices = _devices_or_die(backend_timeout)

    if "--train" in sys.argv:
        watchdog_done.set()
        batch = int(os.environ.get("BENCH_TRAIN_BATCH", "32"))
        sps = train_bench(batch)
        log(f"train step: {sps:.1f} samples/s/chip (batch={batch}, bf16)")
        print(json.dumps({
            "metric": "ESRGAN GAN train samples/sec/chip (batch 32, bf16)",
            "value": round(sps, 1),
            "unit": "samples/s",
            "vs_baseline": None,
        }))
        return

    watchdog_done.set()
    log("devices:", devices)
    on_accel = devices[0].platform != "cpu"

    # batch 256 is the measured throughput optimum on v5e (BENCH_NOTES.md
    # round-2 sweep: 256 > 128 > 512)
    batch = int(os.environ.get("BENCH_BATCH", "256" if on_accel else "8"))
    iters = int(os.environ.get("BENCH_ITERS", "10" if on_accel else "2"))

    forward = build_forward("bfloat16", "default")
    ips = measure_imgs_per_sec(forward, batch, iters)
    tiles_per_sec = ips / CHUNKS_PER_TILE
    log(f"throughput: {ips:.2f} imgs/s = {tiles_per_sec:.2f} 512x512-tiles/s "
        f"(batch={batch}, bf16)")

    if on_accel:
        exact = build_forward("float32", "highest")
        agreement = psnr_agreement(forward, exact)
        log(f"bf16-vs-f32 output PSNR: {agreement:.2f} dB")

    baseline = cpu_baseline()
    vs = tiles_per_sec / baseline if baseline and np.isfinite(baseline) else float("nan")
    print(json.dumps({
        "metric": "512x512 SR tiles/sec/chip (esrgan_8S2)",
        "value": round(tiles_per_sec, 3),
        "unit": "tiles/s",
        "vs_baseline": round(vs, 2) if np.isfinite(vs) else None,
    }))


if __name__ == "__main__":
    main()
