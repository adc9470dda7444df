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


def main():
    import jax

    from satlas_sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    devices = jax.devices()
    log("devices:", devices)
    on_accel = devices[0].platform != "cpu"

    batch = int(os.environ.get("BENCH_BATCH", "128" if on_accel else "8"))
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
