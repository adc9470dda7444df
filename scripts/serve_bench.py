"""Load-test the serving daemon: sustained requests/s through HTTP.

Spins the server in-process on the current JAX platform, then drives it
with a closed-loop client pool (each worker posts, waits, posts again).
Reports throughput, latency quantiles and the realized batch fill — the
number that shows micro-batching actually coalesces under load.

On this 1-core tunnel host the result is HOST-bound (HTTP + PNG codec on
one core shared with the server threads); a production host with real
cores colocated with the TPU pays neither. Run with
JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu for a device-free smoke.

Usage: python scripts/serve_bench.py [--requests 512] [--concurrency 64]
       [--batch_size 64] [--raw]
"""

import argparse
import os
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=512)
    ap.add_argument("--concurrency", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--max_wait_ms", type=float, default=8.0)
    ap.add_argument("--n_frames", type=int, default=8)
    ap.add_argument("--blocks", type=int, default=23,
                    help="RRDB blocks (23 = production esrgan_8S2 shape)")
    ap.add_argument("--raw", action="store_true",
                    help="request raw bytes instead of PNG responses")
    args = ap.parse_args()

    from satlas_sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from satlas_sr_tpu.serve import build_server
    from satlas_sr_tpu.utils.imgio import encode_png_bytes

    opt = {
        "n_lr_images": args.n_frames,
        "scale": 4,
        "batch_size": args.batch_size,
        "manual_seed": 0,
        "compute_dtype": "bfloat16",
        "matmul_precision": "default",
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": args.n_frames * 3,
                      "num_out_ch": 3, "num_feat": 64,
                      "num_block": args.blocks, "num_grow_ch": 32},
        "path": {},
    }
    print("building + warming server (cold compile can take minutes) ...",
          flush=True)
    server, batcher = build_server(opt, host="127.0.0.1", port=0,
                                   max_wait_ms=args.max_wait_ms,
                                   max_queue=4 * args.concurrency,
                                   timeout_s=300.0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}/v1/sr"

    rng = np.random.RandomState(0)
    bodies = [encode_png_bytes(
        (rng.rand(args.n_frames * 32, 32, 3) * 254 + 1).astype(np.uint8))
        for _ in range(8)]

    def post(i):
        req = urllib.request.Request(url, data=bodies[i % len(bodies)],
                                     method="POST")
        if args.raw:
            req.add_header("Accept", "application/octet-stream")
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.status == 200
            resp.read()

    with ThreadPoolExecutor(max_workers=args.concurrency) as pool:
        list(pool.map(post, range(min(args.concurrency, 16))))  # warm client path
        # Exclude warm-up from the reported numbers: its low-concurrency
        # posts skew latency quantiles and dilute the mean batch fill.
        server.ctx["stats"].reset()
        batcher.batches_total = 0
        batcher.images_total = 0
        t0 = time.perf_counter()
        list(pool.map(post, range(args.requests)))
        dt = time.perf_counter() - t0

    stats = server.ctx["stats"].snapshot()
    fill = batcher.images_total / max(1, batcher.batches_total)
    print(f"{args.requests} requests, concurrency {args.concurrency}, "
          f"{'raw' if args.raw else 'png'} responses:")
    print(f"  throughput: {args.requests / dt:.1f} req/s "
          f"({dt * 1000 / args.requests:.2f} ms/req amortized)")
    print(f"  latency p50/p95: {stats['latency_ms']['p50']} / "
          f"{stats['latency_ms']['p95']} ms")
    print(f"  batches: {batcher.batches_total}, mean fill {fill:.1f} "
          f"/ {batcher.engine.batch_size}")
    server.shutdown()
    server.server_close()
    batcher.close()


if __name__ == "__main__":
    main()
