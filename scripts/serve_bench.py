"""Load-test the serving daemon: sustained requests/s through HTTP.

Spins the server in-process on the current JAX platform, then drives it
with a closed-loop client pool (each worker posts, waits, posts again).
Reports throughput, latency quantiles and the realized batch fill — the
number that shows micro-batching actually coalesces under load.

On this 1-core tunnel host the result is HOST-bound (HTTP + PNG codec on
one core shared with the server threads); a production host with real
cores colocated with the TPU pays neither. Run with
JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu for a device-free smoke.

Round 4 adds an OPEN-LOOP mode (--rps R, optionally repeated): a Poisson-ish
fixed-rate arrival process independent of response times — the honest
latency measurement (closed-loop self-throttles: slow responses slow the
offered load, hiding queueing). Each --rps level reports p50/p95/p99 and
the error rate, giving a latency-vs-offered-load curve.

Usage: python scripts/serve_bench.py [--requests 512] [--concurrency 64]
       [--batch_size 64] [--raw]
       python scripts/serve_bench.py --rps 20 --rps 40 --rps 80 --duration 20
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


def run_open_loop(args, server, batcher, url, bodies):
    """Fixed-RPS arrival process; per-level latency quantiles + error rate.

    Arrivals fire on a wall-clock schedule regardless of completions (a
    bounded thread pool of 4x the expected in-flight count absorbs bursts;
    if even that is exhausted the send blocks and the level is reported as
    saturated via its error/latency numbers).
    """
    print(f"open-loop: {args.duration:.0f}s per level, levels {args.rps}")
    rng = np.random.RandomState(1)
    rows = []
    for rps in args.rps:
        n = max(1, int(rps * args.duration))
        # Poisson arrivals: exponential inter-arrival gaps at rate rps
        gaps = rng.exponential(1.0 / rps, size=n)
        sched = np.cumsum(gaps)
        lat, errs = [], 0
        lock = threading.Lock()

        def post_timed(i):
            nonlocal errs
            req = urllib.request.Request(url, data=bodies[i % len(bodies)],
                                         method="POST")
            if args.raw:
                req.add_header("Accept", "application/octet-stream")
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=300) as resp:
                    ok = resp.status == 200
                    resp.read()
            except Exception:  # noqa: BLE001 — count as error
                ok = False
            dt = time.perf_counter() - t0
            with lock:
                if ok:
                    lat.append(dt)
                else:
                    errs += 1

        bucket_before = dict(batcher.bucket_batches)
        workers = max(8, int(4 * rps))  # ~4x expected in-flight at 1 s p99
        with ThreadPoolExecutor(max_workers=workers) as pool:
            start = time.perf_counter()
            for i in range(n):
                delay = sched[i] - (time.perf_counter() - start)
                if delay > 0:
                    time.sleep(delay)
                pool.submit(post_timed, i)
        lat.sort()
        q = lambda p: (1000 * lat[min(len(lat) - 1, int(p * len(lat)))]
                       if lat else float("nan"))
        realized = len(lat) / args.duration
        # Per-level bucket mix: which compiled shapes this load level ran on
        # (the policy diagnostic — a high-rps level should be ~pure full
        # batch, a low-rps one ~pure small bucket).
        mix = {b: batcher.bucket_batches[b] - bucket_before.get(b, 0)
               for b in batcher.bucket_batches
               if batcher.bucket_batches[b] != bucket_before.get(b, 0)}
        mix_s = " ".join(f"{b}:{c}" for b, c in sorted(mix.items())) or "-"
        rows.append((rps, realized, q(0.5), q(0.95), q(0.99), errs, n, mix_s))
        print(f"  offered {rps:6.1f} rps -> completed {realized:6.1f} rps, "
              f"p50 {q(0.5):7.1f} ms  p95 {q(0.95):7.1f} ms  "
              f"p99 {q(0.99):7.1f} ms  errors {errs}/{n}  buckets {mix_s}")
    print("\n| offered rps | completed rps | p50 ms | p95 ms | p99 ms "
          "| errors | batches by bucket |")
    print("|---|---|---|---|---|---|---|")
    for rps, realized, p50, p95, p99, errs, n, mix_s in rows:
        print(f"| {rps:.0f} | {realized:.1f} | {p50:.0f} | {p95:.0f} "
              f"| {p99:.0f} | {errs}/{n} | {mix_s} |")


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
    ap.add_argument("--rps", type=float, action="append", default=None,
                    help="open-loop mode: offered load in requests/s "
                         "(repeat for a latency-vs-RPS curve)")
    ap.add_argument("--buckets", type=str, default="auto",
                    help="batch-shape buckets, as in the serve CLI: 'auto' "
                         "(batch/8 + batch), 'none' (single full-batch "
                         "shape, the pre-round-5 engine) or comma ints")
    ap.add_argument("--duration", type=float, default=20.0,
                    help="seconds per --rps level")
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
    from satlas_sr_tpu.serve import parse_buckets_arg

    buckets = parse_buckets_arg(args.buckets)
    print("building + warming server (cold compile can take minutes) ...",
          flush=True)
    server, batcher = build_server(opt, host="127.0.0.1", port=0,
                                   max_wait_ms=args.max_wait_ms,
                                   max_queue=4 * args.concurrency,
                                   timeout_s=300.0, buckets=buckets)
    print(f"batch buckets: {batcher.buckets}", flush=True)
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

    if args.rps:
        run_open_loop(args, server, batcher, url, bodies)
        print(f"batches by bucket: {batcher.bucket_batches}")
        server.shutdown()
        server.server_close()
        batcher.close()
        return

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
