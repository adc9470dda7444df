"""Profiling CLI: capture a device trace of a config's hot program.

    python -m satlas_sr_tpu.profile -opt options/esrgan_s2naip_urban.yml
    python -m satlas_sr_tpu.profile -opt options/infer_example.yml --steps 5

Builds the config's program exactly as the train/infer CLIs would (synthetic
data — no dataset or weights needed, like warmup.py), compiles it OUTSIDE the
trace window, then records `--steps` steady-state steps with jax.profiler and
prints a per-op device-time summary (top fusions, scan totals, ms/step).
The raw trace stays in `--out` for XProf/TensorBoard.

The reference has no profiling surface at all (SURVEY §5.1: wall-clock
AvgTimers only). In-training capture exists via train.py's logger.profile
hook; this CLI profiles standalone — the workflow behind BENCH_NOTES.md's
roofline sections (scripts/train_phase_profile.py buckets the GAN step in
model-specific detail; this summary is model-agnostic).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np


def _run_train_steps(opt: dict, steps: int, trace_dir: str) -> None:
    import jax

    from .models import build_model
    from .warmup import _synth_batch

    scale = int(opt.get("scale", 4))
    model = build_model(opt)
    model.replicate_state()
    ds = opt["datasets"]["train"]
    accum = int((opt.get("train") or {}).get("accum_steps", 1) or 1)
    rows = int(ds.get("batch_size_per_gpu", 16)) * jax.local_device_count() * accum
    batch = _synth_batch(ds, scale, rows, with_old=bool(ds.get("old_naip_path")))

    t0 = time.time()
    logs = model.train_iter(batch, 1)  # compile outside the trace
    jax.block_until_ready(list(logs.values()))
    print(f"compiled train step ({rows} rows) in {time.time() - t0:.1f}s")

    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            logs = model.train_iter(batch, 2 + i)
        jax.block_until_ready(list(logs.values()))


def _run_infer_steps(opt: dict, steps: int, trace_dir: str) -> None:
    import jax

    from .infer import load_infer_variables
    from .inference import InferenceEngine
    from .utils.infer_utils import channels_per_frame
    from .utils.model_utils import build_network, uses_3d_input

    n = int(opt["n_lr_images"])
    use_3d = uses_3d_input(opt["network_g"]["type"])
    model = build_network(opt)
    variables = load_infer_variables(opt, model, n, use_3d)
    engine = InferenceEngine(
        model, variables, batch_size=int(opt.get("batch_size", 64)),
        use_3d=use_3d, n_frames=n,
        matmul_precision=str(opt.get("matmul_precision", "highest")))
    c = channels_per_frame(opt.get("s2_bands"))
    rng = np.random.RandomState(0)
    shape = (engine.batch_size, n, 32, 32, 3) if use_3d \
        else (engine.batch_size, 32, 32, n * c)
    x = (rng.rand(*shape) * 255).astype(np.uint8)

    t0 = time.time()
    engine.run(x)  # compile outside the trace
    print(f"compiled infer program (batch {engine.batch_size}) "
          f"in {time.time() - t0:.1f}s")

    with jax.profiler.trace(trace_dir):
        for h in [engine.dispatch(x) for _ in range(steps)]:
            engine.fetch(h)


def summarize(trace_dir: str, steps: int, top: int = 15) -> bool:
    """Print a per-op device-time table from the newest trace. Returns False
    (with the raw-trace pointer) when the trace lacks device op threads —
    e.g. some CPU-only builds."""
    traces = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True), key=os.path.getmtime)
    if not traces:
        print(f"no trace.json.gz produced under {trace_dir}")
        return False
    data = json.load(gzip.open(traces[-1]))
    events = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and "args" in e}
    op_threads = {(p, t) for (p, t), n in tids.items() if n == "XLA Ops"}
    if not op_threads:
        print(f"trace has no 'XLA Ops' device thread — open it in "
              f"XProf/TensorBoard instead: {traces[-1]}")
        return False

    evs = [e for e in events if e.get("ph") == "X"
           and (e.get("pid"), e.get("tid")) in op_threads]
    # scan bodies: `while` events CONTAIN their fusions — count the while
    # totals and exclude nested events to avoid double counting
    whiles = [(e["ts"], e["ts"] + e["dur"]) for e in evs
              if e["name"].startswith("while")]

    def nested(e):
        return any(s < e["ts"] and e["ts"] + e.get("dur", 0) <= t
                   for s, t in whiles)

    total_us = 0.0
    agg = collections.defaultdict(lambda: [0.0, 0])
    for e in evs:
        if nested(e):
            continue
        name = e["name"]
        if name.startswith("while"):
            name = "while (scan body total)"
        agg[name][0] += e.get("dur", 0)
        agg[name][1] += 1
        total_us += e.get("dur", 0)

    dev = pids.get(next(iter(op_threads))[0], "device")
    print(f"\n{dev} — {total_us / 1e3 / max(steps, 1):.2f} ms/step device time "
          f"({steps} steps traced)")
    print(f"{'op':<58} {'ms/step':>9} {'%':>6} {'calls':>6}")
    for name, (us, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{name[:58]:<58} {us / 1e3 / max(steps, 1):>9.3f} "
              f"{100 * us / max(total_us, 1e-9):>5.1f}% {cnt:>6}")
    print(f"\nraw trace: {traces[-1]}")
    return True


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-opt", type=str, required=True)
    parser.add_argument("--steps", type=int, default=3,
                        help="steady-state steps to trace (compile excluded)")
    parser.add_argument("--out", type=str, default="/tmp/ssr_tpu_profile",
                        help="trace output dir (XProf/TensorBoard-readable)")
    parser.add_argument("--mode", choices=["auto", "train", "infer"],
                        default="auto")
    args = parser.parse_args(argv)

    from .utils.jax_cache import enable_compilation_cache
    from .utils.lint import report_lint
    from .utils.options import yaml_load

    enable_compilation_cache()
    opt = yaml_load(args.opt)
    mode = args.mode
    if mode == "auto":
        mode = "infer" if "data_dir" in opt else "train"
    report_lint(opt, kind="train" if mode == "train" else "infer")

    os.makedirs(args.out, exist_ok=True)
    if mode == "train":
        _run_train_steps(opt, args.steps, args.out)
    else:
        _run_infer_steps(opt, args.steps, args.out)
    summarize(args.out, args.steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
