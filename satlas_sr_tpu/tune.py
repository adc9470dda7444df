"""Train-step throughput autotuner CLI.

Recommended (recipe-safe) invocation — hold the optimizer-visible batch at
the recipe's global batch so every ranked candidate is numerically
EQUIVALENT training (batch x accum splits of the same update; the
reference's 8-GPU recipe is global batch 32, README.md:159):

`python -m satlas_sr_tpu.tune -opt options/esrgan_s2naip_urban.yml
    --effective_batch 32 [--batches 8,16,32] [--dtypes float32,bfloat16]
    [--remat auto] [--iters 10] [--trials 3] [--out tune_results.json]`

Without --effective_batch the sweep ranks RAW batch sizes — useful for
finding the chip's throughput ceiling, but the top recommendation then
CHANGES the optimizer-visible batch (a different recipe, not a faster run
of the same one). The CLI prints a loud note in that mode.

Productizes the per-chip throughput sweeps run by hand across rounds
(BENCH_NOTES.md: batch/remat/accum interact non-monotonically — batch 64
regresses 28% vs 32 without remat but remat='rdb' recovers it, while at
batch 32 every remat policy loses; gradient accumulation holds the
optimum at any effective batch). Given a training config, this CLI
measures candidate (batch_size_per_gpu, network_g.remat, accum_steps)
settings ON THE ACTUAL DEVICE with synthetic data of the configured
shapes, then reports a ranked table, the recommended `--force_yml`
overrides, and a machine-readable JSON artifact.

Beyond-reference surface: the reference trains at whatever the YAML says
(ssr/train.py never measures); retuning there is a manual edit-and-watch
loop per hardware generation.

Measurement notes:
- Weights are synthetic (pretrain/resume paths are ignored): throughput
  is independent of weight VALUES, and this keeps the tuner runnable
  before any artifacts are fetched.
- Each candidate compiles + steps the REAL jitted train program
  (model.train_iter) — the same code path `train.py` runs, including EMA,
  schedulers and loss towers from the config.
- OOM / compile failures are caught per candidate and recorded, so one
  infeasible batch size doesn't kill the sweep.
- With --effective_batch E, candidates hold the OPTIMIZER-VISIBLE batch
  fixed at E via accum_steps = E // batch: the ranking then compares
  numerically-equivalent training configurations (the accumulation
  equivalence is proven in tests/test_accum_equivalence.py).
"""

from __future__ import annotations

import argparse
import copy
import gc
import json
import os
import sys
import time
from typing import Any, Dict, List, Optional

import numpy as np

LR_CROP = 32  # the dataset's fixed LR chip size (data/s2naip.py)


def _parse_remat_mode(s: str):
    s = s.strip().lower()
    if s in ("false", "none", "off"):
        return False
    if s in ("true", "block"):
        return "block" if s == "block" else True
    if s in ("rdb", "conv_outs"):
        return s
    raise ValueError(f"unknown remat mode {s!r} "
                     "(expected false|block|rdb|conv_outs)")


def build_candidates(opt: Dict[str, Any], batches: List[int],
                     remat_modes: Optional[List[Any]],
                     effective_batch: Optional[int],
                     dtypes: Optional[List[str]] = None) -> List[Dict[str, Any]]:
    """Cartesian (batch, remat, dtype) grid; accum from --effective_batch.

    remat_modes=None means 'auto': the config's own setting everywhere,
    plus 'rdb' for batches above the smallest candidate (the measured
    regime where remat wins — BENCH_NOTES round-4 remat table). Non-RRDB
    generators have no remat axis and get only the config's setting.
    dtypes=None keeps the config's compute_dtype (no dtype axis); note a
    dtype sweep ranks runs that are NOT numerically identical — bf16
    trajectory equivalence is measured separately
    (scripts/dtype_train_equiv.py).
    """
    net_g = opt.get("network_g") or {}
    has_remat_axis = str(net_g.get("type", "")) == "SSR_RRDBNet"
    config_remat = net_g.get("remat", False)
    dtype_axis = dtypes or [None]
    cands = []
    for b in sorted(set(batches)):
        if effective_batch is not None:
            if effective_batch % b:
                continue
            accum = effective_batch // b
        else:
            accum = int((opt.get("train") or {}).get("accum_steps") or 1)
        if not has_remat_axis:
            modes = [config_remat]
        elif remat_modes is None:
            modes = [config_remat]
            if b > min(batches) and "rdb" not in modes:
                modes.append("rdb")
        else:
            modes = remat_modes
        for mode in modes:
            for dt in dtype_axis:
                cand = {"batch": b, "remat": mode, "accum": accum}
                if dt is not None:
                    cand["dtype"] = dt
                cands.append(cand)
    return cands


def synth_batch(opt: Dict[str, Any], rows: int,
                rng: np.random.RandomState) -> Dict[str, Any]:
    """Synthetic uint8 batch with the config's training shapes."""
    train_ds = (opt.get("datasets") or {}).get("train") or {}
    n_frames = int(train_ds.get("n_s2_images") or 1)
    scale = int(opt.get("scale") or 4)
    hr_size = LR_CROP * scale
    batch = {
        "lr": (rng.rand(rows, LR_CROP, LR_CROP, 3 * n_frames) * 255)
        .astype(np.uint8),
        "hr": (rng.rand(rows, hr_size, hr_size, 3) * 255).astype(np.uint8),
    }
    if train_ds.get("old_naip_path"):
        batch["old_hr"] = (rng.rand(rows, hr_size, hr_size, 3) * 255) \
            .astype(np.uint8)
    if str(opt.get("model_type")) == "OSMObjESRGANModel":
        batch["Chip"] = [f"tune_{i}" for i in range(rows)]
    return batch


def measure_candidate(opt: Dict[str, Any], cand: Dict[str, Any],
                      iters: int, trials: int) -> Dict[str, Any]:
    """Build the model per `cand`'s overrides and time steady-state steps."""
    import jax

    from .models import build_model

    row = dict(cand)
    o = copy.deepcopy(opt)
    # SRCNN/HighResNet have no remat knob; only the RRDB trunk takes one.
    if str((o.get("network_g") or {}).get("type", "")) == "SSR_RRDBNet":
        o.setdefault("network_g", {})["remat"] = cand["remat"]
    o.setdefault("train", {})["accum_steps"] = cand["accum"]
    o.setdefault("datasets", {}).setdefault("train", {})[
        "batch_size_per_gpu"] = cand["batch"]
    if cand.get("dtype"):
        o["compute_dtype"] = cand["dtype"]
    # Throughput doesn't depend on weight values; drop artifact paths so
    # the tuner runs before anything is fetched.
    path = o.setdefault("path", {})
    for key in list(path):
        if "pretrain_network" in key or "resume_state" in key:
            path[key] = None
    o["is_train"] = True
    o.setdefault("logger", {})["print_freq"] = 1 << 30
    o["logger"]["save_checkpoint_freq"] = 1 << 30
    o["val"] = None

    rows = cand["batch"] * cand["accum"]
    batch = synth_batch(o, rows, np.random.RandomState(0))
    model = None
    try:
        model = build_model(o)
        t0 = time.perf_counter()
        logs = model.train_iter(batch, 1)
        jax.block_until_ready(logs)
        row["compile_s"] = round(time.perf_counter() - t0, 1)
        best = 0.0
        step = 2
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(iters):
                logs = model.train_iter(batch, step)
                step += 1
            jax.block_until_ready(logs)
            best = max(best, iters / (time.perf_counter() - t0))
        row["ms_per_step"] = round(1000.0 / best, 1)
        row["samples_per_s"] = round(best * rows, 1)
        row["ok"] = True
    except Exception as e:  # OOM / unsupported combo: record, keep sweeping
        row["ok"] = False
        row["error"] = f"{type(e).__name__}: {e}"[:300]
    finally:
        del model
        gc.collect()
    return row


def recommend_force_yml(cand: Dict[str, Any]) -> List[str]:
    remat = cand["remat"]
    remat_s = remat if isinstance(remat, str) else str(bool(remat))
    out = [
        f"datasets:train:batch_size_per_gpu={cand['batch']}",
        f"network_g:remat={remat_s}",
        f"train:accum_steps={cand['accum']}",
    ]
    if cand.get("dtype"):
        out.append(f"compute_dtype={cand['dtype']}")
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Measure train-step throughput across (batch, remat, "
                    "accum) candidates for a config, on the current device.")
    ap.add_argument("-opt", dest="opt", required=True)
    ap.add_argument("--batches", default="16,32,64",
                    help="comma-separated per-chip native batch sizes")
    ap.add_argument("--remat", default="auto",
                    help="'auto' (config + rdb at larger batches) or a "
                         "comma list of false|block|rdb|conv_outs")
    ap.add_argument("--effective_batch", type=int, default=None,
                    help="hold optimizer-visible batch fixed at E "
                         "(accum_steps = E // batch; non-divisors skipped) — "
                         "the recipe-safe mode: every candidate is then the "
                         "SAME training run, just split differently")
    ap.add_argument("--dtypes", default=None,
                    help="comma list of compute dtypes to sweep (e.g. "
                         "float32,bfloat16); default: the config's own. "
                         "NOTE: unlike batch x accum splits, dtypes are NOT "
                         "numerically identical — check trajectory "
                         "equivalence with scripts/dtype_train_equiv.py "
                         "before shipping a dtype change")
    ap.add_argument("--iters", type=int, default=10,
                    help="timed steps per trial")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default="tune_results.json")
    ap.add_argument("--force_yml", nargs="+", default=None)
    args = ap.parse_args(argv)

    from .utils.jax_cache import enable_compilation_cache
    from .utils.options import parse_options

    enable_compilation_cache()
    parse_argv = ["-opt", args.opt]
    if args.force_yml:
        parse_argv += ["--force_yml"] + list(args.force_yml)
    opt, _ = parse_options(os.getcwd(), is_train=True, argv=parse_argv)

    batches = [int(b) for b in args.batches.split(",") if b.strip()]
    remat_modes = (None if args.remat.strip().lower() == "auto" else
                   [_parse_remat_mode(m) for m in args.remat.split(",")])
    dtypes = ([d.strip() for d in args.dtypes.split(",") if d.strip()]
              if args.dtypes else None)
    cands = build_candidates(opt, batches, remat_modes, args.effective_batch,
                             dtypes)
    if not cands:
        print("no feasible candidates (check --batches vs --effective_batch)",
              file=sys.stderr)
        return 2
    if args.effective_batch is None and len(set(c["batch"] for c in cands)) > 1:
        print("NOTE: no --effective_batch given — this sweep ranks DIFFERENT "
              "optimizer-visible batches (different recipes), not faster "
              "splits of the same one. Pass --effective_batch <global batch> "
              "to rank numerically-equivalent candidates.", flush=True)

    import jax

    dev = jax.devices()[0]
    print(f"tuning {opt['name']} ({opt['model_type']}) on {dev.device_kind} "
          f"— {len(cands)} candidates, {args.trials}x{args.iters} steps each",
          flush=True)
    results = []
    for cand in cands:
        label = (f"batch={cand['batch']} remat={cand['remat']} "
                 f"accum={cand['accum']}")
        if cand.get("dtype"):
            label += f" dtype={cand['dtype']}"
        print(f"  {label} ...", end="", flush=True)
        row = measure_candidate(opt, cand, args.iters, args.trials)
        results.append(row)
        if row["ok"]:
            print(f" {row['samples_per_s']} samples/s "
                  f"({row['ms_per_step']} ms/step, "
                  f"compile {row['compile_s']}s)", flush=True)
        else:
            print(f" FAILED: {row['error']}", flush=True)

    ok = [r for r in results if r["ok"]]
    best = max(ok, key=lambda r: r["samples_per_s"]) if ok else None

    dtype_col = any("dtype" in r for r in ok)
    hdr = "| batch | remat | accum |" + (" dtype |" if dtype_col else "") \
        + " samples/s | ms/step | compile s |"
    print("\n" + hdr)
    print("|" + "---|" * (hdr.count("|") - 1))
    for r in sorted(ok, key=lambda r: -r["samples_per_s"]):
        mark = " **" if r is best else ""
        dt = f" {r.get('dtype', '-')} |" if dtype_col else ""
        print(f"| {r['batch']} | {r['remat']} | {r['accum']} |{dt}"
              f" {r['samples_per_s']}{mark} | {r['ms_per_step']} "
              f"| {r['compile_s']} |")

    report = {
        "config": opt["name"],
        "model_type": opt["model_type"],
        "device_kind": dev.device_kind,
        "platform": dev.platform,
        "effective_batch": args.effective_batch,
        "iters": args.iters,
        "trials": args.trials,
        "candidates": results,
        "best": best,
        "recommended_force_yml": recommend_force_yml(best) if best else None,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nreport: {args.out}")
    if best:
        print("apply with: python -m satlas_sr_tpu.train -opt "
              f"{args.opt} --force_yml "
              + " ".join(report["recommended_force_yml"]))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
