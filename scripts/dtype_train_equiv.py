"""bf16-vs-f32 TRAINING equivalence on the train-evidence harness (round 5).

The ~1.4x bfloat16 train-step lever has so far rested on forward agreement
only (doctor hint, BENCH_NOTES precision ladder); whether the shipped train
configs can default to `compute_dtype: bfloat16` is a question about
TRAJECTORIES — does optimizing in bf16 reach the same place? This script
answers it by running the REAL train CLI twice on the identical
synthetic-learnable corpus (same seed, same iters, same production-shaped
ESRGAN recipe as scripts/train_evidence.py, no preemption) with only
compute_dtype flipped, then comparing:

  - l_g_pix trajectories (first/last window means) and their drop %
  - val-PSNR trajectories and the FINAL val-PSNR delta against --bar
    (default 0.05 dB — the north-star parity bar)
  - steady-state step time (median of the train log's per-iter `time:`
    column) -> the measured speedup

Verdict JSON: {"within_bar": bool, "final_val_psnr_delta_db": ...,
"speedup": ..., per-dtype sections}. Exit 0 iff both runs completed and
the final val-PSNR delta is within the bar.

Usage: python scripts/dtype_train_equiv.py [--family esrgan|l2] [--iters 300]
       [--workdir /tmp/sr_dtype_equiv] [--bar 0.05] [--out FILE.json]

--family l2 (round 5) runs the SRCNN/HighResNet WorldStrat trainer instead
(reference ssr/models/ssr_l2_model.py:36-43); its trend key is tot_loss.

Run on the TPU chip for honest timing; equivalence itself is
device-agnostic. Reference recipe being reproduced:
/root/reference/ssr/options/esrgan_s2naip_urban.yml train block;
ssr/models/ssr_esrgan_model.py:119-233.
"""

import argparse
import json
import os
import re
import shutil
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import train_evidence as tev  # noqa: E402 — shared corpus + config builders


# Per-family train-loss key for the trend comparison (the families log
# different dicts: the GAN trainer's pixel L1 vs the WorldStrat total).
LOSS_KEYS = {"esrgan": "l_g_pix", "l2": "tot_loss"}


def _run_one(dtype, args):
    """One train-CLI run at `dtype`; returns the parsed trajectory section."""
    import yaml

    name = f"dtype_equiv_{args.family}_{dtype}"
    print_freq = max(1, min(50, args.iters // 8))
    val_freq = max(10, min(args.iters // 4, 100))
    opt = tev.FAMILIES[args.family](args.workdir, args.iters,
                                    val_freq=val_freq, ckpt_freq=10 ** 9,
                                    print_freq=print_freq)
    opt["name"] = name
    opt["compute_dtype"] = dtype
    # matmul_precision stays `default` in both runs (the shipped setting):
    # the experiment isolates the storage/compute dtype, not the MXU pass
    # count.
    yml = os.path.join(args.workdir, f"{name}.yml")
    with open(yml, "w") as f:
        yaml.safe_dump(opt, f, sort_keys=False)

    exp_dir = os.path.join(REPO, "experiments", name)
    if os.path.isdir(exp_dir):
        shutil.rmtree(exp_dir)

    t0 = time.time()
    proc = tev._launch(yml)
    rc = proc.wait()
    wall = time.time() - t0
    if rc != 0:
        return {"error": f"train CLI rc={rc}", "wall_seconds": round(wall, 1)}

    # trajectories from metrics.jsonl — same parse as train_evidence's gate
    # (val rows deduped by iter) so the two gates cannot drift
    train_rows, val_rows = tev.load_metrics_rows(
        os.path.join(exp_dir, "metrics.jsonl"))
    loss_key = LOSS_KEYS[args.family]
    pix = [(r["iter"], r[loss_key]) for r in train_rows if loss_key in r]
    psnrs = [(r["iter"], r["psnr"]) for r in val_rows
             if r.get("psnr") is not None]

    # Steady-state step time from LOG TIMESTAMPS between consecutive print
    # rows (median across segments, first segment dropped — it holds the
    # compile). The per-iter `time:` column is NOT usable here: with async
    # dispatch the instantaneous host-side iter time measures queue/sync
    # behavior, not device step time (measured: it reported bf16 6x slower
    # while wall-clock segments show it 1.4x faster).
    import datetime

    logs = [p for p in os.listdir(exp_dir)
            if p.startswith("train_") and p.endswith(".log")]
    stamps = []
    for p in logs:
        for line in open(os.path.join(exp_dir, p)):
            m = re.match(r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) INFO: "
                         r"\[.*iter:\s*([\d,]+),", line)
            if m:
                t = datetime.datetime.strptime(m.group(1),
                                               "%Y-%m-%d %H:%M:%S")
                stamps.append((int(m.group(2).replace(",", "")), t))
    stamps.sort()
    seg = [(stamps[i + 1][1] - stamps[i][1]).total_seconds()
           / (stamps[i + 1][0] - stamps[i][0])
           for i in range(len(stamps) - 1)
           if stamps[i + 1][0] > stamps[i][0]]
    steady = float(np.median(seg[1:])) if len(seg) > 1 else None

    head = [v for _, v in pix[:4]]
    tail = [v for _, v in pix[-4:]]
    # A diverged run must fail the verdict, not sail through on a flat val
    # curve: the l2 family's f32 leg NaN'd at ~iter 130 on this harness and
    # the first version of this script still said WITHIN BAR (the NaN rows
    # aren't in val_psnr). Non-finite anywhere in the loss trajectory is
    # disqualifying on its own.
    finite = bool(pix) and bool(np.all(np.isfinite([v for _, v in pix])))
    return {
        "wall_seconds": round(wall, 1),
        "steady_iter_seconds": round(steady, 4) if steady else None,
        "loss_finite": finite,
        "loss_key": loss_key,
        "loss_first": round(float(np.mean(head)), 5) if head else None,
        "loss_last": round(float(np.mean(tail)), 5) if tail else None,
        "loss_drop_pct": (round(100 * (1 - float(np.mean(tail))
                                       / float(np.mean(head))), 1)
                          if head and tail else None),
        "val_psnr": [{"iter": it, "psnr": round(p, 3)} for it, p in psnrs],
    }


def equivalence_verdict(sections, bar):
    """(ok, final_val_psnr_delta, speedup) from the two per-dtype sections.

    Disqualifying on their own — no delta can rescue them:
      * an "error" section (the run crashed / produced no logs);
      * loss_finite false (NaN/inf anywhere in the loss trajectory). A
        diverged run whose val rows happen to be flat-and-equal MUST fail:
        the first l2-family artifact this round said WITHIN BAR while its
        f32 leg had NaN'd at ~iter 130 (the pre-fix SSIM instability) —
        the NaN rows simply never reach val_psnr.
    Extracted from main() so the gate itself is unit-testable
    (tests/test_dtype_equiv_gate.py).
    """
    ok = all("error" not in s and s.get("loss_finite")
             for s in sections.values())
    delta = speedup = None
    if ok:
        f32, bf16 = sections["float32"], sections["bfloat16"]
        if f32["val_psnr"] and bf16["val_psnr"]:
            delta = abs(bf16["val_psnr"][-1]["psnr"]
                        - f32["val_psnr"][-1]["psnr"])
        if f32["steady_iter_seconds"] and bf16["steady_iter_seconds"]:
            speedup = f32["steady_iter_seconds"] / bf16["steady_iter_seconds"]
        ok = delta is not None and delta <= bar
    return ok, delta, speedup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=sorted(tev.FAMILIES),
                    default="esrgan",
                    help="trainer family to compare (round 5 adds l2 — the "
                         "SRCNN/HighResNet WorldStrat trainer)")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--workdir", default="/tmp/sr_dtype_equiv")
    ap.add_argument("--bar", type=float, default=0.05,
                    help="max |final val PSNR(bf16) - final val PSNR(f32)| dB")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    marker = os.path.join(args.workdir, ".generated")
    if args.fresh or not os.path.exists(marker):
        print("generating synthetic learnable S2-NAIP tree ...", flush=True)
        rng = np.random.RandomState(0)
        tev._make_split(os.path.join(args.workdir, "train"), 48, rng)
        tev._make_split(os.path.join(args.workdir, "val"), 8, rng)
        open(marker, "w").close()

    sections = {}
    for dtype in ("float32", "bfloat16"):
        print(f"\n>>> training {args.iters} iters with compute_dtype={dtype}",
              flush=True)
        sections[dtype] = _run_one(dtype, args)
        print(json.dumps(sections[dtype], indent=2))

    ok, delta, speedup = equivalence_verdict(sections, args.bar)

    verdict = {
        "family": args.family,
        "within_bar": bool(ok),
        "bar_db": args.bar,
        "iters": args.iters,
        "final_val_psnr_delta_db": round(delta, 4) if delta is not None else None,
        "bf16_speedup_vs_f32": round(speedup, 3) if speedup else None,
        "runs": sections,
        "timestamp": int(time.time()),
    }
    print("\n==== dtype equivalence:", "WITHIN BAR" if ok else "OUT OF BAR",
          f"(Δ final val PSNR = {delta} dB, speedup = {speedup}) ====")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(verdict, f, indent=2)
        print(f"artifact written to {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
