"""Phase-attributed breakdown of a jax.profiler trace of the GAN train step.

Usage: python scripts/train_phase_profile.py [/tmp/train_profile]

Parses the newest vm.trace.json.gz under the profile dir, takes the TPU:0
'XLA Ops' thread, and buckets op durations by the tf_op path XLA records:
- ops inside `while` intervals are the scanned RRDB trunk (fwd/bwd scans —
  the while events CONTAIN their fusions, so only the while totals count);
- everything else is attributed via module names in tf_op
  (UNetDiscriminatorSN fwd/bwd, RRDBNet non-trunk, VGG, optimizer, ...).

Divides by the number of profiled steps (count of `while` pairs) to report
ms/step. This script produced the numbers in BENCH_NOTES.md's train-step
roofline section.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_profile"
    traces = sorted(glob.glob(os.path.join(root, "**", "vm.trace.json.gz"),
                              recursive=True), key=os.path.getmtime)
    if not traces:
        raise SystemExit(f"no vm.trace.json.gz under {root}")
    path = traces[-1]
    print(f"trace: {path}")
    data = json.load(gzip.open(path))
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pid = next(p for p, n in pids.items() if "TPU:0" in n)
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    ops_tid = next(t for (p, t), n in tids.items()
                   if p == tpu_pid and n == "XLA Ops")
    evs = [e for e in events if e.get("ph") == "X" and e.get("pid") == tpu_pid
           and e.get("tid") == ops_tid]

    whiles = [(e["ts"], e["ts"] + e["dur"], e["name"]) for e in evs
              if e["name"].startswith("while")]
    n_steps = max(1, len({n for _, _, n in whiles}) and
                  len(whiles) // len({n for _, _, n in whiles}))

    def in_while(e):
        return any(s <= e["ts"] and e["ts"] + e.get("dur", 0) <= t
                   for s, t, _ in whiles)

    def bucket(tf_op, name):
        s = tf_op or name
        if "transpose" in s and "UNetDiscriminator" in s:
            return "D bwd"
        if "UNetDiscriminator" in s:
            return "D fwd (x3 incl. spectral)"
        if "transpose" in s and "RRDBNet" in s:
            return "G bwd (non-trunk)"
        if "RRDBNet" in s:
            return "G fwd (non-trunk)"
        if re.search(r"adam|scale_by|ema", s, re.I):
            return "optimizer/EMA"
        return "VGG + USM + losses + misc"

    phase = collections.Counter()
    for e in evs:
        if e["name"].startswith("while"):
            # scanned trunk: the earlier-starting while each step is fwd
            continue
        if in_while(e):
            continue
        phase[bucket(e.get("args", {}).get("tf_op", ""), e["name"])] += e["dur"]
    fwd_bwd = sorted({n for _, _, n in whiles})
    for name in fwd_bwd:
        tot = sum(t - s for s, t, n in whiles if n == name)
        phase[f"G trunk scan ({name})"] = tot

    total = sum(phase.values())
    print(f"steps profiled: {n_steps}; device total {total / n_steps / 1e3:.1f} ms/step")
    for k, v in phase.most_common():
        print(f"  {k:32s} {v / n_steps / 1e3:7.2f} ms/step")


if __name__ == "__main__":
    main()
