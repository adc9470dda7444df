"""Sweep candidate XLA flag sets over the bench programs.

The round-2/3 ceiling analyses (BENCH_NOTES.md) pinned inference at 175
tiles/s and the GAN step at 223 samples/s as XLA *scheduling* bounds —
dense-connectivity HBM traffic the conv emitter won't fuse. This sweep
probes the compiler's own knobs for headroom that kernel rewrites could
not reach, chiefly the scoped-VMEM fusion budget (a larger budget lets
the fusion pass keep more of the RDB partial products resident) and the
latency-hiding scheduler.

Transport (round-4 finding): XLA_FLAGS cannot carry TPU backend flags on
this host at all — the tunneled `axon` client's parse_flags_from_env
aborts on any --xla_tpu_* flag because libtpu lives on the remote side.
PJRT per-program compiler options are the working channel: the framework's
hot jit sites go through utils.jax_cache.ssr_jit, which injects the JSON
dict in SSR_TPU_COMPILER_OPTIONS into every compile request. This sweep
sets that env var per config.

Each flag set runs `bench.py` in a FRESH subprocess with an isolated
compilation-cache dir, so every config pays its own honest cold compile
and the main cache stays clean. Options the remote compiler rejects make
that subprocess fail; the sweep records the failure and moves on.

    python scripts/xla_flag_sweep.py            # inference program
    python scripts/xla_flag_sweep.py --train    # GAN train step
    python scripts/xla_flag_sweep.py --timeout 1800 --only scoped_vmem_64m

Numbers ride the TPU tunnel on this host — compare configs within one
sweep run only (see BENCH_NOTES.md tunnel-timing caveat).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> PJRT compiler_options dict. Candidates chosen for a
# conv-dominated, HBM-bound single-chip program; collective-centric flags
# are pointless here and omitted.
FLAG_SETS = {
    "baseline": {},
    # fusion pass VMEM budget: default is small; the RDB dense concats are
    # exactly the "would fuse if VMEM allowed" shape. 48/64/96 MiB probes
    # the trade against conv pipelining (v5e VMEM is 128 MiB total).
    "scoped_vmem_48m": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "scoped_vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "scoped_vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "latency_hiding": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
}


def run_config(name: str, flags: dict, train: bool, timeout: int,
               iters: int | None) -> dict:
    env = dict(os.environ)
    if flags:
        env["SSR_TPU_COMPILER_OPTIONS"] = json.dumps(flags)
    else:
        env.pop("SSR_TPU_COMPILER_OPTIONS", None)
    # isolated compile cache: a flag change invalidates entries anyway;
    # keep the production cache free of sweep artifacts
    cache = tempfile.mkdtemp(prefix=f"xla_sweep_{name}_")
    env["SSR_TPU_COMPILATION_CACHE"] = cache
    if iters:
        env["BENCH_ITERS"] = str(iters)
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if train:
        cmd.append("--train")
    try:
        proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                              text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"name": name, "options": flags, "error": f"timeout {timeout}s"}
    line = next((l for l in proc.stdout.splitlines()
                 if l.startswith("{")), None)
    if proc.returncode != 0 or line is None:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
        return {"name": name, "options": flags,
                "error": f"rc={proc.returncode}: " + " | ".join(tail)}
    rec = json.loads(line)
    return {"name": name, "options": flags, "value": rec["value"],
            "unit": rec["unit"]}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train", action="store_true",
                    help="sweep the GAN train step instead of inference")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-config subprocess timeout (cold compile rides "
                         "the tunneled AOT compiler: minutes)")
    ap.add_argument("--iters", type=int, default=None,
                    help="override BENCH_ITERS for faster sweeps")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of flag-set names to run")
    args = ap.parse_args()

    names = args.only or list(FLAG_SETS)
    unknown = [n for n in names if n not in FLAG_SETS]
    if unknown:
        print(f"unknown flag sets: {unknown}; known: {list(FLAG_SETS)}",
              file=sys.stderr)
        return 2

    results = []
    for name in names:
        print(f"== {name}: {FLAG_SETS[name] or '(default options)'}",
              file=sys.stderr, flush=True)
        rec = run_config(name, FLAG_SETS[name], args.train, args.timeout,
                         args.iters)
        results.append(rec)
        print(f"   -> {rec.get('value', rec.get('error'))}",
              file=sys.stderr, flush=True)

    ok = [r for r in results if "value" in r]
    ok.sort(key=lambda r: -r["value"])
    base = next((r["value"] for r in results if r["name"] == "baseline"
                 and "value" in r), None)
    print(json.dumps({"sweep": "train" if args.train else "inference",
                      "results": results}, indent=1))
    if ok:
        print("\nranked:", file=sys.stderr)
        for r in ok:
            rel = f" ({r['value'] / base - 1:+.1%})" if base else ""
            print(f"  {r['name']:<22} {r['value']:>10} {r['unit']}"
                  f"{rel if r['name'] != 'baseline' else ''}",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
