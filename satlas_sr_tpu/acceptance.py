"""One-command parity acceptance against released reference checkpoints.

The project's north star (BASELINE.json) has two halves: TPU throughput
(measured every round, bench.py) and PSNR parity ±0.05 dB with the released
esrgan checkpoints on the reference val sets. The second half is blocked on
artifacts this environment cannot fetch — so the moment weights + data ARE
mounted must cost zero debugging. This module is that moment as a single
drilled command:

    python -m satlas_sr_tpu.acceptance --workdir acceptance_ws
    python -m satlas_sr_tpu.acceptance --weights path/to/esrgan_8S2.pth \
        --data path/to/small_val_set --out PARITY_RESULTS.json

Stages (each recorded in the verdict JSON, first failure stops the run):
  fetch     resolve the checkpoint + val dataset — a local path, an already-
            mounted workdir file, or a registry download (fetch.py; private
            mirrors via --url-weights/--url-data)
  preflight load the .pth, infer the generator architecture from its shapes
            (blocks/feats/growth/in_ch — no config guessing), locate the
            extracted naip/ + sentinel2/ tree
  forward   float forward equality: our RRDBNet vs the independent torch
            functional oracle (tests/torch_oracles.py, itself parity-tested
            against ssr/archs/rrdbnet_arch.py:92-137) on identical inputs,
            CPU float32 with highest matmul precision
  evaluate  dual-path metric run over the val set: every sample is loaded
            once and forwarded through BOTH implementations; PSNR/SSIM
            (crop_border=4, RGB — the reference test: block,
            ssr/options/esrgan_s2naip_urban.yml) computed with the same
            metric code for both
  verdict   PARITY_RESULTS.json with explicit pass/fail:
            |PSNR_jax − PSNR_torch| ≤ --psnr-tol (default 0.05 dB,
            BASELINE.json north star) and forward max|Δ| ≤ --fwd-tol

Why torch-oracle-as-reference is the honest comparator: the reference eval
stack (ssr/test.py:41-44 → basicsr metrics) cannot run here, but its forward
is fully specified by the checkpoint + architecture, which the oracle
reimplements and our test suite pins to the reference layer by layer. Both
paths see byte-identical inputs and the same metric arithmetic, so the delta
isolates exactly the thing the north star asks about: does this framework's
compiled forward change the imagery?

Exit codes: 0 pass, 2 parity failure, 3 blocked (artifacts unavailable) —
distinct so CI can tell "environment can't run this" from "parity broke".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any, Dict, List, Optional

# ---------------------------------------------------------------- resolution


def _resolve_weights(spec: str, workdir: str, *, url: Optional[str],
                     no_download: bool) -> str:
    """spec is a local .pth path or a fetch-registry name -> local path."""
    if os.path.isfile(spec):
        return spec
    from .fetch import REGISTRY, fetch_artifact

    if spec not in REGISTRY:
        raise FileNotFoundError(
            f"--weights {spec!r} is neither a file nor a registry name "
            f"(known: {', '.join(sorted(n for n in REGISTRY if n.startswith(('esrgan', 'srcnn', 'highresnet'))))})")
    dest = os.path.join(workdir, "weights")
    paths = fetch_artifact(spec, dest, url=url, no_download=no_download,
                           progress=True)
    return paths[0]


def _find_dataset_root(base: str) -> Optional[str]:
    """Locate a dir containing both naip/ and sentinel2/ under base."""
    if not os.path.isdir(base):
        return None
    for root, dirs, _ in os.walk(base):
        if "naip" in dirs and "sentinel2" in dirs:
            return root
        dirs.sort()
    return None


def _resolve_dataset(spec: str, workdir: str, *, url: Optional[str],
                     no_download: bool) -> str:
    """spec is a dataset root (contains naip/ + sentinel2/) or a registry
    name -> extracted dataset root."""
    direct = _find_dataset_root(spec)
    if direct:
        return direct
    from .fetch import REGISTRY, fetch_artifact

    if spec not in REGISTRY:
        raise FileNotFoundError(
            f"--data {spec!r} is neither a dataset tree (naip/ + sentinel2/) "
            f"nor a registry name")
    dest = os.path.join(workdir, "data")
    fetch_artifact(spec, dest, url=url, no_download=no_download,
                   progress=True)
    root = _find_dataset_root(dest)
    if root is None:
        raise FileNotFoundError(
            f"fetched {spec} but no naip/ + sentinel2/ tree found under {dest}")
    return root


# ----------------------------------------------------------------- preflight


def _load_and_introspect(pth: str, param_key: str) -> Dict[str, Any]:
    from .utils import torch_io

    try:
        state = torch_io.load_torch_state_dict(pth, param_key)
    except KeyError:
        # reference checkpoints carry either params_ema or params; fall back
        # with a note rather than dying on key naming (utils/model_utils.py
        # equivalent leniency, surfaced in the verdict)
        alt = "params" if param_key == "params_ema" else "params_ema"
        state = torch_io.load_torch_state_dict(pth, alt)
        param_key = alt
    if "conv_first.weight" not in state or "body.0.rdb1.conv1.weight" not in state:
        raise ValueError(
            f"{pth} is not an RRDBNet/ESRGAN generator checkpoint (keys like "
            f"{sorted(state)[:3]}...); acceptance currently drives the ESRGAN "
            f"family — the north star's target (esrgan_8S2)")
    info = {
        "param_key": param_key,
        "num_block": 1 + max(int(k.split(".")[1]) for k in state
                             if k.startswith("body.")),
        "num_in_ch": int(state["conv_first.weight"].shape[1]),
        "num_feat": int(state["conv_first.weight"].shape[0]),
        "num_grow_ch": int(state["body.0.rdb1.conv1.weight"].shape[0]),
        "n_params": int(sum(v.size for v in state.values())),
    }
    return state, info


# ----------------------------------------------------------- forward parity


def _forward_parity(state, info, fwd_tol: float, batch: int = 2) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from .archs import RRDBNet
    from .utils import torch_io
    from .utils.torch_oracles import rrdbnet_forward

    variables = torch_io.rrdbnet_from_torch(state, num_block=info["num_block"])
    model = RRDBNet(num_in_ch=info["num_in_ch"], num_out_ch=3, scale=4,
                    num_feat=info["num_feat"], num_block=info["num_block"],
                    num_grow_ch=info["num_grow_ch"])
    x = np.random.RandomState(0).rand(
        batch, 32, 32, info["num_in_ch"]).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        y_jax = np.asarray(model.apply(variables, jnp.asarray(x)))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}
    with torch.no_grad():
        y_t = rrdbnet_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                              info["num_block"], 4).numpy().transpose(0, 2, 3, 1)
    diff = float(np.abs(y_jax - y_t).max())
    a8 = (np.clip(y_jax, 0, 1) * 255).round()
    b8 = (np.clip(y_t, 0, 1) * 255).round()
    mse = float(np.mean((a8 - b8) ** 2))
    psnr = float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    return {"max_abs_diff": diff, "uint8_agreement_psnr_db": psnr,
            "ok": diff <= fwd_tol}


# ------------------------------------------------------------- dual eval


def _dual_eval(state, info, data_root: str, *, limit: int, batch_size: int,
               psnr_tol: float, seed: int = 0) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from .archs import RRDBNet
    from .data import build_dataset
    from .metrics.psnr_ssim import calculate_psnr, calculate_ssim
    from .models.base import to_uint8
    from .utils import torch_io
    from .utils.torch_oracles import rrdbnet_forward

    n_frames, rem = divmod(info["num_in_ch"], 3)
    if rem:
        raise ValueError(
            f"num_in_ch={info['num_in_ch']} is not a tci frame stack; "
            f"multi-band checkpoints need scripts/band_order_search.py first")
    ds = build_dataset({
        "name": "acceptance", "type": "S2NAIPDataset", "phase": "test",
        "scale": 4, "sentinel2_path": os.path.join(data_root, "sentinel2"),
        "naip_path": os.path.join(data_root, "naip"),
        "n_s2_images": n_frames, "use_shuffle": False, "seed": seed,
    })
    n = len(ds) if limit <= 0 else min(limit, len(ds))

    variables = torch_io.rrdbnet_from_torch(state, num_block=info["num_block"])
    model = RRDBNet(num_in_ch=info["num_in_ch"], num_out_ch=3, scale=4,
                    num_feat=info["num_feat"], num_block=info["num_block"],
                    num_grow_ch=info["num_grow_ch"])
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}

    @jax.jit
    def fwd_jax(lr_u8):
        # mirror the test CLI's eval forward exactly: /255, apply, to_uint8
        # (models/esrgan.py _build_eval_step, matmul_precision highest)
        with jax.default_matmul_precision("highest"):
            y = model.apply(variables, lr_u8.astype(jnp.float32) / 255.0)
            return to_uint8(y)

    sums = {"jax": {"psnr": 0.0, "ssim": 0.0},
            "torch_oracle": {"psnr": 0.0, "ssim": 0.0}}
    per_image: List[Dict[str, float]] = []
    done = 0
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        samples = [ds[i] for i in idxs]
        lr = np.stack([s["lr"] for s in samples])  # [b, 32, 32, C] uint8
        hr = [s["hr"] for s in samples]            # [128, 128, 3] uint8
        sr_j = np.asarray(fwd_jax(jnp.asarray(lr)))
        with torch.no_grad():
            y = rrdbnet_forward(
                sd, torch.from_numpy(
                    lr.astype(np.float32).transpose(0, 3, 1, 2) / 255.0),
                info["num_block"], 4).numpy().transpose(0, 2, 3, 1)
        sr_t = np.rint(np.clip(y, 0, 1) * 255.0).astype(np.uint8)
        for b, i in enumerate(idxs):
            row = {"index": int(i)}
            for tag, sr in (("jax", sr_j[b]), ("torch_oracle", sr_t[b])):
                p = float(calculate_psnr(sr, hr[b], crop_border=4))
                s = float(calculate_ssim(sr, hr[b], crop_border=4))
                sums[tag]["psnr"] += p
                sums[tag]["ssim"] += s
                row[f"{tag}_psnr"] = p
            per_image.append(row)
            done += 1
        print(f"\r  evaluated {done}/{n}", end="", file=sys.stderr)
    print(file=sys.stderr)
    if done == 0:
        raise ValueError(f"no usable samples in {data_root}")
    means = {tag: {m: v / done for m, v in d.items()} for tag, d in sums.items()}
    delta = abs(means["jax"]["psnr"] - means["torch_oracle"]["psnr"])
    worst = max(per_image,
                key=lambda r: abs(r["jax_psnr"] - r["torch_oracle_psnr"]))
    return {
        "images_evaluated": done,
        "metrics": means,
        "delta_psnr_db": delta,
        "worst_image": {"index": worst["index"],
                        "delta_psnr_db": abs(worst["jax_psnr"]
                                             - worst["torch_oracle_psnr"])},
        "ok": delta <= psnr_tol,
    }


# ----------------------------------------------------------------- pipeline


def run_acceptance(args) -> Dict[str, Any]:
    verdict: Dict[str, Any] = {
        "command": "satlas_sr_tpu.acceptance",
        "weights": args.weights, "data": args.data,
        "tolerances": {"psnr_db": args.psnr_tol, "forward_max_abs": args.fwd_tol},
        "timestamp": int(time.time()),
        "stages": {},
        "pass": False,
    }

    def stage(name, fn, blocked_exc=()):
        t0 = time.time()
        try:
            out = fn()
        except blocked_exc as e:
            verdict["stages"][name] = {"ok": False, "blocked": True,
                                       "error": str(e)}
            verdict["blocked"] = True
            raise SystemExit(3)
        except Exception as e:  # noqa: BLE001 — verdict must always be written
            verdict["stages"][name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            raise SystemExit(2)
        rec = out if isinstance(out, dict) else {"ok": True}
        rec.setdefault("ok", True)
        rec["seconds"] = round(time.time() - t0, 2)
        verdict["stages"][name] = rec
        if not rec["ok"]:
            raise SystemExit(2)
        return out

    try:
        os.makedirs(args.workdir, exist_ok=True)

        def _fetch():
            pth = _resolve_weights(args.weights, args.workdir,
                                   url=args.url_weights,
                                   no_download=args.no_download)
            root = _resolve_dataset(args.data, args.workdir,
                                    url=args.url_data,
                                    no_download=args.no_download)
            return {"weights_path": pth, "dataset_root": root}

        got = stage("fetch", _fetch, blocked_exc=(OSError, FileNotFoundError))

        loaded = {}

        def _preflight():
            loaded["state"], loaded["info"] = _load_and_introspect(
                got["weights_path"], args.param_key)
            return {"arch": loaded["info"],
                    "weights_path": got["weights_path"]}

        stage("preflight", _preflight)
        state, info = loaded["state"], loaded["info"]

        stage("forward", lambda: _forward_parity(state, info, args.fwd_tol))
        stage("evaluate", lambda: _dual_eval(
            state, info, got["dataset_root"], limit=args.limit,
            batch_size=args.batch_size, psnr_tol=args.psnr_tol))
        verdict["pass"] = True
        return verdict
    finally:
        with open(args.out, "w") as f:
            json.dump(verdict, f, indent=2)
        print(f"verdict written to {args.out}", file=sys.stderr)
        status = ("PASS" if verdict["pass"] else
                  "BLOCKED" if verdict.get("blocked") else "FAIL")
        print(f"ACCEPTANCE: {status}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="one-command PSNR-parity acceptance vs a released "
                    "reference checkpoint (north-star second half)")
    ap.add_argument("--weights", default="esrgan_8S2",
                    help="registry name or local .pth path (default: the "
                         "north-star checkpoint esrgan_8S2)")
    ap.add_argument("--data", default="small_val_set",
                    help="registry name or local dataset root containing "
                         "naip/ + sentinel2/")
    ap.add_argument("--workdir", default="acceptance_ws",
                    help="where fetched artifacts land")
    ap.add_argument("--param-key", default="params_ema")
    ap.add_argument("--psnr-tol", type=float, default=0.05,
                    help="max |PSNR_jax - PSNR_reference| in dB")
    ap.add_argument("--fwd-tol", type=float, default=1e-4,
                    help="max float forward |diff| vs the torch oracle")
    ap.add_argument("--limit", type=int, default=0,
                    help="cap evaluated images (0 = whole dataset)")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--url-weights", default=None,
                    help="mirror URL override for the weights artifact")
    ap.add_argument("--url-data", default=None,
                    help="mirror URL override for the dataset artifact")
    ap.add_argument("--no-download",
                    action="store_true",
                    help="artifacts are pre-mirrored into the workdir")
    ap.add_argument("--out", default="PARITY_RESULTS.json")
    args = ap.parse_args(argv)

    # parity arithmetic is CPU-exact by design (verify-skill device notes);
    # respect an explicit user pin but default to CPU
    os.environ.setdefault("SSR_TPU_PLATFORM", "cpu")
    from .utils.jax_cache import pin_platform

    pin_platform()
    try:
        verdict = run_acceptance(args)
    except SystemExit as e:
        return int(e.code or 0)
    return 0 if verdict["pass"] else 2


if __name__ == "__main__":
    sys.exit(main())
