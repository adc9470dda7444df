"""Recover the trained band order of a multi-band ESRGAN checkpoint.

The released esrgan_{10m,20m,60m}.pth generators (reference README.md:76-80)
are orphaned: their `s2_bands` lists live only on the reference's missing
`experiments` branch, so nobody — including the reference itself — can
currently evaluate them correctly. The order is recoverable empirically,
because the right stacking is the one that super-resolves: score every
admissible band arrangement by val PSNR and the trained order wins by a
wide margin (wrong orders feed band data into conv_first channels trained
for different spectra).

    python scripts/band_order_search.py weights/esrgan_10m.pth data/val_set \
        [--n-frames 8] [--limit 16] [--bands b05 b06 ...] [--out report.json]

Method:
  1. num_in_ch read from conv_first's shape; channels-per-frame =
     num_in_ch / n_frames (the band-variant checkpoints are 8-frame,
     README.md:76-80).
  2. Candidates = ordered arrangements of the bands present on disk whose
     channel widths (tci=3, others 1) sum to channels-per-frame. tci, when
     included, is pinned first — both the reference loader and ours force
     that (s2-naip_dataset.py:73-75), so any other position is unreachable
     by either pipeline.
  3. Every candidate scores on the SAME deterministic frames (first
     n_frames per chip, no goodness sampling) so ranking is apples to
     apples; PSNR crop_border=4 vs the NAIP GT, averaged over --limit chips.
  4. Ranked report + the exact `s2_bands:` YAML to paste into a config
     (options/zoo/infer_esrgan_{10m,20m,60m}.yml ship gated on this check).

Runs fine on CPU (one jitted forward shape reused across candidates); pass
--limit to bound cost — 20m has 6 single bands = up to 720 orders.
"""

from __future__ import annotations

import argparse
import glob
import itertools
import json
import os
import sys

os.environ.setdefault("SSR_TPU_PLATFORM", os.environ.get("JAX_PLATFORMS", ""))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

BAND_WIDTH = {"tci": 3}  # every non-tci band is 1-channel


def enumerate_orders(available, cpf, max_candidates=1000):
    """Ordered band arrangements with total width == cpf; tci pinned first."""
    singles = sorted(b for b in available if b != "tci")
    out = []
    if "tci" in available and cpf >= 3:
        for combo in itertools.permutations(singles, cpf - 3):
            out.append(["tci"] + list(combo))
            if len(out) > max_candidates:
                raise ValueError(
                    f"more than {max_candidates} candidate orders; narrow "
                    f"the pool with --bands")
    for combo in itertools.permutations(singles, cpf):
        out.append(list(combo))
        if len(out) > max_candidates:
            raise ValueError(
                f"more than {max_candidates} candidate orders; narrow "
                f"the pool with --bands")
    return out


def load_stack(chip_dir, bands, n_frames):
    """[32, 32, n_frames*width(bands)] uint8 stacked in the GIVEN order.

    Deliberately simpler than the training loader: first n_frames frames,
    no tci goodness sampling — identical frames for every candidate makes
    the ranking a pure function of band order. Returns None when any band
    is missing/short (the chip is skipped for all candidates alike).
    """
    import numpy as np

    from satlas_sr_tpu.utils.imgio import read_png

    per_band = []
    for band in bands:
        path = os.path.join(chip_dir, f"{band}.png")
        if not os.path.exists(path):
            return None
        img = read_png(path)
        if img.shape[0] % 32 != 0 or img.shape[1] != 32:
            return None
        frames = img.reshape(-1, 32, 32, img.shape[-1])
        if frames.shape[0] < n_frames:
            return None
        per_band.append(frames[:n_frames])
    picked = np.concatenate(per_band, axis=-1)  # [T, 32, 32, cpf]
    return np.concatenate(list(picked), axis=-1)  # [32, 32, T*cpf]


def main():
    ap = argparse.ArgumentParser(
        description="rank candidate s2_bands orders for a multi-band "
                    ".pth by val PSNR")
    ap.add_argument("checkpoint", help="esrgan_{10m,20m,60m}-style .pth")
    ap.add_argument("data_root", help="val root containing naip/ + sentinel2/")
    ap.add_argument("--n-frames", type=int, default=8,
                    help="frames the checkpoint stacks (README.md:76-80: 8)")
    ap.add_argument("--param-key", default="params_ema")
    ap.add_argument("--limit", type=int, default=16,
                    help="chips scored per candidate")
    ap.add_argument("--bands", nargs="*", default=None,
                    help="restrict the candidate band pool")
    ap.add_argument("--max-candidates", type=int, default=1000)
    ap.add_argument("--out", default=None, help="write the ranking as JSON")
    args = ap.parse_args()

    from satlas_sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()  # also pins SSR_TPU_PLATFORM when set

    import jax
    import jax.numpy as jnp
    import numpy as np

    from satlas_sr_tpu.archs import RRDBNet
    from satlas_sr_tpu.metrics.psnr_ssim import calculate_psnr
    from satlas_sr_tpu.utils import torch_io
    from satlas_sr_tpu.utils.imgio import read_png

    state = torch_io.load_torch_state_dict(args.checkpoint, args.param_key)
    num_in_ch = int(state["conv_first.weight"].shape[1])
    num_feat = int(state["conv_first.weight"].shape[0])
    num_block = 1 + max(int(k.split(".")[1]) for k in state
                        if k.startswith("body."))
    num_grow_ch = int(state["body.0.rdb1.conv1.weight"].shape[0])
    cpf, rem = divmod(num_in_ch, args.n_frames)
    if rem:
        raise SystemExit(f"num_in_ch={num_in_ch} not divisible by "
                         f"n_frames={args.n_frames}")
    print(f"{os.path.basename(args.checkpoint)}: num_in_ch={num_in_ch} -> "
          f"{cpf} channels/frame at {args.n_frames} frames")

    s2_root = os.path.join(args.data_root, "sentinel2")
    chip_dirs = sorted(d for d in glob.glob(os.path.join(s2_root, "*"))
                       if os.path.isdir(d))
    if not chip_dirs:
        raise SystemExit(f"no chips under {s2_root}")
    available = sorted({os.path.splitext(os.path.basename(p))[0]
                        for d in chip_dirs[:50]
                        for p in glob.glob(os.path.join(d, "*.png"))})
    pool = args.bands if args.bands else available
    print(f"band pool: {pool}")
    candidates = enumerate_orders(pool, cpf, args.max_candidates)
    if not candidates:
        raise SystemExit(f"no band arrangement of {pool} has width {cpf}")
    print(f"{len(candidates)} candidate orders")

    # gather scored chips once (stacks differ per candidate, GT does not)
    chips = []
    for d in chip_dirs:
        chip = os.path.basename(d)
        naip = glob.glob(os.path.join(args.data_root, "naip", chip, "*.png"))
        if not naip:
            continue
        chips.append((d, read_png(naip[0])))
        if len(chips) >= args.limit:
            break
    if not chips:
        raise SystemExit("no (sentinel2, naip) chip pairs found")

    variables = torch_io.rrdbnet_from_torch(state, num_block=num_block)
    model = RRDBNet(num_in_ch=num_in_ch, num_out_ch=3, scale=4,
                    num_feat=num_feat, num_block=num_block,
                    num_grow_ch=num_grow_ch)

    @jax.jit
    def fwd(x_u8):
        with jax.default_matmul_precision("highest"):
            y = model.apply(variables, x_u8.astype(jnp.float32) / 255.0)
        y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0) * 255.0
        return jnp.rint(y).astype(jnp.uint8)

    rows = []
    for ci, bands in enumerate(candidates):
        stacks, gts = [], []
        for d, gt in chips:
            s = load_stack(d, bands, args.n_frames)
            if s is not None:
                stacks.append(s)
                gts.append(gt)
        if not stacks:
            continue
        sr = np.asarray(fwd(jnp.asarray(np.stack(stacks))))
        psnrs = [calculate_psnr(sr[i], gts[i], crop_border=4)
                 for i in range(len(gts))]
        rows.append({"bands": bands, "psnr": float(np.mean(psnrs)),
                     "chips": len(gts)})
        print(f"  [{ci + 1}/{len(candidates)}] {','.join(bands):<40} "
              f"PSNR {rows[-1]['psnr']:.3f} dB", flush=True)

    rows.sort(key=lambda r: -r["psnr"])
    best = rows[0]
    margin = best["psnr"] - rows[1]["psnr"] if len(rows) > 1 else float("inf")
    print(f"\nwinner: {best['bands']}  ({best['psnr']:.3f} dB, "
          f"margin {margin:+.3f} dB over runner-up)")
    print("paste into your config:")
    print("  s2_bands: [" + ", ".join(best["bands"]) + "]")
    if margin < 0.5 and len(rows) > 1:
        print("WARNING: margin < 0.5 dB — rerun with a larger --limit before "
              "trusting this order")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"checkpoint": os.path.basename(args.checkpoint),
                       "num_in_ch": num_in_ch, "n_frames": args.n_frames,
                       "winner": best["bands"], "margin_db": margin,
                       "ranking": rows}, f, indent=2)
        print(f"report written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
