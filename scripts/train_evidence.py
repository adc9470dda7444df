"""On-chip end-to-end training evidence runs (system-level, beyond unit tests).

Drives the REAL train CLI over a synthetic-but-learnable S2-NAIP tree for
BOTH trainer families:

  esrgan — production-shaped SSRESRGANModel (RRDBNet 64 feat / 23 blocks,
           batch 32, the shipped urban config's losses and optimizers);
  l2     — L2Model over the shipped HighResNet shapes (hidden 128,
           revisits 8, WorldStrat loss) — the SRCNN/HighResNet trainer
           (reference ssr/models/ssr_l2_model.py:36-43).

HR chips are smooth random fields and every LR frame is the 4x
box-downsample of its HR plus small noise, so there is a true SR mapping to
learn and held-out val PSNR must rise if — and only if — the assembled
trainer (data pipeline, USM, GAN step, EMA, scheduler, checkpoint/resume,
validation) actually optimizes.

Each run is preempted with SIGTERM partway (exercising the preemption save)
and resumed with --auto_resume, so the evidence also covers the recovery
path on real hardware. Exit code is nonzero unless, for every family, the
train loss fell AND val PSNR rose by >= --psnr_margin dB (pointwise or by
least-squares fit over the val trajectory — round 5: a strict `>` with no
margin would pass on jitter). Duplicate val rows at the same iter (the
resume leg re-validates at its final iter) are deduped, keeping the last.

Usage: python scripts/train_evidence.py [--iters 1200] [--family both]
       [--workdir DIR] [--preempt_frac 0.4] [--fresh] [--out FILE.json]

--out writes the verdict as a machine-readable artifact — per-round gate,
not prose: {"pass": all-families, "families": {name: {pix_drop_pct,
val_psnr_first/last, val_psnr_rise_db, val_psnr_fit_rise_db, ...}}}.
Per-round cadence is a shrunk run: python scripts/train_evidence.py
--iters 300 --out TRAIN_EVIDENCE_r05.json ; keep the 1200-iter default
for acceptance.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))
sys.path.insert(0, REPO)

PSNR_MARGIN_DB = 0.05  # default noise margin on the val-PSNR rise


def _smooth_field(rng, size=128, base=16, lo=30, hi=225):
    """Low-frequency random RGB field: upsampled coarse noise."""
    from PIL import Image

    coarse = rng.rand(base, base, 3)
    chans = [
        np.asarray(
            Image.fromarray((c * 255).astype(np.uint8)).resize(
                (size, size), Image.BILINEAR
            ),
            dtype=np.float32,
        )
        for c in coarse.transpose(2, 0, 1)
    ]
    img = np.stack(chans, axis=-1) / 255.0
    return (lo + img * (hi - lo)).astype(np.uint8)


def _make_split(root, n_chips, rng, n_frames=8):
    from PIL import Image

    from satlas_sr_tpu.utils.imgio import write_png

    for k in range(n_chips):
        chip = f"chip{k:04d}"
        hr = _smooth_field(rng)
        # true 4x relationship: LR frames are box-downsampled HR + noise
        lr = np.asarray(
            Image.fromarray(hr).resize((32, 32), Image.BOX), dtype=np.float32
        )
        frames = []
        for _ in range(n_frames):
            f = lr + rng.randn(32, 32, 3) * 2.0
            frames.append(np.clip(f, 1, 255).astype(np.uint8))  # no zero pixels
        write_png(os.path.join(root, "naip", chip, f"{chip}.png"), hr)
        write_png(
            os.path.join(root, "sentinel2", chip, "tci.png"),
            np.concatenate(frames, axis=0),
        )


def _dataset_block(workdir, use_3d):
    d = {
        "train": {
            "name": "train",
            "type": "S2NAIPDataset",
            "sentinel2_path": os.path.join(workdir, "train", "sentinel2"),
            "naip_path": os.path.join(workdir, "train", "naip"),
            "use_shuffle": True,
            "num_worker_per_gpu": 2,
            "batch_size_per_gpu": 32,
            "n_s2_images": 8,
            "io_backend": {"type": "disk"},
        },
        "val": {
            "name": "validation",
            "type": "S2NAIPDataset",
            "sentinel2_path": os.path.join(workdir, "val", "sentinel2"),
            "naip_path": os.path.join(workdir, "val", "naip"),
            "use_shuffle": False,
            "n_s2_images": 8,
            "io_backend": {"type": "disk"},
        },
    }
    if use_3d:
        d["train"]["use_3d"] = True
        d["val"]["use_3d"] = True
    return d


def _val_block(val_freq):
    return {
        "val_freq": val_freq,
        "save_img": False,
        "metrics": {
            "psnr": {"type": "calculate_psnr", "crop_border": 4,
                     "test_y_channel": False},
            "ssim": {"type": "calculate_ssim", "crop_border": 4,
                     "test_y_channel": False},
        },
    }


def _esrgan_opt(workdir, iters, val_freq, ckpt_freq, print_freq):
    """Production-shaped GAN recipe (esrgan_s2naip_urban.yml shapes)."""
    return {
        "name": "evidence_esrgan",
        "model_type": "SSRESRGANModel",
        "scale": 4,
        "num_gpu": "auto",
        "manual_seed": 0,
        "l1_gt_usm": True,
        "percep_gt_usm": True,
        "gan_gt_usm": False,
        "feed_disc_lr": True,
        "compute_dtype": "bfloat16",
        "matmul_precision": "default",
        "datasets": _dataset_block(workdir, use_3d=False),
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 24, "num_out_ch": 3,
                      "num_feat": 64, "num_block": 23, "num_grow_ch": 32},
        "network_d": {"type": "SSR_UNetDiscriminatorSN", "num_in_ch": 27,
                      "num_feat": 64, "skip_connection": True},
        "path": {"param_key_g": "params_ema", "strict_load_g": True,
                 "param_key_d": "params", "strict_load_d": True,
                 "resume_state": None},
        "train": {
            "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 1.0e-4, "weight_decay": 0,
                        "betas": [0.9, 0.99]},
            "optim_d": {"type": "Adam", "lr": 1.0e-4, "weight_decay": 0,
                        "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [400000],
                          "gamma": 0.5},
            "total_iter": iters,
            "warmup_iter": -1,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                          "reduction": "mean"},
            "perceptual_opt": {
                "type": "PerceptualLoss",
                "layer_weights": {"conv1_2": 0.1, "conv2_2": 0.1, "conv3_4": 1,
                                  "conv4_4": 1, "conv5_4": 1},
                "vgg_type": "vgg19", "use_input_norm": True,
                "perceptual_weight": 1.0, "style_weight": 0,
                "range_norm": False, "criterion": "l1",
            },
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                        "real_label_val": 1.0, "fake_label_val": 0.0,
                        "loss_weight": 0.1},
            "net_d_iters": 1,
            "net_d_init_iters": 0,
        },
        "val": _val_block(val_freq),
        "logger": {"print_freq": print_freq,
                   "save_checkpoint_freq": ckpt_freq,
                   "use_tb_logger": False,
                   "wandb": {"project": None, "resume_id": None}},
    }


def _l2_opt(workdir, iters, val_freq, ckpt_freq, print_freq):
    """Shipped HighResNet shapes + the WorldStrat-loss L2 trainer
    (options/highresnet_s2naip_urban.yml; ssr/models/ssr_l2_model.py:36-43)."""
    return {
        "name": "evidence_l2",
        "model_type": "L2Model",
        "scale": 4,
        "num_gpu": "auto",
        "manual_seed": 0,
        "compute_dtype": "float32",
        "matmul_precision": "default",
        "datasets": _dataset_block(workdir, use_3d=True),
        "network_g": {"type": "HighResNet", "in_channels": 3,
                      "mask_channels": 0, "hidden_channels": 128,
                      "out_channels": 3, "kernel_size": 3,
                      "residual_layers": 1, "output_size": 128,
                      "revisits": 8, "zoom_factor": 4, "sr_kernel_size": 1},
        "path": {"param_key_g": "params_ema", "strict_load_g": True,
                 "param_key_d": "params", "strict_load_d": True,
                 "resume_state": None},
        "train": {
            # 2e-3, NOT the shipped recipe's 1e-4: this is a learnability
            # GATE, and the gate needs measurable val-PSNR motion within a
            # few hundred iters. Measured on chip (round 5): at 1e-4 this
            # family's val PSNR is flat (~5.63 dB) for 300 iters — the net's
            # output scale grows from ~1e-3 toward the target's ~0.5 at
            # ~lr/step, so nothing moves inside the gate's budget; the
            # convergence tests (tests/test_convergence.py) use 2e-3 for the
            # same reason. The shipped HighResNet recipe keeps its own lr.
            "optim_g": {"type": "Adam", "lr": 2.0e-3, "weight_decay": 0,
                        "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [400000],
                          "gamma": 0.5},
            "total_iter": iters,
            "warmup_iter": -1,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                          "reduction": "mean"},
        },
        "val": _val_block(val_freq),
        "logger": {"print_freq": print_freq,
                   "save_checkpoint_freq": ckpt_freq,
                   "use_tb_logger": False,
                   "wandb": {"project": None, "resume_id": None}},
    }


FAMILIES = {"esrgan": _esrgan_opt, "l2": _l2_opt}


def _write_config(family, workdir, iters, val_freq, ckpt_freq):
    import yaml

    # short smoke runs still need train-loss rows for the trend gate
    print_freq = max(1, min(50, iters // 8))
    opt = FAMILIES[family](workdir, iters, val_freq, ckpt_freq, print_freq)
    path = os.path.join(workdir, f"evidence_{family}.yml")
    with open(path, "w") as f:
        yaml.safe_dump(opt, f, sort_keys=False)
    return path, opt["name"]


def _launch(yml):
    return subprocess.Popen(
        [sys.executable, "-m", "satlas_sr_tpu.train", "-opt", yml,
         "--auto_resume"],
        cwd=REPO,
    )


def _last_iter(metrics_path):
    """Highest iter any metrics.jsonl row (train OR validation) reports.

    Validation rows MUST count: train rows appear only every print_freq
    iters, so a run whose total_iter is not a print_freq multiple logs its
    last train row short of total_iter (e.g. 296 for print_freq 37,
    total_iter 300) while the end-of-training validation row carries the
    true final iter — counting train rows alone failed a COMPLETED resume
    leg (the round-5 first artifact's resumed_ok=false on both families).
    """
    last = 0
    try:
        with open(metrics_path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(row.get("iter"), int):
                    last = max(last, row["iter"])
    except FileNotFoundError:
        pass
    return last


def load_metrics_rows(metrics_path):
    """metrics.jsonl -> (train_rows sorted by iter, val_rows deduped by iter
    keeping the LAST — a resume leg re-runs its final validation and appends
    a duplicate row). Shared with scripts/dtype_train_equiv.py so the two
    gates parse trajectories identically."""
    train_rows, val_rows = [], []
    with open(metrics_path) as f:
        for line in f:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            (val_rows if "val_dataset" in row else train_rows).append(row)
    train_rows.sort(key=lambda r: r.get("iter", 0))
    by_iter = {}
    for r in val_rows:
        if isinstance(r.get("iter"), int):
            by_iter[r["iter"]] = r
    return train_rows, [by_iter[it] for it in sorted(by_iter)]


def _psnr_gate(psnrs, margin):
    """Margin-aware PSNR-rise verdict over the val trajectory.

    (iter, psnr) pairs, deduped + sorted. Passes when the pointwise rise
    last-first >= margin, OR the least-squares fit over the whole
    trajectory rises >= margin across its iter span (robust to an
    unlucky noisy endpoint). Round 5: replaces the strict `>` the round-4
    verdict flagged as passable by +0.001 dB jitter.
    """
    if len(psnrs) < 2:
        return None, None, None
    its = np.array([it for it, _ in psnrs], dtype=np.float64)
    vals = np.array([p for _, p in psnrs], dtype=np.float64)
    rise = float(vals[-1] - vals[0])
    slope = float(np.polyfit(its, vals, 1)[0])
    fit_rise = slope * float(its[-1] - its[0])
    return rise, fit_rise, (rise >= margin or fit_rise >= margin)


def run_family(family, args):
    """Run one family's evidence leg; returns (artifact_section, ok)."""
    run_name = f"evidence_{family}"
    # The gate must judge THIS run only: a stale experiment dir would make
    # --auto_resume skip the training and the trend assertions read the
    # previous run's appended metrics.jsonl rows.
    exp_dir = os.path.join(REPO, "experiments", run_name)
    if os.path.isdir(exp_dir):
        import shutil

        print(f"removing stale experiment dir {exp_dir}", flush=True)
        shutil.rmtree(exp_dir)

    # >=4 val points when possible (the fit gate wants a trajectory, not
    # two endpoints), capped at one validation per 100 iters.
    val_freq = max(10, min(args.iters // 4, 100))
    yml, _ = _write_config(family, args.workdir, args.iters,
                           val_freq=val_freq, ckpt_freq=val_freq)
    metrics = os.path.join(REPO, "experiments", run_name, "metrics.jsonl")

    t0 = time.time()
    resumed_ok = None
    proc = _launch(yml)
    if args.preempt_frac > 0:
        target = int(args.iters * args.preempt_frac)
        while proc.poll() is None and _last_iter(metrics) < target:
            time.sleep(5)
        if proc.poll() is None:
            print(f"\n>>> [{family}] preempting (SIGTERM) at iter "
                  f"~{_last_iter(metrics)}", flush=True)
            proc.send_signal(signal.SIGTERM)
        rc = proc.wait()
        print(f">>> [{family}] preempted run exited rc={rc}; resuming",
              flush=True)
        preempt_iter = _last_iter(metrics)
        proc = _launch(yml)
    rc = proc.wait()
    wall = time.time() - t0
    if args.preempt_frac > 0:
        # the resumed process must have carried the run to total_iter
        resumed_ok = rc == 0 and _last_iter(metrics) >= args.iters and \
            preempt_iter < args.iters
    if rc != 0:
        print(f"[{family}] train CLI failed rc={rc}")
        return {"pass": False, "error": f"train CLI rc={rc}"}, False

    # ---- summarize + assert trends (round-4 artifact carried a doubled
    # iter-300 val entry from the resume leg's re-validation — the shared
    # loader dedupes by iter, keeping the last)
    train_rows, val_rows = load_metrics_rows(metrics)

    # train-loss key differs per family: GAN logs l_g_pix, L2 logs tot_loss
    loss_key = "l_g_pix" if family == "esrgan" else "tot_loss"
    head = [r[loss_key] for r in train_rows[:4] if loss_key in r]
    tail = [r[loss_key] for r in train_rows[-4:] if loss_key in r]
    d_real = [r["l_d_real"] for r in train_rows if "l_d_real" in r]
    d_fake = [r["l_d_fake"] for r in train_rows if "l_d_fake" in r]
    print(f"\n==== [{family}] evidence summary ({wall:.0f}s wall) ====")
    print(f"train rows: {len(train_rows)}  val rows: {len(val_rows)}")
    print(f"{loss_key}: first≈{np.mean(head):.4f} -> last≈{np.mean(tail):.4f}")
    if d_real and d_fake:
        print(f"l_d_real range [{min(d_real):.3f}, {max(d_real):.3f}]  "
              f"l_d_fake range [{min(d_fake):.3f}, {max(d_fake):.3f}]")
    psnrs = [(r["iter"], r.get("psnr")) for r in val_rows
             if r.get("psnr") is not None]
    for it, p in psnrs:
        print(f"  val @ {it}: psnr {p:.3f}")
    rise, fit_rise, psnr_ok = _psnr_gate(psnrs, args.psnr_margin)
    ok = True
    if not head or not tail or np.mean(tail) >= np.mean(head) * 0.8:
        print(f"FAIL: {loss_key} did not fall by >=20%")
        ok = False
    if psnr_ok is False:
        print(f"FAIL: val PSNR rose <{args.psnr_margin} dB "
              f"(pointwise {rise:+.3f}, fit {fit_rise:+.3f})")
        ok = False
    elif psnr_ok is None:
        # <2 val points is a broken validation pipeline, not a pass: the
        # gate must never silently skip its PSNR leg (same class as
        # dtype_train_equiv's missing-val-rows disqualification)
        print(f"FAIL: <2 val PSNR points reached metrics.jsonl "
              f"({len(psnrs)}) — validation did not run/record")
        ok = False
    if family == "esrgan" and not (
            d_real and d_fake and max(map(abs, d_real + d_fake)) < 50):
        print("FAIL: discriminator losses unbounded or missing")
        ok = False
    if resumed_ok is False:
        print("FAIL: resumed run did not reach total_iter")
        ok = False
    print(f"[{family}] EVIDENCE:", "PASS" if ok else "FAIL")
    section = {
        "pass": ok,
        "wall_seconds": round(wall, 1),
        "loss_key": loss_key,
        "pix_drop_pct": (round(100 * (1 - float(np.mean(tail))
                                      / float(np.mean(head))), 1)
                         if head and tail else None),
        "loss_first": round(float(np.mean(head)), 5) if head else None,
        "loss_last": round(float(np.mean(tail)), 5) if tail else None,
        "val_psnr": [{"iter": it, "psnr": round(p, 3)} for it, p in psnrs],
        "val_psnr_rise_db": round(rise, 4) if rise is not None else None,
        "val_psnr_fit_rise_db": (round(fit_rise, 4)
                                 if fit_rise is not None else None),
        "val_psnr_rose": psnr_ok,
        "resumed_ok": resumed_ok,
    }
    if d_real and d_fake:
        section["d_loss_bounds"] = {
            "l_d_real": [round(min(d_real), 4), round(max(d_real), 4)],
            "l_d_fake": [round(min(d_fake), 4), round(max(d_fake), 4)],
        }
    return section, ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--family", default="both",
                    choices=["both", "esrgan", "l2"])
    ap.add_argument("--workdir", default="/tmp/sr_evidence")
    ap.add_argument("--preempt_frac", type=float, default=0.4,
                    help="SIGTERM each run at this fraction of total_iter "
                         "(0 disables the preemption leg)")
    ap.add_argument("--psnr_margin", type=float, default=PSNR_MARGIN_DB,
                    help="required val-PSNR rise in dB (pointwise or by fit)")
    ap.add_argument("--fresh", action="store_true",
                    help="regenerate the synthetic dataset")
    ap.add_argument("--out", default=None,
                    help="write the verdict as machine-readable JSON here")
    args = ap.parse_args()

    marker = os.path.join(args.workdir, ".generated")
    if args.fresh or not os.path.exists(marker):
        print("generating synthetic learnable S2-NAIP tree ...", flush=True)
        rng = np.random.RandomState(0)
        _make_split(os.path.join(args.workdir, "train"), 48, rng)
        _make_split(os.path.join(args.workdir, "val"), 8, rng)
        open(marker, "w").close()

    families = ["esrgan", "l2"] if args.family == "both" else [args.family]
    sections, all_ok = {}, True
    for family in families:
        section, ok = run_family(family, args)
        sections[family] = section
        all_ok = all_ok and ok

    print("\n==== OVERALL:", "PASS" if all_ok else "FAIL", "====")
    if args.out:
        artifact = {
            "pass": all_ok,
            "iters": args.iters,
            "psnr_margin_db": args.psnr_margin,
            "families": sections,
            "timestamp": int(time.time()),
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"artifact written to {args.out}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
