"""`python -m satlas_sr_tpu` — list the framework's entry points."""

import sys

from . import __version__

CLIS = [
    ("train", "train a model (-opt cfg.yml [--auto_resume] [--launcher jax])"),
    ("test", "evaluate with GT + metric suite (-opt cfg.yml)"),
    ("infer", "GT-free batch inference (-opt cfg.yml; s2_bands for multi-band)"),
    ("infer_grid", "tile-grid inference + stitch (whole_tile / halo modes)"),
    ("serve", "HTTP serving daemon with TPU micro-batching"),
    ("export", "AOT-export a self-contained .ssrx artifact"),
    ("warmup", "pre-compile a config's programs into the XLA cache"),
    ("doctor", "preflight a config + environment"),
    ("scan_data", "pre-scan a dataset tree with the trainer's predicates"),
    ("ckpt", "inspect/verify any checkpoint file"),
    ("fetch", "download published datasets/weights (resumable)"),
    ("prepare", "raw rasters -> S2-NAIP tree (reproject recipe + chipper)"),
    ("profile", "device-trace a config's hot program + per-op summary"),
    ("acceptance", "one-command PSNR-parity verdict vs a released checkpoint"),
    ("tune", "measure + rank (batch, remat, accum) throughput for a config"),
]


def main() -> int:
    print(f"satlas_sr_tpu {__version__} — TPU-native satellite-imagery "
          f"super-resolution\n")
    width = max(len(n) for n, _ in CLIS)
    for name, desc in CLIS:
        print(f"  python -m satlas_sr_tpu.{name:<{width}}  {desc}")
    print("\ndocs: README.md, docs/API.md, docs/CONFIG_REFERENCE.md, "
          "docs/OPERATIONS.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
