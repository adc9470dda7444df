"""Compile-warmup CLI: pre-populate the persistent XLA compilation cache with
a config's exact jitted programs, using synthetic data — no dataset and no
weights required.

`python -m satlas_sr_tpu.warmup -opt options/esrgan_s2naip_urban.yml`

Why: the first compile of a production program costs minutes on the TPU AOT
compiler, and every (re)started process pays it unless the compilation cache
(utils/jax_cache.py, enabled by every CLI) already holds the executable.
Running warmup once per program shape — in the VM image build, or on a fresh
worker before data mounts — makes subsequent launches start in seconds. Paired
with train.py's SIGTERM preemption save, a preempted job resumes almost
immediately. Beyond-reference: the eager-CUDA reference has no compile step
and therefore no equivalent concept (closest surface: cudnn.benchmark=True,
ssr/train.py:34).

Covers: the training step + the per-val-dataset eval program for train
configs (`model_type` present), and the InferenceEngine program — chunked or
`whole_tile` — for infer configs.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def _synth_batch(ds_opt: dict, scale: int, rows: int, with_old: bool) -> dict:
    """Random batch shaped exactly like S2NAIPDataset output for this config."""
    t = int(ds_opt.get("n_s2_images", 8))
    bands = ds_opt.get("s2_bands") or ["tci"]
    # per-frame channels: tci is RGB, every other band is single-channel
    # (data/s2naip.py _load_bands; same derivation as ESRGANModel num_in_ch)
    c = 3 + (len(bands) - 1)
    rng = np.random.RandomState(0)
    if ds_opt.get("use_3d"):
        lr = (rng.rand(rows, t, 32, 32, c) * 255).astype(np.uint8)
    else:
        lr = (rng.rand(rows, 32, 32, t * c) * 255).astype(np.uint8)
    batch = {
        "lr": lr,
        "hr": (rng.rand(rows, 32 * scale, 32 * scale, 3) * 255).astype(np.uint8),
        "Chip": [f"warmup_{i}" for i in range(rows)],
    }
    if with_old:
        batch["old_hr"] = (
            rng.rand(rows, 32 * scale, 32 * scale, 3) * 255
        ).astype(np.uint8)
    return batch


def warmup_train(opt: dict) -> None:
    import jax

    from .models import build_model

    scale = int(opt.get("scale", 4))
    t0 = time.time()
    model = build_model(opt)
    model.replicate_state()

    ds = opt["datasets"]["train"]
    accum = int((opt.get("train") or {}).get("accum_steps", 1) or 1)
    rows = int(ds.get("batch_size_per_gpu", 16)) * jax.local_device_count() * accum
    batch = _synth_batch(ds, scale, rows, with_old=bool(ds.get("old_naip_path")))
    logs = model.train_iter(batch, 1)
    jax.block_until_ready(list(logs.values()))
    print(f"[warmup] train step ({rows} rows): compiled+ran in {time.time() - t0:.1f}s")

    for phase, vds in opt["datasets"].items():
        if phase == "train" or vds is None:
            continue
        t0 = time.time()
        vrows = int(vds.get("batch_size", 1))
        vbatch = _synth_batch(vds, scale, vrows, with_old=False)
        out = model.eval_outputs(vbatch)
        jax.block_until_ready(out)
        print(f"[warmup] eval step '{phase}' ({vrows} rows): "
              f"compiled+ran in {time.time() - t0:.1f}s")


def warmup_infer(opt: dict) -> None:
    from .infer import load_infer_variables
    from .inference import InferenceEngine
    from .infer_grid import default_spatial_shards
    from .utils.model_utils import build_network, uses_3d_input

    n_lr_images = int(opt["n_lr_images"])
    use_3d = uses_3d_input(opt["network_g"]["type"])
    whole = bool(opt.get("whole_tile"))
    grid_size = int(opt.get("grid_size", 16))
    if opt.get("halo") and not whole:
        # halo mode runs sliding windows of halo_window (default 32) at
        # batch min(256, windows/tile) — warm THAT shape
        from .infer_grid import _window_starts

        halo = opt.get("halo", 6)
        halo = 6 if halo is True else int(halo)
        L = grid_size * 32
        size = min(int(opt.get("halo_window", 32)), L)
        n_win = len(_window_starts(L, size, size - 2 * halo)) ** 2
        batch_size = int(opt.get("batch_size", min(256, n_win)))
    else:
        size = grid_size * 32 if whole else 32
        batch_size = int(opt.get("batch_size", 1 if whole else 64))

    # spatial_shards only affects the WHOLE-TILE program (run_whole_tile);
    # the chunked/halo CLIs build their engines without it, so honoring it
    # here would warm a sharded executable the real launch never runs.
    spatial = int(opt.get("spatial_shards", 0)) if whole else 0
    if whole and spatial <= 0:
        spatial = default_spatial_shards(size)

    if whole and use_3d:
        g_opt = dict(opt["network_g"])
        g_opt["output_size"] = size * int(opt["scale"])
        opt = {**opt, "network_g": g_opt}

    t0 = time.time()
    model = build_network(opt)
    variables = load_infer_variables(opt, model, n_lr_images, use_3d=use_3d)
    engine = InferenceEngine(
        model, variables, batch_size=batch_size, use_3d=use_3d,
        n_frames=n_lr_images,
        matmul_precision=str(opt.get("matmul_precision", "highest")),
        spatial_shards=max(spatial, 1),
    )
    # the engine rounds batch_size to the device count; feed ITS batch shape,
    # not the raw config value, or the real launch misses the cache
    rows = engine.batch_size
    if use_3d:
        x = np.zeros((rows, n_lr_images, size, size, 3), np.uint8)
    else:
        x = np.zeros((rows, size, size, n_lr_images * 3), np.uint8)
    engine.run(x)
    mode = ("whole-tile" if whole
            else "halo" if opt.get("halo") else "chunked")
    print(f"[warmup] {mode} inference (batch {rows}, {size}x{size}): "
          f"compiled+ran in {time.time() - t0:.1f}s")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to the options file.")
    args, extra = parser.parse_known_args(argv)

    from .utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from .utils.options import yaml_load

    raw = yaml_load(args.opt)
    if raw.get("model_type"):
        # full option parsing (dir layout, seeds, dist) without touching disk
        # beyond the cache: warmup never creates experiment dirs. Extra args
        # (--force_yml/--debug/...) forward so shape-changing overrides warm
        # the SAME program the real launch will run.
        from .utils.options import parse_options

        root_path = os.getcwd()
        opt, _ = parse_options(root_path, is_train=True,
                               argv=["-opt", args.opt, *extra])
        warmup_train(opt)
    else:
        if extra:
            raise SystemExit(
                f"warmup: unrecognised arguments for an infer config: {extra}"
            )
        warmup_infer(raw)
    print("[warmup] compilation cache populated.")


if __name__ == "__main__":
    main()
