"""GT-free inference CLI.

Parity with ssr/infer.py: `python -m satlas_sr_tpu.infer -opt <yml>` reads an
infer config (data_dir / n_lr_images / save_path / network_g / path), globs
`**/*.png`, super-resolves each and writes `{save_path}/{i}/sr.png` plus the
first low-res frame as `lr.png`.

TPU-first: pngs are decoded on host threads and run through the batched
InferenceEngine (one jitted uint8->uint8 program, batch sharded over local
devices) instead of the reference's batch=1 per-image device round trips.
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import jax
import numpy as np

from .inference import InferenceEngine, batched
from .utils.checkpoint import load_network_variables
from .utils.imgio import write_png
from .utils.infer_utils import format_s2naip_batch
from .utils.model_utils import build_network
from .utils.lint import report_lint
from .utils.options import yaml_load


def load_infer_variables(opt: dict, model, n_lr_images: int, use_3d: bool):
    """Configured weights, or a seeded init (with the reference's warning)."""
    path_opt = opt.get("path", {})
    weights = path_opt.get("pretrain_network_g")
    if weights:
        return load_network_variables(
            opt["network_g"]["type"], weights, opt["network_g"],
            path_opt.get("param_key_g", "params_ema"),
        )
    print("WARNING: Model weights are not specified in configuration file.")
    from .utils.infer_utils import channels_per_frame

    c = channels_per_frame(opt.get("s2_bands"))
    example = (
        np.zeros((1, n_lr_images, 32, 32, 3), np.float32)
        if use_3d
        else np.zeros((1, 32, 32, n_lr_images * c), np.float32)
    )
    return model.init(jax.random.PRNGKey(0), example)


def _paths_digest(rel_paths) -> str:
    import hashlib

    return hashlib.sha256("\n".join(rel_paths).encode()).hexdigest()


def corpus_fingerprint(pngs, data_dir: str) -> dict:
    """Sorted relative-path corpus count + sha256 over the enumeration.

    Only (count, digest) persist — at 1M chips a stored path list would be
    a multi-MB JSON rewritten and re-compared every resume. The tail-append
    check needs no stored paths either: hashing the CURRENT corpus's first
    prev_count paths reproduces the old digest iff every previous path kept
    its sorted position (guard_corpus_manifest)."""
    rel = [os.path.relpath(p, data_dir) for p in pngs]
    return {"count": len(rel), "sha256": _paths_digest(rel), "_rel": rel}


def guard_corpus_manifest(save_path: str, pngs, data_dir: str,
                          rank: int = 0, force: bool = False) -> None:
    """Refuse a skip_existing resume over a mutated corpus.

    skip_existing keys outputs and frame-RNG salts by POSITION in the sorted
    corpus; adding/removing one input file between interrupt and resume
    silently shifts every later index, so a resumed run would mix two
    inconsistent enumerations with no visible symptom. Guard: the first
    skip_existing run persists `{save_path}/.ssr_corpus_manifest.json`
    (count + sha256 of the sorted relative paths); every subsequent run
    verifies it and refuses loudly on mismatch. `--force` accepts the current
    corpus as the new authoritative enumeration (overwrites the manifest).
    The reference has no resume story at all (ssr/infer.py:42-67), so safety
    here is this repo's own bar.
    """
    import json

    man_path = os.path.join(save_path, ".ssr_corpus_manifest.json")
    fp = corpus_fingerprint(pngs, data_dir)
    rel = fp.pop("_rel")  # never persisted — the manifest stays O(1)

    def _write():
        if rank != 0:
            return
        os.makedirs(save_path, exist_ok=True)
        tmp = f"{man_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(fp, f)
        os.replace(tmp, man_path)

    if os.path.exists(man_path) and not force:
        with open(man_path) as f:
            prev = json.load(f)
        prev_n = prev.get("count")
        if (prev_n, prev.get("sha256")) == (fp["count"], fp["sha256"]):
            return
        # Pure tail-append (every previous path at the same sorted position,
        # new files only after them): existing indices all still map to the
        # same inputs, so a growing corpus (cron-style re-drives) is safe —
        # accept and extend the manifest. Detected without stored paths:
        # the current corpus's first prev_n paths hash to the old digest
        # iff the previous enumeration is an exact prefix of this one.
        if (isinstance(prev_n, int) and prev_n <= fp["count"]
                and _paths_digest(rel[:prev_n]) == prev.get("sha256")):
            print(f"skip_existing: corpus grew {prev_n} -> "
                  f"{fp['count']} files (append-only at the tail of the sort "
                  "order — existing indices unchanged); manifest extended.")
            _write()
            return
        raise RuntimeError(
            "skip_existing: the input corpus changed since this save_path "
            f"was first written ({prev.get('count')} files then, "
            f"{fp['count']} now) and not by a pure tail append. Outputs and "
            "frame-RNG salts are keyed by position in the sorted corpus, so "
            "resuming would silently mix two inconsistent enumerations. "
            "Either point save_path somewhere fresh, or re-run with --force "
            "to re-enumerate (existing index-keyed outputs may then "
            "correspond to different inputs)."
        )
    _write()


def shard_contiguous(n_items: int, rank: int, world: int) -> range:
    """Balanced contiguous [start, stop) range for this process."""
    base, extra = divmod(n_items, world)
    start = rank * base + min(rank, extra)
    return range(start, start + base + (1 if rank < extra else 0))


def run_inference(opt: dict, save_lr: bool = True, grid_naming: bool = False,
                  rank: int = 0, world: int = 1, force: bool = False) -> int:
    data_dir = opt["data_dir"]
    n_lr_images = int(opt["n_lr_images"])
    save_path = opt["save_path"]
    batch_size = int(opt.get("batch_size", 64))
    from .utils.model_utils import uses_3d_input

    use_3d = uses_3d_input(opt["network_g"]["type"])

    s2_bands = opt.get("s2_bands")
    if s2_bands:
        # multi-band GT-free inference (beyond the reference, whose infer
        # path reads tci-only series — its esrgan_{10m,20m,60m} checkpoints
        # have no runnable infer story upstream): data_dir is a dataset-style
        # root of {chip}/{band}.png dirs, stacked like the training loader
        from .utils.infer_utils import normalize_bands

        if grid_naming:
            raise ValueError("s2_bands is not supported for infer_grid "
                             "(grid tiles ship chunk-level tci pngs only)")
        if use_3d:
            raise ValueError("s2_bands requires SSR_RRDBNet (the use_3d "
                             "models take 3-channel revisits)")
        s2_bands = normalize_bands(s2_bands)

    model = build_network(opt)
    variables = load_infer_variables(opt, model, n_lr_images, use_3d)

    engine = InferenceEngine(
        model, variables, batch_size=batch_size, use_3d=use_3d, n_frames=n_lr_images,
        matmul_precision=str(opt.get("matmul_precision", "highest")),
    )

    if s2_bands:
        # corpus unit = one chip directory (identified by its required tci)
        pngs = sorted(
            os.path.dirname(p) for p in
            glob.glob(os.path.join(data_dir, "**", "tci.png"), recursive=True))
    else:
        pngs = sorted(glob.glob(os.path.join(data_dir, "**", "*.png"), recursive=True))
    total = len(pngs)
    if opt.get("skip_existing"):
        # guard over the FULL pre-shard corpus: every process must agree on
        # the same global enumeration before any index-keyed work happens
        guard_corpus_manifest(save_path, pngs, data_dir, rank=rank, force=force)
    # Multi-process: each process takes a contiguous shard of the sorted
    # corpus (grid mode shards whole tiles so every tile's chunks — and its
    # stitch — stay on one process). Contiguity keeps the global-index frame
    # seeding a scalar offset, so outputs are bit-identical to a 1-process
    # run regardless of process count.
    if world > 1:
        if grid_naming:
            tiles = sorted({os.path.dirname(p) for p in pngs})
            mine = set(tiles[i] for i in shard_contiguous(len(tiles), rank, world))
            idx = [i for i, p in enumerate(pngs) if os.path.dirname(p) in mine]
            if idx and idx != list(range(idx[0], idx[0] + len(idx))):
                raise AssertionError(
                    "tile shards must be contiguous in the sorted corpus"
                )
        else:
            idx = list(shard_contiguous(total, rank, world))
        pngs = [pngs[i] for i in idx]
        print(f"Process {rank}/{world}: inference on {len(pngs)} of {total} images.")
    else:
        idx = list(range(total))
        print(f"Running inference on {len(pngs)} images.")

    # `skip_existing: true` — resumable batch inference (beyond the
    # reference, which recomputes the full corpus after any interruption,
    # ssr/infer.py:42-67). Outputs are keyed by GLOBAL corpus index and
    # frame-selection RNG is salted by that same index, so recomputing only
    # the missing outputs is bit-identical to a straight full run.
    if opt.get("skip_existing"):
        def _is_done(gi: int, path: str) -> bool:
            if grid_naming:
                tile, name = path.split("/")[-2], path.split("/")[-1]
                return os.path.exists(os.path.join(save_path, tile, name))
            out_dir = os.path.join(save_path, str(gi))
            if save_lr and not os.path.exists(os.path.join(out_dir, "lr.png")):
                return False
            return os.path.exists(os.path.join(out_dir, "sr.png"))

        kept = [(gi, p) for gi, p in zip(idx, pngs) if not _is_done(gi, p)]
        n_skipped = len(pngs) - len(kept)
        if n_skipped:
            print(f"skip_existing: {n_skipped} outputs already present, "
                  f"{len(kept)} to compute.")
        idx = [gi for gi, _ in kept]
        pngs = [p for _, p in kept]

    t0 = time.time()
    batches = batched(pngs, engine.batch_size)
    index_batches = batched(idx, engine.batch_size)
    seed = opt.get("manual_seed", 0) or 0
    meta: list = []  # (paths, previews, global indices) per batch, in flight order

    # Host pipeline: PNG decode on a prefetching thread pool and PNG encode on
    # a writer pool (the native libpng extension releases the GIL for both),
    # so host IO overlaps device compute and the tunnel's result fetches.
    from concurrent.futures import ThreadPoolExecutor

    from .inference import BoundedWriter, prefetch_map

    workers = max(2, (os.cpu_count() or 1))
    decode_prefetch = int(opt.get("decode_prefetch", 3))
    # one worker per in-flight batch: read_png_many already parallelises
    # WITHIN a batch on its in-extension thread pool
    decode_pool = ThreadPoolExecutor(max_workers=decode_prefetch)
    write_pool = ThreadPoolExecutor(max_workers=workers)
    writer = BoundedWriter(write_pool, max_pending=4 * workers)

    def decode(arg):
        bp, bidx = arg
        # explicit global-index seeding: formatting is invariant to batch
        # size, process sharding and skip_existing filtering
        if s2_bands:
            from .utils.infer_utils import format_s2naip_multiband_batch

            return bp, bidx, format_s2naip_multiband_batch(
                bp, s2_bands, n_lr_images, seed=seed, indices=bidx)
        return bp, bidx, format_s2naip_batch(bp, n_lr_images, seed=seed,
                                             indices=bidx)

    def produce():
        for bp, bidx, (inputs, previews) in prefetch_map(
                decode_pool, decode, zip(batches, index_batches),
                decode_prefetch):
            meta.append((bp, previews, bidx))
            yield inputs

    done = 0
    try:
        for outputs in engine.run_many(produce()):
            batch_paths, previews, bidx = meta.pop(0)
            for k, path in enumerate(batch_paths):
                if grid_naming:
                    # Preserve {tile}/{i}_{j}.png for stitching (ssr/infer_grid.py:49-53).
                    tile, name = path.split("/")[-2], path.split("/")[-1]
                    writer.submit(write_png, os.path.join(save_path, tile, name),
                                  outputs[k])
                else:
                    out_dir = os.path.join(save_path, str(bidx[k]))
                    if save_lr:
                        writer.submit(write_png, os.path.join(out_dir, "lr.png"),
                                      previews[k])
                    writer.submit(write_png, os.path.join(out_dir, "sr.png"),
                                  outputs[k])
                done += 1
        writer.drain()  # surface any write error
    finally:
        decode_pool.shutdown(wait=True)
        write_pool.shutdown(wait=True)
    dt = time.time() - t0
    if done:
        print(f"Done: {done} images in {dt:.2f}s ({done / dt:.1f} img/s)")
    return done


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to the options file.")
    parser.add_argument("--launcher", choices=["none", "jax", "pytorch", "slurm"],
                        default="none", help="'jax' shards the corpus across "
                        "jax.distributed processes (one contiguous block each).")
    parser.add_argument("--force", action="store_true",
                        help="with skip_existing: accept a corpus that changed "
                        "since save_path's manifest was written (re-enumerate).")
    args = parser.parse_args(argv)
    from .utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    from .utils.options import init_distributed

    rank, world = init_distributed(args.launcher)
    opt = yaml_load(args.opt)
    report_lint(opt, "infer", rank=rank)
    run_inference(opt, rank=rank, world=world, force=args.force)


if __name__ == "__main__":
    main()
