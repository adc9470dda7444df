"""AOT model export: serialize the compiled SR program to a deployable artifact.

Beyond the reference (which re-builds a torch model and re-runs cuDNN autotune
on every process launch, ssr/infer.py:29-38): `jax.export` lowers the
InferenceEngine's uint8->uint8 program ONCE — weights embedded as StableHLO
constants — into a self-contained `.ssrx` file. Deployment hosts then load it
with ExportedEngine and need neither the model code, nor flax, nor the torch
checkpoint import path; the fleet runs the exact HLO that was validated, with
no recompilation drift between rollouts. The persistent XLA cache still
amortizes the per-host backend compile of the deserialized module.

Artifact (`.ssrx`) = a zip of:
  meta.json            model/config/shape/platform metadata (human-readable)
  module.jaxexport     jax.export serialization (StableHLO + calling convention)
  module_b{N}.jaxexport  optional extra fixed-batch programs (`--buckets`):
                       the serving daemon's batch-shape buckets (serve.py)
                       shipped pre-lowered, so an AOT-backed daemon keeps its
                       low-latency small-batch dispatch instead of degrading
                       to the single full-batch shape. Older readers ignore
                       the extra entries (format stays ssrx-v1).

TPU-native notes: the exported module is platform-tagged — the default export
targets BOTH 'tpu' and 'cpu' so one artifact serves the fleet and local
debugging; exporting for TPU does NOT require a TPU on the exporting host
(cross-platform lowering). `--symbolic_batch` exports a shape-polymorphic
batch dimension (any batch size, one artifact); fixed-batch exports match the
serving daemon's single-executable design.

Usage:
  python -m satlas_sr_tpu.export -opt options/infer_example.yml -o model.ssrx --check
  python -m satlas_sr_tpu.serve  -opt options/infer_example.yml --artifact model.ssrx
"""

from __future__ import annotations

import argparse
import json
import os
import zipfile
from typing import Any, Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

ARTIFACT_FORMAT = "ssrx-v1"
_META_NAME = "meta.json"
_MODULE_NAME = "module.jaxexport"
_MODULE_NAME_BUCKET = "module_b{}.jaxexport"


def export_artifact(
    opt: dict,
    out_path: str,
    batch_size: Optional[int] = None,
    symbolic_batch: bool = False,
    hw: int = 32,
    platforms: Sequence[str] = ("tpu", "cpu"),
    check: bool = False,
    buckets: Optional[Sequence[int]] = None,
) -> Dict[str, Any]:
    """Lower the engine program for `opt` and write a `.ssrx` artifact.

    `symbolic_batch=True` exports a batch-polymorphic module (the `b`
    dimension stays symbolic; every concrete batch size works, each new size
    pays one backend compile at load time). `hw` sets the square input window
    (32 = the chunk/serving shape; e.g. 512 exports a whole-tile program).
    `buckets` additionally lowers one program per extra batch shape (deduped,
    capped at the full batch) so the serving daemon's bucket policy
    (serve.py, round-5) works AOT — fixed-batch artifacts otherwise carry
    exactly one shape and shallow queues pay the full padded batch.
    Returns the artifact metadata dict.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from .infer import load_infer_variables
    from .inference import InferenceEngine
    from .utils.model_utils import build_network, uses_3d_input

    n_frames = int(opt["n_lr_images"])
    use_3d = uses_3d_input(opt["network_g"]["type"])
    model = build_network(opt)
    variables = load_infer_variables(opt, model, n_frames, use_3d)
    engine = InferenceEngine(
        model,
        variables,
        batch_size=int(batch_size or opt.get("batch_size", 64)),
        use_3d=use_3d,
        n_frames=n_frames,
        matmul_precision=str(opt.get("matmul_precision", "highest")),
        use_mesh=False,  # portability: the artifact is single-device SPMD-free
    )

    if use_3d:
        dims = (n_frames, hw, hw, 3)
    else:
        dims = (hw, hw, n_frames * 3)
    if symbolic_batch:
        shape = jax_export.symbolic_shape(
            ", ".join(["b"] + [str(d) for d in dims]))
    else:
        shape = (engine.batch_size,) + dims
    x_spec = jax.ShapeDtypeStruct(shape, jnp.uint8)

    # engine.variables close over as embedded constants — the artifact is
    # self-contained (bf16 engines embed bf16 weights: half the bytes).
    fn = jax.jit(lambda x: engine._run(engine.variables, x))
    exported = jax_export.export(fn, platforms=tuple(platforms))(x_spec)
    payload = exported.serialize()

    if buckets and symbolic_batch:
        raise ValueError(
            "--buckets only applies to fixed-batch exports; a symbolic-batch "
            "artifact already serves any batch size (one compile per shape)")
    bucket_sizes = []
    bucket_payloads: Dict[int, bytes] = {}
    if buckets and not symbolic_batch:
        bucket_sizes = sorted(
            {engine.round_bucket(int(b)) for b in buckets} | {engine.batch_size})
        for b in bucket_sizes:
            if b == engine.batch_size:
                continue  # the primary module already carries this shape
            spec_b = jax.ShapeDtypeStruct((b,) + dims, jnp.uint8)
            exported_b = jax_export.export(fn, platforms=tuple(platforms))(spec_b)
            bucket_payloads[b] = exported_b.serialize()

    meta: Dict[str, Any] = {
        "format": ARTIFACT_FORMAT,
        "model_type": opt["network_g"]["type"],
        "network_g": dict(opt["network_g"]),
        "scale": int(opt.get("scale", 4)),
        "n_lr_images": n_frames,
        "use_3d": use_3d,
        "batch_size": None if symbolic_batch else engine.batch_size,
        "input_dims": list(dims),
        "input_dtype": "uint8",
        "output_dtype": "uint8",
        "platforms": list(exported.platforms),
        "matmul_precision": str(opt.get("matmul_precision", "highest")),
        "compute_dtype": jnp.dtype(model.dtype).name
        if getattr(model, "dtype", None) is not None else "float32",
        "jax_version": jax.__version__,
        "calling_convention": exported.calling_convention_version,
        "weights": opt.get("path", {}).get("pretrain_network_g") or "(seeded init)",
    }
    if bucket_sizes:
        meta["bucket_batches"] = bucket_sizes
    # Write-to-temp + rename-after-check: a failed bit-exactness check must
    # not leave a known-bad (but valid-looking) artifact at the requested
    # path for a deploy glob or retry to pick up.
    # Decide the check verdict BEFORE writing: the weights-embedding payload
    # can be hundreds of MB, so the zip must be deflated exactly once. An
    # artifact stamped checked=true only survives if the verification below
    # passes (any failure deletes the tmp file on the way out).
    backend = jax.default_backend()
    will_check = check and backend in exported.platforms
    if check and not will_check:
        print(f"check skipped: current backend '{backend}' not in "
              f"exported platforms {list(exported.platforms)}")
    meta["checked"] = will_check

    tmp_path = out_path + ".tmp"
    with zipfile.ZipFile(tmp_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META_NAME, json.dumps(meta, indent=1))
        z.writestr(_MODULE_NAME, payload)
        for b, pl in bucket_payloads.items():
            z.writestr(_MODULE_NAME_BUCKET.format(b), pl)
    try:
        if will_check:
            loaded = ExportedEngine(tmp_path, batch_size=engine.batch_size)
            rng = np.random.RandomState(0)
            # `dims` is already the engine's per-sample input shape (5-D
            # frame-split for use_3d models), so one batch drives both
            # paths.
            x = (rng.rand(engine.batch_size, *dims) * 255).astype(np.uint8)
            ref = engine.run(x)
            got = loaded.run(x)
            if not np.array_equal(ref, got):
                raise AssertionError(
                    "exported artifact output differs from the live engine")
            # Each extra bucket program against the live engine running the
            # SAME batch shape (padding-free comparison: XLA may tile
            # different batch sizes differently, so same-shape is the
            # bit-exactness contract).
            for b in bucket_payloads:
                xb = (rng.rand(b, *dims) * 255).astype(np.uint8)
                ref_b = engine.fetch(engine.dispatch(xb, bucket=b))
                got_b = loaded.fetch(loaded.dispatch(xb, bucket=b))
                if not np.array_equal(ref_b, got_b):
                    raise AssertionError(
                        f"bucket-{b} program differs from the live engine")
            print(f"check ok: artifact matches the live engine bit-exactly "
                  f"on a random batch ({backend}"
                  + (f", buckets {bucket_sizes}" if bucket_sizes else "")
                  + ")")
        os.replace(tmp_path, out_path)
    except BaseException:
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        raise
    return meta


def read_artifact_meta(path: str) -> Dict[str, Any]:
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read(_META_NAME))
    if meta.get("format") != ARTIFACT_FORMAT:
        raise ValueError(
            f"{path}: unsupported artifact format {meta.get('format')!r} "
            f"(expected {ARTIFACT_FORMAT})")
    return meta


class ExportedEngine:
    """Drop-in InferenceEngine replacement backed by a `.ssrx` artifact.

    Exposes the same `batch_size` / `run` / `dispatch` / `fetch` / `run_many`
    surface the serving daemon and infer CLIs program against — but built
    from a deserialized jax.export module, so the host needs no model code.

    For symbolic-batch artifacts, `batch_size` fixes the serving batch (one
    executable); submitting other sizes works but compiles per shape.
    """

    def __init__(self, path: str, batch_size: Optional[int] = None,
                 default_batch_size: Optional[int] = None):
        import jax
        from jax import export as jax_export

        self.meta = read_artifact_meta(path)
        bucket_sizes = [int(b) for b in self.meta.get("bucket_batches", [])]
        with zipfile.ZipFile(path) as z:
            payload = z.read(_MODULE_NAME)
            bucket_payloads = {
                b: z.read(_MODULE_NAME_BUCKET.format(b))
                for b in bucket_sizes
                if _MODULE_NAME_BUCKET.format(b) in z.namelist()}
        self._exp = jax_export.deserialize(payload)
        backend = jax.default_backend()
        if backend not in self._exp.platforms:
            raise RuntimeError(
                f"{path} was exported for {list(self._exp.platforms)}; this "
                f"host's JAX backend is '{backend}'. Re-export with "
                f"--platforms {backend} (or including it).")
        self._call = jax.jit(self._exp.call)
        self.use_3d = bool(self.meta["use_3d"])
        self.n_frames = int(self.meta["n_lr_images"])
        # Precedence: explicit request > the artifact's pinned batch >
        # caller's default (serve passes the config's batch_size) > 64.
        fixed = self.meta.get("batch_size")
        self.fixed_batch = fixed is not None
        self.batch_size = int(batch_size or fixed or default_batch_size or 64)
        if fixed is not None and self.batch_size != int(fixed):
            raise ValueError(
                f"artifact has a fixed batch of {fixed}; requested "
                f"{self.batch_size} (use a --symbolic_batch export for "
                "variable batch sizes)")
        # Extra pre-lowered bucket programs (multi-bucket exports): the
        # daemon's small-batch dispatch works AOT with zero on-host lowering.
        self._calls = {self.batch_size: self._call}
        for b, pl in bucket_payloads.items():
            if b == self.batch_size:
                continue
            self._calls[b] = jax.jit(jax_export.deserialize(pl).call)
        self._bucket_sizes = sorted(self._calls)

    def round_bucket(self, b: int) -> int:
        """Smallest compiled batch shape >= b. Fixed-batch artifacts carry
        their `bucket_batches` programs (just the full batch for single-shape
        exports); symbolic-batch ones compile any size on demand."""
        if self.fixed_batch:
            for size in self._bucket_sizes:
                if size >= int(b):
                    return size
            return self.batch_size
        return min(self.batch_size, max(1, int(b)))

    def _prep(self, batch_np: np.ndarray,
              bucket: Optional[int] = None) -> np.ndarray:
        from .inference import prep_batch

        return prep_batch(np.ascontiguousarray(batch_np),
                          bucket or self.batch_size,
                          self.use_3d, self.n_frames)

    def dispatch(self, batch_np: np.ndarray,
                 bucket: Optional[int] = None) -> Tuple[int, Any]:
        import jax

        n = batch_np.shape[0]
        call = self._call
        if self.fixed_batch:
            # Only compiled shapes exist: route to the bucket's program
            # (round_bucket pins unknown sizes to a shipped shape).
            bucket = self.round_bucket(bucket) if bucket else self.batch_size
            call = self._calls[bucket]
        return n, call(jax.device_put(self._prep(batch_np, bucket)))

    def fetch(self, handle) -> np.ndarray:
        n, y = handle
        return np.asarray(y)[:n]

    def run(self, batch_np: np.ndarray) -> np.ndarray:
        return self.fetch(self.dispatch(batch_np))

    def run_many(self, batches: Iterable[np.ndarray], depth: int = 3):
        from .inference import pipelined

        return pipelined(self.dispatch, self.fetch, batches, depth)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-opt", type=str, required=True,
                        help="Path to an infer-style options yml.")
    parser.add_argument("-o", "--out", type=str, required=True,
                        help="Output artifact path (.ssrx).")
    parser.add_argument("--batch", type=int, default=None,
                        help="Fixed batch size (default: config batch_size).")
    parser.add_argument("--symbolic_batch", action="store_true",
                        help="Export a batch-polymorphic module instead.")
    parser.add_argument("--hw", type=int, default=32,
                        help="Square input window (32 = chunk/serving shape).")
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="Comma-separated lowering targets.")
    parser.add_argument("--check", action="store_true",
                        help="Reload the artifact and verify bit-exact "
                             "against the live engine.")
    parser.add_argument("--buckets", type=str, default="none",
                        help="Extra fixed-batch programs to ship for the "
                             "serving daemon's bucket dispatch: comma ints, "
                             "'auto' (batch/8, matching serve --buckets "
                             "auto), or 'none'.")
    args = parser.parse_args(argv)

    from .utils.jax_cache import enable_compilation_cache
    from .utils.options import yaml_load

    enable_compilation_cache()
    opt = yaml_load(args.opt)
    from .utils.lint import report_lint

    report_lint(opt, "infer")
    batch = int(args.batch or opt.get("batch_size", 64))
    buckets = None
    if args.buckets == "auto":
        buckets = [batch // 8] if batch >= 8 else None
    elif args.buckets not in ("none", ""):
        buckets = [int(b) for b in args.buckets.split(",") if b.strip()]
    meta = export_artifact(
        opt, args.out, batch_size=args.batch,
        symbolic_batch=args.symbolic_batch, hw=args.hw,
        platforms=[p.strip() for p in args.platforms.split(",") if p.strip()],
        check=args.check, buckets=buckets)
    import os

    print(f"exported {meta['model_type']} -> {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"platforms {meta['platforms']}, batch "
          f"{meta['batch_size'] if meta['batch_size'] else 'symbolic'}"
          + (f", buckets {meta['bucket_batches']}"
             if meta.get("bucket_batches") else "") + ")")


if __name__ == "__main__":
    main()
