"""Preflight diagnostics CLI: validate a config + environment before a run.

    python -m satlas_sr_tpu.doctor -opt options/esrgan_s2naip_urban.yml

Checks (none of which the reference offers — a bad path or typo'd key
there surfaces minutes into a GPU job, or never):

- config lint: unknown keys / bad enum values, with did-you-mean
  (utils/lint.py — same warnings the CLIs print at startup),
- filesystem: dataset roots, pretrained checkpoints, resume state,
  OSM json / tile weights exist and are non-empty,
- consistency: network_g.num_in_ch vs n_s2_images (the reference ships
  stale 36-channel values, SURVEY §5.6), n_lr_images for infer configs,
- towers: which perceptual/CLIP/LPIPS weights resolve (config key, env
  var, or MISSING → seeded random tower + `(untrained-tower)` tags),
- runtime: JAX platform + device count vs num_gpu, native PNG codec
  loaded or PIL fallback, persistent XLA compile cache writable.

Exit status: 1 if any ERROR (a run would fail or silently mis-train),
else 0. `--strict` also fails on warnings.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any, Dict, List, Tuple

from .utils.lint import lint_options
from .utils.options import yaml_load

OK, WARN, ERR = "ok", "WARNING", "ERROR"


class Report:
    def __init__(self) -> None:
        self.rows: List[Tuple[str, str, str]] = []
        self.fetchable: List[str] = []  # registry artifacts for missing files

    def add(self, level: str, area: str, msg: str) -> None:
        self.rows.append((level, area, msg))

    def emit(self) -> Tuple[int, int]:
        width = max((len(a) for _, a, _ in self.rows), default=0)
        for level, area, msg in self.rows:
            tag = {OK: "  ok  ", WARN: " WARN ", ERR: "ERROR "}[level]
            print(f"[{tag}] {area:<{width}}  {msg}")
        if self.fetchable:
            names = " ".join(dict.fromkeys(self.fetchable))  # dedup, ordered
            print(f"\nhint: missing artifact(s) are downloadable — "
                  f"python -m satlas_sr_tpu.fetch get {names} --dest <dir>")
        errors = sum(1 for l, _, _ in self.rows if l == ERR)
        warns = sum(1 for l, _, _ in self.rows if l == WARN)
        return errors, warns


def _fetch_artifact_for(area: str, path: str) -> str:
    """Map a missing config path to a fetch-registry artifact name, if any
    (the registry mirrors the reference README's Download tables)."""
    from .fetch import REGISTRY

    stem = os.path.basename(path)
    for suffix in (".pth", ".tar", ".json"):
        stem = stem.removesuffix(suffix)
    if stem in REGISTRY:  # e.g. pretrain_network_g: weights/esrgan_8S2.pth
        return stem
    aliases = {"srcnn_s2naip": "srcnn", "highresnet_s2naip": "highresnet"}
    if stem in aliases:
        return aliases[stem]
    if area.endswith(".tile_weights"):
        return "train_tile_weights"
    if area.endswith(".osm_objs_path"):
        return "osm_chips_to_masks"
    # dataset roots: .../{set_name}/{naip|sentinel2}
    for part in os.path.normpath(path).split(os.sep):
        if part in ("train_urban_set", "train_full_set", "val_set",
                    "small_val_set", "test_set", "old_naip"):
            return part
    return ""


def _check_file(rep: Report, area: str, path: Any, required: bool) -> None:
    if not path:
        return
    path = os.path.expanduser(str(path))
    if not os.path.exists(path):
        rep.add(ERR if required else WARN, area, f"missing: {path}")
        artifact = _fetch_artifact_for(area, path)
        if artifact:
            rep.fetchable.append(artifact)
    elif os.path.isfile(path) and os.path.getsize(path) == 0:
        rep.add(ERR, area, f"empty file: {path}")
    else:
        rep.add(OK, area, path)


def _check_config(rep: Report, opt: Dict[str, Any], kind: str) -> None:
    warnings = lint_options(opt, kind)
    for w in warnings:
        rep.add(WARN, "config", w)
    if not warnings:
        rep.add(OK, "config", "no unknown keys")

    # Perf hint, not a warning: f32 remains the strict-parity option, but
    # bf16 measured 1.33x faster through the FULL train CLI at ±0.002 dB
    # val-PSNR trajectory equivalence over 300 iters on the ESRGAN family
    # (docs/sweeps/dtype_equiv_r5.json) — the shipped ESRGAN configs now
    # default to it; f32 configs get the pointer. The L2 family measured
    # OUT of bar (0.127 dB at 300 iters, docs/sweeps/dtype_equiv_l2_r5.json)
    # so there the hint states the measured cost instead of recommending.
    dtype = str(opt.get("compute_dtype", "float32")).lower()
    if kind == "train" and dtype in ("float32", "f32"):
        if str(opt.get("model_type", "")) == "L2Model":
            rep.add(OK, "perf",
                    "compute_dtype: float32 — the measured default for the "
                    "L2 family: bfloat16 is 1.25x faster but drifts 0.127 dB "
                    "val PSNR over 300 iters, 2.5x the 0.05 dB bar "
                    "(docs/sweeps/dtype_equiv_l2_r5.json)")
        else:
            rep.add(OK, "perf",
                    "compute_dtype: float32 (strict parity) — bfloat16 "
                    "measured 1.33x faster train at ±0.002 dB trajectory "
                    "equivalence (ESRGAN family, "
                    "docs/sweeps/dtype_equiv_r5.json); verify your recipe "
                    "with scripts/dtype_train_equiv.py and retune "
                    "batch/remat after flipping (python -m satlas_sr_tpu.tune)")

    path_opt = opt.get("path") or {}
    _check_file(rep, "path.pretrain_network_g",
                path_opt.get("pretrain_network_g"), required=True)
    _check_file(rep, "path.pretrain_network_d",
                path_opt.get("pretrain_network_d"), required=True)
    _check_file(rep, "path.resume_state", path_opt.get("resume_state"),
                required=True)

    if kind == "infer":
        from .utils.infer_utils import channels_per_frame

        _check_file(rep, "data_dir", opt.get("data_dir"), required=True)
        n_lr = opt.get("n_lr_images")
        num_in = (opt.get("network_g") or {}).get("num_in_ch")
        c = channels_per_frame(opt.get("s2_bands"))
        if n_lr and num_in and int(num_in) != c * int(n_lr):
            rep.add(ERR, "consistency",
                    f"network_g.num_in_ch={num_in} but n_lr_images={n_lr} "
                    f"stacks {c * int(n_lr)} channels"
                    + (f" with s2_bands={opt['s2_bands']}"
                       if opt.get("s2_bands") else ""))
        return

    for section in ("datasets", "test_datasets"):
        for name, ds in (opt.get(section) or {}).items():
            area = f"{section}.{name}"
            _check_file(rep, f"{area}.sentinel2_path",
                        ds.get("sentinel2_path"), required=True)
            _check_file(rep, f"{area}.naip_path", ds.get("naip_path"),
                        required=True)
            _check_file(rep, f"{area}.osm_objs_path", ds.get("osm_objs_path"),
                        required=True)
            _check_file(rep, f"{area}.tile_weights", ds.get("tile_weights"),
                        required=True)
            _check_file(rep, f"{area}.old_naip_path", ds.get("old_naip_path"),
                        required=True)
            n_s2 = ds.get("n_s2_images")
            num_in = (opt.get("network_g") or {}).get("num_in_ch")
            if (name == "train" and n_s2 and num_in and not ds.get("use_3d")
                    and int(num_in) != 3 * int(n_s2)):
                rep.add(WARN, "consistency",
                        f"network_g.num_in_ch={num_in} vs n_s2_images={n_s2} "
                        f"(={3 * int(n_s2)} channels) — the trainer corrects "
                        f"this with a warning, as for the reference's stale "
                        f"36-channel configs")


def _tower_source(cfg_path: Any, env_var: str) -> str:
    if cfg_path:
        p = os.path.expanduser(str(cfg_path))
        return f"config path {p}" if os.path.exists(p) \
            else f"MISSING config path {p}"
    env = os.environ.get(env_var)
    if env:
        return f"env {env_var}={env}" if os.path.exists(env) \
            else f"MISSING env {env_var}={env}"
    return ""


def _check_towers(rep: Report, opt: Dict[str, Any]) -> None:
    train_opt = opt.get("train") or {}
    wants = []
    if train_opt.get("perceptual_opt"):
        wants.append(("perceptual VGG19",
                      train_opt["perceptual_opt"].get("vgg_weights_path"),
                      "SSR_TPU_VGG19_WEIGHTS"))
    if train_opt.get("clip_opt"):
        wants.append(("CLIP loss tower",
                      train_opt["clip_opt"].get("clip_weights_path"),
                      "SSR_TPU_CLIP_WEIGHTS"))
    for section in ("val", "test"):
        for mname, m in ((opt.get(section) or {}).get("metrics") or {}).items():
            t = (m or {}).get("type")
            if t == "calculate_lpips":
                wants.append((f"{section}.metrics.{mname} LPIPS",
                              m.get("lpips_weights_path"),
                              "SSR_TPU_LPIPS_WEIGHTS"))
            elif t == "calculate_clipscore":
                wants.append((f"{section}.metrics.{mname} CLIPScore",
                              m.get("clip_weights_path"),
                              "SSR_TPU_CLIP_WEIGHTS"))
    for label, cfg_path, env_var in wants:
        src = _tower_source(cfg_path, env_var)
        if not src:
            rep.add(WARN, "towers",
                    f"{label}: no weights configured ({env_var} unset) — "
                    f"runs as a seeded random tower, tagged (untrained-tower)")
        elif src.startswith("MISSING"):
            rep.add(ERR, "towers", f"{label}: {src}")
        else:
            rep.add(OK, "towers", f"{label}: {src}")


def _devices_with_timeout(timeout_s: float):
    """jax.devices() in a daemon thread: a dead TPU tunnel blocks backend
    init in an uninterruptible retry loop (the hosted plugin can even
    override JAX_PLATFORMS=cpu) — the doctor must report that, not hang."""
    import threading

    box: Dict[str, Any] = {}

    def probe() -> None:
        try:
            import jax

            box["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report, never raise
            box["error"] = e

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        box["timeout"] = True
    return box


def _check_runtime(rep: Report, opt: Dict[str, Any],
                   device_timeout_s: float = 60.0) -> None:
    box = _devices_with_timeout(device_timeout_s)
    if box.get("timeout"):
        rep.add(ERR, "devices",
                f"backend init did not complete within {device_timeout_s:.0f}s "
                f"— TPU tunnel/plugin unreachable (runs would block the same "
                f"way)")
    elif "error" in box:
        rep.add(ERR, "devices", f"jax backend failed to initialise: {box['error']}")
    try:
        devs = box.get("devices")
        if not devs:
            raise RuntimeError("no devices")
        rep.add(OK, "devices",
                f"{len(devs)} x {devs[0].platform} (backend ready)")
        num_gpu = opt.get("num_gpu")
        if isinstance(num_gpu, int) and num_gpu > len(devs):
            rep.add(WARN, "devices",
                    f"num_gpu={num_gpu} but only {len(devs)} local devices")
        sp = int(opt.get("spatial_shards", 1) or 1)
        if sp > 1 and len(devs) % sp != 0:
            rep.add(ERR, "devices",
                    f"spatial_shards={sp} does not divide device count {len(devs)}")
    except Exception:  # already reported above
        pass

    from .utils import native_png

    if native_png.available():
        rep.add(OK, "native png", "C++ libpng codec loaded (GIL-free)")
    else:
        rep.add(WARN, "native png",
                "native codec unavailable — PIL fallback (slower host path); "
                "build with native/build.sh")

    cache_dir = os.environ.get(
        "SSR_TPU_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "satlas_sr_tpu_xla"))
    if not cache_dir:
        rep.add(WARN, "xla cache", "disabled (SSR_TPU_COMPILATION_CACHE empty) "
                                   "— every restart recompiles")
    else:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            probe = os.path.join(cache_dir, ".doctor_probe")
            with open(probe, "w") as f:
                f.write("ok")
            os.remove(probe)
            rep.add(OK, "xla cache", f"writable: {cache_dir}")
        except OSError as e:
            rep.add(WARN, "xla cache", f"not writable ({e}) — every restart "
                                       f"recompiles")


def run_doctor(opt: Dict[str, Any], strict: bool = False,
               check_runtime: bool = True) -> int:
    kind = "infer" if "data_dir" in opt else "train"
    rep = Report()
    rep.add(OK, "schema", f"linting as a {kind} config")
    _check_config(rep, opt, kind)
    _check_towers(rep, opt)
    if check_runtime:
        _check_runtime(rep, opt)
    errors, warns = rep.emit()
    weights = (opt.get("path") or {}).get("pretrain_network_g")
    if weights and os.path.isfile(os.path.expanduser(str(weights))):
        # real weights on disk: the north-star parity check is one command
        print("\nhint: weights present — validate PSNR parity with "
              f"`python -m satlas_sr_tpu.acceptance --weights {weights} "
              "--data <val_root>` (writes PARITY_RESULTS.json)")
    print(f"\n{errors} error(s), {warns} warning(s)")
    if errors or (strict and warns):
        return 1
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-opt", type=str, required=True,
                        help="Path to the option YAML to diagnose.")
    parser.add_argument("--strict", action="store_true",
                        help="Exit nonzero on warnings too.")
    parser.add_argument("--no_runtime", action="store_true",
                        help="Skip device/codec/cache checks (config only).")
    args = parser.parse_args(argv)
    opt = yaml_load(args.opt)
    return run_doctor(opt, strict=args.strict,
                      check_runtime=not args.no_runtime)


if __name__ == "__main__":
    sys.exit(main())
