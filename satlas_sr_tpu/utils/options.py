"""YAML config system preserving the reference option-file schema.

Parity with ssr/utils/options.py: `-opt` YAML parsing, `--force_yml` nested
overrides (implemented safely without exec), `--debug` renaming + shortened
frequencies, `--auto_resume`, per-phase dataset injection (phase/scale), and
the experiments/results directory layout:
  experiments/<name>/{models,training_states,visualization}
  results/<name>/visualization
Known reference bugs intentionally fixed (SURVEY.md §5.6): missing `random`
import when manual_seed is absent; exec-based overrides.

Distributed: instead of torch.distributed NCCL init (options.py:64-74), the
launcher flag maps to jax.distributed.initialize(); rank == jax.process_index()
and world_size == jax.process_count().
"""

from __future__ import annotations

import argparse
import os
import random
import time
from typing import Any, Dict, Tuple

import yaml


def yaml_load(f: str) -> Dict[str, Any]:
    """Load YAML from a path or a literal string (insertion-ordered dicts)."""
    if os.path.isfile(f):
        with open(f, "r") as fh:
            return yaml.safe_load(fh)
    return yaml.safe_load(f)


def _postprocess_yml_value(value: str) -> Any:
    if value in ("~", "none", "None", "null"):
        return None
    if value.lower() == "true":
        return True
    if value.lower() == "false":
        return False
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    if value.startswith("["):
        return yaml.safe_load(value)
    return value


# Optional schema knobs the code reads with a default, so most configs omit
# them — creatable via --force_yml (e.g. the tune CLI's recommended overrides)
# without weakening the typo protection for everything else.
_FORCE_YML_CREATABLE = {
    "network_g:remat",
    "train:accum_steps",
    "compute_dtype",
}


def apply_force_yml(opt: Dict[str, Any], entries) -> None:
    """Apply `a:b:c=value` overrides in place (no new keys created, except
    the known optional-with-default knobs in _FORCE_YML_CREATABLE)."""
    for entry in entries or []:
        keys, value = entry.split("=", 1)
        keys = keys.strip().split(":")
        node = opt
        for k in keys[:-1]:
            node = node[k]
        path = ":".join(keys)
        if keys[-1] not in node and path not in _FORCE_YML_CREATABLE:
            raise KeyError(f"--force_yml cannot create new key {path}")
        node[keys[-1]] = _postprocess_yml_value(value.strip())


def init_distributed(launcher: str) -> Tuple[int, int]:
    """Map the reference launcher flag onto JAX multi-process init.

    Returns (rank, world_size). 'none' stays single-process; anything else
    calls jax.distributed.initialize() (coordinator discovery from env).
    """
    import jax

    # tolerate ONLY an already-initialized client (harness / launcher scripts
    # init first); any other failure must abort loudly — a silently-degraded
    # rank would rerun the FULL corpus and race peers on the same output
    # paths (ADVICE r2)
    if launcher != "none" and not jax.distributed.is_initialized():
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def parse_options(root_path: str, is_train: bool = True, argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to option YAML file.")
    parser.add_argument(
        "--launcher", choices=["none", "pytorch", "slurm", "jax"], default="none",
        help="job launcher ('jax' and the legacy names all map to jax.distributed)",
    )
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--local-rank", type=int, default=0)  # accepted, unused
    parser.add_argument(
        "--force_yml", nargs="+", default=None,
        help="Override yml entries, e.g. train:ema_decay=0.999",
    )
    args = parser.parse_args(argv)

    opt = yaml_load(args.opt)

    opt["dist"] = args.launcher != "none"
    opt["rank"], opt["world_size"] = init_distributed(args.launcher)

    # Overrides FIRST: `--force_yml manual_seed=N` must feed the derived
    # seed_with_rank below, or model seeding (manual_seed) and data-order
    # seeding (seed_with_rank) silently disagree.
    apply_force_yml(opt, args.force_yml)

    seed = opt.get("manual_seed")
    if seed is None:
        seed = random.randint(1, 10000)
        opt["manual_seed"] = seed
    opt["seed_with_rank"] = seed + opt["rank"]

    opt["auto_resume"] = args.auto_resume
    opt["is_train"] = is_train

    if args.debug and not opt["name"].startswith("debug"):
        opt["name"] = "debug_" + opt["name"]

    if opt.get("num_gpu") == "auto":
        import jax

        opt["num_gpu"] = jax.local_device_count()

    for phase, dataset in (opt.get("datasets") or {}).items():
        phase_key = phase.split("_")[0]
        dataset.setdefault("phase", phase_key)
        if "scale" in opt:
            dataset["scale"] = opt["scale"]
    for _, dataset in (opt.get("test_datasets") or {}).items():
        dataset.setdefault("phase", "test")
        if "scale" in opt:
            dataset.setdefault("scale", opt["scale"])

    path_opt = opt.setdefault("path", {})
    for key, val in list(path_opt.items()):
        if val is not None and ("resume_state" in key or "pretrain_network" in key):
            path_opt[key] = os.path.expanduser(val)

    if is_train:
        experiments_root = path_opt.get("experiments_root") or os.path.join(
            root_path, "experiments"
        )
        experiments_root = os.path.join(experiments_root, opt["name"])
        path_opt["experiments_root"] = experiments_root
        path_opt["models"] = os.path.join(experiments_root, "models")
        path_opt["training_states"] = os.path.join(experiments_root, "training_states")
        path_opt["log"] = experiments_root
        path_opt["visualization"] = os.path.join(experiments_root, "visualization")
        if "debug" in opt["name"]:
            if "val" in opt and opt["val"] is not None:
                opt["val"]["val_freq"] = 8
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = path_opt.get("results_root") or os.path.join(root_path, "results")
        results_root = os.path.join(results_root, opt["name"])
        path_opt["results_root"] = results_root
        path_opt["log"] = results_root
        path_opt["visualization"] = os.path.join(results_root, "visualization")

    from .lint import report_lint

    report_lint(opt, "train", rank=opt["rank"])

    return opt, args


def make_exp_dirs(opt: Dict[str, Any], archive_existing: bool = False) -> None:
    """Create the experiment/result directory tree.

    With archive_existing=True (fresh, non-resume training runs) a
    pre-existing experiment dir is renamed to <name>_archived_<timestamp>
    first, so a rerun never overwrites old results — the reference's basicsr
    mkdir_and_rename behavior (reached via ssr/train.py:41-45). Debug runs
    reuse the dir, as basicsr does; rank 0 performs the rename.
    """
    path_opt = opt["path"]
    if opt.get("is_train"):
        root = path_opt["experiments_root"]
        if archive_existing and "debug" not in opt["name"]:
            import jax

            if jax.process_index() == 0 and os.path.isdir(root):
                stamp = time.strftime("%Y%m%d_%H%M%S")
                archived = f"{root}_archived_{stamp}"
                if os.path.exists(archived):  # same-second rerun (tests)
                    archived = f"{archived}_{os.getpid()}"
                print(f"Experiment dir {root} exists — archiving to {archived}",
                      flush=True)
                os.rename(root, archived)
            if jax.process_count() > 1:
                # peers must not makedirs before (or during) rank 0's rename:
                # a peer-created tree would be archived as if it were old
                # results, or renamed out from under a concurrent makedirs
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("exp_dir_archive")
        for key in ("experiments_root", "models", "training_states", "visualization"):
            os.makedirs(path_opt[key], exist_ok=True)
    else:
        for key in ("results_root", "visualization"):
            os.makedirs(path_opt[key], exist_ok=True)


def copy_opt_file(opt_path: str, dest_dir: str) -> None:
    import shutil
    import sys
    import time

    os.makedirs(dest_dir, exist_ok=True)
    base = os.path.basename(opt_path)
    dest = os.path.join(dest_dir, base)
    shutil.copyfile(opt_path, dest)
    with open(dest, "a") as f:
        f.write(
            f"\n# Run: {time.strftime('%Y-%m-%d %H:%M:%S')} argv: {' '.join(sys.argv)}\n"
        )


def dict2str(opt: Dict[str, Any], indent_level: int = 1) -> str:
    msg = "\n"
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_level * 2) + k + ":["
            msg += dict2str(v, indent_level + 1)
            msg += " " * (indent_level * 2) + "]\n"
        else:
            msg += " " * (indent_level * 2) + f"{k}: {v}\n"
    return msg
