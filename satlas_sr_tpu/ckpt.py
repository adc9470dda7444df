"""Checkpoint inspector CLI: identify, verify and summarise any checkpoint.

    python -m satlas_sr_tpu.ckpt experiments/run/models/net_g_5000.msgpack
    python -m satlas_sr_tpu.ckpt weights/esrgan_8S2.pth --full
    python -m satlas_sr_tpu.ckpt experiments/run/orbax --json

Handles every format the framework reads or writes (the reference offers
nothing comparable — debugging a .pth means an interactive torch session):

- native `.msgpack`/`.ckpt` network weights and `.state` training states:
  integrity (crc footer / legacy parse), collections, per-layer shapes,
- reference torch `.pth` (`params`/`params_ema` keys, weights_only load),
- orbax roots (`train.checkpoint_backend: orbax`): committed steps,
  in-flight tmp dirs.

Exit status: 0 readable+intact, 1 corrupt/unreadable/missing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict, List, Tuple

import numpy as np


def _walk_leaves(tree: Any, prefix: str = "") -> List[Tuple[str, Any]]:
    if isinstance(tree, dict):
        out: List[Tuple[str, Any]] = []
        for k in sorted(tree, key=str):
            p = f"{prefix}.{k}" if prefix else str(k)
            out.extend(_walk_leaves(tree[k], p))
        return out
    if isinstance(tree, (list, tuple)):  # optax states restore as lists
        out = []
        for i, v in enumerate(tree):
            p = f"{prefix}[{i}]" if prefix else f"[{i}]"
            out.extend(_walk_leaves(v, p))
        return out
    return [(prefix, tree)]


def _leaf_info(v: Any) -> Tuple[Tuple[int, ...], str, int]:
    a = np.asarray(v)
    if a.dtype.kind in "OUS":  # strings/objects are values, not tensors
        raise TypeError(f"non-tensor leaf {a.dtype}")
    return tuple(a.shape), str(a.dtype), int(a.size)


def summarize_tree(tree: Any) -> Dict[str, Any]:
    """Per-top-level-collection tensor/param/byte counts + leaf table."""
    collections: Dict[str, Dict[str, int]] = {}
    leaves = []
    for path, v in _walk_leaves(tree):
        try:
            shape, dtype, size = _leaf_info(v)
        except Exception:  # non-array leaf (e.g. a str in a state tree)
            leaves.append({"path": path, "value": repr(v)})
            continue
        top = path.split(".", 1)[0]
        c = collections.setdefault(top, {"tensors": 0, "params": 0, "bytes": 0})
        c["tensors"] += 1
        c["params"] += size
        c["bytes"] += size * np.dtype(dtype).itemsize
        leaves.append({"path": path, "shape": list(shape), "dtype": dtype})
    return {"collections": collections, "leaves": leaves}


def inspect_native(path: str) -> Dict[str, Any]:
    from .utils.checkpoint import (CheckpointCorruptError, has_crc_footer,
                                   verify_payload_bytes)

    with open(path, "rb") as f:
        blob = f.read()
    info: Dict[str, Any] = {
        "format": "native-msgpack",
        "size_bytes": len(blob),
        "integrity": ("crc-footer" if has_crc_footer(blob)
                      else "legacy (no footer)"),
    }
    try:
        from flax import serialization

        tree = serialization.msgpack_restore(verify_payload_bytes(blob, path))
    except CheckpointCorruptError as e:
        info["status"] = "CORRUPT"
        info["error"] = str(e)
        return info
    except Exception as e:  # legacy footer-less file that fails to parse
        info["status"] = "CORRUPT"
        info["error"] = f"unreadable checkpoint ({e})"
        return info
    info["status"] = "ok"
    if isinstance(tree, dict) and "step" in tree:
        try:
            info["step"] = int(np.asarray(tree["step"]))
        except Exception:
            pass
    info.update(summarize_tree(tree))
    return info


def inspect_torch(path: str) -> Dict[str, Any]:
    import torch

    info: Dict[str, Any] = {"format": "torch-pth",
                            "size_bytes": os.path.getsize(path)}
    try:
        state = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        info["status"] = "CORRUPT"
        info["error"] = str(e)
        return info
    info["status"] = "ok"
    if isinstance(state, dict) and any(
            k in state for k in ("params", "params_ema")):
        info["param_keys"] = sorted(state.keys())
        tree = {k: {n: t for n, t in v.items()} if hasattr(v, "items") else v
                for k, v in state.items()}
    else:
        info["param_keys"] = []
        tree = state
    info.update(summarize_tree(tree))
    return info


def inspect_orbax(root: str) -> Dict[str, Any]:
    from .utils.orbax_io import latest_committed_step

    steps = sorted(int(n) for n in os.listdir(root)
                   if n.isdigit() and os.path.isdir(os.path.join(root, n)))
    tmp = sorted(n for n in os.listdir(root) if "orbax-checkpoint-tmp" in n)
    return {
        "format": "orbax-root",
        "status": "ok" if steps else "empty",
        "committed_steps": steps,
        "latest_step": latest_committed_step(root),
        "in_flight": tmp,
    }


def inspect(path: str) -> Dict[str, Any]:
    if not os.path.exists(path):
        return {"format": "?", "status": "MISSING", "error": path}
    if os.path.isdir(path):
        return inspect_orbax(path)
    if path.endswith(".pth"):
        return inspect_torch(path)
    return inspect_native(path)


def _human(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024 or unit == "GiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024
    return f"{n:.1f} GiB"


def print_report(info: Dict[str, Any], full: bool = False) -> None:
    print(f"format:    {info['format']}")
    print(f"status:    {info['status']}")
    for key in ("error", "integrity", "step", "param_keys", "latest_step",
                "committed_steps", "in_flight"):
        if info.get(key) not in (None, [], {}):
            print(f"{key + ':':<11}{info[key]}")
    if "size_bytes" in info:
        print(f"size:      {_human(info['size_bytes'])}")
    for name, c in (info.get("collections") or {}).items():
        print(f"  {name}: {c['tensors']} tensors, {c['params']:,} params, "
              f"{_human(c['bytes'])}")
    if full:
        for leaf in info.get("leaves", []):
            if "shape" in leaf:
                print(f"    {leaf['path']}  {tuple(leaf['shape'])} {leaf['dtype']}")
            else:
                print(f"    {leaf['path']}  {leaf['value']}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("path", help=".msgpack/.ckpt/.state/.pth file or orbax dir")
    parser.add_argument("--full", action="store_true",
                        help="print every tensor (path, shape, dtype)")
    parser.add_argument("--json", action="store_true",
                        help="machine-readable output")
    args = parser.parse_args(argv)
    info = inspect(args.path)
    if args.json:
        print(json.dumps(info, default=str))
    else:
        print_report(info, full=args.full)
    return 0 if info["status"] in ("ok", "empty") else 1


if __name__ == "__main__":
    sys.exit(main())
