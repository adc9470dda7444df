"""Checkpoint save/load: native msgpack PyTrees + reference .pth import.

Network weights:
- native format: flax.serialization msgpack of the variables dict (fast, no
  pickle), extension .msgpack
- reference format: torch .pth state dicts under `params`/`params_ema`
  (utils/torch_io.py importers) — the released esrgan_*S2.pth checkpoints load
  directly.

Training state (step, optimizer states, EMA, spectral stats, RNG) is one
PyTree serialised the same way; see models/base.py for the cadence
(save_checkpoint_freq) and resume semantics mirroring the reference
(SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional


def save_pytree(path: str, tree: Any) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_pytree(path: str, target: Any = None) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)


def load_network_variables(
    arch_type: str,
    path: str,
    arch_opt: Optional[Dict] = None,
    param_key: Optional[str] = "params_ema",
) -> Dict[str, Any]:
    """Load network variables from either a native .msgpack or a torch .pth."""
    if path.endswith((".msgpack", ".ckpt")):
        return load_pytree(path)
    from .torch_io import import_torch_checkpoint

    return import_torch_checkpoint(arch_type, path, arch_opt, param_key)
