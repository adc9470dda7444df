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

Integrity: every file written here is atomic (tmp + rename) AND carries a
16-byte footer (magic, crc32, payload length) so a torn/corrupted file — e.g.
a node killed mid-write on shared storage, where rename atomicity can't be
assumed — is DETECTED at resume time instead of feeding garbage weights into
a long run. Legacy footer-less files (round-1 checkpoints) still load; their
corruption surfaces as a parse error, which callers treat the same way.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Any, Dict, Optional

_FOOTER_MAGIC = b"SSRT"
_FOOTER = struct.Struct("<4sIQ")  # magic, crc32(payload), payload length


class CheckpointCorruptError(RuntimeError):
    """A checkpoint file failed its integrity check (torn write / bit rot)."""


def save_pytree(path: str, tree: Any) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(tree)
    footer = _FOOTER.pack(_FOOTER_MAGIC, zlib.crc32(data) & 0xFFFFFFFF, len(data))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.write(footer)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def has_crc_footer(blob: bytes) -> bool:
    """True iff `blob` ends in this module's integrity footer."""
    return len(blob) >= _FOOTER.size and blob[-_FOOTER.size:][:4] == _FOOTER_MAGIC


def verify_payload_bytes(blob: bytes, path: str = "<bytes>") -> bytes:
    """Strip + verify the integrity footer of an in-memory checkpoint blob.

    Returns the payload (the whole blob for legacy footer-less files);
    raises CheckpointCorruptError on truncation or crc mismatch."""
    if len(blob) >= _FOOTER.size:
        magic, crc, length = _FOOTER.unpack(blob[-_FOOTER.size:])
        if magic == _FOOTER_MAGIC:
            payload = blob[:-_FOOTER.size]
            if len(payload) != length:
                raise CheckpointCorruptError(
                    f"{path}: truncated checkpoint ({len(payload)} of {length} bytes)"
                )
            if (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
                raise CheckpointCorruptError(f"{path}: checkpoint crc mismatch")
            return payload
    return blob  # legacy footer-less file


def _read_payload(path: str) -> bytes:
    """Read a checkpoint payload, verifying the integrity footer if present."""
    with open(path, "rb") as f:
        blob = f.read()
    return verify_payload_bytes(blob, path)


def load_pytree(path: str, target: Any = None) -> Any:
    from flax import serialization

    data = _read_payload(path)
    try:
        if target is None:
            return serialization.msgpack_restore(data)
        return serialization.from_bytes(target, data)
    except CheckpointCorruptError:
        raise
    except Exception as e:  # legacy file with no footer that fails to parse
        raise CheckpointCorruptError(f"{path}: unreadable checkpoint ({e})") from e


def verify_pytree_file(path: str) -> bool:
    """True iff `path` is a readable, integrity-intact checkpoint.

    Footer-carrying files are proven by their crc (cheap); legacy footer-less
    files require a full msgpack parse.
    """
    try:
        with open(path, "rb") as f:
            blob = f.read()
    except OSError:
        return False
    if not blob:
        return False
    if len(blob) >= _FOOTER.size and blob[-_FOOTER.size:][:4] == _FOOTER_MAGIC:
        try:
            _read_payload(path)
            return True
        except CheckpointCorruptError:
            return False
    try:
        from flax import serialization

        serialization.msgpack_restore(blob)
        return True
    except Exception:
        return False


def load_network_variables(
    arch_type: str,
    path: str,
    arch_opt: Optional[Dict] = None,
    param_key: Optional[str] = "params_ema",
) -> Dict[str, Any]:
    """Load network variables from either a native .msgpack or a torch .pth.

    Both branches honor `param_key` with the same params_ema -> params
    fallback: a saved net_g .msgpack carries BOTH collections, and returning
    it raw would make model.apply() silently read the raw (non-EMA) weights
    while the .pth import of the same run correctly extracts EMA. Auxiliary
    collections (e.g. the discriminator's 'spectral') ride along untouched.
    """
    if path.endswith((".msgpack", ".ckpt")):
        blob = load_pytree(path)
        if not param_key or not isinstance(blob, dict):
            return blob
        for key in (param_key, "params_ema", "params"):
            if key in blob:
                out = {k: v for k, v in blob.items()
                       if k not in ("params", "params_ema")}
                out["params"] = blob[key]
                return out
        return blob
    from .torch_io import import_torch_checkpoint

    return import_torch_checkpoint(arch_type, path, arch_opt, param_key)
