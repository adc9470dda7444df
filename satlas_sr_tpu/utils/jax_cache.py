"""Persistent XLA compilation cache setup + platform pinning.

First compiles through the hosted AOT compiler are slow (minutes for the
production train step); enabling jax's persistent compilation cache makes
repeat CLI invocations start in seconds. Called by every CLI and bench.py.
Override the location with SSR_TPU_COMPILATION_CACHE; set it empty to disable.

SSR_TPU_PLATFORM pins the JAX platform list by config update — hosted TPU
plugins can override the standard JAX_PLATFORMS env var and then block CLI
startup retrying an unreachable device service; `SSR_TPU_PLATFORM=cpu` is the
reliable escape for CPU-only runs on such hosts (the doctor's device probe
uses a watchdog thread for the same reason, doctor.py _devices_with_timeout).
"""

from __future__ import annotations

import os


def pin_platform() -> None:
    plat = os.environ.get("SSR_TPU_PLATFORM")
    if not plat:
        return
    import jax

    # post-import config update outranks plugin-forced platform selection
    jax.config.update("jax_platforms", plat)


def enable_compilation_cache() -> None:
    pin_platform()
    cache_dir = os.environ.get(
        "SSR_TPU_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "satlas_sr_tpu_xla"),
    )
    if not cache_dir:
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is a best-effort optimisation
        pass
