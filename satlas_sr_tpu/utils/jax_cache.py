"""Persistent XLA compilation cache setup.

First compiles through the hosted AOT compiler are slow (minutes for the
production train step); enabling jax's persistent compilation cache makes
repeat CLI invocations start in seconds. Called by every CLI and bench.py.
Override the location with SSR_TPU_COMPILATION_CACHE; set it empty to disable.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
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
