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

import json
import os


def compiler_options() -> "dict | None":
    """Extra XLA compiler options from SSR_TPU_COMPILER_OPTIONS (JSON dict).

    e.g. SSR_TPU_COMPILER_OPTIONS='{"xla_tpu_scoped_vmem_limit_kib":"65536"}'

    Measured on the hosted `axon` tunnel (round 4): XLA_FLAGS cannot carry
    TPU backend flags at all — the local client's parse_flags_from_env
    aborts on unknown --xla_tpu_* flags because libtpu is remote. PJRT
    compiler_options ride each compile request to the remote compiler
    instead (verified accepted), and are the JAX-idiomatic per-program
    mechanism anyway. scripts/xla_flag_sweep.py sweeps through this hook.
    """
    raw = os.environ.get("SSR_TPU_COMPILER_OPTIONS")
    if not raw:
        return None
    opts = json.loads(raw)
    if not isinstance(opts, dict):
        raise ValueError(
            f"SSR_TPU_COMPILER_OPTIONS must be a JSON object, got {raw!r}")
    return {str(k): str(v) for k, v in opts.items()}


def ssr_jit(fun=None, **jit_kwargs):
    """jax.jit wrapper that injects env-configured XLA compiler options.

    Drop-in for the framework's hot jit sites (inference engine, train/eval
    steps) so a single env var reaches every compiled program without
    threading a parameter through every constructor. Usable as @ssr_jit or
    ssr_jit(f, donate_argnums=...).
    """
    import jax

    opts = compiler_options()
    if opts:
        merged = dict(opts)
        merged.update(jit_kwargs.pop("compiler_options", None) or {})
        jit_kwargs["compiler_options"] = merged
    if fun is None:
        return lambda f: jax.jit(f, **jit_kwargs)
    return jax.jit(fun, **jit_kwargs)


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
