"""SSR_TPU_COMPILER_OPTIONS -> ssr_jit plumbing.

Round-4 finding: on the hosted `axon` tunnel XLA_FLAGS cannot carry TPU
backend flags (the local parse_flags_from_env aborts — libtpu is remote);
PJRT per-program compiler options are the working channel. ssr_jit wraps
jax.jit at every hot compile site and injects the env-configured dict, so
scripts/xla_flag_sweep.py can probe compiler knobs per subprocess.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from satlas_sr_tpu.utils.jax_cache import compiler_options, ssr_jit


def test_compiler_options_absent(monkeypatch):
    monkeypatch.delenv("SSR_TPU_COMPILER_OPTIONS", raising=False)
    assert compiler_options() is None


def test_compiler_options_parsed_and_stringified(monkeypatch):
    monkeypatch.setenv("SSR_TPU_COMPILER_OPTIONS",
                       '{"xla_tpu_scoped_vmem_limit_kib": 65536}')
    assert compiler_options() == {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def test_compiler_options_rejects_non_object(monkeypatch):
    monkeypatch.setenv("SSR_TPU_COMPILER_OPTIONS", '["not", "a", "dict"]')
    with pytest.raises(ValueError, match="JSON object"):
        compiler_options()
    monkeypatch.setenv("SSR_TPU_COMPILER_OPTIONS", "not json")
    with pytest.raises(json.JSONDecodeError):
        compiler_options()


def test_ssr_jit_plain(monkeypatch):
    monkeypatch.delenv("SSR_TPU_COMPILER_OPTIONS", raising=False)

    @ssr_jit
    def f(x):
        return x * 2

    np.testing.assert_array_equal(np.asarray(f(jnp.ones(3))), 2 * np.ones(3))


def test_ssr_jit_kwargs_and_env_option(monkeypatch):
    # an option every backend accepts, so the test runs on CPU and TPU alike
    monkeypatch.setenv("SSR_TPU_COMPILER_OPTIONS",
                       '{"xla_backend_optimization_level": "2"}')

    def f(state, x):
        return state + x, state.sum()

    jf = ssr_jit(f, donate_argnums=(0,))
    out, s = jf(jnp.ones(4), jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(4))
    assert float(s) == 4.0
