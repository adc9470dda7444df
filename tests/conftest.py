"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

This is the TPU-native analog of "test multi-node without a cluster"
(SURVEY.md §4): all sharding/mesh tests run against 8 virtual CPU devices via
xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Single-core CI box: avoid oversubscribing the host.
os.environ.setdefault("XLA_CPU_MULTI_THREAD_EIGEN", "false")

import jax

# The hosted TPU plugin ("axon") can override env-based platform selection;
# force the CPU backend explicitly so the virtual 8-device mesh is used.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
