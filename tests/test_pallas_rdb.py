"""Pallas fused-RDB kernel correctness (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satlas_sr_tpu.archs.rrdbnet import ResidualDenseBlock
from satlas_sr_tpu.ops.pallas.rdb import rdb_pallas, restructure_weights


@pytest.mark.parametrize("nf,g,tile", [(64, 32, 4), (16, 8, 2)])
def test_rdb_pallas_matches_reference(rng, nf, g, tile):
    x = jnp.asarray(rng.randn(tile * 2, 16, 16, nf).astype(np.float32))
    m = ResidualDenseBlock(nf, g, fused=False)
    v = m.init(jax.random.PRNGKey(0), x)
    y_ref = m.apply(v, x)
    p = v["params"]
    kernels = [p[f"conv{i+1}"]["kernel"] for i in range(5)]
    biases = [p[f"conv{i+1}"]["bias"] for i in range(5)]
    y_pal = rdb_pallas(x, kernels, biases, nf, g, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=2e-5, rtol=1e-4)


def test_restructure_weights_shapes(rng):
    nf, g = 64, 32
    kernels = [
        jnp.asarray(rng.randn(3, 3, nf + i * g, g if i < 4 else nf).astype(np.float32))
        for i in range(5)
    ]
    biases = [jnp.asarray(np.zeros(g if i < 4 else nf, np.float32)) for i in range(5)]
    ws, b = restructure_weights(kernels, biases, nf, g)
    assert [w.shape for w in ws] == [
        (3, 3, 64, 192), (3, 3, 32, 160), (3, 3, 32, 128), (3, 3, 32, 96), (3, 3, 32, 64),
    ]
    assert b.shape == (192,)
