"""GAN regularizer correctness tests."""

import numpy as np

import jax
import jax.numpy as jnp

from satlas_sr_tpu.losses import g_path_regularize, gradient_penalty_loss, r1_penalty


def _linear_disc(w):
    return lambda x: jnp.sum(x * w, axis=(1, 2, 3))


def test_r1_penalty_linear_disc(rng):
    """For D(x) = <w, x>, grad_x D = w everywhere -> penalty = ||w||^2."""
    w = jnp.asarray(rng.randn(4, 4, 3).astype(np.float32))
    x = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
    pen = r1_penalty(_linear_disc(w), x)
    np.testing.assert_allclose(float(pen), float(jnp.sum(w**2)), rtol=1e-5)


def test_gradient_penalty_linear_disc(rng):
    """Linear D -> gradient norm constant = ||w|| -> penalty = (||w||-1)^2."""
    w = jnp.asarray(rng.randn(4, 4, 3).astype(np.float32))
    real = jnp.asarray(rng.rand(3, 4, 4, 3).astype(np.float32))
    fake = jnp.asarray(rng.rand(3, 4, 4, 3).astype(np.float32))
    pen = gradient_penalty_loss(_linear_disc(w), real, fake, jax.random.PRNGKey(0))
    expected = (float(jnp.linalg.norm(w)) - 1.0) ** 2
    np.testing.assert_allclose(float(pen), expected, rtol=1e-4)


def test_g_path_regularize_runs(rng):
    gen = lambda z: jnp.tanh(z).reshape(z.shape[0], 4, 4, 3)
    latents = jnp.asarray(rng.randn(2, 48).astype(np.float32))
    pen, lengths, mean = g_path_regularize(
        gen, latents, jax.random.PRNGKey(0), jnp.zeros(())
    )
    assert np.isfinite(float(pen))
    assert lengths.shape == (2,)
    assert float(mean) > 0
