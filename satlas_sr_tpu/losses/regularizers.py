"""GAN regularizers (parity with the basicsr re-exports at
ssr/losses/__init__.py:7,11: r1_penalty, gradient_penalty_loss,
g_path_regularize).

None of the reference configs enable these, but they are part of the exported
loss surface. JAX-native: each is a jax.grad/jvp composition over the
discriminator/generator apply function — no retain_graph machinery needed.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def r1_penalty(disc_fn: Callable, real: jax.Array) -> jax.Array:
    """R1: E[ ||grad_x D(x)||^2 ] on real images (StyleGAN2 lazy-R1 form)."""

    def scalar_out(x):
        return jnp.sum(disc_fn(x))

    grads = jax.grad(scalar_out)(real)
    return jnp.mean(jnp.sum(jnp.square(grads.reshape(real.shape[0], -1)), axis=1))


def gradient_penalty_loss(
    disc_fn: Callable,
    real: jax.Array,
    fake: jax.Array,
    rng: jax.Array,
    weight: Optional[jax.Array] = None,
) -> jax.Array:
    """WGAN-GP: (||grad D(x_interp)|| - 1)^2 on real/fake interpolations."""
    alpha = jax.random.uniform(rng, (real.shape[0],) + (1,) * (real.ndim - 1))
    interp = real * alpha + fake * (1.0 - alpha)

    def scalar_out(x):
        return jnp.sum(disc_fn(x))

    grads = jax.grad(scalar_out)(interp)
    if weight is not None:
        grads = grads * weight
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(real.shape[0], -1)), axis=1) + 1e-12)
    loss = jnp.mean(jnp.square(norms - 1.0))
    if weight is not None:
        loss = loss / jnp.mean(weight)
    return loss


def g_path_regularize(
    gen_fn: Callable,
    latents: jax.Array,
    rng: jax.Array,
    mean_path_length: jax.Array,
    decay: float = 0.01,
):
    """StyleGAN2 path-length regularizer.

    Returns (penalty, detached path_lengths, updated mean_path_length).
    Uses a jvp with image-normalised noise instead of torch's grad-of-noised
    output — same quantity, one forward-mode pass.
    """
    fake = gen_fn(latents)
    h, w = fake.shape[1], fake.shape[2]
    noise = jax.random.normal(rng, fake.shape) / jnp.sqrt(h * w)

    # path length = ||J^T noise|| via vjp
    _, vjp_fn = jax.vjp(gen_fn, latents)
    (grads,) = vjp_fn(noise)
    path_lengths = jnp.sqrt(
        jnp.sum(jnp.square(grads.reshape(latents.shape[0], -1)), axis=1) + 1e-12
    )
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean(jnp.square(path_lengths - path_mean))
    return penalty, jax.lax.stop_gradient(path_lengths), jax.lax.stop_gradient(path_mean)
