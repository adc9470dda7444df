"""Spectral normalisation as explicit functional state (TPU/JAX-native).

The reference wraps discriminator convs in torch spectral_norm
(ssr/archs/discriminator_arch.py:26-39), which hides the power-iteration
vectors as module buffers mutated during forward. Functionally in JAX:
the u/v vectors live in a separate `spectral` variable collection that the
train step threads through explicitly; one power iteration per step runs under
stop_gradient (matching torch's no_grad iteration), and sigma is computed with
gradients flowing only through the weight.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2_normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / (jnp.linalg.norm(v) + eps)


class SNConv(nn.Module):
    """2D conv with spectral normalisation of the kernel.

    The kernel is stored HWIO; sigma is estimated on the (O, I*kh*kw) matrix
    (the same operator torch normalises), with u/v persisted in the
    `spectral` collection. Pass update_stats=True during training steps to run
    one power iteration and refresh u/v (mutable=['spectral'] in apply).
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    n_power_iterations: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (kh, kw, in_ch, self.features),
            jnp.float32,
        )
        out = self.features
        # Torch flattens OIHW -> (O, I*kh*kw); transpose to keep u/v importable.
        w_mat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(out, -1)

        u_var = self.variable(
            "spectral", "u",
            lambda: _l2_normalize(jax.random.normal(jax.random.PRNGKey(0), (out,))),
        )
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2_normalize(jax.random.normal(jax.random.PRNGKey(1), (w_mat.shape[1],))),
        )
        u, v = u_var.value, v_var.value

        if update_stats:
            w_ng = jax.lax.stop_gradient(w_mat)
            for _ in range(self.n_power_iterations):
                v = _l2_normalize(w_ng.T @ u)
                u = _l2_normalize(w_ng @ v)
            if not self.is_initializing():
                u_var.value = u
                v_var.value = v

        sigma = jnp.dot(jax.lax.stop_gradient(u), w_mat @ jax.lax.stop_gradient(v))
        w_bar = (kernel / sigma).astype(self.dtype)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w_bar,
            window_strides=tuple(self.strides),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y
