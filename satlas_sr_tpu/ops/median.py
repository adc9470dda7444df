"""Lower-median reduction matching torch.median.

torch.median returns the LOWER of the two middle elements for even-length
inputs (unlike numpy/jnp.median which averages). SRCNN's reference frame is a
torch.median over revisits (ssr/archs/srcnn_arch.py:125-140), so checkpoint
parity requires the lower-median semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lower_median(x: jax.Array, axis: int, keepdims: bool = False) -> jax.Array:
    n = x.shape[axis]
    sorted_x = jnp.sort(x, axis=axis)
    idx = (n - 1) // 2
    med = jax.lax.index_in_dim(sorted_x, idx, axis=axis, keepdims=keepdims)
    return med
