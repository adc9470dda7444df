"""OSM-object discriminator: U-Net SN trunk + object branch with self-attention.

Capability parity with ssr/archs/osm_obj_discriminator_arch.py:34-108: the
per-pixel U-Net discriminator plus a parallel branch scoring 32x32 OSM object
crops through 4 stride-2 convs with two self-attention blocks. Returns
(per_pixel_logits, object_logits).

TPU note: the self-attention bmm over 16x16=256 / 8x8=64 positions lowers to
small MXU matmuls; QKV projections are 1x1 convs = matmuls over the lane axis.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import ARCH_REGISTRY
from .discriminator import UNetDiscriminatorSN


class SelfAttentionBlock(nn.Module):
    """Softmax self-attention over spatial positions with gamma-gated residual."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        q = nn.Conv(c // 8, (1, 1), name="query", dtype=self.dtype)(x).reshape(b, h * w, c // 8)
        k = nn.Conv(c // 8, (1, 1), name="key", dtype=self.dtype)(x).reshape(b, h * w, c // 8)
        v = nn.Conv(c, (1, 1), name="value", dtype=self.dtype)(x).reshape(b, h * w, c)
        # energy[b, i, j] = q_i . k_j ; attend value_j by softmax over j.
        energy = jnp.einsum("bif,bjf->bij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(energy, axis=2).astype(v.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v, preferred_element_type=jnp.float32)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return (gamma.astype(x.dtype) * out.reshape(b, h, w, c).astype(x.dtype)) + x


@ARCH_REGISTRY.register("OSMObjDiscriminator")
class OSMObjDiscriminator(nn.Module):
    num_in_ch: int
    num_feat: int = 64
    skip_connection: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, osm_objs: jax.Array, update_stats: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        conv = lambda name, feats: nn.Conv(
            feats, (4, 4), (2, 2), padding=1, name=name, dtype=self.dtype
        )
        o = jax.nn.relu(conv("o_conv1", 64)(osm_objs))
        o = jax.nn.relu(conv("o_conv2", 128)(o))
        o = SelfAttentionBlock(128, self.dtype, name="o_attention1")(o)
        o = jax.nn.relu(conv("o_conv3", 256)(o))
        o = SelfAttentionBlock(256, self.dtype, name="o_attention2")(o)
        obj_logits = jax.nn.relu(conv("o_conv4", 1)(o))

        img_logits = UNetDiscriminatorSN(
            self.num_in_ch, self.num_feat, self.skip_connection, self.dtype, name="unet"
        )(x, update_stats)
        return img_logits, obj_logits
