"""Differentiable crop-and-resize for OSM object extraction.

The reference crops dynamic per-image OSM bounding boxes out of the GT and the
generator output and resizes each crop to 32x32
(ssr/models/osm_objs_esrgan_model.py:163-186). Dynamic shapes are jit-hostile
(SURVEY.md §7 hard part (e)), so boxes arrive as a static-count [B, K, 4]
int array and crops are extracted with gather-based bilinear sampling —
differentiable w.r.t. the image, static output shape [B, K, S, S, C].

Sampling matches torchvision's tensor resize (bilinear, half-pixel centres,
no antialias) applied to the boxed region.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_resize_boxes(img: jax.Array, boxes: jax.Array, out_size: int = 32) -> jax.Array:
    """img [B, H, W, C]; boxes [B, K, 4] as (x1, y1, x2, y2) -> [B, K, S, S, C].

    Degenerate boxes (x1 == x2) must be pre-fixed on host (reference lines
    172-176 expand them by one pixel).
    """
    b, h, w, c = img.shape
    s = out_size

    def one_box(image, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        bh = (y2 - y1).astype(jnp.float32)
        bw = (x2 - x1).astype(jnp.float32)
        # Half-pixel-centre source coordinates within the box region, clamped
        # to the BOX interior (torchvision resizes the cropped tensor, whose
        # edge replication stops at the crop boundary — not the full image).
        ys = (jnp.arange(s, dtype=jnp.float32) + 0.5) * (bh / s) - 0.5 + y1
        xs = (jnp.arange(s, dtype=jnp.float32) + 0.5) * (bw / s) - 0.5 + x1
        ys = jnp.clip(ys, y1.astype(jnp.float32), y2.astype(jnp.float32) - 1.0)
        xs = jnp.clip(xs, x1.astype(jnp.float32), x2.astype(jnp.float32) - 1.0)
        ys = jnp.clip(ys, 0.0, h - 1.0)
        xs = jnp.clip(xs, 0.0, w - 1.0)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy = (ys - y0)[:, None, None]
        wx = (xs - x0)[None, :, None]
        top = image[y0][:, x0] * (1 - wx) + image[y0][:, x1i] * wx
        bot = image[y1i][:, x0] * (1 - wx) + image[y1i][:, x1i] * wx
        return top * (1 - wy) + bot * wy

    return jax.vmap(lambda image, bs: jax.vmap(lambda bx: one_box(image, bx))(bs))(
        img, boxes
    )
