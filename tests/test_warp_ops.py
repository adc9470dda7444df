"""flow_warp / resize_flow / deformable conv correctness tests."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from satlas_sr_tpu.ops.warp import deform_conv2d, flow_warp, resize_flow
from satlas_sr_tpu.archs.blocks import DCNv2Pack, ResidualBlockNoBN, Upsample


def test_flow_warp_zero_flow_is_identity(rng):
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    flow = jnp.zeros((2, 8, 8, 2), jnp.float32)
    np.testing.assert_allclose(np.asarray(flow_warp(x, flow)), np.asarray(x), atol=1e-6)


def test_flow_warp_integer_shift(rng):
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 1.0  # dx = +1: sample from x+1 (shift content left)
    out = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :, :-1], x[0, :, 1:], atol=1e-6)
    assert np.abs(out[0, :, -1]).max() == 0  # zeros padding


def test_flow_warp_matches_torch_grid_sample(rng):
    x = rng.rand(1, 3, 8, 8).astype(np.float32)
    flow = (rng.rand(1, 8, 8, 2).astype(np.float32) - 0.5) * 3
    out = np.asarray(flow_warp(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(flow)))
    # torch oracle: grid_sample with normalised grid (align_corners=True)
    h = w = 8
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    vx = (gx + flow[0, :, :, 0]) * 2 / (w - 1) - 1
    vy = (gy + flow[0, :, :, 1]) * 2 / (h - 1) - 1
    grid = torch.from_numpy(np.stack([vx, vy], axis=-1)[None].astype(np.float32))
    ref = F.grid_sample(torch.from_numpy(x), grid, mode="bilinear",
                        padding_mode="zeros", align_corners=True).numpy()
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_resize_flow_scales_values(rng):
    flow = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
    out = resize_flow(flow, "ratio", (2.0, 2.0))
    assert out.shape == (1, 16, 16, 2)
    # magnitudes scale with the resize ratio
    assert abs(float(jnp.mean(out)) - 2 * float(jnp.mean(flow))) < 0.1


def test_deform_conv_zero_offsets_is_conv(rng):
    x = rng.rand(1, 8, 8, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32)
    offsets = np.zeros((1, 8, 8, 18), np.float32)
    mask = np.ones((1, 8, 8, 9), np.float32)
    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                                   jnp.asarray(w), None, jnp.asarray(mask)))
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w.transpose(3, 2, 0, 1)), padding=1).numpy()
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-4)


def test_deform_conv_integer_offset_shifts_taps(rng):
    """dy=+1 on every tap == conv over input shifted up by one row."""
    x = rng.rand(1, 8, 8, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 3).astype(np.float32)
    offsets = np.zeros((1, 8, 8, 18), np.float32)
    offsets[..., 0::2] = 1.0  # dy channels (torch order: dy, dx per tap)
    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w)))
    shifted = np.concatenate([x[:, 1:], np.zeros_like(x[:, :1])], axis=1)
    ref = F.conv2d(torch.from_numpy(shifted.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w.transpose(3, 2, 0, 1)), padding=1).numpy()
    # interior matches; top row differs (conv oracle zero-pads where deform
    # samples real row 0) and bottom rows differ (zeros-beyond-edge sampling)
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2)[:, :, 1:6], ref[:, :, 1:6],
                               atol=1e-4, rtol=1e-4)


def test_dcnv2pack_and_misc_blocks(rng):
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    m = DCNv2Pack(features=6)
    v = m.init(jax.random.PRNGKey(0), x, x)
    y = m.apply(v, x, x)
    assert y.shape == (1, 8, 8, 6)

    rb = ResidualBlockNoBN(num_feat=4)
    vr = rb.init(jax.random.PRNGKey(0), x)
    assert rb.apply(vr, x).shape == x.shape

    up = Upsample(scale=4, num_feat=4)
    vu = up.init(jax.random.PRNGKey(0), x)
    assert up.apply(vu, x).shape == (1, 32, 32, 4)
    up3 = Upsample(scale=3, num_feat=4)
    vu3 = up3.init(jax.random.PRNGKey(0), x)
    assert up3.apply(vu3, x).shape == (1, 24, 24, 4)
