"""Independent PyTorch functional oracles for parity testing.

These run the same math as our JAX architectures directly from an exported
torch-format state dict (see satlas_sr_tpu/utils/torch_io.py), using
torch.nn.functional only. They exist to pin down framework-boundary semantics
(conv padding, nearest/bilinear resize, spectral norm, PReLU, reflect pad)
against PyTorch's implementations on CPU.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F


def _c(sd, name, x, pad=1, stride=1):
    w = sd[name + ".weight"]
    b = sd.get(name + ".bias")
    return F.conv2d(x, w, b, stride=stride, padding=pad)


def _lrelu(x):
    return F.leaky_relu(x, 0.2)


# The RRDBNet oracle moved into the package (round 4): it is now also the
# runtime comparator for `python -m satlas_sr_tpu.acceptance`. One
# definition, re-exported here for the existing test imports.
from satlas_sr_tpu.utils.torch_oracles import rrdbnet_forward  # noqa: F401


def _sn_weight(sd, name):
    """Spectral-normalised weight from weight_orig + stored u, v (eval mode)."""
    w = sd[name + ".weight_orig"]
    u = sd[name + ".weight_u"]
    v = sd[name + ".weight_v"]
    w_mat = w.reshape(w.shape[0], -1)
    sigma = torch.dot(u, torch.mv(w_mat, v))
    return w / sigma


def _snc(sd, name, x, pad=1, stride=1):
    return F.conv2d(x, _sn_weight(sd, name), None, stride=stride, padding=pad)


def unet_disc_forward(sd, x, skip_connection=True):
    up = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=False)
    x0 = _lrelu(_c(sd, "conv0", x))
    x1 = _lrelu(_snc(sd, "conv1", x0, pad=1, stride=2))
    x2 = _lrelu(_snc(sd, "conv2", x1, pad=1, stride=2))
    x3 = _lrelu(_snc(sd, "conv3", x2, pad=1, stride=2))
    x4 = _lrelu(_snc(sd, "conv4", up(x3)))
    if skip_connection:
        x4 = x4 + x2
    x5 = _lrelu(_snc(sd, "conv5", up(x4)))
    if skip_connection:
        x5 = x5 + x1
    x6 = _lrelu(_snc(sd, "conv6", up(x5)))
    if skip_connection:
        x6 = x6 + x0
    out = _lrelu(_snc(sd, "conv7", x6))
    out = _lrelu(_snc(sd, "conv8", out))
    return _c(sd, "conv9", out)


def _reflect_conv(sd, name, x, k):
    pad = (k - 1) // 2
    if pad:
        x = F.pad(x, (pad, k - 1 - pad, pad, k - 1 - pad), mode="reflect")
    return F.conv2d(x, sd[name + ".weight"], sd.get(name + ".bias"))


def _prelu(sd, name, x):
    return F.prelu(x, sd[name + ".weight"])


def _doubleconv(sd, base, x, k=3):
    x = _reflect_conv(sd, base + ".0", x, k)
    x = _prelu(sd, base + ".2", x)
    x = _reflect_conv(sd, base + ".4", x, k)
    x = _prelu(sd, base + ".6", x)
    return x  # dropout is identity in eval


def srcnn_forward(sd, x, hidden_channels, residual_layers, output_size, zoom, sr_k, k=3):
    b, t, c, h, w = x.shape
    enc = _doubleconv(sd, "encoder.doubleconv2d", x.reshape(b * t, c, h, w), k)
    enc = enc.reshape(b, t * hidden_channels, h, w)
    fused = _doubleconv(sd, "doubleconv2d.doubleconv2d", enc, k)
    for i in range(residual_layers):
        fused = fused + _doubleconv(
            sd, f"residualblocks.{i}.residualblock.doubleconv2d", fused, k
        )
    y = F.pixel_shuffle(fused, zoom)
    y = _prelu(sd, "sr.upsample.3", _reflect_conv(sd, "sr.upsample.1", y, sr_k))
    y = _prelu(sd, "sr.upsample.6", _reflect_conv(sd, "sr.upsample.4", y, sr_k))
    # kornia Resize(bilinear, antialias) is identity at same size
    assert y.shape[-1] == output_size
    return y[:, None]


def highresnet_forward(sd, x, hidden_channels, output_size, zoom, sr_k, k=3):
    b, t, c, h, w = x.shape
    enc = _doubleconv(sd, "encoder.doubleconv2d", x.reshape(b * t, c, h, w), k)
    enc = enc.reshape(b, t, hidden_channels, h, w)

    def fuse(z):
        bb, tt, cc, hh, ww = z.shape
        half = tt // 2
        first = z[:, :half].reshape(bb * half, cc, hh, ww)
        second = z[:, half:].reshape(bb * half, cc, hh, ww)
        pair = torch.cat([first, second], dim=1)
        r = pair + _doubleconv(sd, "fusion.fusion.0.fuse.0.residualblock.doubleconv2d", pair, k)
        r = _reflect_conv(sd, "fusion.fusion.0.fuse.1", r, k)
        r = _prelu(sd, "fusion.fusion.0.fuse.3", r)
        return r.reshape(bb, half, cc, hh, ww)

    z = enc
    while z.shape[1] > 1:
        z = fuse(z)
    fused = z[:, 0]
    y = F.pixel_shuffle(fused, zoom)
    y = _prelu(sd, "sr.upsample.3", _reflect_conv(sd, "sr.upsample.1", y, sr_k))
    y = _prelu(sd, "sr.upsample.6", _reflect_conv(sd, "sr.upsample.4", y, sr_k))
    assert y.shape[-1] == output_size
    return y[:, None]
