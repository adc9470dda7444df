"""Independent PyTorch functional oracle for the RRDBNet generator.

Runs the reference generator's math (ssr/archs/rrdbnet_arch.py:92-137)
directly from a torch-format state dict using torch.nn.functional only —
no module classes, no basicsr. This is the comparator the acceptance
command (satlas_sr_tpu/acceptance.py) evaluates released checkpoints
against: the test suite pins this oracle to the reference architecture
layer by layer (tests/test_parity_archs.py), so agreement with it on
byte-identical inputs IS agreement with the reference forward.

Shared with the test suite (tests/torch_oracles.py re-exports it) so there
is exactly one definition of "what the reference computes".
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


def rrdbnet_forward(sd, x, num_block, scale=4):
    """NCHW float in [0,1] -> NCHW float; sd is a torch state dict."""

    def rdb(pfx, h):
        x1 = _lrelu(_c(sd, pfx + ".conv1", h))
        x2 = _lrelu(_c(sd, pfx + ".conv2", torch.cat([h, x1], 1)))
        x3 = _lrelu(_c(sd, pfx + ".conv3", torch.cat([h, x1, x2], 1)))
        x4 = _lrelu(_c(sd, pfx + ".conv4", torch.cat([h, x1, x2, x3], 1)))
        x5 = _c(sd, pfx + ".conv5", torch.cat([h, x1, x2, x3, x4], 1))
        return x5 * 0.2 + h

    def rrdb(pfx, h):
        out = rdb(pfx + ".rdb1", h)
        out = rdb(pfx + ".rdb2", out)
        out = rdb(pfx + ".rdb3", out)
        return out * 0.2 + h

    if scale == 2:
        x = F.pixel_unshuffle(x, 2)
    elif scale == 1:
        x = F.pixel_unshuffle(x, 4)
    feat = _c(sd, "conv_first", x)
    body = feat
    for i in range(num_block):
        body = rrdb(f"body.{i}", body)
    feat = feat + _c(sd, "conv_body", body)
    feat = _lrelu(_c(sd, "conv_up1",
                     F.interpolate(feat, scale_factor=2, mode="nearest")))
    feat = _lrelu(_c(sd, "conv_up2",
                     F.interpolate(feat, scale_factor=2, mode="nearest")))
    if scale in (8, 16):
        feat = _lrelu(_c(sd, "conv_up3",
                         F.interpolate(feat, scale_factor=2, mode="nearest")))
        if scale == 16:
            feat = _lrelu(_c(sd, "conv_up4",
                             F.interpolate(feat, scale_factor=2,
                                           mode="nearest")))
    return _c(sd, "conv_last", _lrelu(_c(sd, "conv_hr", feat)))
