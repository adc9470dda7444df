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


# The SRCNN/HighResNet oracles also moved into the package (round 4): the
# acceptance command dual-evaluates the released srcnn/highresnet
# checkpoints against them. Re-exported for existing test imports.
from satlas_sr_tpu.utils.torch_oracles import (  # noqa: F401,E402
    _doubleconv, _prelu, _reflect_conv, highresnet_forward, srcnn_forward)
