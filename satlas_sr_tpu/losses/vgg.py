"""VGG19 feature tower for the perceptual loss, in JAX/flax (NHWC).

The reference's perceptual loss runs torchvision's pretrained VGG19 and taps
pre-ReLU conv activations (configured layer_weights conv1_2/conv2_2/conv3_4/
conv4_4/conv5_4 in esrgan_s2naip_urban.yml). This module implements the VGG19
feature trunk with the same layer naming, plus an importer for
torchvision-format state dicts (`features.{idx}.weight`, OIHW) supplied via a
local file — this environment has zero egress, so pretrained weights must be
provided on disk (config key `vgg_weights_path` or env SSR_TPU_VGG19_WEIGHTS).
Absent weights, a seeded random tower is used (documented, deterministic) so
training remains runnable end-to-end.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# VGG19 conv plan: (name, out_channels); 'M' = 2x2 maxpool.
VGG19_PLAN: List = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512), "M",
]

# torchvision vgg19.features Sequential indices of the conv layers, in order.
_TORCHVISION_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def init_vgg19_params(seed: int = 0) -> Dict[str, Dict[str, np.ndarray]]:
    """Deterministic he-normal random VGG19 params (fallback when no weights)."""
    rng = np.random.RandomState(seed)
    params: Dict[str, Dict[str, np.ndarray]] = {}
    in_ch = 3
    for item in VGG19_PLAN:
        if item == "M":
            continue
        name, out_ch = item
        fan_in = 9 * in_ch
        params[name] = {
            "kernel": (rng.randn(3, 3, in_ch, out_ch) * np.sqrt(2.0 / fan_in)).astype(np.float32),
            "bias": np.zeros((out_ch,), np.float32),
        }
        in_ch = out_ch
    return params


def load_vgg19_from_torch(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Load a torchvision vgg19 state dict (.pth) into our named params."""
    import torch  # local file IO only

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    params: Dict[str, Dict[str, np.ndarray]] = {}
    conv_names = [item[0] for item in VGG19_PLAN if item != "M"]
    for name, idx in zip(conv_names, _TORCHVISION_CONV_IDX):
        w = state[f"features.{idx}.weight"].numpy()  # OIHW
        b = state[f"features.{idx}.bias"].numpy()
        params[name] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),  # HWIO
            "bias": b.astype(np.float32),
        }
    return params


def get_vgg19_params(weights_path: str | None = None, seed: int = 0):
    path = weights_path or os.environ.get("SSR_TPU_VGG19_WEIGHTS")
    path = os.path.expanduser(path) if path else path
    if path and os.path.exists(path):
        return load_vgg19_from_torch(path), True
    return init_vgg19_params(seed), False


def vgg19_features(
    params: Dict[str, Dict[str, jax.Array]],
    x: jax.Array,
    taps: Sequence[str],
    use_input_norm: bool = True,
    range_norm: bool = False,
    dtype: Any = jnp.float32,
) -> Dict[str, jax.Array]:
    """Run the VGG19 trunk on NHWC input in [0,1]; return pre-ReLU taps.

    Stops at the deepest requested tap (no wasted conv work).
    """
    taps = list(taps)
    deepest = max(
        i for i, item in enumerate(VGG19_PLAN) if item != "M" and item[0] in taps
    )
    if range_norm:
        x = (x + 1.0) / 2.0
    if use_input_norm:
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std
    out: Dict[str, jax.Array] = {}
    h = x.astype(dtype)
    for i, item in enumerate(VGG19_PLAN):
        if item == "M":
            # 2x2/2 maxpool as elementwise max of the four disjoint-window
            # slices: identical result, and (unlike reduce_window_max) it
            # linearizes under grad-inside-lax.cond (the GAN step's G gating).
            # Torch floors odd dims: crop to even before slicing.
            eh = (h.shape[1] // 2) * 2
            ew = (h.shape[2] // 2) * 2
            h = h[:, :eh, :ew, :]
            h = jnp.maximum(
                jnp.maximum(h[:, 0::2, 0::2, :], h[:, 1::2, 0::2, :]),
                jnp.maximum(h[:, 0::2, 1::2, :], h[:, 1::2, 1::2, :]),
            )
            continue
        name, _ = item
        p = params[name]
        h = jax.lax.conv_general_dilated(
            h, p["kernel"].astype(dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"].astype(dtype)
        if name in taps:
            out[name] = h
        if i >= deepest:
            break
        h = jax.nn.relu(h)
    return out
