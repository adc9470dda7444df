"""LPIPS perceptual distance metric (vgg and alex backbones), in JAX.

Parity target: ssr/metrics/lpips.py:7-21 (lpips package; the shipped configs
use `vgg`, the package also ships `alex` — both are wired here). Unlike the
reference — which re-instantiates the LPIPS model on every metric call
(flagged in SURVEY.md §2.7) — the tower is built once per process.

Zero-egress environment: pretrained backbone + linear-head weights load from a
local combined state dict (torchvision `features.{i}.weight` conv keys plus
lpips-package `lin{i}.model.1.weight` heads) when provided via
SSR_TPU_LPIPS_WEIGHTS / `lpips_weights_path`; otherwise a seeded random
backbone with uniform heads is used, a warning logged, and validation reports
tag the metric `(untrained-tower)` (metrics/__init__.py).
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import METRIC_REGISTRY

# Backbone plans: ("conv", out_ch, kernel, stride, pad) | ("pool", kernel, stride).
# A tap is taken after the ReLU of each conv marked tap=True (5 taps each,
# matching the lpips package's slice boundaries).
_PLANS: Dict[str, List[tuple]] = {
    # torchvision VGG16.features; taps = relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
    "vgg": [
        ("conv", 64, 3, 1, 1, False), ("conv", 64, 3, 1, 1, True), ("pool", 2, 2),
        ("conv", 128, 3, 1, 1, False), ("conv", 128, 3, 1, 1, True), ("pool", 2, 2),
        ("conv", 256, 3, 1, 1, False), ("conv", 256, 3, 1, 1, False),
        ("conv", 256, 3, 1, 1, True), ("pool", 2, 2),
        ("conv", 512, 3, 1, 1, False), ("conv", 512, 3, 1, 1, False),
        ("conv", 512, 3, 1, 1, True), ("pool", 2, 2),
        ("conv", 512, 3, 1, 1, False), ("conv", 512, 3, 1, 1, False),
        ("conv", 512, 3, 1, 1, True),
    ],
    # torchvision AlexNet.features; taps = relu1..relu5 (lpips alexnet slices)
    "alex": [
        ("conv", 64, 11, 4, 2, True), ("pool", 3, 2),
        ("conv", 192, 5, 1, 2, True), ("pool", 3, 2),
        ("conv", 384, 3, 1, 1, True),
        ("conv", 256, 3, 1, 1, True),
        ("conv", 256, 3, 1, 1, True),
    ],
}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _plan_convs(plan) -> List[tuple]:
    return [item for item in plan if item[0] == "conv"]


def _init_backbone(plan, seed: int = 0) -> List[Dict[str, np.ndarray]]:
    rng = np.random.RandomState(seed)
    convs = []
    in_ch = 3
    for _, out_ch, k, _, _, _ in _plan_convs(plan):
        fan_in = k * k * in_ch
        convs.append(
            {
                "kernel": (rng.randn(k, k, in_ch, out_ch) * np.sqrt(2.0 / fan_in)).astype(
                    np.float32
                ),
                "bias": np.zeros((out_ch,), np.float32),
            }
        )
        in_ch = out_ch
    return convs


def _load_lpips_torch(path: str, plan) -> Optional[tuple]:
    """Load a combined checkpoint: torchvision backbone convs + lpips lin heads."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    conv_keys = sorted(
        (k for k in state if k.endswith(".weight") and "lin" not in k),
        key=lambda k: [int(t) for t in k.split(".") if t.isdigit()],
    )
    plan_convs = _plan_convs(plan)
    if len(conv_keys) != len(plan_convs):
        return None
    convs = []
    for key, (_, out_ch, ksz, _, _, _) in zip(conv_keys, plan_convs):
        w = state[key].float().numpy()  # OIHW
        if w.shape[0] != out_ch or w.shape[2] != ksz:
            return None
        b = state.get(key[:-7] + ".bias")
        convs.append(
            {
                "kernel": np.transpose(w, (2, 3, 1, 0)),
                "bias": b.float().numpy() if b is not None else np.zeros(w.shape[0], np.float32),
            }
        )
    lins = []
    i = 0
    while f"lin{i}.model.1.weight" in state or f"lins.{i}.model.1.weight" in state:
        k = f"lin{i}.model.1.weight" if f"lin{i}.model.1.weight" in state else f"lins.{i}.model.1.weight"
        lins.append(state[k].float().numpy().reshape(-1))  # [C]
        i += 1
    return convs, lins


def _backbone_features(plan, convs, x: jax.Array) -> List[jax.Array]:
    feats = []
    h = x
    ci = 0
    for item in plan:
        if item[0] == "pool":
            _, k, s = item
            # torch MaxPool2d(padding=0, floor): VALID reduce_window matches.
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
            )
            continue
        _, _, _, stride, pad, tap = item
        p = convs[ci]
        h = jax.lax.conv_general_dilated(
            h, p["kernel"], (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"]
        h = jax.nn.relu(h)
        if tap:
            feats.append(h)
        ci += 1
    return feats


@functools.lru_cache(maxsize=4)
def _build_lpips(model_name: str, weights_path: Optional[str]):
    if model_name not in _PLANS:
        raise ValueError(f"lpips_model={model_name!r} not supported (vgg | alex)")
    plan = _PLANS[model_name]
    convs = None
    lins = None
    pretrained = False
    weights_path = os.path.expanduser(weights_path) if weights_path else None
    if weights_path and os.path.exists(weights_path):
        loaded = _load_lpips_torch(weights_path, plan)
        if loaded:
            convs, lins = loaded
            convs = [jax.tree.map(jnp.asarray, c) for c in convs]
            pretrained = True
    if convs is None:
        logging.getLogger("satlas_sr_tpu").warning(
            "LPIPS: no local weights (set SSR_TPU_LPIPS_WEIGHTS); using seeded "
            "random backbone — distances are self-consistent only."
        )
        convs = [jax.tree.map(jnp.asarray, c) for c in _init_backbone(plan)]
        lins = None

    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    @jax.jit
    def distance(a: jax.Array, b: jax.Array) -> jax.Array:
        # Inputs NHWC in [0, 1] go STRAIGHT into the lpips scaling layer —
        # no [-1, 1] remap. The lpips package only applies 2x-1 under
        # normalize=True, and the reference calls lpips.LPIPS on img/255
        # with normalize left False (ssr/metrics/lpips.py:16-21); parity
        # means reproducing that exact (mis)scaling.
        a = (a - shift) / scale
        b = (b - shift) / scale
        fa = _backbone_features(plan, convs, a)
        fb = _backbone_features(plan, convs, b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa * jax.lax.rsqrt(jnp.sum(xa**2, axis=-1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(jnp.sum(xb**2, axis=-1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            if lins is not None and i < len(lins):
                d = d * jnp.asarray(lins[i])
                total = total + jnp.mean(jnp.sum(d, axis=-1, keepdims=True), axis=(1, 2, 3))
            else:
                total = total + jnp.mean(jnp.mean(d, axis=-1, keepdims=True), axis=(1, 2, 3))
        return total

    return distance, pretrained


def tower_pretrained(lpips_model="vgg", lpips_weights_path=None, **kwargs) -> bool:
    """True iff the LPIPS backbone has real (non-random) weights loaded."""
    lpips_weights_path = lpips_weights_path or os.environ.get("SSR_TPU_LPIPS_WEIGHTS")
    try:
        _, pretrained = _build_lpips(lpips_model, lpips_weights_path)
    except ValueError:
        return False
    return pretrained


@METRIC_REGISTRY.register("calculate_lpips")
def calculate_lpips(img, img2, lpips_model="vgg", lpips_weights_path=None, **kwargs) -> float:
    """uint8 HWC images -> LPIPS distance (lower better)."""
    lpips_weights_path = lpips_weights_path or os.environ.get("SSR_TPU_LPIPS_WEIGHTS")
    distance, _ = _build_lpips(lpips_model, lpips_weights_path)
    a = jnp.asarray(img, jnp.float32)[None] / 255.0
    b = jnp.asarray(img2, jnp.float32)[None] / 255.0
    return float(np.asarray(distance(a, b))[0])
