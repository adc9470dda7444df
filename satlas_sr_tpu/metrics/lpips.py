"""LPIPS perceptual distance metric (vgg backbone; the shipped configs' choice), in JAX.

Parity target: ssr/metrics/lpips.py:7-21 (lpips package, configs use `vgg`).
Unlike the reference — which re-instantiates the LPIPS model on every metric
call (flagged in SURVEY.md §2.7) — the tower is built once per process.

Zero-egress environment: pretrained backbone + linear-head weights load from a
local `lpips` package-format state dict when provided via
SSR_TPU_LPIPS_WEIGHTS / `lpips_weights_path`; otherwise a seeded random
backbone with uniform heads is used and a warning logged (scores are then
self-consistent only).
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

# VGG16 conv plan (channels); 'M' = maxpool. Taps after the ReLU preceding
# each pool (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
               512, 512, 512]
_VGG16_TAPS = [1, 3, 6, 9, 12]  # conv indices (0-based among convs) to tap after relu

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _init_vgg16(seed: int = 0) -> List[Dict[str, np.ndarray]]:
    rng = np.random.RandomState(seed)
    convs = []
    in_ch = 3
    for item in _VGG16_PLAN:
        if item == "M":
            continue
        out_ch = item
        fan_in = 9 * in_ch
        convs.append(
            {
                "kernel": (rng.randn(3, 3, in_ch, out_ch) * np.sqrt(2.0 / fan_in)).astype(
                    np.float32
                ),
                "bias": np.zeros((out_ch,), np.float32),
            }
        )
        in_ch = out_ch
    return convs


def _load_lpips_torch(path: str) -> Optional[tuple]:
    """Load an `lpips` package checkpoint: net.slice convs + lin heads."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    conv_keys = sorted(
        (k for k in state if k.endswith(".weight") and "lin" not in k),
        key=lambda k: [int(t) for t in k.split(".") if t.isdigit()],
    )
    if not conv_keys:
        return None
    convs = []
    for k in conv_keys:
        w = state[k].float().numpy()
        b = state.get(k[:-7] + ".bias")
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


def _vgg16_features(convs, x: jax.Array) -> List[jax.Array]:
    feats = []
    h = x
    ci = 0
    for item in _VGG16_PLAN:
        if item == "M":
            eh = (h.shape[1] // 2) * 2
            ew = (h.shape[2] // 2) * 2
            h = h[:, :eh, :ew, :]
            h = jnp.maximum(
                jnp.maximum(h[:, 0::2, 0::2, :], h[:, 1::2, 0::2, :]),
                jnp.maximum(h[:, 0::2, 1::2, :], h[:, 1::2, 1::2, :]),
            )
            continue
        p = convs[ci]
        h = jax.lax.conv_general_dilated(
            h, p["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"]
        h = jax.nn.relu(h)
        if ci in _VGG16_TAPS:
            feats.append(h)
        ci += 1
    return feats


@functools.lru_cache(maxsize=2)
def _build_lpips(model_name: str, weights_path: Optional[str]):
    convs = None
    lins = None
    pretrained = False
    if weights_path and os.path.exists(weights_path):
        loaded = _load_lpips_torch(weights_path)
        if loaded:
            convs, lins = loaded
            convs = [jax.tree.map(jnp.asarray, c) for c in convs]
            pretrained = True
    if convs is None:
        logging.getLogger("satlas_sr_tpu").warning(
            "LPIPS: no local weights (set SSR_TPU_LPIPS_WEIGHTS); using seeded "
            "random backbone — distances are self-consistent only."
        )
        convs = [jax.tree.map(jnp.asarray, c) for c in _init_vgg16()]
        lins = None

    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    @jax.jit
    def distance(a: jax.Array, b: jax.Array) -> jax.Array:
        # inputs NHWC in [0, 1] -> [-1, 1] -> lpips scaling
        a = ((a * 2.0 - 1.0) - shift) / scale
        b = ((b * 2.0 - 1.0) - shift) / scale
        fa = _vgg16_features(convs, a)
        fb = _vgg16_features(convs, b)
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
    if lpips_model != "vgg":
        raise ValueError(
            f"lpips_model={lpips_model!r} not wired (vgg only — the shipped "
            "configs use vgg; alex backbone import is a ROADMAP item)"
        )
    lpips_weights_path = lpips_weights_path or os.environ.get("SSR_TPU_LPIPS_WEIGHTS")
    distance, _ = _build_lpips(lpips_model, lpips_weights_path)
    a = jnp.asarray(img, jnp.float32)[None] / 255.0
    b = jnp.asarray(img2, jnp.float32)[None] / 255.0
    return float(np.asarray(distance(a, b))[0])
