"""Perceptual (VGG19 feature-matching) loss with optional style term.

Capability parity with the basicsr PerceptualLoss the reference configures
(esrgan_s2naip_urban.yml perceptual_opt: per-layer weights on pre-ReLU conv
taps, ImageNet input norm, l1 criterion, optional Gram-matrix style weight).
GT features are computed under stop_gradient (torch detaches gt features).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..registry import LOSS_REGISTRY
from .vgg import get_vgg19_params, vgg19_features


def _criterion(name: str) -> Callable:
    if name == "l1":
        return lambda a, b: jnp.mean(jnp.abs(a - b))
    if name in ("l2", "mse"):
        return lambda a, b: jnp.mean(jnp.square(a - b))
    if name == "fro":
        return lambda a, b: jnp.linalg.norm((a - b).reshape(-1))
    raise ValueError(f"Unsupported perceptual criterion {name!r}")


def _gram(feat: jax.Array) -> jax.Array:
    n, h, w, c = feat.shape
    f = feat.reshape(n, h * w, c)
    return jnp.einsum("npc,npd->ncd", f, f, preferred_element_type=jnp.float32) / (h * w * c)


@LOSS_REGISTRY.register("PerceptualLoss")
def perceptual_loss(
    layer_weights: Dict[str, float],
    vgg_type: str = "vgg19",
    use_input_norm: bool = True,
    range_norm: bool = False,
    perceptual_weight: float = 1.0,
    style_weight: float = 0.0,
    criterion: str = "l1",
    vgg_weights_path: str | None = None,
    dtype: Any = jnp.float32,
) -> Callable:
    """Returns fn(pred, gt) -> (percep_loss | None, style_loss | None)."""
    assert vgg_type == "vgg19", "only vgg19 towers are wired (reference uses vgg19)"
    params, pretrained = get_vgg19_params(vgg_weights_path)
    if not pretrained:
        import logging

        logging.getLogger("satlas_sr_tpu").warning(
            "PerceptualLoss: no pretrained VGG19 weights found (set "
            "SSR_TPU_VGG19_WEIGHTS or vgg_weights_path); using a seeded random "
            "tower — feature-matching still regularises but is not ImageNet-perceptual."
        )
    params = jax.tree.map(jnp.asarray, params)
    taps = list(layer_weights.keys())
    crit = _criterion(criterion)

    def fn(pred: jax.Array, gt: jax.Array) -> Tuple[jax.Array | None, jax.Array | None]:
        f_pred = vgg19_features(params, pred, taps, use_input_norm, range_norm, dtype)
        f_gt = vgg19_features(
            params, jax.lax.stop_gradient(gt), taps, use_input_norm, range_norm, dtype
        )
        percep = None
        if perceptual_weight > 0:
            percep = sum(
                layer_weights[k] * crit(f_pred[k], f_gt[k]) for k in taps
            ) * perceptual_weight
        style = None
        if style_weight > 0:
            style = sum(
                layer_weights[k] * crit(_gram(f_pred[k]), _gram(f_gt[k])) for k in taps
            ) * style_weight
        return percep, style

    return fn
