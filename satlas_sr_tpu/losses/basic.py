"""Core training losses, pure functions over NHWC arrays.

Capability parity with the loss surface used by the reference models:
- L1Loss / MSELoss with loss_weight + reduction (basicsr basic_loss, configured
  in esrgan_s2naip_urban.yml pixel_opt)
- GANLoss (vanilla BCE-with-logits, real/fake label values, is_disc gating —
  used at ssr/models/ssr_esrgan_model.py:182,218,224)
- SSIMLoss (kornia window-5 flavour, ssr/losses/basic_loss.py:50-60)
- CLIPLoss (ssr/losses/basic_loss.py:20-48): L1 between image-encoder
  embeddings; the encoder tower is pluggable and loaded from local weights
  (zero-egress environment — see losses/clip.py).

All losses are jit-traceable and differentiable; loss builders translate YAML
`*_opt` blocks into closures.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from ..ops.ssim import ssim_loss as _ssim_loss_map
from ..registry import LOSS_REGISTRY


def _reduce(x: jax.Array, reduction: str) -> jax.Array:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


@LOSS_REGISTRY.register("L1Loss")
def l1_loss(loss_weight: float = 1.0, reduction: str = "mean") -> Callable:
    def fn(pred, target):
        return loss_weight * _reduce(jnp.abs(pred - target), reduction)

    return fn


@LOSS_REGISTRY.register("MSELoss")
def mse_loss(loss_weight: float = 1.0, reduction: str = "mean") -> Callable:
    def fn(pred, target):
        return loss_weight * _reduce(jnp.square(pred - target), reduction)

    return fn


@LOSS_REGISTRY.register("SSIMLoss")
def ssim_loss(loss_weight: float = 1.0) -> Callable:
    def fn(pred, target):
        per_image = jnp.mean(_ssim_loss_map(pred, target, window_size=5), axis=(1, 2, 3))
        return loss_weight * jnp.mean(per_image)

    return fn


def bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Numerically-stable binary cross entropy with logits (mean-reduced)."""
    neg_abs = -jnp.abs(logits)
    loss = jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(neg_abs))
    return jnp.mean(loss)


@LOSS_REGISTRY.register("GANLoss")
def gan_loss(
    gan_type: str = "vanilla",
    real_label_val: float = 1.0,
    fake_label_val: float = 0.0,
    loss_weight: float = 1.0,
) -> Callable:
    """Returns fn(logits, target_is_real, is_disc) matching basicsr GANLoss.

    The loss_weight is applied only for generator updates (is_disc=False),
    matching basicsr semantics.
    """

    def fn(logits: jax.Array, target_is_real: bool, is_disc: bool = False) -> jax.Array:
        logits = logits.astype(jnp.float32)
        if gan_type == "vanilla":
            label = real_label_val if target_is_real else fake_label_val
            loss = bce_with_logits(logits, jnp.full_like(logits, label))
        elif gan_type == "lsgan":
            label = real_label_val if target_is_real else fake_label_val
            loss = jnp.mean(jnp.square(logits - label))
        elif gan_type == "hinge":
            # No early return: basicsr applies loss_weight to the generator
            # branch of EVERY gan_type via the shared epilogue below.
            if is_disc:
                loss = jnp.mean(jax.nn.relu(1.0 - logits)) if target_is_real else jnp.mean(
                    jax.nn.relu(1.0 + logits)
                )
            else:
                loss = -jnp.mean(logits)
        elif gan_type == "wgan":
            loss = -jnp.mean(logits) if target_is_real else jnp.mean(logits)
        else:
            raise ValueError(f"Unsupported gan_type {gan_type!r}")
        return loss if is_disc else loss_weight * loss

    return fn


def build_loss(loss_opt: Dict[str, Any]) -> Callable:
    """Instantiate a loss closure from a YAML `*_opt` block (type + kwargs)."""
    opt = dict(loss_opt)
    loss_type = opt.pop("type")
    return LOSS_REGISTRY.get(loss_type)(**opt)
