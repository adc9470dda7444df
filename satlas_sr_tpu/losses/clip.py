"""CLIP-embedding similarity loss (pluggable local image towers).

Parity target: ssr/losses/basic_loss.py:20-48 — L1 between CLIP image
embeddings of output vs GT, with resize to the model's input resolution and
OpenAI-mean/std normalisation.

This environment has zero egress, so pretrained CLIP towers must be supplied
as local files (config `clip_weights_path` / env SSR_TPU_CLIP_WEIGHTS pointing
at a torch state dict for the ViT image encoder; see metrics/clip_encoder.py
for the tower). Without weights the loss degrades to a seeded-random tower
with a logged warning — the training loop stays runnable, and real weights
drop in without code changes.
"""

from __future__ import annotations

import logging
from typing import Callable

import jax
import jax.numpy as jnp

from ..registry import LOSS_REGISTRY
from ..metrics.clip_encoder import MODEL_SPECS, get_encoder
from ..ops.resize import resize_nearest

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)


@LOSS_REGISTRY.register("CLIPLoss")
def clip_loss(
    clip_loss_model: str = "ViT-B-16-SigLIP-256",
    loss_weight: float = 1.0,
    clip_weights_path: str | None = None,
) -> Callable:
    spec = MODEL_SPECS[clip_loss_model]
    encode, pretrained = get_encoder(clip_loss_model, clip_weights_path)
    if not pretrained:
        logging.getLogger("satlas_sr_tpu").warning(
            "CLIPLoss: no local weights for %s; using a seeded random tower.",
            clip_loss_model,
        )
    img_size = spec.image_size
    mean = jnp.asarray(OPENAI_DATASET_MEAN)
    std = jnp.asarray(OPENAI_DATASET_STD)

    def fn(x: jax.Array, gt: jax.Array) -> jax.Array:
        # Reference uses F.interpolate's DEFAULT mode — nearest
        # (ssr/losses/basic_loss.py:39-40).
        x = resize_nearest(x, (img_size, img_size))
        gt = resize_nearest(gt, (img_size, img_size))
        x = (x - mean) / std
        gt = (gt - mean) / std
        fx = encode(x)
        fgt = encode(jax.lax.stop_gradient(gt))
        return loss_weight * jnp.mean(jnp.abs(fx - fgt))

    return fn
