"""CLIPScore metric: cosine similarity of image-encoder embeddings.

Parity target: ssr/metrics/clipscore.py:8-38 (configs use
siglip-ViT-SO400M-14). The tower is built ONCE per process — fixing the
reference's reload-per-call bug (clipscore.py:10-24, SURVEY.md §2.7) — and
runs jitted on device. Local weights via SSR_TPU_CLIP_WEIGHTS /
`clip_weights_path`; see metrics/clip_encoder.py.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import METRIC_REGISTRY
from .clip_encoder import MODEL_SPECS, get_encoder
from ..ops.resize import resize_nearest


@functools.lru_cache(maxsize=4)
def _scorer(clip_model: str, weights_path=None):
    spec = MODEL_SPECS[clip_model]
    encode, pretrained = get_encoder(clip_model, weights_path)
    if not pretrained:
        logging.getLogger("satlas_sr_tpu").warning(
            "CLIPScore: no local weights for %s; scores use a seeded random tower.",
            clip_model,
        )
    size = spec.image_size

    @jax.jit
    def score(a: jax.Array, b: jax.Array) -> jax.Array:
        # Reference uses F.interpolate's DEFAULT mode — nearest
        # (ssr/metrics/clipscore.py:31-32).
        a = resize_nearest(a, (size, size))
        b = resize_nearest(b, (size, size))
        fa = encode(a)
        fb = encode(b)
        fa = fa / (jnp.linalg.norm(fa, axis=-1, keepdims=True) + 1e-8)
        fb = fb / (jnp.linalg.norm(fb, axis=-1, keepdims=True) + 1e-8)
        return jnp.sum(fa * fb, axis=-1)

    return score


def tower_pretrained(clip_model, clip_weights_path=None, **kwargs) -> bool:
    """True iff this metric's tower has real (non-random) weights loaded."""
    if clip_model not in MODEL_SPECS:
        return False
    _, pretrained = get_encoder(clip_model, clip_weights_path)
    return pretrained


@METRIC_REGISTRY.register("calculate_clipscore")
def calculate_clipscore(img, img2, clip_model, clip_weights_path=None, **kwargs) -> float:
    if clip_model not in MODEL_SPECS:
        raise ValueError(f"{clip_model} is not supported for CLIPScore.")
    score = _scorer(clip_model, clip_weights_path)
    a = jnp.asarray(img, jnp.float32)[None] / 255.0
    b = jnp.asarray(img2, jnp.float32)[None] / 255.0
    return float(np.asarray(score(a, b))[0])
