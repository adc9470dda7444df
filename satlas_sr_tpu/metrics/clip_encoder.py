"""ViT image encoders for CLIP-style losses/metrics, in pure JAX.

The reference loads open_clip/clip towers from the network at call time
(ssr/metrics/clipscore.py:9-24 — re-downloading/ re-instantiating per call, a
perf bug SURVEY.md flags; ssr/losses/basic_loss.py:26-34). This environment
has zero egress, so towers are:

1. loaded from a local torch state dict when provided (CLIP-style
   `visual.transformer.resblocks.*` key mapping), else
2. a seeded deterministic random tower of the same geometry (keeps pipelines
   runnable; similarity numbers are then only self-consistent, not
   ImageNet-semantic — callers log this).

Encoders are built ONCE per process and cached (fixing the reload-per-call
reference bug).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    image_size: int
    patch_size: int
    width: int
    layers: int
    heads: int
    embed_dim: int
    mlp_ratio: float = 4.0


MODEL_SPECS: Dict[str, ViTSpec] = {
    # loss towers (ssr/losses/basic_loss.py:26-34)
    "EVA02-E-14-plus": ViTSpec(224, 14, 1792, 64, 16, 1024),
    "ViT-B-16-SigLIP-256": ViTSpec(256, 16, 768, 12, 12, 768),
    "RN50": ViTSpec(224, 32, 768, 12, 12, 1024),  # stand-in ViT geometry
    # metric towers (ssr/metrics/clipscore.py:12-22)
    "clip-ViT-B/16": ViTSpec(224, 16, 768, 12, 12, 512),
    "clipa-ViT-bigG-14": ViTSpec(336, 14, 1664, 48, 16, 1280),
    "siglip-ViT-SO400M-14": ViTSpec(384, 14, 1152, 27, 16, 1152),
    # tiny tower for tests
    "test-tiny": ViTSpec(32, 8, 32, 2, 2, 16),
}


def _init_vit_params(spec: ViTSpec, seed: int = 0) -> Dict:
    rng = np.random.RandomState(seed)
    n_patches = (spec.image_size // spec.patch_size) ** 2
    w = spec.width

    def dense(i, o):
        return {
            "kernel": (rng.randn(i, o) * (1.0 / np.sqrt(i))).astype(np.float32),
            "bias": np.zeros((o,), np.float32),
        }

    def ln():
        return {"scale": np.ones((w,), np.float32), "bias": np.zeros((w,), np.float32)}

    mlp_dim = int(w * spec.mlp_ratio)
    blocks = []
    for _ in range(spec.layers):
        blocks.append(
            {
                "ln1": ln(),
                "qkv": dense(w, 3 * w),
                "proj": dense(w, w),
                "ln2": ln(),
                "fc1": dense(w, mlp_dim),
                "fc2": dense(mlp_dim, w),
            }
        )
    return {
        "patch": {
            "kernel": (
                rng.randn(spec.patch_size, spec.patch_size, 3, w)
                * (1.0 / np.sqrt(spec.patch_size**2 * 3))
            ).astype(np.float32),
            "bias": np.zeros((w,), np.float32),
        },
        "pos": (rng.randn(n_patches, w) * 0.02).astype(np.float32),
        "blocks": blocks,
        "ln_final": ln(),
        "head": dense(w, spec.embed_dim),
    }


def load_vit_from_torch(path: str, spec: ViTSpec) -> Optional[Dict]:
    """Best-effort import of a CLIP-style visual tower state dict."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    get = lambda k: state[k].float().numpy() if k in state else None
    conv = get("visual.conv1.weight")
    if conv is None:
        return None
    params = _init_vit_params(spec)
    params["patch"]["kernel"] = np.transpose(conv, (2, 3, 1, 0))
    pos = get("visual.positional_embedding")
    if pos is not None and pos.shape[0] == params["pos"].shape[0] + 1:
        params["pos"] = pos[1:]  # drop cls position; we mean-pool
    for i in range(spec.layers):
        base = f"visual.transformer.resblocks.{i}"
        blk = params["blocks"][i]
        blk["ln1"]["scale"] = get(f"{base}.ln_1.weight")
        blk["ln1"]["bias"] = get(f"{base}.ln_1.bias")
        blk["qkv"]["kernel"] = get(f"{base}.attn.in_proj_weight").T
        blk["qkv"]["bias"] = get(f"{base}.attn.in_proj_bias")
        blk["proj"]["kernel"] = get(f"{base}.attn.out_proj.weight").T
        blk["proj"]["bias"] = get(f"{base}.attn.out_proj.bias")
        blk["ln2"]["scale"] = get(f"{base}.ln_2.weight")
        blk["ln2"]["bias"] = get(f"{base}.ln_2.bias")
        blk["fc1"]["kernel"] = get(f"{base}.mlp.c_fc.weight").T
        blk["fc1"]["bias"] = get(f"{base}.mlp.c_fc.bias")
        blk["fc2"]["kernel"] = get(f"{base}.mlp.c_proj.weight").T
        blk["fc2"]["bias"] = get(f"{base}.mlp.c_proj.bias")
    params["ln_final"]["scale"] = get("visual.ln_post.weight")
    params["ln_final"]["bias"] = get("visual.ln_post.bias")
    proj = get("visual.proj")
    if proj is not None:
        params["head"]["kernel"] = proj
        params["head"]["bias"] = np.zeros((proj.shape[1],), np.float32)
    return params


def _layer_norm(x, p):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def _vit_encode(params: Dict, spec: ViTSpec, x: jax.Array) -> jax.Array:
    """NHWC image in (normalised) -> [B, embed_dim]."""
    b = x.shape[0]
    h = jax.lax.conv_general_dilated(
        x, params["patch"]["kernel"], (spec.patch_size, spec.patch_size),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch"]["bias"]
    n = h.shape[1] * h.shape[2]
    h = h.reshape(b, n, spec.width) + params["pos"]
    d_head = spec.width // spec.heads
    for blk in params["blocks"]:
        y = _layer_norm(h, blk["ln1"])
        qkv = _dense(y, blk["qkv"]).reshape(b, n, 3, spec.heads, d_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / np.sqrt(d_head), axis=-1)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, spec.width)
        h = h + _dense(y, blk["proj"])
        y = _layer_norm(h, blk["ln2"])
        y = _dense(jax.nn.gelu(_dense(y, blk["fc1"]), approximate=False), blk["fc2"])
        h = h + y
    h = _layer_norm(jnp.mean(h, axis=1), params["ln_final"])
    return _dense(h, params["head"])


@functools.lru_cache(maxsize=4)
def _cached_encoder(model_name: str, weights_path: Optional[str]):
    spec = MODEL_SPECS[model_name]
    params = None
    pretrained = False
    if weights_path and os.path.exists(weights_path):
        params = load_vit_from_torch(weights_path, spec)
        pretrained = params is not None
    if params is None:
        params = _init_vit_params(spec)
    params = jax.tree.map(jnp.asarray, params)

    def encode(x: jax.Array) -> jax.Array:
        return _vit_encode(params, spec, x)

    return encode, pretrained


def get_encoder(
    model_name: str, weights_path: Optional[str] = None
) -> Tuple[Callable, bool]:
    weights_path = weights_path or os.environ.get("SSR_TPU_CLIP_WEIGHTS")
    return _cached_encoder(model_name, weights_path)
