"""PyTorch checkpoint import/export for all registered architectures.

The released reference checkpoints (esrgan_{1,2,4,8,16}S2.pth, srcnn_s2naip.pth,
highresnet_s2naip.pth — /root/reference/README.md:66-84) are torch state dicts
under `params` / `params_ema` keys. This module maps them to/from our flax
param PyTrees:

- conv weights: OIHW -> HWIO transpose
- the scanned RRDB trunk: 23 per-block tensors stack into one leading axis
- spectral-norm `weight_orig`/`weight_u`/`weight_v` -> kernel + `spectral` u/v
- PReLU `weight` -> our `weight` (shape (1,))

Numpy-only tree manipulation; torch is used purely as a file reader/writer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def load_torch_state_dict(path: str, param_key: Optional[str] = "params_ema"):
    """Read a .pth file -> {name: np.ndarray}. Falls back across common keys."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if param_key and param_key in state:
        state = state[param_key]
    elif "params_ema" in state or "params" in state:
        fallback = "params_ema" if "params_ema" in state else "params"
        if param_key:
            import logging

            logging.getLogger("satlas_sr_tpu").warning(
                "checkpoint %s has no key %r; falling back to %r",
                path, param_key, fallback,
            )
        state = state[fallback]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in state.items()}


def save_torch_state_dict(path: str, tensors: Dict[str, np.ndarray], param_key: str = "params"):
    import torch

    torch.save({param_key: {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in tensors.items()}}, path)


def _conv(state: Dict[str, np.ndarray], name: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(state[f"{name}.weight"], (2, 3, 1, 0))}
    if bias and f"{name}.bias" in state:
        out["bias"] = state[f"{name}.bias"]
    return out


def _conv_back(p: Dict[str, np.ndarray], out: Dict[str, np.ndarray], name: str):
    out[f"{name}.weight"] = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


# ----------------------------------------------------------------------------- RRDBNet


def rrdbnet_from_torch(state: Dict[str, np.ndarray], num_block: int = 23) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2", "conv_up3",
                 "conv_up4", "conv_hr", "conv_last"):
        if f"{name}.weight" in state:
            params[name] = _conv(state, name)
    block: Dict[str, Any] = {}
    for rdb in ("rdb1", "rdb2", "rdb3"):
        block[rdb] = {}
        for conv in ("conv1", "conv2", "conv3", "conv4", "conv5"):
            kernels = np.stack(
                [
                    np.transpose(state[f"body.{i}.{rdb}.{conv}.weight"], (2, 3, 1, 0))
                    for i in range(num_block)
                ]
            )
            biases = np.stack([state[f"body.{i}.{rdb}.{conv}.bias"] for i in range(num_block)])
            block[rdb][conv] = {"kernel": kernels, "bias": biases}
    params["body"] = {"block": block}
    return {"params": params}


def rrdbnet_to_torch(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    params = variables["params"]
    out: Dict[str, np.ndarray] = {}
    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2", "conv_up3",
                 "conv_up4", "conv_hr", "conv_last"):
        if name in params:
            _conv_back(params[name], out, name)
    block = params["body"]["block"]
    num_block = np.asarray(block["rdb1"]["conv1"]["kernel"]).shape[0]
    for rdb in ("rdb1", "rdb2", "rdb3"):
        for conv in ("conv1", "conv2", "conv3", "conv4", "conv5"):
            k = np.asarray(block[rdb][conv]["kernel"])
            b = np.asarray(block[rdb][conv]["bias"])
            for i in range(num_block):
                out[f"body.{i}.{rdb}.{conv}.weight"] = np.transpose(k[i], (3, 2, 0, 1))
                out[f"body.{i}.{rdb}.{conv}.bias"] = b[i]
    return out


# ------------------------------------------------------------- U-Net SN discriminator


def _sn_conv(state: Dict[str, np.ndarray], name: str):
    kernel = np.transpose(state[f"{name}.weight_orig"], (2, 3, 1, 0))
    u = state.get(f"{name}.weight_u")
    v = state.get(f"{name}.weight_v")
    return kernel, u, v


def unet_disc_from_torch(state: Dict[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    s = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    params: Dict[str, Any] = {"conv0": _conv(s, "conv0"), "conv9": _conv(s, "conv9")}
    spectral: Dict[str, Any] = {}
    for i in range(1, 9):
        name = f"conv{i}"
        kernel, u, v = _sn_conv(s, name)
        params[name] = {"kernel": kernel}
        sp = {}
        if u is not None:
            sp["u"] = u
        if v is not None:
            sp["v"] = v
        if sp:
            spectral[name] = sp
    out = {"params": params}
    if spectral:
        out["spectral"] = spectral
    return out


def unet_disc_to_torch(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    params = variables["params"]
    spectral = variables.get("spectral", {})
    out: Dict[str, np.ndarray] = {}
    _conv_back(params["conv0"], out, "conv0")
    _conv_back(params["conv9"], out, "conv9")
    for i in range(1, 9):
        name = f"conv{i}"
        out[f"{name}.weight_orig"] = np.transpose(np.asarray(params[name]["kernel"]), (3, 2, 0, 1))
        if name in spectral:
            out[f"{name}.weight_u"] = np.asarray(spectral[name]["u"])
            out[f"{name}.weight_v"] = np.asarray(spectral[name]["v"])
    return out


# ------------------------------------------------------------------ SRCNN / HighResNet


def _doubleconv_from_torch(s: Dict[str, np.ndarray], base: str) -> Dict[str, Any]:
    """torch DoubleConv2d Sequential [0]=Conv,[2]=PReLU,[4]=Conv,[6]=PReLU."""
    return {
        "conv1": _conv(s, f"{base}.0"),
        "prelu1": {"weight": s[f"{base}.2.weight"]},
        "conv2": _conv(s, f"{base}.4"),
        "prelu2": {"weight": s[f"{base}.6.weight"]},
    }


def _doubleconv_to_torch(p: Dict[str, Any], out: Dict[str, np.ndarray], base: str):
    _conv_back(p["conv1"], out, f"{base}.0")
    out[f"{base}.2.weight"] = np.asarray(p["prelu1"]["weight"])
    _conv_back(p["conv2"], out, f"{base}.4")
    out[f"{base}.6.weight"] = np.asarray(p["prelu2"]["weight"])


def _pixelshuffle_block_from_torch(s: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch PixelShuffleBlock.upsample: [1]=Conv,[3]=PReLU,[4]=Conv,[6]=PReLU."""
    return {
        "conv1": _conv(s, "sr.upsample.1"),
        "prelu1": {"weight": s["sr.upsample.3.weight"]},
        "conv2": _conv(s, "sr.upsample.4"),
        "prelu2": {"weight": s["sr.upsample.6.weight"]},
    }


def srcnn_from_torch(state: Dict[str, np.ndarray], residual_layers: int = 1) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "encoder": _doubleconv_from_torch(state, "encoder.doubleconv2d"),
        "fusion_conv": _doubleconv_from_torch(state, "doubleconv2d.doubleconv2d"),
        "sr": _pixelshuffle_block_from_torch(state),
    }
    for i in range(residual_layers):
        params[f"fusion_res{i}"] = {
            "body": _doubleconv_from_torch(
                state, f"residualblocks.{i}.residualblock.doubleconv2d"
            )
        }
    if "mask_encoder.1.doubleconv2d.0.weight" in state:
        params["mask_encoder"] = _doubleconv_from_torch(state, "mask_encoder.1.doubleconv2d")
    return {"params": params}


def _pixelshuffle_block_to_torch(p: Dict[str, Any], out: Dict[str, np.ndarray]):
    _conv_back(p["conv1"], out, "sr.upsample.1")
    out["sr.upsample.3.weight"] = np.asarray(p["prelu1"]["weight"])
    _conv_back(p["conv2"], out, "sr.upsample.4")
    out["sr.upsample.6.weight"] = np.asarray(p["prelu2"]["weight"])


def srcnn_to_torch(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    params = variables["params"]
    out: Dict[str, np.ndarray] = {}
    _doubleconv_to_torch(params["encoder"], out, "encoder.doubleconv2d")
    _doubleconv_to_torch(params["fusion_conv"], out, "doubleconv2d.doubleconv2d")
    i = 0
    while f"fusion_res{i}" in params:
        _doubleconv_to_torch(
            params[f"fusion_res{i}"]["body"], out, f"residualblocks.{i}.residualblock.doubleconv2d"
        )
        i += 1
    if "mask_encoder" in params:
        _doubleconv_to_torch(params["mask_encoder"], out, "mask_encoder.1.doubleconv2d")
    _pixelshuffle_block_to_torch(params["sr"], out)
    return out


def highresnet_from_torch(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "encoder": _doubleconv_from_torch(state, "encoder.doubleconv2d"),
        "sr": _pixelshuffle_block_from_torch(state),
        "fusion": {
            "fuse": {
                "residual": {
                    "body": _doubleconv_from_torch(
                        state, "fusion.fusion.0.fuse.0.residualblock.doubleconv2d"
                    )
                },
                "proj": _conv(state, "fusion.fusion.0.fuse.1"),
                "prelu": {"weight": state["fusion.fusion.0.fuse.3.weight"]},
            }
        },
    }
    if "mask_encoder.1.doubleconv2d.0.weight" in state:
        params["mask_encoder"] = _doubleconv_from_torch(state, "mask_encoder.1.doubleconv2d")
    return {"params": params}


def highresnet_to_torch(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of highresnet_from_torch. Only the fusion.fusion.0 names are
    emitted: the reference shares ONE FusionBlock across every recursion
    level (arch_util.py:331-335), and torch's state_dict dedups shared
    parameters to their first registered name."""
    params = variables["params"]
    out: Dict[str, np.ndarray] = {}
    _doubleconv_to_torch(params["encoder"], out, "encoder.doubleconv2d")
    fuse = params["fusion"]["fuse"]
    _doubleconv_to_torch(fuse["residual"]["body"], out,
                         "fusion.fusion.0.fuse.0.residualblock.doubleconv2d")
    _conv_back(fuse["proj"], out, "fusion.fusion.0.fuse.1")
    out["fusion.fusion.0.fuse.3.weight"] = np.asarray(fuse["prelu"]["weight"])
    if "mask_encoder" in params:
        _doubleconv_to_torch(params["mask_encoder"], out, "mask_encoder.1.doubleconv2d")
    _pixelshuffle_block_to_torch(params["sr"], out)
    return out


# ------------------------------------------------------------------ OSM discriminator


def osm_disc_from_torch(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    unet = unet_disc_from_torch(state)  # conv0..conv9 live at the top level in torch
    params: Dict[str, Any] = {"unet": unet["params"]}
    spectral = {"unet": unet["spectral"]} if "spectral" in unet else None
    for i in range(1, 5):
        params[f"o_conv{i}"] = _conv(state, f"o_conv{i}")
    for i in (1, 2):
        base = f"o_attention{i}"
        params[base] = {
            "query": _conv(state, f"{base}.query_conv"),
            "key": _conv(state, f"{base}.key_conv"),
            "value": _conv(state, f"{base}.value_conv"),
            "gamma": state[f"{base}.gamma"],
        }
    out = {"params": params}
    if spectral:
        out["spectral"] = spectral
    return out


def osm_disc_to_torch(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of osm_disc_from_torch: the wrapped U-Net's conv0..conv9 (and
    spectral u/v) live at the TOP level of the torch state dict."""
    params = variables["params"]
    spectral = (variables.get("spectral") or {}).get("unet", {})
    out = unet_disc_to_torch({"params": params["unet"], "spectral": spectral})
    for i in range(1, 5):
        _conv_back(params[f"o_conv{i}"], out, f"o_conv{i}")
    for i in (1, 2):
        base = f"o_attention{i}"
        p = params[base]
        _conv_back(p["query"], out, f"{base}.query_conv")
        _conv_back(p["key"], out, f"{base}.key_conv")
        _conv_back(p["value"], out, f"{base}.value_conv")
        out[f"{base}.gamma"] = np.asarray(p["gamma"])
    return out


# -------------------------------------------------------------------------- dispatcher

_FROM_TORCH = {
    "SSR_RRDBNet": lambda s, opt: rrdbnet_from_torch(s, opt.get("num_block", 23)),
    "SSR_UNetDiscriminatorSN": lambda s, opt: unet_disc_from_torch(s),
    "SRCNN": lambda s, opt: srcnn_from_torch(s, opt.get("residual_layers", 1)),
    "HighResNet": lambda s, opt: highresnet_from_torch(s),
    "OSMObjDiscriminator": lambda s, opt: osm_disc_from_torch(s),
}


_TO_TORCH = {
    "SSR_RRDBNet": rrdbnet_to_torch,
    "SSR_UNetDiscriminatorSN": unet_disc_to_torch,
    "SRCNN": srcnn_to_torch,
    "HighResNet": highresnet_to_torch,
    "OSMObjDiscriminator": osm_disc_to_torch,
}


def import_torch_checkpoint(arch_type: str, path: str, arch_opt: Optional[dict] = None,
                            param_key: Optional[str] = "params_ema") -> Dict[str, Any]:
    """Load a reference-format .pth into flax variables for `arch_type`."""
    state = load_torch_state_dict(path, param_key)
    if arch_type not in _FROM_TORCH:
        raise KeyError(f"No torch importer for arch {arch_type!r}")
    return _FROM_TORCH[arch_type](state, arch_opt or {})


def export_torch_state(arch_type: str, variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flax variables -> reference-format flat torch state dict for `arch_type`."""
    if arch_type not in _TO_TORCH:
        raise KeyError(
            f"No torch exporter for arch {arch_type!r} "
            f"(supported: {sorted(_TO_TORCH)})")
    return _TO_TORCH[arch_type](variables)
