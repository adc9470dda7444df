"""Registry-free network construction for the inference CLIs.

Parity with ssr/utils/model_utils.py:5-52: a switch over
SSR_RRDBNet / SRCNN / HighResNet driven by the infer config's `network_g`
block, with num_in_ch = n_lr_images * 3 for RRDBNet.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..archs import HighResNet, RRDBNet, SRCNN

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def compute_dtype(opt: Dict[str, Any]):
    return _DTYPES[str(opt.get("compute_dtype", "float32"))]


def uses_3d_input(network_type: str) -> bool:
    """True for the model families taking [B, T, H, W, C] revisit stacks
    (the reference's `use_3d` datasets — SRCNN/HighResNet)."""
    return network_type in ("SRCNN", "HighResNet")


def build_network(opt: Dict[str, Any]):
    """Build the generator for an infer config (returns the linen module)."""
    scale = int(opt["scale"])
    n_lr_images = int(opt["n_lr_images"])
    model_opt = opt["network_g"]
    model_type = model_opt["type"]
    dtype = compute_dtype(opt)

    if model_type == "SSR_RRDBNet":
        # per-frame channels: 3 (tci) + 1 per extra band when the infer
        # config stacks more than tci (s2_bands — beyond the reference,
        # whose infer path is tci-only and cannot run its own band-variant
        # esrgan_{10m,20m,60m} checkpoints)
        from .infer_utils import channels_per_frame

        return RRDBNet(
            num_in_ch=n_lr_images * channels_per_frame(opt.get("s2_bands")),
            num_out_ch=3,
            scale=scale,
            num_feat=int(model_opt["num_feat"]),
            num_block=int(model_opt["num_block"]),
            num_grow_ch=int(model_opt["num_grow_ch"]),
            dtype=dtype,
        )
    if model_type in ("SRCNN", "HighResNet"):
        cls = SRCNN if model_type == "SRCNN" else HighResNet
        return cls(
            in_channels=int(model_opt["in_channels"]),
            mask_channels=int(model_opt.get("mask_channels", 0)),
            revisits=n_lr_images,
            hidden_channels=int(model_opt["hidden_channels"]),
            out_channels=int(model_opt["out_channels"]),
            kernel_size=int(model_opt["kernel_size"]),
            residual_layers=int(model_opt["residual_layers"]),
            output_size=model_opt["output_size"],
            zoom_factor=scale,
            sr_kernel_size=int(model_opt["sr_kernel_size"]),
            dtype=dtype,
        )
    raise ValueError(f"Model type {model_type!r} not supported")
