"""Metric registry package + dispatcher.

Parity with ssr/metrics/__init__.py:13-23: `calculate_metric(data, opt)` pops
`type`, looks it up in the registry and calls it with the metric data
(uint8 HWC `img`, `img2`) plus the config kwargs.
"""

from ..registry import METRIC_REGISTRY
from . import cpsnr, psnr_ssim, lpips, clipscore  # noqa: F401  (register)
from .psnr_ssim import calculate_psnr, calculate_ssim
from .cpsnr import calculate_cpsnr


def calculate_metric(data: dict, opt: dict):
    opt = dict(opt)
    metric_type = opt.pop("type")
    return METRIC_REGISTRY.get(metric_type)(**data, **opt)


def metric_tower_pretrained(opt: dict):
    """None if the metric is weight-free (psnr/ssim/cpsnr); else whether its
    tower carries real pretrained weights. Random-tower results are
    self-consistent only and get tagged `(untrained-tower)` in reports."""
    kwargs = {k: v for k, v in opt.items() if k not in ("type", "better")}
    t = opt.get("type")
    if t == "calculate_lpips":
        return lpips.tower_pretrained(**kwargs)
    if t == "calculate_clipscore":
        return clipscore.tower_pretrained(**kwargs)
    return None


__all__ = [
    "calculate_metric",
    "calculate_psnr",
    "calculate_ssim",
    "calculate_cpsnr",
]
