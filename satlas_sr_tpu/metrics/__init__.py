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


__all__ = [
    "calculate_metric",
    "calculate_psnr",
    "calculate_ssim",
    "calculate_cpsnr",
]
