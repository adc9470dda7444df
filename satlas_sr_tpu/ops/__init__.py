"""TPU-friendly primitive ops shared by the architectures.

All ops are pure functions over NHWC arrays, traceable under jit, with static
shapes. Where the reference relies on torch semantics (F.interpolate,
pixel_(un)shuffle, torch.median), the functions here reproduce those semantics
exactly so that imported PyTorch checkpoints give bit-comparable outputs.
"""

from .resize import upsample_nearest, upsample_bilinear, resize_bilinear
from .pixelshuffle import pixel_shuffle, pixel_unshuffle
from .median import lower_median
from .usm import usm_sharp
from .ssim import ssim_map, ssim_loss

__all__ = [
    "upsample_nearest",
    "upsample_bilinear",
    "resize_bilinear",
    "pixel_shuffle",
    "pixel_unshuffle",
    "lower_median",
    "usm_sharp",
    "ssim_map",
    "ssim_loss",
]
