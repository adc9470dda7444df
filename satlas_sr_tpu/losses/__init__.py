"""Loss registry package (importing registers all losses)."""

from .basic import build_loss, gan_loss, l1_loss, mse_loss, ssim_loss, bce_with_logits
from .regularizers import g_path_regularize, gradient_penalty_loss, r1_penalty
from . import perceptual  # registers PerceptualLoss
from . import clip  # registers CLIPLoss

__all__ = [
    "build_loss",
    "gan_loss",
    "l1_loss",
    "mse_loss",
    "ssim_loss",
    "bce_with_logits",
    "r1_penalty",
    "gradient_penalty_loss",
    "g_path_regularize",
]
