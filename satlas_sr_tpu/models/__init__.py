"""Model registry package (importing registers all model trainers)."""

from ..registry import MODEL_REGISTRY
from .l2 import L2Model
from .esrgan import ESRGANModel
from .osm_esrgan import OSMObjESRGANModel


def build_model(opt: dict):
    """MODEL_REGISTRY lookup from opt['model_type'] (basicsr build_model parity)."""
    return MODEL_REGISTRY.get(opt["model_type"])(opt)


__all__ = ["build_model", "L2Model", "ESRGANModel", "OSMObjESRGANModel"]
