"""Architecture registry package.

Importing this package registers all architectures (the explicit analog of the
reference's import-time directory scan, ssr/archs/__init__.py:5-10).
"""

from .rrdbnet import RRDBNet, RRDB, ResidualDenseBlock
from .discriminator import UNetDiscriminatorSN
from .osm_discriminator import OSMObjDiscriminator, SelfAttentionBlock
from .srcnn import SRCNN
from .highresnet import HighResNet
from . import blocks

from ..registry import ARCH_REGISTRY


def build_arch(arch_opt: dict, **overrides):
    """Instantiate a registered architecture from a `network_g`/`network_d` block.

    Mirrors basicsr build_network: pop `type`, pass the rest as kwargs.
    """
    opt = dict(arch_opt)
    arch_type = opt.pop("type")
    opt.update(overrides)
    cls = ARCH_REGISTRY.get(arch_type)
    # Map reference YAML keys onto our constructor names where they differ.
    if arch_type in ("SRCNN", "HighResNet"):
        opt.pop("use_batchnorm", None)
    return cls(**opt)


__all__ = [
    "RRDBNet",
    "RRDB",
    "ResidualDenseBlock",
    "UNetDiscriminatorSN",
    "OSMObjDiscriminator",
    "SelfAttentionBlock",
    "SRCNN",
    "HighResNet",
    "build_arch",
    "blocks",
]
