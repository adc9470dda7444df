"""Data registry package (importing registers all datasets)."""

from .s2naip import S2NAIPDataset, has_black_pixels
from .loader import (
    PrefetchLoader,
    SequentialEvalLoader,
    build_dataset,
    build_train_loader,
    default_collate,
)
from .sampler import EnlargedShuffleSampler, WeightedInfiniteSampler, build_sampler

__all__ = [
    "S2NAIPDataset",
    "has_black_pixels",
    "PrefetchLoader",
    "SequentialEvalLoader",
    "build_dataset",
    "build_train_loader",
    "default_collate",
    "EnlargedShuffleSampler",
    "WeightedInfiniteSampler",
    "build_sampler",
]
