"""Pallas TPU kernels for the hot ops."""

from .rdb import rdb_pallas, restructure_weights

__all__ = ["rdb_pallas", "restructure_weights"]
