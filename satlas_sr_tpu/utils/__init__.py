"""Utility subpackage: config, checkpoints, image IO, logging."""

from . import options  # noqa: F401

__all__ = ["options"]
