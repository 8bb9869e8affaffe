"""Utilities: data, checkpointing, torch-checkpoint conversion, diagnostics."""

from . import checkpoint, convert, data

__all__ = ["checkpoint", "convert", "data"]
