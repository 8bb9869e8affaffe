"""Utilities: data, checkpointing, torch-checkpoint conversion, diagnostics."""

from . import checkpoint, convert, data, diagnostics, stats

__all__ = ["checkpoint", "convert", "data", "diagnostics", "stats"]
