"""Pallas TPU kernels for the hot loops.

All kernels are optional accelerations behind explicit call sites with
pure-XLA reference implementations (``*_reference``) used for testing and
as fallbacks on unsupported configurations.
"""

from .em_sampler import fused_em_sample
from .fused_mlp import (
    fusable_config,
    fused_drift,
    fused_drift_reference,
    fused_velocity,
    pad_to_lanes,
    paddable_config,
    supports_config,
)

__all__ = [
    "fusable_config",
    "fused_drift",
    "fused_drift_reference",
    "fused_em_sample",
    "fused_velocity",
    "pad_to_lanes",
    "paddable_config",
    "supports_config",
]
