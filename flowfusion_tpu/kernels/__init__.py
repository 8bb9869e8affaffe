"""Pallas TPU kernels for the hot loops.

All kernels are optional accelerations behind explicit call sites with
pure-XLA reference implementations (``*_reference``) used for testing and
as fallbacks on unsupported configurations.
"""

from .em_sampler import fused_em_sample
from .fused_mlp import (
    fused_drift,
    fused_drift_reference,
    fused_velocity,
    supports_config,
)

__all__ = [
    "fused_drift",
    "fused_drift_reference",
    "fused_em_sample",
    "fused_velocity",
    "supports_config",
]
