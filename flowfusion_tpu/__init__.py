"""flowfusion-tpu: a TPU-native generative-flow framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Cosmo-Pop/flowfusion: score-based diffusion (VE/VP/sub-VP SDEs, DSM
training, Euler--Maruyama and probability-flow-ODE sampling, exact CNF
log-likelihoods with exact/Hutchinson/Hutch++/XTrace trace estimators),
conditional flow-matching CNFs, and symplectic Hamiltonian flows — plus the
engineering the reference lacks: an in-house on-device adaptive
Dormand--Prince integrator, jitted training, checkpointing, batch sharding
over device meshes, Pallas kernels for the hot loops, tests and benchmarks.

See SURVEY.md for the structural analysis of the reference and the parity
contract this package implements.
"""

from . import models, ops

__version__ = "0.1.0"

# Convenience re-exports of the primary public API.
from .models.nets import (  # noqa: E402
    ScoreMLPConfig,
    SymplecticMLPConfig,
    VelocityMLPConfig,
)
from .models.score import ScoreModel  # noqa: E402
from .ops.integrate import euler_maruyama, odeint  # noqa: E402
from .ops.sde import SUBVPSDE, VESDE, VPSDE  # noqa: E402

__all__ = [
    "models",
    "ops",
    "ScoreModel",
    "ScoreMLPConfig",
    "VelocityMLPConfig",
    "SymplecticMLPConfig",
    "VESDE",
    "VPSDE",
    "SUBVPSDE",
    "odeint",
    "euler_maruyama",
]
