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

from . import models, ops, parallel, train, utils

__version__ = "0.1.0"

# Convenience re-exports of the primary public API.
from .models.flow import ODEFlow  # noqa: E402
from .models.nets import (  # noqa: E402
    ScoreMLPConfig,
    SymplecticMLPConfig,
    VelocityMLPConfig,
)
from .models.population import PopulationModelDiffusion  # noqa: E402
from .models.score import ScoreModel  # noqa: E402
from .models.symplectic import SymplecticFlowModel  # noqa: E402
from .ops.integrate import euler_maruyama, odeint, odeint_adjoint  # noqa: E402
from .ops.sde import SUBVPSDE, VESDE, VPSDE  # noqa: E402
from .train import fit  # noqa: E402

__all__ = [
    "models",
    "ops",
    "parallel",
    "train",
    "utils",
    "ScoreModel",
    "ODEFlow",
    "SymplecticFlowModel",
    "PopulationModelDiffusion",
    "ScoreMLPConfig",
    "VelocityMLPConfig",
    "SymplecticMLPConfig",
    "VESDE",
    "VPSDE",
    "SUBVPSDE",
    "odeint",
    "odeint_adjoint",
    "euler_maruyama",
    "fit",
]
