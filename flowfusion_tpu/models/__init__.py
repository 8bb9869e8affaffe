"""Model families: diffusion (score), flow matching, symplectic, wrappers."""

from . import flow, nets, population, score, symplectic
from .flow import ODEFlow
from .population import PopulationModelDiffusion
from .score import ScoreModel
from .symplectic import SymplecticFlowModel

__all__ = [
    "flow",
    "nets",
    "population",
    "score",
    "symplectic",
    "ODEFlow",
    "PopulationModelDiffusion",
    "ScoreModel",
    "SymplecticFlowModel",
]
