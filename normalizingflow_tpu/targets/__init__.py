from .base import PotentialTarget, Target
from .analytic import (
    Banana,
    CorrelatedGaussian,
    IllConditionedGaussian,
    NealsFunnel,
)
from .dataset import TrajectoryDataset, load_trajectory
from .gff import GaussianField, gff_action
from .lj import LennardJones, lj_pair_energy_total
from .phi4 import Phi4Lattice, phi4_action

__all__ = [
    "Target", "PotentialTarget",
    "Banana", "CorrelatedGaussian", "IllConditionedGaussian", "NealsFunnel",
    "TrajectoryDataset", "load_trajectory",
    "GaussianField", "gff_action",
    "LennardJones", "lj_pair_energy_total",
    "Phi4Lattice", "phi4_action",
]
