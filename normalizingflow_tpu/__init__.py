"""TPU-native normalizing-flow probabilistic inference engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
sherryli59/NormalizingFlow (see SURVEY.md): a flow model zoo over
differentiable physics targets, forward/reverse-KL training, a jit-compiled
HMC/NUTS engine with mesh-sharded chains, SMC with flow proposals, and
BAR/MBAR/Zwanzig free-energy estimation.
"""

from . import bijectors, distributions
from .flow import NormalizingFlow

__version__ = "0.1.0"

__all__ = ["bijectors", "distributions", "NormalizingFlow", "__version__"]
