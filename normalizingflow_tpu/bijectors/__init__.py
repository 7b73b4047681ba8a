from .base import Bijector, Chain, Invert, Repeat
from .coupling import AffineCoupling, SplineCoupling
from .autoregressive import MaskedAffineAR, SplineAR
from .elementary import ActNorm, InvertibleLinear, Planar, Radial
from .rqs import rational_quadratic_spline, split_spline_params, unconstrained_rqs

__all__ = [
    "Bijector", "Chain", "Invert", "Repeat",
    "AffineCoupling", "SplineCoupling",
    "MaskedAffineAR", "SplineAR",
    "ActNorm", "InvertibleLinear", "Planar", "Radial",
    "rational_quadratic_spline", "split_spline_params", "unconstrained_rqs",
]
