from .bar import bar, bar_zero
from .ess import (
    effective_sample_size,
    ess_per_dim,
    min_ess,
    potential_scale_reduction,
)
from .mbar import mbar, mbar_from_q
from .zwanzig import zwanzig, zwanzig_forward

__all__ = [
    "bar", "bar_zero",
    "effective_sample_size", "ess_per_dim", "min_ess",
    "potential_scale_reduction",
    "mbar", "mbar_from_q",
    "zwanzig", "zwanzig_forward",
]
