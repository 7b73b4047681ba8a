from .adaptation import (
    DualAveragingState,
    da_init,
    da_step_size,
    da_update,
    warmup_schedule,
    welford_init,
    welford_update_batch,
    welford_variance,
)
from .hmc import (
    HMCInfo,
    HMCResult,
    HMCState,
    hmc_init,
    hmc_kernel,
    hmc_kernel_batched,
    leapfrog,
    run_hmc,
)
from .neutra import NeutraResult, neutra_hmc, pullback_logprob

__all__ = [
    "DualAveragingState", "da_init", "da_step_size", "da_update",
    "warmup_schedule", "welford_init", "welford_update_batch",
    "welford_variance",
    "HMCInfo", "HMCResult", "HMCState", "hmc_init", "hmc_kernel",
    "hmc_kernel_batched", "leapfrog", "run_hmc",
    "NeutraResult", "neutra_hmc", "pullback_logprob",
]
