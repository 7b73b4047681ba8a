"""Flow-preconditioned HMC (NeuTra-style reparameterized sampling).

TPU-native generalization of the reference's flow-seeded HMC
(applications/src/dynamics.py:59-65: sample from the flow, then relax with
LAMMPS-driven HMC). Instead of only *seeding* chains, the trained flow
reparameterizes the target: HMC runs in latent space z on the pullback
density

    log pi~(z) = log pi(T(z)) + log|det dT/dz|,   T = flow.inverse (z -> x)

so an ill-conditioned / multimodal pi becomes approximately the flow's prior
(typically near-isotropic Gaussian) -- large step sizes, O(1) leapfrog steps,
and ESS/s orders of magnitude beyond raw HMC. Samples are mapped back through
T inside the same XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hmc import run_hmc


def pullback_logprob(flow, params, target):
    """Latent-space density: log pi(T(z)) + log|det dT/dz| for single z."""

    def logprob(z):
        x, log_det = flow.inverse(params, z[None])
        return target.log_prob(x)[0] + log_det[0]

    return logprob


def pullback_logprob_batched(flow, params, target):
    """Chain-batched pullback: (chains, dim) -> (chains,) in ONE flow call.

    Use with `run_hmc(..., batched_target=True)`. Required for spline-flow
    pullbacks on TPU: per-chain evaluation under vmap x scan x grad faults
    the runtime (PERF.md r5), and the flow's batch-gated accelerated ops
    (ops/rqs_pallas.py) can only engage on flat batches.
    """

    def logprob(z):
        x, log_det = flow.inverse(params, z)
        return target.log_prob(x) + log_det

    return logprob


class NeutraResult(NamedTuple):
    samples_x: jnp.ndarray     # (num_samples, chains, dim) data space
    samples_z: jnp.ndarray     # latent space
    accept_rate: jnp.ndarray
    step_size: jnp.ndarray


def neutra_hmc(key, flow, params, target, num_chains, num_samples,
               num_warmup=200, step_size=0.5, num_leapfrog=8,
               target_accept=0.8, thin=1):
    """Run flow-preconditioned HMC; returns samples in data space.

    The latent chain-init draws come from the flow prior, so chains start in
    the typical set of the pullback density.
    """
    k_init, k_run = jax.random.split(key)
    z0 = flow.prior.sample(k_init, num_chains)
    logprob = pullback_logprob(flow, params, target)
    result = run_hmc(
        k_run, logprob, z0, num_samples,
        num_warmup=num_warmup, step_size=step_size,
        num_leapfrog=num_leapfrog, target_accept=target_accept, thin=thin,
    )

    @jax.jit
    def push(zs):
        flat = zs.reshape(-1, zs.shape[-1])
        x, _ = flow.inverse(params, flat)
        return x.reshape(zs.shape)

    return NeutraResult(
        samples_x=push(result.samples),
        samples_z=result.samples,
        accept_rate=result.accept_rate,
        step_size=result.step_size,
    )
