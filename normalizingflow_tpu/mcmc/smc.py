"""Adaptive-tempering Sequential Monte Carlo with flow proposals.

BASELINE.json config 5 ("SMC with flow proposals on a lattice phi^4 /
particle-system energy model, multi-host resampling"). No reference
counterpart exists (SURVEY.md §2.5) -- designed TPU-first:

  * the ENTIRE sampler -- adaptive temperature selection (bisection on the
    ESS of incremental weights), systematic resampling, and HMC mutation
    moves -- is one jit-compiled `lax.while_loop` over annealing stages;
  * the particle axis is a plain batch axis: shard it over the mesh
    (parallel/mesh.py) and XLA turns the weight reductions / resampling
    gathers into psum / all_gather collectives;
  * annealing path: pi_beta(x) ∝ q(x)^(1-beta) * pi(x)^beta from a proposal
    density q (a trained flow via `flow_smc`, or the prior) to the target pi;
  * log-evidence (log Z ratio) accumulates via the standard logsumexp of
    incremental weights at each stage.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from .hmc import hmc_kernel


def systematic_resampling(key, log_weights, n=None):
    """Systematic resampling: indices drawn with one uniform offset.

    log_weights: (N,) unnormalized. Returns (n,) int32 indices. O(N log N)
    via searchsorted on the normalized CDF -- XLA-friendly, no host sync.
    """
    n_in = log_weights.shape[0]
    n = n or n_in
    w = jax.nn.softmax(log_weights)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), w.dtype)
    points = (u0 + jnp.arange(n, dtype=w.dtype)) / n
    idx = jnp.searchsorted(cdf, points)
    return jnp.clip(idx, 0, n_in - 1).astype(jnp.int32)


def ess_from_log_weights(log_w):
    """Effective sample size of normalized importance weights."""
    log_norm = log_w - logsumexp(log_w)
    return jnp.exp(-logsumexp(2.0 * log_norm))


class SMCResult(NamedTuple):
    particles: jnp.ndarray       # (N, dim) final equally-weighted particles
    log_evidence: jnp.ndarray    # log Z_target / Z_proposal estimate
    n_stages: jnp.ndarray        # annealing stages taken
    final_accept: jnp.ndarray    # mean HMC acceptance at the last stage


@partial(
    jax.jit,
    static_argnames=(
        "proposal_logprob_fn", "target_logprob_fn", "n_mutation_steps",
        "num_leapfrog", "max_stages",
    ),
)
def run_smc(
    key,
    particles,
    proposal_logprob_fn,
    target_logprob_fn,
    n_mutation_steps=3,
    num_leapfrog=6,
    step_size=0.3,
    ess_fraction=0.5,
    max_stages=64,
):
    """Anneal particles ~ proposal to the target; one XLA program.

    particles: (N, dim) initial draws from the proposal.
    The next temperature is the largest beta' <= 1 whose incremental weights
    keep ESS >= ess_fraction * N (30-step bisection). Each stage resamples
    systematically and runs `n_mutation_steps` HMC transitions targeting
    pi_beta'.
    """
    n, dim = particles.shape
    dtype = particles.dtype

    lp_prop = proposal_logprob_fn(particles)
    lp_targ = target_logprob_fn(particles)
    # incremental log-weight for beta -> beta': (beta'-beta) * (lp_t - lp_p)
    delta0 = lp_targ - lp_prop

    def next_beta(beta, delta):
        """Bisection on ESS(beta') = ess_fraction * N."""
        target_ess = ess_fraction * n

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            ess = ess_from_log_weights((mid - beta) * delta)
            return jax.lax.cond(
                ess < target_ess,
                lambda: (lo, mid),
                lambda: (mid, hi),
            )

        lo, hi = jax.lax.fori_loop(
            0, 30, body, (beta, jnp.asarray(1.0, dtype))
        )
        # If even beta'=1 keeps ESS above target, jump straight to 1.
        ess_at_1 = ess_from_log_weights((1.0 - beta) * delta)
        return jnp.where(ess_at_1 >= target_ess, jnp.asarray(1.0, dtype), lo)

    def anneal_logprob(x, beta):
        return (1.0 - beta) * proposal_logprob_fn(x) \
            + beta * target_logprob_fn(x)

    def mutate(key, particles, beta, eps):
        """n_mutation_steps vmapped HMC transitions at temperature beta."""
        logp = lambda q: anneal_logprob(q[None], beta)[0]
        kernel = hmc_kernel(
            logp, eps, num_leapfrog, jnp.ones(dim, dtype)
        )
        from .hmc import hmc_init

        state = jax.vmap(lambda q: hmc_init(logp, q))(particles)

        def step(carry, k):
            state = carry
            keys = jax.random.split(k, n)
            state, info = jax.vmap(kernel)(keys, state)
            return state, jnp.mean(info.accept_prob)

        state, accepts = jax.lax.scan(
            step, state, jax.random.split(key, n_mutation_steps)
        )
        return state.position, accepts[-1]

    class Carry(NamedTuple):
        key: jax.Array
        particles: jnp.ndarray
        beta: jnp.ndarray
        log_z: jnp.ndarray
        stage: jnp.ndarray
        accept: jnp.ndarray
        eps: jnp.ndarray

    def cond(c):
        return (c.beta < 1.0) & (c.stage < max_stages)

    def body(c):
        key, k_resample, k_mutate = jax.random.split(c.key, 3)
        lp_p = proposal_logprob_fn(c.particles)
        lp_t = target_logprob_fn(c.particles)
        delta = lp_t - lp_p
        beta_new = next_beta(c.beta, delta)
        log_w = (beta_new - c.beta) * delta
        log_z = c.log_z + logsumexp(log_w) - jnp.log(jnp.asarray(n, dtype))
        idx = systematic_resampling(k_resample, log_w)
        particles = jnp.take(c.particles, idx, axis=0)
        particles, accept = mutate(k_mutate, particles, beta_new, c.eps)
        # crude step-size control: nudge toward ~0.65 acceptance
        eps = c.eps * jnp.exp(jnp.clip(accept - 0.65, -0.2, 0.2))
        return Carry(key, particles, beta_new, log_z, c.stage + 1, accept,
                     eps)

    init = Carry(
        key=key, particles=particles, beta=jnp.zeros((), dtype),
        log_z=jnp.zeros((), dtype), stage=jnp.zeros((), jnp.int32),
        accept=jnp.zeros((), dtype),
        eps=jnp.asarray(step_size, dtype),
    )
    final = jax.lax.while_loop(cond, body, init)
    return SMCResult(
        particles=final.particles,
        log_evidence=final.log_z,
        n_stages=final.stage,
        final_accept=final.accept,
    )


def flow_smc(key, flow, params, target, n_particles, **smc_kwargs):
    """SMC with a trained flow as the proposal: particles start as flow
    samples and anneal from the flow density to the target."""
    k_init, k_run = jax.random.split(key)
    x0, _, _ = flow.sample(params, k_init, n_particles)

    def proposal_logprob(x):
        return flow.log_prob(params, x)

    return run_smc(
        k_run, x0, proposal_logprob, target.log_prob, **smc_kwargs
    )
