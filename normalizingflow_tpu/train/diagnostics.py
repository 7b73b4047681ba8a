"""Training diagnostics: force matching and sample quality.

JAX form of the reference's force-matching check (nf/utils_1.py:91-106),
which compared the flow's score (grad of log-density) against LAMMPS forces
through a file round-trip. Here both sides are one autodiff call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def force_matching(flow, params, target, x, kT=1.0):
    """Mean relative error between the flow score and the target force/kT.

    score_model(x) = d/dx log p_flow(x); score_target(x) = force(x)/kT.
    Matches the normalized metric of nf/utils_1.py:106.
    """
    def logp_sum(xb):
        return jnp.sum(flow.log_prob(params, xb))

    predicted = jax.grad(logp_sum)(x)
    actual = target.force(x) / kT
    rel = jnp.linalg.norm(actual - predicted, axis=1) / (
        jnp.linalg.norm(actual, axis=1) + 1e-12
    )
    return jnp.mean(rel)


def held_out_logprob_gap(flow, params, key, data, nsamples=None):
    """The reference's primary quality check (fe.py:43): mean logp of
    generated samples vs held-out data; returns (gen, data, gap)."""
    n = nsamples or data.shape[0]
    _, log_px, _ = flow.sample(params, key, n)
    lp_data = flow.log_prob(params, data)
    gen, dat = jnp.mean(log_px), jnp.mean(lp_data)
    return gen, dat, gen - dat
