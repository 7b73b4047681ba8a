"""Zwanzig exponential-averaging (free-energy perturbation) estimators.

JAX form of the one-sided estimates computed inline at
/root/reference/applications/src/test.py:67-68:

    Delta F = -log < exp(-w) >  over work values w,

evaluated with logsumexp (the reference's raw np.mean(np.exp(...)) overflows
for large work values).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp


def zwanzig(work):
    """Delta F = -log mean(exp(-work)), stable."""
    work = jnp.asarray(work)
    n = work.shape[0]
    return -(logsumexp(-work) - jnp.log(n))


def zwanzig_forward(u_target, u_ref):
    """FEP from reference ensemble samples: w = u_target - u_ref."""
    return zwanzig(jnp.asarray(u_target) - jnp.asarray(u_ref))
