"""Self-contained MBAR solver (multistate Bennett acceptance ratio).

Replaces the reference's two external dependencies -- FastMBAR and a
hard-coded-path MBAR package (applications/src/test.py:6-9,61-63) -- with a
~60-line JAX self-consistent-iteration solver. For K states and N samples the
update is one (K, N) logsumexp per iteration: trivially jittable, and the
reductions become mesh collectives when the sample axis is sharded.

Math: given u[k, n] = reduced energy of sample n under state k, and sample
counts N_k, solve the self-consistent equations

    f_k = -log sum_n exp(-u[k,n] - log sum_j N_j exp(f_j - u[j,n]))

The free energies are determined up to a constant; f_0 = 0 by convention.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


@partial(jax.jit, static_argnames=("maximum_iterations",))
def mbar(u_kn, n_k, maximum_iterations=500, tolerance=1e-8):
    """Solve MBAR.

    u_kn: (K, N) reduced energies of all N pooled samples under each state k.
    n_k: (K,) number of samples drawn from each state (sums to N).

    Returns f_k (K,) reduced free energies with f[0] = 0.
    """
    u_kn = jnp.asarray(u_kn)
    n_k = jnp.asarray(n_k, u_kn.dtype)
    k_states = u_kn.shape[0]
    log_n = jnp.log(n_k)

    def update(f):
        # log denominator per sample: log sum_j N_j exp(f_j - u_jn)
        log_denom = logsumexp(
            (f + log_n)[:, None] - u_kn, axis=0
        )  # (N,)
        f_new = -logsumexp(-u_kn - log_denom[None, :], axis=1)  # (K,)
        return f_new - f_new[0]

    def cond(carry):
        f, prev, it = carry
        return (it < maximum_iterations) & (
            (it < 2) | (jnp.max(jnp.abs(f - prev)) > tolerance)
        )

    def body(carry):
        f, _, it = carry
        return update(f), f, it + 1

    f0 = jnp.zeros(k_states, u_kn.dtype)
    f, _, _ = jax.lax.while_loop(
        cond, body, (f0, jnp.full(k_states, jnp.inf, u_kn.dtype),
                     jnp.asarray(0))
    )
    return f


def mbar_from_q(q):
    """Reference-workflow adapter: Q work matrices -> (Delta f, norm consts).

    Q: (2, n, 2) as built by applications/src/test.py:39-50 -- Q[i][:, k] is
    the log-density of trajectory i's samples under state k (state 0 = flow,
    state 1 = -U/kT). Reduced energies are u = -logdensity. Returns
    (f_k, log_c_k) with log normalization constants log c_k = -f_k, matching
    the external solver's `norm_const` usage at test.py:61-63.
    """
    q = jnp.asarray(q)
    n0, n1 = q.shape[1], q.shape[1]
    u_kn = -jnp.concatenate([q[0], q[1]], axis=0).T  # (2, 2n)
    f = mbar(u_kn, jnp.asarray([n0, n1]))
    return f, -f
