"""Bennett acceptance ratio (BAR) free-energy estimator.

JAX re-implementation of /root/reference/applications/src/bar.py:3-68: the
stable implicit-equation form with log-sum-exp reductions, iterated to a
fixed point. The reference's Python `for` loop with an early-break becomes a
`lax.while_loop` on (relative change > tol) -- the whole solve jit-compiles
and differentiates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _log_f(x):
    """log(1/(1+exp(x))) = -softplus(x), computed stably."""
    return -jax.nn.softplus(x)


def bar_zero(w_f, w_r, delta_f):
    """The function zeroed by the BAR estimate (bar.py:16-58).

    w_f: forward work values (T_F,); w_r: reverse work values (T_R,).
    """
    t_f, t_r = w_f.shape[0], w_r.shape[0]
    m = jnp.log(t_f / t_r)
    log_numer = jax.scipy.special.logsumexp(_log_f(m + w_f - delta_f)) \
        - jnp.log(t_f)
    log_denom = jax.scipy.special.logsumexp(_log_f(m - w_r - delta_f) - w_r) \
        - jnp.log(t_r)
    return delta_f - (log_denom - log_numer)


@partial(jax.jit, static_argnames=("maximum_iterations",))
def bar(w_f, w_r, delta_f_init=0.0, maximum_iterations=1000,
        relative_tolerance=1.0e-5):
    """Self-consistent BAR solve: Delta F such that bar_zero == 0.

    Fixed-point iteration delta <- delta - bar_zero(delta), matching
    bar.py:60-67, with the convergence test inside a while_loop.
    """
    w_f = jnp.asarray(w_f, jnp.float64) if jax.config.jax_enable_x64 \
        else jnp.asarray(w_f)
    w_r = jnp.asarray(w_r, w_f.dtype)

    def cond(carry):
        delta, prev, it = carry
        rel = jnp.abs((delta - prev) / jnp.where(delta == 0.0, 1.0, delta))
        return (it < maximum_iterations) & ((it < 2) | (rel > relative_tolerance))

    def body(carry):
        delta, _, it = carry
        new = delta - bar_zero(w_f, w_r, delta)
        return new, delta, it + 1

    init = (jnp.asarray(delta_f_init, w_f.dtype),
            jnp.asarray(jnp.inf, w_f.dtype), jnp.asarray(0))
    delta, _, _ = jax.lax.while_loop(cond, body, init)
    return delta
