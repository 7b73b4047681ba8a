"""Warmup adaptation: dual-averaging step size + Welford mass matrix.

No reference counterpart (the reference's HMC has a fixed dt driven by LAMMPS,
nf/hmc.py:8-41); this is the standard Stan/NUTS adaptation machinery expressed
as pure JAX state transitions so it runs inside the jit-compiled warmup scan.

Cross-chain design: with thousands of vmapped chains, acceptance statistics
are averaged over the chain axis each step (a `pmean` over the mesh when
chains are sharded, parallel/mesh.py), and the diagonal mass matrix is the
Welford variance pooled over chains x steps inside each adaptation window --
the many-chain analogue of Stan's single-chain windows.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- dual avg
class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray       # current log step size
    log_step_avg: jnp.ndarray   # averaged iterate (used after warmup)
    h_bar: jnp.ndarray          # running error statistic
    t: jnp.ndarray              # iteration count
    mu: jnp.ndarray             # shrinkage point = log(10 * eps0)


def da_init(step_size):
    log_step = jnp.log(step_size)
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=log_step,
        h_bar=jnp.zeros_like(log_step),
        t=jnp.zeros_like(log_step),
        mu=jnp.log(10.0) + log_step,
    )


def da_update(state, accept_prob, target_accept=0.8, gamma=0.05, t0=10.0,
              kappa=0.75):
    """One Nesterov dual-averaging step toward the target acceptance rate."""
    t = state.t + 1.0
    w = 1.0 / (t + t0)
    h_bar = (1.0 - w) * state.h_bar + w * (target_accept - accept_prob)
    log_step = state.mu - (jnp.sqrt(t) / gamma) * h_bar
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, h_bar, t, state.mu)


def da_step_size(state, averaged=False):
    return jnp.exp(state.log_step_avg if averaged else state.log_step)


# ---------------------------------------------------------------- welford
class WelfordState(NamedTuple):
    mean: jnp.ndarray   # (dim,)
    m2: jnp.ndarray     # (dim,)
    count: jnp.ndarray  # scalar


def welford_init(dim, dtype=jnp.float32):
    return WelfordState(
        mean=jnp.zeros(dim, dtype), m2=jnp.zeros(dim, dtype),
        count=jnp.zeros((), dtype),
    )


def welford_update_batch(state, x):
    """Fold a (chains, dim) batch into the running moments (chunk update)."""
    n_b = x.shape[0]
    mean_b = jnp.mean(x, axis=0)
    m2_b = jnp.sum((x - mean_b) ** 2, axis=0)
    n_a = state.count
    n = n_a + n_b
    delta = mean_b - state.mean
    mean = state.mean + delta * (n_b / n)
    m2 = state.m2 + m2_b + delta * delta * (n_a * n_b / n)
    return WelfordState(mean=mean, m2=m2, count=n)


def welford_variance(state, regularize=True):
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        # Stan's shrinkage toward unit variance for small sample counts.
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


# ---------------------------------------------------------------- schedule
def warmup_schedule(num_warmup, init_buffer=75, term_buffer=50, base_window=25):
    """Stan-style window schedule, returned as static numpy flag arrays.

    Returns (in_window, window_end): bool arrays of length num_warmup. Mass
    adaptation accumulates where in_window; at each window_end the mass is
    refreshed and the Welford state and step-size averaging restart.
    """
    num_warmup = int(num_warmup)
    in_window = np.zeros(num_warmup, dtype=bool)
    window_end = np.zeros(num_warmup, dtype=bool)
    if num_warmup < init_buffer + term_buffer + base_window:
        # Too short for windows: adapt step size only.
        return in_window, window_end
    start = init_buffer
    end = num_warmup - term_buffer
    size = base_window
    t = start
    while t < end:
        stop = min(t + size, end)
        if end - stop < base_window:  # absorb the tail into the last window
            stop = end
        in_window[t:stop] = True
        window_end[stop - 1] = True
        t = stop
        size *= 2
    return in_window, window_end
