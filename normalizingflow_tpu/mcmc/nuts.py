"""Iterative No-U-Turn Sampler (NUTS), jit/vmap-native.

The BASELINE north star's "jit-compiled NUTS/HMC engine". No reference
counterpart (the reference has fixed-length LAMMPS-driven HMC only,
nf/hmc.py); this is the memory-efficient ITERATIVE formulation (Phan &
Pradhan, as in NumPyro/Stan) rather than Hoffman & Gelman's recursion --
recursion doesn't trace under XLA:

  * trajectory doubling loop: `lax.while_loop` over tree depths;
  * each subtree of 2^depth leapfrog leaves is built by an inner while_loop
    carrying a CHECKPOINT STACK of O(max_depth) states. Leaf m (even) is
    stored at slot popcount(m); at odd leaf n with t trailing one-bits, the
    U-turn condition is checked against the contiguous slot range
    [popcount(n)-t, popcount(n)-1] -- exactly the first leaves of every
    subtree that ends at n;
  * multinomial progressive sampling within subtrees, biased progressive
    sampling across the doubling (Betancourt's choice, as in Stan);
  * divergence guard at |Delta H| > 1000, diagonal mass matrix throughout.

`run_nuts` mirrors `run_hmc`'s warmup (dual-averaging + windowed Welford
mass) and returns the same result shape, so the two engines are drop-in
interchangeable.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hmc import chunked_scan, padded_length
from .adaptation import (
    da_init,
    da_step_size,
    da_update,
    warmup_schedule,
    welford_init,
    welford_update_batch,
    welford_variance,
)

MAX_DELTA_ENERGY = 1000.0


class _Z(NamedTuple):
    """One phase-space point."""
    q: jnp.ndarray
    p: jnp.ndarray
    grad: jnp.ndarray
    logp: jnp.ndarray


def _popcount(n):
    return jax.lax.population_count(n)


def _trailing_ones(n):
    # number of trailing 1 bits of n = popcount(n & ~(n+1))
    return _popcount(jnp.bitwise_and(n, jnp.bitwise_not(n + 1)))


def _leapfrog_one(logprob_grad_fn, z, eps, inv_mass):
    p = z.p + 0.5 * eps * z.grad
    q = z.q + eps * inv_mass * p
    logp, grad = logprob_grad_fn(q)
    p = p + 0.5 * eps * grad
    return _Z(q, p, grad, logp)


def _energy(z, inv_mass):
    return -z.logp + 0.5 * jnp.sum(inv_mass * z.p * z.p)


def _is_turning(q_left, p_left, q_right, p_right, inv_mass):
    dq = q_right - q_left
    return (jnp.dot(dq, inv_mass * p_left) <= 0.0) | (
        jnp.dot(dq, inv_mass * p_right) <= 0.0
    )


class _SubtreeState(NamedTuple):
    key: jax.Array
    z_end: _Z                    # running end of the subtree
    z_prop: _Z                   # subtree's multinomial proposal
    log_sum_w: jnp.ndarray       # subtree total log weight
    sum_accept: jnp.ndarray      # sum of min(1, exp(dH)) over leaves
    leaf: jnp.ndarray            # leaves built so far
    turning: jnp.ndarray
    diverged: jnp.ndarray
    # checkpoint stacks (max_depth+1 slots)
    q_ckpt: jnp.ndarray
    p_ckpt: jnp.ndarray


def _build_subtree(key, logprob_grad_fn, z_start, depth, eps, inv_mass,
                   h0, max_depth):
    """Build 2^depth leapfrog leaves from z_start (already-signed eps).

    Returns (_SubtreeState) with z_end, proposal, weight, turning/diverged.
    """
    dim = z_start.q.shape[0]
    dtype = z_start.q.dtype
    n_leaves = jnp.left_shift(jnp.asarray(1, jnp.int32), depth)

    init = _SubtreeState(
        key=key,
        z_end=z_start,
        z_prop=z_start,
        log_sum_w=jnp.asarray(-jnp.inf, dtype),
        sum_accept=jnp.zeros((), dtype),
        leaf=jnp.asarray(0, jnp.int32),
        turning=jnp.asarray(False),
        diverged=jnp.asarray(False),
        q_ckpt=jnp.zeros((max_depth + 1, dim), dtype),
        p_ckpt=jnp.zeros((max_depth + 1, dim), dtype),
    )

    def cond(s):
        return (s.leaf < n_leaves) & ~s.turning & ~s.diverged

    def body(s):
        key, k_prop = jax.random.split(s.key)
        z = _leapfrog_one(logprob_grad_fn, s.z_end, eps, inv_mass)
        n = s.leaf  # index of this new leaf within the subtree
        h = _energy(z, inv_mass)
        # NaN guard (mirrors hmc.py's `finite` mask): a non-finite leaf
        # energy must contribute weight exp(-inf)=0 and accept_prob 0 --
        # NOT NaN. Without this, one divergent leaf poisons sum_accept,
        # the chain-mean accept stat, and through da_update the adapted
        # step size of EVERY subsequent transition (the r3 bench failure:
        # divergence_rate 1.0, accept NaN).
        finite = jnp.isfinite(h) & jnp.isfinite(h0)
        dh = jnp.where(finite, h0 - h, -jnp.inf)  # log multinomial weight
        diverged = ~finite | (h - h0 > MAX_DELTA_ENERGY)
        accept_prob = jnp.where(
            finite, jnp.minimum(1.0, jnp.exp(jnp.minimum(dh, 0.0))), 0.0
        )

        # progressive multinomial proposal within the subtree
        log_sum_w = jnp.logaddexp(s.log_sum_w, dh)
        take = jnp.log(jax.random.uniform(k_prop, (), dtype)) < dh - log_sum_w
        z_prop = jax.tree.map(
            lambda a, b: jnp.where(take, a, b), z, s.z_prop
        )

        # checkpoint store (even leaves) at slot popcount(n)
        slot = _popcount(n)
        is_even = (n % 2) == 0
        q_ckpt = jnp.where(
            is_even, s.q_ckpt.at[slot].set(z.q), s.q_ckpt
        )
        p_ckpt = jnp.where(
            is_even, s.p_ckpt.at[slot].set(z.p), s.p_ckpt
        )

        # U-turn checks (odd leaves) against slots [pc-t, pc-1]
        t_ones = _trailing_ones(n)
        pc = _popcount(n)
        slots = jnp.arange(max_depth + 1)
        active = (slots >= pc - t_ones) & (slots <= pc - 1)

        def check(slot_idx):
            return _is_turning(
                q_ckpt[slot_idx], p_ckpt[slot_idx], z.q, z.p, inv_mass
            )

        turns = jax.vmap(check)(slots)
        turning = (~is_even) & jnp.any(turns & active)

        return _SubtreeState(
            key=key,
            z_end=z,
            z_prop=z_prop,
            log_sum_w=log_sum_w,
            sum_accept=s.sum_accept + accept_prob,
            leaf=n + 1,
            turning=turning,
            diverged=diverged,
            q_ckpt=q_ckpt,
            p_ckpt=p_ckpt,
        )

    return jax.lax.while_loop(cond, body, init)


class NUTSInfo(NamedTuple):
    accept_prob: jnp.ndarray
    diverged: jnp.ndarray
    depth: jnp.ndarray
    n_leapfrog: jnp.ndarray


class _TreeState(NamedTuple):
    key: jax.Array
    z_left: _Z
    z_right: _Z
    z_prop: _Z
    log_sum_w: jnp.ndarray
    depth: jnp.ndarray
    turning: jnp.ndarray
    diverged: jnp.ndarray
    sum_accept: jnp.ndarray
    n_leapfrog: jnp.ndarray


def nuts_kernel(logprob_fn, step_size, inv_mass_diag, max_depth=10):
    """One NUTS transition for a single chain (vmap over chains)."""
    logprob_grad_fn = jax.value_and_grad(logprob_fn)

    def kernel(key, state):
        # state: HMCState-compatible (position, log_prob, grad)
        k_mom, k_loop = jax.random.split(key)
        dtype = state.position.dtype
        sqrt_mass = jnp.sqrt(1.0 / inv_mass_diag)
        p0 = sqrt_mass * jax.random.normal(
            k_mom, state.position.shape, dtype
        )
        z0 = _Z(state.position, p0, state.grad, state.log_prob)
        h0 = _energy(z0, inv_mass_diag)

        init = _TreeState(
            key=k_loop,
            z_left=z0,
            z_right=z0,
            z_prop=z0,
            log_sum_w=jnp.zeros((), dtype),  # leaf z0 has weight exp(0)
            depth=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False),
            diverged=jnp.asarray(False),
            sum_accept=jnp.zeros((), dtype),
            n_leapfrog=jnp.asarray(0, jnp.int32),
        )

        def cond(t):
            return (t.depth < max_depth) & ~t.turning & ~t.diverged

        def body(t):
            key, k_dir, k_sub, k_take = jax.random.split(t.key, 4)
            go_right = jax.random.bernoulli(k_dir)
            eps = jnp.where(go_right, step_size, -step_size)
            z_start = jax.tree.map(
                lambda r, l: jnp.where(go_right, r, l), t.z_right, t.z_left
            )
            sub = _build_subtree(
                k_sub, logprob_grad_fn, z_start, t.depth, eps,
                inv_mass_diag, h0, max_depth,
            )
            # new endpoint on the chosen side
            z_left = jax.tree.map(
                lambda l, e: jnp.where(go_right, l, e), t.z_left, sub.z_end
            )
            z_right = jax.tree.map(
                lambda r, e: jnp.where(go_right, e, r), t.z_right, sub.z_end
            )
            ok = ~sub.turning & ~sub.diverged
            # biased progressive sampling across the doubling
            take_new = ok & (
                jnp.log(jax.random.uniform(k_take, (), t.log_sum_w.dtype))
                < sub.log_sum_w - t.log_sum_w
            )
            z_prop = jax.tree.map(
                lambda a, b: jnp.where(take_new, a, b), sub.z_prop, t.z_prop
            )
            log_sum_w = jnp.logaddexp(t.log_sum_w, sub.log_sum_w)
            # merged-tree U-turn check (endpoints)
            turning_merged = _is_turning(
                z_left.q, z_left.p, z_right.q, z_right.p, inv_mass_diag
            )
            return _TreeState(
                key=key,
                z_left=z_left,
                z_right=z_right,
                z_prop=z_prop,
                log_sum_w=log_sum_w,
                depth=t.depth + 1,
                turning=sub.turning | turning_merged,
                diverged=sub.diverged,
                sum_accept=t.sum_accept + sub.sum_accept,
                n_leapfrog=t.n_leapfrog + sub.leaf,
            )

        t = jax.lax.while_loop(cond, body, init)

        from .hmc import HMCState

        new_state = HMCState(
            position=t.z_prop.q, log_prob=t.z_prop.logp, grad=t.z_prop.grad
        )
        accept_stat = t.sum_accept / jnp.maximum(
            t.n_leapfrog.astype(t.sum_accept.dtype), 1.0
        )
        info = NUTSInfo(
            accept_prob=accept_stat,
            diverged=t.diverged,
            depth=t.depth,
            n_leapfrog=t.n_leapfrog,
        )
        return new_state, info

    return kernel


class NUTSResult(NamedTuple):
    samples: jnp.ndarray
    log_probs: jnp.ndarray
    accept_rate: jnp.ndarray
    step_size: jnp.ndarray
    inv_mass_diag: jnp.ndarray
    mean_depth: jnp.ndarray
    divergence_rate: jnp.ndarray
    final_state: "HMCState"


@partial(
    jax.jit,
    static_argnames=(
        "logprob_fn", "num_samples", "num_warmup", "max_depth",
        "target_accept",
    ),
)
def run_nuts(key, logprob_fn, init_position, num_samples, num_warmup=500,
             step_size=0.1, max_depth=8, target_accept=0.8,
             inv_mass_diag=None):
    """Full NUTS run (warmup adaptation + sampling), one XLA program.

    Mirrors run_hmc's interface; init_position (chains, dim).
    `inv_mass_diag` seeds the (diagonal) inverse mass; with num_warmup=0 it
    is used as-is -- the timed-phase pattern bench.py uses for HMC."""
    from .hmc import hmc_init

    chains, dim = init_position.shape
    dtype = init_position.dtype

    state = jax.vmap(lambda q: hmc_init(logprob_fn, q))(init_position)

    def make_kernel(eps, inv_mass):
        single = nuts_kernel(logprob_fn, eps, inv_mass, max_depth)
        return lambda keys, st: jax.vmap(single)(keys, st)

    in_window, window_end = warmup_schedule(num_warmup)
    in_window = jnp.asarray(in_window)
    window_end = jnp.asarray(window_end)
    da_state = da_init(jnp.asarray(step_size, dtype))
    wf_state = welford_init(dim, dtype)
    if inv_mass_diag is None:
        inv_mass_diag = jnp.ones(dim, dtype)

    def warmup_step(carry, xs):
        state, da_state, wf_state, inv_mass = carry
        key, in_win, win_end = xs
        keys = jax.random.split(key, chains)
        kernel = make_kernel(da_step_size(da_state), inv_mass)
        state, info = kernel(keys, state)
        da_state = da_update(
            da_state, jnp.mean(info.accept_prob), target_accept
        )
        wf_state = jax.lax.cond(
            in_win,
            lambda s: welford_update_batch(s, state.position),
            lambda s: s,
            wf_state,
        )

        def refresh(args):
            da_state, wf_state, inv_mass = args
            return (
                da_init(da_step_size(da_state)),
                welford_init(dim, dtype),
                welford_variance(wf_state),
            )

        da_state, wf_state, inv_mass = jax.lax.cond(
            win_end, refresh, lambda a: a, (da_state, wf_state, inv_mass)
        )
        return (state, da_state, wf_state, inv_mass), None

    if num_warmup > 0:
        k_warm, key = jax.random.split(key)
        # Fresh keys + False flags for the chunked_scan tail pad (see
        # hmc.padded_length).
        n_pad = padded_length(num_warmup)
        pad_false = jnp.zeros(n_pad - num_warmup, bool)
        (state, da_state, _, inv_mass_diag), _ = chunked_scan(
            warmup_step,
            (state, da_state, wf_state, inv_mass_diag),
            (jax.random.split(k_warm, n_pad),
             jnp.concatenate([in_window, pad_false]),
             jnp.concatenate([window_end, pad_false])),
            length=num_warmup,
        )
        eps_final = da_step_size(da_state, averaged=True)
    else:
        eps_final = jnp.asarray(step_size, dtype)

    kernel = make_kernel(eps_final, inv_mass_diag)

    def sample_step(carry, key):
        state, acc, dep, div = carry
        keys = jax.random.split(key, chains)
        state, info = kernel(keys, state)
        return (
            state,
            acc + jnp.mean(info.accept_prob),
            dep + jnp.mean(info.depth.astype(dtype)),
            div + jnp.mean(info.diverged.astype(dtype)),
        ), (state.position, state.log_prob)

    (state, acc, dep, div), (samples, log_probs) = chunked_scan(
        sample_step,
        (state, jnp.zeros((), dtype), jnp.zeros((), dtype),
         jnp.zeros((), dtype)),
        jax.random.split(key, padded_length(num_samples)),
        length=num_samples,
    )
    n = float(samples.shape[0])
    samples = samples[:num_samples]
    log_probs = log_probs[:num_samples]
    return NUTSResult(
        samples=samples,
        log_probs=log_probs,
        accept_rate=acc / n,
        step_size=eps_final,
        inv_mass_diag=inv_mass_diag,
        mean_depth=dep / n,
        divergence_rate=div / n,
        final_state=state,
    )
