"""Jit-compiled Hamiltonian Monte Carlo over vmapped chains.

TPU-native rebuild of the reference's HMC driver (/root/reference/nf/hmc.py:
8-65 + applications/src/dynamics.py). The reference round-trips through a C++
LAMMPS process for every leapfrog segment (set_velocity -> lmp.run N ->
readback, systems.py:82-103) and Metropolis-corrects in Python with an
overflow-prone `math.exp(beta*dU)` (nf/hmc.py:56). Here the whole chain --
momentum refresh, leapfrog with `jax.value_and_grad` of the target, and the
correction -- is ONE fused XLA program:

  * chains are a leading axis handled by `vmap` (and sharded over the mesh by
    parallel/mesh.py for multi-chip);
  * leapfrog is a `lax.scan` of fused gradient+update steps; the target's
    log-prob gradient is the only physics call, replacing the external MD
    engine (SURVEY.md §2.4);
  * acceptance uses log-space `min(0, dH)` -- overflow-safe (fixes
    nf/hmc.py:56);
  * a diagonal mass matrix M plays the role of the reference's per-particle
    masses (nf/hmc.py:24-27): momenta ~ N(0, M), kinetic energy p^T M^-1 p/2.

`run_hmc` adds Stan-style warmup (dual-averaging step size + windowed
cross-chain Welford mass adaptation, mcmc/adaptation.py) and returns thinned
samples with acceptance statistics.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .adaptation import (
    da_init,
    da_step_size,
    da_update,
    warmup_schedule,
    welford_init,
    welford_update_batch,
    welford_variance,
)


class HMCState(NamedTuple):
    position: jnp.ndarray   # (..., dim)
    log_prob: jnp.ndarray   # (...)
    grad: jnp.ndarray       # (..., dim)


class HMCInfo(NamedTuple):
    accept_prob: jnp.ndarray
    accepted: jnp.ndarray
    energy_change: jnp.ndarray


def hmc_init(logprob_fn, position):
    lp, grad = jax.value_and_grad(logprob_fn)(position)
    return HMCState(position, lp, grad)


def leapfrog(logprob_grad_fn, position, momentum, grad, step_size,
             num_steps, inv_mass_diag):
    """Velocity-Verlet integration of Hamiltonian dynamics.

    Standard kick-drift-kick with the gradient of log pi (so "force" =
    +grad log pi, the JAX-native replacement of the reference's
    LAMMPS `run N` leapfrog at systems.py:94-103). Requires num_steps >= 1
    (the returned log-prob comes from the last step's gradient eval).
    """

    def step(carry, _):
        q, p, lp, g = carry
        p = p + 0.5 * step_size * g
        q = q + step_size * (inv_mass_diag * p)
        lp, g = logprob_grad_fn(q)
        p = p + 0.5 * step_size * g
        return (q, p, lp, g), None

    # lp rides in the carry so the final state needs NO extra gradient eval
    # (an L-step trajectory costs exactly L value_and_grad calls -- at L=4
    # the old recompute-at-the-end version was 25% more FLOPs per draw).
    zero_lp = jnp.zeros_like(jnp.sum(position, axis=-1))
    (q, p, lp, g), _ = jax.lax.scan(
        step, (position, momentum, zero_lp, grad), None, length=num_steps
    )
    return q, p, lp, g


def hmc_kernel(logprob_fn, step_size, num_leapfrog, inv_mass_diag,
               step_jitter=0.2):
    """One HMC transition for a single chain. vmap over chains.

    `step_jitter` draws the step size uniformly from
    [(1-j)*eps, (1+j)*eps] each transition. Without it, fixed-length HMC
    resonates on near-harmonic targets (leapfrog rotation angle ~ pi per
    trajectory makes proposals ~ -x and radial mixing stalls); jitter breaks
    the periodic orbits.
    """
    logprob_grad_fn = jax.value_and_grad(logprob_fn)

    def kernel(key, state):
        k_mom, k_acc, k_eps = jax.random.split(key, 3)
        eps = step_size * (
            1.0 + step_jitter * jax.random.uniform(
                k_eps, (), state.position.dtype, -1.0, 1.0
            )
        )
        # momentum ~ N(0, M) with M = 1/inv_mass (diag)
        sqrt_mass = jnp.sqrt(1.0 / inv_mass_diag)
        momentum = sqrt_mass * jax.random.normal(
            k_mom, state.position.shape, state.position.dtype
        )
        kinetic = lambda p: 0.5 * jnp.sum(inv_mass_diag * p * p)

        q, p, lp_new, g_new = leapfrog(
            logprob_grad_fn, state.position, momentum, state.grad,
            eps, num_leapfrog, inv_mass_diag,
        )
        h_old = -state.log_prob + kinetic(momentum)
        h_new = -lp_new + kinetic(p)
        d_energy = h_old - h_new
        # Overflow-safe Metropolis: accept prob = exp(min(0, dH))
        log_accept = jnp.minimum(0.0, d_energy)
        accept_prob = jnp.exp(log_accept)
        u = jax.random.uniform(k_acc, (), state.position.dtype)
        # Divergent (NaN) proposals count as rejected; folding the finite
        # guard into ONE select mask halves the elementwise select passes
        # over (position, logprob, grad) -- part of the ~90 us/draw of
        # non-gradient glue in PERF.md's draw budget.
        finite = jnp.isfinite(h_new)
        accepted = (jnp.log(u) < log_accept) & finite
        new_state = HMCState(
            position=jnp.where(accepted, q, state.position),
            log_prob=jnp.where(accepted, lp_new, state.log_prob),
            grad=jnp.where(accepted, g_new, state.grad),
        )
        accept_prob = jnp.where(finite, accept_prob, 0.0)
        return new_state, HMCInfo(accept_prob, accepted, d_energy)

    return kernel


def hmc_kernel_batched(logprob_fn, step_size, num_leapfrog, inv_mass_diag,
                       step_jitter=0.2):
    """One HMC transition over a whole chain batch: kernel(keys, state).

    Identical math and PRNG stream to `jax.vmap(hmc_kernel(...))` -- the
    momentum/jitter/accept draws still come from the same per-chain key
    splits -- with the Metropolis accept + state select routed through
    ops/hmc_pallas.py's `accept_select`. By default that is the plain-jnp
    block (XLA fuses it into the leapfrog program; measured faster than the
    Pallas kernel at bench shape, see PERF.md r4 A/B); NFTPU_FUSED_ACCEPT=1
    swaps in the single-pass Pallas kernel.
    """
    logprob_grad_fn = jax.value_and_grad(logprob_fn)

    def propose(key, state):
        k_mom, k_acc, k_eps = jax.random.split(key, 3)
        eps = step_size * (
            1.0 + step_jitter * jax.random.uniform(
                k_eps, (), state.position.dtype, -1.0, 1.0
            )
        )
        sqrt_mass = jnp.sqrt(1.0 / inv_mass_diag)
        momentum = sqrt_mass * jax.random.normal(
            k_mom, state.position.shape, state.position.dtype
        )
        q, p, lp_new, g_new = leapfrog(
            logprob_grad_fn, state.position, momentum, state.grad,
            eps, num_leapfrog, inv_mass_diag,
        )
        h_old = -state.log_prob + 0.5 * jnp.sum(
            inv_mass_diag * momentum * momentum
        )
        log_u = jnp.log(jax.random.uniform(k_acc, (), state.position.dtype))
        return q, p, lp_new, g_new, h_old, log_u

    from ..ops.hmc_pallas import accept_select

    def kernel(keys, state):
        q, p, lp_new, g_new, h_old, log_u = jax.vmap(propose)(keys, state)
        pos, lp, g, accept_prob, accepted, d_energy = accept_select(
            q, p, g_new, state.position, state.grad, lp_new,
            state.log_prob, h_old, log_u, inv_mass_diag,
        )
        return (HMCState(pos, lp, g),
                HMCInfo(accept_prob, accepted, d_energy))

    return kernel


def _batched_lp_grad(logprob_batch_fn):
    """(chains, dim) -> ((chains,), (chains, dim)) value-and-grad.

    Per-chain log-probs decouple under a sum, so grad of the sum gives
    each chain's own gradient in ONE evaluation of the batched target."""

    def f(x):
        lps = logprob_batch_fn(x)
        return jnp.sum(lps), lps

    vg = jax.value_and_grad(f, has_aux=True)

    def lp_grad(x):
        (_, lps), g = vg(x)
        return lps, g

    return lp_grad


def hmc_kernel_chainbatched(logprob_batch_fn, step_size, num_leapfrog,
                            inv_mass_diag, step_jitter=0.2):
    """One HMC transition where the TARGET sees the whole chain batch.

    `logprob_batch_fn` maps (chains, dim) -> (chains,). Randomness is
    drawn per chain exactly as in `hmc_kernel_batched` (same key splits,
    same stream), but leapfrog runs on the full (chains, dim) arrays with
    ONE batched target evaluation per step instead of a per-chain vmap.

    Why this exists (r5): flow-pullback targets evaluated per-chain under
    vmap x scan x grad fault the TPU runtime (the RQS bin-search gathers
    hit the same lowering-fault class as the EAM split-gather crash,
    PERF.md r5), and batch-size-gated accelerators (the Pallas RQS
    kernel) can never engage on a per-element view. Batching the chain
    axis through the target fixes both: spline flows already evaluate
    batches as flat rows.
    """
    lp_grad = _batched_lp_grad(logprob_batch_fn)

    from ..ops.hmc_pallas import accept_select

    def kernel(keys, state):
        def draws(key, q):
            # identical split order / shapes to hmc_kernel_batched's
            # propose, so the two kernels consume the same random stream
            k_mom, k_acc, k_eps = jax.random.split(key, 3)
            eps = step_size * (
                1.0 + step_jitter * jax.random.uniform(
                    k_eps, (), q.dtype, -1.0, 1.0
                )
            )
            sqrt_mass = jnp.sqrt(1.0 / inv_mass_diag)
            mom = sqrt_mass * jax.random.normal(k_mom, q.shape, q.dtype)
            log_u = jnp.log(jax.random.uniform(k_acc, (), q.dtype))
            return eps, mom, log_u

        eps, momentum, log_u = jax.vmap(draws)(keys, state.position)
        q, p, lp_new, g_new = leapfrog(
            lp_grad, state.position, momentum, state.grad,
            eps[:, None], num_leapfrog, inv_mass_diag,
        )
        h_old = -state.log_prob + 0.5 * jnp.sum(
            inv_mass_diag * momentum * momentum, axis=-1
        )
        pos, lp, g, accept_prob, accepted, d_energy = accept_select(
            q, p, g_new, state.position, state.grad, lp_new,
            state.log_prob, h_old, log_u, inv_mass_diag,
        )
        return (HMCState(pos, lp, g),
                HMCInfo(accept_prob, accepted, d_energy))

    return kernel


def padded_length(length, chunk=128):
    """Trip count chunked_scan actually runs: length rounded up to chunk.

    Callers that feed PRNG keys should split `padded_length(L)` keys so the
    tail-padding iterations consume FRESH randomness instead of replaying
    the first `pad` keys (VERDICT r2 item 6: replayed momentum draws leave
    a key correlation in the carried-out final_state).
    """
    if length <= chunk:
        return length
    return -(-length // chunk) * chunk


def chunked_scan(f, init, xs, length, chunk=128):
    """lax.scan with trip counts kept small via nesting.

    XLA's TPU pipeliner fully unrolls some statically-bounded loops (observed
    compile times of minutes at trip counts ~200-1500 vs seconds at <=128),
    so any user-length scan here nests as outer-scan x inner-scan with both
    trip counts <= max(chunk, ceil(L/chunk)). The tail is padded with extra
    iterations (valid extra MCMC transitions) and outputs are sliced back to
    `length` by the caller where needed.

    f: (carry, x) -> (carry, y). xs: pytree with leading dims either
    `length` (tail-padded here by replaying the head -- only safe for
    non-random inputs like schedule flags) or `padded_length(length)`
    (already padded by the caller; REQUIRED for PRNG keys so pad iterations
    draw fresh randomness). Returns (carry, ys) with ys leading dim
    `padded_length(length)`.
    """
    if length <= chunk:
        return jax.lax.scan(f, init, xs, length=length)
    n_outer = -(-length // chunk)
    pad = n_outer * chunk - length

    def pad_leaf(a):
        if a.shape[0] == n_outer * chunk:  # caller pre-padded (fresh keys)
            reps = a
        elif a.shape[0] == length:
            reps = jnp.concatenate([a, a[:pad]], axis=0) if pad else a
        else:
            raise ValueError(
                f"chunked_scan: leaf leading dim {a.shape[0]} is neither "
                f"length={length} nor padded_length={n_outer * chunk}"
            )
        return reps.reshape((n_outer, chunk) + a.shape[1:])

    xs_c = None if xs is None else jax.tree.map(pad_leaf, xs)

    def outer(carry, x_chunk):
        return jax.lax.scan(f, carry, x_chunk, length=chunk)

    carry, ys = jax.lax.scan(outer, init, xs_c, length=n_outer)
    ys = jax.tree.map(
        lambda a: a.reshape((n_outer * chunk,) + a.shape[2:]), ys
    )
    return carry, ys


class HMCResult(NamedTuple):
    samples: jnp.ndarray        # (num_samples, chains, dim)
    log_probs: jnp.ndarray      # (num_samples, chains)
    accept_rate: jnp.ndarray    # scalar, sampling phase
    step_size: jnp.ndarray      # adapted scalar
    inv_mass_diag: jnp.ndarray  # adapted (dim,)
    final_state: HMCState


@partial(
    jax.jit,
    static_argnames=(
        "logprob_fn", "num_samples", "num_warmup", "num_leapfrog",
        "target_accept", "thin", "step_jitter", "batched_target",
    ),
)
def run_hmc(key, logprob_fn, init_position, num_samples, num_warmup=500,
            step_size=0.1, num_leapfrog=10, target_accept=0.8, thin=1,
            inv_mass_diag=None, step_jitter=0.2, batched_target=False):
    """Full HMC run: warmup (adaptation) + sampling, one XLA program.

    init_position: (chains, dim). Returns HMCResult with samples of shape
    (num_samples, chains, dim).

    `batched_target=True` declares that `logprob_fn` maps the whole
    (chains, dim) batch to (chains,) log-probs in one call (see
    hmc_kernel_chainbatched) -- required for flow-pullback targets on
    TPU and for batch-gated accelerated ops to engage inside leapfrog.
    """
    chains, dim = init_position.shape
    dtype = init_position.dtype
    if inv_mass_diag is None:
        inv_mass_diag = jnp.ones(dim, dtype)

    if batched_target:
        lp0, g0 = _batched_lp_grad(logprob_fn)(init_position)
        state = HMCState(init_position, lp0, g0)
    else:
        state = jax.vmap(lambda q: hmc_init(logprob_fn, q))(init_position)

    def make_kernel(eps, inv_mass):
        if batched_target:
            return hmc_kernel_chainbatched(
                logprob_fn, eps, num_leapfrog, inv_mass,
                step_jitter=step_jitter)
        return hmc_kernel_batched(logprob_fn, eps, num_leapfrog, inv_mass,
                                  step_jitter=step_jitter)

    # ------------------------------------------------------------- warmup
    in_window, window_end = warmup_schedule(num_warmup)
    in_window = jnp.asarray(in_window)
    window_end = jnp.asarray(window_end)

    da_state = da_init(jnp.asarray(step_size, dtype))
    wf_state = welford_init(dim, dtype)

    def warmup_step(carry, xs):
        state, da_state, wf_state, inv_mass = carry
        key, in_win, win_end = xs
        keys = jax.random.split(key, chains)
        eps = da_step_size(da_state)
        kernel = make_kernel(eps, inv_mass)
        state, info = kernel(keys, state)
        # cross-chain mean acceptance drives one shared step size
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
            new_inv_mass = welford_variance(wf_state)
            # restart step-size averaging around the current iterate
            new_da = da_init(da_step_size(da_state))
            return new_da, welford_init(dim, dtype), new_inv_mass

        da_state, wf_state, inv_mass = jax.lax.cond(
            win_end,
            refresh,
            lambda args: args,
            (da_state, wf_state, inv_mass),
        )
        return (state, da_state, wf_state, inv_mass), None

    if num_warmup > 0:
        k_warm, key = jax.random.split(key)
        # Fresh keys for the tail-pad iterations; pad flags with False so
        # padded steps are plain transitions (no window bookkeeping).
        n_pad = padded_length(num_warmup)
        warm_keys = jax.random.split(k_warm, n_pad)
        pad_false = jnp.zeros(n_pad - num_warmup, bool)
        (state, da_state, _, inv_mass_diag), _ = chunked_scan(
            warmup_step,
            (state, da_state, wf_state, inv_mass_diag),
            (warm_keys,
             jnp.concatenate([in_window, pad_false]),
             jnp.concatenate([window_end, pad_false])),
            length=num_warmup,
        )
        eps_final = da_step_size(da_state, averaged=True)
    else:
        eps_final = jnp.asarray(step_size, dtype)

    # ----------------------------------------------------------- sampling
    kernel = make_kernel(eps_final, inv_mass_diag)

    def sample_step(carry, key):
        state = carry
        keys = jax.random.split(key, chains)
        state, info = kernel(keys, state)
        return state, None

    def outer(carry, key):
        state, acc = carry
        keys = jax.random.split(key, chains)
        state, info = kernel(keys, state)
        if thin > 1:
            sub_keys = jax.random.split(jax.random.fold_in(key, 1), thin - 1)
            state, _ = jax.lax.scan(sample_step, state, sub_keys)
        return (state, acc + jnp.mean(info.accept_prob)), (
            state.position, state.log_prob,
        )

    # padded_length keys: pad iterations are valid extra transitions with
    # FRESH momentum draws (not replays of the first keys).
    sample_keys = jax.random.split(key, padded_length(num_samples))
    (state, acc_sum), (samples, log_probs) = chunked_scan(
        outer, (state, jnp.zeros((), dtype)), sample_keys,
        length=num_samples,
    )
    n_run = samples.shape[0]  # includes chunk padding (extra transitions)
    samples = samples[:num_samples]
    log_probs = log_probs[:num_samples]
    return HMCResult(
        samples=samples,
        log_probs=log_probs,
        accept_rate=acc_sum / n_run,
        step_size=eps_final,
        inv_mass_diag=inv_mass_diag,
        final_state=state,
    )
