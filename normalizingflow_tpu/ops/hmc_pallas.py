"""Fused Pallas TPU kernel for the HMC accept/select step.

PERF.md's draw budget: at L=4 leapfrog a draw costs ~412 us, of which ~290 us
is gradient physics and ~90 us is memory-bound glue -- the kinetic-energy
reduction, the Metropolis test, and three separate `where` selects over
(position, log_prob, grad), each of which round-trips the (chains, dim)
state through HBM under plain XLA. This kernel fuses all of it into ONE
VMEM-resident pass per (TILE_N, dim) chain block:

  HBM reads:  q, p, g_new, pos_old, g_old (5 x N*D), lp/h/log_u (4 x N)
  HBM writes: pos, g (2 x N*D), lp/accept_prob/accepted/d_energy (4 x N)

which is the information-theoretic minimum for the op IN ISOLATION. In situ
it lost the A/B (see FUSED_ACCEPT below): XLA cannot fuse producers or
consumers across a pallas_call, so the kernel forces its operands to
materialize in HBM -- more total traffic than letting XLA fuse the three
selects into the leapfrog program. Kept as an opt-in and as the
reference-checked Pallas implementation. The Metropolis math
is bit-identical to the jnp reference `_accept_select_ref` (the formulas of
mcmc/hmc.py's kernel, reference nf/hmc.py:44-60 overflow-safe form):
accept prob = exp(min(0, h_old - h_new)), NaN proposals rejected.

Gradients never flow through an MCMC transition, so no custom_vjp is needed.
`accept_select` auto-dispatches: Pallas on TPU f32, the jnp reference
elsewhere (CPU tests, x64). tests/test_hmc_pallas.py checks the two paths
agree elementwise, including NaN/divergent rows.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 1024
# ~7 (tile, d) f32 blocks (5 in + 2 out) must fit VMEM simultaneously;
# budget half of the ~16 MB so the chain tile shrinks for large dim
# (ADVICE r3: at d=2048 a fixed 1024-row tile would need ~56 MB).
VMEM_BUDGET = 8 * 1024 * 1024

# The Pallas fusion is OPT-IN (NFTPU_FUSED_ACCEPT=1): a measured A/B at the
# bench shape (8192 chains x 64 dim, L=8, r4 -- see PERF.md) put the fused
# path at 0.942 s/1024 draws vs 0.834 s for plain XLA: the pallas_call is a
# fusion BARRIER (its 7 operands must materialize in HBM instead of fusing
# into the leapfrog epilogue), which costs more than the three separate
# selects it saves. Read ONCE at import: reading env at trace time inside
# callers' jits means toggling after a program is cached silently has no
# effect (ADVICE r3).
FUSED_ACCEPT = os.environ.get("NFTPU_FUSED_ACCEPT") == "1"


def _accept_kernel(q_ref, p_ref, gnew_ref, pos_ref, gold_ref, lpnew_ref,
                   lpold_ref, hold_ref, logu_ref, invm_ref,
                   opos_ref, olp_ref, og_ref, aprob_ref, amask_ref, de_ref):
    dtype = q_ref.dtype
    p = p_ref[:]                                   # (T, D)
    inv_m = invm_ref[:]                            # (1, D)
    kin_new = 0.5 * jnp.sum(inv_m * p * p, axis=1, keepdims=True)  # (T, 1)
    lp_new = lpnew_ref[:]                          # (T, 1)
    h_new = -lp_new + kin_new
    d_e = hold_ref[:] - h_new
    log_accept = jnp.minimum(jnp.zeros((), dtype), d_e)
    finite = jnp.isfinite(h_new)
    accepted = (logu_ref[:] < log_accept) & finite  # (T, 1)
    opos_ref[:] = jnp.where(accepted, q_ref[:], pos_ref[:])
    og_ref[:] = jnp.where(accepted, gnew_ref[:], gold_ref[:])
    olp_ref[:] = jnp.where(accepted, lp_new, lpold_ref[:])
    aprob_ref[:] = jnp.where(finite, jnp.exp(log_accept),
                             jnp.zeros((), dtype))
    amask_ref[:] = accepted.astype(dtype)
    de_ref[:] = d_e


def _accept_select_ref(q, p, g_new, pos_old, g_old, lp_new, lp_old, h_old,
                       log_u, inv_mass_diag):
    """Pure-jnp reference: the exact Metropolis block of mcmc/hmc.py."""
    kin_new = 0.5 * jnp.sum(inv_mass_diag * p * p, axis=-1)
    h_new = -lp_new + kin_new
    d_energy = h_old - h_new
    log_accept = jnp.minimum(0.0, d_energy)
    finite = jnp.isfinite(h_new)
    accepted = (log_u < log_accept) & finite
    pos = jnp.where(accepted[:, None], q, pos_old)
    g = jnp.where(accepted[:, None], g_new, g_old)
    lp = jnp.where(accepted, lp_new, lp_old)
    accept_prob = jnp.where(finite, jnp.exp(log_accept), 0.0)
    return pos, lp, g, accept_prob, accepted, d_energy


@functools.partial(jax.jit, static_argnames=("interpret",))
def _accept_select_pallas(q, p, g_new, pos_old, g_old, lp_new, lp_old,
                          h_old, log_u, inv_mass_diag, interpret=False):
    n, d = q.shape
    dtype = q.dtype
    tile = min(TILE_N, n, max(8, VMEM_BUDGET // (7 * 4 * d) // 8 * 8))
    grid = (pl.cdiv(n, tile),)
    vec = lambda a: a.reshape(n, 1)
    nd_spec = pl.BlockSpec((tile, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    n1_spec = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _accept_kernel,
        grid=grid,
        in_specs=[nd_spec, nd_spec, nd_spec, nd_spec, nd_spec,
                  n1_spec, n1_spec, n1_spec, n1_spec, m_spec],
        out_specs=(nd_spec, n1_spec, nd_spec, n1_spec, n1_spec, n1_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), dtype),   # position
            jax.ShapeDtypeStruct((n, 1), dtype),   # log_prob
            jax.ShapeDtypeStruct((n, d), dtype),   # grad
            jax.ShapeDtypeStruct((n, 1), dtype),   # accept_prob
            jax.ShapeDtypeStruct((n, 1), dtype),   # accepted (0/1)
            jax.ShapeDtypeStruct((n, 1), dtype),   # energy change
        ),
        interpret=interpret,
    )(q, p, g_new, pos_old, g_old, vec(lp_new), vec(lp_old), vec(h_old),
      vec(log_u), inv_mass_diag.reshape(1, d).astype(dtype))
    pos, lp, g, aprob, amask, d_e = out
    return (pos, lp.reshape(n), g, aprob.reshape(n),
            amask.reshape(n) > 0.5, d_e.reshape(n))


def accept_select(q, p, g_new, pos_old, g_old, lp_new, lp_old, h_old, log_u,
                  inv_mass_diag, interpret=False):
    """Fused HMC Metropolis accept + state select over a chain batch.

    Returns (position, log_prob, grad, accept_prob, accepted, d_energy).
    Default: the jnp path, which XLA fuses into the surrounding leapfrog
    program (measured faster at bench shape -- see module docstring).
    NFTPU_FUSED_ACCEPT=1 (read at import) or interpret=True (tests)
    dispatches to the Pallas kernel on TPU/f32.
    """
    if ((FUSED_ACCEPT and jax.default_backend() == "tpu") or interpret) \
            and q.dtype == jnp.float32:
        return _accept_select_pallas(
            q, p, g_new, pos_old, g_old, lp_new, lp_old, h_old, log_u,
            inv_mass_diag, interpret=interpret,
        )
    return _accept_select_ref(
        q, p, g_new, pos_old, g_old, lp_new, lp_old, h_old, log_u,
        inv_mass_diag,
    )
