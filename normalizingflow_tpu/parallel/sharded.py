"""Mesh-sharded training and sampling entry points.

pjit-style design (SURVEY.md §2.5): functions here only *annotate* shardings
-- params replicated, batch/chain axes split over the mesh -- and let XLA
insert the collectives (gradient psum across the data axis, acceptance-rate
pmean across the chains axis, all_gathers for SMC resampling). No explicit
NCCL-style communication code exists anywhere, by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..mcmc.hmc import run_hmc
from ..train.objectives import forward_kl_loss
from .mesh import batch_sharding, replicated, shard_batch


def make_sharded_train_step(flow, optimizer, mesh, axis_name=None):
    """Data-parallel forward-KL train step over `mesh`.

    Batch enters split on axis 0; params/opt state are replicated. XLA derives
    the cross-device gradient all-reduce from the output sharding constraint.
    """
    data_sh = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)

    def step(params, opt_state, x):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: forward_kl_loss(flow, p, x), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    jitted = jax.jit(
        step,
        in_shardings=(rep, rep, data_sh),
        out_shardings=(rep, rep, rep, rep),
    )

    def run(params, opt_state, x):
        return jitted(params, opt_state, shard_batch(mesh, x, axis_name))

    return run


def run_hmc_sharded(mesh, key, logprob_fn, init_position, num_samples,
                    axis_name=None, **hmc_kwargs):
    """`mcmc.hmc.run_hmc` with the chain axis sharded over the mesh.

    The HMC program is elementwise over chains except the warmup's cross-chain
    mean acceptance (hmc.py warmup_step), which XLA lowers to a psum over the
    mesh -- exactly the dual-averaging collective called for in SURVEY.md §5.
    """
    init_position = shard_batch(mesh, init_position, axis_name)
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        return run_hmc(key, logprob_fn, init_position, num_samples,
                       **hmc_kwargs)


def run_smc_sharded(mesh, key, particles, proposal_logprob_fn,
                    target_logprob_fn, axis_name=None, **smc_kwargs):
    """`mcmc.smc.run_smc` with the particle axis sharded over the mesh.

    Per-particle work (incremental weights, HMC mutations) stays local to
    each shard; the temperature-bisection ESS reduction, the normalized-CDF
    cumsum, and the systematic-resampling gather cross particles, so XLA
    inserts the psum / all_gather collectives from the sharding annotations
    alone (SURVEY.md §2.5: "SMC resampling via sharded prefix-sum +
    all_gather of normalized weights").
    """
    from ..mcmc.smc import run_smc

    particles = shard_batch(mesh, particles, axis_name)
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        return run_smc(key, particles, proposal_logprob_fn,
                       target_logprob_fn, **smc_kwargs)
