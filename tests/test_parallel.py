"""Mesh-sharded execution tests on the 8-device fake CPU backend
(SURVEY.md §4c): data-parallel training and chains-sharded HMC."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
from normalizingflow_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    run_hmc_sharded,
    shard_batch,
)
from normalizingflow_tpu.train.loop import make_optimizer
from normalizingflow_tpu.train.objectives import forward_kl_loss

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 fake devices"
)


def _flow(dim=8):
    return NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain(
            [bijectors.AffineCoupling(dim, hidden_dim=16) for _ in range(2)]
        ),
    )


def test_sharded_train_matches_single_device():
    dim, batch = 8, 64
    flow = _flow(dim)
    params = flow.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-3, "constant")
    opt_state = optimizer.init(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, dim))

    mesh = make_mesh("data")
    step = make_sharded_train_step(flow, optimizer, mesh)
    p_sh, o_sh, loss_sh, _ = step(params, opt_state, x)

    # single-device reference step
    (loss_ref, _), grads = jax.value_and_grad(
        lambda p: forward_kl_loss(flow, p, x), has_aux=True
    )(params)
    updates, _ = optimizer.update(grads, opt_state, params)
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_batch_placement():
    mesh = make_mesh("chains")
    x = jnp.zeros((16, 4))
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8


def test_hmc_sharded_chains():
    logprob = lambda q: -0.5 * jnp.sum(q * q)
    init = jax.random.normal(jax.random.PRNGKey(2), (64, 4))
    mesh = make_mesh("chains")
    res = run_hmc_sharded(
        mesh, jax.random.PRNGKey(3), logprob, init, num_samples=200,
        num_warmup=200, step_size=0.3, num_leapfrog=5,
    )
    s = np.asarray(res.samples).reshape(-1, 4)
    assert 0.5 < float(res.accept_rate) <= 1.0
    np.testing.assert_allclose(s.var(axis=0), 1.0, atol=0.15)


def test_hmc_sharded_matches_unsharded():
    """Sharding the chain axis must not change HMC semantics: same key ->
    same draws (up to the warmup's cross-chain mean-acceptance psum, whose
    reduction order may differ -> allclose, not exact)."""
    from normalizingflow_tpu.mcmc import run_hmc

    logprob = lambda q: -0.5 * jnp.sum(q * q)
    init = jax.random.normal(jax.random.PRNGKey(2), (32, 4))
    kwargs = dict(num_samples=20, num_warmup=16, step_size=0.3,
                  num_leapfrog=3)

    ref = run_hmc(jax.random.PRNGKey(5), logprob, init, **kwargs)
    mesh = make_mesh("chains")
    sh = run_hmc_sharded(mesh, jax.random.PRNGKey(5), logprob, init, **kwargs)

    np.testing.assert_allclose(
        np.asarray(sh.samples), np.asarray(ref.samples), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        float(sh.accept_rate), float(ref.accept_rate), atol=1e-6
    )
    np.testing.assert_allclose(
        float(sh.step_size), float(ref.step_size), rtol=1e-6
    )


def test_smc_sharded_matches_unsharded():
    """Particle-sharded SMC (resampling gather + ESS-bisection reductions
    cross shards) must reproduce the single-device run."""
    from normalizingflow_tpu.mcmc.smc import run_smc
    from normalizingflow_tpu.parallel import run_smc_sharded

    prop = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
    targ = lambda x: -0.5 * jnp.sum((x - 0.7) ** 2, axis=-1) * 2.0
    particles = jax.random.normal(jax.random.PRNGKey(3), (64, 4))
    kwargs = dict(n_mutation_steps=2, num_leapfrog=3, max_stages=8)

    ref = run_smc(jax.random.PRNGKey(6), particles, prop, targ, **kwargs)
    mesh = make_mesh("chains")
    sh = run_smc_sharded(
        mesh, jax.random.PRNGKey(6), particles, prop, targ, **kwargs
    )

    np.testing.assert_allclose(
        float(sh.log_evidence), float(ref.log_evidence), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sh.particles), np.asarray(ref.particles),
        rtol=1e-5, atol=1e-7,
    )
    assert int(sh.n_stages) == int(ref.n_stages)


def test_graft_dryrun_multichip():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
    mod.dryrun_multichip(8)
