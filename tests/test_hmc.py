"""HMC engine statistical tests (SURVEY.md §4b): chain moments and acceptance
on analytic targets, plus adaptation sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from normalizingflow_tpu.mcmc import run_hmc
from normalizingflow_tpu.estimators import (
    min_ess,
    potential_scale_reduction,
)
from normalizingflow_tpu.targets import IllConditionedGaussian


def test_hmc_standard_normal_moments():
    dim, chains = 4, 64
    logprob = lambda x: -0.5 * jnp.sum(x * x)
    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (chains, dim))
    res = run_hmc(
        jax.random.PRNGKey(1), logprob, init, num_samples=1000,
        num_warmup=300, step_size=0.2, num_leapfrog=8,
    )
    samples = np.asarray(res.samples).reshape(-1, dim)
    assert 0.5 < float(res.accept_rate) <= 1.0
    np.testing.assert_allclose(samples.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(samples.var(axis=0), 1.0, atol=0.12)


def test_hmc_adapts_step_size_and_mass():
    """On an anisotropic Gaussian, warmup should learn per-dim inv mass
    close to the true variances."""
    variances = jnp.array([0.01, 1.0, 25.0])
    logprob = lambda x: -0.5 * jnp.sum(x * x / variances)
    chains = 64
    init = jax.random.normal(jax.random.PRNGKey(2), (chains, 3)) * jnp.sqrt(
        variances
    )
    res = run_hmc(
        jax.random.PRNGKey(3), logprob, init, num_samples=400,
        num_warmup=600, step_size=0.1, num_leapfrog=8,
    )
    inv_mass = np.asarray(res.inv_mass_diag)
    ratio = inv_mass / np.asarray(variances)
    assert np.all(ratio > 0.2) and np.all(ratio < 5.0), ratio
    assert 0.5 < float(res.accept_rate) <= 1.0
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(
        samples.var(axis=0), np.asarray(variances), rtol=0.35
    )


def test_hmc_rhat_and_ess():
    logprob = lambda x: -0.5 * jnp.sum(x * x)
    chains, dim = 16, 2
    init = 3.0 + jax.random.normal(jax.random.PRNGKey(4), (chains, dim))
    res = run_hmc(
        jax.random.PRNGKey(5), logprob, init, num_samples=400,
        num_warmup=300, step_size=0.3, num_leapfrog=8,
    )
    rhat = np.asarray(potential_scale_reduction(res.samples))
    assert np.all(rhat < 1.1), rhat
    ess = float(min_ess(res.samples))
    assert ess > 200.0, ess  # 6400 total draws, well-mixed


def test_hmc_ill_conditioned_with_adaptation():
    target = IllConditionedGaussian(8, condition=1e3)
    chains = 64
    init = target.sample(jax.random.PRNGKey(6), chains)
    res = run_hmc(
        jax.random.PRNGKey(7), target.log_prob, init, num_samples=300,
        num_warmup=800, step_size=0.05, num_leapfrog=16,
    )
    assert float(res.accept_rate) > 0.5
    samples = np.asarray(res.samples).reshape(-1, 8)
    ratio = samples.var(axis=0) / np.asarray(target.variances)
    assert np.all(ratio > 0.4) and np.all(ratio < 2.5), ratio


def test_hmc_rejects_divergent_proposals():
    """Absurdly large step size: chain must not blow up to NaN."""
    logprob = lambda x: -0.5 * jnp.sum(x * x)
    init = jnp.ones((4, 3))
    res = run_hmc(
        jax.random.PRNGKey(8), logprob, init, num_samples=50,
        num_warmup=0, step_size=1e4, num_leapfrog=5,
    )
    assert np.all(np.isfinite(np.asarray(res.samples)))
    assert float(res.accept_rate) < 0.05


def test_chunked_scan_matches_plain_scan():
    from normalizingflow_tpu.mcmc.hmc import chunked_scan

    def f(c, x):
        c = c * 0.9 + x
        return c, c

    xs = jnp.arange(300, dtype=jnp.float32)
    c_ref, ys_ref = jax.lax.scan(f, jnp.zeros(()), xs)
    c_chk, ys_chk = chunked_scan(f, jnp.zeros(()), xs, length=300, chunk=128)
    # carry advances through padded extra steps; outputs match on [0, 300)
    np.testing.assert_allclose(np.asarray(ys_chk[:300]), np.asarray(ys_ref),
                               rtol=1e-6)
    # short case: exact passthrough
    c2, ys2 = chunked_scan(f, jnp.zeros(()), xs[:100], length=100, chunk=128)
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(ys_ref[:100]),
                               rtol=1e-6)


def test_chunked_scan_fresh_pad_keys():
    """VERDICT r2 item 6: the chunked_scan tail pad must consume FRESH PRNG
    keys, not replay xs[:pad]. A run needing padding (L=130 -> 256) and an
    exact padded-length run (L=256) from the same seed must agree on
    samples[:130] AND on the carried-out final state (proving the 126 pad
    transitions used keys 130..255, not a replay of keys 0..125)."""
    from normalizingflow_tpu.mcmc.hmc import padded_length

    assert padded_length(100) == 100
    assert padded_length(130) == 256
    assert padded_length(256) == 256

    logprob = lambda x: -0.5 * jnp.sum(x * x)
    init = jax.random.normal(jax.random.PRNGKey(3), (4, 3))
    kw = dict(num_warmup=0, step_size=0.3, num_leapfrog=3)
    r_pad = run_hmc(jax.random.PRNGKey(7), logprob, init,
                    num_samples=130, **kw)
    r_full = run_hmc(jax.random.PRNGKey(7), logprob, init,
                     num_samples=256, **kw)
    np.testing.assert_array_equal(
        np.asarray(r_pad.samples), np.asarray(r_full.samples[:130])
    )
    np.testing.assert_array_equal(
        np.asarray(r_pad.final_state.position),
        np.asarray(r_full.final_state.position),
    )


def test_chunked_scan_rejects_bad_leading_dim():
    from normalizingflow_tpu.mcmc.hmc import chunked_scan
    import pytest

    f = lambda c, x: (c + x, c)
    xs = jnp.arange(200.0)  # length says 300, padded would be 384
    with pytest.raises(ValueError, match="leading dim"):
        chunked_scan(f, jnp.zeros(()), xs, length=300, chunk=128)


def test_chain_batched_kernel_matches_vmapped():
    """run_hmc(batched_target=True) consumes the SAME random stream and
    produces the same chains as the per-chain vmapped kernel (r5: the
    batched path exists so flow pullbacks evaluate flat chain batches)."""
    variances = jnp.array([0.25, 1.0, 4.0, 9.0])
    lp_single = lambda x: -0.5 * jnp.sum(x * x / variances)
    lp_batch = lambda X: -0.5 * jnp.sum(X * X / variances, axis=-1)
    init = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
    a = run_hmc(jax.random.PRNGKey(1), lp_single, init, num_samples=100,
                num_warmup=150, step_size=0.3, num_leapfrog=6)
    b = run_hmc(jax.random.PRNGKey(1), lp_batch, init, num_samples=100,
                num_warmup=150, step_size=0.3, num_leapfrog=6,
                batched_target=True)
    np.testing.assert_allclose(np.asarray(a.samples), np.asarray(b.samples),
                               atol=1e-8)
    assert abs(float(a.accept_rate) - float(b.accept_rate)) < 1e-12
    assert abs(float(a.step_size) - float(b.step_size)) < 1e-12


def test_chain_batched_spline_pullback_smoke():
    """NeuTra with an NSF_CL pullback through the chain-batched kernel:
    the configuration that faults the TPU runtime under per-chain vmap
    (PERF.md r5) runs through the batched path."""
    from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
    from normalizingflow_tpu.mcmc.neutra import pullback_logprob_batched
    from normalizingflow_tpu.targets import NealsFunnel

    dim = 12
    flow = NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain([
            bijectors.SplineCoupling(4, 3, num_bins=8, tail_bound=6.0,
                                     hidden_dim=16, mask=(a,))
            for a in (0, 1)
        ]),
    )
    params = flow.init(jax.random.PRNGKey(2))
    logprob = pullback_logprob_batched(flow, params, NealsFunnel(dim))
    init = flow.prior.sample(jax.random.PRNGKey(3), 24)
    res = run_hmc(jax.random.PRNGKey(4), logprob, init, num_samples=50,
                  num_warmup=100, step_size=0.3, num_leapfrog=4,
                  batched_target=True)
    assert np.all(np.isfinite(np.asarray(res.samples)))
    assert 0.2 < float(res.accept_rate) <= 1.0
