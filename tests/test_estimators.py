"""Free-energy estimator tests: BAR/MBAR/Zwanzig recover the exact Delta F
between two Gaussians (SURVEY.md §4b)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from normalizingflow_tpu.estimators import (
    bar,
    effective_sample_size,
    mbar,
    zwanzig,
)

# Two 1-D Gaussian "states": p0 = N(0, 1), p1 = N(mu, s^2).
# Reduced potentials u_k(x) = -log p_k(x) + log Z_k ... use unnormalized
# u0 = x^2/2, u1 = (x-mu)^2/(2 s^2); exact Delta f = f1 - f0 = -log(Z1/Z0)
#   Z0 = sqrt(2 pi), Z1 = sqrt(2 pi) s  =>  Delta f = -log(s)
MU, S = 1.5, 0.5
EXACT_DF = -math.log(S)


def _work_values(key, n=20000):
    k0, k1 = jax.random.split(key)
    x0 = jax.random.normal(k0, (n,))                 # samples from state 0
    x1 = MU + S * jax.random.normal(k1, (n,))        # samples from state 1
    u0 = lambda x: 0.5 * x * x
    u1 = lambda x: 0.5 * ((x - MU) / S) ** 2
    w_f = u1(x0) - u0(x0)   # forward work
    w_r = u0(x1) - u1(x1)   # reverse work
    return x0, x1, u0, u1, w_f, w_r


def test_bar_recovers_exact_free_energy():
    *_, w_f, w_r = _work_values(jax.random.PRNGKey(0))
    df = float(bar(w_f, w_r))
    np.testing.assert_allclose(df, EXACT_DF, atol=0.03)


def test_zwanzig_both_directions():
    *_, w_f, w_r = _work_values(jax.random.PRNGKey(1))
    df_fwd = float(zwanzig(w_f))       # from state-0 samples
    df_rev = -float(zwanzig(w_r))      # from state-1 samples
    np.testing.assert_allclose(df_fwd, EXACT_DF, atol=0.1)
    np.testing.assert_allclose(df_rev, EXACT_DF, atol=0.1)


def test_mbar_recovers_exact_free_energy():
    x0, x1, u0, u1, _, _ = _work_values(jax.random.PRNGKey(2))
    x = jnp.concatenate([x0, x1])
    u_kn = jnp.stack([u0(x), u1(x)])
    f = mbar(u_kn, jnp.array([x0.shape[0], x1.shape[0]]))
    np.testing.assert_allclose(float(f[1] - f[0]), EXACT_DF, atol=0.03)


def test_mbar_consistent_with_bar():
    x0, x1, u0, u1, w_f, w_r = _work_values(jax.random.PRNGKey(3))
    x = jnp.concatenate([x0, x1])
    u_kn = jnp.stack([u0(x), u1(x)])
    f = mbar(u_kn, jnp.array([x0.shape[0], x1.shape[0]]))
    df_bar = float(bar(w_f, w_r))
    np.testing.assert_allclose(float(f[1]), df_bar, atol=0.02)


def test_ess_iid_and_correlated():
    key = jax.random.PRNGKey(4)
    n, m = 1000, 4
    iid = jax.random.normal(key, (n, m))
    ess_iid = float(effective_sample_size(iid))
    assert ess_iid > 0.5 * n * m, ess_iid

    # AR(1) with phi = 0.9 -> tau ~ (1+phi)/(1-phi) = 19
    phi = 0.9
    eps = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (n, m)))
    x = np.zeros((n, m))
    for t in range(1, n):
        x[t] = phi * x[t - 1] + eps[t] * math.sqrt(1 - phi * phi)
    ess_corr = float(effective_sample_size(jnp.asarray(x)))
    tau_hat = n * m / ess_corr
    assert 10.0 < tau_hat < 30.0, tau_hat


def test_fe_diff_no_training_recovers_gaussian_gap():
    """Prior-only MBAR path (test.py:74-90): prior N(0,1)^d vs target
    N(0, 0.25)^d has known per-particle Delta f."""
    from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
    from normalizingflow_tpu.apps.fe_eval import fe_diff_no_training

    d = 4
    prior = distributions.DiagNormal(d, var=1.0)

    class T:
        def potential(self, x):
            return 0.5 * jnp.sum(x * x, axis=-1) / 0.25

        def sample(self, key, n):
            return 0.5 * jax.random.normal(key, (n, d))

    flow = NormalizingFlow(prior, bijectors.Chain([]))
    f = fe_diff_no_training(
        flow, None, T(), jax.random.PRNGKey(0), 20000, n_particles=1
    )
    # Delta f = f1 - f0 = -log(Z1/Z0); with u0 = -log N(0,1) (normalized,
    # Z0=1) and u1 = x^2/(2*0.25) (unnormalized, Z1=(2 pi 0.25)^{d/2}):
    import math

    exact = -0.5 * d * math.log(2 * math.pi * 0.25)
    np.testing.assert_allclose(f[1] - f[0], exact, atol=0.05)


def test_bulk_ess_rank_normalization_invariance():
    """Bulk ESS (Vehtari et al. 2021) is invariant to monotone transforms:
    a heavy-tailed functional (exp of AR(1)) must report the SAME mixing as
    the underlying chain, where the raw estimator collapses."""
    from normalizingflow_tpu.estimators.ess import bulk_ess

    n, m = 1000, 4
    phi = 0.9
    eps = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (n, m)))
    x = np.zeros((n, m))
    for t in range(1, n):
        x[t] = phi * x[t - 1] + eps[t] * math.sqrt(1 - phi * phi)
    x = jnp.asarray(x)
    b_x = float(bulk_ess(x))
    b_heavy = float(bulk_ess(jnp.exp(3.0 * x)))  # lognormal, very heavy
    np.testing.assert_allclose(b_heavy, b_x, rtol=1e-6)
    tau = n * m / b_x
    assert 10.0 < tau < 30.0, tau

    iid = jax.random.normal(jax.random.PRNGKey(7), (n, m))
    assert float(bulk_ess(iid)) > 0.5 * n * m


def test_tail_ess_iid_vs_sticky_tails():
    from normalizingflow_tpu.estimators.ess import tail_ess

    n, m = 2000, 4
    iid = jax.random.normal(jax.random.PRNGKey(8), (n, m))
    t_iid = float(tail_ess(iid))
    assert t_iid > 0.3 * n * m, t_iid

    # Strongly correlated chain: tail ESS must drop by ~tau.
    phi = 0.95
    eps = np.asarray(jax.random.normal(jax.random.PRNGKey(9), (n, m)))
    x = np.zeros((n, m))
    for t in range(1, n):
        x[t] = phi * x[t - 1] + eps[t] * math.sqrt(1 - phi * phi)
    t_corr = float(tail_ess(jnp.asarray(x)))
    assert t_corr < 0.25 * t_iid, (t_corr, t_iid)


def test_bulk_ess_per_dim_shapes():
    from normalizingflow_tpu.estimators.ess import bulk_ess, bulk_ess_per_dim

    x = jax.random.normal(jax.random.PRNGKey(10), (200, 8, 5))
    per = bulk_ess_per_dim(x)
    assert per.shape == (5,)
    np.testing.assert_allclose(
        float(per[2]), float(bulk_ess(x[:, :, 2])), rtol=1e-6
    )


def test_bulk_ess_splits_chains():
    """ADVICE r2: Stan's rank-normalized ESS is defined on SPLIT chains.
    Chains that trend within the run (first half low, second half high,
    identically across chains) look well-mixed unsplit -- the pooled rank
    autocovariance decays -- but split-ESS must collapse because the two
    halves become chains with wildly different means."""
    import numpy as np
    from normalizingflow_tpu.estimators.ess import (
        _rank_normalize, _split_chains, bulk_ess, effective_sample_size,
    )

    rng = np.random.default_rng(0)
    n, m = 512, 8
    trend = np.linspace(-3.0, 3.0, n)[:, None]  # shared within-run drift
    x = jnp.asarray(trend + rng.normal(size=(n, m)))
    unsplit = float(effective_sample_size(_rank_normalize(x)))
    split = float(bulk_ess(x))
    assert split < 0.6 * unsplit, (split, unsplit)
    # iid chains: splitting must NOT materially deflate ESS
    iid = jnp.asarray(rng.normal(size=(n, m)))
    assert float(bulk_ess(iid)) > 0.5 * n * m
