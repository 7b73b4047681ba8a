"""Variational inference tests (BASELINE config 2: planar/radial stacks as
VI posteriors trained by ELBO maximization)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
from normalizingflow_tpu.targets import CorrelatedGaussian
from normalizingflow_tpu.train.objectives import elbo, reverse_kl


def _fit_reverse_kl(flow, target, steps=800, lr=5e-3, nsamples=256, seed=0):
    params = flow.init(jax.random.PRNGKey(seed))
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: reverse_kl(flow, p, target, key, nsamples)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        params, opt_state, loss = step(
            params, opt_state, jax.random.PRNGKey(1000 + i)
        )
        losses.append(float(loss))
    return params, losses


def test_planar_stack_vi():
    """Inverted planar flows (forward-only bijector) as a VI posterior: the
    sampling direction uses planar.forward, so no algebraic inverse is
    needed -- the standard Rezende-Mohamed setup."""
    dim = 2
    target = CorrelatedGaussian(dim, rho=0.7)
    flow = NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain(
            [bijectors.Invert(bijectors.Planar(dim)) for _ in range(8)]
        ),
    )
    params, losses = _fit_reverse_kl(flow, target)
    assert losses[-1] < losses[0] - 0.2
    x, _, _ = flow.sample(params, jax.random.PRNGKey(7), 8000)
    cov = np.cov(np.asarray(x).T)
    np.testing.assert_allclose(cov, np.asarray(target.cov), atol=0.25)


def test_radial_stack_vi():
    dim = 2
    target = distributions.GaussianMixture(
        centers=[[1.0, 1.0]], vars=[0.5], npoints=1, point_dim=2
    )
    flow = NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain([bijectors.Radial(dim) for _ in range(6)]),
    )
    params, losses = _fit_reverse_kl(flow, target, steps=600)
    x, _, _ = flow.sample(params, jax.random.PRNGKey(8), 8000)
    xs = np.asarray(x)
    np.testing.assert_allclose(xs.mean(axis=0), 1.0, atol=0.2)


def test_elbo_is_negative_reverse_kl():
    dim = 2
    target = CorrelatedGaussian(dim)
    flow = NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain([bijectors.ActNorm(dim)]),
    )
    params = flow.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    e = float(elbo(flow, params, target, key, 512))
    r = float(reverse_kl(flow, params, target, key, 512))
    np.testing.assert_allclose(e, -r, rtol=1e-6)


def test_elbo_bounds_log_evidence():
    """For a normalized target, ELBO <= 0 with equality iff q == p."""
    dim = 3
    target = CorrelatedGaussian(dim, rho=0.5)
    flow = NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain([bijectors.ActNorm(dim)]),
    )
    params = flow.init(jax.random.PRNGKey(2))
    e = float(elbo(flow, params, target, jax.random.PRNGKey(3), 20000))
    assert e < 0.05  # <= 0 up to MC error


def test_spline_flow_on_correlated_gaussian():
    """BASELINE config 3: RQS spline flow on a correlated Gaussian with
    exact inverse -- forward-KL training then moment + round-trip checks."""
    import optax

    from normalizingflow_tpu.train.objectives import forward_kl_loss

    dim = 8
    target = CorrelatedGaussian(dim, rho=0.6)
    flow = NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain([
            bijectors.SplineCoupling(size=4, space_dim=2, num_bins=8,
                                     tail_bound=4.0, hidden_dim=32,
                                     mask=(0,)),
            bijectors.SplineCoupling(size=4, space_dim=2, num_bins=8,
                                     tail_bound=4.0, hidden_dim=32,
                                     mask=(1,)),
            bijectors.InvertibleLinear(dim),
        ]),
    )
    params = flow.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, key):
        x = target.sample(key, 256)
        (loss, _), grads = jax.value_and_grad(
            lambda p: forward_kl_loss(flow, p, x), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(500):
        params, opt_state, loss = step(
            params, opt_state, jax.random.PRNGKey(2000 + i)
        )

    # exact inverse: samples round-trip through the trained stack
    x, log_px, z = flow.sample(params, jax.random.PRNGKey(9), 4000)
    z2, _, _ = flow.forward(params, x)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-3)
    # moments within MC error of the target
    cov = np.cov(np.asarray(x).T)
    assert np.abs(np.diag(cov) - 1.0).max() < 0.3
    off = cov[np.triu_indices(dim, 1)]
    tgt = np.asarray(target.cov)[np.triu_indices(dim, 1)]
    assert np.abs(off - tgt).mean() < 0.2
