"""Analytic benchmark targets.

Covers the reference's analytic systems (Gaussian mixture / Einstein crystal /
Normal -- via normalizingflow_tpu.distributions, which already implement the
Target protocol) plus the BASELINE.json benchmark family: ill-conditioned
Gaussians, banana/Rosenbrock, and Neal's funnel for the HMC/NUTS engine.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .base import Target


class IllConditionedGaussian(Target):
    """N(0, diag(sigma^2)) with eigenvalues log-spaced over `condition`.

    The BASELINE "64-d ill-conditioned posterior" HMC benchmark target.
    """

    def __init__(self, dim, condition=1e4, seed=0):
        self.dim = int(dim)
        self.condition = float(condition)
        # log-spaced stddevs from 1/sqrt(c) to sqrt(c)^... use variance span c
        exponents = jnp.linspace(-0.5, 0.5, self.dim)
        sigmas = self.condition ** exponents
        # random but fixed permutation so the axis ordering is not special
        perm = jax.random.permutation(jax.random.PRNGKey(seed), self.dim)
        self.sigmas = sigmas[perm]

    def log_prob(self, x):
        z = x / self.sigmas
        return -0.5 * jnp.sum(z * z, axis=-1) - jnp.sum(jnp.log(self.sigmas)) \
            - 0.5 * self.dim * math.log(2 * math.pi)

    def sample(self, key, n):
        return jax.random.normal(key, (n, self.dim)) * self.sigmas

    @property
    def variances(self):
        return self.sigmas**2


class Banana(Target):
    """Rosenbrock-warped Gaussian in the first two dims, standard normal rest.

    x0 ~ N(0, s0^2); x1 | x0 ~ N(b*(x0^2 - s0^2), 1); x_i ~ N(0,1) for i>=2.
    """

    def __init__(self, dim=2, b=0.1, s0=3.0):
        assert dim >= 2
        self.dim = int(dim)
        self.b = float(b)
        self.s0 = float(s0)

    def log_prob(self, x):
        x0, x1, rest = x[..., 0], x[..., 1], x[..., 2:]
        lp = -0.5 * (x0 / self.s0) ** 2 - math.log(self.s0)
        mu1 = self.b * (x0 * x0 - self.s0 * self.s0)
        lp = lp - 0.5 * (x1 - mu1) ** 2
        lp = lp - 0.5 * jnp.sum(rest * rest, axis=-1)
        return lp - 0.5 * self.dim * math.log(2 * math.pi)

    def sample(self, key, n):
        k0, k1, k2 = jax.random.split(key, 3)
        x0 = jax.random.normal(k0, (n,)) * self.s0
        x1 = self.b * (x0**2 - self.s0**2) + jax.random.normal(k1, (n,))
        rest = jax.random.normal(k2, (n, self.dim - 2))
        return jnp.concatenate([x0[:, None], x1[:, None], rest], axis=1)


class NealsFunnel(Target):
    """v ~ N(0, 3^2); x_i | v ~ N(0, e^v), i = 1..dim-1."""

    def __init__(self, dim=10):
        self.dim = int(dim)

    def log_prob(self, x):
        v, rest = x[..., 0], x[..., 1:]
        lp_v = -0.5 * (v / 3.0) ** 2 - math.log(3.0)
        lp_rest = -0.5 * jnp.sum(rest * rest, axis=-1) * jnp.exp(-v) \
            - 0.5 * (self.dim - 1) * v
        return lp_v + lp_rest - 0.5 * self.dim * math.log(2 * math.pi)

    def sample(self, key, n):
        kv, kx = jax.random.split(key)
        v = 3.0 * jax.random.normal(kv, (n,))
        rest = jax.random.normal(kx, (n, self.dim - 1)) * jnp.exp(v / 2)[:, None]
        return jnp.concatenate([v[:, None], rest], axis=1)


class CorrelatedGaussian(Target):
    """Zero-mean Gaussian with AR(1)-style covariance (rho^|i-j|).

    The BASELINE "32-d correlated Gaussian" spline-flow target.
    """

    def __init__(self, dim=32, rho=0.9):
        self.dim = int(dim)
        self.rho = float(rho)
        idx = jnp.arange(self.dim)
        cov = self.rho ** jnp.abs(idx[:, None] - idx[None, :])
        self.cov = cov
        self.chol = jnp.linalg.cholesky(cov)
        self.prec = jnp.linalg.inv(cov)
        sign, logdet = jnp.linalg.slogdet(cov)
        self._log_norm = 0.5 * (self.dim * math.log(2 * math.pi) + logdet)

    def log_prob(self, x):
        return -0.5 * jnp.einsum("...i,ij,...j->...", x, self.prec, x) \
            - self._log_norm

    def sample(self, key, n):
        eps = jax.random.normal(key, (n, self.dim))
        return eps @ self.chol.T
