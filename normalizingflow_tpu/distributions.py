"""Base distributions (flow priors, also usable as analytic targets).

JAX re-designs of the reference priors:
  * DiagNormal      -- the "Normal" prior (applications/src/setup.py:26-31)
  * GaussianMixture -- per-point mixture (applications/src/systems.py:257-292,
                       nf/base.py:40-73); the reference draws each point's
                       component in a Python loop over nsamples*npoints --
                       here one vectorized categorical draw; log_prob uses
                       logsumexp instead of the reference's exp-sum-log
                       (systems.py:288-292), which is the same math without
                       underflow.
  * EinsteinCrystal -- Gaussian noise around a lattice with optional periodic
                       minimum-image wrap (applications/src/systems.py:340-372)

All distributions expose `sample(key, n) -> (n, dim_total)` (flattened, the
reference's `flatten=True` convention) and `log_prob(x) -> (n,)`, as pure
functions of fixed (non-learnable) arrays.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _autograd_force(obj, x):
    """-d potential/dx via autodiff (reference: systems.py:303-311)."""
    return -jax.grad(lambda y: jnp.sum(obj.potential(y)))(x)


def _gaussian_log_prob(dev, var):
    """Sum of independent N(0, var) log-densities over the last axis."""
    d = dev.shape[-1]
    return -0.5 * jnp.sum(dev * dev, axis=-1) / var - 0.5 * d * (
        math.log(2.0 * math.pi) + jnp.log(var)
    )


class DiagNormal:
    """Isotropic normal N(mean, var * I) over `dim` flattened coordinates."""

    def __init__(self, dim, mean=0.0, var=1.0):
        self.dim = int(dim)
        self.mean = jnp.asarray(mean)
        self.var = float(var)

    def sample(self, key, n):
        eps = jax.random.normal(key, (n, self.dim))
        return self.mean + math.sqrt(self.var) * eps

    def log_prob(self, x):
        return _gaussian_log_prob(x - self.mean, self.var)


class GaussianMixture:
    """`npoints` i.i.d. points, each a uniform mixture of isotropic Gaussians.

    centers: (ncenters, point_dim); vars: scalar or (ncenters,). A sample is
    the flattened (npoints * point_dim,) concatenation. Matches the sampling
    and density semantics of applications/src/systems.py:276-292.
    """

    def __init__(self, centers, vars, npoints=None, point_dim=3):
        self.centers = jnp.asarray(centers, dtype=jnp.float32).reshape(-1, point_dim)
        self.ncenters = self.centers.shape[0]
        v = jnp.asarray(vars, dtype=jnp.float32).reshape(-1)
        if v.shape[0] == 1:
            v = jnp.broadcast_to(v, (self.ncenters,))
        self.vars = v
        self.point_dim = int(point_dim)
        self.npoints = int(npoints) if npoints is not None else self.ncenters
        self.dim = self.npoints * self.point_dim

    def sample(self, key, n):
        kc, ke = jax.random.split(key)
        comp = jax.random.randint(kc, (n, self.npoints), 0, self.ncenters)
        eps = jax.random.normal(ke, (n, self.npoints, self.point_dim))
        mu = self.centers[comp]                       # (n, npoints, pd)
        sd = jnp.sqrt(self.vars)[comp][..., None]     # (n, npoints, 1)
        return (mu + sd * eps).reshape(n, -1)

    def log_prob(self, x):
        pts = x.reshape(-1, self.npoints, self.point_dim)
        dev = pts[:, :, None, :] - self.centers[None, None, :, :]
        # (n, npoints, ncenters)
        comp_lp = (
            -0.5 * jnp.sum(dev * dev, axis=-1) / self.vars
            - 0.5 * self.point_dim * (math.log(2 * math.pi) + jnp.log(self.vars))
        )
        point_lp = jax.scipy.special.logsumexp(comp_lp, axis=-1) - math.log(
            self.ncenters
        )
        return jnp.sum(point_lp, axis=-1)

    # Target-protocol aliases (potential = -log_prob, systems.py:294-295).
    def potential(self, x):
        return -self.log_prob(x)

    def force(self, x):
        return _autograd_force(self, x)


class EinsteinCrystal:
    """Gaussian wells of stiffness `alpha` around lattice sites.

    centers: (natoms, dim) lattice; noise variance 1/alpha per coordinate;
    optional periodic minimum-image wrap with box length `boxlength`
    (applications/src/systems.py:353-372).
    """

    def __init__(self, centers, alpha=50.0, boxlength=None, point_dim=3):
        self.centers = jnp.asarray(centers, dtype=jnp.float32).reshape(-1, point_dim)
        self.natoms = self.centers.shape[0]
        self.point_dim = int(point_dim)
        self.alpha = float(alpha)
        self.boxlength = None if boxlength is None else float(boxlength)
        self.dim = self.natoms * self.point_dim

    def _wrap(self, x):
        if self.boxlength is None:
            return x
        L = self.boxlength
        return x - (jnp.abs(x) > 0.5 * L) * jnp.sign(x) * L

    def sample(self, key, n):
        eps = jax.random.normal(key, (n, self.natoms, self.point_dim))
        samples = self.centers + eps / math.sqrt(self.alpha)
        return self._wrap(samples).reshape(n, -1)

    def log_prob(self, x):
        dev = x.reshape(-1, self.natoms, self.point_dim) - self.centers
        dev = self._wrap(dev)
        per_atom = _gaussian_log_prob(dev, 1.0 / self.alpha)
        return jnp.sum(per_atom, axis=-1)

    def potential(self, x):
        return -self.log_prob(x)

    def force(self, x):
        return _autograd_force(self, x)
