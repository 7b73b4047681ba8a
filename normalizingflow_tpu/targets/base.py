"""Target-density protocol.

The reference's duck-typed "potential/distribution" protocol
(SURVEY.md §1 L2; applications/src/systems.py) carried five mutable
"simulation" methods (get/set position/velocity, integration_step) because MD
integration lived inside an external LAMMPS process. In the TPU rebuild the
integrator is jit-compiled JAX code (mcmc/hmc.py), so a target only needs pure
density callables:

  log_prob(x)   : (batch, dim) -> (batch,)   unnormalized log-density
  potential(x)  : -log_prob * kT-scaled energy where physical
  force(x)      : -grad potential, via jax.grad (replaces autograd calls at
                  applications/src/systems.py:303-311)
  sample(key,n) : optional, for data-backed or analytic targets

`PotentialTarget` adapts an energy function U(x) (plus inverse temperature
beta) into this protocol with automatic force evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Target:
    """Base class; subclasses define log_prob and/or potential."""

    dim: int

    def log_prob(self, x):
        return -self.potential(x)

    def potential(self, x):
        return -self.log_prob(x)

    def force(self, x):
        """-dU/dx, batched: x (batch, dim) -> (batch, dim)."""
        pot_sum = lambda y: jnp.sum(self.potential(y))
        return -jax.grad(pot_sum)(x)


class PotentialTarget(Target):
    """Wrap an energy function U(x_single) -> scalar as a Target.

    log_prob(x) = -beta * U(x); `energy_fn` takes a single flattened
    configuration and is vmapped over the batch.
    """

    def __init__(self, energy_fn, dim, beta=1.0):
        self.energy_fn = energy_fn
        self.dim = int(dim)
        self.beta = float(beta)

    def potential(self, x):
        return jax.vmap(self.energy_fn)(x)

    def log_prob(self, x):
        return -self.beta * self.potential(x)
