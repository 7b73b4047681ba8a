"""Lattice phi^4 scalar field theory target.

The BASELINE.json config-5 energy model ("lattice phi^4 / particle-system
energy model for SMC with flow proposals"). No reference counterpart exists
(the reference's polymer fields are dataset-backed, SURVEY.md §2.3); this is
the standard 2-D Euclidean action

    S[phi] = sum_x [ -2 kappa * phi_x * sum_mu phi_{x+mu}
                     + (1 - 2 lambda) phi_x^2 + lambda phi_x^4 ]

with periodic boundary conditions, written as shifted-array sums -- one fused
VPU kernel under jit, trivially vmappable over a batch of field
configurations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Target


def phi4_action(phi, kappa, lam):
    """Action of a single (L, L) field configuration."""
    neighbors = jnp.roll(phi, 1, axis=0) + jnp.roll(phi, 1, axis=1)
    phi2 = phi * phi
    return jnp.sum(
        -2.0 * kappa * phi * neighbors + (1.0 - 2.0 * lam) * phi2
        + lam * phi2 * phi2
    )


class Phi4Lattice(Target):
    """2-D phi^4 lattice; log_prob = -S[phi]. x is (batch, L*L) flattened.

    Like LennardJones/EAMIron, an HMC-generated trajectory can be attached
    (`pos_dir`) so the target doubles as a forward-KL data source for the
    training CLI (the reference's System+SimData hybrid pattern,
    applications/src/systems.py:144-152)."""

    def __init__(self, L=8, kappa=0.3, lam=0.022, pos_dir=None,
                 data_type="npy"):
        self.L = int(L)
        self.dim = self.L * self.L
        self.kappa = float(kappa)
        self.lam = float(lam)
        self.data_type = data_type
        if pos_dir:
            from .dataset import TrajectoryDataset

            self.dataset = TrajectoryDataset(pos_dir, data_type)
        else:
            self.dataset = None

    def sample(self, key, nsamples, **kw):
        if self.dataset is None:
            raise ValueError(
                "Phi4Lattice has no attached trajectory data; generate one "
                "with apps.sample_data or pass pos_dir"
            )
        return self.dataset.sample(key, nsamples, **kw)

    def update_data(self, path=None, **kw):
        from .dataset import TrajectoryDataset

        if self.dataset is None:
            self.dataset = TrajectoryDataset(
                path, self.data_type, data=kw.get("data")
            )
        else:
            self.dataset.update_data(path, **kw)

    def potential(self, x):
        fields = x.reshape(-1, self.L, self.L)
        return jax.vmap(lambda f: phi4_action(f, self.kappa, self.lam))(fields)

    def log_prob(self, x):
        return -self.potential(x)

    def magnetization(self, x):
        """Mean field value per configuration (order parameter)."""
        return jnp.mean(x.reshape(-1, self.dim), axis=-1)
