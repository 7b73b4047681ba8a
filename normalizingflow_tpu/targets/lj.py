"""Differentiable Lennard-Jones system with minimum-image PBC.

JAX port of the energy math of /root/reference/applications/src/systems.py:
154-189 (which was already expressed in torch tensor ops): pairwise
separations with per-component minimum-image wrap, optional cutoff with energy
shift, 4*eps*((s/r)^12 - (s/r)^6) pair energies, half-summed.

Divergences:
  * `force` comes from `jax.grad` of the (everywhere-differentiable-masked)
    potential instead of the reference's hand-written analytic force, which is
    broken as shipped (`force_mag` undefined, systems.py:220).
  * self-interactions and beyond-cutoff pairs are excluded with `where` masks
    before any divide, so gradients are NaN-free (the reference zeroes
    1/r *after* computing it, which autodiffs to NaN at excluded pairs).

The energy is O(N^2) in particle count; for the reference's system sizes
(N <= 54) a dense pairwise matrix is optimal on TPU (one fused VPU kernel, no
neighbor lists or gather/scatter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Target


def lj_pair_energy_total(pos, boxlength, epsilon=1.0, sigma=1.0, cutoff=None,
                         shift=True):
    """Total LJ energy of one configuration.

    pos: (n_particles, d). Returns scalar energy.
    """
    diff = pos[:, None, :] - pos[None, :, :]
    if boxlength is not None:
        diff = diff - (jnp.abs(diff) > 0.5 * boxlength) * jnp.sign(diff) * boxlength
    r2 = jnp.sum(diff * diff, axis=-1)
    n = pos.shape[0]
    eye = jnp.eye(n, dtype=bool)
    # Mask BEFORE dividing: excluded entries see r2 = 1 (finite), and their
    # energies are zeroed below, keeping grad well-defined.
    valid = ~eye
    if cutoff is not None:
        valid = valid & (r2 <= cutoff * cutoff)
    r2_safe = jnp.where(valid, r2, 1.0)
    inv_r6 = (sigma * sigma / r2_safe) ** 3
    pair = 4.0 * epsilon * (inv_r6 * inv_r6 - inv_r6)
    if cutoff is not None and shift:
        s6 = (sigma / cutoff) ** 6
        pair = pair - 4.0 * epsilon * (s6 * s6 - s6)
    pair = jnp.where(valid, pair, 0.0)
    return 0.5 * jnp.sum(pair)


class LennardJones(Target):
    """LJ solid target (reference config: applications/input/LJ.yaml).

    potential(x): x (batch, n*d) or (batch, n, d) -> (batch,) total energies.
    log_prob = -U/kT.
    """

    def __init__(self, n_particles, boxlength, point_dim=3, epsilon=1.0,
                 sigma=1.0, cutoff=None, shift=True, kT=1.0, pos_dir=None,
                 data_type="xyz"):
        self.n_particles = int(n_particles)
        self.point_dim = int(point_dim)
        self.dim = self.n_particles * self.point_dim
        self.boxlength = None if boxlength is None else float(boxlength)
        self.epsilon = float(epsilon)
        self.sigma = float(sigma)
        self.cutoff = None if cutoff is None else float(cutoff)
        self.shift = bool(shift)
        self.kT = float(kT)
        self.data_type = data_type
        if pos_dir:
            from .dataset import TrajectoryDataset

            self.dataset = TrajectoryDataset(pos_dir, data_type)
        else:
            self.dataset = None

    def _energy_single(self, flat):
        pos = flat.reshape(self.n_particles, self.point_dim)
        return lj_pair_energy_total(
            pos, self.boxlength, self.epsilon, self.sigma, self.cutoff,
            self.shift,
        )

    def potential(self, x):
        x = x.reshape(-1, self.dim)
        return jax.vmap(self._energy_single)(x)

    def log_prob(self, x):
        return -self.potential(x) / self.kT

    # -- dataset attachment (the reference's LJ(SimData) hybrid,
    #    systems.py:144-152): sample() draws from an MD trajectory ----------
    def sample(self, key, nsamples, **kw):
        if self.dataset is None:
            raise ValueError(
                "LennardJones has no attached trajectory data; generate one "
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
