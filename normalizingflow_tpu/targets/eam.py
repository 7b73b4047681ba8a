"""Differentiable EAM iron potential (the LAMMPS replacement for `Fe`).

The reference computes Fe energies/forces by driving an external C++ LAMMPS
process frame-by-frame over ctypes (applications/src/systems.py:225-253,
SURVEY.md §2.4). Here the embedded-atom energy is a pure JAX function --
vectorized over all pairs, differentiable (forces via jax.grad), jittable,
vmappable over a batch of frames, and fused into HMC leapfrog or free-energy
pipelines with zero host round-trips.

Two parameterizations:

  * Finnis-Sinclair (1984) analytic iron model (default): pair term
    V(r) = (r-c)^2 (c0 + c1 r + c2 r^2) for r < c; density
    psi(r) = (r-d)^2 + beta (r-d)^3 / d for r < d; embedding F(rho) =
    -A sqrt(rho). Smooth, short-ranged, no tables needed.
  * tabulated DYNAMO/LAMMPS "setfl" (eam.fs / eam.alloy) files via
    `load_setfl`, evaluated with differentiable linear interpolation --
    drop-in for the same potential files the reference fed to LAMMPS.

Energies are O(N^2) dense pair evaluations with minimum-image PBC -- optimal
on TPU for the reference's N = 54 (3x3x3 bcc) cells.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import Target
from .dataset import TrajectoryDataset

# Finnis & Sinclair (1984) alpha-iron parameters (eV, Angstrom).
FS_IRON = {
    "A": 1.828905,
    "d": 3.569745,
    "beta": 1.8,
    "c": 3.40,
    "c0": 1.2371147,
    "c1": -0.3592185,
    "c2": -0.0385607,
}


def _pair_distances(pos, boxlength):
    """(n, 3) -> (n, n) minimum-image distances with masked diagonal."""
    diff = pos[:, None, :] - pos[None, :, :]
    if boxlength is not None:
        diff = diff - jnp.round(diff / boxlength) * boxlength
    r2 = jnp.sum(diff * diff, axis=-1)
    n = pos.shape[0]
    eye = jnp.eye(n, dtype=bool)
    r2 = jnp.where(eye, 1.0, r2)  # keep sqrt/grad finite on the diagonal
    return jnp.sqrt(r2), eye


def fs_iron_energy(pos, boxlength, params=FS_IRON):
    """Total Finnis-Sinclair energy of one (n, 3) configuration."""
    r, eye = _pair_distances(pos, boxlength)
    A, d, beta, c = params["A"], params["d"], params["beta"], params["c"]
    c0, c1, c2 = params["c0"], params["c1"], params["c2"]

    dr_c = c - r
    pair = jnp.where(
        (r < c) & ~eye,
        dr_c * dr_c * (c0 + c1 * r + c2 * r * r),
        0.0,
    )
    dr_d = r - d
    psi = jnp.where(
        (r < d) & ~eye,
        dr_d * dr_d + beta * dr_d * dr_d * dr_d / d,
        0.0,
    )
    rho = jnp.sum(psi, axis=1)
    embed = -A * jnp.sqrt(jnp.maximum(rho, 1e-12))
    return 0.5 * jnp.sum(pair) + jnp.sum(embed)


# ------------------------------------------------------------- setfl tables
def load_setfl(path):
    """Parse a single-element DYNAMO setfl (eam.alloy/eam.fs) file.

    Returns dict of grids: F(rho) on [0, nrho*drho), rho(r) and phi(r) =
    (r*phi)/r on [0, nr*dr), plus the cutoff.
    """
    with open(path) as fh:
        lines = fh.read().split("\n")
    # 3 comment lines, then: nelements names / nrho drho nr dr cutoff
    vals = lines[4].split()
    nrho, drho, nr, dr, cutoff = (
        int(vals[0]), float(vals[1]), int(vals[2]), float(vals[3]),
        float(vals[4]),
    )
    numbers = []
    for line in lines[6:]:
        numbers.extend(float(tok) for tok in line.split())
    numbers = np.asarray(numbers)
    f_rho = numbers[:nrho]
    rho_r = numbers[nrho : nrho + nr]
    rphi = numbers[nrho + nr : nrho + 2 * nr]
    r_grid = np.arange(nr) * dr
    phi_r = np.where(r_grid > 0, rphi / np.maximum(r_grid, dr), rphi / dr)
    return {
        "f_rho": jnp.asarray(f_rho), "drho": drho,
        "rho_r": jnp.asarray(rho_r), "phi_r": jnp.asarray(phi_r), "dr": dr,
        "cutoff": cutoff,
    }


def tabulated_eam_energy(pos, boxlength, tables):
    """Total energy from setfl tables via linear interpolation."""
    r, eye = _pair_distances(pos, boxlength)
    dr, drho, cutoff = tables["dr"], tables["drho"], tables["cutoff"]
    nr = tables["rho_r"].shape[0]
    r_grid = jnp.arange(nr) * dr
    within = (r < cutoff) & ~eye
    r_safe = jnp.where(within, r, cutoff)
    phi = jnp.interp(r_safe, r_grid, tables["phi_r"])
    psi = jnp.interp(r_safe, r_grid, tables["rho_r"])
    phi = jnp.where(within, phi, 0.0)
    psi = jnp.where(within, psi, 0.0)
    rho = jnp.sum(psi, axis=1)
    nrho = tables["f_rho"].shape[0]
    rho_grid = jnp.arange(nrho) * drho
    embed = jnp.interp(rho, rho_grid, tables["f_rho"])
    return 0.5 * jnp.sum(phi) + jnp.sum(embed)


class EAMIron(Target):
    """EAM iron target, optionally dataset-backed for sampling.

    Mirrors the hybrid role of the reference's `Fe(LAMMPS, SimData)`
    (systems.py:225-253): `potential` evaluates trajectory energies,
    `sample` draws frames from an attached MD trajectory.
    """

    def __init__(self, nparticles, boxlength=None, kT=1.0, setfl_path=None,
                 fs_params=None, pos_dir=None, data_type="xyz"):
        self.n_particles = int(nparticles)
        self.point_dim = 3
        self.dim = self.n_particles * 3
        self.boxlength = None if boxlength is None else float(boxlength)
        self.kT = float(kT)
        self.tables = load_setfl(setfl_path) if setfl_path else None
        self.fs_params = dict(fs_params or FS_IRON)
        self.dataset = (
            TrajectoryDataset(pos_dir, data_type) if pos_dir else None
        )

    def _energy_single(self, flat):
        pos = flat.reshape(self.n_particles, 3)
        if self.tables is not None:
            return tabulated_eam_energy(pos, self.boxlength, self.tables)
        return fs_iron_energy(pos, self.boxlength, self.fs_params)

    def potential(self, x):
        x = x.reshape(-1, self.dim)
        return jax.vmap(self._energy_single)(x)

    def log_prob(self, x):
        return -self.potential(x) / self.kT

    def sample(self, key, nsamples, **kw):
        if self.dataset is None:
            raise ValueError("EAMIron has no attached trajectory data")
        return self.dataset.sample(key, nsamples, **kw)

    def update_data(self, path=None, **kw):
        if self.dataset is None:
            self.dataset = TrajectoryDataset(path, data=kw.get("data"))
        else:
            self.dataset.update_data(path, **kw)
