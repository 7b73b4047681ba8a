"""Trajectory-dataset targets (the reference's `SimData`).

Re-design of /root/reference/applications/src/systems.py:107-142: load a
trajectory from .xyz / .npy / .pt into a device array, sample random
minibatches, append/replace data. Differences:

  * sampling takes an explicit PRNG key (pure function) instead of global
    torch RNG state;
  * .xyz parsing is plain text parsing (normalizingflow_tpu.io.xyz) -- no
    MDAnalysis dependency;
  * .pt files are read with torch (CPU) only if torch is importable, else a
    clear error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def load_trajectory(path, data_type="xyz"):
    """Load a trajectory file -> np.ndarray (n_frames, flat_dim)."""
    if data_type == "xyz":
        from ..io.xyz import read_xyz

        traj = read_xyz(path)  # (frames, atoms, 3)
        return traj.reshape(len(traj), -1)
    if data_type == "npy":
        arr = np.load(path)
        return arr.reshape(len(arr), -1)
    if data_type == "pt":
        import torch

        arr = torch.load(path, map_location="cpu")
        arr = arr.detach().cpu().numpy() if hasattr(arr, "detach") else np.asarray(arr)
        return arr.reshape(len(arr), -1)
    raise ValueError(f"unknown data_type {data_type!r}")


class TrajectoryDataset:
    """Dataset-backed sampler with the reference's SimData interface."""

    def __init__(self, path=None, data_type="xyz", data=None):
        self.data_type = data_type
        if data is not None:
            self.traj = jnp.asarray(data).reshape(len(data), -1)
        elif path is not None:
            self.traj = jnp.asarray(load_trajectory(path, data_type))
        else:
            self.traj = None
        self.dim = None if self.traj is None else self.traj.shape[1]

    def sample(self, key, nsamples, random=True):
        """Random-with-replacement (or head) subsample, (nsamples, dim).

        Matches utils.subsample semantics (applications/src/utils.py:101-107).
        """
        if random:
            idx = jax.random.randint(key, (nsamples,), 0, self.traj.shape[0])
            return jnp.take(self.traj, idx, axis=0)
        return self.traj[:nsamples]

    def update_data(self, path=None, data=None, append=False):
        """Replace or append trajectory data (systems.py:127-132)."""
        new = (
            jnp.asarray(data).reshape(len(data), -1)
            if data is not None
            else jnp.asarray(load_trajectory(path, self.data_type))
        )
        if append and self.traj is not None:
            self.traj = jnp.concatenate([self.traj, new], axis=0)
        else:
            self.traj = new
        self.dim = self.traj.shape[1]

    def __len__(self):
        return 0 if self.traj is None else int(self.traj.shape[0])
