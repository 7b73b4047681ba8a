"""XYZ / LAMMPS coordinate file I/O.

Replaces the reference's MDAnalysis reader (nf/utils_1.py:30-33) and its
hand-rolled writers (applications/src/utils.py:57-80) with dependency-free
numpy parsing. A C++ fast path for large trajectories lives in
normalizingflow_tpu/io/_cxyz (built on demand); `read_xyz` uses it when
available and falls back to pure Python.

XYZ format per frame:
    <natoms>
    <comment line>
    <symbol-or-type> x y z     (natoms rows)
"""

from __future__ import annotations

import numpy as np


def _read_xyz_python(path):
    frames = []
    with open(path, "r") as fh:
        while True:
            header = fh.readline()
            if not header.strip():
                break
            natoms = int(header)
            fh.readline()  # comment
            frame = np.empty((natoms, 3), dtype=np.float64)
            for i in range(natoms):
                parts = fh.readline().split()
                frame[i] = [float(parts[1]), float(parts[2]), float(parts[3])]
            frames.append(frame)
    return np.stack(frames) if frames else np.empty((0, 0, 3))


def read_xyz(path, native=True):
    """Read an XYZ trajectory -> (n_frames, n_atoms, 3) float64 array.

    Uses the C++ parser (io/cxyz.cpp, built on demand) when available;
    falls back to pure Python.
    """
    if native:
        try:
            from ._build import read_xyz_native

            return read_xyz_native(path)
        except Exception:
            pass
    return _read_xyz_python(path)


def write_xyz(path, traj, n_particles, append=False):
    """Write frames in the reference's format (atom type column of 1s,
    5-decimal coordinates; applications/src/utils.py:67-80)."""
    traj = np.asarray(traj).reshape(-1, n_particles, 3)
    mode = "a" if append else "w"
    with open(path, mode) as fh:
        for frame in traj:
            fh.write(f"{n_particles}\n Atoms\n")
            for row in frame:
                fh.write(f"1 {row[0]:.5f} {row[1]:.5f} {row[2]:.5f}\n")


def write_lammps_coord(path, traj, n_particles, append=True):
    """LAMMPS-style "id type x y z" rows (nf/utils_1.py:57-64)."""
    traj = np.asarray(traj).reshape(-1, n_particles, 3)
    mode = "a" if append else "w"
    with open(path, mode) as fh:
        for frame in traj:
            for i, row in enumerate(frame):
                fh.write(f"{i + 1} 1 {row[0]:.5f} {row[1]:.5f} {row[2]:.5f}\n")
