"""I/O tests: xyz round-trips, C++ parser vs Python parser equality + speed."""

import time

import numpy as np
import pytest

from normalizingflow_tpu.io.xyz import (
    _read_xyz_python,
    read_xyz,
    write_lammps_coord,
    write_xyz,
)


def _write_traj(path, n_frames=5, n_atoms=7, seed=0):
    rng = np.random.default_rng(seed)
    traj = rng.normal(size=(n_frames, n_atoms, 3))
    write_xyz(path, traj, n_atoms)
    return traj


def test_xyz_roundtrip(tmp_path):
    path = str(tmp_path / "t.xyz")
    traj = _write_traj(path)
    back = _read_xyz_python(path)
    np.testing.assert_allclose(back, traj, atol=1e-5)  # 5-decimal format


def test_native_parser_matches_python(tmp_path):
    path = str(tmp_path / "t.xyz")
    traj = _write_traj(path, n_frames=50, n_atoms=54)
    try:
        from normalizingflow_tpu.io._build import read_xyz_native
    except Exception as e:  # pragma: no cover - g++ missing
        pytest.skip(f"native build unavailable: {e}")
    native = read_xyz_native(path)
    python = _read_xyz_python(path)
    assert native.shape == (50, 54, 3)
    np.testing.assert_array_equal(native, python)
    np.testing.assert_allclose(native, traj, atol=1e-5)


def test_native_parser_speed(tmp_path):
    path = str(tmp_path / "big.xyz")
    _write_traj(path, n_frames=400, n_atoms=54, seed=1)
    from normalizingflow_tpu.io._build import read_xyz_native

    read_xyz_native(path)  # warm (build + page cache)
    t0 = time.time()
    read_xyz_native(path)
    t_native = time.time() - t0
    t0 = time.time()
    _read_xyz_python(path)
    t_python = time.time() - t0
    assert t_native < t_python, (t_native, t_python)


def test_read_xyz_dispatches(tmp_path):
    path = str(tmp_path / "d.xyz")
    traj = _write_traj(path, n_frames=3, n_atoms=4, seed=2)
    np.testing.assert_allclose(read_xyz(path), traj, atol=1e-5)


def test_malformed_file_raises_native(tmp_path):
    path = str(tmp_path / "bad.xyz")
    with open(path, "w") as fh:
        fh.write("4\n comment\n1 0.0 0.0\n")  # truncated row
    try:
        from normalizingflow_tpu.io._build import read_xyz_native
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build unavailable: {e}")
    with pytest.raises(IOError):
        read_xyz_native(path)


def test_lammps_writer(tmp_path):
    path = str(tmp_path / "l.txt")
    traj = np.zeros((1, 2, 3))
    write_lammps_coord(path, traj, 2, append=False)
    lines = open(path).read().strip().split("\n")
    assert lines[0].startswith("1 1 ") and lines[1].startswith("2 1 ")


def test_sample_data_wraps_periodic_positions(tmp_path):
    """apps.sample_data must write minimum-image-wrapped frames for periodic
    targets: HMC positions random-walk out of the box (energies are
    min-image invariant), but the flow's spline domain is [-L/2, L/2] and
    the reference's LAMMPS data is always wrapped."""
    import jax
    import numpy as np

    from normalizingflow_tpu.apps.sample_data import generate
    from normalizingflow_tpu.config import load_config

    cfg_path = tmp_path / "lj_tiny.yaml"
    cfg_path.write_text("""
device: cpu
dataset:
  name: lj_tiny
  potential: LJ
  nparticles: 4
  kT: 4.0
  rho: 0.8
  cutoff: 1.6
flow: {type: RealNVP, nlayers: 1}
prior:
  type: EinsteinCrystal
  centers: [[-0.4, -0.4, -0.4], [0.4, 0.4, -0.4], [0.4, -0.4, 0.4], [-0.4, 0.4, 0.4]]
  alpha: 50
""")
    cfg = load_config(str(cfg_path))
    frames, acc = generate(cfg, nframes=64, chains=32, thin=1, seed=0)
    b = (4.0 / (8.0 * 0.8)) ** (1.0 / 3.0)
    assert frames.shape[1] == 12
    assert np.all(np.abs(frames) <= b + 1e-6), (
        np.abs(frames).max(), b)
    # hot + loose box: without wrapping, random-walk drift past the box is
    # essentially certain, so this bound failing was the round-2 behavior
