"""Tabulated-EAM (setfl) path: parse -> spline -> energy/grad, vs analytic.

The reference's Fe physics comes from an EAM potential file fed to LAMMPS
(applications/src/systems.py:225-253 via dataset.input_dir). Here the same
table format drives a differentiable cubic-spline evaluation; the fixture
`data/fe_fs.setfl` tabulates the built-in Finnis-Sinclair model, so the
tabulated and analytic paths must agree to interpolation error.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normalizingflow_tpu.targets.eam import (
    EAMIron,
    FS_IRON,
    fs_iron_energy,
    load_setfl,
    tabulated_eam_energy,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SETFL = os.path.join(REPO, "data", "fe_fs.setfl")
REF_XYZ = os.path.join(REPO, "data", "fe_bcc_ref.xyz")


def _bcc_frames(key, n_frames=4, noise=0.08):
    """Thermal-ish frames around the shipped 54-atom bcc reference lattice."""
    from normalizingflow_tpu.io.xyz import read_xyz

    lattice = jnp.asarray(read_xyz(REF_XYZ)).reshape(-1, 3)
    eps = noise * jax.random.normal(key, (n_frames,) + lattice.shape)
    return lattice[None] + eps


def test_load_setfl_shapes():
    tables = load_setfl(SETFL)
    assert tables["cutoff"] == pytest.approx(max(FS_IRON["c"], FS_IRON["d"]))
    for name in ("f_spl", "rho_spl", "rphi_spl"):
        assert tables[name].shape == (1999, 4)
    for name in ("f_cheb", "rho_cheb", "rphi_cheb"):
        coef, w = tables[name]
        assert coef.shape[1] >= 4 and w > 0


def test_spline_impls_agree():
    """All three TPU lowerings of the table lookup (take/split/cheb) give
    the same energies and forces to their respective numerical error."""
    tables = load_setfl(SETFL)
    boxlength = 3 * 2.9115
    frames = _bcc_frames(jax.random.PRNGKey(3), n_frames=3)

    def e(pos, impl):
        return tabulated_eam_energy(pos, boxlength, tables, impl=impl)

    for pos in frames:
        e_take = float(e(pos, "take"))
        e_split = float(e(pos, "split"))
        e_cheb = float(e(pos, "cheb"))
        # take/split are the same math via different gathers: exact match.
        assert e_take == pytest.approx(e_split, abs=1e-9), (e_take, e_split)
        # cheb is a refit of the same spline: interpolation-error match.
        assert e_cheb == pytest.approx(e_take, abs=2e-3), (e_cheb, e_take)

    pos = frames[0]
    g_take = jax.grad(lambda p: e(p, "take"))(pos)
    g_cheb = jax.grad(lambda p: e(p, "cheb"))(pos)
    scale = float(jnp.max(jnp.abs(g_take)))
    assert float(jnp.max(jnp.abs(g_take - g_cheb))) < 5e-3 * max(scale, 1.0)


def test_tabulated_matches_analytic_energy():
    tables = load_setfl(SETFL)
    boxlength = 3 * 2.9115
    frames = _bcc_frames(jax.random.PRNGKey(0), n_frames=6)
    for pos in frames:
        e_tab = float(tabulated_eam_energy(pos, boxlength, tables))
        e_fs = float(fs_iron_energy(pos, boxlength))
        # 54-atom energies are O(-200 eV); cubic interp on a 2000-pt grid
        # should be far below thermal noise.
        assert e_tab == pytest.approx(e_fs, abs=5e-4), (e_tab, e_fs)


def test_tabulated_forces_match_analytic():
    tables = load_setfl(SETFL)
    boxlength = 3 * 2.9115
    pos = _bcc_frames(jax.random.PRNGKey(1), n_frames=1)[0]
    f_tab = jax.grad(lambda p: tabulated_eam_energy(p, boxlength, tables))(pos)
    f_fs = jax.grad(lambda p: fs_iron_energy(p, boxlength))(pos)
    assert np.all(np.isfinite(np.asarray(f_tab)))
    err = float(jnp.max(jnp.abs(f_tab - f_fs)))
    scale = float(jnp.max(jnp.abs(f_fs)))
    assert err < 2e-3 * max(scale, 1.0), (err, scale)


def test_eamiron_setfl_path_jits_and_vmaps():
    fe = EAMIron(54, boxlength=3 * 2.9115, kT=0.0345, setfl_path=SETFL)
    frames = _bcc_frames(jax.random.PRNGKey(2), n_frames=3).reshape(3, -1)
    lp = jax.jit(fe.log_prob)(frames)
    assert lp.shape == (3,)
    assert np.all(np.isfinite(np.asarray(lp)))
    fe_analytic = EAMIron(54, boxlength=3 * 2.9115, kT=0.0345)
    lp_a = fe_analytic.log_prob(frames)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(lp_a), rtol=0, atol=0.05
    )


def test_config_wires_input_dir_to_setfl(tmp_path):
    """dataset.input_dir -> EAMIron(setfl_path=...) (reference
    applications/input/Fe_400K.yaml:9); missing files fail loudly."""
    from normalizingflow_tpu.config import DatasetConfig, build_potential

    ds = DatasetConfig(
        potential="Fe", nparticles=54, kT=0.0345, input_dir=SETFL
    )
    fe = build_potential("Fe", ds, ds, boxlength=3 * 2.9115)
    assert fe.tables is not None

    ds_missing = DatasetConfig(
        potential="Fe", nparticles=54, input_dir=str(tmp_path / "nope.setfl")
    )
    with pytest.raises(FileNotFoundError):
        build_potential("Fe", ds_missing, ds_missing, boxlength=8.7)

    ds_none = DatasetConfig(potential="Fe", nparticles=54)
    fe2 = build_potential("Fe", ds_none, ds_none, boxlength=8.7)
    assert fe2.tables is None


def test_setfl_truncated_file_raises(tmp_path):
    import tools.make_setfl as mk

    path = str(tmp_path / "tiny.setfl")
    mk.write_setfl(path, nr=50, nrho=50, rho_max=40.0)
    with open(path) as fh:
        lines = fh.read().split("\n")
    with open(path, "w") as fh:
        fh.write("\n".join(lines[:20]))
    with pytest.raises(ValueError, match="expected"):
        load_setfl(path)


def test_spline_matches_known_cubic():
    """Natural cubic spline reproduces an exact cubic's values on-grid and a
    smooth function off-grid."""
    from normalizingflow_tpu.targets.eam import (
        _natural_cubic_coeffs,
        _spline_eval,
    )

    h = 0.01
    x = np.arange(400) * h
    y = np.sin(x)
    coeffs = _natural_cubic_coeffs(y, h)
    xq = jnp.linspace(0.005, 3.98, 777)
    out = _spline_eval(coeffs, h, xq)
    # natural-spline boundary error (sin'' != 0 at x=4) dominates: O(1e-6)
    np.testing.assert_allclose(np.asarray(out), np.sin(np.asarray(xq)),
                               atol=2e-6)


@pytest.mark.skipif(
    os.environ.get("NFTPU_TPU_TESTS") != "1",
    reason="on-hardware test; set NFTPU_TPU_TESTS=1 (needs the axon TPU)",
)
def test_tabulated_eam_inside_hmc_on_tpu():
    """VERDICT r4 item 4: exercise tabulated_eam_energy inside a long
    jitted HMC program ON THE TPU, the exact structure that crashed the
    r4 worker. Runs tools/eam_tpu_repro.py's child in a subprocess (the
    suite itself pins JAX to CPU; the child inherits the default axon
    platform) with the production default lowering."""
    import subprocess
    import sys as _sys

    p = subprocess.run(
        [_sys.executable, os.path.join(REPO, "tools", "eam_tpu_repro.py"),
         "--child", "take"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=1800,
    )
    assert p.returncode == 0, p.stdout[-2000:]
    assert '"ok": true' in p.stdout
