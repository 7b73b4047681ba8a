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
    `load_setfl`, evaluated with differentiable natural cubic splines
    (LAMMPS also spline-interpolates these tables) -- drop-in for the same
    potential files the reference fed to LAMMPS. Wired from
    `dataset.input_dir` in configs; `tools/make_setfl.py` tabulates the
    analytic model into this format for fixtures/validation.

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
#
# TPU lowering of the table lookup (VERDICT r4 item 4): the r4 campaign's
# "kernel fault" TPU-worker crash came from this module's original lookup
# shape -- FOUR separate 1-D gathers per spline (a[k], b[k], c[k], d[k])
# with ~7e5-element int32 index tensors inside long scanned+vmapped+grad'd
# HMC programs. Three interchangeable lowerings are provided so the crash
# class can be A/B'd on hardware (tools/eam_tpu_repro.py):
#   "take"  -- ONE stacked gather per spline: jnp.take on an (n-1, 4)
#              coefficient matrix, mode="clip" (no OOB select logic).
#   "split" -- the legacy 4-gathers-per-spline lowering (kept for repro).
#   "cheb"  -- gather-free: the spline is re-fit at load time as S=64
#              Chebyshev segments (degree 8) and evaluated by a one-hot
#              segment-select matmul + Clenshaw recurrence -- the same
#              dynamic-gather-to-MXU trade proven in ops/rqs_pallas.py.
# Select via NFTPU_EAM_SPLINE_IMPL or the `impl=` arguments. Measured on
# the axon v5e inside the exact crashing HMC structure (runs/eam_repro.json):
# "split" reproduces the r4 worker crash; "take" runs clean (19.5 s); "cheb"
# runs clean and ~1.9x faster (10.5 s) but is a refit (abs energy error
# <= 2e-3 eV on 54-atom frames). Default "take": bit-exact cubic-spline
# table math at ample speed; switch to "cheb" when lookup speed dominates.
import os as _os

SPLINE_IMPL = _os.environ.get("NFTPU_EAM_SPLINE_IMPL", "take")

CHEB_SEGMENTS = 64
CHEB_DEGREE = 8


def _natural_cubic_coeffs(y, h):
    """Natural cubic-spline coefficients on a uniform grid (numpy, one-time).

    Returns an (n-1, 4) stacked matrix [a, b, c, d] so that on segment k
    (x in [k*h, (k+1)*h], t = x - k*h):  f = a + b t + c t^2 + d t^3.
    LAMMPS evaluates setfl tables with cubic splines; linear interpolation
    would give discontinuous forces (bad for HMC acceptance).
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.shape[0]
    # Thomas algorithm for second derivatives M: M[0]=M[n-1]=0,
    # M[i-1] + 4 M[i] + M[i+1] = 6 (y[i+1]-2y[i]+y[i-1]) / h^2.
    rhs = 6.0 * (y[2:] - 2.0 * y[1:-1] + y[:-2]) / (h * h)
    m = np.zeros(n)
    if n > 2:
        cp = np.zeros(n - 2)
        dp = np.zeros(n - 2)
        cp[0] = 1.0 / 4.0
        dp[0] = rhs[0] / 4.0
        for i in range(1, n - 2):
            denom = 4.0 - cp[i - 1]
            cp[i] = 1.0 / denom
            dp[i] = (rhs[i] - dp[i - 1]) / denom
        m[n - 2] = dp[-1]
        for i in range(n - 3, 0, -1):
            m[i] = dp[i - 1] - cp[i - 1] * m[i + 1]
    a = y[:-1]
    b = (y[1:] - y[:-1]) / h - h * (2.0 * m[:-1] + m[1:]) / 6.0
    c = m[:-1] / 2.0
    d = (m[1:] - m[:-1]) / (6.0 * h)
    return jnp.asarray(np.stack([a, b, c, d], axis=1))


def _spline_sample(coeffs, h, x):
    """Host-side (numpy) spline evaluation, used to re-fit segments."""
    tab = np.asarray(coeffs, dtype=np.float64)
    k = np.clip(np.floor(x / h).astype(np.int64), 0, tab.shape[0] - 1)
    t = x - k * h
    a, b, c, d = tab[k].T
    return ((d * t + c) * t + b) * t + a


def _cheb_refit(coeffs, h, nseg=CHEB_SEGMENTS, deg=CHEB_DEGREE):
    """Re-fit a uniform-grid cubic spline as `nseg` Chebyshev segments.

    Returns (cheb_coeffs (nseg, deg+1), seg_width). Each segment spans
    [s*w, (s+1)*w] over the spline's full domain and stores Chebyshev-basis
    coefficients fit at Chebyshev nodes (numpy, one-time at table load).
    """
    n = int(np.asarray(coeffs).shape[0])
    xmax = n * h
    w = xmax / nseg
    nodes = np.cos(np.pi * (np.arange(4 * (deg + 1)) + 0.5)
                   / (4 * (deg + 1)))  # t in (-1, 1), oversampled 4x
    out = np.zeros((nseg, deg + 1))
    for s in range(nseg):
        xs = (s + 0.5) * w + 0.5 * w * nodes
        ys = _spline_sample(coeffs, h, xs)
        out[s] = np.polynomial.chebyshev.chebfit(nodes, ys, deg)
    return jnp.asarray(out), float(w)


def _cheb_eval(cheb, w, x):
    """Gather-free segmented-Chebyshev evaluation (clamped ends).

    Segment coefficients are selected by a one-hot matmul (segment count is
    small, so the one-hot rides the MXU instead of emitting the dynamic
    gathers that faulted the TPU runtime); the polynomial itself is a
    Clenshaw recurrence -- pure FMA, fully fusable.
    """
    coef, nseg = cheb, cheb.shape[0]
    s = jnp.clip(jnp.floor(x / w).astype(jnp.int32), 0, nseg - 1)
    onehot = (s[..., None] == jnp.arange(nseg)).astype(x.dtype)
    c = jax.lax.dot_general(
        onehot.reshape(-1, nseg), coef.astype(x.dtype),
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(x.shape + (coef.shape[1],))
    t = jnp.clip(2.0 * (x / w - s.astype(x.dtype)) - 1.0, -1.0, 1.0)
    # Clenshaw: b_k = c_k + 2 t b_{k+1} - b_{k+2}; f = c_0 + t b_1 - b_2.
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for j in range(coef.shape[1] - 1, 0, -1):
        b1, b2 = c[..., j] + 2.0 * t * b1 - b2, b1
    return c[..., 0] + t * b1 - b2


def _spline_eval(coeffs, h, x, impl=None):
    """Evaluate a uniform-grid cubic spline at x (any shape); clamps ends.

    `coeffs` is the (n-1, 4) stacked matrix from `_natural_cubic_coeffs`,
    or a `(cheb_coeffs, seg_width)` pair when impl == "cheb".
    """
    impl = impl or SPLINE_IMPL
    if impl == "cheb":
        cheb, w = coeffs
        return _cheb_eval(cheb, w, x)
    k = jnp.clip(jnp.floor(x / h).astype(jnp.int32), 0, coeffs.shape[0] - 1)
    t = x - k.astype(x.dtype) * h
    if impl == "take":
        abcd = jnp.take(coeffs, k, axis=0, mode="clip")
        a, b, c, d = (abcd[..., j] for j in range(4))
    elif impl == "split":
        a, b, c, d = (coeffs[:, j][k] for j in range(4))
    else:
        raise ValueError(f"unknown spline impl {impl!r}")
    return ((d * t + c) * t + b) * t + a


def load_setfl(path):
    """Parse a single-element DYNAMO setfl (eam.alloy/eam.fs) file.

    This is the TPU-native stand-in for the potential file the reference
    hands to LAMMPS (applications/src/systems.py:12-43 reads an input
    template that `pair_style eam`-loads the table). Format: 3 comment
    lines; `nelements names`; `nrho drho nr dr cutoff`; per-element header;
    then F(rho) [nrho], rho(r) [nr], r*phi(r) [nr] whitespace-separated.

    Returns a dict of cubic-spline coefficient pytrees (F, rho, r*phi) plus
    grid spacings -- everything `tabulated_eam_energy` needs, all jittable.
    """
    with open(path) as fh:
        lines = fh.read().split("\n")
    vals = lines[4].split()
    nrho, drho, nr, dr, cutoff = (
        int(vals[0]), float(vals[1]), int(vals[2]), float(vals[3]),
        float(vals[4]),
    )
    numbers = []
    for line in lines[6:]:
        numbers.extend(float(tok) for tok in line.split())
    numbers = np.asarray(numbers)
    expected = nrho + 2 * nr
    if numbers.size < expected:
        raise ValueError(
            f"setfl file {path!r} has {numbers.size} values, "
            f"expected {expected} (nrho={nrho}, nr={nr})"
        )
    f_rho = numbers[:nrho]
    rho_r = numbers[nrho : nrho + nr]
    rphi = numbers[nrho + nr : nrho + 2 * nr]
    f_spl = _natural_cubic_coeffs(f_rho, drho)
    rho_spl = _natural_cubic_coeffs(rho_r, dr)
    rphi_spl = _natural_cubic_coeffs(rphi, dr)
    return {
        "f_spl": f_spl, "drho": drho,
        "rho_spl": rho_spl,
        "rphi_spl": rphi_spl, "dr": dr,
        "cutoff": cutoff,
        # Gather-free segmented-Chebyshev refits for impl="cheb".
        "f_cheb": _cheb_refit(f_spl, drho),
        "rho_cheb": _cheb_refit(rho_spl, dr),
        "rphi_cheb": _cheb_refit(rphi_spl, dr),
    }


def tabulated_eam_energy(pos, boxlength, tables, impl=None):
    """Total energy from setfl tables via cubic-spline interpolation.

    Replaces the reference's per-frame LAMMPS `run 0` energy extraction
    (applications/src/systems.py:49-53, 232-244) with a pure jittable
    function: smooth in positions, so jax.grad gives continuous forces.
    `impl` picks the table-lookup lowering (see module docstring above).
    """
    impl = impl or SPLINE_IMPL
    suffix = "_cheb" if impl == "cheb" else "_spl"
    r, eye = _pair_distances(pos, boxlength)
    dr, drho, cutoff = tables["dr"], tables["drho"], tables["cutoff"]
    within = (r < cutoff) & ~eye
    r_safe = jnp.where(within, r, cutoff)
    # setfl stores r*phi (well-behaved at small r); divide by r after interp.
    rphi = _spline_eval(tables["rphi" + suffix], dr, r_safe, impl)
    phi = rphi / jnp.maximum(r_safe, dr)
    psi = _spline_eval(tables["rho" + suffix], dr, r_safe, impl)
    phi = jnp.where(within, phi, 0.0)
    psi = jnp.where(within, psi, 0.0)
    rho = jnp.sum(psi, axis=1)
    embed = _spline_eval(tables["f" + suffix], drho, rho, impl)
    return 0.5 * jnp.sum(phi) + jnp.sum(embed)


class EAMIron(Target):
    """EAM iron target, optionally dataset-backed for sampling.

    Mirrors the hybrid role of the reference's `Fe(LAMMPS, SimData)`
    (systems.py:225-253): `potential` evaluates trajectory energies,
    `sample` draws frames from an attached MD trajectory.
    """

    def __init__(self, nparticles, boxlength=None, kT=1.0, setfl_path=None,
                 fs_params=None, pos_dir=None, data_type="xyz",
                 spline_impl=None):
        self.n_particles = int(nparticles)
        self.point_dim = 3
        self.dim = self.n_particles * 3
        self.boxlength = None if boxlength is None else float(boxlength)
        self.kT = float(kT)
        self.tables = load_setfl(setfl_path) if setfl_path else None
        self.spline_impl = spline_impl  # None -> module default SPLINE_IMPL
        self.fs_params = dict(fs_params or FS_IRON)
        self.dataset = (
            TrajectoryDataset(pos_dir, data_type) if pos_dir else None
        )

    def _energy_single(self, flat, impl=None):
        pos = flat.reshape(self.n_particles, 3)
        if self.tables is not None:
            return tabulated_eam_energy(
                pos, self.boxlength, self.tables,
                impl=impl or self.spline_impl,
            )
        return fs_iron_energy(pos, self.boxlength, self.fs_params)

    def potential(self, x, impl=None):
        x = x.reshape(-1, self.dim)
        return jax.vmap(lambda f: self._energy_single(f, impl))(x)

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
