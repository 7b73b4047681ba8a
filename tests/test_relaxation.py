"""Flow-seeded relaxation / hybrid data collection / diagnostics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
from normalizingflow_tpu.mcmc.relaxation import (
    collect_hmc_data,
    integrate_out_v,
    metropolize,
    relaxation_step,
)
from normalizingflow_tpu.train.diagnostics import (
    force_matching,
    held_out_logprob_gap,
)


def _flow_and_target(dim=4):
    target = distributions.GaussianMixture(
        centers=[[0.0] * dim], vars=[1.0], npoints=1, point_dim=dim
    )
    flow = NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain([bijectors.ActNorm(dim)]),
    )
    params = flow.init(jax.random.PRNGKey(0))
    return flow, params, target


def test_collect_hmc_data_shapes_and_acceptance():
    flow, params, target = _flow_and_target()
    data, acc = collect_hmc_data(
        jax.random.PRNGKey(1), flow, params, target, n_chains=4,
        n_steps=200, burnin=50, step_size=0.3, num_leapfrog=5,
    )
    assert data.shape == (150 * 4, 4)
    assert 0.3 < float(acc) <= 1.0
    # relaxed data should look like the target (std ~ 1)
    assert 0.7 < float(jnp.std(data)) < 1.3


def test_relaxation_step_lowers_energy():
    flow, params, target = _flow_and_target()
    # start frames far from the mode: relaxation must reduce energy
    traj = 3.0 + jax.random.normal(jax.random.PRNGKey(2), (8, 4))
    # cold momenta (soft_factor << 1): near-pure gradient descent relaxes.
    # (The reference's init_beta=beta/1000 draws HOT momenta -- dynamics.py:15
    # -- which heats a frame this far from the mode.)
    res = relaxation_step(
        jax.random.PRNGKey(3), flow, params, target, traj, kT=1.0,
        path_len=20, step_size=0.05, soft_factor=0.01,
    )
    # q_energy = -U/kT: higher is lower energy
    assert float(jnp.mean(res.q_energy)) > float(
        jnp.mean(res.q_energy_before)
    )
    assert res.positions.shape == traj.shape
    assert np.all(np.isfinite(np.asarray(res.q_learned)))


def test_integrate_out_v_close_to_direct_logp_for_identity_dynamics():
    flow, params, target = _flow_and_target()
    frames = jax.random.normal(jax.random.PRNGKey(4), (6, 4))
    # tiny step size ~ no movement: marginalized logp ~ direct logp
    lp_marg = integrate_out_v(
        jax.random.PRNGKey(5), flow, params, target, frames, npoints=8,
        path_len=2, step_size=1e-4,
    )
    lp_direct = flow.log_prob(params, frames)
    np.testing.assert_allclose(
        np.asarray(lp_marg), np.asarray(lp_direct), atol=0.05
    )


def test_metropolize_filters_high_energy():
    _, _, target = _flow_and_target()
    good = jax.random.normal(jax.random.PRNGKey(6), (200, 4))
    bad = 10.0 + jax.random.normal(jax.random.PRNGKey(7), (200, 4))
    x = jnp.concatenate([good, bad])
    mask, energies = metropolize(jax.random.PRNGKey(8), target, x, burnin=10)
    m = np.asarray(mask)
    # acceptance among the displaced block should be rare
    assert m[200:].mean() < 0.2
    assert m[10:200].mean() > 0.2


def test_force_matching_zero_for_matched_model():
    dim = 3
    target = distributions.GaussianMixture(
        centers=[[0.0] * dim], vars=[1.0], npoints=1, point_dim=dim
    )
    flow = NormalizingFlow(
        distributions.DiagNormal(dim), bijectors.Chain([])
    )
    params = flow.init(jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(10), (32, dim))
    err = float(force_matching(flow, params, target, x))
    assert err < 1e-5

    gap = held_out_logprob_gap(
        flow, params, jax.random.PRNGKey(11),
        target.sample(jax.random.PRNGKey(12), 500), nsamples=500
    )
    assert abs(float(gap[2])) < 0.5


def test_relaxation_forwards_soft_factor_to_integrate_out_v(monkeypatch):
    """The marginalized density must use the SAME softened momentum
    distribution that relaxed the frames (reference samples hmc.v_dist
    built at init_beta=beta/1000, dynamics.py:15,27)."""
    import normalizingflow_tpu.mcmc.relaxation as relaxation_mod

    flow, params, target = _flow_and_target()
    traj = jax.random.normal(jax.random.PRNGKey(20), (4, 4))
    seen = {}
    real = relaxation_mod.integrate_out_v

    def spy(key, fl, pr, tg, frames, **kw):
        seen.update(kw)
        return real(key, fl, pr, tg, frames, **kw)

    monkeypatch.setattr(relaxation_mod, "integrate_out_v", spy)
    relaxation_step(
        jax.random.PRNGKey(21), flow, params, target, traj,
        path_len=2, step_size=1e-3, soft_factor=7.5,
    )
    assert seen["soft_factor"] == 7.5
    assert seen["path_len"] == 2
    assert seen["step_size"] == 1e-3


def test_integrate_out_v_uses_soft_momenta():
    """With a huge soft_factor the endpoints scatter far from the frames,
    so the marginalized logp must drop well below the direct flow logp.
    Cap/damping are disabled here to test the bare NVE kernel; the capped
    default is covered by test_relaxation_caps_displacement."""
    flow, params, target = _flow_and_target()
    frames = jax.random.normal(jax.random.PRNGKey(22), (16, 4)) * 0.1
    raw = dict(max_disp=1e9, damping=1.0)
    lp_soft = integrate_out_v(
        jax.random.PRNGKey(23), flow, params, target, frames, npoints=8,
        path_len=4, step_size=0.05, soft_factor=1000.0, **raw,
    )
    lp_cold = integrate_out_v(
        jax.random.PRNGKey(23), flow, params, target, frames, npoints=8,
        path_len=4, step_size=0.05, soft_factor=1e-6, **raw,
    )
    lp_direct = flow.log_prob(params, frames)
    np.testing.assert_allclose(
        np.asarray(lp_cold), np.asarray(lp_direct), atol=0.05
    )
    assert float(jnp.mean(lp_soft)) < float(jnp.mean(lp_direct)) - 1.0


def test_relaxation_caps_displacement():
    """The default kernel is displacement-capped (LAMMPS fix nve/limit
    analog): even from a catastrophic-overlap frame (|grad U| astronomical),
    every coordinate moves at most path_len * max_disp and the result stays
    finite -- the NaN failure mode fe_diff hit on LJ flow samples."""

    class Steep:
        def potential(self, x):
            # |grad| ~ 1e12 near the origin frames below; (B,) per frame
            return 1.0 / (jnp.sum(x**2, axis=-1) + 1e-12) ** 3

    flow, params, _ = _flow_and_target()
    frames = jax.random.normal(jax.random.PRNGKey(30), (8, 4)) * 1e-3
    res = relaxation_step(
        jax.random.PRNGKey(31), flow, params, Steep(), frames,
        kT=1.0, path_len=12, max_disp=0.05,
    )
    assert bool(jnp.all(jnp.isfinite(res.positions)))
    assert bool(jnp.all(jnp.isfinite(res.q_learned)))
    move = jnp.max(jnp.abs(res.positions - frames))
    assert float(move) <= 12 * 0.05 + 1e-6
    # and it actually relaxes: energies must drop
    assert bool(jnp.all(res.q_energy > res.q_energy_before))


def test_collect_hmc_data_writes_xyz(tmp_path):
    """dynamics.py:61,64 writes generated/relaxed .xyz snapshots."""
    import os

    flow, params, target = _flow_and_target(dim=6)
    data, _ = collect_hmc_data(
        jax.random.PRNGKey(24), flow, params, target, n_chains=2,
        n_steps=20, burnin=5, step_size=0.3, num_leapfrog=3,
        output_dir=str(tmp_path), n_particles=2,
    )
    gen = tmp_path / "generated_configs.xyz"
    rel = tmp_path / "relaxed_configs.xyz"
    assert gen.exists() and rel.exists()
    from normalizingflow_tpu.io.xyz import read_xyz

    frames = read_xyz(str(rel))
    assert frames.reshape(len(frames), -1).shape == data.shape
