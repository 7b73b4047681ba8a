"""Flow-seeded relaxation and hybrid training-data collection.

TPU rebuild of /root/reference/applications/src/dynamics.py and the
independence-Metropolis filter of applications/src/utils.py:82-99. The
reference relaxes ONE flow sample at a time through a LAMMPS-driven HMC chain
(dynamics.py:59-65) and loops Python over frames (dynamics.py:3-23); here
every frame is a vmapped chain inside one jit-compiled program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hmc import run_hmc


def collect_hmc_data(key, flow, params, target, n_chains=8, n_steps=500,
                     burnin=100, step_size=0.01, num_leapfrog=10, kT=1.0,
                     output_dir=None, n_particles=None):
    """Flow samples -> HMC relaxation -> burn-in-trimmed training data.

    Counterpart of dynamics.collect_hmc_data (dynamics.py:59-65) + the
    acceptance-gated mixing policy consumed by train.py:14-19. Returns
    (data (n_frames, dim), acceptance_rate).

    With output_dir set, writes generated_configs.xyz (the flow seeds) and
    relaxed_configs.xyz (the trimmed HMC trajectory) for inspection, as the
    reference does at dynamics.py:61,64.
    """
    k_sample, k_run = jax.random.split(key)
    x0, _, _ = flow.sample(params, k_sample, n_chains)

    def logprob(x):
        return target.log_prob(x[None])[0] / kT if kT != 1.0 \
            else target.log_prob(x[None])[0]

    res = run_hmc(
        k_run, logprob, x0, num_samples=n_steps, num_warmup=0,
        step_size=step_size, num_leapfrog=num_leapfrog,
    )
    data = res.samples[burnin:].reshape(-1, x0.shape[1])
    # Keep relaxed positions inside the periodic box (minimum image) so the
    # mixed training data stays in the flow's spline domain -- see
    # apps/sample_data.generate.
    box = getattr(target, "boxlength", None)
    if box:
        data = data - jnp.round(data / box) * box
    dim = x0.shape[1]
    npart = n_particles if n_particles is not None else dim // 3
    if output_dir is not None and npart * 3 == dim:
        # xyz snapshots only exist for 3-D particle systems (the reference
        # writes them for LJ/Fe, dynamics.py:61,64); skip for field/toy dims.
        import os

        from ..io.xyz import write_xyz

        os.makedirs(output_dir, exist_ok=True)
        write_xyz(os.path.join(output_dir, "generated_configs.xyz"),
                  jnp.asarray(x0), npart)
        write_xyz(os.path.join(output_dir, "relaxed_configs.xyz"),
                  data, npart)
    return data, res.accept_rate


class RelaxationResult(NamedTuple):
    positions: jnp.ndarray   # (n, dim) relaxed frames
    q_learned: jnp.ndarray   # (n,) flow logp with velocity marginalized
    q_energy: jnp.ndarray    # (n,) -U/kT after relaxation
    q_energy_before: jnp.ndarray


def relaxation_step(key, flow, params, target, traj, kT=1.0, path_len=12,
                    step_size=1e-3, soft_factor=1000.0, max_disp=0.05,
                    damping=0.5):
    """Short HMC relaxation of each frame at a softened temperature.

    Counterpart of dynamics.relaxation_step (dynamics.py:3-23): one
    leapfrog trajectory per frame with momenta drawn at init_beta =
    beta/soft_factor (the reference's init_beta=beta/1000), energies
    recorded before/after, and the flow log-density of the relaxed frame
    computed with the velocity marginalized out (integrate_out_v).
    All frames relax in parallel as vmapped chains.

    `max_disp` caps the per-coordinate displacement of every leapfrog step
    (the LAMMPS `fix nve/limit` mechanism). The reference integrates
    through LAMMPS with physical masses (55.845 amu Fe, dynamics.py:15) and
    metal-units timesteps, which bounds per-step motion implicitly; in
    reduced units with unit mass, a flow sample with overlapping particles
    has |grad U| ~ 1e9 and one uncapped kick ejects the whole frame to
    NaN (observed: LJ fe_diff returned NaN for all four estimators). The
    cap keeps the map finite and deterministic -- and since BOTH ensembles
    are pushed through the identical kernel (test.py:36,41), capping does
    not bias the free-energy difference.
    """
    n, dim = traj.shape
    k_mom, k_v = jax.random.split(key)

    beta = 1.0 / kT
    q_before = -target.potential(traj) * beta

    logprob_grad = jax.value_and_grad(
        lambda x: -target.potential(x[None])[0] * beta
    )

    def leapfrog_frame(q0, p0):
        def step(carry, _):
            q, p, g = carry
            p = damping * (p + 0.5 * step_size * g)
            dq = jnp.clip(step_size * p, -max_disp, max_disp)
            q = q + dq
            _, g = logprob_grad(q)
            p = damping * (p + 0.5 * step_size * g)
            return (q, p, g), None

        _, g0 = logprob_grad(q0)
        (q, p, _), _ = jax.lax.scan(
            step, (q0, p0, g0), None, length=path_len
        )
        return q

    # soft momenta: variance multiplied by soft_factor (init_beta small)
    p0 = jax.random.normal(k_mom, traj.shape) * jnp.sqrt(soft_factor / beta
                                                         if beta > 0 else 1.0)
    relaxed = jax.vmap(leapfrog_frame)(traj, p0)
    box = getattr(target, "boxlength", None)
    if box:
        # minimum-image wrap: energies are invariant, but downstream flow
        # logp evaluation needs positions inside the spline domain
        relaxed = relaxed - jnp.round(relaxed / box) * box
    q_after = -target.potential(relaxed) * beta
    q_learned = integrate_out_v(
        k_v, flow, params, target, relaxed, kT=kT, path_len=path_len,
        step_size=step_size, soft_factor=soft_factor, max_disp=max_disp,
        damping=damping,
    )
    return RelaxationResult(relaxed, q_learned, q_after, q_before)


def integrate_out_v(key, flow, params, target, frames, kT=1.0, npoints=10,
                    path_len=12, step_size=1e-3, soft_factor=1000.0,
                    max_disp=0.05, damping=0.5):
    """Marginalize the momentum of the relaxation map through the flow.

    Counterpart of dynamics.integrate_out_v (dynamics.py:26-36): for each
    frame, draw `npoints` momenta, integrate each trajectory, evaluate the
    flow log-density of the endpoints, and logsumexp-average:
    log p(frame) ~ logsumexp_v log p_flow(endpoint(frame, v)) - log npoints.
    Runs all frames x npoints trajectories as one vmapped batch.

    Momenta are drawn from the SAME softened distribution the relaxation
    used (variance soft_factor/beta): the reference samples hmc.v_dist,
    which was built at init_beta = beta/1000 (dynamics.py:15,27,
    nf/hmc.py:25-27) -- so the marginalized density corresponds to the
    relaxation kernel that actually produced the relaxed positions.
    """
    n, dim = frames.shape
    beta = 1.0 / kT
    logprob_grad = jax.value_and_grad(
        lambda x: -target.potential(x[None])[0] * beta
    )

    def endpoint(q0, p0):
        def step(carry, _):
            q, p, g = carry
            # identical damped/capped kernel as relaxation_step -- the
            # marginalized kernel must be the one that produced the
            # relaxed positions
            p = damping * (p + 0.5 * step_size * g)
            dq = jnp.clip(step_size * p, -max_disp, max_disp)
            q = q + dq
            _, g = logprob_grad(q)
            p = damping * (p + 0.5 * step_size * g)
            return (q, p, g), None

        _, g0 = logprob_grad(q0)
        (q, _, _), _ = jax.lax.scan(step, (q0, p0, g0), None,
                                    length=path_len)
        return q

    ps = jax.random.normal(key, (npoints, n, dim)) * jnp.sqrt(
        soft_factor / beta)
    ends = jax.vmap(lambda p: jax.vmap(endpoint)(frames, p))(ps)
    box = getattr(target, "boxlength", None)
    if box:
        # keep endpoints in the spline domain (see relaxation_step)
        ends = ends - jnp.round(ends / box) * box
    # One flat batch (not vmap) so the flow's fused RQS Pallas path applies.
    lps = flow.log_prob(params, ends.reshape(npoints * n, dim))
    lps = lps.reshape(npoints, n)
    return jax.scipy.special.logsumexp(lps, axis=0) - jnp.log(npoints)


def metropolize(key, target, x, kT=1.0, burnin=20):
    """Independence-Metropolis filter of flow samples by target energy.

    Counterpart of applications/src/utils.py:82-99: walk the sample list,
    accept sample i over the current state with prob exp(-(U_i - U_cur)/kT);
    return the accept mask (True where the walker moved, post burn-in) and
    the walker's energy trace. Sequential by construction -> lax.scan.
    """
    energies = target.potential(x) / kT
    n = x.shape[0]
    keys = jax.random.split(key, n)

    def step(carry, inp):
        cur_e = carry
        e, k = inp
        accept = jnp.log(jax.random.uniform(k, (), e.dtype)) < (cur_e - e)
        new_e = jnp.where(accept, e, cur_e)
        return new_e, accept

    _, accepts = jax.lax.scan(step, energies[0], (energies, keys))
    idx_mask = accepts & (jnp.arange(n) > burnin)
    return idx_mask, energies
