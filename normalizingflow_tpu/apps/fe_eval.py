"""Free-energy evaluation pipeline (the reference's test.py workflow).

JAX port of /root/reference/applications/src/test.py:13-102 with the external
MBAR/FastMBAR dependencies replaced by the self-contained solver in
estimators/mbar.py:

  * generate_from_nf / evaluate: batched flow sampling and density evaluation
    (test.py:13-31) -- here single jit calls, no Python batching loop needed;
  * fe_diff: builds the 2x2 work matrix Q from {flow samples, MD data} x
    {flow logp, -U/kT}, min-shifts for numerical stability (test.py:55-60),
    and returns the four estimates (BAR, forward/reverse Zwanzig, MBAR/EMUS)
    in per-particle kT units (test.py:61-68);
  * plot_q: the (flow logp, -U/kT) scatter diagnostic
    (applications/src/utils.py:8-30).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..estimators.bar import bar
from ..estimators.mbar import mbar
from ..estimators.zwanzig import zwanzig


def generate_from_nf(flow, params, key, nsamples, batchsize=500):
    """Flow samples + their model log-densities, (nsamples, dim).

    Ceil-divides into fixed-size batches (one compiled program) and trims,
    so any requested nsamples is honored exactly -- the reference floors
    (test.py:14) and silently under-delivers for non-multiples.
    """
    # params MUST be a jit argument, not a closure: closed-over arrays are
    # embedded in the HLO as literal constants (~350 MB for the Fe flow),
    # which blows past the remote-compile tunnel's request-body limit
    # (HTTP 413) and bloats compile time.
    sample = jax.jit(lambda p, k: flow.sample(p, k, batchsize))
    xs, lps = [], []
    for i in range(-(-nsamples // batchsize)):
        x, log_px, _ = sample(params, jax.random.fold_in(key, i))
        xs.append(x)
        lps.append(log_px)
    return jnp.concatenate(xs)[:nsamples], jnp.concatenate(lps)[:nsamples]


def evaluate(flow, params, x, batchsize=500):
    """Flow log-density of every row of x, batched; exact length len(x)."""
    lp = jax.jit(lambda p, xb: flow.log_prob(p, xb))
    outs = [
        lp(params, x[i * batchsize : (i + 1) * batchsize])
        for i in range(-(-len(x) // batchsize))
    ]
    return jnp.concatenate(outs)[: len(x)]


def fe_diff(flow, params, potential, key, nsamples, n_particles, kT=1.0,
            plot_path=None, relaxation=False, relaxation_kwargs=None):
    """Free-energy difference between the flow model and the physical system.

    Returns dict with 'bar', 'md' (forward Zwanzig), 'nf' (reverse Zwanzig),
    'emus' (MBAR) estimates, per particle, in kT units, plus the Q matrices.

    relaxation=True follows the reference's default path (test.py:35-48):
    BOTH ensembles are relaxed by a short soft-momentum HMC trajectory on
    the target before their energies enter the work matrix, and the flow
    log-density of each relaxed frame is computed with the relaxation
    momentum marginalized out (dynamics.integrate_out_v) -- so u0(x) is the
    same density function for both Q columns (test.py:36 and test.py:41-42
    call the identical relaxation_step on traj0 and traj1). Without it, the
    occasional flow sample with overlapping particles contributes an
    astronomically positive U that wrecks the exponential-averaging
    estimators (exactly the failure the reference's relaxation exists for).
    """
    k_gen, k_data, k_relax0, k_relax1 = jax.random.split(key, 4)
    if relaxation:
        from ..mcmc.relaxation import relaxation_step

        # One jitted program serves both ensembles (same (nsamples, dim)
        # shape); eager execution here costs one ~100 ms tunnel dispatch
        # per primitive. params is an ARGUMENT, not a closure -- see
        # generate_from_nf.
        relax_fn = jax.jit(lambda k, p, x: relaxation_step(
            k, flow, p, potential, x, kT=kT, **(relaxation_kwargs or {})
        ))
    # state 0 = flow ensemble
    x0, q00 = generate_from_nf(flow, params, k_gen, nsamples)
    if relaxation:
        relax = relax_fn(k_relax0, params, x0)
        x0, q00, q01 = relax.positions, relax.q_learned, relax.q_energy
    else:
        q01 = -potential.potential(x0) / kT
    # state 1 = MD/data ensemble
    x1 = potential.sample(k_data, nsamples)
    x1 = x1.reshape(len(x1), -1)
    if relaxation:
        relax1 = relax_fn(k_relax1, params, x1.astype(x0.dtype))
        x1, q10, q11 = relax1.positions, relax1.q_learned, relax1.q_energy
    else:
        q10 = evaluate(flow, params, x1)
        q11 = -potential.potential(x1) / kT

    q0 = jnp.stack([q00, q01], axis=1)
    q1 = jnp.stack([q10, q11], axis=1)

    # stability shifts (test.py:55-60)
    s0 = jnp.min(q1[:, 0])
    s1 = jnp.min(q1[:, 1])
    q0 = q0 - jnp.array([s0, s1])
    q1 = q1 - jnp.array([s0, s1])

    # MBAR ("emus" in the reference, test.py:61-65): reduced energies are
    # -log-densities of all pooled samples under both states.
    u_kn = -jnp.concatenate([q0, q1], axis=0).T
    f = mbar(u_kn, jnp.array([nsamples, nsamples]))
    # log c_k = -f_k; emus = (s0 - s1 + log c0 - log c1) / N * kT
    emus = (s0 - s1 + (f[1] - f[0])) / n_particles * kT

    w_f = np.asarray(q0[:, 0] - q0[:, 1])
    w_r = np.asarray(-q1[:, 0] + q1[:, 1])
    bar_est = (float(s0 - s1) + float(bar(w_f, w_r))) / n_particles * kT
    md = (float(s0 - s1) + float(zwanzig(q1[:, 0] - q1[:, 1]))) \
        / n_particles * kT
    nf = (float(s0 - s1) + float(-zwanzig(q0[:, 1] - q0[:, 0]))) \
        / n_particles * kT

    if plot_path is not None:
        plot_q(np.asarray(q0), np.asarray(q1), plot_path)

    return {
        "bar": bar_est,
        "md": md,
        "nf": nf,
        "emus": float(emus),
        "Q0": np.asarray(q0),
        "Q1": np.asarray(q1),
    }


def fe_diff_ntrials(flow, params, potential, key, nsamples, n_particles,
                    data_paths, kT=1.0):
    """Mean +/- std of the BAR estimate over independent MD datasets
    (applications/examples/fe.py:49-55)."""
    bars = []
    for i, path in enumerate(data_paths):
        potential.update_data(path)
        out = fe_diff(
            flow, params, potential, jax.random.fold_in(key, i), nsamples,
            n_particles, kT,
        )
        bars.append(out["bar"])
    bars = np.asarray(bars)
    return bars.mean(), bars.std(), bars


def plot_q(q0, q1, path, split=False):
    """Scatter of (flow logp, -U/kT): NF vs MD ensembles (utils.py:8-30)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if split:
        fig, (ax1, ax2) = plt.subplots(
            1, 2, sharex=True, sharey=True, figsize=(12, 6),
            tight_layout=True,
        )
        ax1.plot(q0[:, 0], q0[:, 1], ".", color="darkgray")
        ax1.set_title("trajectory generated by NF")
        ax2.plot(q1[:, 0], q1[:, 1], ".", color="darkgray")
        ax2.set_title("trajectory from MD simulation")
        fig.supxlabel("logpx from NF")
        fig.supylabel("-potential (kT)")
        fig.savefig(path)
        plt.close(fig)
    else:
        plt.figure()
        plt.plot(q0[:, 0], q0[:, 1], ".", color="darkblue", label="NF traj")
        plt.plot(q1[:, 0], q1[:, 1], ".", color="darkgray", label="MD traj")
        plt.xlabel("logpx from NF")
        plt.ylabel("-potential (kT)")
        plt.legend()
        plt.savefig(path)
        plt.close()


def fe_diff_no_training(flow, params, potential, key, nsamples, n_particles,
                        kT=1.0):
    """Prior-only free-energy baseline (test.py:74-90): build the work matrix
    from PRIOR samples (no trained flow) and solve with MBAR. Returns the
    per-particle reduced free energies."""
    k0, k1 = jax.random.split(key)
    x0 = flow.prior.sample(k0, nsamples)
    q00 = flow.prior.log_prob(x0)
    q01 = -potential.potential(x0) / kT
    x1 = potential.sample(k1, nsamples)
    x1 = x1.reshape(len(x1), -1)
    q10 = flow.prior.log_prob(x1)
    q11 = -potential.potential(x1) / kT
    q0 = jnp.stack([q00, q01], axis=1)
    q1 = jnp.stack([q10, q11], axis=1)
    u = -jnp.concatenate([q0, q1], axis=0).T
    f = mbar(u, jnp.array([nsamples, nsamples]))
    return np.asarray(f) * kT / n_particles
