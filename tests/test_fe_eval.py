"""Regression tests for the free-energy evaluation pipeline (apps/fe_eval).

Covers the round-2 fixes:
  * generate_from_nf / evaluate honor non-multiple-of-batchsize requests
    exactly (the reference floors, test.py:14, and under-delivers);
  * fe_diff with relaxation=True relaxes BOTH ensembles, mirroring the
    reference's test.py:36 and test.py:41-42, so the state-0 density
    function is identical for both Q columns.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback

from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
from normalizingflow_tpu.apps.fe_eval import (
    evaluate,
    fe_diff,
    generate_from_nf,
)


def _flow(dim=4):
    flow = NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain([bijectors.ActNorm(dim)]),
    )
    return flow, flow.init(jax.random.PRNGKey(0))


def test_generate_from_nf_non_multiple_count():
    flow, params = _flow()
    x, lp = generate_from_nf(
        flow, params, jax.random.PRNGKey(1), 750, batchsize=500
    )
    assert x.shape == (750, 4)
    assert lp.shape == (750,)


def test_evaluate_non_multiple_count():
    flow, params = _flow()
    x = jax.random.normal(jax.random.PRNGKey(2), (750, 4))
    lp = evaluate(flow, params, x, batchsize=500)
    assert lp.shape == (750,)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(flow.log_prob(params, x)), rtol=1e-6
    )


def test_fe_diff_relaxes_both_ensembles(monkeypatch):
    """test.py:36 and test.py:41-42 relax traj0 AND traj1 identically.

    fe_diff jits the relaxation path (one program serves both ensembles),
    so the spy sees tracers at trace time but must record the CONCRETE
    trajectory of every execution -- io_callback fires once per run of the
    compiled program, i.e. once per relaxed ensemble.
    """
    import normalizingflow_tpu.mcmc.relaxation as relaxation_mod

    flow, params = _flow()
    target = distributions.GaussianMixture(
        centers=[[0.0] * 4], vars=[1.0], npoints=1, point_dim=4
    )

    calls = []
    real = relaxation_mod.relaxation_step

    def spy(key, fl, pr, tg, traj, **kw):
        io_callback(
            lambda a: calls.append(np.asarray(a)), None, traj, ordered=True
        )
        return real(key, fl, pr, tg, traj, **kw)

    monkeypatch.setattr(relaxation_mod, "relaxation_step", spy)

    out = fe_diff(
        flow, params, target, jax.random.PRNGKey(3), nsamples=16,
        n_particles=4, relaxation=True,
        relaxation_kwargs={"path_len": 2, "step_size": 1e-3,
                           "soft_factor": 1.0},
    )
    assert len(calls) == 2, "both the NF and MD ensembles must be relaxed"
    assert calls[0].shape == calls[1].shape == (16, 4)
    assert not np.allclose(calls[0], calls[1])
    for k in ("bar", "md", "nf", "emus"):
        assert np.isfinite(out[k])


def test_relaxed_fe_diff_consistent_with_unrelaxed():
    """With a near-identity relaxation kernel the relaxed estimates must
    agree with the unrelaxed ones (flow == target == N(0, I) here, so
    every estimator should sit near the known per-dim free energy 0)."""
    flow, params = _flow()
    target = distributions.GaussianMixture(
        centers=[[0.0] * 4], vars=[1.0], npoints=1, point_dim=4
    )
    plain = fe_diff(
        flow, params, target, jax.random.PRNGKey(7), nsamples=512,
        n_particles=4,
    )
    relaxed = fe_diff(
        flow, params, target, jax.random.PRNGKey(7), nsamples=512,
        n_particles=4, relaxation=True,
        relaxation_kwargs={"path_len": 2, "step_size": 1e-4,
                           "soft_factor": 1.0},
    )
    assert abs(plain["bar"]) < 0.1
    assert abs(relaxed["bar"] - plain["bar"]) < 0.1
