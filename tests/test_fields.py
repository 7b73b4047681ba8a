"""Lattice field-theory targets: massive GFF (polymer surrogate) and phi^4.

The GFF is the one target with an exactly normalized density, so these tests
check it against dense linear algebra: log_prob vs an explicit multivariate
normal built from the autodiff Hessian of the action, and exact-sampling
moments against the spectral covariance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from normalizingflow_tpu.targets import GaussianField, Phi4Lattice
from normalizingflow_tpu.targets.gff import gff_action
from normalizingflow_tpu.targets.phi4 import phi4_action


def test_gff_log_prob_matches_dense_gaussian():
    gff = GaussianField(L=4, channels=1, mass=0.7)
    d = gff.dim

    # Precision matrix = Hessian of the (quadratic) action.
    P = np.asarray(jax.hessian(lambda v: gff.potential(v[None])[0])(
        jnp.zeros(d)
    ))
    sign, logdet = np.linalg.slogdet(P)
    assert sign > 0
    # Spectral normalizer agrees with the dense determinant.
    np.testing.assert_allclose(
        float(jnp.sum(jnp.log(gff.eigenvalues))), logdet, rtol=1e-10
    )

    x = np.asarray(gff.sample(jax.random.PRNGKey(0), 8))
    expected = (
        -0.5 * np.einsum("bi,ij,bj->b", x, P, x)
        + 0.5 * logdet - 0.5 * d * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(
        np.asarray(gff.log_prob(jnp.asarray(x))), expected, rtol=1e-9
    )


def test_gff_exact_sampling_moments():
    gff = GaussianField(L=8, channels=2, mass=(0.5, 1.0))
    x = gff.sample(jax.random.PRNGKey(1), 8192)
    assert x.shape == (8192, gff.dim)

    # Mean zero; per-site variance = tr(C)/d = mean over modes of 1/lambda.
    var_expected = float(jnp.mean(1.0 / gff.eigenvalues))
    assert abs(float(jnp.mean(x))) < 0.01
    np.testing.assert_allclose(
        float(jnp.mean(jnp.var(x, axis=0))), var_expected, rtol=0.03
    )

    # Equipartition: E[S] = dim/2, so E[log p] = log_norm - dim/2.
    mean_lp = float(jnp.mean(gff.log_prob(x)))
    np.testing.assert_allclose(
        mean_lp, gff.log_norm - gff.dim / 2, rtol=0.01
    )


def test_gff_channels_have_distinct_masses():
    gff = GaussianField(L=8, channels=2, mass=(0.3, 2.0))
    x = gff.sample(jax.random.PRNGKey(2), 4096, flatten=False)
    # Lighter mass -> longer-ranged, larger-variance field.
    v0 = float(jnp.var(x[:, 0]))
    v1 = float(jnp.var(x[:, 1]))
    assert v0 > 2 * v1


def test_gff_action_is_local_quadratic_form():
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (5, 5))
    # Brute-force periodic action.
    s = 0.0
    L, m = 5, 0.9
    for i in range(L):
        for j in range(L):
            s += 0.5 * (w[(i + 1) % L, j] - w[i, j]) ** 2
            s += 0.5 * (w[i, (j + 1) % L] - w[i, j]) ** 2
            s += 0.5 * m * m * w[i, j] ** 2
    np.testing.assert_allclose(float(gff_action(w, m)), float(s), rtol=1e-12)


def test_phi4_action_brute_force():
    key = jax.random.PRNGKey(4)
    L, kappa, lam = 4, 0.3, 0.022
    phi = jax.random.normal(key, (L, L))
    s = 0.0
    for i in range(L):
        for j in range(L):
            p = phi[i, j]
            nb = phi[(i - 1) % L, j] + phi[i, (j - 1) % L]
            s += -2 * kappa * p * nb + (1 - 2 * lam) * p * p + lam * p**4
    np.testing.assert_allclose(
        float(phi4_action(phi, kappa, lam)), float(s), rtol=1e-12
    )

    target = Phi4Lattice(L=L, kappa=kappa, lam=lam)
    batch = jax.random.normal(jax.random.PRNGKey(5), (3, L * L))
    # log_prob = -action; Z2 symmetry phi -> -phi.
    np.testing.assert_allclose(
        np.asarray(target.log_prob(batch)),
        np.asarray(-target.potential(batch)), rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(target.potential(-batch)),
        np.asarray(target.potential(batch)), rtol=1e-12,
    )


def test_gff_registry_and_polymer_data_roundtrip(tmp_path):
    from normalizingflow_tpu.config import load_config
    from normalizingflow_tpu.apps.polymer import generate_data

    cfg = load_config("configs/Polymer_rnvp.yaml")
    cfg.dataset.nparticles, cfg.dataset.dim = 32, 1  # 2 x 4 x 4 fields
    cfg.dataset.training_data = str(tmp_path / "train.npy")
    cfg.dataset.testing_data = str(tmp_path / "test.npy")
    assert generate_data(cfg, nframes=10) == 0
    train = np.load(cfg.dataset.training_data)
    test = np.load(cfg.dataset.testing_data)
    assert train.shape == (8, 32) and test.shape == (2, 32)
    assert np.all(np.isfinite(train))


def test_phi4_config_end_to_end(tmp_path):
    """Phi4.yaml pipeline: HMC data -> forward-KL training -> density eval
    (the config-5 workflow; same shape as the LJ/Fe pipelines)."""
    import dataclasses

    import normalizingflow_tpu.config as C
    from normalizingflow_tpu.apps.sample_data import generate
    from normalizingflow_tpu.train.fused import train_flow_fused

    cfg = C.load_config("configs/Phi4.yaml")
    ds = dataclasses.replace(cfg.dataset, L=4, nparticles=16)
    pr = dataclasses.replace(cfg.prior, nparticles=16)
    cfg = dataclasses.replace(cfg, dataset=ds, prior=pr)

    frames, acc = generate(cfg, nframes=256, chains=32, seed=0)
    assert frames.shape == (256, 16)
    assert 0.2 < acc <= 1.0

    data_path = str(tmp_path / "phi4.npy")
    np.save(data_path, frames)
    cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(ds, training_data=data_path)
    )
    flow, potential, cfg = C.setup_model(cfg, mode="training")
    assert potential.dataset is not None

    params, hist = train_flow_fused(
        flow, jax.random.PRNGKey(0), potential, max_epochs=1600,
        batch_size=64, learning_rate=1e-3, scheduler="cosine",
        output_freq=200, chunk=400,
    )
    losses = hist["losses"]  # one mean per 400-step chunk
    assert losses[-1] < losses[0], losses
    # trained flow assigns its samples a density comparable to data's
    x, log_px, _ = flow.sample(params, jax.random.PRNGKey(1), 256)
    lp_data = flow.log_prob(params, jnp.asarray(frames))
    # The phi4 config at kappa=0.3 is near-critical and 1600 CPU steps is
    # far undertrained (the config runs 4000 on TPU): the check here is
    # end-to-end pipeline consistency (finite, same-ballpark densities),
    # not convergence -- the production-quality check is the config row in
    # PARITY_RESULTS.md.
    gap = abs(float(jnp.mean(log_px)) - float(jnp.mean(lp_data)))
    assert np.isfinite(gap) and gap < 20.0, gap
