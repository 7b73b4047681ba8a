"""Bijector unit tests: round-trip inverse(forward(x)) == x and
log-det == slogdet(jacobian) for every flow layer (SURVEY.md §4a)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normalizingflow_tpu.bijectors import (
    ActNorm,
    AffineCoupling,
    Chain,
    InvertibleLinear,
    MaskedAffineAR,
    Planar,
    Radial,
    Repeat,
    SplineAR,
    SplineCoupling,
)

DIM = 6
BATCH = 7


def _roundtrip(bij, key, dim=DIM, batch=BATCH, scale=1.0, atol=1e-8):
    kp, kx = jax.random.split(jax.random.PRNGKey(key))
    params = bij.init(kp)
    params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
    x = scale * jax.random.normal(kx, (batch, dim), dtype=jnp.float64)
    y, ld_f = bij.forward(params, x)
    x2, ld_i = bij.inverse(params, y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=atol)
    assert y.shape == x.shape and ld_f.shape == (batch,)
    return params, x


def _check_logdet(bij, params, x, atol=1e-8):
    def single(xi):
        y, _ = bij.forward(params, xi[None])
        return y[0]

    jac = jax.vmap(jax.jacfwd(single))(x)
    _, expected = np.linalg.slogdet(np.asarray(jac))
    _, ld = bij.forward(params, x)
    np.testing.assert_allclose(np.asarray(ld), expected, atol=atol)


def test_affine_coupling():
    bij = AffineCoupling(DIM, hidden_dim=16)
    params, x = _roundtrip(bij, 0)
    _check_logdet(bij, params, x)


def test_spline_coupling():
    bij = SplineCoupling(size=4, space_dim=3, num_bins=6, tail_bound=2.0,
                         hidden_dim=16, mask=(0,))
    params, x = _roundtrip(bij, 1, dim=12, scale=0.8)
    _check_logdet(bij, params, x)


@pytest.mark.parametrize("mask", [(1,), (2,), (0, 2), (1, 2)])
def test_spline_coupling_nonprefix_masks(mask):
    """Round-trips must hold for every mask (fixes reference bug, see
    coupling.py docstring / nf/flows.py:239)."""
    bij = SplineCoupling(size=3, space_dim=3, num_bins=5, tail_bound=2.0,
                         hidden_dim=8, mask=mask)
    params, x = _roundtrip(bij, 2, dim=9, scale=0.8)
    _check_logdet(bij, params, x)


@pytest.mark.parametrize("periodic", [True, False])
def test_spline_ar(periodic):
    bij = SplineAR(DIM, num_bins=5, tail_bound=3.0, hidden_dim=12,
                   periodic=periodic)
    params, x = _roundtrip(bij, 3)
    _check_logdet(bij, params, x)


def test_spline_ar_dim1():
    bij = SplineAR(1, num_bins=5, tail_bound=3.0, hidden_dim=8)
    _roundtrip(bij, 4, dim=1)


def test_spline_ar_chunked_inverse_matches_flat():
    """dim-1 > 128 triggers the 2-level chunked inverse scan (TPU loop-unroll
    and HLO-size mitigation, autoregressive._chunked_index_scan); it must
    produce exactly the flat scan's result. dim=150 pads 2x75 with one
    masked step."""
    from normalizingflow_tpu.bijectors import autoregressive as ar

    dim = 150
    bij = SplineAR(dim, num_bins=4, tail_bound=3.0, hidden_dim=6)
    kp, kx = jax.random.split(jax.random.PRNGKey(11))
    params = bij.init(kp)
    z = jax.random.normal(kx, (3, dim)) * 2.0
    x_chunked, ld_chunked = bij.inverse(params, z)

    flat = ar._chunked_index_scan
    try:
        ar._chunked_index_scan = lambda step, carry, d, chunk=0: flat(
            step, carry, d, chunk=10_000)
        x_flat, ld_flat = bij.inverse(params, z)
    finally:
        ar._chunked_index_scan = flat

    np.testing.assert_allclose(np.asarray(x_chunked), np.asarray(x_flat),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ld_chunked), np.asarray(ld_flat),
                               rtol=0, atol=0)
    # and the roundtrip still holds
    y, ld_f = bij.forward(params, x_chunked)
    np.testing.assert_allclose(np.asarray(y), np.asarray(z), atol=1e-4)


def test_masked_affine_ar():
    bij = MaskedAffineAR(DIM, hidden_dim=8)
    params, x = _roundtrip(bij, 5)
    # forward includes a flip (nf/flows_1.py:188); logdet check must use the
    # full map including the permutation (|det flip| = 1).
    _check_logdet(bij, params, x)


def test_actnorm():
    bij = ActNorm(DIM)
    kp = jax.random.PRNGKey(6)
    params = bij.init(kp)
    params["mu"] = jnp.arange(DIM, dtype=jnp.float64) * 0.1
    params["log_sigma"] = jnp.linspace(-0.3, 0.4, DIM).astype(jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(7), (BATCH, DIM), jnp.float64)
    y, ld_f = bij.forward(params, x)
    x2, ld_i = bij.inverse(params, y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(ld_f), float(jnp.sum(params["log_sigma"])), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-12)
    _check_logdet(bij, params, x, atol=1e-10)


def test_invertible_linear():
    bij = InvertibleLinear(DIM)
    params, x = _roundtrip(bij, 8, atol=1e-9)
    _check_logdet(bij, params, x, atol=1e-9)


def test_radial_exact_inverse():
    bij = Radial(DIM)
    params, x = _roundtrip(bij, 9, atol=1e-9)
    _check_logdet(bij, params, x, atol=1e-8)


def test_planar_forward_logdet():
    bij = Planar(DIM)
    kp, kx = jax.random.split(jax.random.PRNGKey(10))
    params = jax.tree.map(lambda a: a.astype(jnp.float64),
                          bij.init(kp))
    x = jax.random.normal(kx, (BATCH, DIM), jnp.float64)
    # log-det includes the reference's +1e-4 floor (nf/flows_1.py:59), so
    # compare against the floored analytic value, not raw autodiff.
    y, ld = bij.forward(params, x)
    assert y.shape == x.shape and ld.shape == (BATCH,)

    def single(xi):
        yy, _ = bij.forward(params, xi[None])
        return yy[0]

    jac = jax.vmap(jax.jacfwd(single))(x)
    _, expected = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(np.asarray(ld), expected, atol=1e-3)
    with pytest.raises(NotImplementedError):
        bij.inverse(params, y)


def test_chain_and_repeat_equivalence():
    """Repeat(b, n) must equal Chain of the same layers with the same params."""
    base = AffineCoupling(DIM, hidden_dim=8)
    rep = Repeat(base, 3)
    key = jax.random.PRNGKey(11)
    rp = jax.tree.map(lambda a: a.astype(jnp.float64), rep.init(key))
    x = jax.random.normal(jax.random.PRNGKey(12), (BATCH, DIM), jnp.float64)

    y_rep, ld_rep = rep.forward(rp, x)
    # unstack into per-layer params and run sequentially
    cur, ld_seq = x, jnp.zeros(BATCH, dtype=jnp.float64)
    for i in range(3):
        layer = jax.tree.map(lambda a: a[i], rp)
        cur, ld = base.forward(layer, cur)
        ld_seq = ld_seq + ld
    np.testing.assert_allclose(np.asarray(y_rep), np.asarray(cur), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ld_rep), np.asarray(ld_seq),
                               atol=1e-12)

    x2, ld_i = rep.inverse(rp, y_rep)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ld_rep + ld_i), 0.0, atol=1e-9)


def test_chain_roundtrip_heterogeneous():
    chain = Chain([
        ActNorm(DIM),
        AffineCoupling(DIM, hidden_dim=8),
        InvertibleLinear(DIM),
        SplineAR(DIM, num_bins=4, tail_bound=4.0, hidden_dim=8),
    ])
    params, x = _roundtrip(chain, 13, atol=1e-8)
    _check_logdet(chain, params, x, atol=1e-8)


def test_jit_and_grad_compatible():
    bij = SplineAR(4, num_bins=4, tail_bound=3.0, hidden_dim=8)
    params = bij.init(jax.random.PRNGKey(14))
    x = jax.random.normal(jax.random.PRNGKey(15), (5, 4))

    @jax.jit
    def loss(p, x):
        z, ld = bij.forward(p, x)
        return jnp.mean(jnp.sum(z**2, axis=1) - ld)

    g = jax.grad(loss)(params, x)
    flat, _ = jax.tree.flatten(g)
    assert all(np.all(np.isfinite(np.asarray(a))) for a in flat)


def test_affine_coupling_s_cap_roundtrip_and_bound():
    """s_cap soft clamp: still an exact bijection, log-det bounded by
    s_cap * dim, and near-identical to the unclamped layer when s is
    small (the reference-parity regime)."""
    key = jax.random.PRNGKey(11)
    bij = AffineCoupling(DIM, hidden_dim=16, s_cap=2.0)
    params = bij.init(key)
    x = jax.random.normal(jax.random.PRNGKey(12), (7, DIM))
    z, ld = bij.forward(params, x)
    x2, ld_inv = bij.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv),
                               atol=1e-5)
    assert np.all(np.abs(np.asarray(ld)) <= 2.0 * DIM + 1e-6)
    # small-s regime: clamped ~= unclamped (init-scale s ~ 0.35, where
    # 2 tanh(s/2) deviates from s by ~1.5e-3 relative -> percent-level z)
    bij0 = AffineCoupling(DIM, hidden_dim=16)
    z0, ld0 = bij0.forward(params, x)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z0), rtol=0.03,
                               atol=0.03)


def test_deep_wide_realnvp_stack_finite_with_s_cap():
    """A 10-layer clamped stack keeps finite densities for 3-sigma data --
    the Polymer_rnvp stability regime (r5: unclamped diverged)."""
    from normalizingflow_tpu.bijectors import Chain

    dim = 32
    layers = [AffineCoupling(dim, hidden_dim=64, s_cap=2.0)
              for _ in range(10)]
    chain = Chain(layers)
    params = chain.init(jax.random.PRNGKey(13))
    x = 3.0 * jax.random.normal(jax.random.PRNGKey(14), (16, dim))
    z, ld = chain.forward(params, x)
    assert np.all(np.isfinite(np.asarray(z)))
    assert np.all(np.abs(np.asarray(ld)) <= 10 * 2.0 * dim)
