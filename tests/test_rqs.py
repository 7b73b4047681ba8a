"""RQS spline unit tests: round-trip, autodiff log-det, tails, monotonicity.

Mirrors the verification strategy planned in SURVEY.md §4: bijection
round-trip at float64 tolerance and log-det checked against the exact autodiff
derivative.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normalizingflow_tpu.bijectors.rqs import unconstrained_rqs

K = 8
B = 3.0


def _params(key, shape):
    kw, kh, kd = jax.random.split(key, 3)
    w = jax.random.normal(kw, shape + (K,))
    h = jax.random.normal(kh, shape + (K,))
    d = jax.random.normal(kd, shape + (K - 1,))
    return w, h, d


def test_round_trip_inside_and_outside():
    key = jax.random.PRNGKey(0)
    x = jnp.linspace(-5.0, 5.0, 101)  # spans tails and interior
    w, h, d = _params(key, x.shape)
    y, ld = unconstrained_rqs(x, w, h, d, inverse=False, tail_bound=B)
    x2, ld2 = unconstrained_rqs(y, w, h, d, inverse=True, tail_bound=B)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-10)


def test_logdet_matches_autodiff():
    key = jax.random.PRNGKey(1)
    x = jnp.linspace(-2.9, 2.9, 31)
    w, h, d = _params(key, x.shape)

    def f_scalar(xi, wi, hi, di):
        y, _ = unconstrained_rqs(xi[None], wi[None], hi[None], di[None],
                                 inverse=False, tail_bound=B)
        return y[0]

    grads = jax.vmap(jax.grad(f_scalar))(x, w, h, d)
    _, ld = unconstrained_rqs(x, w, h, d, inverse=False, tail_bound=B)
    np.testing.assert_allclose(np.asarray(ld), np.log(np.abs(grads)),
                               atol=1e-10)


def test_identity_tails():
    key = jax.random.PRNGKey(2)
    x = jnp.array([-4.0, -3.5, 3.5, 10.0])
    w, h, d = _params(key, x.shape)
    y, ld = unconstrained_rqs(x, w, h, d, inverse=False, tail_bound=B)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(np.asarray(ld), 0.0)


def test_monotone_increasing():
    key = jax.random.PRNGKey(3)
    x = jnp.linspace(-B, B, 513)
    w, h, d = _params(key, ())
    wb = jnp.broadcast_to(w, x.shape + (K,))
    hb = jnp.broadcast_to(h, x.shape + (K,))
    db = jnp.broadcast_to(d, x.shape + (K - 1,))
    y, _ = unconstrained_rqs(x, wb, hb, db, inverse=False, tail_bound=B)
    assert np.all(np.diff(np.asarray(y)) > 0)


def test_boundary_maps_to_boundary():
    key = jax.random.PRNGKey(4)
    x = jnp.array([-B, B])
    w, h, d = _params(key, x.shape)
    y, _ = unconstrained_rqs(x, w, h, d, inverse=False, tail_bound=B)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-12)


def test_asymmetric_domains():
    key = jax.random.PRNGKey(5)
    x = jnp.linspace(-1.0, 2.0, 41)
    w, h, d = _params(key, x.shape)
    y, ld = unconstrained_rqs(
        x, w, h, d, inverse=False, left=-1.0, right=2.0, bottom=0.0, top=5.0
    )
    assert np.all(np.asarray(y) >= 0.0 - 1e-12)
    assert np.all(np.asarray(y) <= 5.0 + 1e-12)
    x2, ld2 = unconstrained_rqs(
        y, w, h, d, inverse=True, left=-1.0, right=2.0, bottom=0.0, top=5.0
    )
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-10)


def test_float32_accuracy():
    """Spline math must stay usable in fp32 (TPU default)."""
    key = jax.random.PRNGKey(6)
    x64 = jnp.linspace(-2.5, 2.5, 64)
    w, h, d = _params(key, x64.shape)
    y64, ld64 = unconstrained_rqs(x64, w, h, d, inverse=False, tail_bound=B)
    f32 = lambda a: a.astype(jnp.float32)
    y32, ld32 = unconstrained_rqs(f32(x64), f32(w), f32(h), f32(d),
                                  inverse=False, tail_bound=B)
    np.testing.assert_allclose(np.asarray(y32), np.asarray(y64),
                               atol=5e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld32), np.asarray(ld64),
                               atol=5e-4, rtol=1e-4)
