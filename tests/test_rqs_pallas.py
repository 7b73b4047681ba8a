"""Fused Pallas RQS kernel vs the reference jnp implementation.

Runs in interpreter mode on CPU (tests/conftest.py forces the CPU backend);
the same kernel compiles with Mosaic on TPU (exercised by bench/TPU smoke).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normalizingflow_tpu.bijectors.rqs import unconstrained_rqs
from normalizingflow_tpu.ops.rqs_pallas import unconstrained_rqs_fused

K = 8
B = 3.0


def _params(key, shape, dtype=jnp.float32):
    kw, kh, kd = jax.random.split(key, 3)
    return (
        jax.random.normal(kw, shape + (K,), dtype),
        jax.random.normal(kh, shape + (K,), dtype),
        jax.random.normal(kd, shape + (K - 1,), dtype),
    )


@pytest.mark.parametrize("inverse", [False, True])
def test_fused_matches_reference(inverse):
    key = jax.random.PRNGKey(0)
    x = jnp.linspace(-4.0, 4.0, 700, dtype=jnp.float32)  # interior + tails
    w, h, d = _params(key, x.shape)
    y_ref, ld_ref = unconstrained_rqs(x, w, h, d, inverse=inverse,
                                      tail_bound=B)
    y_f, ld_f = unconstrained_rqs_fused(
        x, w, h, d, inverse, -B, B, -B, B, True
    )
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f), np.asarray(ld_ref),
                               atol=2e-4, rtol=1e-4)


def test_fused_batched_shape():
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(jax.random.PRNGKey(2), (16, 6), jnp.float32,
                           -2.5, 2.5)
    w, h, d = _params(key, x.shape)
    y, ld = unconstrained_rqs_fused(x, w, h, d, False, -B, B, -B, B, True)
    assert y.shape == x.shape and ld.shape == x.shape
    y_ref, ld_ref = unconstrained_rqs(x, w, h, d, inverse=False,
                                      tail_bound=B)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


def test_fused_roundtrip():
    key = jax.random.PRNGKey(3)
    x = jnp.linspace(-2.9, 2.9, 600, dtype=jnp.float32)
    w, h, d = _params(key, x.shape)
    y, ld = unconstrained_rqs_fused(x, w, h, d, False, -B, B, -B, B, True)
    x2, ld2 = unconstrained_rqs_fused(y, w, h, d, True, -B, B, -B, B, True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=5e-5)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=5e-4)


def test_fused_gradients_match_reference():
    """custom_vjp backward must equal autodiff of the jnp implementation."""
    key = jax.random.PRNGKey(4)
    x = jnp.linspace(-2.5, 2.5, 550, dtype=jnp.float32)
    w, h, d = _params(key, x.shape)

    def loss_fused(x, w, h, d):
        y, ld = unconstrained_rqs_fused(x, w, h, d, False, -B, B, -B, B,
                                        True)
        return jnp.sum(y * y) + jnp.sum(ld)

    def loss_ref(x, w, h, d):
        y, ld = unconstrained_rqs(x, w, h, d, inverse=False, tail_bound=B)
        return jnp.sum(y * y) + jnp.sum(ld)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, h, d)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, h, d)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-4)


def test_under_vmap_detection():
    """apply_rqs must not route vmap-traced inputs to the Pallas kernel:
    vmap of the pallas_call prepends a block-size-1 grid dim that violates
    the TPU (8, 128) tiling rule (seen live via vmapped flow.log_prob in
    integrate_out_v). _under_vmap is the guard."""
    from normalizingflow_tpu.bijectors.rqs import _under_vmap

    x = jnp.linspace(-1.0, 1.0, 16, dtype=jnp.float32)
    assert not _under_vmap(x)

    seen = []

    def f(row):
        seen.append(_under_vmap(row))
        return row * 2.0

    jax.vmap(f)(x.reshape(4, 4))
    assert seen == [True]


def test_apply_rqs_under_vmap_matches_direct():
    """vmapping apply_rqs over a leading batch equals the flat call."""
    from normalizingflow_tpu.bijectors.rqs import apply_rqs

    key = jax.random.PRNGKey(5)
    x = jax.random.uniform(key, (6, 128), jnp.float32, -2.5, 2.5)
    w, h, d = _params(jax.random.PRNGKey(6), x.shape)
    y_flat, ld_flat = apply_rqs(x, w, h, d, tail_bound=B)
    y_v, ld_v = jax.vmap(
        lambda xi, wi, hi, di: apply_rqs(xi, wi, hi, di, tail_bound=B)
    )(x, w, h, d)
    np.testing.assert_allclose(np.asarray(y_v), np.asarray(y_flat),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_v), np.asarray(ld_flat),
                               atol=1e-6)
