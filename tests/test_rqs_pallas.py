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


def test_fused_vmap_rule_matches_reference():
    """vmap of the fused kernel must route through its custom_batching rule
    (batch dims collapsed into rows -- vmapping the raw pallas_call would
    prepend an illegal block-size-1 grid dim on TPU) and match the jnp
    reference. Replaces round-2's BatchTracer introspection (_under_vmap),
    VERDICT r2 item 8."""
    from normalizingflow_tpu.bijectors.rqs import unconstrained_rqs

    key = jax.random.PRNGKey(11)
    x = jax.random.uniform(key, (6, 64), jnp.float32, -2.5 * B, 2.5 * B)
    w, h, d = _params(jax.random.PRNGKey(12), x.shape)

    fused_row = lambda xi, wi, hi, di: unconstrained_rqs_fused(
        xi, wi, hi, di, False, -B, B, -B, B, True
    )
    y_v, ld_v = jax.vmap(fused_row)(x, w, h, d)
    y_r, ld_r = unconstrained_rqs(x, w, h, d, tail_bound=B)
    np.testing.assert_allclose(np.asarray(y_v), np.asarray(y_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_v), np.asarray(ld_r), atol=3e-4)

    # unbatched params (broadcast case of the rule)
    y_b, _ = jax.vmap(fused_row, in_axes=(0, None, None, None))(
        x, w[0], h[0], d[0]
    )
    y_rb, _ = unconstrained_rqs(
        x, jnp.broadcast_to(w[0], w.shape), jnp.broadcast_to(h[0], h.shape),
        jnp.broadcast_to(d[0], d.shape), tail_bound=B,
    )
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_rb), atol=1e-5)

    # nested vmap
    y_n, _ = jax.vmap(jax.vmap(fused_row))(
        x.reshape(2, 3, 64), w.reshape(2, 3, 64, -1),
        h.reshape(2, 3, 64, -1), d.reshape(2, 3, 64, -1),
    )
    np.testing.assert_allclose(
        np.asarray(y_n.reshape(6, 64)), np.asarray(y_r), atol=1e-5
    )


def test_fused_grad_of_vmap_matches_reference():
    """Training-path composition: grad THROUGH a vmapped fused call. The
    custom_vjp boundary keeps autodiff off the custom_vmap rule (fwd
    re-enters the rule; bwd autodiffs the jnp reference)."""
    from normalizingflow_tpu.bijectors.rqs import unconstrained_rqs

    key = jax.random.PRNGKey(13)
    x = jax.random.uniform(key, (4, 32), jnp.float32, -1.5 * B, 1.5 * B)
    w, h, d = _params(jax.random.PRNGKey(14), x.shape)

    def loss_fused(w, h, d):
        y, ld = jax.vmap(
            lambda xi, wi, hi, di: unconstrained_rqs_fused(
                xi, wi, hi, di, False, -B, B, -B, B, True
            )
        )(x, w, h, d)
        return jnp.sum(y * y) + jnp.sum(ld)

    def loss_ref(w, h, d):
        y, ld = unconstrained_rqs(x, w, h, d, tail_bound=B)
        return jnp.sum(y * y) + jnp.sum(ld)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(w, h, d)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(w, h, d)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-4)


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
