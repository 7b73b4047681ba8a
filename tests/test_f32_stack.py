"""At-scale float32 accuracy of the full NSF_AR stack (TPU default dtype).

VERDICT r1 (weak #5): the fp32/bf16 hazards are guarded only by a 64-point
spline-math test. This exercises the production Fe-shaped configuration --
Chain of 2 SplineAR layers, dim 162 (54 particles x 3), 32 spline bins,
hidden 354, periodic trig features, tail bound ~4.37 -- end-to-end in f32:
forward/inverse round-trip drift and log-det agreement against the same
parameters promoted to f64 (reference semantics: /root/reference/nf/
flows.py:152-209 + nf/utils.py:20-152, which run in torch f32 by default).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normalizingflow_tpu.bijectors import Chain, SplineAR

DIM = 162          # Fe config: 54 particles * 3
BINS = 32
HIDDEN = 354
TAIL = 3.0 * 2.9115 / 2.0   # Fe_400K box half-length
BATCH = 256


def _cast(tree, dtype):
    return jax.tree.map(lambda a: a.astype(dtype), tree)


@pytest.fixture(scope="module")
def stack():
    chain = Chain([
        SplineAR(DIM, num_bins=BINS, tail_bound=TAIL, hidden_dim=HIDDEN,
                 periodic=True)
        for _ in range(2)
    ])
    params = chain.init(jax.random.PRNGKey(0))          # f32 leaves
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (BATCH, DIM), jnp.float32,
        -0.95 * TAIL, 0.95 * TAIL,
    )
    return chain, params, x


def test_f32_roundtrip_at_scale(stack):
    chain, params, x = stack
    z, ld = jax.jit(chain.forward)(params, x)
    assert z.dtype == jnp.float32 and ld.dtype == jnp.float32
    x_back, ld_inv = jax.jit(chain.inverse)(params, z)
    # Round-trip drift through 2 layers x 162 sequential spline inversions.
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                               atol=5e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(ld + ld_inv),
                               np.zeros(BATCH), atol=5e-3)


def test_f32_matches_f64_at_scale(stack):
    chain, params, x = stack
    z32, ld32 = jax.jit(chain.forward)(params, x)
    p64, x64 = _cast(params, jnp.float64), x.astype(jnp.float64)
    z64, ld64 = jax.jit(chain.forward)(p64, x64)
    # Coordinates: absolute error on a ~[-4.4, 4.4] domain.
    np.testing.assert_allclose(np.asarray(z32), np.asarray(z64),
                               atol=2e-3, rtol=0)
    # Per-sample log-det sums ~324 spline terms; f32 noise accumulates
    # as sqrt(n) * per-term rounding.
    np.testing.assert_allclose(np.asarray(ld32), np.asarray(ld64),
                               atol=2e-2, rtol=1e-4)


def test_f32_inverse_matches_f64_at_scale(stack):
    chain, params, x = stack
    z = x  # any in-domain point works as a latent
    x32, ld32 = jax.jit(chain.inverse)(params, z)
    p64 = _cast(params, jnp.float64)
    x64, ld64 = jax.jit(chain.inverse)(p64, z.astype(jnp.float64))
    # The sequential AR inverse feeds dim i's f32 output into dim i+1's
    # conditioner: error can compound along the 162-dim scan.
    np.testing.assert_allclose(np.asarray(x32), np.asarray(x64),
                               atol=5e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(ld32), np.asarray(ld64),
                               atol=5e-2, rtol=1e-4)
