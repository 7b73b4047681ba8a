"""Fused HMC accept/select kernel (ops/hmc_pallas.py): the Pallas path must
match the jnp reference elementwise (including divergent/NaN proposals), and
the batched HMC kernel must reproduce vmap(hmc_kernel) exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from normalizingflow_tpu.mcmc.hmc import (
    HMCState,
    hmc_init,
    hmc_kernel,
    hmc_kernel_batched,
)
from normalizingflow_tpu.ops.hmc_pallas import (
    _accept_select_pallas,
    _accept_select_ref,
)


def _random_inputs(key, n, d, dtype=jnp.float32, nan_rows=True):
    ks = jax.random.split(key, 10)
    q = jax.random.normal(ks[0], (n, d), dtype)
    p = jax.random.normal(ks[1], (n, d), dtype)
    g_new = jax.random.normal(ks[2], (n, d), dtype)
    pos_old = jax.random.normal(ks[3], (n, d), dtype)
    g_old = jax.random.normal(ks[4], (n, d), dtype)
    lp_new = jax.random.normal(ks[5], (n,), dtype)
    lp_old = jax.random.normal(ks[6], (n,), dtype)
    h_old = jax.random.normal(ks[7], (n,), dtype)
    log_u = jnp.log(jax.random.uniform(ks[8], (n,), dtype))
    inv_m = jnp.exp(0.3 * jax.random.normal(ks[9], (d,), dtype))
    if nan_rows:
        # divergent proposals: NaN log-prob and NaN positions must be
        # rejected with accept_prob 0 and the old state carried through
        lp_new = lp_new.at[::7].set(jnp.nan)
        q = q.at[1::7].set(jnp.nan)
        p = p.at[1::7, 0].set(jnp.inf)
    return q, p, g_new, pos_old, g_old, lp_new, lp_old, h_old, log_u, inv_m


def test_pallas_accept_select_matches_reference():
    for n, d in [(96, 6), (1024 + 32, 64)]:  # partial tail block too
        args = _random_inputs(jax.random.PRNGKey(n + d), n, d)
        ref = _accept_select_ref(*args)
        pal = _accept_select_pallas(*args, interpret=True)
        # selects and the accept decision are comparisons/copies -> exact;
        # accept_prob/d_energy involve exp/reductions -> 1-ULP slack
        for i, name in enumerate(("pos", "lp", "grad", "accepted")):
            idx = i if i < 3 else 4
            np.testing.assert_array_equal(
                np.asarray(ref[idx]), np.asarray(pal[idx]), err_msg=name)
        np.testing.assert_allclose(np.asarray(ref[3]), np.asarray(pal[3]),
                                   rtol=2e-6, atol=0, err_msg="accept_prob")
        np.testing.assert_allclose(np.asarray(ref[5]), np.asarray(pal[5]),
                                   rtol=2e-6, atol=1e-6, err_msg="d_energy")


def test_batched_kernel_matches_vmapped_single():
    dim, chains = 5, 64

    def logprob(x):
        return -0.5 * jnp.sum(x * x) - 0.1 * jnp.sum(x**4)

    key = jax.random.PRNGKey(3)
    k_init, k_run = jax.random.split(key)
    pos = jax.random.normal(k_init, (chains, dim), jnp.float32)
    state = jax.vmap(lambda q: hmc_init(logprob, q))(pos)
    keys = jax.random.split(k_run, chains)

    single = hmc_kernel(logprob, 0.2, 8, jnp.ones(dim, jnp.float32))
    st_v, info_v = jax.vmap(single)(keys, state)
    batched = hmc_kernel_batched(logprob, 0.2, 8, jnp.ones(dim, jnp.float32))
    st_b, info_b = batched(keys, state)

    assert bool(jnp.any(info_v.accepted)) and not bool(
        jnp.all(info_v.accepted))  # mixed accept/reject exercised
    np.testing.assert_allclose(np.asarray(st_b.position),
                               np.asarray(st_v.position), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(st_b.log_prob),
                               np.asarray(st_v.log_prob), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(st_b.grad),
                               np.asarray(st_v.grad), rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(info_b.accepted),
                                  np.asarray(info_v.accepted))
    np.testing.assert_allclose(np.asarray(info_b.accept_prob),
                               np.asarray(info_v.accept_prob),
                               rtol=0, atol=0)
