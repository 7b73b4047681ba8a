"""Effective sample size (ESS) and potential scale reduction (R-hat).

No reference counterpart (the reference monitors only raw HMC acceptance,
SURVEY.md §4); these are the standard multi-chain diagnostics (Vehtari et al.
2021 / Stan) needed for the BASELINE ESS/s benchmark. FFT autocovariance +
Geyer initial-monotone-sequence truncation, fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _autocovariance_fft(x):
    """Per-chain autocovariance via FFT. x: (draws, chains) -> (draws, chains)."""
    n = x.shape[0]
    x = x - jnp.mean(x, axis=0, keepdims=True)
    m = 2 * n  # zero-padding (next pow2 not required for correctness)
    f = jnp.fft.rfft(x, n=m, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=m, axis=0)[:n]
    return acov / n


def effective_sample_size(x):
    """ESS of (draws, chains) scalar chains (one parameter).

    Uses the rank-normalized-free classic estimator: pooled autocorrelation
    rho_t = 1 - (W - mean_chain_acov_t) / var_plus, summed over Geyer initial
    positive pairs.
    """
    n, m = x.shape
    acov = _autocovariance_fft(x)              # (n, m)
    chain_var = acov[0] * n / (n - 1.0)        # (m,)
    w = jnp.mean(chain_var)
    mean_acov = jnp.mean(acov, axis=1)         # (n,)
    if m > 1:
        b_over_n = jnp.var(jnp.mean(x, axis=0), ddof=1)
        var_plus = w * (n - 1.0) / n + b_over_n
    else:
        var_plus = w * (n - 1.0) / n
    rho = 1.0 - (w - mean_acov) / var_plus     # (n,)

    # Geyer: sum consecutive pairs while positive (monotone estimator).
    n_pairs = n // 2
    pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2).sum(axis=1)
    pairs_min = jax.lax.associative_scan(jnp.minimum, pairs)  # monotone
    positive = pairs_min > 0.0
    tau = -1.0 + 2.0 * jnp.sum(jnp.where(positive, pairs_min, 0.0))
    tau = jnp.maximum(tau, 1e-8)
    return jnp.minimum(n * m / tau, n * m * 1.0)


def _split_chains(x):
    """Split every chain in half: (n, m) -> (n//2, 2m) (Vehtari et al. 2021
    sec. 3.1 / Stan). Within-run trends then show up as between-chain
    variance, deflating ESS -- unsplit ESS overstates mixing for chains that
    drift over the run. Drops the last draw when n is odd."""
    n, m = x.shape
    half = n // 2
    return jnp.concatenate([x[:half], x[half : 2 * half]], axis=1)


def _rank_normalize(x):
    """Fractional-rank normal transform of pooled draws (Vehtari et al. 2021
    eq. 14): rank over ALL chains' draws, map rank r -> Phi^-1((r - 3/8) /
    (S + 1/4)). Makes ESS invariant to monotone transforms -- in particular
    robust for heavy-tailed functionals (x^2 of wide funnel coordinates),
    where the raw autocovariance estimator is dominated by a handful of
    extreme draws. x: (draws, chains).

    Ranks are scattered as exact int32 and the ndtri argument is computed in
    f64 when enabled (tests) else f32: storing ranks in the SAMPLE dtype
    would lose integer exactness above 2^24 pooled draws for f32 inputs
    (ADVICE r2). At S > 2^24 under f32 the (r - 3/8)/(S + 1/4) quotient
    itself quantizes adjacent ranks (1/S < eps) -- inherent to f32
    probabilities, statistically negligible for ESS."""
    n, m = x.shape
    flat = x.reshape(-1)
    ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    order = jnp.argsort(flat)
    ranks = jnp.zeros(flat.shape, jnp.int32).at[order].set(
        jnp.arange(1, flat.size + 1, dtype=jnp.int32)
    )
    from jax.scipy.special import ndtri

    z = ndtri((ranks.astype(ftype) - 0.375) / (flat.size + 0.25))
    return z.reshape(n, m).astype(x.dtype)


def bulk_ess(x):
    """Stan's SPLIT rank-normalized bulk ESS of one parameter,
    x: (draws, chains).

    Chains are split in half first (the split-R-hat convention the
    Stan/arviz ESS definition includes), then rank-normalized over the pool.
    Continuous chains have measure-zero ties, so argsort ranks equal
    fractional ranks almost surely."""
    return effective_sample_size(_rank_normalize(_split_chains(x)))


def tail_ess(x):
    """Stan's tail ESS: min SPLIT-chain ESS of the 5% / 95% quantile
    indicator chains -- sensitivity of tail estimates to poor tail mixing.
    Rank-normalizing a binary chain with average-tie ranks is an affine map,
    and ESS is affine-invariant, so the indicator ESS is computed directly
    (argsort ranks would break the massive ties arbitrarily and inflate
    ESS)."""
    q05 = jnp.quantile(x, 0.05)
    q95 = jnp.quantile(x, 0.95)
    e05 = effective_sample_size(_split_chains((x <= q05).astype(x.dtype)))
    e95 = effective_sample_size(_split_chains((x <= q95).astype(x.dtype)))
    return jnp.minimum(e05, e95)


def bulk_ess_per_dim(samples, dim_chunk=4):
    """samples: (draws, chains, dim) -> (dim,) rank-normalized bulk ESS."""
    dim = samples.shape[-1]
    dim_chunk = min(dim_chunk, dim)
    pad = (-dim) % dim_chunk
    idx = jnp.concatenate([jnp.arange(dim), jnp.zeros(pad, jnp.int32)])
    f = lambda d: bulk_ess(samples[:, :, d])
    out = jax.lax.map(jax.vmap(f), idx.reshape(-1, dim_chunk)).reshape(-1)
    return out[:dim]


def ess_per_dim(samples, dim_chunk=8):
    """samples: (draws, chains, dim) -> (dim,) ESS per coordinate.

    The FFT autocovariance materializes complex buffers of the full sample
    block; vmapping it over every coordinate at once OOMs at large
    chains*draws (e.g. 16k chains x 512 draws on a 16 GB chip), so map in
    chunks of `dim_chunk` coordinates instead -- peak memory scales with
    draws*chains*dim_chunk, not draws*chains*dim.
    """
    dim = samples.shape[-1]
    dim_chunk = min(dim_chunk, dim)
    pad = (-dim) % dim_chunk
    idx = jnp.concatenate([jnp.arange(dim), jnp.zeros(pad, jnp.int32)])
    f = lambda d: effective_sample_size(samples[:, :, d])
    out = jax.lax.map(jax.vmap(f), idx.reshape(-1, dim_chunk)).reshape(-1)
    return out[:dim]


def min_ess(samples):
    return jnp.min(ess_per_dim(samples))


def potential_scale_reduction(samples):
    """Split R-hat per dimension. samples: (draws, chains, dim) -> (dim,)."""
    n, m, dim = samples.shape
    half = n // 2
    x = jnp.concatenate(
        [samples[:half], samples[half : 2 * half]], axis=1
    )  # (half, 2m, dim)
    chain_mean = jnp.mean(x, axis=0)
    chain_var = jnp.var(x, axis=0, ddof=1)
    w = jnp.mean(chain_var, axis=0)
    b = half * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (half - 1.0) / half * w + b / half
    return jnp.sqrt(var_plus / w)
