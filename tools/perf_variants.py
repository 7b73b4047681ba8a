"""Perf-variant experiments behind PERF.md's "both no-ops" table
(VERDICT r2 item 7: the claims must be reproducible, not prose).

Measures the bench flow's fwd+logdet device latency (slope method,
tools/mfu.py) for three mathematically-identical-or-equivalent variants:

  baseline   the shipped bijectors (12 independent GEMMs for 2 coupling
             layers: 4 conditioner MLPs x 3 linear layers)
  fused_ts   per coupling sub-step, the t and s conditioners share inputs,
             so their weights concatenate along the OUTPUT axis: 6 GEMMs
             of doubled N, identical math (outputs split back)
  bf16       weights + activations in bfloat16 (log-det accumulated f32)

PERF.md's roofline argues neither variant can win: the MXU fill is set by
the K=32 contraction of the first GEMM and N=64 of the last, which neither
fusing (changes N of the middle GEMMs only) nor bf16 (MXU already runs
bf16 passes for f32 inputs) changes.

Usage (TPU): python -m tools.perf_variants
Prints one JSON line per variant plus a correctness check vs baseline.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import CHAINS, DIM, build_flow  # noqa: E402
from tools.mfu import slope_time  # noqa: E402


def fused_coupling_forward(p, x, half):
    """AffineCoupling.forward with t/s conditioner pairs fused into single
    GEMMs (weights concatenated along the output axis). Identical math to
    bijectors/coupling.py:AffineCoupling.forward."""

    def fused_pair(pt, ps, inp, out_dim):
        w1 = jnp.concatenate([pt["w1"], ps["w1"]], axis=1)
        b1 = jnp.concatenate([pt["b1"], ps["b1"]])
        w2 = jax.scipy.linalg.block_diag(pt["w2"], ps["w2"])
        b2 = jnp.concatenate([pt["b2"], ps["b2"]])
        w3 = jax.scipy.linalg.block_diag(pt["w3"], ps["w3"])
        b3 = jnp.concatenate([pt["b3"], ps["b3"]])
        h = jnp.tanh(inp @ w1 + b1)
        h = jnp.tanh(h @ w2 + b2)
        out = h @ w3 + b3
        return out[:, :out_dim], out[:, out_dim:]

    lower, upper = x[:, :half], x[:, half:]
    t1, s1 = fused_pair(p["t1"], p["s1"], lower, x.shape[1] - half)
    upper = t1 + upper * jnp.exp(s1)
    t2, s2 = fused_pair(p["t2"], p["s2"], upper, half)
    lower = t2 + lower * jnp.exp(s2)
    z = jnp.concatenate([lower, upper], axis=1)
    return z, jnp.sum(s1, axis=1) + jnp.sum(s2, axis=1)


def make_forwards(flow, params):
    half = DIM // 2

    def baseline(x):
        return flow.forward(params, x)

    def fused(x):
        z, ld = flow.bijector.bijectors[0].forward(params[0], x)
        for p in params[1:]:
            z, l2 = fused_coupling_forward(p, z, half)
            ld = ld + l2
        plp = flow.prior.log_prob(z)
        return z, plp, ld

    params_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )

    def bf16(x):
        z, plp, ld = flow.forward(params_bf16, x.astype(jnp.bfloat16))
        return (z.astype(jnp.float32), plp.astype(jnp.float32),
                ld.astype(jnp.float32))

    return {"baseline": baseline, "fused_ts": fused, "bf16": bf16}


def main():
    flow = build_flow()
    params = flow.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(5), (CHAINS, DIM))
    fwds = make_forwards(flow, params)

    z0, plp0, ld0 = jax.jit(fwds["baseline"])(x)
    for name, fwd in fwds.items():
        z, plp, ld = jax.jit(fwd)(x)
        max_dz = float(jnp.max(jnp.abs(z.astype(jnp.float32) - z0)))
        tol = 0.2 if name == "bf16" else 1e-4
        assert max_dz < tol, (name, max_dz)

        def step(carry, fwd=fwd):
            xx, acc = carry
            z, plp, ld = fwd(xx)
            return z.astype(xx.dtype), acc + jnp.sum(
                plp.astype(jnp.float32) + ld.astype(jnp.float32)
            )

        sec = slope_time(step, (x, jnp.zeros(())))
        print(json.dumps({
            "variant": name,
            "fwd_logdet_us": round(sec * 1e6, 2),
            "max_abs_dz_vs_baseline": round(max_dz, 6),
        }), flush=True)


if __name__ == "__main__":
    main()
