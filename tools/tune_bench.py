"""Sweep the headline-bench design space on the real TPU.

Usage: python tools/tune_bench.py [layers...] -- trains one RealNVP per
layer count on the 64-d funnel (reusing bench.train), then for each
(leapfrog, target_accept) runs NeuTra HMC and reports the headline metric
(min rank-normalized bulk ESS over x and x^2, per second). Prints one
markdown table row per point; pick the winner for bench.py's constants.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp

import bench
from normalizingflow_tpu.estimators.ess import bulk_ess_per_dim, ess_per_dim
from normalizingflow_tpu.mcmc import run_hmc
from normalizingflow_tpu.mcmc.neutra import pullback_logprob
from normalizingflow_tpu.targets import NealsFunnel

CHAINS = bench.CHAINS
DRAWS = bench.DRAWS


def sample_point(flow, params, target, leapfrog, target_accept=0.8):
    logprob = pullback_logprob(flow, params, target)
    z0 = flow.prior.sample(jax.random.PRNGKey(1), CHAINS)
    adapt = run_hmc(
        jax.random.PRNGKey(2), logprob, z0, num_samples=2,
        num_warmup=bench.WARMUP, step_size=0.5, num_leapfrog=leapfrog,
        target_accept=target_accept,
    )
    jax.block_until_ready(adapt.samples)

    @jax.jit
    def sample_and_push(seed, pos):
        res = run_hmc(
            jax.random.PRNGKey(seed), logprob, pos,
            num_samples=DRAWS, num_warmup=0,
            step_size=float(adapt.step_size),
            inv_mass_diag=adapt.inv_mass_diag, num_leapfrog=leapfrog,
        )
        x, _ = flow.inverse(params, res.samples.reshape(-1, target.dim))
        return (x.reshape(res.samples.shape), res.accept_rate,
                jnp.sum(x[-1]))

    pos = adapt.final_state.position
    float(sample_and_push(3, pos)[2])
    t0 = time.time()
    xs, acc, chk = sample_and_push(4, pos)
    float(chk)
    t = time.time() - t0

    bx = bulk_ess_per_dim(xs)
    bx2 = bulk_ess_per_dim(xs * xs)
    rx = ess_per_dim(xs)
    rx2 = ess_per_dim(xs * xs)
    ess_min = float(jnp.minimum(jnp.min(bx), jnp.min(bx2)))
    return {
        "t": t,
        "acc": float(acc),
        "bulk_min": ess_min,
        "bulk_x": float(jnp.min(bx)),
        "bulk_x2": float(jnp.min(bx2)),
        "raw_x": float(jnp.min(rx)),
        "raw_x2": float(jnp.min(rx2)),
        "v_var": float(jnp.var(xs[..., 0])),
        "ess_per_s": ess_min / t,
    }


def main():
    layer_list = [int(a) for a in sys.argv[1:]] or [2, 4, 6]
    target = NealsFunnel(bench.DIM)
    print("| layers | L | acc | t(s) | bulk_x | bulk_x2 | raw_x | raw_x2 "
          "| v_var | ESS/s |", flush=True)
    print("|---|---|---|---|---|---|---|---|---|---|", flush=True)
    for layers in layer_list:
        flow = bench.build_flow(layers=layers)
        t0 = time.time()
        params, kl = bench.train(flow, target, jax.random.PRNGKey(0))
        print(f"trained layers={layers} in {time.time()-t0:.0f}s "
              f"kl={kl:.4f}", file=sys.stderr, flush=True)
        for leapfrog in (4, 8, 16):
            r = sample_point(flow, params, target, leapfrog)
            print(f"| {layers} | {leapfrog} | {r['acc']:.2f} | {r['t']:.2f} "
                  f"| {r['bulk_x']:.0f} | {r['bulk_x2']:.0f} "
                  f"| {r['raw_x']:.0f} | {r['raw_x2']:.0f} "
                  f"| {r['v_var']:.2f} | {r['ess_per_s']:.0f} |",
                  flush=True)


if __name__ == "__main__":
    main()
