"""Speed-of-light / MFU measurement for the flow hot paths on one TPU chip.

BASELINE.md demands "Flow forward + log-det latency: µs/step at
speed-of-light per chip (measure & report)". This tool measures, per hot op:

  * device time per application via the SLOPE method: time one jitted call
    containing N1=512 chained applications and one with N2=1024 (both in
    XLA's rolled-loop regime, CLAUDE.md), and report
    (t(N2)-t(N1))/(N2-N1). The axon relay has a ~25 ms fixed cost per
    dispatched call (polling quantum), so single-call or small-N timings
    are inflated ~10x; the slope cancels every fixed cost. Each rep feeds a
    perturbed input so no result cache can short-circuit execution.
  * FLOPs + "bytes accessed" from XLA's compiled cost analysis of ONE
    application (bytes is an upper bound on HBM traffic: fusion keeps
    intermediates in VMEM);
  * achieved TFLOP/s, MFU vs the v5e bf16 MXU peak, and the compute-bound
    speed-of-light time flops/peak.

Ops measured: flow fwd+logdet (the BASELINE metric), the NeuTra pullback
value_and_grad (the HMC leapfrog hot op), and a full HMC draw (L leapfrog
steps + MH accept) at bench settings.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/mfu.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

# TPU v5e (v5 lite) per-chip peaks.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def _cost(fn, *args):
    """XLA cost analysis of one application: (flops, bytes accessed)."""
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def slope_time(step, carry0, iters=(512, 2048), reps=4):
    """Marginal seconds per application of `step` (carry -> carry).

    Sync discipline: `block_until_ready` on this relay can report buffers
    ready before execution finishes (observed 0.2 ms "completions" of 60 ms
    of work); only fetching actual VALUES to the host forces a true sync.
    Each timed call therefore returns a 4-byte checksum reduced from every
    float leaf of the carry, and the timer fetches it with float().

    The relay's fixed dispatch cost varies by a few ms call-to-call; when
    the two totals differ by less than that jitter the slope can come out
    <= 0 (the r3 BENCH mfu row reported -213 us/call). Guard: retry the
    measurement with fresh timings, and as a last resort report the
    amortized upper bound totals[N2]/N2 -- never a negative number.
    """
    import numpy as np

    runs = {}
    for it in iters:
        @jax.jit
        def run(c, s, it=it):
            # fold the rep index into the carry: fresh inputs per call, so
            # neither XLA nor the relay can serve a cached result. Only
            # float leaves are perturbed (PRNG keys must stay intact).
            c = jax.tree.map(
                lambda a: a + s * 1e-9
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
                c,
            )
            c = jax.lax.fori_loop(0, it, lambda i, c: step(c), c)
            chk = sum(
                jnp.sum(l).astype(jnp.float32)
                for l in jax.tree.leaves(c)
                if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
            )
            return c, chk

        float(np.asarray(run(carry0, jnp.float32(0))[1]))  # compile + sync
        runs[it] = run

    def timed_min(it, base):
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(runs[it](carry0, jnp.float32(base + r))[1]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for attempt in range(3):
        t1 = timed_min(iters[0], 1 + 10 * attempt)
        t2 = timed_min(iters[1], 5 + 10 * attempt)
        slope = (t2 - t1) / (iters[1] - iters[0])
        if slope > 0:
            return slope
    return t2 / iters[1]  # amortized upper bound (includes dispatch cost)


def measure(name, step, carry0, cost_fn, cost_args, iters=(512, 2048)):
    # iters default matches slope_time's widened spread (ADVICE r4 #2: the
    # (512, 2048) widening beat dispatch jitter only when callers got it).
    flops, bytes_ = _cost(cost_fn, *cost_args)
    sec = slope_time(step, carry0, iters=iters)
    tflops = flops / sec / 1e12
    sol_sec = flops / PEAK_BF16_FLOPS
    return {
        "op": name,
        "us_per_call": round(sec * 1e6, 2),
        "gflop_per_call": round(flops / 1e9, 3),
        "xla_mb_per_call": round(bytes_ / 1e6, 2),
        "achieved_tflops": round(tflops, 3),
        "mfu_vs_bf16_peak": round(tflops * 1e12 / PEAK_BF16_FLOPS, 4),
        "sol_compute_us": round(sol_sec * 1e6, 2),
        "x_over_sol": round(sec / sol_sec, 1),
    }


def build_flow(dim=64, hidden=128, layers=2):
    from normalizingflow_tpu import NormalizingFlow, bijectors, distributions

    return NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain(
            [bijectors.ActNorm(dim)]
            + [bijectors.AffineCoupling(dim, hidden_dim=hidden)
               for _ in range(layers)]
        ),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from normalizingflow_tpu.mcmc.hmc import run_hmc
    from normalizingflow_tpu.mcmc.neutra import pullback_logprob
    from normalizingflow_tpu.targets import NealsFunnel

    flow = build_flow(args.dim, args.hidden, args.layers)
    params = flow.init(jax.random.PRNGKey(0))
    target = NealsFunnel(args.dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (args.batch, args.dim))

    results = []

    # 1. flow fwd + logdet (the BASELINE latency metric). Feed z back as x so
    # the loop has a data dependence (no DCE, no overlap tricks).
    def fwd_step(carry):
        xx, acc = carry
        z, plp, ld = flow.forward(params, xx)
        return z, acc + jnp.sum(plp + ld)

    results.append(measure(
        "flow_fwd_logdet_b%d" % args.batch, fwd_step,
        (x, jnp.zeros(())),
        lambda xx: flow.forward(params, xx), (x,),
    ))

    # 2. NeuTra pullback value+grad over all chains: the HMC leapfrog hot op.
    logprob = pullback_logprob(flow, params, target)
    vg = jax.vmap(jax.value_and_grad(logprob))

    def grad_step(carry):
        z, acc = carry
        lp, g = vg(z)
        return z + 1e-6 * g, acc + jnp.sum(lp)

    results.append(measure(
        "neutra_value_and_grad_b%d" % args.batch, grad_step,
        (x, jnp.zeros(())),
        lambda z: vg(z), (x,),
    ))

    # 3. one full HMC draw (L leapfrog steps + MH accept) at bench settings.
    def draw_step(carry):
        z, seed = carry
        res = run_hmc(
            jax.random.fold_in(jax.random.PRNGKey(7), seed.astype(jnp.int32)),
            logprob, z, num_samples=1, num_warmup=0, step_size=0.5,
            num_leapfrog=4,
        )
        return res.final_state.position, seed + 1.0

    def one_draw(z):
        return run_hmc(jax.random.PRNGKey(7), logprob, z, num_samples=1,
                       num_warmup=0, step_size=0.5, num_leapfrog=4).samples

    results.append(measure(
        "hmc_draw_L4_b%d" % args.batch, draw_step,
        (x, jnp.zeros(())),
        one_draw, (x,), iters=(128, 512),
    ))

    for r in results:
        print(json.dumps(r))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"device": str(jax.devices()[0]), "results": results},
                      fh, indent=1)


if __name__ == "__main__":
    main()
