"""Headline benchmark: flow-preconditioned HMC effective samples/sec.

BASELINE.json north star: >= 1e6 ESS/s on a 64-d RealNVP-preconditioned
target on one TPU host.

Primary target: 64-d Neal's funnel -- a target the half-split affine
coupling stack cannot represent exactly (after layer 1 removes the
v-dependent scale from the conditioned half, v is only *statistically*
recoverable from 32 rescaled coordinates, so the coordinates sharing v's
half keep a residual v-dependent scale the flow cannot kill). The NeuTra
pullback is therefore genuinely non-Gaussian and the reported ESS sits
strictly below the chains*draws cap: the number measures real mixing, not
raw draw throughput.

ESS methodology: the headline is the min over per-coordinate rank-normalized
bulk ESS (Vehtari et al. 2021 -- the Stan/arviz standard) of BOTH x and the
nonlinear functional x^2, plus the min tail ESS (5%/95% quantile indicator
ESS). Rank normalization makes the estimate invariant to monotone
transforms; the raw (non-rank) estimator is also reported, but for
heavy-tailed functionals like x^2 of e^{v/2}-scaled funnel coordinates its
autocovariance is dominated by a handful of extreme draws and it
UNDER-estimates the number of effectively independent tail events
(tests/test_estimators.py:test_bulk_ess_rank_normalization_invariance).
The round-1 ill-conditioned-Gaussian run (which the flow fits exactly; ESS
saturates at the cap) is kept as a secondary line.

Also reports the BASELINE "speed-of-light" row: flow fwd+logdet device
latency measured by the slope method (tools/mfu.py -- the axon relay has a
~25 ms fixed per-dispatch cost, so naive single-call timings are ~10x
inflated), XLA-counted FLOPs, achieved TFLOP/s, and MFU vs the v5e bf16
peak. See PERF.md for the full analysis.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import sys
import time

import jax

# Persistent compile cache: first-ever run pays ~10 min of XLA compiles over
# the TPU tunnel; subsequent runs (the driver's) start hot.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import optax

from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
from normalizingflow_tpu.estimators.ess import (
    bulk_ess_per_dim, ess_per_dim, tail_ess,
)
from normalizingflow_tpu.mcmc import run_hmc
from normalizingflow_tpu.mcmc.neutra import pullback_logprob
from normalizingflow_tpu.targets import IllConditionedGaussian, NealsFunnel
from normalizingflow_tpu.train.objectives import reverse_kl

DIM = 64
HIDDEN = 128
LAYERS = 2
# Tuned on v5e (tools/tune_bench.py sweep, layers x leapfrog in
# {2,4,6}x{4,8,16}): 8192 chains saturates the chip (16384 regresses --
# HBM pressure); 1024 draws amortizes the per-dispatch relay latency;
# 2 coupling layers + 8 leapfrog steps maximizes min-bulk-ESS/s (deeper
# flows cost ~2x per draw without mixing better on the funnel pullback).
CHAINS = 8192
DRAWS = 1024
WARMUP = 100
LEAPFROG = 8
TRAIN_STEPS = 15000
TRAIN_BATCH = 4096


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_flow(layers=LAYERS, hidden=HIDDEN, dim=DIM):
    return NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain(
            [bijectors.ActNorm(dim)]
            + [bijectors.AffineCoupling(dim, hidden_dim=hidden)
               for _ in range(layers)]
        ),
    )


def train(flow, target, key, steps=TRAIN_STEPS, batch=TRAIN_BATCH):
    """Whole training run as ONE on-device fori_loop per chunk: per-step host
    dispatch costs ~25 ms over the TPU relay. Chunk trip counts in
    [~400, ~1000] stay in XLA's rolled-loop regime (CLAUDE.md)."""
    params = flow.init(key)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(
            optax.warmup_cosine_decay_schedule(
                0.0, 1e-3, warmup_steps=500, decay_steps=steps
            )
        ),
    )
    opt_state = optimizer.init(params)

    CHUNK = 750

    @jax.jit
    def run(params, opt_state, key, base):
        def body(i, carry):
            params, opt_state, _ = carry
            k = jax.random.fold_in(key, base + i)
            loss, grads = jax.value_and_grad(
                lambda p: reverse_kl(flow, p, target, k, batch)
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params, opt_state, loss = jax.lax.fori_loop(
            0, CHUNK, body, (params, opt_state, jnp.zeros(()))
        )
        return params, opt_state, loss

    loss = jnp.zeros(())
    for c in range(steps // CHUNK):
        params, opt_state, loss = run(
            params, opt_state, key, jnp.asarray(c * CHUNK)
        )
    return params, float(loss)


def neutra_ess_run(flow, target, key, tag, leapfrog=LEAPFROG, draws=DRAWS,
                   chains=CHAINS, train_steps=TRAIN_STEPS):
    """Train flow on target, run NeuTra HMC, return ESS/s + diagnostics."""
    dim = target.dim
    t0 = time.time()
    params, final_kl = train(flow, target, key, steps=train_steps)
    t_train = time.time() - t0
    log(tag, "train done", round(t_train, 1), "kl", round(final_kl, 3))

    logprob = pullback_logprob(flow, params, target)
    z0 = flow.prior.sample(jax.random.PRNGKey(1), chains)

    # Phase 1: adaptation (warmup) + a couple of draws; compiles everything.
    adapt = run_hmc(
        jax.random.PRNGKey(2), logprob, z0, num_samples=2,
        num_warmup=WARMUP, step_size=0.5, num_leapfrog=leapfrog,
    )
    jax.block_until_ready(adapt.samples)

    # Phase 2: timed run -- sampling + latent->data push in ONE jit (one
    # dispatch; the relay's fixed latency amortizes over the draws).
    # params is a jit ARGUMENT (not a closure) per the no-params-closure
    # convention (CLAUDE.md): closures embed weights as HLO constants.
    @jax.jit
    def sample_and_push(seed, pos, p):
        res = run_hmc(
            jax.random.PRNGKey(seed), pullback_logprob(flow, p, target),
            pos, num_samples=draws, num_warmup=0,
            step_size=float(adapt.step_size),
            inv_mass_diag=adapt.inv_mass_diag, num_leapfrog=leapfrog,
        )
        x, _ = flow.inverse(p, res.samples.reshape(-1, dim))
        x = x.reshape(res.samples.shape)
        # 4-byte checksum: block_until_ready on this relay can report
        # readiness before execution finishes; fetching a VALUE that
        # depends on every draw is the only reliable sync (tools/mfu.py).
        return x, res.accept_rate, jnp.sum(x[-1])

    pos = adapt.final_state.position
    float(sample_and_push(3, pos, params)[2])  # compile + sync
    # min-of-3: single-shot timings over the axon relay carry ~100 ms of
    # dispatch jitter, which at ~0.9 s/run is a 10% noise band -- exactly
    # the size of the unexplained r2->r3 "regression" (VERDICT r3 item 4).
    # ESS is computed from the SAME run whose time is reported (ADVICE r4
    # #5: min-of-3 time paired with the last seed's samples formally
    # mismatched numerator and denominator; spread is ~0.2% but keep them
    # from one run). Keep only the current-best run's draws on device.
    times = []
    t_sample = None
    for seed in (4, 5, 6):
        t0 = time.time()
        xs_i, accept_i, chk = sample_and_push(seed, pos, params)
        float(chk)
        dt = time.time() - t0
        times.append(dt)
        if t_sample is None or dt < t_sample:
            t_sample, xs, accept_rate = dt, xs_i, accept_i

    # Headline: Stan rank-normalized bulk ESS of x and x^2 (+ tail ESS of
    # the funnel-hardest coordinate); raw ESS reported alongside.
    bulk_x = bulk_ess_per_dim(xs)
    bulk_x2 = bulk_ess_per_dim(xs * xs)
    raw_x = ess_per_dim(xs)
    raw_x2 = ess_per_dim(xs * xs)
    ess_min = float(jnp.minimum(jnp.min(bulk_x), jnp.min(bulk_x2)))
    hardest = int(jnp.argmin(bulk_x))
    t_ess = float(tail_ess(xs[:, :, hardest]))
    log(tag, "ess done", round(ess_min, 1), "in", round(t_sample, 3), "s")
    return {
        "ess_per_s": ess_min / t_sample,
        "ess_min_bulk_x": round(float(jnp.min(bulk_x)), 1),
        "ess_min_bulk_x2": round(float(jnp.min(bulk_x2)), 1),
        "ess_median_bulk_x": round(float(jnp.median(bulk_x)), 1),
        "ess_min_raw_x": round(float(jnp.min(raw_x)), 1),
        "ess_min_raw_x2": round(float(jnp.min(raw_x2)), 1),
        "ess_tail_hardest_coord": round(t_ess, 1),
        "ess_cap": chains * draws,
        "sample_s": round(t_sample, 3),
        "sample_s_all": [round(t, 3) for t in times],
        "train_s": round(t_train, 1),
        "final_reverse_kl": round(final_kl, 3),
        "accept": round(float(accept_rate), 3),
        "samples": xs,
        "params": params,
    }


def nuts_ess_line(flow, params, target, chains=4096, draws=256,
                  max_depth=7):
    """NUTS on the same NeuTra pullback (VERDICT r2 item 5: give NUTS a
    number next to HMC). Same timed-phase protocol as neutra_ess_run:
    adapt first, then one jit containing sampling + latent->data push."""
    from normalizingflow_tpu.mcmc.nuts import run_nuts

    dim = target.dim
    logprob = pullback_logprob(flow, params, target)
    z0 = flow.prior.sample(jax.random.PRNGKey(21), chains)
    adapt = run_nuts(
        jax.random.PRNGKey(22), logprob, z0, num_samples=2,
        num_warmup=WARMUP, step_size=0.5, max_depth=max_depth,
    )
    jax.block_until_ready(adapt.samples)

    # params as a jit argument, not a closure (ADVICE r3; CLAUDE.md).
    @jax.jit
    def sample_and_push(seed, pos, p):
        res = run_nuts(
            jax.random.PRNGKey(seed), pullback_logprob(flow, p, target),
            pos, num_samples=draws, num_warmup=0,
            step_size=float(adapt.step_size),
            max_depth=max_depth, inv_mass_diag=adapt.inv_mass_diag,
        )
        x, _ = flow.inverse(p, res.samples.reshape(-1, dim))
        x = x.reshape(res.samples.shape)
        return (x, res.accept_rate, res.mean_depth, res.divergence_rate,
                jnp.sum(x[-1]))

    pos = adapt.final_state.position
    float(sample_and_push(23, pos, params)[4])  # compile + sync
    # Same one-run time/ESS pairing as neutra_ess_run (ADVICE r4 #5).
    times = []
    t_sample = None
    for seed in (24, 25, 26):
        t0 = time.time()
        xs_i, accept_i, depth_i, div_i, chk = sample_and_push(
            seed, pos, params)
        float(chk)
        dt = time.time() - t0
        times.append(dt)
        if t_sample is None or dt < t_sample:
            t_sample, xs, accept, depth, div = (
                dt, xs_i, accept_i, depth_i, div_i)

    bulk_x = bulk_ess_per_dim(xs)
    bulk_x2 = bulk_ess_per_dim(xs * xs)
    ess_min = float(jnp.minimum(jnp.min(bulk_x), jnp.min(bulk_x2)))
    log("nuts", "ess done", round(ess_min, 1), "in", round(t_sample, 3),
        "s", "depth", round(float(depth), 2))
    return {
        "ess_per_s": round(ess_min / t_sample, 1),
        "ess_min_bulk_x": round(float(jnp.min(bulk_x)), 1),
        "ess_min_bulk_x2": round(float(jnp.min(bulk_x2)), 1),
        "ess_cap": chains * draws,
        "sample_s": round(t_sample, 3),
        "sample_s_all": [round(t, 3) for t in times],
        "mean_tree_depth": round(float(depth), 2),
        "divergence_rate": round(float(div), 4),
        "accept": round(float(accept), 3),
        "chains": chains,
        "draws": draws,
        "max_depth": max_depth,
    }


def spline_flow_lines(dim=96, size=32, num_bins=32, hidden=354,
                      tail_bound=6.0, chains=4096, draws=256, leapfrog=8,
                      train_steps=2250, train_batch=1024):
    """In-situ A/B of the Pallas RQS kernel on a spline flow (VERDICT r4
    item 6): the reference's flagship architecture is the RQS path (7 of 11
    configs), but the headline bench only measured RealNVP, so the kernel's
    ~6x microbench claim (ops/rqs_pallas.py) had no end-to-end number. This
    measures, at a physics-relevant shape (dim 96 = 32 particles x 3, the
    LJ configuration; NSF_CL stack with cycling coordinate masks), both:

      * train-steps/s (reverse KL, batch 1024) with the fused kernel on
        vs off -- the kernel accelerates the forward; backward is the jnp
        path either way (custom_vjp);
      * NeuTra-HMC ESS/s with kernel on vs off on the kernel's designed
        surface -- the flat chains*draws latent->data push (the vmapped
        leapfrog interior keeps the jnp path in BOTH settings: forcing
        the kernel through per-chain vmap faults the TPU runtime, see
        the lowering note at the sampling loop).

    The r4 accept-fusion episode showed microbench wins can invert inside
    big fused programs (a Pallas call is an XLA fusion barrier); this line
    settles it for the RQS kernel specifically.
    """
    from normalizingflow_tpu.bijectors.rqs import set_fused_rqs

    target = NealsFunnel(dim)
    flow = NormalizingFlow(
        distributions.DiagNormal(dim),
        bijectors.Chain([
            bijectors.SplineCoupling(
                size, 3, num_bins=num_bins, tail_bound=tail_bound,
                hidden_dim=hidden, mask=(axis,))
            for axis in (0, 1, 2)
        ]),
    )
    params = flow.init(jax.random.PRNGKey(40))
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.warmup_cosine_decay_schedule(
            0.0, 5e-4, warmup_steps=300, decay_steps=train_steps)),
    )
    opt_state = optimizer.init(params)

    def make_train_chunk(n_steps):
        # Fresh jit per kernel setting: the fused dispatch is a trace-time
        # flag, so each setting needs its own traced program.
        @jax.jit
        def run(params, opt_state, key, base):
            def body(i, carry):
                params, opt_state, _ = carry
                k = jax.random.fold_in(key, base + i)
                loss, grads = jax.value_and_grad(
                    lambda p: reverse_kl(flow, p, target, k, train_batch)
                )(params)
                updates, opt_state = optimizer.update(
                    grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            params, opt_state, loss = jax.lax.fori_loop(
                0, n_steps, body, (params, opt_state, jnp.zeros(()))
            )
            return params, opt_state, loss

        return run

    out = {"dim": dim, "num_bins": num_bins, "layers": 3,
           "hidden_dim": hidden, "chains": chains, "draws": draws}

    # ---- train-steps/s A/B (throwaway chunks from the same init) --------
    CHUNK = 250
    for fused in (True, False):
        set_fused_rqs(fused, min_elements=4096)
        run = make_train_chunk(CHUNK)
        p, o, _ = run(params, opt_state, jax.random.PRNGKey(41),
                      jnp.asarray(0))
        jax.block_until_ready(p)           # compile + warm
        t0 = time.time()
        p, o, loss = run(p, o, jax.random.PRNGKey(41), jnp.asarray(CHUNK))
        float(loss)
        key_name = "fused" if fused else "xla"
        out[f"train_steps_per_s_{key_name}"] = round(
            CHUNK / (time.time() - t0), 1)

    # ---- real training run (kernel on), then sampling A/B ---------------
    set_fused_rqs(True, min_elements=131072)  # library default
    run = make_train_chunk(CHUNK)
    loss = jnp.zeros(())
    for c in range(train_steps // CHUNK):
        params, opt_state, loss = run(
            params, opt_state, jax.random.PRNGKey(42),
            jnp.asarray(c * CHUNK))
    out["final_kl"] = round(float(loss), 3)
    log("spline", "train done, kl", out["final_kl"])

    # Chain-BATCHED pullback (mcmc/hmc.py hmc_kernel_chainbatched): the
    # per-chain vmapped pullback faults the TPU runtime (kernel off too --
    # the jnp RQS gathers under vmap x scan x grad hit the EAM
    # split-gather lowering-fault class, PERF.md r5). Batching the chain
    # axis through the flow both fixes that and lets the batch-gated RQS
    # kernel engage INSIDE leapfrog (4096 x 64 rows >= the 128k gate), so
    # the sampling A/B below is a true in-leapfrog kernel on/off.
    from normalizingflow_tpu.mcmc.neutra import pullback_logprob_batched

    logprob = pullback_logprob_batched(flow, params, target)
    z0 = flow.prior.sample(jax.random.PRNGKey(43), chains)
    try:
        adapt = run_hmc(
            jax.random.PRNGKey(44), logprob, z0, num_samples=2,
            num_warmup=WARMUP, step_size=0.5, num_leapfrog=leapfrog,
            batched_target=True,
        )
        jax.block_until_ready(adapt.samples)
    except Exception as e:  # noqa: BLE001
        # r5 finding: the spline pullback inside the chain-vmapped HMC
        # leapfrog faults the TPU runtime ('UNAVAILABLE: kernel fault')
        # with the KERNEL OFF too -- i.e. the jnp RQS path's per-chain
        # gathers under vmap x scan x grad hit the same runtime
        # lowering-fault class as the EAM split-gather crash
        # (tools/eam_tpu_repro.py). Flat-batch spline surfaces (training,
        # relaxation, evaluation -- everything the campaign uses) are
        # unaffected. Record and keep the train A/B numbers.
        log("spline sampling phase failed:", repr(e))
        out["sampling_error"] = repr(e)[:200]
        out["sampling_note"] = (
            "spline pullback inside chain-vmapped HMC faults the TPU "
            "runtime (jnp path too; same class as EAM split-gather); "
            "train A/B numbers above are unaffected")
        set_fused_rqs(True, min_elements=131072)  # library default
        out["kernel_speedup_train"] = round(
            out["train_steps_per_s_fused"]
            / out["train_steps_per_s_xla"], 2)
        return out
    pos = adapt.final_state.position

    # Sampling A/B: with the chain-batched pullback, the flow sees flat
    # (chains, n_trans) batches inside every leapfrog step, so fused=True
    # runs the Pallas RQS kernel in the hot loop and fused=False runs the
    # XLA lowering -- a genuine in-leapfrog kernel on/off.
    for fused in (True, False):
        set_fused_rqs(fused, min_elements=4096)

        @jax.jit
        def sample_and_push(seed, pos, p):
            res = run_hmc(
                jax.random.PRNGKey(seed),
                pullback_logprob_batched(flow, p, target),
                pos, num_samples=draws, num_warmup=0,
                step_size=float(adapt.step_size),
                inv_mass_diag=adapt.inv_mass_diag, num_leapfrog=leapfrog,
                batched_target=True,
            )
            x, _ = flow.inverse(p, res.samples.reshape(-1, dim))
            return (x.reshape(res.samples.shape), res.accept_rate,
                    jnp.sum(x[-1]))

        float(sample_and_push(45, pos, params)[2])  # compile + sync
        t_sample, xs, accept = None, None, None
        for seed in (46, 47, 48):
            t0 = time.time()
            xs_i, accept_i, chk = sample_and_push(seed, pos, params)
            float(chk)
            dt = time.time() - t0
            if t_sample is None or dt < t_sample:
                t_sample, xs, accept = dt, xs_i, accept_i
        bulk = jnp.minimum(jnp.min(bulk_ess_per_dim(xs)),
                           jnp.min(bulk_ess_per_dim(xs * xs)))
        key_name = "fused" if fused else "xla"
        out[f"ess_per_s_{key_name}"] = round(float(bulk) / t_sample, 1)
        out[f"sample_s_{key_name}"] = round(t_sample, 3)
        out[f"accept_{key_name}"] = round(float(accept), 3)
        log("spline", key_name, "ess/s", out[f"ess_per_s_{key_name}"],
            "in", round(t_sample, 3), "s")

    # restore defaults for any later phases
    set_fused_rqs(True, min_elements=131072)  # library default
    out["kernel_speedup_sampling"] = round(
        out["sample_s_xla"] / out["sample_s_fused"], 2)
    out["kernel_speedup_train"] = round(
        out["train_steps_per_s_fused"] / out["train_steps_per_s_xla"], 2)
    return out


def mfu_fwd_logdet(flow, params):
    """BASELINE speed-of-light row via tools/mfu.py methodology."""
    from tools.mfu import PEAK_BF16_FLOPS, _cost, slope_time

    x = jax.random.normal(jax.random.PRNGKey(5), (CHAINS, DIM))

    def fwd_step(carry):
        xx, acc = carry
        z, plp, ld = flow.forward(params, xx)
        return z, acc + jnp.sum(plp + ld)

    flops, _ = _cost(lambda xx: flow.forward(params, xx), x)
    sec = slope_time(fwd_step, (x, jnp.zeros(())))
    return {
        "fwd_logdet_us_batch8192": round(sec * 1e6, 2),
        "fwd_logdet_gflop": round(flops / 1e9, 3),
        "achieved_tflops": round(flops / sec / 1e12, 2),
        "mfu_vs_bf16_peak": round(flops / sec / PEAK_BF16_FLOPS, 4),
        "sol_compute_us": round(flops / PEAK_BF16_FLOPS * 1e6, 2),
    }


def main():
    flow = build_flow()

    # Primary: Neal's funnel (flow cannot represent it -> honest mixing).
    funnel = neutra_ess_run(
        flow, NealsFunnel(DIM), jax.random.PRNGKey(0), "funnel")
    xs = funnel.pop("samples")
    funnel_params = funnel.pop("params")
    v = xs[..., 0]
    funnel_stats = {
        "v_mean": round(float(jnp.mean(v)), 3),
        "v_var": round(float(jnp.var(v)), 3),   # true: 0, 9
    }

    # NUTS on the same trained pullback: HMC-vs-NUTS on one line (the
    # BASELINE north star names a "jit-compiled NUTS/HMC engine").
    nuts = nuts_ess_line(flow, funnel_params, NealsFunnel(DIM))

    # Secondary: ill-conditioned Gaussian (round-1 line; flow fits exactly,
    # ESS saturates at the cap -- raw draw throughput).
    gauss = neutra_ess_run(
        flow, IllConditionedGaussian(DIM, condition=1e4),
        jax.random.PRNGKey(0), "gauss")
    gauss.pop("samples")
    gauss.pop("params")
    gauss = {k: (round(v, 1) if isinstance(v, float) else v)
             for k, v in gauss.items()}
    gauss["ess_per_s"] = round(gauss["ess_per_s"], 1)

    # Speed-of-light row (fresh params; same architecture).
    params = flow.init(jax.random.PRNGKey(0))
    mfu = mfu_fwd_logdet(flow, params)

    # Spline-flow line with in-situ Pallas RQS kernel A/B (VERDICT r4 #6).
    # Never let this auxiliary line kill the headline metric: degrade to an
    # error field on failure.
    try:
        spline = spline_flow_lines()
    except Exception as e:  # noqa: BLE001
        log("spline line failed:", repr(e))
        spline = {"error": repr(e)[:300]}
        from normalizingflow_tpu.bijectors.rqs import set_fused_rqs

        set_fused_rqs(True, min_elements=131072)  # library default

    ess_per_s = funnel["ess_per_s"]
    print(json.dumps({
        "metric": "neutra_hmc_ess_per_s_funnel64",
        "value": round(ess_per_s, 1),
        "unit": "ESS/s",
        "vs_baseline": round(ess_per_s / 1e6, 4),
        "detail": {
            **{k: v for k, v in funnel.items() if k != "ess_per_s"},
            **funnel_stats,
            "chains": CHAINS,
            "draws": DRAWS,
            "leapfrog": LEAPFROG,
            "flow_layers": LAYERS,
            "gaussian_secondary": gauss,
            "nuts_funnel": nuts,
            "spline_flow": spline,
            **mfu,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
