"""Headline benchmark: flow-preconditioned HMC effective samples/sec.

BASELINE.json north star: >= 1e6 ESS/s on a 64-d RealNVP-preconditioned
target on one TPU host. Pipeline: train a RealNVP by reverse KL against a
64-d ill-conditioned Gaussian, then run NeuTra HMC (mcmc/neutra.py) with
thousands of vmapped chains in one jit-compiled program; report
min-over-dims ESS of data-space samples divided by sampling wall time.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import time

import jax

# Persistent compile cache: first-ever run pays ~10 min of XLA compiles over
# the TPU tunnel; subsequent runs (the driver's) start hot.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import optax

from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
from normalizingflow_tpu.estimators.ess import ess_per_dim
from normalizingflow_tpu.mcmc import run_hmc
from normalizingflow_tpu.mcmc.neutra import pullback_logprob
from normalizingflow_tpu.targets import IllConditionedGaussian
from normalizingflow_tpu.train.objectives import reverse_kl

DIM = 64
HIDDEN = 128
LAYERS = 2
# Tuned on v5e: 8192 chains saturates the chip (16384 regresses -- HBM
# pressure); 1024 draws amortizes the ~60 ms tunnel dispatch latency; 4
# leapfrog steps is the shortest trajectory that still yields ESS == total
# draws (L=3 drops min-ESS to ~60%). Larger draw counts OOM (z + pushed x
# both live in HBM) for ~2% more throughput.
CHAINS = 8192
DRAWS = 1024
WARMUP = 100
LEAPFROG = 4
TRAIN_STEPS = 15000
TRAIN_BATCH = 4096


def build():
    target = IllConditionedGaussian(DIM, condition=1e4)
    flow = NormalizingFlow(
        distributions.DiagNormal(DIM),
        bijectors.Chain(
            [bijectors.ActNorm(DIM)]
            + [bijectors.AffineCoupling(DIM, hidden_dim=HIDDEN)
               for _ in range(LAYERS)]
        ),
    )
    return flow, target


def train(flow, target, key):
    """Whole training run as ONE on-device fori_loop: per-step host dispatch
    costs ~100 ms over the TPU tunnel. The trip count is passed as a TRACED
    argument -- XLA unrolls statically-bounded loops at some trip counts
    (observed 250 s compiles); a dynamic bound can never unroll."""
    params = flow.init(key)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(
            optax.warmup_cosine_decay_schedule(
                0.0, 1e-3, warmup_steps=500, decay_steps=TRAIN_STEPS
            )
        ),
    )
    opt_state = optimizer.init(params)

    CHUNK = 750  # static trip counts in [~400, ~1000] stay rolled (no unroll)

    @jax.jit
    def run(params, opt_state, key, base):
        def body(i, carry):
            params, opt_state, _ = carry
            k = jax.random.fold_in(key, base + i)
            loss, grads = jax.value_and_grad(
                lambda p: reverse_kl(flow, p, target, k, TRAIN_BATCH)
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params, opt_state, loss = jax.lax.fori_loop(
            0, CHUNK, body, (params, opt_state, jnp.zeros(()))
        )
        return params, opt_state, loss

    loss = jnp.zeros(())
    for c in range(TRAIN_STEPS // CHUNK):
        params, opt_state, loss = run(
            params, opt_state, key, jnp.asarray(c * CHUNK)
        )
    return params, float(loss)


def main():
    import sys
    def log(*a):
        print(*a, file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    flow, target = build()
    t0 = time.time()
    params, final_kl = train(flow, target, key)
    t_train = time.time() - t0
    log("train done", t_train)

    logprob = pullback_logprob(flow, params, target)
    z0 = flow.prior.sample(jax.random.PRNGKey(1), CHAINS)

    # Phase 1: adaptation (warmup) + a couple of draws; compiles everything.
    adapt = run_hmc(
        jax.random.PRNGKey(2), logprob, z0, num_samples=2,
        num_warmup=WARMUP, step_size=0.5, num_leapfrog=LEAPFROG,
    )
    jax.block_until_ready(adapt.samples)
    log("adapt done", time.time() - t0)

    # Phase 2: timed run -- sampling + latent->data push in ONE jit (one
    # dispatch over the tunnel; the separate push call cost ~60 ms of pure
    # latency).
    @jax.jit
    def sample_and_push(seed, pos):
        res = run_hmc(
            jax.random.PRNGKey(seed), logprob, pos,
            num_samples=DRAWS, num_warmup=0,
            step_size=float(adapt.step_size),
            inv_mass_diag=adapt.inv_mass_diag, num_leapfrog=LEAPFROG,
        )
        x, _ = flow.inverse(params, res.samples.reshape(-1, DIM))
        return x.reshape(res.samples.shape), res.accept_rate

    pos = adapt.final_state.position
    jax.block_until_ready(sample_and_push(3, pos))  # compile
    log("sampling compiled")
    t0 = time.time()
    xs, accept_rate = sample_and_push(4, pos)
    jax.block_until_ready(xs)
    t_sample = time.time() - t0

    ess = ess_per_dim(xs)
    ess_min = float(jnp.min(ess))
    ess_med = float(jnp.median(ess))
    total_time = t_sample
    ess_per_s = ess_min / total_time

    log("ess done")
    # Secondary metric: flow fwd+logdet latency.
    x = jax.random.normal(jax.random.PRNGKey(5), (CHAINS, DIM))
    lp = jax.jit(lambda p, x: flow.log_prob(p, x))
    lp(params, x).block_until_ready()
    t0 = time.time()
    n_rep = 50
    for _ in range(n_rep):
        out = lp(params, x)
    out.block_until_ready()
    fwd_us = (time.time() - t0) / n_rep * 1e6

    print(json.dumps({
        "metric": "neutra_hmc_ess_per_s_64d",
        "value": round(ess_per_s, 1),
        "unit": "ESS/s",
        "vs_baseline": round(ess_per_s / 1e6, 4),
        "detail": {
            "ess_min": round(ess_min, 1),
            "ess_median": round(ess_med, 1),
            "chains": CHAINS,
            "draws": DRAWS,
            "sample_s": round(t_sample, 3),
            "train_s": round(t_train, 1),
            "final_reverse_kl": round(final_kl, 3),
            "accept": round(float(accept_rate), 3),
            "fwd_logdet_us_batch8192": round(fwd_us, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
