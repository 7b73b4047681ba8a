"""Multi-chip weak-scaling benchmark: chains-sharded NeuTra HMC.

BASELINE.json north star: >= 0.9 multi-host scaling efficiency. The HMC
program is embarrassingly parallel over chains except the warmup's
cross-chain dual-averaging psum, so efficiency should be near 1.0 on real
ICI; this harness measures it.

Method (weak scaling): fix CHAINS_PER_DEVICE, run the timed sampling phase
of the bench.py pipeline on a 1-device mesh and on the full mesh, and report

    efficiency = throughput(N) / (N * throughput(1))

Usage:
    python bench_scaling.py              # real devices (TPU pod slice)
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py          # 8 fake CPU devices (methodology
                                         # check only: fake devices share
                                         # one host's cores, so efficiency
                                         # numbers are NOT meaningful)

Prints one JSON line per mesh size plus a final summary line.

LIMITATION (single-host harness): the 1-device baseline builds
Mesh(jax.devices()[:1]) from the global device list. Under multi-controller
jit on a real multi-host pod slice, a mesh that excludes other processes'
devices is invalid -- every process must participate in every computation.
To measure a multi-host baseline, run this harness once per slice size
(e.g. a v5e-8 run and a v5e-16 run) and divide the throughput lines, or
derive the baseline from a per-host subset mesh spanning all processes
(one device per host). As written, the in-process 1-vs-N comparison is
single-host only.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    # JAX_PLATFORMS=axon is exported in this environment and env-var
    # overrides don't work; jax.config does (must run before computation).
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax.numpy as jnp
from jax.sharding import Mesh

import bench
from normalizingflow_tpu.mcmc.neutra import pullback_logprob
from normalizingflow_tpu.parallel.sharded import run_hmc_sharded

CHAINS_PER_DEVICE = 2048
DRAWS = 256
LEAPFROG = 4


def throughput(mesh, flow, params, target, log):
    n_dev = mesh.devices.size
    chains = CHAINS_PER_DEVICE * n_dev
    logprob = pullback_logprob(flow, params, target)
    z0 = flow.prior.sample(jax.random.PRNGKey(1), chains)

    adapt = run_hmc_sharded(
        mesh, jax.random.PRNGKey(2), logprob, z0, num_samples=2,
        num_warmup=50, step_size=0.5, num_leapfrog=LEAPFROG,
    )
    jax.block_until_ready(adapt.samples)
    log(f"mesh={n_dev}: adapted eps={float(adapt.step_size):.3f}")

    def run(seed):
        res = run_hmc_sharded(
            mesh, jax.random.PRNGKey(seed), logprob,
            adapt.final_state.position, num_samples=DRAWS, num_warmup=0,
            step_size=float(adapt.step_size),
            inv_mass_diag=adapt.inv_mass_diag, num_leapfrog=LEAPFROG,
        )
        # value fetch = true sync; block_until_ready can report readiness
        # before execution finishes on the TPU relay (see PERF.md).
        return float(jnp.sum(res.samples[-1, 0]))

    run(3)  # compile + sync
    t0 = time.time()
    run(4)
    dt = time.time() - t0
    return chains * DRAWS / dt, dt


def main():
    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    devices = jax.devices()
    n = len(devices)
    if jax.default_backend() == "cpu":
        # methodology check on fake devices: don't spend minutes training
        bench.TRAIN_STEPS = 1500
    flow = bench.build_flow()
    from normalizingflow_tpu.targets import NealsFunnel

    target = NealsFunnel(bench.DIM)
    # Scaling measures the sampler, not the trainer: a short training run
    # is enough for a well-conditioned pullback.
    params, _ = bench.train(flow, target, jax.random.PRNGKey(0))
    log("trained")

    results = {}
    sizes = sorted({1, n})
    for size in sizes:
        mesh = Mesh(devices[:size], ("chains",))
        thr, dt = throughput(mesh, flow, params, target, log)
        results[size] = thr
        print(json.dumps({
            "metric": "neutra_hmc_draws_per_s",
            "mesh_devices": size,
            "value": round(thr, 1),
            "unit": "draws/s",
            "chains": CHAINS_PER_DEVICE * size,
            "sample_s": round(dt, 3),
        }))

    if n > 1:
        eff = results[n] / (n * results[1])
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(eff, 4),
            "unit": "fraction",
            "vs_baseline": round(eff / 0.9, 4),
            "devices": n,
            "note": ("fake CPU devices share host cores; efficiency is only "
                     "meaningful on real chips"
                     if jax.default_backend() == "cpu" else "real devices"),
        }))
    else:
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": None,
            "note": "single device visible; run on a pod slice or with "
                    "xla_force_host_platform_device_count=N",
        }))


if __name__ == "__main__":
    main()
