"""GaussianMixture fit sweep (VERDICT r2 item 3).

Round 2 trained configs/GaussianMixture.yaml at the reference's exact
hyperparameters (2000 epochs, lr 1e-3, exponential decay;
/root/reference/applications/input/GaussianMixture.yaml) and got a held-out
logp gap of -1.03 kT/sample — the flow was overdispersed. This sweep trains
variants and reports the gap (mean flow-logp of generated samples minus of
exact target samples, the reference's own quality check, examples/fe.py:43)
plus the one-sided reverse-Zwanzig `nf` estimate (exact answer 0), so the
winning setting in configs/GaussianMixture.yaml is a reproducible decision,
not a prose claim.

Usage: python tools/gm_fit_sweep.py [variant ...]   (default: all)
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

from normalizingflow_tpu.config import load_config, setup_model
from normalizingflow_tpu.train.fused import train_flow_fused

VARIANTS = {
    # reference hyperparameters, verbatim (round-2 baseline: gap -1.03)
    "ref": {},
    # longer schedule, same lr
    "6k_cosine": {"max_epochs": 6000, "scheduler": "cosine"},
    # longer + hotter
    "6k_cosine_lr3e3": {"max_epochs": 6000, "scheduler": "cosine",
                        "learning_rate": 3e-3},
    # depth instead of schedule
    "2layer_6k": {"max_epochs": 6000, "scheduler": "cosine", "nlayers": 2},
    # reference epochs, hotter lr (Gaussian.yaml uses 5e-3)
    "lr5e3": {"learning_rate": 5e-3},
    # round 2 of the sweep: depth is what moved the needle
    "3layer_6k": {"max_epochs": 6000, "scheduler": "cosine", "nlayers": 3},
    "4layer_6k": {"max_epochs": 6000, "scheduler": "cosine", "nlayers": 4},
    "2layer_12k": {"max_epochs": 12000, "scheduler": "cosine", "nlayers": 2},
    "2layer_6k_bins32": {"max_epochs": 6000, "scheduler": "cosine",
                         "nlayers": 2, "nsplines": 32},
    "2layer_6k_nonper": {"max_epochs": 6000, "scheduler": "cosine",
                         "nlayers": 2, "periodic": False},
    # round 3: budget / width / batch at 4 layers
    "4layer_20k": {"max_epochs": 20000, "scheduler": "cosine", "nlayers": 4},
    "6layer_6k": {"max_epochs": 6000, "scheduler": "cosine", "nlayers": 6},
    "4layer_6k_b256": {"max_epochs": 6000, "scheduler": "cosine",
                       "nlayers": 4, "batch_size": 256},
    "4layer_6k_h160": {"max_epochs": 6000, "scheduler": "cosine",
                       "nlayers": 4, "hidden_dim": 160},
    "4layer_20k_b256": {"max_epochs": 20000, "scheduler": "cosine",
                        "nlayers": 4, "batch_size": 256},
}


def run(name, overrides):
    cfg = load_config("configs/GaussianMixture.yaml")
    fc = cfg.flow
    for k in ("nlayers", "nsplines", "periodic", "hidden_dim"):
        if k in overrides:
            fc = dataclasses.replace(fc, **{k: overrides[k]})
    tp = cfg.train_parameters
    tp = dataclasses.replace(
        tp,
        max_epochs=overrides.get("max_epochs", tp.max_epochs),
        learning_rate=overrides.get("learning_rate", tp.learning_rate),
        scheduler=overrides.get("scheduler", tp.scheduler),
        batch_size=overrides.get("batch_size", tp.batch_size),
    )
    cfg = dataclasses.replace(cfg, flow=fc, train_parameters=tp)
    flow, potential, cfg = setup_model(cfg, mode="training")

    t0 = time.time()
    params, hist = train_flow_fused(
        flow, jax.random.PRNGKey(cfg.seed), potential,
        max_epochs=tp.max_epochs, batch_size=tp.batch_size,
        learning_rate=tp.learning_rate, scheduler=tp.scheduler,
        gamma=tp.lr_scheduler_gamma, output_freq=tp.output_freq,
    )
    train_s = time.time() - t0

    key = jax.random.PRNGKey(cfg.seed + 2)
    n = 2000
    x1, q1, _ = jax.jit(lambda k: flow.sample(params, k, n))(key)
    x2 = potential.sample(jax.random.fold_in(key, 1), n)
    q2 = jax.jit(lambda x: flow.log_prob(params, x))(x2)
    # reverse Zwanzig over flow samples: log mean exp(logp_target - logp_flow)
    u1 = potential.log_prob(x1)
    npart = cfg.dataset.nparticles
    nf = float(
        (jax.scipy.special.logsumexp(u1 - q1) - jnp.log(n)) / npart
    )
    gap = float(jnp.mean(q1) - jnp.mean(q2))
    out = {"variant": name, "overrides": overrides,
           "logp_gen": round(float(jnp.mean(q1)), 3),
           "logp_test": round(float(jnp.mean(q2)), 3),
           "gap": round(gap, 3), "rev_zwanzig_nf": round(nf, 4),
           "best_logprob": round(hist["best_logprob"], 3),
           "train_s": round(train_s, 1)}
    print(json.dumps(out), flush=True)
    return out


def main():
    names = sys.argv[1:] or list(VARIANTS)
    results = [run(n, VARIANTS[n]) for n in names]
    print("\nsummary (gap closest to 0 wins):")
    for r in sorted(results, key=lambda r: abs(r["gap"])):
        print(f"  {r['variant']:18s} gap={r['gap']:+.3f} "
              f"nf={r['rev_zwanzig_nf']:+.4f} train={r['train_s']:.0f}s")


if __name__ == "__main__":
    main()
