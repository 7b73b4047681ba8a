"""Design sweep for the weak-fit physics configs (VERDICT r4 item 5).

PARITY_RESULTS' Phi4 (+0.680 kT/ptcl) and Fe_400K (+0.733 kT/ptcl)
held-out logp gaps got no design exploration in r4 while the bench flow
got a full sweep. This tool gives the physics flows the same treatment:
train a grid of architecture/training variants of a config and report the
reference's own quality metric -- the held-out gap per particle
(/root/reference/applications/examples/fe.py:43) -- one table row per
variant. Optionally finishes a variant with reverse-KL fine-tuning against
the differentiable target density (a capability the reference's
dataset-only training loop lacks; setup.py:90-94 defines but never uses
reverseKL).

Usage:
  python tools/fit_sweep.py configs/Phi4.yaml            # built-in grid
  python tools/fit_sweep.py configs/Phi4.yaml --quick    # smoke subset
  python tools/fit_sweep.py configs/Fe_400K.yaml --variants big,long

Writes runs/fit_sweep_<name>.json and prints a markdown table.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from normalizingflow_tpu.apps.fe_eval import evaluate, generate_from_nf
from normalizingflow_tpu.config import load_config, setup_model
from normalizingflow_tpu.train.fused import train_flow_fused
from normalizingflow_tpu.train.objectives import rkl_finetune

# Each variant: (flow overrides, train overrides, rkl fine-tune steps).
# Grid rationale: one axis per hypothesis about the gap --
#   capacity (hidden/nlayers/nsplines), optimization length (epochs),
#   objective (reverse-KL fine-tune sharpens the fit against the target
#   density itself instead of the finite sample).
VARIANTS = {
    "baseline": ({}, {}, 0),
    "short": ({}, {"max_epochs": 0.5}, 0),              # overfit probe
    "long": ({}, {"max_epochs": 3.0}, 0),               # 3x epochs
    "wide": ({"hidden_dim": 2.0}, {}, 0),               # 2x hidden
    "deep": ({"nlayers": 2.0}, {}, 0),                  # 2x layers
    "bins": ({"nsplines": 2.0}, {}, 0),                 # 2x spline bins
    "rkl": ({}, {}, 2000),                              # + reverse-KL tune
    "big_long": ({"hidden_dim": 2.0, "nlayers": 2.0},
                 {"max_epochs": 2.0}, 0),
}
QUICK = ("baseline", "rkl")


def apply_overrides(cfg, flow_ov, train_ov):
    fl = cfg.flow
    for k, mult in flow_ov.items():
        fl = dataclasses.replace(fl, **{k: int(getattr(fl, k) * mult)})
    tp = cfg.train_parameters
    for k, mult in train_ov.items():
        tp = dataclasses.replace(tp, **{k: int(getattr(tp, k) * mult)})
    return dataclasses.replace(cfg, flow=fl, train_parameters=tp)


def heldout_gap(flow, params, cfg, nsamples=2000):
    """Reference metric (examples/fe.py:38-43): mean logp of generated vs
    held-out frames, plus the per-particle gap."""
    key = jax.random.PRNGKey(cfg.seed + 2)
    _, q1 = generate_from_nf(flow, params, key, nsamples, batchsize=500)
    test = np.load(os.path.join(REPO, cfg.dataset.testing_data))
    test = jnp.asarray(test.reshape(len(test), -1))
    q2 = evaluate(flow, params, test, batchsize=500)
    gen, held = float(jnp.mean(q1)), float(jnp.mean(q2))
    return gen, held, (gen - held) / cfg.dataset.nparticles


def run_variant(name, base_cfg, flow_ov, train_ov, rkl_steps):
    cfg = apply_overrides(base_cfg, flow_ov, train_ov)
    flow, potential, cfg = setup_model(cfg, mode="training")
    tp = cfg.train_parameters
    t0 = time.time()
    params, hist = train_flow_fused(
        flow, jax.random.PRNGKey(cfg.seed), potential,
        max_epochs=tp.max_epochs, batch_size=tp.batch_size,
        learning_rate=tp.learning_rate, scheduler=tp.scheduler,
        gamma=tp.lr_scheduler_gamma, output_freq=tp.output_freq,
        checkpoint_path=None,
    )
    rkl_loss = None
    if rkl_steps:
        # target density for reverse KL: the config's own differentiable
        # potential (log_prob), not the finite trajectory sample.
        params, rkl_loss = rkl_finetune(flow, params, potential, rkl_steps)
    t_train = time.time() - t0
    gen, held, gap = heldout_gap(flow, params, cfg)
    row = {
        "variant": name,
        "flow": {k: getattr(cfg.flow, k)
                 for k in ("nlayers", "nsplines", "hidden_dim")},
        "epochs": tp.max_epochs,
        "rkl_steps": rkl_steps,
        "rkl_final_loss": rkl_loss,
        "best_logprob": hist["best_logprob"],
        "logp_gen": round(gen, 2),
        "logp_heldout": round(held, 2),
        "gap_per_ptcl": round(gap, 4),
        "train_s": round(t_train, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if "--cpu" in argv:
        # Phi4-scale variants train in ~minutes on the host CPU; running
        # the sweep there keeps the chip free for the parity campaign.
        # The gap question is architecture-level, not backend-level.
        argv = [a for a in argv if a != "--cpu"]
        jax.config.update("jax_platforms", "cpu")
    cfg_path = argv[0] if argv else "configs/Phi4.yaml"
    names = list(VARIANTS)
    if "--quick" in argv:
        names = list(QUICK)
    for i, a in enumerate(argv):
        if a == "--variants":
            names = argv[i + 1].split(",")
    base_cfg = load_config(cfg_path)
    out_path = os.path.join(
        REPO, "runs", f"fit_sweep_{base_cfg.dataset.name}.json")
    rows = []
    for name in names:
        flow_ov, train_ov, rkl_steps = VARIANTS[name]
        try:
            rows.append(run_variant(name, base_cfg, flow_ov, train_ov,
                                    rkl_steps))
        except Exception as e:  # keep sweeping; report the failure
            rows.append({"variant": name, "error": repr(e)[:300]})
            print(f"{name}: FAILED {e!r}", flush=True)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=1)
    print("\n| variant | layers | bins | hidden | epochs | rkl | "
          "gap kT/ptcl | train s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['variant']} | - | - | - | - | - | ERROR | - |")
            continue
        fl = r["flow"]
        print(f"| {r['variant']} | {fl['nlayers']} | {fl['nsplines']} | "
              f"{fl['hidden_dim']} | {r['epochs']} | {r['rkl_steps']} | "
              f"{r['gap_per_ptcl']:+.3f} | {r['train_s']} |")
    print(f"table data -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
