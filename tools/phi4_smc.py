"""Phi4 free-energy cross-check via flow-proposal SMC (VERDICT r3 item 5).

The parity criterion for free energies is cross-estimator agreement
(reference applications/src/test.py:61-68: BAR / MBAR / forward+reverse
Zwanzig). The Zwanzig estimators are one-sided and collapse when the flow
and target ensembles overlap poorly; SMC with the trained flow as proposal
(mcmc/smc.py:flow_smc) anneals between exactly those two densities and its
log-evidence is a THIRD independent estimate that stays unbiased under weak
overlap:

  dF/particle = -log Z_target / N   (flow density is exactly normalized,
                                     kT = 1 for the phi^4 action)

Usage: python tools/phi4_smc.py [configs/Phi4.yaml] [n_particles=8192]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from normalizingflow_tpu.apps.test import load_trained
from normalizingflow_tpu.config import load_config
from normalizingflow_tpu.mcmc.smc import flow_smc


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config(argv[0] if argv else "configs/Phi4.yaml")
    n = int(argv[1]) if len(argv) > 1 else 8192
    flow, params, potential, cfg = load_trained(cfg)
    npart = cfg.dataset.nparticles * cfg.dataset.dim

    estimates = []
    for seed in range(3):
        res = flow_smc(
            jax.random.PRNGKey(1000 + seed), flow, params, potential, n,
            n_mutation_steps=4, num_leapfrog=8, step_size=0.1,
        )
        df = -float(res.log_evidence) / npart
        estimates.append(df)
        print(f"seed {seed}: log Z = {float(res.log_evidence):.3f}  "
              f"stages = {int(res.n_stages)}  "
              f"final accept = {float(res.final_accept):.3f}  "
              f"dF/particle = {df:.4f}")
    mean = sum(estimates) / len(estimates)
    std = (sum((e - mean) ** 2 for e in estimates) / len(estimates)) ** 0.5
    print(f"smc dF/particle over {len(estimates)} runs: "
          f"{mean:.4f} +/- {std:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
