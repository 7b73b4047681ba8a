"""Fe free-energy experiment CLI -- counterpart of
/root/reference/applications/examples/fe.py:30-59.

`python -m normalizingflow_tpu.apps.fe <config.yaml> {training|testing}`

training: forward-KL training on the MD trajectory dataset.
testing: generate 2000 flow samples, compare their logp with held-out MD
data (fe.py:38-43), then BAR Delta F over the independent MD datasets listed
in the data directory (fe_diff_ntrials, fe.py:49-55).
"""

from __future__ import annotations

import glob
import os
import sys

import jax
import jax.numpy as jnp

from ..config import load_config
from .fe_eval import evaluate, fe_diff, fe_diff_ntrials, generate_from_nf
from .test import load_trained
from .train import main as train_main


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2 or argv[1] not in ("training", "testing"):
        print("usage: python -m normalizingflow_tpu.apps.fe <config.yaml> "
              "{training|testing}", file=sys.stderr)
        return 2
    if argv[1] == "training":
        return train_main([argv[0]])

    cfg = load_config(argv[0])
    flow, params, potential, cfg = load_trained(cfg)
    key = jax.random.PRNGKey(cfg.seed + 2)
    nsamples = 2000

    x1, q1 = generate_from_nf(flow, params, key, nsamples, batchsize=500)
    x2 = potential.sample(jax.random.fold_in(key, 1), nsamples)
    q2 = evaluate(flow, params, x2.reshape(len(x2), -1), batchsize=500)
    print(
        "logp of generated data vs testing data:",
        float(jnp.mean(q1)), float(jnp.mean(q2)),
    )

    # independent MD datasets: ../data/fe/run_*/<name>_test.xyz convention
    pattern = os.path.join(
        os.path.dirname(cfg.dataset.testing_data or "."), "..",
        "run_*", os.path.basename(cfg.dataset.testing_data or ""),
    )
    paths = sorted(glob.glob(pattern))
    if len(paths) > 1:
        mean, std, bars = fe_diff_ntrials(
            flow, params, potential, key, nsamples,
            cfg.dataset.nparticles, paths, kT=cfg.dataset.kT,
        )
        print(f"BAR dF over {len(paths)} datasets: {mean:.6f} +/- {std:.6f}")
    else:
        out = fe_diff(
            flow, params, potential, key, nsamples,
            cfg.dataset.nparticles, kT=cfg.dataset.kT,
        )
        print(
            f"bar={out['bar']:.6f} md={out['md']:.6f} nf={out['nf']:.6f} "
            f"emus={out['emus']:.6f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
