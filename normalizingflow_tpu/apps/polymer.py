"""Polymer field-theory experiment CLI -- counterpart of
/root/reference/applications/examples/polymer.py:8-44.

`python -m normalizingflow_tpu.apps.polymer <config.yaml> {training|testing}`

RealNVP (or NSF_AR) on flattened 2x32x32 polymer field configurations;
testing generates fields, saves them as .npy, and compares generated vs
held-out log-density.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_config
from .fe_eval import evaluate, generate_from_nf
from .test import load_trained
from .train import main as train_main


def save_field(cfg, x, shape=(2, 32, 32)):
    x = np.asarray(x).reshape((-1,) + shape)
    os.makedirs(cfg.output.testing_dir, exist_ok=True)
    path = os.path.join(cfg.output.testing_dir, "generated_fields.npy")
    np.save(path, x)
    return path


def plot_field(x, outdir=".", shape=(2, 32, 32)):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(x).reshape(shape)
    for name, field in zip(("omega_plus", "omega_minus"), x):
        plt.figure()
        plt.imshow(field)
        plt.savefig(os.path.join(outdir, f"{name}.png"))
        plt.close()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2 or argv[1] not in ("training", "testing"):
        print("usage: python -m normalizingflow_tpu.apps.polymer "
              "<config.yaml> {training|testing}", file=sys.stderr)
        return 2
    if argv[1] == "training":
        return train_main([argv[0]])

    cfg = load_config(argv[0])
    flow, params, potential, cfg = load_trained(cfg)
    key = jax.random.PRNGKey(cfg.seed + 3)
    nsamples = 100
    x1, q1 = generate_from_nf(flow, params, key, nsamples, batchsize=100)
    save_field(cfg, x1)
    x2 = potential.sample(jax.random.fold_in(key, 1), nsamples)
    q2 = evaluate(flow, params, x2.reshape(len(x2), -1))
    print(
        "logp of generated data vs testing data:",
        float(jnp.mean(q1)), float(jnp.mean(q2)),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
