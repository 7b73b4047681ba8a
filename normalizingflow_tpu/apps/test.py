"""Free-energy evaluation CLI: `python -m normalizingflow_tpu.apps.test
<config.yaml>` -- counterpart of /root/reference/applications/src/test.py:
93-102 (load trained model, run fe_diff, print the four estimates)."""

from __future__ import annotations

import os
import sys

import jax

from ..config import load_config, setup_model
from ..train.checkpoint import load_checkpoint
from .fe_eval import fe_diff


def load_trained(cfg, mode="testing"):
    flow, potential, cfg = setup_model(cfg, mode=mode)
    ckpt = os.path.join(cfg.output.model_dir, f"{cfg.dataset.name}.msgpack")
    # Template on host CPU: it only supplies pytree structure, and a
    # device-side init would put a second multi-GB params copy on the chip
    # (2048-dim Polymer: 3.7 GB) plus a pointless compile over the tunnel.
    with jax.default_device(jax.devices("cpu")[0]):
        template_params = flow.init(jax.random.PRNGKey(0))
    state = load_checkpoint(
        ckpt,
        {"params": template_params, "opt_state": None, "key": None,
         "epoch": 0, "losses": None},
    )
    return flow, state["params"], potential, cfg


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: nftpu-test <config.yaml>", file=sys.stderr)
        return 2
    cfg = load_config(argv[0])
    flow, params, potential, cfg = load_trained(cfg)
    os.makedirs(cfg.output.testing_dir, exist_ok=True)
    # relaxation=True is the reference's default for particle systems
    # (test.py:98); analytic low-dim targets don't need it.
    relaxation = cfg.dataset.potential in ("LJ", "Fe", "EAM")
    out = fe_diff(
        flow, params, potential, jax.random.PRNGKey(cfg.seed + 1),
        nsamples=500, n_particles=cfg.dataset.nparticles, kT=cfg.dataset.kT,
        plot_path=os.path.join(
            cfg.output.testing_dir, f"Q_{cfg.dataset.name}.png"
        ),
        relaxation=relaxation,
    )
    print(
        f"bar={out['bar']:.6f} md={out['md']:.6f} nf={out['nf']:.6f} "
        f"emus={out['emus']:.6f}  (kT per particle)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
