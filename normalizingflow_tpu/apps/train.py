"""Training CLI: `python -m normalizingflow_tpu.apps.train <config.yaml>`.

Counterpart of /root/reference/applications/src/train.py:41-49 (whose CLI is
`python train.py <ConfigName>`); accepts a path to a reference-format YAML
(see configs/)."""

from __future__ import annotations

import logging
import os
import sys

import jax

from ..config import load_config, setup_model
from ..train.fused import train_flow_fused


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: nftpu-train <config.yaml>", file=sys.stderr)
        return 2
    cfg = load_config(argv[0])
    logging.basicConfig(level=logging.INFO)

    flow, potential, cfg = setup_model(cfg, mode="training")
    tp = cfg.train_parameters
    os.makedirs(cfg.output.model_dir, exist_ok=True)
    ckpt = os.path.join(
        cfg.output.model_dir, f"{cfg.dataset.name}.msgpack"
    )
    params, history = train_flow_fused(
        flow,
        jax.random.PRNGKey(cfg.seed),
        potential,
        max_epochs=tp.max_epochs,
        batch_size=tp.batch_size,
        learning_rate=tp.learning_rate,
        scheduler=tp.scheduler,
        gamma=tp.lr_scheduler_gamma,
        output_freq=tp.output_freq,
        checkpoint_path=ckpt,
    )
    print(f"best logprob: {history['best_logprob']:.3f}; checkpoint: {ckpt}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
