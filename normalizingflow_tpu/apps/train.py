"""Training CLI:
`python -m normalizingflow_tpu.apps.train <config.yaml> [--resume]`.

Counterpart of /root/reference/applications/src/train.py:41-49 (whose CLI is
`python train.py <ConfigName>`); accepts a path to a reference-format YAML
(see configs/). `--resume` continues bit-exact from the run's `.last`
full-state checkpoint (params + optimizer + PRNG key + epoch) -- the
reference can only load-for-eval (setup.py:102-109), not resume."""

from __future__ import annotations

import logging
import os
import sys

import jax

from ..config import load_config, setup_model
from ..train.fused import train_flow_fused


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    resume = "--resume" in argv
    argv = [a for a in argv if a != "--resume"]
    if not argv:
        print("usage: nftpu-train <config.yaml> [--resume]", file=sys.stderr)
        return 2
    cfg = load_config(argv[0])
    logging.basicConfig(level=logging.INFO)

    flow, potential, cfg = setup_model(cfg, mode="training")
    tp = cfg.train_parameters
    os.makedirs(cfg.output.model_dir, exist_ok=True)
    ckpt = os.path.join(
        cfg.output.model_dir, f"{cfg.dataset.name}.msgpack"
    )
    resume_from = ckpt + ".last" if resume else None
    if resume_from and not os.path.exists(resume_from):
        print(f"--resume: no checkpoint at {resume_from}; starting fresh",
              file=sys.stderr)
        resume_from = None
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
        resume_from=resume_from,
    )
    print(f"best logprob: {history['best_logprob']:.3f}; checkpoint: {ckpt}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
