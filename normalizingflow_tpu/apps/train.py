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
    hmc_mix_flag = "--hmc-mix" in argv
    argv = [a for a in argv if a not in ("--resume", "--hmc-mix")]
    if not argv:
        print("usage: nftpu-train <config.yaml> [--resume] [--hmc-mix]",
              file=sys.stderr)
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

    # Acceptance-gated HMC data mixing (reference train.py:14-19): only
    # possible when the training target is a differentiable potential the
    # built-in HMC can relax against (LJ/Fe/analytic -- the reference's
    # `sim` argument); pure trajectory datasets have no energy function.
    hmc_mixer = None
    if hmc_mix_flag or tp.hmc_mix:
        if hasattr(potential, "log_prob"):
            from ..mcmc.relaxation import collect_hmc_data

            def hmc_mixer(k, params):
                # targets' log_prob already folds in kT -> pass kT=1
                return collect_hmc_data(
                    k, flow, params, potential,
                    n_chains=tp.hmc_mix_chains,
                    step_size=tp.hmc_mix_step_size,
                    num_leapfrog=tp.hmc_mix_leapfrog,
                    output_dir=cfg.output.training_dir,
                    n_particles=cfg.dataset.nparticles,
                )
        else:
            print("hmc_mix requested but the training target has no "
                  "log_prob (pure dataset); mixing disabled",
                  file=sys.stderr)

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
        hmc_mixer=hmc_mixer,
    )
    if tp.rkl_finetune_steps:
        if hasattr(potential, "log_prob"):
            from ..train.checkpoint import save_checkpoint
            from ..train.objectives import rkl_finetune

            params, rkl_loss = rkl_finetune(
                flow, params, potential, tp.rkl_finetune_steps,
                lr=tp.rkl_finetune_lr, batch=tp.rkl_finetune_batch,
            )
            # The tuned model becomes the checkpoint the eval CLIs load
            # (same 5-key schema; .last keeps the forward-KL train state
            # for bit-exact resume).
            import numpy as _np

            save_checkpoint(ckpt, {
                "params": params, "opt_state": None, "key": None,
                "epoch": _np.asarray(tp.max_epochs),
                "losses": _np.asarray(history["losses"], _np.float32),
            })
            print(f"rkl fine-tune: {tp.rkl_finetune_steps} steps, "
                  f"final reverse KL {rkl_loss:.3f}")
        else:
            print("rkl_finetune_steps set but the training target has no "
                  "log_prob (pure dataset); fine-tune skipped",
                  file=sys.stderr)
    print(f"best logprob: {history['best_logprob']:.3f}; checkpoint: {ckpt}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
