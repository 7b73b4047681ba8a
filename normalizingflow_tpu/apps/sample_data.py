"""Generate MD-equivalent training data with the built-in HMC engine.

`python -m normalizingflow_tpu.apps.sample_data <config.yaml> [nframes]`

The reference trains on externally produced LAMMPS trajectories
(cfg.dataset.training_data xyz files, SURVEY.md §2.3) that are not shipped
with it. This app replaces that pipeline end-to-end: it runs warmup-adapted
HMC chains on the config's own differentiable potential (LJ, EAM-Fe, phi^4,
Einstein crystal, Gaussian mixture) at the config's kT, starting from the
prior (Einstein-crystal lattice noise), and writes train/test .npy
trajectories to the paths named in the config.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..config import infer_boxlength, load_config, build_potential
from ..mcmc import run_hmc


def generate(cfg, nframes=2000, chains=256, thin=2, seed=0):
    # chains=256: data-gen wall-clock is dominated by the 500-step warmup,
    # which is chain-vectorized -- 4x the chains gives 4x the frames for
    # free. More (and more independent) frames matter: an NSF_AR at Fe
    # scale (88M params) trained 15000 epochs on 1600 frames MEMORIZES them
    # (train logp +266 vs held-out -4 at identical energies); at 8000
    # frames the train/held-out gap closes (see PARITY_RESULTS.md).
    b, boxlength = infer_boxlength(cfg.dataset)
    prior = build_potential(
        cfg.prior.type, cfg.prior, cfg.dataset, boxlength=boxlength
    )
    ds = cfg.dataset
    target = build_potential(ds.potential, ds, ds, boxlength=boxlength)

    key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    init = prior.sample(k_init, chains)

    # Chain-batched target (r5): the potentials evaluate (chains, dim)
    # batches natively, and the batched kernel avoids the per-chain
    # vmap x scan x grad gather lowering that faulted the TPU runtime on
    # tabulated-EAM (tools/eam_tpu_repro.py). PRNG streams are identical
    # to the vmapped kernel (tests/test_hmc.py), so regenerated datasets
    # are bit-for-bit the same.
    def logprob(x):
        return target.log_prob(x)

    draws = -(-nframes // chains)
    # Segmented generation: the TPU worker reproducibly crashes partway
    # through a single dispatch containing warmup + ~40 draws of the EAM
    # target (observed r3 and r4, "TPU worker process crashed"), while the
    # same program with <= 8 draws always completes. Run warmup + the first
    # segment once, then continue in <= 8-draw segments from the carried
    # final_state with the adapted step size / mass, fetching each segment
    # to the host -- identical chains, shorter dispatches.
    seg = 8
    res = run_hmc(
        k_run, logprob, init,
        num_samples=min(draws, seg), num_warmup=500, step_size=0.05,
        num_leapfrog=10, thin=thin, batched_target=True,
    )
    parts = [np.asarray(res.samples)]
    accepts = [float(res.accept_rate)]
    done = min(draws, seg)
    while done < draws:
        res = run_hmc(
            jax.random.fold_in(k_run, done), logprob,
            res.final_state.position,
            num_samples=min(draws - done, seg), num_warmup=0,
            step_size=float(res.step_size),
            inv_mass_diag=res.inv_mass_diag,
            num_leapfrog=10, thin=thin, batched_target=True,
        )
        parts.append(np.asarray(res.samples))
        accepts.append(float(res.accept_rate))
        done += min(draws - done, seg)
    frames = np.concatenate(parts).reshape(-1, init.shape[1])[:nframes]
    # Periodic systems: HMC positions random-walk out of the box (the
    # potential is minimum-image periodic, so energies don't care) -- but
    # the flow's spline domain is [-L/2, L/2] with identity tails, and
    # LAMMPS (the reference's data source) wraps coordinates. Un-wrapped,
    # ~13%% of LJ coordinates land outside the box and training plateaus
    # ~600 nats below a trivial Gaussian fit. Wrap by minimum image, the
    # same convention the potentials and the Einstein prior use.
    box = getattr(target, "boxlength", None)
    if box:
        frames = frames - np.round(frames / box) * box
    return frames, float(np.mean(accepts))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    seed = 0
    test_only = None
    rest = []
    it = iter(argv)
    for a in it:
        if a == "--seed":
            seed = int(next(it))
        elif a == "--test-only":
            # Write the WHOLE run as one independent test dataset (for
            # fe_diff_ntrials' mean+/-std over independent MD datasets,
            # reference examples/fe.py:49-55).
            test_only = next(it)
        else:
            rest.append(a)
    argv = rest
    if not argv:
        print("usage: python -m normalizingflow_tpu.apps.sample_data "
              "<config.yaml> [nframes] [--seed N] [--test-only out.npy]",
              file=sys.stderr)
        return 2
    cfg = load_config(argv[0])
    nframes = int(argv[1]) if len(argv) > 1 else 2000

    frames, acc = generate(cfg, nframes, seed=seed)
    if test_only is not None:
        os.makedirs(os.path.dirname(os.path.abspath(test_only)),
                    exist_ok=True)
        np.save(test_only, frames)
        print(f"wrote {len(frames)} independent test frames "
              f"(HMC acceptance {acc:.2f}, seed {seed}) -> {test_only}")
        return 0
    train_path = cfg.dataset.training_data
    test_path = cfg.dataset.testing_data
    n_train = int(0.8 * len(frames))
    for path, arr in ((train_path, frames[:n_train]),
                      (test_path, frames[n_train:])):
        if path is None:
            continue
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if path.endswith(".npy"):
            np.save(path, arr)
        else:
            from ..io.xyz import write_xyz

            write_xyz(path, arr, cfg.dataset.nparticles)
    print(f"wrote {n_train} train + {len(frames) - n_train} test frames "
          f"(HMC acceptance {acc:.2f}) -> {train_path}, {test_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
