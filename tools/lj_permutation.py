"""LJ site-hopping diagnostic (VERDICT r3 item 6).

PARITY_RESULTS claims the +255-nat LJ held-out logp gap is lattice-site
EXCHANGE physics, not a training failure: the flow (Einstein-site prior,
reference architecture of applications/input/LJ.yaml) indexes atoms by
lattice site, so a data frame in which atoms have swapped sites is a
low-density point of the learned density even when its ENERGY is perfect.

This tool tests that claim directly: relabel each held-out frame's atoms to
their nearest lattice site (optimal assignment under minimum-image metric,
i.e. undo the permutation part of the motion, keeping every displacement)
and re-evaluate the flow log-density. If the gap is permutation physics,
logp(relabeled held-out) must jump by hundreds of nats toward logp(gen);
if the flow were simply a bad fit of the local density, relabeling would
change almost nothing.

Usage: python tools/lj_permutation.py [configs/LJ.yaml]
Writes a summary line + per-frame stats; quote the numbers in
PARITY_RESULTS.md.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from normalizingflow_tpu.apps.fe_eval import evaluate, generate_from_nf
from normalizingflow_tpu.apps.test import load_trained
from normalizingflow_tpu.config import load_config


def min_image(dx, L):
    return dx - L * np.round(dx / L)


def relabel_to_sites(frames, centers, L):
    """Optimal atom->site relabeling per frame (Hungarian, PBC metric).

    frames (n, natoms, 3), centers (natoms, 3). Returns (relabeled frames,
    #frames with a non-identity permutation, mean #atoms displaced)."""
    n, natoms, _ = frames.shape
    out = np.empty_like(frames)
    n_permuted = 0
    n_moved = 0
    for i in range(n):
        dx = frames[i][:, None, :] - centers[None, :, :]
        d2 = (min_image(dx, L) ** 2).sum(-1)
        rows, cols = linear_sum_assignment(d2)
        perm = np.empty(natoms, dtype=int)
        perm[cols] = rows  # atom perm[j] is assigned to site j
        out[i] = frames[i][perm]
        moved = int((perm != np.arange(natoms)).sum())
        n_permuted += moved > 0
        n_moved += moved
    return out, n_permuted, n_moved / n


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if "--cpu" in argv:
        # Diagnostic is cheap (dim-96 eval of ~500 frames) and the verdict
        # is hundreds of nats -- run on host CPU so it never contends with
        # a TPU campaign. Must precede any computation (CLAUDE.md).
        argv = [a for a in argv if a != "--cpu"]
        jax.config.update("jax_platforms", "cpu")
    cfg = load_config(argv[0] if argv else "configs/LJ.yaml")
    flow, params, potential, cfg = load_trained(cfg)
    centers = np.asarray(flow.prior.centers)  # (natoms, 3) Einstein lattice
    L = float(flow.prior.boxlength)
    natoms = centers.shape[0]

    test = np.load(os.path.join(REPO, cfg.dataset.testing_data))
    test = test.reshape(len(test), natoms, 3).astype(np.float32)

    relabeled, n_perm, mean_moved = relabel_to_sites(test, centers, L)

    lp_raw = evaluate(flow, params, jnp.asarray(test.reshape(len(test), -1)))
    lp_rel = evaluate(
        flow, params, jnp.asarray(relabeled.reshape(len(test), -1))
    )
    _, lp_gen = generate_from_nf(
        flow, params, jax.random.PRNGKey(123), len(test)
    )

    raw, rel, gen = (float(jnp.mean(a)) for a in (lp_raw, lp_rel, lp_gen))
    # energy invariance sanity: relabeling is a permutation, U must not move
    u_raw = float(jnp.mean(potential.potential(
        jnp.asarray(test.reshape(len(test), -1)))))
    u_rel = float(jnp.mean(potential.potential(
        jnp.asarray(relabeled.reshape(len(test), -1)))))

    print(f"frames: {len(test)}  atoms: {natoms}  box L: {L:.3f}")
    print(f"non-identity assignment in {n_perm}/{len(test)} frames; "
          f"mean atoms off their own site: {mean_moved:.1f}/{natoms}")
    print(f"energy invariance: mean U raw {u_raw:.3f} vs relabeled "
          f"{u_rel:.3f} (must match)")
    print(f"mean flow logp: generated {gen:.2f}  held-out RAW {raw:.2f}  "
          f"held-out RELABELED {rel:.2f}")
    print(f"gap vs generated: raw {gen - raw:+.2f}  "
          f"relabeled {gen - rel:+.2f}  "
          f"(recovered {(rel - raw) / max(gen - raw, 1e-9) * 100:.1f}% "
          "of the gap by undoing the site permutation)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
