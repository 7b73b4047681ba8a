"""Minimal TPU repro + A/B for the tabulated-EAM spline lookup lowerings.

VERDICT r4 item 4: the setfl path's spline-table gathers reproducibly
crashed the TPU worker ("kernel fault") inside long jitted HMC programs,
so the r4 campaign silently ran the analytic Finnis-Sinclair form. This
tool reduces that to a controlled experiment: for each lookup lowering in
targets/eam.py (`take` / `split` / `cheb`, see its module docstring), run
the EXACT crashing structure -- warmup-adapted chain-vmapped HMC with
value_and_grad of the tabulated energy inside one scanned dispatch -- in a
SUBPROCESS, so a worker crash is recorded instead of ending the sweep.

Usage:
  python tools/eam_tpu_repro.py                 # parent: sweep all impls
  python tools/eam_tpu_repro.py --child take    # one impl, in-process

Writes runs/eam_repro.json with {impl: {ok, seconds, accept, energy, tail}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SETFL = os.path.join(REPO, "data", "fe_fs.setfl")
OUT = os.path.join(REPO, "runs", "eam_repro.json")

CHAINS = 256
WARMUP = 200
DRAWS = 16
LEAPFROG = 10


def child(impl):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from normalizingflow_tpu.distributions import EinsteinCrystal
    from normalizingflow_tpu.io.xyz import read_xyz
    from normalizingflow_tpu.mcmc import run_hmc
    from normalizingflow_tpu.targets.eam import EAMIron

    boxlength = 3 * 2.9115
    fe = EAMIron(54, boxlength=boxlength, kT=0.034469333048,
                 setfl_path=SETFL)
    lattice = np.asarray(read_xyz(os.path.join(REPO, "data",
                                               "fe_bcc_ref.xyz")))
    prior = EinsteinCrystal(lattice.reshape(-1), alpha=300.0,
                            boxlength=boxlength)
    init = prior.sample(jax.random.PRNGKey(0), CHAINS)

    def logprob(x):
        return -fe.potential(
            x.reshape(1, -1), impl=impl
        )[0] / fe.kT

    print(f"[{impl}] devices: {jax.devices()}", flush=True)
    t0 = time.time()
    res = run_hmc(
        jax.random.PRNGKey(1), logprob, init, num_samples=DRAWS,
        num_warmup=WARMUP, step_size=0.05, num_leapfrog=LEAPFROG,
    )
    jax.block_until_ready(res.samples)
    dt = time.time() - t0
    e = float(jnp.mean(fe.potential(res.samples[-1], impl=impl)))
    print(json.dumps({
        "impl": impl, "ok": True, "seconds": round(dt, 1),
        "accept": round(float(res.accept_rate), 3),
        "mean_energy_eV": round(e, 3),
    }), flush=True)
    return 0


def main():
    if "--child" in sys.argv:
        return child(sys.argv[sys.argv.index("--child") + 1])
    results = {}
    for impl in ("take", "split", "cheb"):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", impl],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, timeout=3600,
        )
        dt = time.time() - t0
        ok = p.returncode == 0
        row = {"ok": ok, "wall_seconds": round(dt, 1),
               "returncode": p.returncode}
        for line in p.stdout.splitlines():
            if line.startswith("{"):
                row.update(json.loads(line))
        if not ok:
            row["tail"] = "\n".join(p.stdout.strip().splitlines()[-8:])
        results[impl] = row
        print(f"{impl}: {'ok' if ok else 'CRASH/'+str(p.returncode)} "
              f"in {dt:.0f}s", flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
