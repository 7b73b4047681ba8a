"""Tabulate the analytic Finnis-Sinclair iron model into a DYNAMO setfl file.

The reference feeds an EAM potential file to LAMMPS via its input template
(/root/reference/applications/input/Fe_400K.yaml:9 `input_dir`,
applications/src/systems.py:12-43). This repo's TPU-native replacement reads
the same single-element setfl table format directly (targets/eam.py
`load_setfl`). This tool writes such a file from the built-in analytic
Finnis-Sinclair (1984) alpha-iron parameterization so the tabulated path can
be validated against the analytic one bit-for-bit-ish (spline interp error).

Usage: python tools/make_setfl.py [out_path] [--nr N] [--nrho N] [--rho-max X]
"""

import argparse

import numpy as np

FS_IRON = {
    "A": 1.828905,
    "d": 3.569745,
    "beta": 1.8,
    "c": 3.40,
    "c0": 1.2371147,
    "c1": -0.3592185,
    "c2": -0.0385607,
}


def fs_pair(r, p=FS_IRON):
    """Full pair potential phi(r), counted once per pair."""
    v = (r - p["c"]) ** 2 * (p["c0"] + p["c1"] * r + p["c2"] * r * r)
    return np.where(r < p["c"], v, 0.0)


def fs_density(r, p=FS_IRON):
    dr = r - p["d"]
    v = dr * dr + p["beta"] * dr**3 / p["d"]
    return np.where(r < p["d"], v, 0.0)


def fs_embed(rho, p=FS_IRON):
    return -p["A"] * np.sqrt(np.maximum(rho, 0.0))


def write_setfl(path, nr=2000, nrho=2000, rho_max=40.0, params=FS_IRON):
    cutoff = max(params["c"], params["d"])
    dr = cutoff / nr
    drho = rho_max / nrho
    r = np.arange(nr) * dr
    rho_grid = np.arange(nrho) * drho

    f_rho = fs_embed(rho_grid, params)
    rho_r = fs_density(r, params)
    rphi = r * fs_pair(r, params)

    with open(path, "w") as fh:
        fh.write("Finnis-Sinclair (1984) alpha-iron, tabulated by\n")
        fh.write("tools/make_setfl.py from targets/eam.py FS_IRON params\n")
        fh.write("(fixture for the tabulated-EAM code path)\n")
        fh.write("1 Fe\n")
        fh.write(f"{nrho} {drho:.16e} {nr} {dr:.16e} {cutoff:.16e}\n")
        fh.write("26 55.845 2.8665 bcc\n")
        for arr in (f_rho, rho_r, rphi):
            for i in range(0, arr.size, 5):
                fh.write(" ".join(f"{v:.16e}" for v in arr[i : i + 5]) + "\n")
    return path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="data/fe_fs.setfl")
    ap.add_argument("--nr", type=int, default=2000)
    ap.add_argument("--nrho", type=int, default=2000)
    ap.add_argument("--rho-max", type=float, default=40.0)
    args = ap.parse_args()
    print(write_setfl(args.out, args.nr, args.nrho, args.rho_max))
