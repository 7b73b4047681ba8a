"""Experiment configuration: YAML-compatible schema + registry-based factories.

Drop-in replacement for the reference's yacs config tree and `eval`-dispatch
wiring (/root/reference/applications/src/config.py:3-69, setup.py:17-82):

  * the schema mirrors the reference's keys exactly, so the 10 YAML files in
    applications/input/ parse unchanged (configs/ in this repo carries ports
    of all of them);
  * `eval(cfg.flow.type)` (setup.py:56-62) is replaced by explicit FLOW /
    POTENTIAL registries;
  * box-length inference reproduces setup.py:39-45:
    B = (N/(8 rho))^(1/3) from density, or B = ncellx*cell_len/2 from the
    cell grid; boxlength = 2B; the spline tail bound is B (setup.py:58,62);
  * the NSF_CL coordinate-mask cycle [[0],[1],[2],[0,1],[1,2],[0,2]] matches
    setup.py:60-62.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml

from .bijectors import (
    ActNorm,
    AffineCoupling,
    Chain,
    InvertibleLinear,
    MaskedAffineAR,
    Planar,
    Radial,
    Repeat,
    SplineAR,
    SplineCoupling,
)
from .distributions import DiagNormal, EinsteinCrystal, GaussianMixture
from .flow import NormalizingFlow
from .targets import LennardJones, Phi4Lattice, TrajectoryDataset


# --------------------------------------------------------------- schema
@dataclass
class DatasetConfig:
    name: Optional[str] = None
    potential: Optional[str] = None
    training_data: Optional[str] = None
    testing_data: Optional[str] = None
    data: Optional[str] = None
    nparticles: int = 32
    dim: int = 3
    kT: float = 1.0
    rho: Optional[float] = None
    ncellx: Optional[int] = None
    ncelly: Optional[int] = None
    ncellz: Optional[int] = None
    cell_len: Optional[float] = None
    boxlength: Optional[float] = None
    periodic: bool = True
    type: str = "xyz"
    # LJ
    sigma: float = 1.0
    epsilon: float = 1.0
    cutoff: Optional[float] = 1.6
    shift: bool = True
    # GaussianMixture / EinsteinCrystal
    centers: Any = None
    vars: Any = None
    alpha: Optional[float] = None
    # Fe / phi4
    input_dir: Optional[str] = None
    L: int = 8
    kappa: float = 0.3
    lam: float = 0.022
    # GaussianField (polymer-surrogate GFF)
    channels: int = 2
    mass: Any = None


@dataclass
class FlowConfig:
    type: str = "NSF_AR"
    nlayers: int = 3
    nsplines: int = 32
    hidden_dim: int = 100
    periodic: bool = True
    # RealNVP log-scale soft clamp (bijectors/coupling.py AffineCoupling
    # s_cap); None = reference-exact unbounded s. Required for deep wide
    # stacks (Polymer_rnvp.yaml) whose training otherwise diverges.
    s_cap: Optional[float] = None
    # Glow-style identity init (zero output layers) for RealNVP
    # conditioners; deep wide stacks also need this (see coupling.py).
    zero_init: bool = False


@dataclass
class PriorConfig:
    type: Optional[str] = None
    lattice_dir: Optional[str] = None
    alpha: float = 100.0
    centers: Any = None
    vars: Any = None
    nparticles: Optional[int] = None
    dim: Optional[int] = None
    boxlength: Optional[float] = None


@dataclass
class TrainConfig:
    max_epochs: int = 4000
    batch_size: int = 100
    output_freq: int = 100
    learning_rate: float = 1e-4
    scheduler: str = "exponential"
    lr_scheduler_gamma: float = 0.999
    # Acceptance-gated HMC data mixing (reference train.py:14-19; the
    # reference hardcodes the 500-step/100-burnin relaxation chain).
    hmc_mix: bool = False
    hmc_mix_step_size: float = 0.01
    hmc_mix_leapfrog: int = 10
    hmc_mix_chains: int = 8
    # Reverse-KL fine-tune from the forward-KL fit, against the config's
    # differentiable target density (the objective the reference defines
    # but never uses, setup.py:90-100). Closes the held-out gap that
    # finite-sample memorization opens: Phi4 +0.70 -> +0.04 kT/ptcl
    # (tools/fit_sweep.py r5 table). 0 = off (reference-exact workflow).
    rkl_finetune_steps: int = 0
    rkl_finetune_lr: float = 1e-4
    rkl_finetune_batch: int = 256


@dataclass
class OutputConfig:
    training_dir: str = "training/"
    testing_dir: str = "testing/"
    model_dir: str = "saved_models/"
    best_model_dir: str = "trained_models/"


@dataclass
class Config:
    device: str = "tpu"
    seed: int = 0
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    flow: FlowConfig = field(default_factory=FlowConfig)
    prior: PriorConfig = field(default_factory=PriorConfig)
    train_parameters: TrainConfig = field(default_factory=TrainConfig)
    output: OutputConfig = field(default_factory=OutputConfig)


def _merge_dataclass(dc, overrides):
    if not overrides:
        return dc
    names = {f.name for f in dataclasses.fields(dc)}
    updates = {}
    for k, v in overrides.items():
        if k not in names:
            raise KeyError(
                f"unknown config key {k!r} for {type(dc).__name__}"
            )
        cur = getattr(dc, k)
        if dataclasses.is_dataclass(cur):
            updates[k] = _merge_dataclass(cur, v)
        elif isinstance(v, str) and isinstance(cur, float):
            updates[k] = float(v)  # yacs-style "1e-4" strings
        else:
            updates[k] = v
    return dataclasses.replace(dc, **updates)


def load_config(path):
    """Parse a reference-format YAML file into a Config.

    Honors `device: cpu` (reference cfg.device semantics, config.py:5 /
    setup.py:63) by switching the JAX platform BEFORE any computation --
    this environment pins JAX_PLATFORMS=axon (tunneled TPU) at the process
    level, so the config key is the only way a CLI run can opt out of the
    chip. `tpu`/`cuda:*`/unset keep the process default (the TPU)."""
    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    cfg = _merge_dataclass(Config(), raw)
    if str(getattr(cfg, "device", "") or "").lower() == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            # Backend already initialized; too late to switch. Be loud:
            # silently running a `device: cpu` config on the TPU is the
            # kind of surprise ADVICE r2 flagged.
            import logging

            logging.getLogger(__name__).warning(
                "config %s requests device: cpu but the JAX backend is "
                "already initialized (%s); continuing on the existing "
                "platform", path, jax.default_backend(),
            )
    return cfg


# ------------------------------------------------------------ box length
def infer_boxlength(ds: DatasetConfig):
    """setup.py:39-45: half-box B and full boxlength 2B."""
    if ds.boxlength is not None and ds.boxlength > 0:
        return ds.boxlength / 2.0, ds.boxlength
    if ds.rho is not None:
        b = (ds.nparticles / (8.0 * ds.rho)) ** (1.0 / 3.0)
    elif ds.ncellx is not None and ds.cell_len is not None:
        b = ds.ncellx * ds.cell_len / 2.0
    else:
        b = 1.0
    return b, 2.0 * b


# -------------------------------------------------------------- registries
def _load_centers(centers, point_dim):
    """Accept literal lists or .xyz paths (systems.py:261-264)."""
    if isinstance(centers, str):
        from .io.xyz import read_xyz

        return read_xyz(centers).reshape(-1, point_dim)
    return centers


def build_potential(name, cfg_section, ds: DatasetConfig, boxlength=None):
    """Registry replacement of setup.py:17-36's if/elif + eval dispatch."""
    c = cfg_section
    if name in ("GaussianMixture", "gaussian_mix"):
        return GaussianMixture(
            _load_centers(c.centers, ds.dim), c.vars,
            npoints=getattr(c, "nparticles", None) or ds.nparticles,
            point_dim=ds.dim,
        )
    if name == "EinsteinCrystal":
        return EinsteinCrystal(
            _load_centers(c.centers, ds.dim),
            alpha=c.alpha if c.alpha is not None else 50.0,
            boxlength=getattr(c, "boxlength", None) or boxlength,
            point_dim=ds.dim,
        )
    if name == "Normal":
        n = (getattr(c, "nparticles", None) or ds.nparticles) * (
            getattr(c, "dim", None) or ds.dim
        )
        var = c.vars if c.vars is not None else 1.0
        return DiagNormal(n, var=float(var))
    if name == "LJ":
        return LennardJones(
            ds.nparticles, boxlength, point_dim=ds.dim, epsilon=ds.epsilon,
            sigma=ds.sigma, cutoff=ds.cutoff, shift=ds.shift, kT=ds.kT,
            pos_dir=ds.data if ds.data and os.path.exists(ds.data) else None,
            data_type=ds.type,
        )
    if name == "Fe":
        from .targets.eam import EAMIron

        # dataset.input_dir carries the EAM potential table, playing the
        # role of the reference's LAMMPS input template + eam file
        # (applications/input/Fe_400K.yaml:9, systems.py:12-43). When set,
        # energies come from the tabulated setfl path; otherwise the
        # built-in analytic Finnis-Sinclair model.
        setfl = ds.input_dir
        if setfl and not os.path.exists(setfl):
            raise FileNotFoundError(
                f"dataset.input_dir={setfl!r} (EAM setfl table) not found"
            )
        return EAMIron(
            nparticles=ds.nparticles, boxlength=boxlength, kT=ds.kT,
            setfl_path=setfl or None,
            pos_dir=ds.data if ds.data and os.path.exists(ds.data) else None,
            data_type=ds.type,
        )
    if name == "SimData":
        return TrajectoryDataset(ds.data, data_type=ds.type)
    if name == "Phi4":
        return Phi4Lattice(
            L=ds.L, kappa=ds.kappa, lam=ds.lam,
            pos_dir=ds.data if ds.data and os.path.exists(ds.data) else None,
            data_type=ds.type,
        )
    if name == "GaussianField":
        from .targets.gff import GaussianField

        return GaussianField(
            L=ds.L, channels=ds.channels,
            mass=ds.mass if ds.mass is not None else (0.5, 1.0),
        )
    raise KeyError(f"unknown potential {name!r}")


_NSF_CL_MASK_CYCLE = [[0], [1], [2], [0, 1], [1, 2], [0, 2]]


def build_flow_stack(cfg: Config, b: float):
    """Flow registry: setup.py:55-62's construction without eval()."""
    fc = cfg.flow
    n = cfg.dataset.nparticles * cfg.dataset.dim
    # Deep homogeneous stacks compile as ONE scanned layer body (Repeat)
    # instead of an unrolled Chain -- compile time O(1) in depth.
    if fc.type == "RealNVP":
        # Repeat's lax.scan carries the WHOLE stacked weight pytree (and
        # XLA keeps stacked bf16 matmul copies of it alive across the
        # scan), so for multi-GB stacks like Polymer_rnvp's 10x4000 at
        # dim 2048 (~970M params) the scan costs ~2 extra GB of peak HBM
        # -- enough to OOM the 16 GB v5e (r5 campaign). Unroll huge
        # stacks: per-layer transients free between layers.
        half = n // 2
        est_params = fc.nlayers * 4 * (
            2 * half * fc.hidden_dim + fc.hidden_dim ** 2)
        if fc.nlayers >= 4 and est_params < 2e8:
            return Repeat(
                AffineCoupling(n, hidden_dim=fc.hidden_dim,
                               s_cap=fc.s_cap, zero_init=fc.zero_init),
                fc.nlayers)
        layers = [AffineCoupling(n, hidden_dim=fc.hidden_dim,
                                 s_cap=fc.s_cap, zero_init=fc.zero_init)
                  for _ in range(fc.nlayers)]
    elif fc.type == "NSF_AR":
        if fc.nlayers >= 4:
            return Repeat(
                SplineAR(n, num_bins=fc.nsplines, tail_bound=b,
                         hidden_dim=fc.hidden_dim, periodic=fc.periodic),
                fc.nlayers,
            )
        layers = [
            SplineAR(n, num_bins=fc.nsplines, tail_bound=b,
                     hidden_dim=fc.hidden_dim, periodic=fc.periodic)
            for _ in range(fc.nlayers)
        ]
    elif fc.type == "NSF_CL":
        layers = [
            SplineCoupling(
                size=cfg.dataset.nparticles, space_dim=cfg.dataset.dim,
                num_bins=fc.nsplines, tail_bound=b, hidden_dim=fc.hidden_dim,
                mask=_NSF_CL_MASK_CYCLE[i % len(_NSF_CL_MASK_CYCLE)],
            )
            for i in range(fc.nlayers)
        ]
    elif fc.type == "MAF":
        layers = [MaskedAffineAR(n, hidden_dim=fc.hidden_dim)
                  for _ in range(fc.nlayers)]
    elif fc.type == "Planar":
        layers = [Planar(n) for _ in range(fc.nlayers)]
    elif fc.type == "Radial":
        layers = [Radial(n) for _ in range(fc.nlayers)]
    elif fc.type == "ActNorm":
        layers = [ActNorm(n) for _ in range(fc.nlayers)]
    elif fc.type == "OneByOneConv":
        layers = [InvertibleLinear(n) for _ in range(fc.nlayers)]
    else:
        raise KeyError(f"unknown flow type {cfg.flow.type!r}")
    return Chain(layers)


def setup_model(cfg: Config, mode="training"):
    """Build (flow_model, data_potential): the factory of setup.py:38-82."""
    b, boxlength = infer_boxlength(cfg.dataset)
    if cfg.dataset.boxlength is None:
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset, boxlength=boxlength)
        )
    prior = build_potential(cfg.prior.type, cfg.prior, cfg.dataset,
                            boxlength=boxlength)
    chain = build_flow_stack(cfg, b)
    model = NormalizingFlow(prior, chain)

    ds = cfg.dataset
    data_path = ds.training_data if mode == "training" else ds.testing_data
    if data_path is not None:
        ds = dataclasses.replace(ds, data=data_path)
    potential = build_potential(ds.potential, ds, ds, boxlength=boxlength)
    return model, potential, cfg
