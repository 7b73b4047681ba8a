"""Device mesh construction and sharding helpers.

The reference is single-process single-device (SURVEY.md §2.5: a lone
`cfg.device` string, no collectives of any kind). This module supplies the
TPU-native scaling layer designed fresh per SURVEY.md §2.5/§5:

  * one `Mesh` with a `chains` axis (MCMC/SMC chain parallelism) and an
    optional `data` axis (training batch parallelism), laid out over ICI
    within a slice and DCN across slices via
    `jax.experimental.mesh_utils.create_device_mesh`;
  * `shard_batch` places a (batch, dim) array with the batch axis split over
    the mesh; under jit, XLA then inserts all collectives (psum for gradient
    and acceptance-statistic reductions, all_gather for resampling) from the
    sharding annotations alone;
  * multi-host initialization wraps `jax.distributed.initialize`.

On CPU CI the same code runs on a fake 8-device backend
(xla_force_host_platform_device_count, tests/conftest.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host init (no-op for single-process runs)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(axis_name="chains", devices=None):
    """1-D mesh over all (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    mesh_devices = mesh_utils.create_device_mesh(
        (len(devices),), devices=devices
    )
    return Mesh(mesh_devices, (axis_name,))


def make_mesh_2d(shape, axis_names=("data", "chains"), devices=None):
    devices = devices if devices is not None else jax.devices()
    mesh_devices = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(mesh_devices, axis_names)


def batch_sharding(mesh, axis_name=None):
    """NamedSharding splitting axis 0 over the mesh (replicated elsewhere)."""
    axis_name = axis_name or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, x, axis_name=None):
    """Place (batch, ...) with batch split over the mesh axis."""
    return jax.device_put(x, batch_sharding(mesh, axis_name))


def pad_to_multiple(n, k):
    """Smallest multiple of k that is >= n (chain counts must divide the
    mesh axis evenly for clean layouts)."""
    return int(-(-n // k) * k)
