"""Checkpoint / resume for the full training state.

Upgrade of the reference's best-model torch.save payload
({"model","optim","scheduler","epoch","loss"}, applications/src/train.py:37-40,
restored eval-only with strict=False at setup.py:102-109): here the ENTIRE
pytree -- flow params, optax optimizer state, PRNG key, epoch, loss history --
is serialized, so training resumes bit-exact (the reference has no resume
path at all, SURVEY.md §5).

Serialization is flax.serialization msgpack of host numpy arrays in a single
file: atomic (write-temp + rename), dependency-light, and layout-independent
(arrays are restored onto whatever device/sharding the target template uses).
"""

from __future__ import annotations

import os
import shutil

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path, state):
    """Atomically serialize a pytree `state` to `path`."""
    host_state = jax.tree.map(np.asarray, state)
    data = serialization.to_bytes(host_state)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def copy_checkpoint(src, dst):
    """Atomically duplicate an on-disk checkpoint (no device fetch)."""
    tmp = dst + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    shutil.copyfile(src, tmp)
    os.replace(tmp, dst)


def load_checkpoint(path, template):
    """Restore a pytree with the same structure as `template`.

    Leaves come back as jax arrays (not numpy): traced indexing --
    e.g. the autoregressive inverse scan gathering per-dim weights --
    requires device arrays.

    `template` may hold `jax.ShapeDtypeStruct` leaves (jax.eval_shape
    output) instead of materialized arrays: multi-GB states (the 2048-dim
    Polymer flows) cannot afford template AND restored copies resident on
    a 16 GB chip at once (the r5 Polymer resume OOM). Floating leaves are
    cast to the template's dtype, so checkpoints written under a different
    optimizer-moment precision policy still restore.
    """
    with open(path, "rb") as fh:
        data = fh.read()
    restored = serialization.from_bytes(template, data)
    import jax.numpy as jnp

    def put(a, t=None):
        if not isinstance(a, (np.ndarray, jnp.ndarray)):
            return a
        tdt = getattr(t, "dtype", None)
        # jnp.issubdtype, NOT np.issubdtype: bfloat16 is an ml_dtypes
        # extension type that numpy's hierarchy calls non-floating, which
        # silently skipped the f32->bf16 mu cast and broke the training
        # carry (r5 Polymer resume).
        if (tdt is not None and tdt != a.dtype
                and jnp.issubdtype(tdt, jnp.floating)
                and jnp.issubdtype(a.dtype, jnp.floating)):
            return jnp.asarray(a, dtype=tdt)
        return jnp.asarray(a)

    if any(isinstance(l, jax.ShapeDtypeStruct)
           for l in jax.tree.leaves(template)):
        # eval_shape template: structures match the saved state exactly;
        # cast each leaf onto the template dtype (mu_dtype policy drift).
        return jax.tree.map(put, restored, template)
    # Partial template (e.g. params-only eval loads with None subtrees):
    # no per-leaf dtype info; just move leaves to device.
    return jax.tree.map(put, restored)
