"""Conditioner MLP: 3 linear layers with tanh activations.

Functional equivalent of the reference's `FCNN` conditioner
(/root/reference/nf/flows.py:20-35): Linear -> tanh -> Linear -> tanh ->
Linear. Initialization follows the same uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))
scheme as torch.nn.Linear's default, so training dynamics are comparable.

Params are a flat dict of arrays; `mlp_apply` is pure and batch-polymorphic
(matmuls on the last axis), so it vmaps/shards cleanly and feeds the MXU with
one fused (batch, in) x (in, hidden) GEMM per layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _linear_init(key, fan_in, fan_out, dtype):
    bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1)).astype(dtype)
    wk, bk = jax.random.split(key)
    w = jax.random.uniform(wk, (fan_in, fan_out), dtype, -1.0, 1.0) * bound
    b = jax.random.uniform(bk, (fan_out,), dtype, -1.0, 1.0) * bound
    return w, b


def mlp_init(key, in_dim, out_dim, hidden_dim, dtype=jnp.float32,
             zero_last=False):
    """`zero_last=True` zeroes the output layer (Glow-style identity
    init): a coupling layer conditioned by such an MLP starts as the
    identity map, which is what keeps DEEP wide stacks trainable
    (Polymer_rnvp's 10x4000 at dim 2048 diverges from the torch-default
    init even with the s_cap clamp -- the 20-substep composition of
    O(0.35)-scale s outputs is already e^{+-3} at init and Adam chases
    it into overflow)."""
    k1, k2, k3 = jax.random.split(key, 3)
    w1, b1 = _linear_init(k1, in_dim, hidden_dim, dtype)
    w2, b2 = _linear_init(k2, hidden_dim, hidden_dim, dtype)
    if zero_last:
        w3 = jnp.zeros((hidden_dim, out_dim), dtype)
        b3 = jnp.zeros((out_dim,), dtype)
    else:
        w3, b3 = _linear_init(k3, hidden_dim, out_dim, dtype)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3}


def mlp_apply(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    h = jnp.tanh(h @ params["w2"] + params["b2"])
    return h @ params["w3"] + params["b3"]
