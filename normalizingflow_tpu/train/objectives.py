"""Variational objectives: forward KL (max-likelihood) and reverse KL (ELBO).

JAX forms of /root/reference/applications/src/setup.py:90-100 and the train
loop's loss (train.py:22-25):

  forward KL  : -E_data[log p_model(x)]        (training loss, train.py:23-25)
  full KL     : -E_data[log p_model] + E_data[log p_target]   (setup.py:96-100)
  reverse KL  : E_model[log p_model - log p_target] = -ELBO    (setup.py:90-94)

All are pure functions of (params, batch/key) suitable for jax.value_and_grad
inside one jit-compiled train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def forward_kl_loss(flow, params, x):
    """-mean(prior_logprob + log_det); also returns the reference's logged
    metric components (train.py:31-35)."""
    _, prior_logprob, log_det = flow.forward(params, x)
    logprob = prior_logprob + log_det
    loss = -jnp.mean(logprob)
    aux = {
        "logprob": jnp.mean(logprob),
        "prior": jnp.mean(prior_logprob),
        "log_det": jnp.mean(log_det),
    }
    return loss, aux


def forward_kl(flow, params, target, x):
    """KL(data || model) up to the entropy constant (setup.py:96-100)."""
    loss, _ = forward_kl_loss(flow, params, x)
    return loss + jnp.mean(target.log_prob(x))


def reverse_kl(flow, params, target, key, nsamples):
    """E_model[log p_model - log p_target] = -ELBO (setup.py:90-94).

    Gradients flow through the reparameterized sample path (prior sample is
    params-independent; inverse pass is differentiable)."""
    x, log_px, _ = flow.sample(params, key, nsamples)
    return jnp.mean(log_px) - jnp.mean(target.log_prob(x))


def elbo(flow, params, target, key, nsamples):
    return -reverse_kl(flow, params, target, key, nsamples)
