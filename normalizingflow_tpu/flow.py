"""Normalizing-flow model: prior + bijector chain, change-of-variables density.

Functional counterpart of the reference's `NormalizingFlowModel`
(/root/reference/nf/models.py:5-40) with identical conventions:

  forward(x):  data -> latent; returns (z, prior_logprob(z), log_det_fwd)
  inverse(z):  latent -> data; returns (x, log_det_inv)
  sample(n):   z ~ prior; x = inverse(z); log_px = prior.log_prob(z) - log_det_inv
               (models.py:31-35)
  log_prob(x) ("evaluate"): prior_logprob + log_det_fwd  (models.py:37-40)

The whole object is static configuration; learnable state is the bijector
params pytree, so every method jits/vmaps/grads/shards directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class NormalizingFlow:
    def __init__(self, prior, bijector):
        self.prior = prior
        self.bijector = bijector

    def init(self, key):
        return self.bijector.init(key)

    def forward(self, params, x):
        z, log_det = self.bijector.forward(params, x)
        return z, self.prior.log_prob(z), log_det

    def inverse(self, params, z):
        return self.bijector.inverse(params, z)

    def sample(self, params, key, n_samples):
        z = self.prior.sample(key, n_samples)
        x, log_det = self.inverse(params, z)
        log_px = self.prior.log_prob(z) - log_det
        return x, log_px, z

    def log_prob(self, params, x):
        _, prior_logprob, log_det = self.forward(params, x)
        return prior_logprob + log_det

    # alias matching the reference's method name (nf/models.py:37)
    evaluate = log_prob
