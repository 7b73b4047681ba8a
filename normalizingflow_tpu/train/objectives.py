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


def rkl_finetune(flow, params, target, steps, lr=1e-4, batch=256, seed=7,
                 chunk=400):
    """Reverse-KL fine-tune from a forward-KL fit (r5, VERDICT item 5).

    Forward-KL training on a finite trajectory memorizes it (Phi4: the
    held-out gap GROWS monotonically with epochs, tools/fit_sweep.py);
    fine-tuning against the target DENSITY itself -- the reverseKL
    objective the reference defines but never uses (setup.py:90-94) --
    closes the gap (+0.70 -> +0.04 kT/ptcl) because the data can no
    longer be memorized: every step draws fresh flow samples. Runs as
    jitted chunks of `chunk` steps (per-dispatch latency, CLAUDE.md).
    """
    import jax
    import optax

    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1))),
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def run(params, opt_state, key, base, n):
        def body(i, carry):
            params, opt_state, _ = carry
            k = jax.random.fold_in(key, base + i)
            loss, grads = jax.value_and_grad(
                lambda p: reverse_kl(flow, p, target, k, batch)
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.lax.fori_loop(0, n, body,
                                 (params, opt_state, jnp.zeros(())))

    key = jax.random.PRNGKey(seed)
    loss = jnp.zeros(())
    done = 0
    while done < steps:
        n = min(chunk, steps - done)
        params, opt_state, loss = run(
            params, opt_state, key, jnp.asarray(done), n)
        done += n
    return params, float(loss)
