"""Fully on-device training: chunked fori_loop, zero per-step host dispatch.

Per-step host dispatch costs ~100 ms over a tunneled TPU (measured; see
bench.py), so the per-epoch Python loop of train/loop.py -- which mirrors the
reference's host-driven loop (train.py:12-29) -- is two orders of magnitude
off the pace on real hardware. This module runs `chunk` optimization steps
inside ONE jitted fori_loop per dispatch:

  * analytic sources (Target/distribution with .sample(key, n)) sample their
    minibatch inside the step;
  * dataset-backed sources keep the whole trajectory resident on device and
    gather a random minibatch by index inside the step (the reference's
    utils.subsample semantics);
  * chunk sizes are kept >= 400: XLA's TPU pipeliner UNROLLS loops at some
    smaller static trip counts (observed 250 s compiles at trip count 200 vs
    4 s at 400-800 -- keep trip counts in the rolled regime);
  * logging and best/last checkpointing happen between chunks, preserving
    the reference's Iter/Loss/Logprob/Prior/LogDet cadence.
"""

from __future__ import annotations

import logging
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .checkpoint import copy_checkpoint, load_checkpoint, save_checkpoint
from .loop import make_optimizer
from .objectives import forward_kl_loss

logger = logging.getLogger("normalizingflow_tpu.train")


def train_flow_fused(flow, key, data_source, *, max_epochs=4000,
                     batch_size=100, learning_rate=1e-4,
                     scheduler="exponential", gamma=0.999, output_freq=100,
                     checkpoint_path=None, init_params=None, chunk=500,
                     resume_from=None, hmc_mixer=None, mix_every=None):
    """Forward-KL training with on-device step loops.

    Returns (params, history) like train_flow. `chunk` steps run per jit
    dispatch (clamped to >= 400 unless the whole run is shorter).

    `resume_from`: path of a `.last` checkpoint written by a previous run;
    restores params, optimizer state, PRNG key, and epoch, continuing the
    run bit-exact (per-step minibatch keys are fold_in(key, absolute_step),
    so the data stream is position-, not session-, dependent). The reference
    has no resume path at all (SURVEY.md §5).

    `hmc_mixer`, if given, is called as hmc_mixer(key, params) ->
    (data (m, dim), acc_prob) every `mix_every` epochs (default
    2*output_freq); when acc_prob lands in (0.3, 0.6), the MIX EPOCH's
    batch (and only that one) is drawn from the HMC-relaxed data instead of
    the dataset -- exactly the reference's acceptance-gated mixing policy
    (applications/src/train.py:14-19: the swap applies to the single epoch
    where i % (2*output_freq) == 0; every other epoch samples the dataset).
    Round 2 mistakenly fed relaxed data to EVERY batch until the next
    check (>= 400 epochs) -- observed to blow the loss up 100x on LJ when
    the gate first passed. Divergence by design: the reference checks the
    cadence every epoch; here the check happens at chunk boundaries
    (chunks are >=400 steps to stay in XLA's rolled-loop regime), so the
    effective cadence is max(mix_every, chunk). The gate flag rides into
    the jitted chunk as a traced scalar, so toggling it never recompiles.
    """
    k_init, key = jax.random.split(key)
    if init_params is not None:
        param_shapes = jax.eval_shape(lambda: init_params)
    else:
        param_shapes = jax.eval_shape(flow.init, k_init)
    param_bytes = sum(
        int(np.prod(s.shape)) * s.dtype.itemsize
        for s in jax.tree.leaves(param_shapes)
    )
    # Memory policy for multi-GB flows (Polymer_rnvp's 970M-param RealNVP):
    # projected peak f32 training residency is ~ params + Adam mu + Adam nu
    # + grads + transients ~= 4.25x param bytes; above ~14.5 GB of the
    # v5e's 16 GB HBM, keep Adam's first moment in bf16 (nu stays f32 --
    # it sits under a sqrt and needs the mantissa).
    mu_dtype = jnp.bfloat16 if 4.25 * param_bytes > 14.5e9 else None
    if mu_dtype is not None:
        logger.info(
            "large model (%.2f GB params): keeping Adam mu in bfloat16",
            param_bytes / 1e9,
        )
    optimizer = make_optimizer(learning_rate, scheduler, gamma, max_epochs,
                               mu_dtype=mu_dtype)

    start_epoch = 0
    losses = []
    best_logprob = -np.inf
    if resume_from:
        # Shape-only template (jax.eval_shape): the restored state must be
        # the ONLY device-resident copy -- materializing template params +
        # opt state first put 2x the 11 GB Polymer state on a 16 GB chip
        # (the r5 resume OOM). load_checkpoint also casts floating leaves
        # to the template dtypes, so checkpoints written under a different
        # mu_dtype policy still restore.
        opt_shapes = jax.eval_shape(optimizer.init, param_shapes)
        template = {"params": param_shapes, "opt_state": opt_shapes,
                    "key": key, "epoch": np.asarray(0),
                    "losses": np.zeros(0, np.float32)}
        state = load_checkpoint(resume_from, template)
        params, opt_state = state["params"], state["opt_state"]
        key = state["key"]
        start_epoch = int(state["epoch"])
        losses = [float(l) for l in np.asarray(state["losses"])]
        # Reported logprob is exactly -loss for forward KL, so the best-model
        # gate continues from the restored loss history.
        if losses:
            best_logprob = max(-l for l in losses)
        logger.info("resumed from %s at epoch %d", resume_from, start_epoch)
    else:
        params = init_params if init_params is not None else flow.init(k_init)
        opt_state = optimizer.init(params)

    traj = getattr(data_source, "traj", None)
    if traj is not None:
        traj = jnp.asarray(traj)

        def sample_batch(k):
            idx = jax.random.randint(k, (batch_size,), 0, traj.shape[0])
            return jnp.take(traj, idx, axis=0)
    else:
        def sample_batch(k):
            return data_source.sample(k, batch_size)

    chunk = min(max(chunk, 400), max_epochs)

    mixing = hmc_mixer is not None
    if mixing:
        mix_every = mix_every if mix_every is not None else 2 * output_freq

    # Donating params/opt_state lets XLA update them in place across chunk
    # boundaries -- without it the chip holds input AND output copies of the
    # training state, which OOMs the 2048-dim Polymer NSF_AR (params+Adam
    # ~10 GB on a 16 GB v5e). Callers never touch the donated buffers again
    # (they rebind both names to the returned arrays).
    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0, 1))
    def run_chunk(params, opt_state, key, base, n_steps, *mix):
        def get_batch(k, i):
            x = sample_batch(k)
            if mixing:
                mix_buf, use_mix = mix
                idx = jax.random.randint(
                    jax.random.fold_in(k, 1), (batch_size,), 0,
                    mix_buf.shape[0],
                )
                # Only the mix epoch itself (step 0 of this chunk) trains on
                # relaxed data -- reference train.py:14-19 semantics.
                x = jnp.where(use_mix & (i == 0),
                              jnp.take(mix_buf, idx, axis=0), x)
            return x

        def body(i, carry):
            params, opt_state, _, sums = carry
            k = jax.random.fold_in(key, base + i)
            x = get_batch(k, i)
            (loss, aux), grads = jax.value_and_grad(
                lambda p: forward_kl_loss(flow, p, x), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            sums = jax.tree.map(lambda s, a: s + a, sums,
                                {"loss": loss, **aux})
            return params, opt_state, {"loss": loss, **aux}, sums

        zero = {k: jnp.zeros(()) for k in
                ("loss", "logprob", "prior", "log_det")}
        params, opt_state, last, sums = jax.lax.fori_loop(
            0, n_steps, body, (params, opt_state, zero, zero)
        )
        means = jax.tree.map(lambda s: s / n_steps, sums)
        return params, opt_state, last, means

    t0 = time.time()
    bounds = list(range(start_epoch, max_epochs, chunk))
    if not bounds:
        # Resumed from a checkpoint whose epoch already reached max_epochs:
        # nothing to train. Say so (instead of silently no-opping) and
        # return the checkpointed params unchanged.
        logger.info(
            "Training already complete (resumed at epoch %d >= max_epochs "
            "%d); returning checkpointed parameters.",
            start_epoch, max_epochs,
        )
        history = {"losses": np.asarray(losses),
                   "best_logprob": best_logprob, "steps_per_s": 0.0,
                   "already_complete": True}
        return params, history
    mix_args = ()
    mix_log = []
    next_mix = start_epoch
    last_save_t = 0.0
    save_cost = 0.0
    for c, start in enumerate(bounds):
        if mixing and start >= next_mix:
            km = jax.random.fold_in(jax.random.fold_in(key, 0x6D6978), start)
            data, acc = hmc_mixer(km, params)
            accf = float(acc)
            gate = 0.3 < accf < 0.6
            mix_args = (jnp.asarray(data), jnp.asarray(gate))
            next_mix = start + mix_every
            mix_log.append({"epoch": start, "acceptance": accf,
                            "mixed": gate})
            logger.info(
                "HMC mix at epoch %d: acceptance %.3f -> %s", start, accf,
                "relaxed data" if gate else "dataset (gate failed)",
            )
        n_steps = min(chunk, max_epochs - start)
        params, opt_state, last, means = run_chunk(
            params, opt_state, key, jnp.asarray(start), n_steps, *mix_args
        )
        epoch = start + n_steps
        losses.append(float(means["loss"]))
        rate = (epoch - start_epoch) / (time.time() - t0)
        logger.info(
            "Iter: %d\tLoss: %.2f\tLogprob: %.2f\tPrior: %.2f\t"
            "LogDet: %.2f\t(%.0f steps/s)",
            epoch, float(means["loss"]), float(means["logprob"]),
            float(means["prior"]), float(means["log_det"]), rate,
        )
        logprob = float(means["logprob"])
        need_best = logprob > best_logprob
        if checkpoint_path:
            # One device->host fetch per chunk max: the best-model file
            # (reference train.py:37-40 semantics) is an on-disk copy of a
            # fresh .last, never a second fetch. The periodic .last is
            # throttled so checkpoint time stays <= ~25% of train time --
            # the 2048-dim Polymer states are multi-GB and a fetch over the
            # TPU relay can rival a whole chunk of steps.
            final = epoch >= max_epochs
            due = (time.time() - last_save_t) >= 4.0 * save_cost
            if final or need_best or due:
                state = {"params": params, "opt_state": opt_state,
                         "key": key, "epoch": np.asarray(epoch),
                         "losses": np.asarray(losses, np.float32)}
                ts = time.time()
                save_checkpoint(checkpoint_path + ".last", state)
                save_cost = time.time() - ts
                last_save_t = time.time()
            if need_best:
                copy_checkpoint(checkpoint_path + ".last", checkpoint_path)
        if need_best:
            # tracked even without a checkpoint path, so history
            # ["best_logprob"] is never the -inf sentinel after training
            best_logprob = logprob
    history = {"losses": np.asarray(losses), "best_logprob": best_logprob,
               "steps_per_s": (max_epochs - start_epoch) / (time.time() - t0)}
    if mixing:
        history["hmc_mixing"] = mix_log
    return params, history
