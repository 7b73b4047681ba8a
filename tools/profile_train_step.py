"""Dissect the Fe_400K training-step cost on the TPU.

Times, per configuration: forward-only loss, loss+grad, and the full
optimizer step, each as a 100-iteration on-device fori_loop (one dispatch),
with the Pallas RQS kernel on and off, at several batch sizes.

Usage: python runs/profile_train_step.py
"""
import time

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from normalizingflow_tpu.config import load_config, setup_model
from normalizingflow_tpu.train.loop import make_optimizer
from normalizingflow_tpu.train.objectives import forward_kl_loss
from normalizingflow_tpu.bijectors import rqs as rqs_mod

N_INNER = 100

cfg = load_config("configs/Fe_400K.yaml")
flow, potential, cfg = setup_model(cfg, mode="training")
params = flow.init(jax.random.PRNGKey(0))
traj = jnp.asarray(potential.traj)
optimizer = make_optimizer(1e-4, "cosine", 0.999, 15000)
opt_state = optimizer.init(params)


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / N_INNER * 1e3
    print(f"{name:55s} {dt:8.2f} ms/step")
    return dt


def batch_of(k, bs):
    idx = jax.random.randint(k, (bs,), 0, traj.shape[0])
    return jnp.take(traj, idx, axis=0)


for fused in (True, False):
    rqs_mod.set_fused_rqs(fused)
    tag = "pallas" if fused else "xla   "
    for bs in (50, 512):

        @jax.jit
        def fwd_loop(params, key):
            def body(i, acc):
                x = batch_of(jax.random.fold_in(key, i), bs)
                loss, _ = forward_kl_loss(flow, params, x)
                return acc + loss
            return jax.lax.fori_loop(0, N_INNER, body, 0.0)

        @jax.jit
        def grad_loop(params, key):
            def body(i, acc):
                x = batch_of(jax.random.fold_in(key, i), bs)
                (loss, _), grads = jax.value_and_grad(
                    lambda p: forward_kl_loss(flow, p, x), has_aux=True
                )(params)
                return jax.tree.map(lambda a, g: a + g, acc, grads)
            zero = jax.tree.map(jnp.zeros_like, params)
            return jax.lax.fori_loop(0, N_INNER, body, zero)

        @jax.jit
        def step_loop(params, opt_state, key):
            def body(i, carry):
                params, opt_state = carry
                x = batch_of(jax.random.fold_in(key, i), bs)
                (_, _), grads = jax.value_and_grad(
                    lambda p: forward_kl_loss(flow, p, x), has_aux=True
                )(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state
            return jax.lax.fori_loop(0, N_INNER, body, (params, opt_state))

        k = jax.random.PRNGKey(1)
        timed(f"[{tag}] bs={bs:4d} forward loss", fwd_loop, params, k)
        timed(f"[{tag}] bs={bs:4d} loss+grad", grad_loop, params, k)
        timed(f"[{tag}] bs={bs:4d} full optimizer step", step_loop,
              params, opt_state, k)
