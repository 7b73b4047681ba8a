"""Tracing / profiling / debug utilities (SURVEY.md §5).

The reference has no profiler integration; this module adds the TPU-native
observability layer:

  * `trace(path)`: jax.profiler trace context (perfetto/tensorboard-readable
    dumps) around any region -- wrap a train chunk or HMC run;
  * `annotate(name)`: named TraceAnnotation shown in the profile timeline;
  * `StepTimer`: wall-clock + throughput (steps/s, samples/s) counters with
    proper `block_until_ready` fencing;
  * `debug_mode()`: enables jax_debug_nans + disables the fused Pallas path,
    the JAX analogue of running under a sanitizer.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Profile a region into `log_dir` (view with tensorboard/perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region annotation inside a trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Throughput counter: call .tick(n_items) per step; read .rate()."""

    def __init__(self):
        self.t0 = time.time()
        self.items = 0
        self.steps = 0

    def tick(self, n_items=1, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.items += n_items
        self.steps += 1

    def rate(self):
        dt = max(time.time() - self.t0, 1e-9)
        return {"steps_per_s": self.steps / dt,
                "items_per_s": self.items / dt,
                "elapsed_s": dt}


@contextlib.contextmanager
def debug_mode():
    """NaN-checking, un-fused execution for debugging numerical issues."""
    from ..bijectors import rqs

    prev_fused = rqs._FUSED_ENABLED
    rqs.set_fused_rqs(False)
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
        rqs.set_fused_rqs(prev_fused)
