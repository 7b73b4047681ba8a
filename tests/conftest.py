"""Test configuration: force CPU with 8 virtual devices, enable x64.

Unit tests run on a fake 8-device CPU mesh (SURVEY.md §4c) so sharded code
paths are exercised without TPU hardware; numerical tests use float64.

NOTE: this environment pre-sets JAX_PLATFORMS=axon (a tunneled TPU) and the
env var cannot be overridden from Python after process start, so the platform
is forced via jax.config.update, which must happen before any computation.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Per-kernel XLA compiles take ~0.4 s on this host; cache them persistently so
# test reruns are fast.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
