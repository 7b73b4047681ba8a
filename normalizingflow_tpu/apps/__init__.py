"""CLI entry points (train / test / fe / polymer / sample_data).

Every app enables JAX's persistent compilation cache: first-ever compiles
over the TPU tunnel take minutes, and each app runs as its own process, so
without the on-disk cache a parity campaign pays those minutes again in
EVERY subprocess (r4: a 2-D Gaussian fe_diff cost 953 s, almost all of it
recompilation). With the cache, repeat steps start hot. Opt out with
NFTPU_NO_CACHE=1.
"""

import os as _os

if _os.environ.get("NFTPU_NO_CACHE") != "1":
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ.get("NFTPU_CACHE_DIR",
                                       _os.path.expanduser("~/.cache/jax")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
