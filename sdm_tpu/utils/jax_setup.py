"""Process-level JAX setup for CLI entry points.

Enables the persistent compilation cache so repeated CLI invocations
(train -> generate -> train again) skip XLA recompiles of the same programs.
Honors JAX_COMPILATION_CACHE_DIR; defaults to ~/.cache/sdm_tpu/jax.
"""

from __future__ import annotations

import os


def setup_jax_cache() -> None:
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "sdm_tpu", "jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # cache is best-effort; never block the CLI
