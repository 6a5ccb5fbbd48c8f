"""Shared JAX runtime configuration for the CLI's device paths.

- honors JAX_PLATFORMS (the axon TPU plugin ignores the env var, so we
  apply it through jax.config);
- enables the persistent compilation cache: a CLI tool pays XLA
  compilation on every process invocation otherwise, which dwarfs the
  actual compute for small inputs.  Cache dir:
  $CCPHYLO_TPU_JAX_CACHE (default ~/.cache/ccphylo_tpu/jax; empty
  string disables).
"""

from __future__ import annotations

import os

_configured = False


def configure_jax():
    """Idempotent; returns the configured jax module."""
    global _configured
    import jax

    if _configured:
        return jax
    _configured = True
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    cache = os.environ.get(
        "CCPHYLO_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "ccphylo_tpu",
                     "jax"))
    if cache:
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.1)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              0)
        except (OSError, AttributeError):
            pass
    return jax
