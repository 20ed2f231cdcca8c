"""Runtime knobs: persistent compilation cache, platform selection.

Compile latency over remote TPU attachments is high-variance; the
persistent cache makes every executable compile exactly once per machine
(JAX writes it keyed by HLO hash).  Enabled on import of the package
unless ALGONAUTS_TPU_NO_COMPILE_CACHE is set.
"""

from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def enable_compilation_cache() -> None:
    global _DONE
    if _DONE or os.environ.get("ALGONAUTS_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "ALGONAUTS_TPU_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "algonauts_tpu", "xla"),
        )
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _DONE = True
    except Exception:  # never block imports on cache setup
        pass


def force_cpu_if_requested() -> None:
    """Honor JAX_PLATFORMS=cpu even when a TPU plugin overrides it."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
