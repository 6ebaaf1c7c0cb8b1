"""Common JAX runtime setup for CLI entry points."""
from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None):
    """Enable the persistent compilation cache (compiles of the full training
    step take minutes on remote-compile TPU backends; caching amortizes them
    across processes)."""
    import jax

    cache = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                        os.path.expanduser("~/.cache/ti5_jax"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        print(f"[jax_setup] compilation cache disabled: {e}")
