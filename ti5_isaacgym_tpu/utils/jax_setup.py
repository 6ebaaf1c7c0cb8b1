"""Common JAX runtime setup for CLI entry points."""
from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None):
    """Enable the persistent compilation cache (compiles of the full training
    step take minutes on remote-compile TPU backends; caching amortizes them
    across processes) and honor ``TI5_PLATFORM=cpu``.

    The axon TPU plugin force-registers itself as the default backend and
    ignores ``JAX_PLATFORMS=cpu``; worse, the TPU tunnel admits exactly ONE
    client process, so an eval/smoke CLI accidentally claiming it wedges a
    concurrent training run.  ``TI5_PLATFORM=cpu`` pins the default device to
    the host CPU (the same workaround ``tests/conftest.py`` uses)."""
    import jax

    impl = os.environ.get("TI5_PRNG", "")
    if impl:
        # rbg/unsafe_rbg lower to far fewer TPU ops than threefry (the
        # default); the RNG-heavy post-physics chain (DR resamples, obs
        # noise, event draws) is launch-bound, so this is a perf lever.
        jax.config.update("jax_default_prng_impl", impl)

    if os.environ.get("TI5_PLATFORM", "").lower() == "cpu":
        try:
            # LOCAL device: under multi-process SPMD jax.devices() lists the
            # global topology and its first entry belongs to process 0 —
            # pinning a non-addressable device on other processes routes
            # every bring-up computation off-host
            jax.config.update("jax_default_device",
                              jax.local_devices(backend="cpu")[0])
        except RuntimeError:  # pragma: no cover - cpu backend always present
            pass

    cache = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                        os.path.expanduser("~/.cache/ti5_jax"))
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            # per-process cache: with a SHARED cache one process compiles
            # while its peers wait on the cache entry, skewing arrival at
            # the first collective beyond gloo's 30 s store timeout.
            # (Gated on the distributed client, not jax.process_count():
            # the default backend may be a different platform.)
            cache = f"{cache}_p{_dist.global_state.process_id}"
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        print(f"[jax_setup] compilation cache disabled: {e}")
