import os

# Tests run on a virtual 8-device CPU mesh so pjit/shard_map paths are
# exercised without TPU hardware (SURVEY.md §4 implication).  The axon TPU
# plugin force-registers itself as the default backend regardless of
# JAX_PLATFORMS, so the CPU backend is selected explicitly below.
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

try:
    _cpu = jax.devices("cpu")
    jax.config.update("jax_default_device", _cpu[0])
except RuntimeError:  # pragma: no cover - cpu backend always present
    pass

# Persistent compilation cache: the env reset / train-iteration compiles cost
# ~2 min EACH on CPU, so a cold suite run exceeds any CI budget.  With the
# cache, repeat runs load compiled executables in seconds (VERDICT r1 weak #5).
_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        os.path.expanduser("~/.cache/ti5_jax_tests"))
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover
    pass
