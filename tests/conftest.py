"""Test config: run everything on CPU with 8 virtual devices so sharding
logic is exercised without a TPU pod (SURVEY.md §4d)."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the live TPU
# tunnel, which is reserved for bench runs; unit tests must be hermetic.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# XLA compiles are ~3.5s each in this sandbox; persist them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
