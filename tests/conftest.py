"""Test configuration: run everything on CPU with 8 virtual devices.

The reference has no CPU-testable path (SURVEY.md §4); this framework improves on
that by making every component testable on a virtual 8-device CPU mesh, so kernels
use interpret mode and sharding tests exercise real collectives without TPU chips.
"""

import os

# Must happen before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

# sitecustomize may have imported jax and pinned the TPU plugin already, so
# the env var alone is not enough — force the platform via config (backends
# initialize lazily, so this sticks as long as no array op ran yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
