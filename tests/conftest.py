"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware, and make the repo importable.

Note: this container's sitecustomize registers the `axon` TPU backend and
forces JAX_PLATFORMS=axon at interpreter start, so the env var alone is not
enough — we must override via jax.config after import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent compilation cache across test runs. NOTE: must be set via
# jax.config (the env var is read before sitecustomize's jax import and is
# therefore a no-op in this container).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
