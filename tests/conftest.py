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
# therefore a no-op in this container). cpu=True keys the cache dir by the
# host's CPU feature set — XLA:CPU AOT entries SIGILL on feature mismatch.
from qwen3_tts_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(cpu=True)
