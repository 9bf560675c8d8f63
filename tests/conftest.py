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

# NO persistent compilation cache for the CPU suite. XLA:CPU AOT
# serialization is unreliable on this VM (which migrates between physical
# hosts): entries SIGILL on CPU-feature mismatch even with the cache dir
# keyed by model+flags, `executable.serialize()` intermittently
# segfaults/aborts in long suite processes, and entries written by a
# passing run have aborted `deserialize_executable` minutes later.  Every
# crash flavor lands inside XLA C++ where pytest cannot recover.  CPU
# compiles are local and fast; the cache bought ~1 min of suite time and
# cost hard crashes.  (The TPU cache — remote compiles, minutes per
# program — stays enabled elsewhere and has been reliable.)

