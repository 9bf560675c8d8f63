"""Persistent compilation cache setup.

This container's sitecustomize imports jax at interpreter start, so the
`JAX_COMPILATION_CACHE_DIR` env var is read (and frozen as unset) before any
user code runs — the env var alone silently does nothing.  Setting the
config at runtime works and makes compiled programs persist across
processes (measured: a 70 s remote compile becomes a 0.8 s cache hit).
"""

from __future__ import annotations

import os


def host_cpu_key() -> str:
    """Short key of this host's CPU feature set.

    XLA:CPU AOT cache entries embed the *compile* machine's features and can
    SIGILL/segfault when loaded on a host with fewer features (observed: a
    cache entry compiled with +prefer-no-gather loaded on a host without
    it; a suite run segfaulted inside get_executable_and_time on such an
    entry).  CPU caches are therefore keyed per feature set; TPU entries
    are host-independent and stay shared.

    The key hashes the cpuinfo `model name` line AS WELL AS `flags`: XLA
    derives tuning features like +prefer-no-scatter/+prefer-no-gather from
    the CPU *model*, so two hosts with identical flag lists can still
    produce mutually incompatible AOT entries (observed across this VM's
    physical-host migrations)."""
    try:
        with open("/proc/cpuinfo") as f:
            model = flags = ""
            for line in f:
                if line.startswith("model name") and not model:
                    model = line
                elif line.startswith("flags") and not flags:
                    flags = line
                if model and flags:
                    break
            if flags:
                import hashlib

                return hashlib.sha1((model + flags).encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


def enable_persistent_cache(path: str | None = None,
                            cpu: bool | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (default:
    <repo>/.jax_cache, or <repo>/.jax_cache/cpu-<featurekey> for CPU-backend
    processes). Safe to call multiple times.

    cpu: True if this process runs the CPU backend (tests, the multichip
    dryrun subprocess); default: the QWEN3_TTS_TPU_FORCE_CPU env var."""
    import jax

    if cpu is None:
        cpu = bool(os.environ.get("QWEN3_TTS_TPU_FORCE_CPU"))
    if path is None:
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
    if cpu and os.path.basename(path) != "cpu-" + host_cpu_key():
        path = os.path.join(path, "cpu-" + host_cpu_key())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
