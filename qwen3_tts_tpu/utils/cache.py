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


_FORK_SAFE_INSTALLED = False


def _install_fork_safe_writes() -> None:
    """Run persistent-cache writes in a forked child process.

    XLA:CPU's `executable.serialize()` (the AOT export used by the cache
    write path, jax/_src/compilation_cache.py `put_executable_and_time`)
    intermittently segfaults/aborts on this host when invoked late in a
    long test-suite process — only for programs that are cache *misses* in
    that context, and not reproducible solo.  The write is an optimization,
    not a correctness requirement, so isolate it: fork, let the child do
    serialize+write (files land in the shared cache dir for future reads),
    and turn a child crash or hang into a warning in the parent.
    """
    global _FORK_SAFE_INSTALLED
    if _FORK_SAFE_INSTALLED or not hasattr(os, "fork"):
        return
    from jax._src import compilation_cache as _cc

    orig = _cc.put_executable_and_time

    def fork_safe_put(cache_key, module_name, executable, backend,
                      compile_time):
        import warnings

        with warnings.catch_warnings():
            # jax warns that fork + threads can deadlock; the child's
            # alarm() bounds that, and the parent never deadlocks.
            warnings.filterwarnings(
                "ignore", message=".*os.fork.*", category=RuntimeWarning)
            pid = os.fork()
        if pid == 0:
            try:
                import signal

                signal.alarm(120)  # self-destruct if serialize deadlocks
                orig(cache_key, module_name, executable, backend,
                     compile_time)
            except BaseException:
                os._exit(1)
            finally:
                os._exit(0)
        _, status = os.waitpid(pid, 0)
        if not (os.WIFEXITED(status) and os.WEXITSTATUS(status) == 0):
            warnings.warn(
                "persistent-cache write for %r crashed in the child "
                "process (wait status %d); entry skipped" %
                (module_name, status))

    _cc.put_executable_and_time = fork_safe_put
    _FORK_SAFE_INSTALLED = True


def enable_persistent_cache(path: str | None = None,
                            cpu: bool | None = None,
                            fork_safe_writes: bool | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (default:
    <repo>/.jax_cache, or <repo>/.jax_cache/cpu-<featurekey> for CPU-backend
    processes). Safe to call multiple times.

    cpu: True if this process runs the CPU backend (tests, the multichip
    dryrun subprocess); default: the QWEN3_TTS_TPU_FORCE_CPU env var.
    For CPU processes the cache is DISABLED by default (returns ""):
    XLA:CPU AOT serialization is unreliable on this VM, which migrates
    between physical hosts — entries SIGILL on feature mismatch even with
    model+flags-keyed dirs, `executable.serialize()` intermittently
    aborts in long-running processes, and entries written by a passing
    run have crashed `deserialize_executable` minutes later.  CPU
    compiles are local and fast; TPU compiles go through the remote
    compile service (minutes per program) and their cache entries have
    been reliable.  Set QWEN3_TTS_TPU_CPU_CACHE=1 to opt back in (writes
    then run fork-isolated so serialize crashes can't kill the process).
    fork_safe_writes: isolate cache writes in a forked child so a crash in
    XLA's serialize path can't kill this process (default: same as `cpu`,
    where the crash has been observed)."""
    import jax

    if cpu is None:
        # env var OR an in-process platform override (tests/conftest.py and
        # the dryrun impl set jax.config, not the env var — an in-process
        # exec of __graft_entry__ from pytest must not enable the cache;
        # reading the config does not initialize a backend)
        cpu = (bool(os.environ.get("QWEN3_TTS_TPU_FORCE_CPU"))
               or jax.config.jax_platforms == "cpu")
    if cpu and not os.environ.get("QWEN3_TTS_TPU_CPU_CACHE"):
        return ""
    if path is None:
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
    if cpu and os.path.basename(path) != "cpu-" + host_cpu_key():
        path = os.path.join(path, "cpu-" + host_cpu_key())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if fork_safe_writes is None:
        fork_safe_writes = cpu
    if fork_safe_writes:
        _install_fork_safe_writes()
    return path
