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



# ---------------------------------------------------------------------------
# Fork isolation: run each test MODULE in its own forked child.
#
# XLA:CPU's JIT segfaults inside `backend_compile_and_load` (LLVM code
# emission) when a large program is compiled late in a long pytest process
# — deterministically at the largest late compile of a full run (observed
# at test_streaming's session program, and at test_server's dp-mesh engine
# program when test_streaming was reordered first), never when the same
# file runs solo.  ~130 green tests / hundreds of compiled programs
# precede the crash; raising RLIMIT_STACK to 128 MB changes nothing, so
# it is cumulative in-process JIT state, not stack depth or any one test.
#
# The fix is isolation, not ordering: the runtestloop below forks one
# child per test module (bounding each process to ~20 compiles), streams
# `TestReport._to_json()` payloads back over a pipe, and replays them
# through the parent's hooks so terminal output, -x/--maxfail, exit codes
# and --durations behave exactly as stock pytest.  The parent never
# initializes a JAX backend (collection imports no jax computations), so
# forking is safe; each child lazily creates its own CPU client.
#
# A crashed child is reported as a failure on the not-yet-reported items
# of its module and the rest of the suite continues in fresh processes.
# Set QWEN3_TTS_TPU_NO_FORK_SUITE=1 to fall back to the stock in-process
# loop (e.g. to debug with pdb, which cannot attach across a fork).
# ---------------------------------------------------------------------------


def pytest_runtestloop(session):
    import pickle
    import struct

    if (os.environ.get("QWEN3_TTS_TPU_NO_FORK_SUITE")
            or not hasattr(os, "fork")
            or session.config.getvalue("collectonly")
            or session.config.getvalue("usepdb")):
        return None  # stock loop
    if session.testsfailed and not session.config.option.continue_on_collection_errors:
        return None

    from _pytest.reports import TestReport
    from _pytest.runner import runtestprotocol

    groups = []
    for item in session.items:
        path = item.location[0]
        if not groups or groups[-1][0] != path:
            groups.append((path, []))
        groups[-1][1].append(item)

    for _path, items in groups:
        rfd, wfd = os.pipe()
        pid = os.fork()
        if pid == 0:  # child
            status = 0
            try:
                os.close(rfd)
                out = os.fdopen(wfd, "wb")
                # -x / --maxfail=N live in option.maxfail (0 = unlimited)
                maxfail = getattr(session.config.option, "maxfail", 0) or 0
                failed = 0
                for i, item in enumerate(items):
                    nxt = items[i + 1] if i + 1 < len(items) else None
                    reports = runtestprotocol(item, nextitem=nxt, log=False)
                    for rep in reports:
                        blob = pickle.dumps(rep._to_json())
                        out.write(struct.pack("<I", len(blob)))
                        out.write(blob)
                    out.flush()
                    failed += sum(1 for r in reports if r.failed)
                    if maxfail and failed >= maxfail:
                        break  # stop this module; the parent stops the rest
                out.close()
            except BaseException:
                import traceback

                traceback.print_exc()
                status = 1
            os._exit(status)

        # parent: replay the child's reports through the standard hooks
        os.close(wfd)
        reported = set()
        cur = None  # nodeid with an open logstart
        with os.fdopen(rfd, "rb") as inp:
            while True:
                hdr = inp.read(4)
                if len(hdr) < 4:
                    break
                (n,) = struct.unpack("<I", hdr)
                blob = inp.read(n)
                if len(blob) < n:
                    break
                rep = TestReport._from_json(pickle.loads(blob))
                if rep.nodeid != cur:
                    if cur is not None:
                        session.ihook.pytest_runtest_logfinish(
                            nodeid=cur, location=_loc(items, cur))
                    cur = rep.nodeid
                    session.ihook.pytest_runtest_logstart(
                        nodeid=cur, location=_loc(items, cur))
                reported.add((rep.nodeid, rep.when))
                session.ihook.pytest_runtest_logreport(report=rep)
        _, st = os.waitpid(pid, 0)
        crashed = not (os.WIFEXITED(st) and os.WEXITSTATUS(st) == 0)
        if crashed:
            sig = (f"signal {os.WTERMSIG(st)}" if os.WIFSIGNALED(st)
                   else f"exit status {os.WEXITSTATUS(st)}")
            for item in items:
                if (item.nodeid, "call") in reported:
                    continue
                if (item.nodeid, "setup") in reported and \
                        (item.nodeid, "teardown") in reported:
                    continue  # fully reported (e.g. skipped in setup)
                rep = TestReport(
                    nodeid=item.nodeid, location=item.location,
                    keywords={}, outcome="failed",
                    longrepr=f"test-module worker crashed ({sig})",
                    when="call", sections=[], duration=0.0, user_properties=[])
                if rep.nodeid != cur:
                    if cur is not None:
                        session.ihook.pytest_runtest_logfinish(
                            nodeid=cur, location=_loc(items, cur))
                    cur = rep.nodeid
                    session.ihook.pytest_runtest_logstart(
                        nodeid=cur, location=item.location)
                session.ihook.pytest_runtest_logreport(report=rep)
        if cur is not None:
            session.ihook.pytest_runtest_logfinish(
                nodeid=cur, location=_loc(items, cur))
        if session.shouldstop:
            raise session.Interrupted(session.shouldstop)
        if session.shouldfail:
            raise session.Failed(session.shouldfail)
    return True


def _loc(items, nodeid):
    for it in items:
        if it.nodeid == nodeid:
            return it.location
    return items[0].location
