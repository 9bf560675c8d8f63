"""Tracing / profiling utilities (SURVEY.md §5: the reference has none beyond
ad-hoc time.time brackets; the TPU build gets first-class stage timers and
jax.profiler integration).

Usage:
    timers = StageTimers()
    with timers.stage("prefill"):
        ...
    print(timers.summary())

    with device_trace("/tmp/jax-trace"):
        run_generation(...)
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np


@dataclass
class StageTimers:
    """Wall-clock per-stage timers with percentile summaries.

    NOTE on TPU semantics: a stage that only dispatches async device work
    measures dispatch, not execution.  Force a D2H transfer (np.asarray) of a
    stage's output inside the `stage` block to time real execution — on this
    platform `block_until_ready` is not sufficient.
    """

    records: Dict[str, List[float]] = field(default_factory=lambda: defaultdict(list))

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self.records[name].append(seconds)

    def percentile(self, name: str, q: float) -> float:
        return float(np.percentile(self.records[name], q))

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.records.items():
            arr = np.asarray(vals)
            out[name] = {
                "count": int(arr.size),
                "total_s": float(arr.sum()),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3),
                "max_ms": float(arr.max() * 1e3),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':24s} {'count':>6s} {'mean':>9s} {'p50':>9s} "
                 f"{'p95':>9s} {'max':>9s}"]
        for name, s in self.summary().items():
            lines.append(
                f"{name:24s} {s['count']:6d} {s['mean_ms']:8.2f}m "
                f"{s['p50_ms']:8.2f}m {s['p95_ms']:8.2f}m {s['max_ms']:8.2f}m")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class FirstPacketMeter:
    """Collects first-packet latencies across requests; reports p50/p95."""

    def __init__(self):
        self.latencies_ms: List[float] = []

    def observe(self, seconds: float) -> None:
        self.latencies_ms.append(seconds * 1e3)

    def p50(self) -> Optional[float]:
        if not self.latencies_ms:
            return None
        return float(np.percentile(self.latencies_ms, 50))

    def p95(self) -> Optional[float]:
        if not self.latencies_ms:
            return None
        return float(np.percentile(self.latencies_ms, 95))
