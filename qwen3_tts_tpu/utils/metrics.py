"""Structured metrics + logging for the serving runtime.

The reference has essentially no observability (SURVEY.md §5: transformers
logger warnings and a loss print).  A production serving layer needs one, so
this module provides a small process-local registry — counters, gauges, and
histogram-style timings — with structured JSON emission, plus a stdlib
logger configured for machine-parsable one-line records.

Design constraints: zero dependencies, no background threads (the serving
loop is latency-sensitive and single-threaded by design), O(1) hot-path
updates (histogram percentiles are computed at scrape time), and explicit
scraping — the host loop decides when to emit.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class MetricsRegistry:
    """Process-local metrics: counters (monotonic), gauges (last value),
    and bounded-reservoir timings (for percentiles)."""

    counters: Dict[str, float] = field(default_factory=lambda: defaultdict(float))
    gauges: Dict[str, float] = field(default_factory=dict)
    timings: Dict[str, List[float]] = field(default_factory=lambda: defaultdict(list))
    reservoir: int = 4096

    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] += value

    def gauge(self, name: str, value: float) -> None:
        self.gauges[name] = float(value)

    def observe(self, name: str, seconds: float) -> None:
        buf = self.timings[name]
        buf.append(float(seconds))
        if len(buf) > self.reservoir:          # drop oldest half, keep tail
            del buf[:len(buf) // 2]

    def time(self, name: str):
        """Context manager: `with metrics.time("serve.chunk"): ...`"""
        registry = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                registry.observe(name, time.perf_counter() - self.t0)
                return False

        return _Timer()

    def snapshot(self) -> Dict[str, Any]:
        """Point-in-time view with p50/p95/max for each timing series."""
        out: Dict[str, Any] = {
            "counters": dict(self.counters),
            "gauges": dict(self.gauges),
            "timings": {},
        }
        for name, buf in self.timings.items():
            if not buf:
                continue
            s = sorted(buf)
            n = len(s)
            out["timings"][name] = {
                "count": n,
                "p50": s[n // 2],
                "p95": s[min(n - 1, (n * 95) // 100)],
                "max": s[-1],
                "sum": sum(s),
            }
        return out

    def emit(self, stream=None) -> str:
        """Write the snapshot as one JSON line; returns the line."""
        line = json.dumps({"ts": time.time(), **self.snapshot()},
                          separators=(",", ":"))
        print(line, file=stream or sys.stderr)
        return line

    def reset(self) -> None:
        self.counters.clear()
        self.gauges.clear()
        self.timings.clear()


_GLOBAL: Optional[MetricsRegistry] = None


def global_metrics() -> MetricsRegistry:
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = MetricsRegistry()
    return _GLOBAL


def get_logger(name: str = "qwen3_tts_tpu",
               level: int = logging.INFO) -> logging.Logger:
    """A logger emitting one structured line per record:
    `ts level logger msg key=value ...` (extras via `logger.info(msg,
    extra={"kv": {...}})`)."""
    logger = logging.getLogger(name)
    if not any(isinstance(h, _KVHandler) for h in logger.handlers):
        handler = _KVHandler(sys.stderr)
        handler.setFormatter(_KVFormatter())
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(level)   # honored on every call, not just the first
    return logger


class _KVHandler(logging.StreamHandler):
    pass


class _KVFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        base = (f"{self.formatTime(record, '%Y-%m-%dT%H:%M:%S')} "
                f"{record.levelname} {record.name} {record.getMessage()}")
        kv = getattr(record, "kv", None)
        if kv:
            base += " " + " ".join(f"{k}={v}" for k, v in kv.items())
        return base
