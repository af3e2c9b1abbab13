"""Tracing / profiling / metrics utilities.

The reference has no profiler integration — performance measurement is
ad-hoc wall-clock + nvidia-smi scraping (SURVEY.md §5). Here:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing an
  xplane/Perfetto trace of everything dispatched inside (the decode-step
  cost breakdowns in docs/benchmark.md come from these).
- ``annotate(name)``: named span visible in the trace timeline.
- ``MetricsLogger``: periodic structured throughput/latency lines from an
  engine's ``EngineStats`` — one JSON object per line, greppable and
  machine-ingestable (the reference logs free-form colored text only).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace into ``logdir`` (TensorBoard layout)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class MetricsLogger:
    """Engine throughput metrics as JSON lines.

    Usage:
        metrics = MetricsLogger(engine, interval_s=5.0)
        ... generation loop ...
        metrics.maybe_emit()       # prints at most once per interval
        metrics.emit()             # force a line
    """

    def __init__(self, engine, interval_s: float = 5.0, sink=print):
        self.engine = engine
        self.interval_s = interval_s
        self.sink = sink
        self._t0 = time.perf_counter()
        self._last_emit = self._t0
        self._last_decode = 0
        self._last_prefill = 0

    def snapshot(self) -> dict:
        now = time.perf_counter()
        s = self.engine.stats
        dt = max(now - self._last_emit, 1e-9)
        d_dec = s.decode_tokens - self._last_decode
        d_pre = s.prefill_tokens - self._last_prefill
        return {
            "ts": round(now - self._t0, 3),
            "decode_tokens": s.decode_tokens,
            "prefill_tokens": s.prefill_tokens,
            "chunks": s.chunks,
            "decode_tokens_per_s": round(d_dec / dt, 1),
            "prefill_tokens_per_s": round(d_pre / dt, 1),
            "free_pages": getattr(self.engine, "_host_free_pages", None),
            "free_slots": len(getattr(self.engine, "_free_slots", [])),
        }

    def emit(self) -> dict:
        snap = self.snapshot()
        s = self.engine.stats
        self._last_emit = time.perf_counter()
        self._last_decode = s.decode_tokens
        self._last_prefill = s.prefill_tokens
        self.sink(json.dumps({"engine_metrics": snap}))
        return snap

    def maybe_emit(self) -> Optional[dict]:
        if time.perf_counter() - self._last_emit >= self.interval_s:
            return self.emit()
        return None
