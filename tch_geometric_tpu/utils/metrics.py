"""Structured per-step metrics + profiling hooks (SURVEY §5).

The reference has no observability beyond error types; here every training
loop can emit structured JSON-lines metrics (edges/s, minibatches/s, step
time) and wrap hot phases in ``jax.profiler`` trace annotations for
Perfetto.
"""
from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, Optional, TextIO

import jax


@contextlib.contextmanager
def trace_span(name: str):
    """Named profiler span (shows up in jax.profiler / Perfetto traces)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile(logdir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class MetricsLogger:
    """JSON-lines step metrics with throughput derivation."""

    stream: TextIO = field(default_factory=lambda: sys.stderr)
    _t_last: Optional[float] = None

    def step(self, step: int, *, edges: Optional[int] = None,
             batch_size: Optional[int] = None, **scalars):
        now = time.perf_counter()
        rec: Dict[str, object] = {"step": int(step)}
        if self._t_last is not None:
            dt = now - self._t_last
            rec["step_time_s"] = round(dt, 6)
            if edges:
                rec["edges_per_s"] = round(edges / dt, 1)
            if batch_size:
                rec["batches_per_s"] = round(1.0 / dt, 3)
        self._t_last = now
        for k, v in scalars.items():
            rec[k] = float(v)
        self.stream.write(json.dumps(rec) + "\n")
        self.stream.flush()
        return rec

    def event(self, **fields):
        """One structured JSON-lines record outside the step cadence
        (benchmark results, phase summaries)."""
        self.stream.write(json.dumps(fields) + "\n")
        self.stream.flush()
        return fields
