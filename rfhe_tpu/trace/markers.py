"""Op-level tracing (L6): ROI markers in the reference's exact text format,
so the reference's downstream tooling conventions carry over.

The reference instruments at two levels (SURVEY.md §5):
  frontend ops:   "frontend: ROTATE" ... "ROTATE[14377 microseconds]"
                  (profile_framewk/src/dotprod_ckks.cpp:24-65)
  kernels:        "[NTT] total cost 123 us" (patched SEAL, build/sample.txt)

Here `scope()` emits the frontend markers and `kernel_cost()` the kernel
lines; TraceCollector keeps the structured events for programmatic use, and
trace/analyze.py parses the text form with the reference parsers' semantics.
jax.profiler sections can be layered via `xla_trace()` for XLA-level detail.
"""
from __future__ import annotations

import contextlib
import io
import time
from dataclasses import dataclass, field
from typing import List, Optional, TextIO


@dataclass
class TraceEvent:
    tag: str
    micros: float
    depth: int
    kind: str          # "frontend" | "kernel"


@dataclass
class TraceCollector:
    events: List[TraceEvent] = field(default_factory=list)
    out: Optional[TextIO] = None
    _depth: int = 0

    def _emit(self, line: str) -> None:
        if self.out is not None:
            self.out.write(line + "\n")

    @contextlib.contextmanager
    def scope(self, name: str):
        """Frontend ROI: emits 'frontend: NAME' ... 'NAME[N microseconds]'."""
        self._emit(f"frontend: {name}")
        self.events.append(TraceEvent(name, 0.0, self._depth, "begin"))
        self._depth += 1
        t0 = time.perf_counter()
        try:
            yield
        finally:
            us = (time.perf_counter() - t0) * 1e6
            self._depth -= 1
            self.events.append(TraceEvent(name, us, self._depth, "frontend"))
            self._emit(f"{name}[{int(us)} microseconds]")

    def kernel_cost(self, tag: str, micros: float) -> None:
        """Kernel line: '[TAG] total cost N us' (patched-SEAL format,
        build/sample.txt:1-40)."""
        self.events.append(TraceEvent(tag, micros, self._depth, "kernel"))
        self._emit(f"[{tag}] total cost {int(micros)} us")

    @contextlib.contextmanager
    def kernel(self, tag: str, sync=None):
        """Time a kernel region (optionally calling sync() before stopping
        the clock, e.g. jax.block_until_ready)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                sync()
            self.kernel_cost(tag, (time.perf_counter() - t0) * 1e6)

    def text(self) -> str:
        buf = io.StringIO()
        for ev in self.events:
            if ev.kind == "kernel":
                buf.write(f"[{ev.tag}] total cost {int(ev.micros)} us\n")
            elif ev.kind == "begin":
                buf.write(f"frontend: {ev.tag}\n")
            else:
                buf.write(f"{ev.tag}[{int(ev.micros)} microseconds]\n")
        return buf.getvalue()

    def totals(self) -> dict:
        agg: dict = {}
        for ev in self.events:
            if ev.kind == "begin":
                continue
            agg[ev.tag] = agg.get(ev.tag, 0.0) + ev.micros
        return agg


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Layered XLA-level profiling via jax.profiler (TensorBoard format)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
