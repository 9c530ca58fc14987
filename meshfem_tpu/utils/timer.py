"""Hierarchical section timers.

Parity with reference ``Timer.hh`` / ``GlobalBenchmark.hh:8-46``
(``BENCHMARK_START/STOP_TIMER_SECTION``, ``BENCHMARK_REPORT``) and
``python/benchmark.py`` decorators.  Off unless enabled (like the
reference's -DBENCHMARK builds); the TPU story additionally hooks
``jax.profiler`` traces."""

from __future__ import annotations

import contextlib
import functools
import time


class Timer:
    def __init__(self):
        self.sections: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._stack: list[tuple[str, float]] = []
        self.enabled = False

    def start_section(self, name: str) -> None:
        if not self.enabled:
            return
        full = "/".join([s for s, _ in self._stack] + [name])
        self._stack.append((name, time.perf_counter()))

    def stop_section(self, name: str | None = None) -> None:
        if not self.enabled or not self._stack:
            return
        label, t0 = self._stack.pop()
        full = "/".join([s for s, _ in self._stack] + [label])
        self.sections[full] = self.sections.get(full, 0.0) \
            + time.perf_counter() - t0
        self.counts[full] = self.counts.get(full, 0) + 1

    @contextlib.contextmanager
    def section(self, name: str):
        self.start_section(name)
        try:
            yield
        finally:
            self.stop_section(name)

    def report(self, stream=None) -> str:
        lines = ["=== meshfem_tpu benchmark report ==="]
        for k in sorted(self.sections):
            lines.append(f"{k:<48s} {self.sections[k]*1e3:10.2f} ms  "
                         f"x{self.counts[k]}")
        out = "\n".join(lines)
        if stream is not None:
            print(out, file=stream)
        return out

    def reset(self) -> None:
        self.sections.clear()
        self.counts.clear()
        self._stack.clear()


GLOBAL_TIMER = Timer()


def enable_benchmarking(on: bool = True) -> None:
    GLOBAL_TIMER.enabled = on


def benchmarkit(fn=None, *, name: str | None = None):
    """Decorator timing a function into the global timer
    (``python/benchmark.py:5-27``)."""
    def wrap(f):
        label = name or f.__qualname__

        @functools.wraps(f)
        def inner(*a, **kw):
            with GLOBAL_TIMER.section(label):
                return f(*a, **kw)

        return inner

    return wrap(fn) if fn is not None else wrap


@contextlib.contextmanager
def jax_profile_trace(log_dir: str):
    """jax.profiler trace context (the TPU-native tracing path)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
