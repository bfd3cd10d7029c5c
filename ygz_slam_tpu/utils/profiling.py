"""Tracing / profiling / metrics utilities.

Replaces the reference's ad-hoc observability (SURVEY.md §5):
boost::timer wall-clock spots (Matcher.cpp:562,
test_feature_extraction.cpp:52-54) and glog counters — with a
structured timing registry, a JAX-profiler trace hook, and a
benchmark log in the spirit of the reference's note.md.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class Timers:
    """Named wall-clock accumulators; `block=True` syncs the device so
    async dispatch doesn't hide kernel time."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1

    def summary(self) -> dict:
        return {
            k: {
                "total_s": round(self.total[k], 4),
                "count": self.count[k],
                "mean_ms": round(1e3 * self.total[k] / max(self.count[k], 1), 3),
            }
            for k in sorted(self.total)
        }

    def log_line(self) -> str:
        return json.dumps(self.summary())

    def reset(self):
        self.total.clear()
        self.count.clear()


TIMERS = Timers()


@contextlib.contextmanager
def device_trace(logdir: str):
    """JAX profiler trace (view with TensorBoard / xprof): the
    structured replacement for scattering boost::timer calls."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def append_bench_log(path: str, entry: dict):
    """Append one benchmark record (note.md-style running log, but
    machine-readable: one JSON object per line)."""
    entry = dict(entry)
    entry.setdefault("t", time.time())
    with open(path, "a") as f:
        f.write(json.dumps(entry) + "\n")
