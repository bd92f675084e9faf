"""Lightweight per-stage wall-clock timing (SURVEY.md §6 tracing row).

The reference wraps pipeline stages in CUDA event timers [M]; here a simple
context-manager timer around blocked jit calls plus optional jax.profiler
traces (``vulcan-tpu run --trace-dir``) for on-device stage breakdowns.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.last_ms = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1e3
            self.totals[name] += ms
            self.counts[name] += 1
            self.last_ms[name] = round(ms, 2)

    def summary(self) -> dict:
        return {
            k: round(self.totals[k] / max(self.counts[k], 1), 2)
            for k in self.totals
        }
