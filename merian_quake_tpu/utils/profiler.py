"""Scoped CPU/device profiler.

Equivalent of Merian's profiler (MERIAN_PROFILE_SCOPE / _GPU spans with
periodic aggregated reports, SURVEY §5.1). Device spans force
``block_until_ready`` at scope exit, so they measure real execution —
use sparingly in production loops (XLA overlap is lost inside a span),
exactly like timestamp queries in the reference.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class Profiler:
    def __init__(self, enabled: bool = True, report_every: int = 50):
        self.enabled = enabled
        self.report_every = report_every
        self._acc: dict[str, float] = defaultdict(float)
        self._count: dict[str, int] = defaultdict(int)
        self._runs = 0

    @contextmanager
    def cpu(self, name: str):
        """CPU span (host work: game step, accel build, readbacks)."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    @contextmanager
    def device(self, name: str):
        """Device span: blocks on everything submitted inside the scope."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        holder = []
        try:
            yield holder
        finally:
            if holder:
                jax.block_until_ready(holder)
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    def frame_done(self) -> str | None:
        """Call once per frame; returns a report string every
        ``report_every`` frames (≈ the reference's ImGui report)."""
        self._runs += 1
        if self._runs % self.report_every != 0:
            return None
        return self.report()

    def report(self) -> str:
        lines = ["profiler report (avg ms over counted scopes):"]
        for name in sorted(self._acc, key=lambda n: -self._acc[n]):
            avg = self._acc[name] / max(self._count[name], 1) * 1000
            total = self._acc[name] * 1000
            lines.append(
                f"  {name:<32} avg {avg:8.2f} ms  total {total:9.1f} ms"
                f"  x{self._count[name]}"
            )
        return "\n".join(lines)

    def reset(self):
        self._acc.clear()
        self._count.clear()
        self._runs = 0
