"""Throughput metering.

Parity with ``rt::Throughput`` (rt/Throughput.h:33-93): a 256-entry sliding
window rate meter reporting samples/second, used by every pipeline stage for
the per-task "average throughput" status the reference logs once per second.
"""

from __future__ import annotations

import time
from collections import deque


class Throughput:
    WINDOW = 256

    def __init__(self):
        self._events: deque[tuple[float, int]] = deque(maxlen=self.WINDOW)
        self._total = 0

    def update(self, elements: int, now: float | None = None):
        now = time.monotonic() if now is None else now
        self._events.append((now, elements))
        self._total += elements

    def average(self) -> float:
        """samples/s over the sliding window."""
        if len(self._events) < 2:
            return 0.0
        t0 = self._events[0][0]
        t1 = self._events[-1][0]
        if t1 <= t0:
            return 0.0
        n = sum(e for _, e in self._events) - self._events[0][1]
        return n / (t1 - t0)

    @property
    def total(self) -> int:
        return self._total
