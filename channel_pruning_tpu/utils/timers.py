"""Wall-clock phase timing (capability parity with lib/utils.py:99-123)."""
from __future__ import annotations

import time
from contextlib import contextmanager


class Timer:
    def __init__(self) -> None:
        self._t0 = 0.0
        self.records: dict[str, list[float]] = {}

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc(self, show: str | None = None) -> float:
        dt = time.perf_counter() - self._t0
        if show:
            self.records.setdefault(show, []).append(dt)
            print(f"[timer] {show}: {dt:.3f}s")
        return dt

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.records.setdefault(name, []).append(dt)
            print(f"[timer] {name}: {dt:.3f}s")

    def total(self, name: str) -> float:
        return sum(self.records.get(name, []))
