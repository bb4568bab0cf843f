"""Steady-clock timer with laps.

API parity with the reference ``spla::Timer`` (``include/spla/timer.hpp:49-72``):
start/stop/lap_begin/lap_end, elapsed ms, per-lap print.  Used by the
examples/benchmark harness exactly like the reference examples
(``examples/bfs.cpp:91-140``).
"""

from __future__ import annotations

import time

__all__ = ["Timer"]


class Timer:
    def __init__(self):
        self._start = 0.0
        self._elapsed = 0.0
        self._laps: list[float] = []
        self._lap_start = 0.0

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> None:
        self._elapsed = time.perf_counter() - self._start

    def lap_begin(self) -> None:
        self._lap_start = time.perf_counter()

    def lap_end(self) -> None:
        self._laps.append(time.perf_counter() - self._lap_start)

    def get_elapsed_ms(self) -> float:
        return self._elapsed * 1e3

    def get_elapsed_sec(self) -> float:
        return self._elapsed

    def get_laps_ms(self) -> list[float]:
        return [lap * 1e3 for lap in self._laps]

    def print(self, end="") -> None:  # noqa: A003 - reference name
        print(", ".join(f"{lap:.3f}" for lap in self.get_laps_ms()), end=end)

    def __repr__(self):
        return f"Timer(laps_ms={self.get_laps_ms()})"
