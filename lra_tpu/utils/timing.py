"""Per-stage timing (reference: Timing.h:9-66).

``Timing`` accumulates wall-clock per labeled stage across reads/batches;
``merge`` combines instances (the reference merges per-thread timers,
lra.cpp:708-713); ``write`` emits the --timing report.  Batch pipelines
tick once per stage per batch.
"""

from __future__ import annotations

import time
from collections import OrderedDict


class Timing:
    def __init__(self):
        self.totals: "OrderedDict[str, float]" = OrderedDict()
        self.counts: "OrderedDict[str, int]" = OrderedDict()
        self._last = time.perf_counter()

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self, label: str) -> None:
        now = time.perf_counter()
        self.totals[label] = self.totals.get(label, 0.0) + (now - self._last)
        self.counts[label] = self.counts.get(label, 0) + 1
        self._last = now

    def add(self, label: str, seconds: float) -> None:
        self.totals[label] = self.totals.get(label, 0.0) + seconds
        self.counts[label] = self.counts.get(label, 0) + 1

    def merge(self, other: "Timing") -> None:
        for k, v in other.totals.items():
            self.totals[k] = self.totals.get(k, 0.0) + v
            self.counts[k] = self.counts.get(k, 0) + other.counts.get(k, 0)

    def elapsed(self) -> float:
        return sum(self.totals.values())

    def write(self, path_or_file) -> None:
        close = False
        f = path_or_file
        if isinstance(path_or_file, str):
            f = open(path_or_file, "w")
            close = True
        total = self.elapsed() or 1.0
        f.write("stage\tseconds\tcalls\tfraction\n")
        for k, v in self.totals.items():
            f.write(f"{k}\t{v:.4f}\t{self.counts.get(k, 0)}\t{v/total:.3f}\n")
        f.write(f"TOTAL\t{total:.4f}\t\t1.000\n")
        if close:
            f.close()
