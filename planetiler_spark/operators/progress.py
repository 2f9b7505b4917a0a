"""Counters + progress logging — the reference's stats surface, Spark-first.

Reference analog: stats/Counter.java (process-wide long counters incremented
by workers) and util/ProgressLoggers.java (one status line every N seconds:
rates, worker state, memory). Here:

  - `Counters` wraps Spark ACCUMULATORS: executors add once per Arrow batch
    (never per row — zero hot-path cost), the driver reads merged totals.
    This is Spark's native analog of the reference's LongAdder counters.
    Semantics are WORK-DONE meters, like the reference's: Spark re-adds on
    task retries and on DAG recomputation by a second action, so read them
    as progress/rate instrumentation, not exactly-once aggregates (compute
    exact totals with one agg action, or cache the DataFrame).
  - `ProgressLogger` is a daemon thread that prints a reference-style line
    every `interval` seconds: counter totals + deltas/s since the last tick
    plus live stage progress from `sc.statusTracker()` (the Spark-native
    replacement for the reference's per-worker thread dump).

Usage (plans/pipeline.py --progress):

    counters = Counters(spark.sparkContext, ["features", "tiles"])
    with ProgressLogger(spark, counters):
        tiles = tileset(spark, images, counters=counters)
        tiles.write...
"""

from __future__ import annotations

import sys
import threading
import time


class Counters:
    """Named Spark accumulators. `add` is called from executor-side kernels
    once per batch; `snapshot` reads the driver-merged totals."""

    def __init__(self, sc, names: list[str]):
        self.acc = {n: sc.accumulator(0) for n in names}

    def add(self, name: str, n: int):
        self.acc[name].add(int(n))

    def snapshot(self) -> dict[str, int]:
        return {n: a.value for n, a in self.acc.items()}

    def __getstate__(self):
        # executors only need the accumulators (picklable); guard against
        # accidentally dragging a SparkContext into a closure
        return {"acc": self.acc}

    def __setstate__(self, st):
        self.acc = st["acc"]


class ProgressLogger:
    """Reference-style periodic status line (ProgressLoggers.java:199
    newLine semantics): counter totals, per-interval rates, active stages."""

    def __init__(self, spark, counters: Counters | None = None,
                 interval: float = 10.0, out=None):
        self.spark = spark
        self.counters = counters
        self.interval = interval
        self.out = out or sys.stderr
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._last: dict[str, int] = {}
        self.lines = 0

    def _line(self) -> str:
        parts = []
        if self.counters is not None:
            snap = self.counters.snapshot()
            for name, v in snap.items():
                rate = (v - self._last.get(name, 0)) / self.interval
                parts.append(f"{name}: {v:,} ({rate:,.0f}/s)")
            self._last = snap
        try:
            tracker = self.spark.sparkContext.statusTracker()
            stages = tracker.getActiveStageIds()
            frags = []
            for sid in stages[:4]:
                info = tracker.getStageInfo(sid)
                if info:
                    frags.append(f"s{sid} {info.numCompletedTasks}/{info.numTasks}")
            parts.append("stages[" + " ".join(frags) + "]" if frags else "idle")
        except Exception:  # statusTracker gone during shutdown
            parts.append("-")
        return "  ".join(parts)

    def _run(self):
        while not self._stop.wait(self.interval):
            print(self._line(), file=self.out, flush=True)
            self.lines += 1

    def __enter__(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        print(self._line(), file=self.out, flush=True)  # final totals line
        self.lines += 1
        return False
