"""Throughput / latency metrology.

Capability parity with the reference's ``ThruputObserver``
(reference ``oarphpy/util/thruput_observer.py:20-286``): count items +
bytes + wall time in blocks, report rates and latency percentiles, and
merge observers monoidally (so per-task observers union into a job
total — pairs with accumulators / ``df.observe``).
"""

from __future__ import annotations

import time
from typing import Iterable, Iterator


class ThruputObserver:
    def __init__(self, name: str = "", only_stats: bool = False):
        self.name = name
        self.n = 0
        self.num_bytes = 0
        self.latencies_sec: list[float] = []
        self._t0: float | None = None
        self._only_stats = only_stats  # drop per-chunk latencies if huge

    # -- timing blocks -------------------------------------------------
    def start_block(self) -> None:
        self._t0 = time.perf_counter()

    def stop_block(self, n: int = 0, num_bytes: int = 0) -> None:
        dt = 0.0 if self._t0 is None else time.perf_counter() - self._t0
        self._t0 = None
        self.n += n
        self.num_bytes += num_bytes
        if not self._only_stats:
            self.latencies_sec.append(dt)

    def observe(self, n: int = 0, num_bytes: int = 0, dt_sec: float = 0.0) -> None:
        self.n += n
        self.num_bytes += num_bytes
        if not self._only_stats:
            self.latencies_sec.append(dt_sec)

    def __enter__(self) -> "ThruputObserver":
        self.start_block()
        return self

    def __exit__(self, *exc) -> None:
        self.stop_block()

    # -- stats -----------------------------------------------------------
    @property
    def total_sec(self) -> float:
        return sum(self.latencies_sec)

    def rate_per_sec(self) -> float:
        t = self.total_sec
        return self.n / t if t > 0 else float("nan")

    def bytes_per_sec(self) -> float:
        t = self.total_sec
        return self.num_bytes / t if t > 0 else float("nan")

    def percentiles(self, qs=(0.5, 0.95, 0.99)) -> dict[float, float]:
        if not self.latencies_sec:
            return {q: float("nan") for q in qs}
        xs = sorted(self.latencies_sec)
        return {q: xs[min(len(xs) - 1, int(q * len(xs)))] for q in qs}

    # -- monoid ----------------------------------------------------------
    @staticmethod
    def union(observers: Iterable["ThruputObserver"]) -> "ThruputObserver":
        out = ThruputObserver(name="union")
        for o in observers:
            out.n += o.n
            out.num_bytes += o.num_bytes
            out.latencies_sec.extend(o.latencies_sec)
        return out

    def __iadd__(self, other: "ThruputObserver") -> "ThruputObserver":
        self.n += other.n
        self.num_bytes += other.num_bytes
        self.latencies_sec.extend(other.latencies_sec)
        return self

    # -- wrappers ----------------------------------------------------------
    def wrap_generator(self, gen: Iterable, size_of=None) -> Iterator:
        """Times the wrapped generator's PRODUCTION of each item (the
        next() call), not the consumer's processing — matching the
        reference's attribution (thruput_observer.py:275-281)."""
        it = iter(gen)
        while True:
            t0 = time.perf_counter()
            try:
                item = next(it)
            except StopIteration:
                return
            dt = time.perf_counter() - t0
            self.observe(
                n=1,
                num_bytes=(size_of(item) if size_of else 0),
                dt_sec=dt,
            )
            yield item

    def __str__(self) -> str:
        pct = self.percentiles()
        return (
            f"ThruputObserver({self.name}: n={self.n}, bytes={self.num_bytes}, "
            f"total={self.total_sec:.3f}s, n/s={self.rate_per_sec():.2f}, "
            f"p50={pct[0.5]:.4f}s p95={pct[0.95]:.4f}s p99={pct[0.99]:.4f}s)"
        )
