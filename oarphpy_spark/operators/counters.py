"""Distributed counters.

Capability parity with the reference's ``CounterAccumulator`` /
``CounterCollection`` (reference ``oarphpy/spark.py:354-453``): task-
side tallies merged commutatively without shuffles. Two mechanisms:

* ``CounterAccumulator`` — a ``collections.Counter``-valued Spark
  accumulator for RDD/UDF-side imperative tallies (same idea as the
  reference; accumulators are the right tool when counting happens
  inside Python task code).

* ``observed`` — the DataFrame-native mechanism: ``df.observe`` attaches
  named aggregate metrics to a plan; Spark computes them as the action
  runs, with zero extra passes. Preferred in declarative pipelines.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.accumulators import AccumulatorParam


class CounterAccumulator(AccumulatorParam):
    """Counter-valued accumulator: zero = Counter(), merge = +."""

    def zero(self, value: Counter) -> Counter:
        return Counter()

    def addInPlace(self, c1: Counter, c2: Counter) -> Counter:
        c1.update(c2)
        return c1


class CounterCollection:
    """Named tallies usable from executor-side Python code.

    Usage::

        counters = CounterCollection(spark, 'my_job')
        def work(row):
            counters.tally('rows_seen')
            counters.kv_tally('by_flag', row.l_returnflag)
            ...
        # after an action:
        counters.value  # merged Counter
    """

    def __init__(self, spark, name: str = "counters"):
        self.name = name
        self._acc = spark.sparkContext.accumulator(Counter(), CounterAccumulator())

    def tally(self, key: str, n: int = 1) -> None:
        self._acc.add(Counter({key: n}))

    def kv_tally(self, name: str, key: str, n: int = 1) -> None:
        # Keyed sub-histogram: flat key namespace '<name>.<key>'.
        self._acc.add(Counter({f"{name}.{key}": n}))

    @property
    def value(self) -> Counter:
        return self._acc.value


def observed(df: DataFrame, name: str, *exprs) -> tuple[DataFrame, Observation]:
    """Attach observable metrics to a plan: returns (df, observation).
    After any action on the returned df, ``observation.get`` holds the
    metric values — a shuffle-free, single-pass replacement for separate
    count queries."""
    obs = Observation(name)
    if not exprs:
        exprs = (F.count(F.lit(1)).alias("n_rows"),)
    return df.observe(obs, *exprs), obs
