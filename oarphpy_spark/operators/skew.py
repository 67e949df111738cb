"""Skew mitigation primitives.

AQE's skew-join handling (on in SessionFactory) covers joins; these
cover the aggregation side and give explicit control when AQE's
runtime stats are not enough (e.g. a handful of hot keys holding >10%
of a 100 TB table each).

* ``salted_agg`` — two-stage aggregation: stage 1 groups on
  (key, salt) so a hot key's rows split across ``n_salts`` reducers;
  stage 2 merges the partials per key. Works for any algebraic
  aggregate (sum/count/min/max) supplied as (partial, merge) pairs.

* ``salted_broadcast_join`` — replicate the (small) build side per
  salt so a skewed probe side spreads across reducers. For when the
  build side is small enough to broadcast but the probe key histogram
  is pathological.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partials: dict[str, Column],
    merges: dict[str, Column],
    n_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partials``: output_name -> aggregate over raw rows (stage 1).
    ``merges``: output_name -> aggregate over stage-1 partials (stage 2,
    referencing the stage-1 output columns by name).

    ``salt_col`` optionally names an existing deterministic salt column
    (e.g. a row-identity hash mod n) — preferable to the ``rand``
    default wherever reproducible runs matter, since rand() salts
    depend on partitioning.

    Example::

        salted_agg(li, ["l_returnflag"],
                   partials={"n": F.count("*"), "s": F.sum("l_quantity")},
                   merges={"n": F.sum("n"), "s": F.sum("s")})
    """
    if salt_col is not None:
        salted = df.withColumn("__salt", F.col(salt_col))
    else:
        salted = df.withColumn("__salt", (F.rand(7) * n_salts).cast("int"))
    stage1 = salted.groupBy(*key_cols, "__salt").agg(
        *[c.alias(name) for name, c in partials.items()]
    )
    return stage1.groupBy(*key_cols).agg(
        *[c.alias(name) for name, c in merges.items()]
    )


def salted_broadcast_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed probe side against a small build side with salt
    replication: probe rows get a random salt, build rows are exploded
    across every salt, and the join key becomes (key, salt).

    Only 'inner' and 'left' are valid — under right/full-outer joins the
    replicated build rows would null-extend once PER SALT."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_broadcast_join supports inner/left, not {how!r}")
    p = probe.withColumn("__salt", (F.rand(7) * n_salts).cast("int"))
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = p.join(F.broadcast(b), [on, "__salt"], how)
    return out.drop("__salt")
