"""Stock relational coverage (SURVEY.md §2.B) — scans, filters, joins,
aggregations, windows, sorts, set ops, scalar function families.

Every query here is pure DataFrame API: Catalyst handles pushdown,
pruning, join selection, partial aggregation, and codegen. Floating
aggregates are rounded identically in Spark and oracle SQL so the
order-insensitive value hash is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oarphpy_spark.registry import query
from oarphpy_spark.tables import table


# ---------------------------------------------------------------------------
# (d) Aggregations
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                          AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                     AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
  ROUND(AVG(l_quantity), 4)                          AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                     AS avg_price,
  ROUND(AVG(l_discount), 4)                          AS avg_disc,
  COUNT(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q_agg_sum_avg_minmax", oracle=_Q1_ORACLE)
def q_agg_sum_avg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: scan → filter → hash agg → sort.

    The flagship query (SURVEY.md §7 Phase 0). Catalyst pushes the
    ``l_shipdate`` predicate into the parquet scan and prunes to the 7
    referenced columns; aggregation runs partial (map-side) + final.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
