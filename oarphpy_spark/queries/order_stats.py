"""Exact global order statistics WITHOUT a global sort.

Round-12 additions built on ``operators/prefix.py`` (the two-level
distributed row-number): exact percentiles and the Lorenz decile
profile. The classical plans for these — a single-partition
``Window.orderBy`` or a driver-side sort — are the canonical
"works at 60k rows, one task at 100 TB" trap; here the only
unpartitioned work is over the constant-size per-bucket totals.

Determinism discipline (testing/parity.py): values are
centi-quantized integers; ranks and deciles are pure integer
arithmetic; the one IEEE division per output row happens identically
in both engines and is ROUND()ed to 6 places.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oarphpy_spark.operators.prefix import with_global_row_number
from oarphpy_spark.registry import query
from oarphpy_spark.tables import table

# Shared restatement: per-order price in exact cents.
_CENTS_SQL = """
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
"""


def _cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )


@query(
    "q_exact_percentiles",
    oracle=f"""
    WITH v AS ({_CENTS_SQL}),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS i,
             COUNT(*) OVER () AS n
      FROM v
    )
    SELECT
      CAST(MAX(CASE WHEN i = (n * 50 + 99) // 100 THEN cents END)
           AS BIGINT) AS p50_cents,
      CAST(MAX(CASE WHEN i = (n * 90 + 99) // 100 THEN cents END)
           AS BIGINT) AS p90_cents,
      CAST(MAX(CASE WHEN i = (n * 99 + 99) // 100 THEN cents END)
           AS BIGINT) AS p99_cents,
      CAST(MAX(n) AS BIGINT) AS n_orders
    FROM ranked
    """,
)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of order value (lower type-1 quantile: the
    value at rank ceil(q*n)) — the SLA-style statistic approxQuantile
    only estimates. No global sort: ranks come from the two-level
    distributed row-number (range-bucket on the value, per-bucket
    windows in parallel, broadcast offsets), then three rank lookups
    select the answers. Ties on the value share a bucket by
    construction, and the selected VALUE at a rank is tie-invariant
    (equal cents either side of the boundary yield the same cents).
    ceil(q*n) is integer-exact as (n*q_pct + 99) div 100."""
    ranked = with_global_row_number(
        _cents(spark, sf_dir),
        ["cents", "o_orderkey"],
        out="i",
        total_col="n",
    )
    def _at(pct: int, name: str):
        rank = F.expr(f"(n * {pct} + 99) div 100")
        return F.max(
            F.when(F.col("i") == rank, F.col("cents"))
        ).cast("bigint").alias(name)

    return ranked.agg(
        _at(50, "p50_cents"),
        _at(90, "p90_cents"),
        _at(99, "p99_cents"),
        F.max("n").cast("bigint").alias("n_orders"),
    )


@query(
    "q_lorenz_deciles",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS r
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT r,
             ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS i,
             COUNT(*) OVER () AS n
      FROM rev
    ),
    dec AS (
      SELECT CAST((i - 1) * 10 // n + 1 AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(r) AS HUGEINT) AS dec_rev
      FROM ranked GROUP BY 1
    )
    SELECT decile, n_customers,
           ROUND(CAST(dec_rev AS DOUBLE)
                 / CAST(SUM(dec_rev) OVER () AS DOUBLE), 6)
             AS rev_share
    FROM dec ORDER BY decile
    """,
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz profile of per-customer revenue: customers ranked
    poorest-to-richest, split into 10 equal-population deciles, each
    decile's share of total revenue — the skew profile behind the
    Gini scalar (q_revenue_gini), and the operational answer to "how
    concentrated are my keys". The rank is the distributed two-level
    row-number (no single-task window over the billion-key relation);
    decile = ((i-1)*10) div n + 1 in pure integers; revenue sums stay
    integer until the one rounded share division. The final 10-row
    share window is constant-size."""
    rev = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("r")
        )
    )
    ranked = with_global_row_number(
        rev, ["r", "o_custkey"], out="i", total_col="n"
    )
    dec = ranked.groupBy(
        F.expr("(i - 1) * 10 div n + 1").alias("decile")
    ).agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum(F.col("r").cast("decimal(38,0)")).alias("dec_rev"),
    )
    from pyspark.sql import Window

    # 10-row relation: the single-partition share window is
    # constant-size by construction (sits above the decile aggregate,
    # the same exemption the prefix plan gate codifies).
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return dec.select(
        "decile",
        "n_customers",
        F.round(
            F.col("dec_rev").cast("double")
            / F.sum("dec_rev").over(w_all).cast("double"),
            6,
        ).alias("rev_share"),
    ).orderBy("decile")
