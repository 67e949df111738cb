"""Data profiling and data-quality validation queries.

The ops a pipeline runs before trusting 100 TB of new input: a
one-pass column profile (null counts, exact distincts, min/max/mean)
and a declarative constraint suite (referential integrity, key
uniqueness, domain checks) whose output is a tiny check->violations
table. Both are single declarative plans: the profile is ONE
aggregation over the scan unpivoted with ``stack`` (never one job per
column), and every DQ check is an aggregate or anti-join that
partial-aggregates before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oarphpy_spark.registry import query
from oarphpy_spark.tables import table

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _profile_oracle() -> str:
    aggs = ["COUNT(*) AS n"]
    for c in _PROFILE_COLS:
        aggs += [
            f"COUNT(*) - COUNT({c}) AS nn_{c}",
            f"COUNT(DISTINCT {c}) AS nd_{c}",
            f"ROUND(MIN({c}), 4) AS mn_{c}",
            f"ROUND(MAX({c}), 4) AS mx_{c}",
            f"ROUND(AVG({c}), 4) AS av_{c}",
        ]
    arms = "\n    UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST(nn_{c} AS BIGINT) AS n_nulls, "
        f"CAST(nd_{c} AS BIGINT) AS n_distinct, mn_{c} AS min_v, "
        f"mx_{c} AS max_v, av_{c} AS avg_v FROM s"
        for c in _PROFILE_COLS
    )
    return f"WITH s AS (SELECT {', '.join(aggs)} FROM lineitem)\n    {arms}"


@query("q_profile_table", oracle=_profile_oracle())
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling (the deequ/profiler shape): null
    count, exact distinct count, min/max/mean for each audited column,
    computed in a SINGLE aggregation over a single scan and unpivoted
    with ``stack``. The multi-count-distinct expands the input k-fold
    before the exchange (Spark's Expand), which is the documented cost
    of exactness — swap ``approx_count_distinct`` in at 100 TB when
    +-2% is acceptable and the expand disappears."""
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.round(F.min(c), 4).alias(f"mn_{c}"),
            F.round(F.max(c), 4).alias(f"mx_{c}"),
            F.round(F.avg(c), 4).alias(f"av_{c}"),
        ]
    s = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}, av_{c}" for c in _PROFILE_COLS
    )
    return s.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_v, max_v, avg_v)"
        )
    )


@query(
    "q_dq_checks",
    oracle="""
    SELECT 'orders_orphan_customer' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_violations
    FROM orders WHERE o_custkey IS NOT NULL
      AND o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'lineitem_orphan_order', CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_orderkey IS NOT NULL
      AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'customer_dup_key',
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'lineitem_nonpositive_qty', CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_quantity <= 0
    UNION ALL
    SELECT 'orders_null_custkey', CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE o_custkey IS NULL
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation suite: referential integrity via
    anti-joins (orphans never materialize — the anti-join emits only
    counts), key uniqueness as count-minus-distinct, and domain/null
    checks as filtered counts. Output is check_name -> n_violations,
    the contract a pipeline gate asserts on. Each arm
    partial-aggregates; the FK anti-joins broadcast their key side
    when it fits and shuffle-hash otherwise — never a row explosion.
    NULL FKs are excluded from the orphan arms on BOTH engines (an
    anti-join counts a NULL-key row as an orphan while SQL ``NOT IN``
    silently drops it — on dirty data the two disagree unless the
    check pins the semantics); NULL keys are surfaced by their own
    dedicated arm instead."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    lineitem = table(spark, sf_dir, "lineitem")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    orphan_orders = (
        orders.filter(F.col("o_custkey").isNotNull())
        .join(customer, orders["o_custkey"] == customer["c_custkey"], "left_anti")
        .agg(F.count("*").alias("n"))
    )
    orphan_items = (
        lineitem.filter(F.col("l_orderkey").isNotNull())
        .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count("*").alias("n"))
    )
    dup_cust = customer.agg(
        (F.count("*") - F.countDistinct("c_custkey")).alias("n")
    )
    bad_qty = lineitem.filter(F.col("l_quantity") <= 0).agg(
        F.count("*").alias("n")
    )
    null_cust = orders.filter(F.col("o_custkey").isNull()).agg(
        F.count("*").alias("n")
    )
    return (
        check("orders_orphan_customer", orphan_orders)
        .unionAll(check("lineitem_orphan_order", orphan_items))
        .unionAll(check("customer_dup_key", dup_cust))
        .unionAll(check("lineitem_nonpositive_qty", bad_qty))
        .unionAll(check("orders_null_custkey", null_cust))
    )
