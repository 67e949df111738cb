"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of fact-to-fact joins is shuffling both
sides on the join key. Writing both tables bucketed (and sorted) on
that key makes the partitioning a table property: every subsequent
join on the bucket key is exchange-free — each task merge-joins bucket
i of A with bucket i of B straight off storage.

These helpers wrap ``bucketBy``/``saveAsTable`` (bucketed layout
requires the catalog; plain ``.parquet()`` paths cannot record bucket
metadata) and are proven shuffle-free by tests/test_scale.py, which
asserts the joined plan contains no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sorted_by: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    writer = writer.sortBy(sorted_by or bucket_col)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key. With
    matching bucket counts the planner emits a SortMergeJoin with NO
    Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
