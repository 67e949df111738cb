"""Streaming sinks with exactly-once discipline.

``foreach_batch_parquet`` — the idempotent-writer pattern: each
micro-batch lands in an epoch-keyed directory, so a replayed epoch
(failure/restart) overwrites its own output instead of duplicating it.
With a transactional table format (Delta/Iceberg) the epoch key
becomes a txn id; the shape is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def foreach_batch_parquet(stream_df: DataFrame, out_dir: str, query_name: str):
    """Start a foreachBatch parquet writer: batch N overwrites
    ``{out_dir}/epoch={N}``. Returns the StreamingQuery."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
