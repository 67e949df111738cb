"""Streaming MERGE: maintain a current-state snapshot directory from a
CDC change stream — ``foreachBatch`` + the batch MERGE operator
(``operators/upsert.apply_cdc``) + an atomic snapshot swap.

Each micro-batch:

1. reads the current snapshot generation (empty on first batch),
2. merges the batch's changes with ``apply_cdc`` (one winning change
   per key via partial-aggregable max_by, then ONE full-outer join),
3. writes the next generation to ``gen=<batch_id>`` via
   tempdir-then-rename, and
4. retargets the ``CURRENT`` pointer file atomically.

A replayed batch (at-least-once ``foreachBatch`` delivery after a
crash) finds its generation already committed and no-ops — the same
(query, batch_id) idempotence contract as
``sinks.idempotent_parquet_sink``, upgrading the pipeline to
exactly-once. This is copy-on-write MERGE exactly as Delta/Iceberg do
it, with a pointer file standing in for their transaction log; at
scale the rewrite cost is bounded by partitioning the snapshot and
rewriting only key-ranges the batch touches — the merge plan itself
(hash join on the key) is unchanged.

Readers call :func:`read_snapshot`, which resolves ``CURRENT`` and
scans one consistent generation — never a half-written one.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from oarphpy_spark.operators.upsert import apply_cdc

_CURRENT = "CURRENT"


def _current_gen(root: str) -> str | None:
    ptr = os.path.join(root, _CURRENT)
    if not os.path.isfile(ptr):
        return None
    with open(ptr) as f:
        gen = f.read().strip()
    return os.path.join(root, gen) if gen else None


def read_snapshot(spark: SparkSession, root: str) -> DataFrame | None:
    """The current consistent snapshot, or None before the first
    commit."""
    gen = _current_gen(root)
    return spark.read.parquet(gen) if gen else None


def _commit_pointer(root: str, gen_name: str) -> None:
    tmp = os.path.join(root, f".{_CURRENT}.tmp")
    with open(tmp, "w") as f:
        f.write(gen_name)
    os.replace(tmp, os.path.join(root, _CURRENT))  # atomic on POSIX


def upsert_snapshot_sink(
    root: str,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
):
    """Build the ``foreachBatch`` callable. Changes must carry ``key``,
    ``seq_col``, ``op_col`` in {'I','U','D'} and the snapshot payload
    columns."""
    os.makedirs(root, exist_ok=True)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        gen_name = f"gen={batch_id}"
        final = os.path.join(root, gen_name)
        if os.path.isdir(final):
            # replay of a committed batch: just make sure the pointer
            # advanced before the crash; committing twice is harmless
            # because the generation content is deterministic.
            _commit_pointer(root, gen_name)
            return
        spark = batch_df.sparkSession
        current = read_snapshot(spark, root)
        if current is None:
            payload_cols = [
                c for c in batch_df.columns if c not in (seq_col, op_col)
            ]
            current = spark.createDataFrame(
                [], batch_df.select(*payload_cols).schema
            )
        merged = apply_cdc(
            current, batch_df, key, seq_col=seq_col, op_col=op_col
        )
        tmp = os.path.join(root, f"._tmp_{gen_name}")
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, final)
        _commit_pointer(root, gen_name)

    return merge_batch


def run_upsert_stream(
    changes_stream: DataFrame,
    root: str,
    key: str,
    query_name: str,
    seq_col: str = "seq",
    op_col: str = "op",
):
    """Start the streaming MERGE (availableNow trigger); returns the
    StreamingQuery."""
    return (
        changes_stream.writeStream.foreachBatch(
            upsert_snapshot_sink(root, key, seq_col=seq_col, op_col=op_col)
        )
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
