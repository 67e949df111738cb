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


def _committed_batch_id(root: str) -> int | None:
    """Batch id of the generation CURRENT points at, or None."""
    gen = _current_gen(root)
    if gen is None:
        return None
    name = os.path.basename(gen)
    try:
        return int(name.split("=", 1)[1])
    except (IndexError, ValueError):
        return None


def read_snapshot(spark: SparkSession, root: str) -> DataFrame | None:
    """The current consistent snapshot, or None before the first
    commit."""
    gen = _current_gen(root)
    return spark.read.parquet(gen) if gen else None


def read_generation(
    spark: SparkSession, root: str, batch_id: int
) -> DataFrame:
    """TIME TRAVEL: read the snapshot as of generation ``batch_id``
    (copy-on-write generations double as retained versions, exactly
    as Delta/Iceberg snapshots do). Raises if that generation has
    been pruned past ``keep_generations`` — an explicit error beats
    silently serving a different version."""
    gen = os.path.join(root, f"gen={batch_id}")
    if not os.path.isdir(gen):
        raise FileNotFoundError(
            f"generation {batch_id} not present under {root!r} "
            "(pruned past keep_generations, or never committed)"
        )
    return spark.read.parquet(gen)


def _commit_pointer(root: str, gen_name: str) -> None:
    tmp = os.path.join(root, f".{_CURRENT}.tmp")
    with open(tmp, "w") as f:
        f.write(gen_name)
    os.replace(tmp, os.path.join(root, _CURRENT))  # atomic on POSIX


def _prune_generations(root: str, committed: int, keep: int) -> None:
    """Drop generations older than the committed pointer minus
    ``keep`` — each gen is a full copy-on-write snapshot, so without
    retention storage grows as batches x snapshot size."""
    floor = committed - keep
    for name in os.listdir(root):
        if not name.startswith("gen="):
            continue
        try:
            gen_id = int(name.split("=", 1)[1])
        except (IndexError, ValueError):
            continue
        if gen_id < floor:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)


def upsert_snapshot_sink(
    root: str,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
    keep_generations: int = 2,
):
    """Build the ``foreachBatch`` callable. Changes must carry ``key``,
    ``seq_col``, ``op_col`` in {'I','U','D'} and the snapshot payload
    columns. ``keep_generations`` prior snapshots are retained behind
    the committed pointer; older ones are pruned after each commit."""
    os.makedirs(root, exist_ok=True)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        gen_name = f"gen={batch_id}"
        final = os.path.join(root, gen_name)
        committed = _committed_batch_id(root)
        if committed is not None and committed >= batch_id:
            # Stale replay: this batch is at-or-behind the committed
            # pointer. No-op REGARDLESS of whether gen=<batch_id> still
            # exists on disk — _prune_generations may have deleted it,
            # and falling through to the merge path would re-apply old
            # changes on top of the newer snapshot (apply_cdc keeps no
            # seq in the snapshot, so the stale payloads would win).
            # Never move CURRENT backwards either.
            return
        if os.path.isdir(final):
            # Replay of an already-materialized batch (at-least-once
            # foreachBatch delivery after a crash) that is AHEAD of the
            # pointer: the data is durable, only the pointer flip was
            # lost — finish the commit.
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
        _prune_generations(root, batch_id, keep_generations)

    return merge_batch


def run_upsert_stream(
    changes_stream: DataFrame,
    root: str,
    key: str,
    query_name: str,
    seq_col: str = "seq",
    op_col: str = "op",
    checkpoint_dir: str | None = None,
    keep_generations: int = 2,
):
    """Start the streaming MERGE (availableNow trigger); returns the
    StreamingQuery.

    ``checkpoint_dir`` defaults to ``<root>/_checkpoint`` so batch ids
    stay monotonic across restarts — without a durable checkpoint a
    restarted query re-numbers from batch 0, collides with committed
    generations, and the exactly-once replay contract breaks (new
    changes would be mistaken for replays and dropped)."""
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(root, "_checkpoint")
    return (
        changes_stream.writeStream.foreachBatch(
            upsert_snapshot_sink(
                root,
                key,
                seq_col=seq_col,
                op_col=op_col,
                keep_generations=keep_generations,
            )
        )
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
