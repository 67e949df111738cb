"""Idempotent streaming sinks.

Structured Streaming's delivery guarantee to arbitrary sinks is
AT-LEAST-ONCE: after a crash, the restarted query replays the last
uncommitted micro-batch, so a naive ``foreachBatch`` writer appends
duplicates. The standard fix (the same contract Delta/Kafka
transactional sinks implement internally) is to make the write
idempotent on ``(query_id, batch_id)`` — replays of a committed batch
become no-ops, upgrading the end-to-end guarantee to exactly-once.

This module implements that pattern for plain parquet directories:
each batch lands in its own ``batch_id=N`` partition directory via an
atomic tempdir-then-rename, and a replayed batch that finds its
directory already committed skips the write. Readers see
``spark.read.parquet(root)`` with partition pruning on ``batch_id``.

At scale the same shape holds on any filesystem with atomic rename
(HDFS, local); on S3-class stores swap the rename for a manifest
commit — the batch-id bookkeeping is unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def idempotent_parquet_sink(root: str):
    """Build a ``foreachBatch`` function writing each micro-batch to
    ``{root}/batch_id={id}/`` exactly once. Returns the callable to
    pass to ``stream.writeStream.foreachBatch(...)``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(root, f"batch_id={batch_id}")
        if os.path.isdir(final):
            return  # replay of a committed batch: no-op
        tmp = os.path.join(root, f"_tmp_batch_{batch_id}")
        shutil.rmtree(tmp, ignore_errors=True)  # leftover from a crash
        batch_df.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, final)  # atomic commit
        except OSError:
            # lost the race to a concurrent replay that committed first
            shutil.rmtree(tmp, ignore_errors=True)

    return write_batch


def foreach_batch_parquet(stream_df: DataFrame, out_dir: str, query_name: str):
    """Start a foreachBatch parquet writer: batch N overwrites
    ``{out_dir}/epoch={N}`` — idempotence by OVERWRITE (a replayed
    epoch rewrites its own directory rather than duplicating rows).
    Returns the StreamingQuery. For skip-if-committed semantics with
    an atomic rename commit, use :func:`idempotent_parquet_sink`."""
    import os as _os

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            _os.path.join(out_dir, f"epoch={epoch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def committed_batches(root: str) -> list[int]:
    """Batch ids already committed under ``root``."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("batch_id="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                pass
    return sorted(out)
