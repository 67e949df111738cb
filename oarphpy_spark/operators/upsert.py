"""CDC MERGE: apply a change stream (inserts / updates / deletes) to a
snapshot table — the engine-side equivalent of SQL MERGE INTO, and the
maintenance pass that keeps a dimension snapshot current from a CDC
feed (Debezium-style op + sequence records).

Two stages, each a textbook scale shape:

1. **Compact the change stream** to one winning change per key with a
   ``max_by(struct(seq, ...))`` aggregation — partial-aggregable, so
   only one row per key per input partition crosses the wire even if a
   key changed a million times (same shape as ``q_cdc_latest``).
2. **Apply** with ONE full-outer join snapshot x compacted-changes on
   the key: unmatched-left keeps the snapshot row, a winning 'D' drops
   the key, a winning 'U'/'I' takes the change payload. Both sides
   hash-partition on the key; nothing broadcasts (a real CDC delta can
   be any size) and nothing collects.

Delta/Iceberg implement MERGE with the same join under copy-on-write;
here the result is returned as a DataFrame for the caller to write —
composes with the idempotent batch sinks in ``streaming/sinks.py`` for
a streaming upsert pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """One winning change per key: the row with the highest
    ``(seq_col, op)`` wins (op breaks exact-seq ties deterministically).
    Partial-aggregable — never materializes a key's full history.

    The payload rides along via ``max_by`` keyed ONLY on
    ``(seq_col, op)`` — payload columns do not participate in the
    ordering, so non-orderable payload types (e.g. MapType) are carried
    without breaking analysis. CONTRACT: ``(key, seq_col, op_col)``
    must be unique in the feed. If duplicate (key, seq, op) rows carry
    *different* payloads, Spark's ``max_by`` picks an arbitrary one on
    the ordering tie — any real CDC source (Debezium, a transaction
    log) assigns distinct sequence numbers per change, so the
    uniqueness requirement is the natural contract rather than a
    restriction. We deliberately do not fall back to ordering by the
    payload struct: that would re-impose orderability on payload types
    and silently change which row wins based on payload values."""
    win = F.max_by(
        F.struct(
            F.col(op_col).alias("__op"),
            *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        ),
        F.struct(F.col(seq_col), F.col(op_col)),
    ).alias("__w")
    agg = changes.groupBy(key).agg(win)
    return agg.select(
        key,
        F.col("__w.__op").alias("__op"),
        *[F.col(f"__w.__p_{c}").alias(c) for c in payload_cols],
    )


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """MERGE ``changes`` (rows with ``key``, ``seq_col``, ``op_col`` in
    {'I','U','D'}, plus the snapshot's payload columns) into
    ``snapshot``; returns the next snapshot with the original column
    order. Latest-wins per key by ``seq_col``; a winning delete removes
    the key whether or not it exists; a winning insert/update replaces
    or creates the row."""
    payload = [c for c in snapshot.columns if c != key]
    win = latest_changes(changes, key, seq_col, op_col, payload)
    s = snapshot.alias("s")
    c = win.alias("c")
    joined = s.join(c, F.col(f"s.{key}") == F.col(f"c.{key}"), "full_outer")
    keep = F.col("c.__op").isNull() | (F.col("c.__op") != "D")
    take_change = F.col("c.__op").isNotNull()
    return joined.filter(keep).select(
        F.coalesce(F.col(f"c.{key}"), F.col(f"s.{key}")).alias(key),
        *[
            F.when(take_change, F.col(f"c.{p}"))
            .otherwise(F.col(f"s.{p}"))
            .alias(p)
            for p in payload
        ],
    )
