"""Streaming exact deduplication via ``transformWithStateInPandas``
(Spark 4's arbitrary-state API — the successor to
``applyInPandasWithState``, with typed per-key state and TTL).

The batch form (``oarphpy_spark.llm.dedup.exact_dedup``) answers "what
are the distinct documents"; a *streaming* pipeline instead needs
"drop every record whose content was already seen in any earlier
trigger". Built-in ``dropDuplicates`` on a stream keeps unbounded
state with no eviction control; here state is one boolean per distinct
fingerprint with an optional TTL, so memory is O(distinct keys in the
TTL horizon) — the standard design for ingest dedup at scale.

Grouping key = the fingerprint, so state lookups are local to the
shuffle partition that owns the key; Spark's state store handles
fault tolerance and rocksdb spilling.

Environment note: the transformWithState wire protocol needs
``google.protobuf`` on driver and executors (ships with full Spark
distributions; absent from this container). ``FirstSeenProcessor``'s
logic is unit-tested against the StatefulProcessor contract directly;
the end-to-end streaming test auto-skips when protobuf is missing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

DEDUP_OUT_SCHEMA = "fingerprint string, doc_id bigint, text string"


class FirstSeenProcessor(StatefulProcessor):
    """Emit only the first record per key, ever (within the TTL)."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", "seen boolean", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        # min doc_id across ALL of the trigger's Arrow batches (a key's
        # rows can span batches) -> deterministic winner.
        first = None
        for pdf in rows:
            if not len(pdf):
                continue
            cand = pdf.sort_values("doc_id").head(1)
            if first is None or cand["doc_id"].iat[0] < first["doc_id"].iat[0]:
                first = cand
        if first is not None:
            self._seen.update((True,))
            yield first.assign(fingerprint=key[0])[
                ["fingerprint", "doc_id", "text"]
            ]

    def close(self) -> None:
        pass


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame -> first-seen records only, keyed by the
    same normalized-content md5 as the batch ``exact_dedup``."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), "\\s+", " ")
    keyed = docs.select(
        F.md5(norm.cast("binary")).alias("fingerprint"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("fingerprint").transformWithStateInPandas(
        FirstSeenProcessor(ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
