"""Streaming exact-dedup (transformWithStateInPandas).

The processor's first-seen semantics are unit-tested against the
StatefulProcessor contract with a fake state handle (the wire protocol
below it needs google.protobuf, which this container lacks); the
end-to-end streaming test runs wherever protobuf is available.
"""

from __future__ import annotations

import pandas as pd
import pytest

from oarphpy_spark.streaming.dedup import FirstSeenProcessor

from .conftest import SF_SMALL


class _FakeValueState:
    def __init__(self):
        self._val = None

    def exists(self):
        return self._val is not None

    def get(self):
        return self._val

    def update(self, v):
        self._val = v

    def clear(self):
        self._val = None


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.states[name] = _FakeValueState()
        self.ttl = ttlDurationMs
        return self.states[name]


def _emit(proc, key, rows):
    return list(proc.handleInputRows(key, iter(rows), timerValues=None))


def test_first_seen_processor_emits_once():
    proc = FirstSeenProcessor()
    proc.init(_FakeHandle())
    batch = pd.DataFrame({"doc_id": [7, 3, 9], "text": ["t", "t", "t"]})

    out = _emit(proc, ("fp1",), [batch])
    assert len(out) == 1
    row = out[0].iloc[0]
    # min doc_id wins deterministically; fingerprint column added
    assert row["doc_id"] == 3 and row["fingerprint"] == "fp1"

    # second trigger with the same key: state says seen -> nothing
    assert _emit(proc, ("fp1",), [batch]) == []


def test_first_seen_processor_min_across_batches():
    """A key's rows can span multiple Arrow batches within one trigger;
    the winner must be the min doc_id over ALL of them."""
    proc = FirstSeenProcessor()
    proc.init(_FakeHandle())
    b1 = pd.DataFrame({"doc_id": [7, 9], "text": ["t", "t"]})
    b2 = pd.DataFrame({"doc_id": [3], "text": ["t"]})
    out = _emit(proc, ("fp",), [b1, b2])
    assert len(out) == 1 and out[0].iloc[0]["doc_id"] == 3


def test_first_seen_processor_ignores_empty_batches():
    proc = FirstSeenProcessor()
    proc.init(_FakeHandle())
    empty = pd.DataFrame({"doc_id": [], "text": []})
    assert _emit(proc, ("fp2",), [empty]) == []
    # key never marked seen by an empty trigger
    follow = pd.DataFrame({"doc_id": [1], "text": ["x"]})
    assert len(_emit(proc, ("fp2",), [follow])) == 1


def test_first_seen_processor_ttl_plumbed():
    handle = _FakeHandle()
    FirstSeenProcessor(ttl_ms=60_000).init(handle)
    assert handle.ttl == 60_000


def test_streaming_dedup_equals_batch(spark, tmp_path):
    pytest.importorskip("google.protobuf")
    import os

    from oarphpy_spark.llm.dedup import exact_dedup
    from oarphpy_spark.streaming.dedup import streaming_exact_dedup
    from oarphpy_spark.tables import table

    key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src_dir = tmp_path / "docs_src"
        src_dir.mkdir()
        os.symlink(
            f"{SF_SMALL}/documents.parquet", src_dir / "documents.parquet"
        )
        docs_stream = spark.readStream.schema(
            table(spark, SF_SMALL, "documents").schema
        ).parquet(str(src_dir))
        deduped = streaming_exact_dedup(docs_stream)
        q = (
            deduped.writeStream.format("memory")
            .queryName("t_stream_dedup")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.table("t_stream_dedup").collect()
        batch = exact_dedup(
            table(spark, SF_SMALL, "documents"), "text", "doc_id"
        ).collect()
        got_map = {r["fingerprint"]: r["doc_id"] for r in got}
        want_map = {r["fingerprint"]: r["doc_id"] for r in batch}
        assert len(got) == len(got_map)
        assert got_map == want_map
    finally:
        spark.conf.unset(key)


class _FakeGroupState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_running_anomaly_state_carries_across_triggers():
    """The flag an event gets in trigger 2 must depend on statistics
    accumulated in trigger 1 — the whole point of keyed state. 9
    tight values arrive first (n=9 >= MIN_N, tiny variance), then one
    wild value: processed in a SECOND trigger it must still be
    flagged, and a fresh-state run of only trigger 2 must NOT flag it
    (n too small)."""
    from oarphpy_spark.streaming.stateful import _update_running_anomaly

    def emit(state, rows):
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    [f"2024-01-01 10:{i:02d}:00" for i in range(len(rows))]
                ),
                "event_id": range(len(rows)),
                "cv": rows,
            }
        )
        (out,) = list(_update_running_anomaly((7,), iter([pdf]), state))
        return out.iloc[0]

    st = _FakeGroupState()
    first = emit(st, [100, 101, 99, 100, 100, 101, 99, 100, 100])
    assert first["n_events"] == 9 and first["n_flags"] == 0

    second = emit(st, [5000])
    assert second["n_events"] == 10
    assert second["n_flags"] == 1  # judged against trigger-1 stats

    fresh = emit(_FakeGroupState(), [5000])
    assert fresh["n_flags"] == 0  # alone, n < MIN_N: nothing to judge by
