"""TF event scan tests: events are hand-encoded with an independent
protobuf wire encoder (below), so the parser is checked against the
spec, not against itself."""

from __future__ import annotations

import struct

from oarphpy_spark.sources.tfevents import parse_event, tf_summary_df
from oarphpy_spark.sources.tfrecords import write_tfrecords


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _scalar_event(wall_time: float, step: int, tags_vals) -> bytes:
    summary = b""
    for tag, val in tags_vals:
        value_msg = _field(1, 2, _varint(len(tag)) + tag.encode()) + _field(
            2, 5, struct.pack("<f", val)
        )
        summary += _field(1, 2, _varint(len(value_msg)) + value_msg)
    ev = (
        _field(1, 1, struct.pack("<d", wall_time))
        + _field(2, 0, _varint(step & ((1 << 64) - 1)))
        + _field(5, 2, _varint(len(summary)) + summary)
    )
    return ev


def test_parse_event_scalars():
    ev = _scalar_event(1234.5, 42, [("loss", 0.25), ("acc", 0.875)])
    rows = parse_event(ev)
    assert [(r["tag"], r["simple_value"]) for r in rows] == [
        ("loss", 0.25),
        ("acc", 0.875),
    ]
    assert all(r["step"] == 42 and r["wall_time"] == 1234.5 for r in rows)


def test_parse_event_negative_step_and_no_summary():
    ev = _field(1, 1, struct.pack("<d", 9.0)) + _field(
        2, 0, _varint((-3) & ((1 << 64) - 1))
    )
    rows = parse_event(ev)
    assert rows == [
        {"wall_time": 9.0, "step": -3, "tag": None, "simple_value": None}
    ]


def test_parse_event_tolerates_unknown_fields():
    # file_version preamble (field 3, string) + an unknown fixed32.
    ev = _field(3, 2, _varint(5) + b"brain") + _field(9, 5, b"\x01\x02\x03\x04")
    rows = parse_event(ev)
    assert rows[0]["tag"] is None


def test_tf_summary_df_scan(spark, tmp_path):
    events = [
        _scalar_event(100.0, 0, [("loss", 2.0)]),
        _scalar_event(101.0, 1, [("loss", 1.5), ("lr", 0.01)]),
    ]
    p = tmp_path / "events.out.tfevents.123.host"
    with open(p, "wb") as f:
        write_tfrecords(f, events)

    df = tf_summary_df(spark, str(tmp_path / "events.out.tfevents.*"))
    rows = sorted(
        ((r["step"], r["tag"], round(r["simple_value"], 6)) for r in df.collect())
    )
    assert rows == [(0, "loss", 2.0), (1, "loss", 1.5), (1, "lr", 0.01)]
