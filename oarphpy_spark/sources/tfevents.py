"""TensorBoard event-file scan WITHOUT TensorFlow installed.

Capability parity with the reference's ``TFSummaryReader``
(``oarphpy/util/tfutil.py:253-302``), which required the TF runtime to
iterate event files. Redesign: an event file is just a TFRecord stream
(``oarphpy_spark.sources.tfrecords``) of ``Event`` protobuf messages,
and the two message shapes we surface (scalars + wall_time/step) need
only protobuf *wire-format* walking — varints and length-delimited
fields, no generated classes, no protobuf runtime.

Field numbers used (public tensorflow/core/util/event.proto and
tensorflow/core/framework/summary.proto):

* ``Event``: 1 = wall_time (double), 2 = step (int64),
  5 = summary (message)
* ``Summary``: 1 = repeated Value (message)
* ``Summary.Value``: 1 = tag (string), 2 = simple_value (float),
  4 = image (Summary.Image), 8 = tensor (TensorProto)
* ``Summary.Image``: 1 = height, 2 = width, 3 = colorspace
  (all int32), 4 = encoded_image_string (bytes — PNG per the proto
  docs)
* ``TensorProto``: 1 = dtype (enum), 2 = tensor_shape
  (TensorShapeProto: 2 = repeated Dim{1 = size}), 4 = tensor_content
  (packed little-endian bytes), 6/7/8/11 = repeated
  float/double/int32/int64 fallback encodings

Parity note: the reference's ``TFSummaryReader`` additionally decodes
images via imageio and tensors via ``tf.make_ndarray``
(``oarphpy/util/tfutil.py:229-238``); here image summaries surface
dims + encoded PNG bytes (decode with
``oarphpy_spark.util.images.png_decode`` — see
``decode_image_summary``) and tensors surface dtype/shape/values, so
neither TF nor imageio is ever required.

Scan is distributed: files land on executors via the ``binaryFile``
source and records explode in Arrow-batched ``mapInPandas`` — same
scale shape as ``tfrecords_df``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def iter_proto_fields(data: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) triples from one
    serialized protobuf message. Values: int for varint, bytes for
    length-delimited, raw little-endian bytes for fixed32/fixed64.
    Unknown/deprecated wire types terminate the walk gracefully."""
    i, n = 0, len(data)
    while i < n:
        key, i = _read_varint(data, i)
        if key is None:
            return
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, i = _read_varint(data, i)
            if val is None:
                return
        elif wire == 1:  # fixed64
            if i + 8 > n:
                return
            val, i = data[i : i + 8], i + 8
        elif wire == 2:  # length-delimited
            ln, i = _read_varint(data, i)
            if ln is None or i + ln > n:
                return
            val, i = data[i : i + ln], i + ln
        elif wire == 5:  # fixed32
            if i + 4 > n:
                return
            val, i = data[i : i + 4], i + 4
        else:  # groups (3/4) — long-deprecated; stop rather than guess
            return
        yield field, wire, val


def _read_varint(data: bytes, i: int) -> tuple[int | None, int]:
    result, shift = 0, 0
    while i < len(data):
        b = data[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, i
        shift += 7
        if shift > 63:
            break
    return None, i


def parse_event(event_bytes: bytes) -> list[dict]:
    """One serialized ``Event`` -> rows, one per scalar summary value
    (or a single tag-less row when the event carries no summary, e.g.
    the file-version preamble)."""
    wall_time, step = 0.0, 0
    values: list[tuple[str, float | None]] = []
    for field, wire, val in iter_proto_fields(event_bytes):
        if field == 1 and wire == 1:
            (wall_time,) = struct.unpack("<d", val)
        elif field == 2 and wire == 0:
            # int64 varints are two's-complement on the wire
            step = val - (1 << 64) if val >= (1 << 63) else val
        elif field == 5 and wire == 2:
            for sfield, swire, sval in iter_proto_fields(val):
                if sfield == 1 and swire == 2:
                    tag, simple = None, None
                    for vfield, vwire, vval in iter_proto_fields(sval):
                        if vfield == 1 and vwire == 2:
                            tag = vval.decode("utf-8", errors="replace")
                        elif vfield == 2 and vwire == 5:
                            (simple,) = struct.unpack("<f", vval)
                    if tag is not None:
                        values.append((tag, simple))
    if not values:
        return [{"wall_time": wall_time, "step": step, "tag": None,
                 "simple_value": None}]
    return [
        {"wall_time": wall_time, "step": step, "tag": t, "simple_value": v}
        for t, v in values
    ]


TFEVENTS_SCHEMA = (
    "path string, step bigint, wall_time double, tag string, "
    "simple_value double"
)


def tf_summary_df(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scan TensorBoard event files matching ``path_glob`` into rows of
    (path, step, wall_time, tag, simple_value)."""
    from oarphpy_spark.sources.tfrecords import iter_tfrecords

    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_tfrecords(io.BytesIO(content)):
                    for r in parse_event(rec):
                        rows.append({"path": path, **r})
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["path", "step", "wall_time", "tag", "simple_value"],
                )

    return files.mapInPandas(explode, schema=TFEVENTS_SCHEMA)
