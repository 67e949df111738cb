"""LLM-pipeline operator tests beyond oracle parity: semantic
invariants (LSH recall vs brute force, jaccard bounds, simhash
stability) and the multimodal plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from oarphpy_spark.llm.dedup import minhash_candidate_pairs, simhash16
from oarphpy_spark.llm.multimodal import (
    blob_feature_stats,
    decode_image,
    jpeg_header_dimensions,
    synth_blob_table,
)
from oarphpy_spark.llm.similarity import brute_force_topk, hyperplane_lsh_topk

from .conftest import SF_SMALL


def _docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        Row(doc_id=3, text="completely different content about spark engines"),
        Row(doc_id=4, text="the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows)


def test_minhash_finds_near_dups(spark):
    pairs = minhash_candidate_pairs(_docs(spark), "text", "doc_id").collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 4) in found  # exact dup must share every band
    assert all(3 not in p for p in found)  # unrelated doc never pairs


def test_simhash_exact_dup_same_fp(spark):
    fps = {r["doc_id"]: r["simhash"] for r in simhash16(_docs(spark), "text", "doc_id").collect()}
    assert fps[1] == fps[4]
    assert 0 <= fps[1] < 2**16


def test_lsh_topk_is_subset_of_brute(spark):
    from oarphpy_spark.tables import table

    emb = table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    brute = brute_force_topk(emb, queries, k=50).collect()
    lsh = hyperplane_lsh_topk(emb, queries, k=5, num_planes=4).collect()
    assert len(lsh) > 0
    brute_scores = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in brute}
    # every LSH result is a genuine neighbor with the same score
    for r in lsh:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute_scores:  # (top-50 cut; scores must agree when present)
            assert abs(brute_scores[key] - r["cos"]) < 1e-9


def test_multimodal_blob_shapes(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(20)])
    blobs = synth_blob_table(docs)
    rows = blobs.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["data"]) == r["meta"]["width"] * r["meta"]["height"]
    stats = blob_feature_stats(blobs).collect()
    assert {r["format"] for r in stats} == {"png", "jpeg"}


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")


def test_jpeg_header_dimensions():
    # Minimal synthetic JPEG: SOI + APP0 (16 bytes) + SOF0 with 640x480.
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + (480).to_bytes(2, "big")  # height
        + (640).to_bytes(2, "big")  # width
        + b"\x03" + b"\x00" * 9
    )
    jpeg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    assert jpeg_header_dimensions(jpeg) == (640, 480)
    assert jpeg_header_dimensions(b"not a jpeg") is None


def test_frame_sample(spark):
    from oarphpy_spark.llm.multimodal import frame_sample

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(6)])
    frames = frame_sample(synth_blob_table(docs), n_frames=4, frame_bytes=32).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(6))
    for rows in by_doc.values():
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
        assert all(len(r["frame"]) == 32 for r in rows)


def test_tensor_values_as_arrays(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from oarphpy_spark.codec import RowAdapter
    from oarphpy_spark.codec.arrow_helpers import tensor_values_as_arrays

    class Holder:
        def __init__(self, hid=0, arr=None):
            self.hid = hid
            self.arr = arr if arr is not None else np.zeros(1)

    objs = [Holder(1, np.arange(4, dtype=np.float32)),
            Holder(2, np.arange(1024, dtype=np.float64))]  # second is packed
    df = RowAdapter.to_df(spark, objs)
    out = tensor_values_as_arrays(df, "arr", out_col="vals")
    got = {r["hid"]: list(r["vals"]) for r in out.collect()}
    assert got[1] == [0.0, 1.0, 2.0, 3.0]
    assert len(got[2]) == 1024 and got[2][-1] == 1023.0
    # decoded arrays are plain SQL arrays: JVM-side math works on them
    sums = out.select("hid", F.round(F.aggregate("vals", F.lit(0.0), lambda a, x: a + x), 2).alias("s"))
    assert {r["hid"]: r["s"] for r in sums.collect()}[2] == 523776.0


def test_resize_blob_subsample():
    from oarphpy_spark.llm.multimodal import resize_blob

    data = bytes(range(200))
    out = resize_blob(data, 50)
    assert len(out) == 50
    assert out[0] == 0 and out[-1] == data[int(49 * 4)]
    assert resize_blob(b"tiny", 50) == b"tiny"


def test_byte_histogram_n_bins(spark):
    from oarphpy_spark.llm.multimodal import extract_byte_histogram_features

    blobs = spark.createDataFrame(
        [Row(doc_id=1, data=bytearray(bytes(range(256))))], "doc_id bigint, data binary"
    )
    for n_bins in (8, 16, 32):
        r = extract_byte_histogram_features(blobs, n_bins=n_bins).collect()[0]
        assert len(r["features"]) == n_bins
        assert abs(sum(r["features"]) - 1.0) < 1e-9
        assert all(abs(f - 1.0 / n_bins) < 1e-9 for f in r["features"])
    with pytest.raises(ValueError):
        extract_byte_histogram_features(blobs, n_bins=10)
