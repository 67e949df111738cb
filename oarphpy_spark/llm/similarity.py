"""Similarity search over embedding columns.

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus; per-corpus-row expression math in
  codegen; window top-k. The right baseline, and the verifier for the
  approximate path. Never crossJoin corpus x corpus.

* ``hyperplane_lsh_topk`` — the scale path: random-hyperplane (SimHash
  for vectors) bucketing. Each vector gets an h-bit signature; search
  compares only within the query's bucket. Hyperplane signs are derived
  from md5 nibbles keyed by (plane, dim) — deterministic, seedable, and
  engine-portable, so even the approximate path is oracle-checkable.
  At 100 TB: signatures are one scan; buckets are an equi-join key;
  multi-probe (flipping low-confidence bits) trades recall for fanout.

* ``cosine_near_dup_pairs`` — embedding near-duplicate detection within
  blocks (labels at test scale, LSH buckets at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oarphpy_spark.functions.vectors import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: query_id, neighbor_id, cos (rounded 6dp; ranked on the
    rounded value with id tiebreak so results are total-ordered)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def hyperplane_signature(vec_col, num_planes: int = 4, seed: str = "lsh") -> "F.Column":
    """h-bit signature: bit p = (v . r_p) > 0, where r_p is a +/-1
    hyperplane derived from md5('{seed}|{p}|{dim}') nibbles."""
    def signed_term(prefix: str):
        # Closure capture (a default arg would read as an extra lambda param).
        return lambda x, i: x.cast("double") * F.when(
            F.substring(
                F.md5(F.concat(F.lit(prefix), i.cast("string")).cast("binary")), 1, 1
            )
            >= "8",
            1.0,
        ).otherwise(-1.0)

    sig = F.lit(0)
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(vec_col, F.sequence(F.lit(1), F.size(vec_col)), signed_term(f"{seed}|{p}|")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return sig


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    num_planes: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.
    Same output shape as ``brute_force_topk`` (recall < 1 by design)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_signature(F.col(vec_col), num_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_signature(F.col(vec_col), num_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    block_col: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.35,
) -> DataFrame:
    """Within-block embedding near-duplicates: pairs with cosine >=
    threshold. Blocks bound the quadratic term (LSH buckets at scale)."""
    docs = df.select(
        F.col(id_col).alias("doc"), F.col(block_col).alias("block"), F.col(vec_col).alias("v")
    )
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(b, F.col("a.block") == F.col("b.block"))
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("vec_a"),
            F.col("b.doc").alias("vec_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int = 8,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition vectors into
    cells by nearest centroid; search only the query's cell.

    ``centroids`` defaults to the first ``n_cells`` corpus vectors by id
    — a deterministic stand-in for k-means training that keeps the
    whole operator oracle-checkable. In production: train KMeans
    offline, broadcast the (tiny) centroid table; everything else is
    identical. Assignment uses the expanded L2 form
    ||a||^2 - 2<a,b> + ||b||^2 so both engines evaluate the same
    sequential dot products.

    At 100 TB: assignment is one broadcast-join scan; cells become an
    equi-join key exactly like the LSH bucket; recall tuned by probing
    the nearest ``p`` cells instead of 1.
    """
    from oarphpy_spark.functions.vectors import dot

    if centroids is None:
        centroids = corpus.filter(F.col(id_col) < n_cells)
    cents = F.broadcast(
        centroids.select(
            F.col(id_col).alias("cell"), F.col(vec_col).alias("centroid")
        )
    )

    def assign(df: DataFrame, out_id: str) -> DataFrame:
        v, c = F.col("__v"), F.col("centroid")
        dist = F.round(dot(v, v) - 2 * dot(v, c) + dot(c, c), 6)
        w = Window.partitionBy(out_id).orderBy(dist, F.col("cell"))
        return (
            df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("__v"))
            .crossJoin(cents)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(out_id, F.col("__v"), "cell")
        )

    c_assigned = assign(corpus, "neighbor_id")
    q_assigned = assign(queries, "query_id").select(
        "query_id", F.col("__v").alias("qv"), "cell"
    )
    scored = (
        c_assigned.join(F.broadcast(q_assigned), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("__v")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def hyperplane_lsh_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    num_planes: int = 4,
) -> DataFrame:
    """Multi-probe LSH: each query searches its own bucket plus every
    bucket at Hamming distance 1 (one hyperplane's vote flipped) —
    recall rises steeply for a (planes+1)x candidate fanout, with no
    extra passes over the corpus. The standard recall knob when adding
    hash tables is too expensive."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_signature(F.col(vec_col), num_planes).alias("bucket"),
    )
    q_sig = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_signature(F.col(vec_col), num_planes).alias("bucket"),
    )
    probes = q_sig.select(
        "query_id",
        "qv",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(num_planes)],
            )
        ).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(probes), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
