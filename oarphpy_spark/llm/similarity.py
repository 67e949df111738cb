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

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oarphpy_spark.functions.vectors import cosine, dot_lit


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


def hyperplane_signs(
    num_planes: int, dim: int, seed: str = "lsh"
) -> list[list[float]]:
    """+/-1 hyperplane sign matrix, sign[p][i-1] = +1 iff the first hex
    nibble of md5('{seed}|{p}|{i}') >= '8' (i is 1-based).

    Computed ONCE on the driver (num_planes x dim Python md5 calls) and
    embedded as plan literals — per-row signature hashing in the
    executors would cost num_planes x dim md5 calls per corpus row.
    The derivation is identical to the engine-portable oracle form, so
    buckets stay bit-equal across Spark / DuckDB / Python."""
    return [
        [
            1.0
            if hashlib.md5(f"{seed}|{p}|{i}".encode()).hexdigest()[0] >= "8"
            else -1.0
            for i in range(1, dim + 1)
        ]
        for p in range(num_planes)
    ]


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimensionality via a LIMIT-1 scan (metadata-scale job)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if not row or row[0]["d"] is None or row[0]["d"] <= 0:
        raise ValueError(f"cannot infer vector dim from column {vec_col!r}")
    return int(row[0]["d"])


def hyperplane_signature(
    vec_sql: str,
    num_planes: int = 4,
    seed: str = "lsh",
    dim: int | None = None,
    signs: list[list[float]] | None = None,
) -> "F.Column":
    """h-bit signature: bit p = (v . r_p) > 0, where r_p is a +/-1
    hyperplane literal from :func:`hyperplane_signs`. Pure float
    multiply-adds — no per-row hashing. ``vec_sql`` is the vector
    column as SQL text; each plane is one expression string (per-element
    ``F.lit`` would cost a py4j round-trip per dimension)."""
    if signs is None:
        if dim is None:
            raise ValueError("hyperplane_signature needs dim= or signs=")
        signs = hyperplane_signs(num_planes, dim, seed)
    sig = F.lit(0)
    for p, row in enumerate(signs):
        proj = dot_lit(vec_sql, row)
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return sig


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    num_planes: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.
    Same output shape as ``brute_force_topk`` (recall < 1 by design)."""
    signs = hyperplane_signs(num_planes, dim or _vec_dim(corpus, vec_col))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_signature(vec_col, signs=signs).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_signature(vec_col, signs=signs).alias("bucket"),
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
    centroids: DataFrame | list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition vectors into
    cells by nearest centroid; search only the query's cell.

    ``centroids`` defaults to the first ``n_cells`` corpus vectors by id
    — a deterministic stand-in for k-means training that keeps the
    whole operator oracle-checkable. In production: train KMeans
    offline; everything else is identical. Assignment uses the expanded
    L2 form ||a||^2 - 2<a,b> + ||b||^2 so both engines evaluate the
    same sequential dot products.

    The centroid table is tiny by construction (``n_cells`` rows), so
    it is collected once on the driver and embedded as plan literals:
    assignment is then ``array_min`` over per-cell (dist, cell) structs
    — a pure per-row expression in whole-stage codegen with NO join and
    NO shuffle. (A window/argmin over a corpus x centroids product
    would exchange+sort the whole corpus on a unique key.)

    At 100 TB: assignment is expression math inside the corpus scan;
    cells become an equi-join key exactly like the LSH bucket; recall
    tuned by probing the nearest ``p`` cells instead of 1.
    """
    from oarphpy_spark.functions.vectors import dot

    if centroids is None:
        centroids = corpus.filter(F.col(id_col) < n_cells)
    if isinstance(centroids, DataFrame):
        cent_rows = centroids.select(
            F.col(id_col).alias("cell"), F.col(vec_col).alias("cv")
        ).collect()
        centroids = [(r["cell"], r["cv"]) for r in cent_rows]
    cents = sorted(
        (int(cell), [float(x) for x in vec]) for cell, vec in centroids
    )

    def assign(df: DataFrame, out_id: str) -> DataFrame:
        v = F.col("__v")
        vv = dot(v, v)
        candidates = []
        for cell, cvec in cents:
            # Left-to-right Python sum == the engines' sequential list
            # fold, so the literal is bit-equal to dot(c, c) in-plan.
            cc = 0.0
            for x in cvec:
                cc += x * x
            dist = F.round(vv - 2 * dot_lit("__v", cvec) + F.lit(cc), 6)
            candidates.append(
                F.struct(dist.alias("d"), F.lit(cell).alias("cell"))
            )
        # array_min orders structs field-by-field: min dist, then min
        # cell id — the same (dist, cell) tiebreak as the SQL oracle.
        best = F.array_min(F.array(*candidates))
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias("__v"),
            best["cell"].alias("cell"),
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
    dim: int | None = None,
) -> DataFrame:
    """Multi-probe LSH: each query searches its own bucket plus every
    bucket at Hamming distance 1 (one hyperplane's vote flipped) —
    recall rises steeply for a (planes+1)x candidate fanout, with no
    extra passes over the corpus. The standard recall knob when adding
    hash tables is too expensive."""
    signs = hyperplane_signs(num_planes, dim or _vec_dim(corpus, vec_col))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_signature(vec_col, signs=signs).alias("bucket"),
    )
    q_sig = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_signature(vec_col, signs=signs).alias("bucket"),
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
