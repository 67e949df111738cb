"""Training-pipeline extras: sequence-model statistics, hashed
features, and weighted corpus sampling.

Three operations a large-scale training-data pipeline runs between
curation and batching:

- transition statistics over user event sequences (the input to
  simple sequence models and to funnel sanity checks),
- the hashing trick (fixed-width sparse features without a vocabulary
  build — no global dictionary, no second pass, the reason it scales),
- weighted corpus sampling by priority sampling (Duffield, Lund &
  Thorup, JACM 2007): deterministic hash-derived uniforms make the
  sample reproducible across runs and engines, and the top-k by
  priority needs only a per-partition heap + driver merge of k rows —
  no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oarphpy_spark.functions.text import md5_str
from oarphpy_spark.registry import query
from oarphpy_spark.tables import table


@query(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE),
                 6) AS p
    FROM t
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lag window per user (ordered by (ts, event_id) so ties
    are deterministic), then a (prev, next) count and a row-normalized
    probability. The expensive part is the sequence window — one
    shuffle on user_id with per-user sorted runs; the transition table
    itself is at most |event_types|^2 rows, so the normalizing window
    is a broadcast-scale afterthought. This is the same shape as
    session-path analysis and next-action models at any corpus size."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    wn = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wn).cast("double"), 6).alias(
            "p"
        ),
    )


@query(
    "q_feature_hashing",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    )
    SELECT doc_id,
           CAST(('0x' || substring(md5('fh|' || tok), 1, 4)) AS INTEGER)
             % 64 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM tok
    WHERE tok <> ''
    GROUP BY doc_id, bucket
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick features: tokens land in 64 fixed buckets via a
    salted md5 — sparse bag-of-words features with NO vocabulary
    build, the property that makes it a one-pass, shuffle-on-
    (doc, bucket)-only operator at corpus scale (a dictionary-based
    featurizer needs a global vocab agg + broadcast first). The
    explode is map-side; partial aggregation collapses (doc, bucket)
    counts before the exchange. Same 16-bit-hex-prefix hash idiom as
    q_train_val_split so both engines agree bit-for-bit."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ", -1)).alias("tok"),
    ).filter(F.col("tok") != "")
    bucket = (
        F.conv(
            F.substring(md5_str(F.concat(F.lit("fh|"), F.col("tok"))), 1, 4),
            16,
            10,
        ).cast("int")
        % 64
    )
    return tok.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count("*").alias("n")
    )


@query(
    "q_weighted_sample",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(('0x' || substring(md5('ws|' || CAST(doc_id AS VARCHAR)),
                                     1, 6)) AS INTEGER) + 1 AS h
      FROM documents
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(n_tokens * 16777216.0 / h, 4) AS priority
    FROM w
    ORDER BY priority DESC, doc_id
    LIMIT 20
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus sampling via priority sampling
    (Duffield-Lund-Thorup): priority = w / u with u a deterministic
    hash-uniform in (0, 1]; the k largest priorities form a sample
    whose subset-sum estimates are provably near-optimal. u derives
    from 24 bits of a salted md5, so u = (h+1)/2^24 and
    priority = w * 2^24 / (h+1) — one exact integer product and one
    correctly-rounded double division, bit-identical across engines
    (no transcendental functions, unlike the exp-key A-ES variant).
    The top-k is a sort-limit: per-partition heaps + a k-row driver
    merge, never a global sort — reproducible sampling at any corpus
    size."""
    docs = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ", -1))
    h = (
        F.conv(
            F.substring(
                md5_str(
                    F.concat(F.lit("ws|"), F.col("doc_id").cast("string"))
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        + 1
    )
    priority = F.round(
        n_tokens.cast("long") * F.lit(16777216.0) / h.cast("double"), 4
    )
    return (
        docs.select(
            "doc_id",
            n_tokens.cast("long").alias("n_tokens"),
            priority.alias("priority"),
        )
        .orderBy(F.desc("priority"), "doc_id")
        .limit(20)
    )


@query(
    "q_drift_ks",
    oracle="""
    WITH v AS (
      SELECT ROUND(value, 3) AS x,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
      FROM events WHERE event_type IN ('click', 'view')
    ), tot AS (
      SELECT CAST(SUM(is_a) AS BIGINT) AS na,
             CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS nb
      FROM v
    ), g AS (
      SELECT x, CAST(SUM(is_a) AS BIGINT) AS da,
             CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS db
      FROM v GROUP BY x
    ), c AS (
      SELECT SUM(da) OVER (ORDER BY x) AS ca,
             SUM(db) OVER (ORDER BY x) AS cb
      FROM g
    )
    SELECT ROUND(MAX(ABS(ca / CAST(tot.na AS DOUBLE)
                         - cb / CAST(tot.nb AS DOUBLE))), 6) AS ks_stat,
           tot.na AS n_a, tot.nb AS n_b
    FROM c, tot
    GROUP BY tot.na, tot.nb
    """,
)
def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the 'click' and
    'view' value distributions — the standard train-vs-serving drift
    detector. The textbook formulation sorts both samples globally;
    here values are QUANTIZED (3 dp) and rolled up to one row per
    distinct value first, so the ordered ECDF pass runs over a table
    bounded by the value range x quantum — independent of row count,
    the same trick as q_binary_auc. One groupBy + one bounded window;
    ECDF differences are exact integer counts divided once at the end
    (correctly-rounded doubles, identical in both engines)."""
    events = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    v = events.select(
        F.round("value", 3).alias("x"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
    )
    g = v.groupBy("x").agg(
        F.sum("is_a").alias("da"),
        (F.count("*") - F.sum("is_a")).alias("db"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        F.sum("da").over(w).alias("ca"), F.sum("db").over(w).alias("cb")
    )
    tot = v.agg(
        F.sum("is_a").alias("na"),
        (F.count("*") - F.sum("is_a")).alias("nb"),
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("ca") / F.col("na").cast("double")
                        - F.col("cb") / F.col("nb").cast("double")
                    )
                ),
                6,
            ).alias("ks_stat"),
            F.first("na").alias("n_a"),
            F.first("nb").alias("n_b"),
        )
    )


@query(
    "q_drift_tvd",
    oracle="""
    WITH v AS (
      SELECT LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9) AS bin,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
      FROM events WHERE event_type IN ('click', 'view')
    ), tot AS (
      SELECT CAST(SUM(is_a) AS BIGINT) AS na,
             CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS nb
      FROM v
    ), g AS (
      SELECT bin, CAST(SUM(is_a) AS BIGINT) AS da,
             CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS db
      FROM v GROUP BY bin
    )
    SELECT bin,
           ROUND(da / CAST(tot.na AS DOUBLE), 6) AS p_a,
           ROUND(db / CAST(tot.nb AS DOUBLE), 6) AS p_b,
           ROUND(ABS(da / CAST(tot.na AS DOUBLE)
                     - db / CAST(tot.nb AS DOUBLE)), 6) AS abs_diff
    FROM g, tot
    """,
)
def q_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned distribution drift between 'click' and 'view' values:
    per-bin proportions and |p_a - p_b| (summing abs_diff / 2 gives
    the total-variation distance). Fixed-width bins make this ONE
    partial-aggregable groupBy — the shape PSI/KL monitors use at
    scale — and the deliberate metric choice is TVD over PSI: PSI's
    ln(p/q) is a transcendental whose last-ulp can differ across
    engines, while TVD is counts and one division — exactly
    reproducible everywhere (same stance as q_unigram_lm_score's
    integer micro-bits)."""
    events = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    v = events.select(
        F.least(
            F.floor(F.col("value") / F.lit(50.0)).cast("long"), F.lit(9)
        ).alias("bin"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
    )
    g = v.groupBy("bin").agg(
        F.sum("is_a").alias("da"),
        (F.count("*") - F.sum("is_a")).alias("db"),
    )
    tot = v.agg(
        F.sum("is_a").alias("na"),
        (F.count("*") - F.sum("is_a")).alias("nb"),
    )
    pa = F.col("da") / F.col("na").cast("double")
    pb = F.col("db") / F.col("nb").cast("double")
    return g.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(F.abs(pa - pb), 6).alias("abs_diff"),
    )
