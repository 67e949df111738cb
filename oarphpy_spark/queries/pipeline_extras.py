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


@query(
    "q_pareto_skyline",
    oracle="""
    WITH pts AS (
      SELECT p_size AS s,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS c,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2
    )
    SELECT p.s AS p_size, p.c AS price_cents, p.n_parts
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.c <= p.c AND q.s >= p.s AND (q.c < p.c OR q.s > p.s)
    )
    """,
)
def q_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query (Borzsony, Kossmann &
    Stocker's SKYLINE OF, ICDE 2001): the parts no other part
    dominates on (bigger size, lower price), via the reusable
    two-phase operator (operators/skyline.py:pareto_frontier):
    (1) LOCAL frontiers per price-bucket — partitioned running-max
    windows, fully parallel, correct because a point dominated within
    its bucket is dominated globally; (2) the GLOBAL pass runs the
    same window over only the local survivors — the small set by
    construction. The oracle is the textbook NOT EXISTS anti-join —
    quadratic, oracle-scale only. Property-tested against brute force
    on random point sets (tests/test_operators.py)."""
    from oarphpy_spark.operators.skyline import pareto_frontier

    parts = table(spark, sf_dir, "part")
    pts = (
        parts.select(
            F.col("p_size").alias("s"),
            F.round(F.col("p_retailprice") * 100)
            .cast("long")
            .alias("c"),
        )
        .groupBy("s", "c")
        .agg(F.count("*").alias("n_parts"))
    )
    frontier = pareto_frontier(pts, x="c", y="s", bucket_width=5000)
    return frontier.select(
        F.col("s").alias("p_size"),
        F.col("c").alias("price_cents"),
        "n_parts",
    )


@query(
    "q_ts_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT user_id,
             date_trunc('hour', MIN(ts)) AS t0,
             date_trunc('hour', MAX(ts)) AS t1
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS gh
      FROM bounds
    ), obs AS (
      SELECT user_id, gh, ROUND(value, 4) AS v FROM (
        SELECT user_id, date_trunc('hour', ts) AS gh, value,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, date_trunc('hour', ts)
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ), joined AS (
      SELECT g.user_id, g.gh, o.v,
             CASE WHEN o.v IS NOT NULL THEN 1 ELSE 0 END AS observed
      FROM grid g LEFT JOIN obs o
        ON g.user_id = o.user_id AND g.gh = o.gh
    ), grp AS (
      SELECT *, SUM(observed) OVER (PARTITION BY user_id ORDER BY gh)
               AS g
      FROM joined
    )
    SELECT user_id, epoch_us(gh) AS hour_us,
           MAX(v) OVER (PARTITION BY user_id, g) AS value_filled,
           CAST(observed AS BIGINT) AS is_observed
    FROM grp
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with LOCF (last observation carried
    forward — TimescaleDB's locf(), Flink's fill): per user, a dense
    hourly grid from first to last event, missing hours carrying the
    latest earlier hour's value. The fill avoids engine-specific
    IGNORE NULLS by the portable group-counter trick: a running count
    of observations partitions each user's timeline into
    [observation, gap...] islands, and one MAX per island broadcasts
    the observed value forward — two windows, both partitioned by
    user (parallel, no global sort). The per-hour observation is
    max_by(value, (ts, event_id)) — deterministic under ts ties. The
    grid explode is sequence() per user, bounded by span-hours — at
    100 TB, partition pruning on the time axis bounds each task's
    grid the same way."""
    events = table(spark, sf_dir, "events")
    bounds = events.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("gh"),
    )
    obs = (
        events.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("gh")
        )
        .agg(
            F.round(
                F.max_by(
                    "value",
                    F.struct(F.col("ts"), F.col("event_id")),
                ),
                4,
            ).alias("v")
        )
    )
    joined = grid.join(obs, ["user_id", "gh"], "left").select(
        "user_id",
        "gh",
        "v",
        F.when(F.col("v").isNotNull(), 1).otherwise(0).alias("observed"),
    )
    wg = (
        Window.partitionBy("user_id")
        .orderBy("gh")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = joined.withColumn("g", F.sum("observed").over(wg))
    wf = Window.partitionBy("user_id", "g")
    return grp.select(
        "user_id",
        F.unix_micros("gh").alias("hour_us"),
        F.max("v").over(wf).alias("value_filled"),
        F.col("observed").cast("long").alias("is_observed"),
    )


@query(
    "q_negative_sampling",
    oracle="""
    WITH np AS (SELECT CAST(MAX(p_partkey) AS BIGINT) AS n_parts FROM part),
    cand AS (
      SELECT c.c_custkey, i.i,
             1 + (CAST(('0x' || substring(
                    md5('neg|' || CAST(c.c_custkey AS VARCHAR) || '#'
                        || CAST(i.i AS VARCHAR)), 1, 12)) AS BIGINT)
                  % (SELECT n_parts FROM np)) AS neg_partkey
      FROM customer c,
           (SELECT unnest(generate_series(1, 8)) AS i) i
      WHERE c.c_custkey % 10 = 0
    ),
    bought AS (
      SELECT DISTINCT o.o_custkey, l.l_partkey
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT c_custkey, CAST(i AS BIGINT) AS i, neg_partkey
    FROM cand
    WHERE NOT EXISTS (
      SELECT 1 FROM bought b
      WHERE b.o_custkey = cand.c_custkey AND b.l_partkey = cand.neg_partkey
    )
    ORDER BY c_custkey, i
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for training pairs: for each
    sampled customer, propose 8 hash-derived candidate parts and keep
    the ones the customer never purchased (LEFT ANTI against the
    distinct purchase set) — the standard negative-example generator
    for recommendation / contrastive training, done as pure
    relational ops. The candidate part is md5-derived from
    (custkey, draw index), so both engines agree bit-for-bit and a
    re-run on re-partitioned data reproduces the same negatives
    (rejection sampling with an RNG would not). Scale shape: the
    candidate build is map-side (8 rows per customer via a literal
    sequence explode); the purchase set is one distinct aggregation;
    the anti-join shuffles on (custkey, partkey) — never a cross
    join against the catalog. The unfilled-draw convention (drop
    positives rather than redraw) keeps the operator one-pass; at a
    fixed negative count per key, add more draws and a row_number
    cap."""
    parts = table(spark, sf_dir, "part").agg(
        F.max("p_partkey").alias("n_parts")
    )
    cust = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 10 == 0)
        .select("c_custkey")
    )
    cand = (
        cust.crossJoin(F.broadcast(parts))
        .select(
            "c_custkey",
            F.explode(F.sequence(F.lit(1), F.lit(8))).alias("i"),
            "n_parts",
        )
        .select(
            "c_custkey",
            F.col("i").cast("long").alias("i"),
            (
                1
                + F.conv(
                    F.substring(
                        md5_str(
                            F.concat(
                                F.lit("neg|"),
                                F.col("c_custkey").cast("string"),
                                F.lit("#"),
                                F.col("i").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_parts")
            ).alias("neg_partkey"),
        )
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    bought = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    return cand.join(
        bought,
        (cand.c_custkey == bought.o_custkey)
        & (cand.neg_partkey == bought.l_partkey),
        "left_anti",
    ).orderBy("c_custkey", "i")


@query(
    "q_event_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    ), m AS (
      SELECT user_id,
             CAST(len(regexp_extract_all(s, 'cv*p')) AS BIGINT) AS hits,
             CAST(len(s) AS BIGINT) AS seq_len
      FROM seq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users_matched,
           CAST(SUM(hits) AS BIGINT) AS total_matches,
           CAST(MAX(hits) AS BIGINT) AS max_per_user,
           CAST(SUM(seq_len) AS BIGINT) AS total_events
    FROM m
    """,
)
def q_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over event streams — the
    MATCH_RECOGNIZE workload relationally: each user's event types
    collapse to an order-pinned initial string ('cvvp...'), and a
    regex counts non-overlapping 'click (view)* purchase' runs —
    browse-then-buy journeys with any amount of window shopping in
    between. Encoding the sequence as a string turns pattern logic
    into ONE codegen'd regexp per user instead of a per-row state
    machine; both engines scan left-to-right non-overlapping, and the
    5 event types map to distinct initials so the alphabet is
    unambiguous. One shuffle on user_id; the regex runs on
    |user|-bounded strings. Complements q_markov_transitions (1-step
    stats) and q_session_paths (exact prefixes) with unbounded-gap
    pattern runs."""
    ev = table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort("
            "  collect_list(struct(ts, event_id, event_type))),"
            "  p -> substring(p.event_type, 1, 1)), '')"
        ).alias("s")
    )
    m = seq.select(
        F.expr("regexp_count(s, 'cv*p')").cast("bigint").alias("hits"),
        F.length("s").cast("bigint").alias("seq_len"),
    )
    return m.agg(
        F.count("*").alias("n_users"),
        F.sum((F.col("hits") > 0).cast("bigint")).alias(
            "n_users_matched"
        ),
        F.sum("hits").alias("total_matches"),
        F.max("hits").alias("max_per_user"),
        F.sum("seq_len").alias("total_events"),
    )


@query(
    "q_group_holdout_split",
    oracle="""
    WITH g AS (
      SELECT source,
             CASE WHEN CAST(('0x' || substring(md5('ghs|' || source), 1, 4))
                       AS INTEGER) % 10 < 8
                  THEN 'train' ELSE 'val' END AS split,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS sum_chars
    FROM g GROUP BY split
    """,
)
def q_group_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-level holdout split: every document of a SOURCE lands on
    the same side (80/20 by salted hash of the source key), the
    leakage-safe variant of ``q_train_val_split``'s row-level split —
    near-duplicate documents cluster within a source/domain, so a
    row-level split leaks train content into validation; splitting by
    group is how training pipelines keep the eval honest. Same
    deterministic 16-bit-hex-prefix hash idiom as the row split, so
    assignment is stable across runs, engines, and cluster sizes.
    One partial-aggregated shuffle on source, then a rollup to the
    two split rows — no assignment table is materialized (at 100 TB
    the split column is computed inline wherever it's needed; it is a
    pure function of the group key)."""
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                md5_str(F.concat(F.lit("ghs|"), F.col("source"))), 1, 4
            ),
            16,
            10,
        ).cast("int")
        % 10
    )
    split = F.when(bucket < 8, "train").otherwise("val")
    per_source = docs.groupBy(
        F.col("source"), split.alias("split")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )
    return per_source.groupBy("split").agg(
        F.count("*").alias("n_sources"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("chars").alias("sum_chars"),
    )
