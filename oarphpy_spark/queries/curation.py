"""Training-data curation queries: PII scrubbing, repetition-based
quality filters, benchmark-contamination checks, and deterministic
domain-mixture sampling.

These extend the SURVEY §2.C LLM-pipeline surface with the filters a
production pretraining pipeline runs between dedup and packing. Every
query is a pure column-expression / equi-join plan (no UDFs, no
driver loops) and carries an exact DuckDB oracle; randomness is the
md5-prefix trick (hex strings compare lexicographically = numerically,
so a Bernoulli draw is a string compare both engines state verbatim).

The testdata corpus is synthetic word soup with no real PII, so the
scrub query *injects* deterministic PII-shaped spans (email / phone /
IPv4 derived from doc_id) before scrubbing them — the regexes and the
replace pipeline are the artifact under test, same stance as the
multimodal queries' synthesized blobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oarphpy_spark.functions.text import norm_tokens, shingles
from oarphpy_spark.registry import query
from oarphpy_spark.tables import table

# Shared scrub patterns — RE2/Java-compatible subset (no lookarounds).
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"\+\d-\d{3}-\d{3}-\d{4}"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@query(
    "q_pii_scrub",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or +1-415-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.9'
               AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{_IPV4}')) AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(
                 t, '{_EMAIL}', '<EMAIL>', 'g'),
                    '{_PHONE}', '<PHONE>', 'g'),
                    '{_IPV4}', '<IP>', 'g')) AS clean_md5
    FROM raw
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction as one codegen'd scan: inject deterministic
    email/phone/IPv4 spans (the corpus is synthetic), then count and
    replace them with typed placeholder tokens. Replace order matters —
    emails before IPs so a dotted domain is not half-eaten by the IPv4
    rule. Zero shuffles; at 100 TB this is scan-bound, the ideal shape
    for a per-document rewrite."""
    d = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        d.cast("string"),
        F.lit("@mail.example.com or +1-415-555-"),
        F.lpad(F.pmod(d, F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" from 10."),
        F.pmod(d, F.lit(256)).cast("string"),
        F.lit("."),
        F.pmod(d * 7, F.lit(256)).cast("string"),
        F.lit(".9"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>"
        ),
        _IPV4,
        "<IP>",
    )
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(raw, F.lit(_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(raw, F.lit(_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(raw, F.lit(_IPV4)).cast("long").alias("n_ips"),
        F.md5(clean.cast("binary")).alias("clean_md5"),
    )


@query(
    "q_text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ), big AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) - 1 >= 1
                         THEN list_transform(generate_series(1, len(t) - 1),
                                             i -> array_to_string(t[i:i+1], ' '))
                         ELSE [array_to_string(t, ' ')] END) AS g
      FROM toks
    ), cnt AS (
      SELECT doc_id, g, COUNT(*) AS c FROM big GROUP BY 1, 2
    ), tbf AS (
      SELECT doc_id,
             ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
               AS top_bigram_frac
      FROM cnt GROUP BY doc_id
    ), stats AS (
      SELECT toks.doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             ROUND(1.0 - CAST(len(list_distinct(t)) AS DOUBLE)
                         / CAST(len(t) AS DOUBLE), 6) AS dup_token_frac,
             top_bigram_frac
      FROM toks JOIN tbf ON toks.doc_id = tbf.doc_id
    )
    SELECT doc_id, n_tokens, dup_token_frac, top_bigram_frac,
           CASE WHEN dup_token_frac <= 0.9 AND top_bigram_frac <= 0.18
                THEN 1 ELSE 0 END AS keep
    FROM stats
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: duplicate-token
    fraction (array expressions, zero shuffle) and top-bigram fraction
    (explode -> count -> per-doc rollup; the one aggregation pass is
    partial-combined map-side, and the per-(doc,bigram) key space
    shrinks to per-doc rows before anything crosses the wire). Docs
    past either threshold are flagged, not dropped — downstream
    pipelines choose the cut."""
    docs = table(spark, sf_dir, "documents")
    toks = norm_tokens(F.col("text"))
    grams = (
        docs.select("doc_id", F.explode(shingles(toks, 2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.max("c").cast("double") / F.sum("c").cast("double"), 6
            ).alias("top_bigram_frac")
        )
    )
    dup_frac = F.round(
        1.0
        - F.size(F.array_distinct(toks)).cast("double")
        / F.size(toks).cast("double"),
        6,
    )
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        dup_frac.alias("dup_token_frac"),
    )
    joined = base.join(grams, "doc_id")
    return joined.select(
        "doc_id",
        "n_tokens",
        "dup_token_frac",
        "top_bigram_frac",
        F.when(
            (F.col("dup_token_frac") <= 0.9)
            & (F.col("top_bigram_frac") <= 0.18),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("keep"),
    )


@query(
    "q_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_distinct(
               CASE WHEN len(t) - 4 >= 1
                    THEN list_transform(generate_series(1, len(t) - 4),
                                        i -> array_to_string(t[i:i+4], ' '))
                    ELSE [array_to_string(t, ' ')] END)) AS g
      FROM toks
    ),
    bench AS (SELECT * FROM grams WHERE doc_id % 97 = 0),
    corp  AS (SELECT * FROM grams WHERE doc_id % 97 <> 0)
    SELECT corp.doc_id,
           COUNT(DISTINCT corp.g) AS n_overlap_grams,
           COUNT(DISTINCT bench.doc_id) AS n_bench_docs
    FROM corp JOIN bench ON corp.g = bench.g
    GROUP BY corp.doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: distinct 5-gram overlap between
    the corpus and a (held-out) eval set — here the doc_id % 97 slice
    stands in for the benchmark. The join key is the n-gram string,
    the classic decontamination shape (per WebText/GPT-2 and The
    Pile's 13-gram filters). Join strategy is deliberately left to
    the planner: a REAL benchmark is fixed-size (a few MB of eval
    grams) and AQE will broadcast it at runtime, but this stand-in
    slice grows with the corpus, so forcing ``F.broadcast`` here
    would OOM at scale — AQE's runtime size check is the safe
    default for an eval side whose size is configuration, not
    physics."""
    docs = table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles(norm_tokens(F.col("text")), 5))
        ).alias("g"),
    )
    bench = grams.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    corp = grams.filter(F.col("doc_id") % 97 != 0)
    return (
        corp.join(bench, "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_overlap_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


# Per-language Bernoulli keep-rates for the mixture sampler, stated as
# md5-prefix hex thresholds (floor(rate * 16^4) as 4 hex chars) so both
# engines draw the identical pseudo-random decision per document.
_MIX_RATES = {"en": 1.0, "es": 0.5, "fr": 0.25, "de": 0.25, "zh": 0.1}


def _mix_threshold(rate: float) -> str:
    return format(min(int(rate * 0x10000), 0xFFFF + 1), "05x")[-4:] if rate < 1.0 else "zzzz"


@query(
    "q_domain_mixture",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE lang
            {' '.join(f"WHEN '{k}' THEN '{_mix_threshold(r)}'" for k, r in _MIX_RATES.items())}
            ELSE '0000' END
    """,
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: resample the corpus to target
    per-language weights with a hash-Bernoulli draw — keep a doc iff
    the first 4 hex chars of md5(doc_id) fall under the language's
    threshold. A pure scan filter: no shuffle, no seed/partitioning
    dependence, reproducible across engines and cluster layouts
    (thresholds > 'ffff' encode rate 1.0). This is how production
    pipelines pin a 30%-web / 20%-code / ... mixture at 100 TB without
    a sort or a sample() whose output depends on task layout."""
    cases = F.lit("0000")
    expr = None
    for k, r in _MIX_RATES.items():
        cond = F.col("lang") == k
        expr = (
            F.when(cond, F.lit(_mix_threshold(r)))
            if expr is None
            else expr.when(cond, F.lit(_mix_threshold(r)))
        )
    threshold = expr.otherwise(cases)
    return (
        table(spark, sf_dir, "documents")
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4)
            < threshold
        )
        .select("doc_id", "lang", "source")
    )


@query(
    "q_group_sample_k",
    oracle="""
    SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) t
    WHERE rn <= 3
    """,
)
def q_group_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample: the md5 of the id is a
    reproducible 'random' sort key, so every run (and every engine)
    picks the SAME k docs per language — the auditable alternative to
    rand()-based sampling for eyeball sets and per-domain training
    subsamples. Plan: rank-over-window with the rn<=3 predicate, which
    Spark rewrites to WindowGroupLimit — each task keeps a running
    top-3 per group BEFORE the shuffle, so the exchange carries
    O(groups x k), not the corpus."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    return (
        table(spark, sf_dir, "documents")
        .select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("lang", "doc_id", F.col("rn").cast("long").alias("rn"))
    )


@query(
    "q_k_anonymity",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment AS seg, c_nationkey AS nat,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
             COUNT(*) AS k
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT LEAST(k, 5) AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_people
    FROM q GROUP BY 1 ORDER BY 1
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (segment,
    nation, coarse balance band): how many equivalence classes — and
    how many PEOPLE — sit at each anonymity level k (capped at 5+,
    the usual release threshold). Rows in a k=1 class are uniquely
    re-identifiable by the quasi-identifiers alone; this is the
    privacy gate a dataset passes before leaving a clean room, the
    audit side of q_pii_scrub's redaction side. One groupBy at
    quasi-identifier granularity, then a bounded second aggregate
    over class sizes — the k histogram is at most 5 rows whatever
    the data volume."""
    cust = table(spark, sf_dir, "customer")
    q = cust.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.expr(
            "CAST(ROUND(c_acctbal * 100) AS BIGINT) div 100000"
        ).alias("bal_band"),
    ).agg(F.count("*").alias("k"))
    return (
        q.groupBy(F.least(F.col("k"), F.lit(5)).alias("k_bucket"))
        .agg(
            F.count("*").alias("n_groups"),
            F.sum("k").alias("n_people"),
        )
        .orderBy("k_bucket")
    )
