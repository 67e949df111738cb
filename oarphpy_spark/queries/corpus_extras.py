"""Corpus-level curation operators beyond per-document signals:
exact-substring (span) duplication detection and statistical
language-model quality scoring.

These complete the dedup/quality family (SURVEY §2.C) with the two
classic corpus passes the per-doc queries cannot express:

* ``q_dup_span_detect`` — the ExactSubstr pass of Lee et al. 2022
  ("Deduplicating Training Data Makes Language Models Better",
  arXiv:2107.06499): find fixed-length token spans that occur in more
  than one document and report, per document, how much of it is
  corpus-duplicated text. MinHash (``q_dedup_minhash``) answers "which
  *documents* are near-copies"; this answers "which *passages* are
  copied", which catches boilerplate and quotations MinHash misses.
* ``q_unigram_lm_score`` — the CCNet-style (Wenzek et al. 2020)
  statistical-LM quality filter, reduced to a unigram model so the
  score is exactly restatable in SQL: corpus token frequencies become
  a vocabulary, each document is scored by its mean per-token code
  length (bits/token), and out-of-vocabulary tokens pay the flat
  1/N floor. Real pipelines swap in a KenLM 5-gram; the Spark shape
  (bounded broadcast vocab + scan-side scoring) is identical.

Both are pure DataFrame plans: the only Python is plan construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oarphpy_spark.functions.text import norm_tokens, shingles
from oarphpy_spark.registry import query
from oarphpy_spark.tables import table

# Span width for the exact-substring pass. Lee et al. use 50 BPE
# tokens; the synthetic fixture documents average ~60 words, so 8-word
# spans keep the check meaningfully strict while still firing on the
# fixture's injected near-duplicates.
_SPAN_TOKENS = 8

# Vocabulary cap for the unigram LM. At 100 TB the vocabulary of raw
# tokens is unbounded (typos, ids, urls), so a production scorer keeps
# the top-V tokens and routes the tail through an OOV floor — the cap
# is what keeps the broadcast side bounded no matter the corpus size.
# 30 deliberately undershoots the fixture's 31-token vocabulary so the
# OOV path is exercised (exactly one token scores at the floor).
_VOCAB_TOP_V = 30


@query(
    "q_dup_span_detect",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ), spans AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) - {_SPAN_TOKENS - 1} >= 1
                    THEN list_transform(
                           generate_series(1, len(t) - {_SPAN_TOKENS - 1}),
                           i -> array_to_string(t[i:i+{_SPAN_TOKENS - 1}], ' '))
                    ELSE [array_to_string(t, ' ')] END) AS g
      FROM toks
    ), h AS (
      SELECT doc_id, substring(md5(g), 1, 16) AS h FROM spans
    ), dup AS (
      SELECT h FROM (
        SELECT h, COUNT(DISTINCT doc_id) AS nd FROM h GROUP BY h
      ) WHERE nd >= 2
    ), perdoc AS (
      SELECT doc_id, COUNT(*) AS n_dup_spans FROM h JOIN dup USING (h)
      GROUP BY doc_id
    ), tot AS (
      SELECT doc_id, COUNT(*) AS n_spans FROM h GROUP BY doc_id
    )
    SELECT tot.doc_id,
           CAST(n_spans AS BIGINT) AS n_spans,
           CAST(COALESCE(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           ROUND(CAST(COALESCE(n_dup_spans, 0) AS DOUBLE)
                 / CAST(n_spans AS DOUBLE), 6) AS dup_span_frac
    FROM tot LEFT JOIN perdoc ON tot.doc_id = perdoc.doc_id
    """,
)
def q_dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication (Lee et al. 2022's ExactSubstr,
    arXiv:2107.06499, re-expressed relationally): every 8-token span is
    hashed to a 16-hex-char key; a span hash seen in >= 2 distinct
    documents is corpus-duplicated, and each document reports the
    fraction of its spans that are. Plan shape: one Generate (span
    explode) feeding two aggregations that both key on the SPAN HASH —
    a fixed-width 16-byte key, so the exchange carries hash+doc_id and
    never the span text. The duplicated-hash set grows with the corpus
    (it is the output of an aggregation, not a dimension), so the
    join back is deliberately left to AQE rather than broadcast — at
    100 TB the dup-span table can itself be TBs. countDistinct uses a
    partial-aggregable two-level groupBy, so map-side combine strips
    same-doc repeats before the wire."""
    docs = table(spark, sf_dir, "documents")
    toks = norm_tokens(F.col("text"))
    spans = docs.select(
        "doc_id",
        F.explode(shingles(toks, _SPAN_TOKENS)).alias("g"),
    ).select(
        "doc_id",
        F.substring(F.md5(F.col("g").cast("binary")), 1, 16).alias("h"),
    )
    dup = (
        spans.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    perdoc = (
        spans.join(dup, "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_spans"))
    )
    tot = spans.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
    return tot.join(perdoc, "doc_id", "left").select(
        "doc_id",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.coalesce(F.col("n_dup_spans"), F.lit(0))
        .cast("long")
        .alias("n_dup_spans"),
        F.round(
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("double")
            / F.col("n_spans").cast("double"),
            6,
        ).alias("dup_span_frac"),
    )


@query(
    "q_unigram_lm_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), counts AS (
      SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
    ), total AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM counts
    ), vocab AS (
      SELECT token, cnt FROM counts
      ORDER BY cnt DESC, token LIMIT {_VOCAB_TOP_V}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(ROUND(-CAST(SUM(CAST(ROUND(
               log2(CAST(COALESCE(v.cnt, 1) AS DOUBLE) / n) * 1000000
             ) AS BIGINT)) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS microbits_per_token
    FROM toks LEFT JOIN vocab v USING (token) CROSS JOIN total
    GROUP BY doc_id
    """,
)
def q_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality scoring (the CCNet filter, Wenzek et al.
    2020, with a unigram model so DuckDB can restate it exactly): train
    token frequencies over the corpus, keep the top-V as the
    vocabulary, score each document by its mean per-token code length
    -avg(log2 p(t)) in bits/token; out-of-vocabulary tokens pay the
    1/N floor. Low bits/token = predictable, natural text; high =
    noise/garbage — downstream pipelines cut on it like CCNet's
    perplexity buckets. Scale shape: the vocabulary is top-V of an
    aggregation (TakeOrderedAndProject — each task keeps a V-row heap,
    the driver merges V rows per task), so the scoring join is a
    BROADCAST of a fixed-V table against the token scan no matter the
    corpus size; the total-count is one broadcast row; per-token
    log-probs are quantized to integer micro-bits before summation and
    the per-doc mean is reported as integer micro-bits/token, so the
    whole aggregate is exact long arithmetic in both engines — a float
    mean flipped its 4th decimal across engines when a doc landed on a
    decimal-representation boundary (Java's shortest-repr HALF_UP vs
    C's scaled nearbyint)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(norm_tokens(F.col("text"))).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("__n"))
    vocab = counts.orderBy(F.col("cnt").desc(), "token").limit(_VOCAB_TOP_V)
    # Per-token log-prob in integer MICRO-BITS: partial sums of longs
    # are exact and order-independent, so the cross-engine hash cannot
    # drift on aggregation order (a float AVG of the same values flips
    # the 4th decimal when a doc lands exactly on a rounding boundary).
    logp_u = F.round(
        F.log2(
            F.coalesce(F.col("cnt"), F.lit(1)).cast("double") / F.col("__n")
        )
        * 1_000_000
    ).cast("long")
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(-F.sum(logp_u).cast("double") / F.count("*"))
            .cast("long")
            .alias("microbits_per_token"),
        )
    )


@query(
    "q_set_similarity_join",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(string_split(lower(text), ' ')) - 2 >= 1
                      THEN list_transform(
                             generate_series(1,
                               len(string_split(lower(text), ' ')) - 2),
                             i -> array_to_string(
                               string_split(lower(text), ' ')[i:i+2], ' '))
                      ELSE [array_to_string(
                              string_split(lower(text), ' '), ' ')]
                      END) AS tok
        FROM documents
      )
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ), ov AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, o AS overlap,
           ROUND(o / CAST(sa.n + sb.n - o AS DOUBLE), 6) AS jaccard
    FROM ov
    JOIN sz sa ON id_a = sa.doc_id
    JOIN sz sb ON id_b = sb.doc_id
    WHERE o * 2 >= (sa.n + sb.n - o) * 1
    """,
)
def q_set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 0.5 near-dup pairs over 3-word SHINGLE sets
    via prefix filtering (llm/dedup.py:set_similarity_join — the
    AllPairs/PPJoin family). Zero false negatives, unlike MinHash LSH:
    candidates come from an equi-join of frequency-ordered shingle
    PREFIXES (length |x| - ceil(t|x|) + 1), and only candidates are
    verified against full shingle sets. Shingles, not unigram tokens,
    are the right set universe: the fixture's (and any corpus's
    post-normalization) token vocabulary is small enough that most
    docs share most TOKENS — unigram Jaccard saturates and the prefix
    filter degenerates (measured: 30k token-level pairs at tau=0.8 vs
    25 shingle-level near-dups at tau=0.5 on the sf0.01 fixture) —
    while the shingle universe grows with vocab^n, so real near-dups
    separate cleanly and prefixes are selective. The oracle is the
    brute-force all-pairs shingle join with the same integer-exact
    threshold (o*2 >= union) — the quadratic shape the prefix filter
    exists to avoid. Complements q_dedup_minhash (probabilistic
    recall over the same shingles) with the exact join."""
    from oarphpy_spark.llm.dedup import set_similarity_join

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(shingles(norm_tokens(F.col("text")), 3)).alias("tok"),
    )
    return set_similarity_join(
        tok, id_col="doc_id", token_col="tok", tau_num=1, tau_den=2
    )


# Bigram vocabulary cap — same bounded-broadcast stance as
# _VOCAB_TOP_V: top-B bigrams by count form the model; everything
# else backs off to the interpolated unigram term.
_BIGRAM_TOP_B = 200
# Interpolation weight on the bigram term (Jelinek-Mercer smoothing),
# expressed as an exact decimal so both engines parse the same double.
_LAMBDA_NUM = 7
_LAMBDA_DEN = 10


@query(
    "q_bigram_lm_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ), uni AS (
      SELECT unnest(t) AS token FROM toks
    ), counts AS (
      SELECT token, COUNT(*) AS cnt FROM uni GROUP BY token
    ), total AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM counts
    ), bi AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) - 1 >= 1
                    THEN list_transform(
                           generate_series(1, len(t) - 1),
                           i -> array_to_string(t[i:i+1], ' '))
                    ELSE [] END) AS g
      FROM toks
    ), bcounts AS (
      SELECT g, COUNT(*) AS bcnt FROM bi GROUP BY g
    ), bvocab AS (
      SELECT g, bcnt FROM bcounts ORDER BY bcnt DESC, g
      LIMIT {_BIGRAM_TOP_B}
    )
    SELECT bi.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(ROUND(-CAST(SUM(CAST(ROUND(log2(
               {_LAMBDA_NUM / _LAMBDA_DEN} * COALESCE(
                   bv.bcnt / CAST(c1.cnt AS DOUBLE), 0.0)
               + {1 - _LAMBDA_NUM / _LAMBDA_DEN} * COALESCE(
                   c2.cnt, 1) / total.n
             ) * 1000000) AS BIGINT)) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS microbits_per_bigram
    FROM bi
    LEFT JOIN bvocab bv ON bi.g = bv.g
    LEFT JOIN counts c1 ON string_split(bi.g, ' ')[1] = c1.token
    LEFT JOIN counts c2 ON string_split(bi.g, ' ')[2] = c2.token
    CROSS JOIN total
    GROUP BY bi.doc_id
    """,
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality score with Jelinek-Mercer interpolation —
    one step from q_unigram_lm_score toward the KenLM n-gram filter
    real pipelines run: per bigram position,
    p = 0.7 * cnt(w1 w2)/cnt(w1) + 0.3 * p_unigram(w2), bigrams
    outside the top-B model back off to the unigram term alone, OOV
    unigrams pay the 1/N floor; the doc score is mean integer
    micro-bits per bigram (same exact-long-summation stance as the
    unigram query — the only float op per position is one log2 of an
    exactly-agreed rational, quantized before summing). Scale shape:
    the MODEL is two bounded broadcasts (top-B bigrams via
    TakeOrderedAndProject, the unigram count table) joined against
    the position scan — corpus size never changes the broadcast
    width, only B and V do."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", norm_tokens(F.col("text")).alias("t")
    )
    uni = toks.select(F.explode("t").alias("token"))
    counts = uni.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("__n"))
    bi = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") - 1 >= 1,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat_ws(" ", F.slice("t", i, 2)),
                ),
            ).otherwise(F.array())
        ).alias("g"),
    )
    bcounts = bi.groupBy("g").agg(F.count("*").alias("bcnt"))
    bvocab = bcounts.orderBy(F.col("bcnt").desc(), "g").limit(_BIGRAM_TOP_B)
    c1 = counts.select(
        F.col("token").alias("__w1"), F.col("cnt").alias("__c1")
    )
    c2 = counts.select(
        F.col("token").alias("__w2"), F.col("cnt").alias("__c2")
    )
    lam = _LAMBDA_NUM / _LAMBDA_DEN
    p = F.lit(lam) * F.coalesce(
        F.col("bcnt") / F.col("__c1").cast("double"), F.lit(0.0)
    ) + F.lit(1 - lam) * F.coalesce(F.col("__c2"), F.lit(1)) / F.col("__n")
    logp_u = F.round(F.log2(p) * 1_000_000).cast("long")
    return (
        bi.join(F.broadcast(bvocab), "g", "left")
        .join(
            F.broadcast(c1),
            F.split(F.col("g"), " ", -1).getItem(0) == F.col("__w1"),
            "left",
        )
        .join(
            F.broadcast(c2),
            F.split(F.col("g"), " ", -1).getItem(1) == F.col("__w2"),
            "left",
        )
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(-F.sum(logp_u).cast("double") / F.count("*"))
            .cast("long")
            .alias("microbits_per_bigram"),
        )
    )


@query(
    "q_bpe_merge_candidates",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ), chars AS (
      SELECT w, string_split(w, '') AS cs FROM words WHERE length(w) >= 2
    ), pairs AS (
      SELECT unnest(list_transform(
               cs[1:len(cs)-1],
               (x, i) -> x || cs[i + 1]
             )) AS pair
      FROM chars
    ), counted AS (
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY pair
    )
    SELECT pair, n FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rk
      FROM counted
    ) WHERE rk <= 20
    """,
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE merge discovery — the inner loop of
    byte-pair-encoding tokenizer training: count adjacent CHARACTER
    pairs inside every word, rank the top merge candidates (the
    highest-count pair is the merge a BPE trainer would apply next).
    Pair formation is array-local (split the word to a char array,
    pair element i with i+1 inside the array — the same
    no-self-join shape as q_token_pmi's bigrams), so the only
    shuffles are the pair count and the bounded top-20; corpus size
    only widens the map side. Full BPE training iterates this with a
    merge table re-broadcast per round — same plan per round, which
    is why the candidate counter is the piece worth pinning under
    the oracle."""
    docs = table(spark, sf_dir, "documents")
    from oarphpy_spark.functions.text import norm_tokens

    words = docs.select(
        F.explode(norm_tokens(F.col("text"))).alias("w")
    ).filter(F.length("w") >= 2)
    chars = words.select(F.split("w", "").alias("cs"))
    pairs = chars.select(
        F.explode(
            F.transform(
                F.slice(F.col("cs"), 1, F.size("cs") - 1),
                lambda x, i: F.concat(
                    x, F.element_at(F.col("cs"), i + 2)
                ),
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    return counted.orderBy(F.col("n").desc(), "pair").limit(20)


@query(
    "q_containment_join",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(string_split(lower(text), ' ')) - 2 >= 1
                      THEN list_transform(
                             generate_series(1,
                               len(string_split(lower(text), ' ')) - 2),
                             i -> array_to_string(
                               string_split(lower(text), ' ')[i:i+2], ' '))
                      ELSE [array_to_string(
                              string_split(lower(text), ' '), ' ')]
                      END) AS tok
        FROM documents
      )
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ), ov AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, o AS overlap,
           ROUND(o / CAST(sa.n AS DOUBLE), 6) AS containment
    FROM ov JOIN sz sa ON id_a = sa.doc_id
    WHERE o * 5 >= sa.n * 4
    """,
)
def q_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT containment >= 0.8 ordered pairs over 3-word shingle
    sets (llm/dedup.py:containment_join) — the asymmetric companion
    to q_set_similarity_join: |A n B| / |A|, which catches excerpts
    and boilerplate-wrapped near-subsets whose Jaccard is tiny. The
    prefix filter adapts asymmetrically (query-side prefixes probe a
    FULL postings index, since B's matching token can sit anywhere),
    with positional pruning and a suffix-only verify. The oracle is
    the quadratic all-pairs restatement with the same integer
    threshold. Training-corpus use: drop documents mostly contained
    in another (keep the superset), the dedup rule exact-hash,
    MinHash and Jaccard joins all miss."""
    from oarphpy_spark.llm.dedup import containment_join

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(shingles(norm_tokens(F.col("text")), 3)).alias("tok"),
    )
    return containment_join(
        tok, id_col="doc_id", token_col="tok", tau_num=4, tau_den=5
    )
