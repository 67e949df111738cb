"""Experimentation analytics: Poisson-bootstrap confidence intervals
and CUPED variance reduction — the two statistical workhorses of
large-scale A/B platforms, each as an exact-oracle relational plan.

Determinism discipline: resample weights come from md5-derived
uniforms pushed through an integer-threshold inverse CDF (no RNG, no
transcendentals at compare time); every cross-row sum is integer (or
128-bit for the bilinear combines); doubles appear only in fixed
single-division expressions rounded at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oarphpy_spark.registry import query
from oarphpy_spark.tables import table

# Poisson(1) inverse CDF over a 6-decimal integer uniform in [0, 1e6):
# P(X<=k) cumulative, scaled by 1e6 and truncated — identical integer
# thresholds in both engines, so the weight is a pure function of the
# hash. Tail capped at 6 (P > 6 is 8e-5; the cap is part of the
# operator's definition, not an approximation slipped in silently).
_POISSON_THRESHOLDS = (367879, 735758, 919698, 981011, 996340, 999405)


def _poisson_case_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < {t} THEN {k}"
        for k, t in enumerate(_POISSON_THRESHOLDS)
    )
    return f"CASE{branches} ELSE 6 END"


@query(
    "q_bootstrap_ci",
    oracle=f"""
    WITH v AS (
      SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS v_centi
      FROM events WHERE event_type = 'purchase'
    ),
    draws AS (
      SELECT b.b,
             {_poisson_case_sql(
                 "CAST(('0x' || substring(md5('bs|' || CAST(v.event_id AS VARCHAR)"
                 " || '#' || CAST(b.b AS VARCHAR)), 1, 6)) AS INTEGER) % 1000000"
             )} AS w,
             v.v_centi
      FROM v, (SELECT unnest(generate_series(1, 32)) AS b) b
    ),
    means AS (
      SELECT b,
             CAST(SUM(w * v_centi) AS DOUBLE)
             / (100.0 * CAST(SUM(w) AS DOUBLE)) AS m
      FROM draws GROUP BY b HAVING SUM(w) > 0
    ),
    ranked AS (
      SELECT m,
             ROW_NUMBER() OVER (ORDER BY m, b) AS lo_rank,
             ROW_NUMBER() OVER (ORDER BY m DESC, b DESC) AS hi_rank
      FROM means
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM means) AS n_resamples,
           (SELECT ROUND(CAST(SUM(v_centi) AS DOUBLE)
                         / (100.0 * COUNT(*)), 6) FROM v) AS point_mean,
           ROUND((SELECT m FROM ranked WHERE lo_rank = 2), 6) AS ci_lo,
           ROUND((SELECT m FROM ranked WHERE hi_rank = 2), 6) AS ci_hi
    """,
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap CI for the mean purchase value — the
    resampling scheme that actually scales (Chamandy et al., "Teaching
    Statistics at Google Scale", and the standard large-A/B trick):
    instead of drawing n rows with replacement (which needs global
    coordination), every row independently receives a Poisson(1)
    weight per resample, here a DETERMINISTIC hash-derived weight so
    the interval itself value-hashes. 32 resamples via a literal
    sequence explode (map-side, x32 rows of two ints); each resample
    mean is one integer-weighted ratio; the 95% band is order
    statistics (2nd smallest / 2nd largest of 32) with explicit
    tiebreaks. Scale shape: one scan, one (b)-keyed partial-agg
    shuffle of 32 groups, no joins; at 100 TB the x32 blowup stays
    map-side and the shuffle carries 32 rows per partition."""
    v = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("v_centi"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bs|"),
                        F.col("event_id").cast("string"),
                        F.lit("#"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("int")
        % 1000000
    )
    w = F.lit(6)
    for k in range(len(_POISSON_THRESHOLDS) - 1, -1, -1):
        w = F.when(u < _POISSON_THRESHOLDS[k], k).otherwise(w)
    draws = v.select(
        "event_id",
        "v_centi",
        F.explode(F.sequence(F.lit(1), F.lit(32))).alias("b"),
    ).select("b", "v_centi", w.alias("w"))
    means = (
        draws.groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("v_centi")).alias("swv"),
            F.sum("w").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select(
            "b",
            (
                F.col("swv").cast("double")
                / (100.0 * F.col("sw").cast("double"))
            ).alias("m"),
        )
    )
    lo = Window.orderBy("m", "b")
    hi = Window.orderBy(F.col("m").desc(), F.col("b").desc())
    ranked = means.select(
        "m",
        F.row_number().over(lo).alias("lo_rank"),
        F.row_number().over(hi).alias("hi_rank"),
    )
    point = v.agg(
        F.round(
            F.sum("v_centi").cast("double") / (100.0 * F.count("*")), 6
        ).alias("point_mean")
    )
    n_rs = means.agg(F.count("*").alias("n_resamples"))
    ci_lo = ranked.where(F.col("lo_rank") == 2).select(
        F.round("m", 6).alias("ci_lo")
    )
    ci_hi = ranked.where(F.col("hi_rank") == 2).select(
        F.round("m", 6).alias("ci_hi")
    )
    return (
        n_rs.crossJoin(F.broadcast(point))
        .crossJoin(F.broadcast(ci_lo))
        .crossJoin(F.broadcast(ci_hi))
    )


@query(
    "q_cuped",
    oracle="""
    WITH span AS (
      SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi FROM events
    ),
    per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN epoch_us(ts) * 2 < (SELECT lo + hi FROM span)
                           THEN CAST(ROUND(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS pre,
             CAST(SUM(CASE WHEN epoch_us(ts) * 2 >= (SELECT lo + hi FROM span)
                           THEN CAST(ROUND(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pre) AS BIGINT) AS sx,
             CAST(SUM(post) AS BIGINT) AS sy,
             CAST(SUM(CAST(pre AS HUGEINT) * post) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(pre AS HUGEINT) * pre) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(post AS HUGEINT) * post) AS HUGEINT) AS syy
      FROM per_user
    )
    SELECT n AS n_users,
           ROUND(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6)
             AS theta,
           ROUND((CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE))
                 / (CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                    * CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)),
                 6) AS var_reduction
    FROM s
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al., WSDM 2013): use each user's PRE-period
    metric as a control variate for the post-period metric —
    theta = cov(pre, post)/var(pre), and the achievable variance
    reduction is exactly the squared correlation rho^2 =
    cov^2/(var(pre) var(post)). The period split is the data-derived
    midpoint of the time span (one scalar subquery both engines
    compute identically in integer epoch-us). Everything reduces to
    SIX sufficient statistics per experiment in ONE aggregation pass
    over users (n, Sx, Sy, Sxy, Sxx, Syy); the bilinear combines run
    in 128-bit (n*Sxy ~ 1e3 users x 1e12 products already brushes
    int64 at sf0.01 — at 100 TB they are far past it), then two fixed
    double expressions. Scale shape: one user-keyed shuffle, then a
    1-row combine; this is the sufficient-statistics pattern every
    per-group regression in the repo shares (q_grouped_linreg)."""
    ev = table(spark, sf_dir, "events")
    span = ev.agg(
        (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))).alias(
            "lohi"
        )
    )
    per_user = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.unix_micros("ts") * 2 < F.col("lohi"),
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("pre"),
            F.sum(
                F.when(
                    F.unix_micros("ts") * 2 >= F.col("lohi"),
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("post"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = per_user.agg(
        F.count("*").alias("n"),
        F.sum("pre").alias("sx"),
        F.sum("post").alias("sy"),
        F.sum(dec("pre") * F.col("post")).alias("sxy"),
        F.sum(dec("pre") * F.col("pre")).alias("sxx"),
        F.sum(dec("post") * F.col("post")).alias("syy"),
    )
    n, sx, sy = dec("n"), dec("sx"), dec("sy")
    cov = (n * F.col("sxy") - sx * F.col("sy")).cast("double")
    varx = (n * F.col("sxx") - sx * F.col("sx")).cast("double")
    vary = (n * F.col("syy") - sy * F.col("sy")).cast("double")
    return s.select(
        F.col("n").alias("n_users"),
        F.round(cov / varx, 6).alias("theta"),
        F.round((cov * cov) / (varx * vary), 6).alias("var_reduction"),
    )


@query(
    "q_theil_sen",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(ROUND(value * 100) AS BIGINT) AS cv,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ), last16 AS (
      SELECT user_id, event_id, us, cv FROM ranked WHERE rn <= 16
    ), pairs AS (
      SELECT a.user_id,
             (b.cv - a.cv) * 60000000.0 / (b.us - a.us) AS slope
      FROM last16 a JOIN last16 b
        ON a.user_id = b.user_id
       AND a.event_id < b.event_id
       AND a.us <> b.us
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(MEDIAN(slope), 6) AS slope
    FROM pairs GROUP BY user_id ORDER BY user_id
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per user — the median of pairwise
    slopes over each user's 16 most recent events (centi-value per
    MINUTE), the estimator that shrugs off outliers OLS
    (q_grouped_linreg) chases. The pair set is formed INSIDE a
    per-user array (collect the bounded 16-row tail once, enumerate
    i<j positions with JVM higher-order transforms), so there is no
    pair self-join and no second shuffle — the same in-array trick
    as token-PMI/assoc-rules; pair slopes are direction-symmetric,
    so any once-per-unordered-pair enumeration yields the identical
    multiset as the oracle's event_id-ordered self-join. Median =
    explicit sorted-array midpoint (even n: mean of the middle two),
    which is exactly DuckDB MEDIAN's interpolation; slopes are
    identical IEEE expressions on exact integers in both engines."""
    events = table(spark, sf_dir, "events")
    # Ordering by the epoch-us projection is the same total order as
    # ts itself (unix_micros is strictly monotone).
    w = Window.partitionBy("user_id").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    last16 = (
        events.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("us"),
            F.round(F.col("value") * 100).cast("bigint").alias("cv"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 16)
    )
    arr = last16.groupBy("user_id").agg(
        F.collect_list(F.struct("us", "cv")).alias("pts")
    )
    slopes = F.expr(
        """
        sort_array(filter(
          flatten(transform(pts, (a, i) ->
            transform(slice(pts, i + 2, size(pts)), b ->
              IF(b.us <> a.us,
                 (b.cv - a.cv) * 60000000.0D / (b.us - a.us),
                 CAST(NULL AS DOUBLE))))),
          x -> x IS NOT NULL))
        """
    )
    out = arr.select("user_id", slopes.alias("sl")).filter(
        F.size("sl") > 0
    )
    med = F.expr(
        """
        IF(size(sl) % 2 = 1,
           element_at(sl, CAST((size(sl) + 1) / 2 AS INT)),
           (element_at(sl, CAST(size(sl) / 2 AS INT))
            + element_at(sl, CAST(size(sl) / 2 AS INT) + 1)) / 2.0D)
        """
    )
    return out.select(
        "user_id",
        F.size("sl").cast("bigint").alias("n_pairs"),
        F.round(med, 6).alias("slope"),
    ).orderBy("user_id")


@query(
    "q_trimmed_mean",
    oracle="""
    WITH r AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cv,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY CAST(ROUND(value * 100) AS BIGINT), event_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(cv) AS DOUBLE) / COUNT(*) / 100.0, 4)
             AS trimmed_mean
    FROM r
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean per event type — the robust
    location estimate between the mean (outlier-hostile) and the
    median (throws away 98% of the data): rank rows per type on
    exact centi-values with an event_id tiebreak (rank boundaries
    must be bit-deterministic or the kept SET differs between
    engines), drop the bottom and top floor(n/10), average the
    integer sum of the rest with ONE division. Companion to
    q_outlier_mad (flagging) and q_winsor-free by design — rows are
    dropped, not clamped, so the statistic is a pure function of the
    kept multiset. Per-type windows, one shuffle."""
    ev = table(spark, sf_dir, "events")
    cv = F.round(F.col("value") * 100).cast("bigint")
    r = ev.select(
        "event_type", "event_id", cv.alias("cv")
    ).select(
        "event_type",
        "cv",
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy("cv", "event_id")
        )
        .alias("rn"),
        F.count("*")
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    kept = r.filter(
        (F.col("rn") > F.expr("n div 10"))
        & (F.col("rn") <= F.col("n") - F.expr("n div 10"))
    )
    return (
        kept.groupBy("event_type")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(
                F.sum("cv").cast("double") / F.count("*") / 100.0, 4
            ).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )
