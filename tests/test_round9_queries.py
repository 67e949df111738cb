"""Property tests for the round-9 additions: the Horvitz-Thompson
link-prediction sketch vs the exact wedge join, and the exact path's
degree cap. All hash-style inputs are deterministic (md5-ranked
sampling), so every threshold below is a fixed fact of the test data,
not a flaky tail probability."""

from __future__ import annotations

import duckdb

from .conftest import SF_ORACLE, SF_SMALL

_PR_SQL = """
  SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
  FROM '{sf}/lineitem.parquet' a JOIN '{sf}/lineitem.parquet' b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def test_lp_sketch_top20_tracks_exact_top20(spark):
    """The sketch's top-20 must substantially agree with the exact
    top-20, and where they agree the estimated common-neighbor count
    must be close (measured at calibration: overlap 8/20, mean rel
    err 5.6%, max 14.8% — asserted with margin)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    exact = {
        (r["u"], r["v"]): r["common"]
        for r in qs["q_link_prediction"](spark, SF_ORACLE).collect()
    }
    sk = {
        (r["u"], r["v"]): r["est_common_micro"] / 1e6
        for r in qs["q_link_prediction_sketch"](spark, SF_ORACLE).collect()
    }
    both = set(exact) & set(sk)
    assert len(both) >= 6
    for pair in both:
        rel = abs(sk[pair] - exact[pair]) / exact[pair]
        assert rel < 0.25, (pair, sk[pair], exact[pair])


def test_lp_sketch_globally_unbiased():
    """Defining Horvitz-Thompson property: summed over ALL candidate
    pairs, the inverse-probability-weighted count reproduces the true
    total wedge count (measured ratio 1.00003 at sf0.01; the engines
    agree bit-for-bit on this pipeline via the parity gate, so DuckDB
    alone suffices here)."""
    from oarphpy_spark.queries.graph_queries import _LP_SKETCH_T as T

    pr = _PR_SQL.format(sf=SF_ORACLE)
    est, true = duckdb.sql(
        f"""
        WITH pr AS ({pr}),
        und AS (SELECT s, d FROM pr UNION ALL SELECT d, s FROM pr),
        deg AS (SELECT s AS node, COUNT(*) AS dg FROM und GROUP BY s),
        samp AS (
          SELECT s, d, dg FROM (
            SELECT u.s, u.d, deg.dg,
                   ROW_NUMBER() OVER (PARTITION BY u.s
                     ORDER BY md5('lps|' || CAST(u.s AS VARCHAR) || '|'
                                  || CAST(u.d AS VARCHAR)), u.d) AS rk
            FROM und u JOIN deg ON u.s = deg.node)
          WHERE rk <= {T}),
        w AS (SELECT s, d,
                CASE WHEN dg <= {T} THEN CAST(1000000 AS BIGINT)
                     ELSE (1000000 * dg * (dg - 1)) // ({T} * ({T} - 1))
                END AS wm FROM samp)
        SELECT
          (SELECT SUM(a.wm) / 1e6 FROM w a JOIN w b
             ON a.s = b.s AND a.d < b.d) AS est,
          (SELECT COUNT(*) FROM und a JOIN und b
             ON a.s = b.s AND a.d < b.d) AS true_total
        """
    ).fetchone()
    assert abs(est / true - 1.0) < 0.01


def test_lp_degree_cap_engages_and_matches_oracle(spark):
    """With a cap below the max degree, hub-centered wedges are
    excluded — the capped exact path must equal the independently
    capped DuckDB restatement AND differ from the uncapped result
    (proving the cap actually binds)."""
    from oarphpy_spark.queries.graph_queries import _link_prediction_exact

    cap = 100  # sf0.001 degrees run up to 138, median 89
    got = [
        (r["u"], r["v"], r["common"], r["jaccard"])
        for r in _link_prediction_exact(spark, SF_SMALL, cap).collect()
    ]
    pr = _PR_SQL.format(sf=SF_SMALL)
    want = duckdb.sql(
        f"""
        WITH pr AS ({pr}),
        und AS (SELECT s, d FROM pr UNION ALL SELECT d, s FROM pr),
        deg AS (SELECT s AS node, COUNT(*) AS dg FROM und GROUP BY s),
        cn AS (
          SELECT a.d AS u, b.d AS v, CAST(COUNT(*) AS BIGINT) AS common
          FROM und a JOIN und b ON a.s = b.s AND a.d < b.d
          JOIN deg cd ON a.s = cd.node AND cd.dg <= {cap}
          GROUP BY a.d, b.d),
        nonedge AS (
          SELECT cn.u, cn.v, cn.common FROM cn
          LEFT JOIN pr ON pr.s = cn.u AND pr.d = cn.v
          WHERE pr.s IS NULL)
        SELECT u, v, common,
               ROUND(common / CAST(du.dg + dv.dg - common AS DOUBLE), 6)
                 AS jaccard
        FROM nonedge JOIN deg du ON u = du.node JOIN deg dv ON v = dv.node
        ORDER BY jaccard DESC, u, v LIMIT 20
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]

    uncapped = [
        (r["u"], r["v"])
        for r in _link_prediction_exact(spark, SF_SMALL, 10**9).collect()
    ]
    assert [(u, v) for u, v, _, _ in got] != uncapped


def test_lp_default_cap_never_binds_at_tested_sf():
    """The registered query's cap is a pure scale guard: it must sit
    far above the max degree at every tested SF, so small-SF results
    are identical to the uncapped r8 semantics."""
    from oarphpy_spark.queries.graph_queries import _LP_DEGREE_CAP

    for sf in (SF_SMALL, SF_ORACLE):
        pr = _PR_SQL.format(sf=sf)
        (mx,) = duckdb.sql(
            f"""
            WITH pr AS ({pr}),
            und AS (SELECT s, d FROM pr UNION ALL SELECT d, s FROM pr)
            SELECT MAX(c) FROM (
              SELECT COUNT(*) AS c FROM und GROUP BY s)
            """
        ).fetchone()
        assert mx < _LP_DEGREE_CAP / 4
