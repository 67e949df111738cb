"""Independent-reference identity tests for the round-8 additions —
Theil-Sen vs a plain-Python median-of-slopes, rank-1 ALS vs NumPy
normal equations, heavy-hitter bound sanity. These complement the
DuckDB parity rows with a second, non-SQL derivation."""

from __future__ import annotations

import statistics

import numpy as np
import pyarrow.parquet as pq

from .conftest import SF_SMALL


def test_theil_sen_matches_python_reference(spark):
    from oarphpy_spark.queries.experiment_extras import q_theil_sen

    got = {
        r.user_id: (r.n_pairs, r.slope)
        for r in q_theil_sen(spark, SF_SMALL).collect()
    }

    t = pq.read_table(
        f"{SF_SMALL}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"],
    ).to_pandas()
    t["us"] = t["ts"].astype("int64") // (
        1 if t["ts"].dtype == "datetime64[us]" else 1000
    )
    t["cv"] = (t["value"] * 100).round().astype("int64")
    want = {}
    for uid, g in t.groupby("user_id"):
        g = g.sort_values(["us", "event_id"], ascending=False).head(16)
        rows = list(zip(g["event_id"], g["us"], g["cv"]))
        slopes = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                (_, ua, ca), (_, ub, cb) = rows[i], rows[j]
                if ua != ub:
                    slopes.append((cb - ca) * 60000000.0 / (ub - ua))
        if slopes:
            want[uid] = (len(slopes), round(statistics.median(slopes), 6))
    assert got == want


def test_rank1_als_matches_numpy_normal_equations(spark):
    from oarphpy_spark.queries.ml_eval import q_rank1_als

    got = {
        r.item: (r.n_users, r.qm)
        for r in q_rank1_als(spark, SF_SMALL).collect()
    }

    t = pq.read_table(
        f"{SF_SMALL}/events.parquet", columns=["user_id", "event_type", "value"]
    ).to_pandas()
    t["cv"] = (t["value"] * 100).round().astype("int64")
    r = (
        t.groupby(["user_id", "event_type"])["cv"].sum().reset_index(name="rating")
    )
    # user step with q == 1, micro-quantized
    p = (
        r.groupby("user_id")["rating"]
        .agg(["sum", "count"])
        .assign(pm=lambda d: np.round(d["sum"] / d["count"] * 1e6).astype("int64"))[
            "pm"
        ]
    )
    rj = r.join(p, on="user_id")
    want = {}
    for item, g in rj.groupby("event_type"):
        num = float((g["rating"].astype(object) * g["pm"].astype(object)).sum())
        den = float((g["pm"].astype(object) * g["pm"].astype(object)).sum())
        want[item] = (len(g), int(round(num / den * 1e6)))
    assert got == want


def test_heavy_hitters_bounds_hold_and_cover_true_top(spark):
    from oarphpy_spark.queries.analytics_extras import (
        q_heavy_hitters_mergeable,
    )

    rows = q_heavy_hitters_mergeable(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.in_bounds == 1
        assert r.est_lo <= r.exact_n <= r.est_hi


def test_holt_linear_matches_textbook_recurrence(spark):
    """The closed-form fold (nl = b/2+l/2+t/2, nt = b/4-l/4+3t/4) must
    equal the TEXTBOOK nested Holt recurrence (nl = a*x + (1-a)(l+t);
    nt = b*(nl-l) + (1-b)*t) computed in plain Python: with dyadic
    alpha=beta=1/2 and bounded centi-int inputs every intermediate is
    an exactly-representable dyadic rational, so the two algebraic
    forms are bit-identical doubles."""
    from oarphpy_spark.queries.analytics_extras import q_holt_linear

    got = {
        r.user_id: (r.n_obs, r.level, r.trend, r.forecast_1)
        for r in q_holt_linear(spark, SF_SMALL).collect()
    }

    t = pq.read_table(
        f"{SF_SMALL}/events.parquet", columns=["user_id", "event_id", "value"]
    ).to_pandas()
    t["v"] = (t["value"] * 1e3).round().astype("int64")
    want = {}
    for uid, g in t.groupby("user_id"):
        vs = list(g.sort_values("event_id")["v"])[-16:]
        l, tr = float(vs[0]), 0.0
        for x in vs[1:]:
            nl = 0.5 * x + 0.5 * (l + tr)
            tr = 0.5 * (nl - l) + 0.5 * tr
            l = nl
        want[uid] = (
            len(vs),
            round(l / 1e3, 6),
            round(tr / 1e3, 6),
            round((l + tr) / 1e3, 6),
        )
    assert got == want


def test_kaplan_meier_matches_python_reference(spark):
    """Relational KM == textbook product-limit estimator computed in
    plain Python over the same lifetimes + censoring rule."""
    import pandas as pd

    from oarphpy_spark.queries.analytics_extras import q_kaplan_meier

    got = {
        r.duration_days: (r.n_deaths, r.n_risk, r.survival)
        for r in q_kaplan_meier(spark, SF_SMALL).collect()
    }

    t = pq.read_table(
        f"{SF_SMALL}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    mx = t["ts"].max()
    g = t.groupby("user_id")["ts"].agg(["min", "max"])
    dur = ((g["max"] - g["min"]).dt.total_seconds() * 1e6 // 86400000000)
    dur = dur.astype("int64")
    censored = g["max"] >= mx - pd.Timedelta(days=3)
    total = len(g)
    rows = (
        pd.DataFrame({"dur": dur, "dead": (~censored).astype(int)})
        .groupby("dur")
        .agg(d=("dead", "sum"), leaving=("dead", "count"))
        .sort_index()
    )
    surv, left_before = 1.0, 0
    want = {}
    for dd, r in rows.iterrows():
        n_risk = total - left_before
        surv *= (n_risk - r["d"]) / n_risk
        if r["d"] > 0:
            want[dd] = (r["d"], n_risk, round(surv, 6))
        left_before += r["leaving"]
    assert got == want
