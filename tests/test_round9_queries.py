"""Independent-reference identity tests for the round-9 additions —
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
