"""Plan-shape and semantic checks for the data-engineering operators
(snapshot diff, SCD2, MAD outliers, ORC sink) and the corpus passes
(span dedup, unigram LM). Value correctness is covered by the oracle
parity sweep; these tests pin the PHYSICAL shapes that matter at
100 TB."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from oarphpy_spark import registry

from .conftest import SF_SMALL


def _plan(spark, name: str, mode: str = "formatted") -> str:
    df = registry.queries()[name](spark, SF_SMALL)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_table_diff_joins_hashes_not_rows(spark):
    """The full-outer diff must exchange (key, hash) pairs, not whole
    rows: the scan schema is pruned to the hashed columns and the join
    is a sort-merge full outer (broadcast is wrong for two same-size
    snapshots)."""
    plan = _plan(spark, "q_table_diff")
    assert "FullOuter" in plan
    assert "SortMergeJoin" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" not in read_schema  # not part of the row hash


def test_scd2_single_exchange(spark):
    """Both window passes partition on user_id with compatible sort
    orders, so the plan needs exactly one hash exchange — the per-user
    sort is paid once and reused by lag and lead."""
    plan = _plan(spark, "q_scd2_intervals", "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "user_id" in plan.split("Exchange hashpartitioning")[1].split(")")[0]


def test_outlier_mad_broadcasts_group_stats(spark):
    """Group medians/MADs are a handful of rows — both join-backs must
    broadcast so the event scan never shuffles."""
    plan = _plan(spark, "q_outlier_mad", "simple")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_unigram_lm_broadcasts_vocab(spark):
    """The top-V vocabulary and the 1-row total are broadcast; the
    token scan side never shuffles for the join. Top-V itself must be
    TakeOrderedAndProject (per-task heap), not a global sort."""
    plan = _plan(spark, "q_unigram_lm_score", "simple")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_dup_span_no_cartesian_and_bounded_key(spark):
    """Span dedup joins on a fixed-width hash; there must be no
    Cartesian/nested-loop anywhere and the distinct-doc count must be
    partial-aggregated (>= 2 HashAggregate levels)."""
    plan = _plan(spark, "q_dup_span_detect", "simple")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_scd2_intervals_reconstruct_stream(spark):
    """Semantic spot-check: interval starts per user are strictly
    increasing, exactly one open (current) interval per user, and
    adjacent intervals never carry the same event_type (else they
    would have been merged)."""
    df = registry.queries()["q_scd2_intervals"](spark, SF_SMALL).cache()
    per_user = (
        df.groupBy("user_id")
        .agg(
            F.sum("is_current").alias("n_current"),
            F.count("*").alias("n_intervals"),
        )
        .collect()
    )
    assert per_user and all(r.n_current == 1 for r in per_user)
    # adjacent-interval type change: lag over (user, valid_from)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    bad = (
        df.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type") == F.col("event_type"))
        .count()
    )
    assert bad == 0
    df.unpersist()


def test_table_diff_classes_complete(spark):
    """Every simulated mutation class appears and unchanged rows are
    absent: keys %19==0 are 'removed', inserted keys (offset range) are
    'added', and every 'changed' key is %7==0."""
    rows = registry.queries()["q_table_diff"](spark, SF_SMALL).collect()
    by_class: dict[str, list[int]] = {}
    for r in rows:
        by_class.setdefault(r.change, []).append(r.o_orderkey)
    assert set(by_class) == {"added", "removed", "changed"}
    assert all(k % 19 == 0 for k in by_class["removed"])
    assert all(k >= 10**12 and (k - 10**12) % 13 == 0 for k in by_class["added"])
    assert all(k % 7 == 0 and k % 19 != 0 for k in by_class["changed"])


def test_apply_cdc_semantics(spark):
    """Unit semantics on a toy table: latest-wins per key, delete of a
    nonexistent key is a no-op, insert creates, update replaces."""
    from oarphpy_spark.operators.upsert import apply_cdc

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 1, "U"),  # superseded by seq 2
            (1, "a3", 2, "U"),  # wins
            (2, None, 1, "D"),  # delete existing
            (9, None, 5, "D"),  # delete nonexistent: no-op
            (4, "d", 1, "I"),  # insert new key
        ],
        "k long, v string, seq long, op string",
    )
    got = {
        r.k: r.v for r in apply_cdc(snap, changes, "k").collect()
    }
    assert got == {1: "a3", 3: "c", 4: "d"}


def test_cdc_apply_compacts_before_join(spark):
    """The change stream must compact via partial aggregation (a
    partial_max below the exchange — max(struct) with a string member
    compiles to SortAggregate) and apply with a single full-outer
    SMJ."""
    plan = _plan(spark, "q_cdc_apply", "simple")
    assert "FullOuter" in plan
    assert "partial_max" in plan


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from oarphpy_spark.operators.compaction import compact

    frag = str(tmp_path / "frag")
    comp = str(tmp_path / "comp")
    df = spark.range(10000).selectExpr("id", "id % 7 AS g")
    df.repartition(32).write.parquet(frag)
    stats = compact(spark, frag, comp, target_bytes=1 << 30)
    assert stats["files_before"] == 32
    assert stats["files_after"] < stats["files_before"]
    back = spark.read.parquet(comp)
    assert back.count() == 10000
    assert back.selectExpr("sum(id) s").first().s == df.selectExpr(
        "sum(id) s"
    ).first().s


def test_attribution_is_join_free_single_exchange(spark):
    """Last-touch attribution must be the carry-forward window — one
    exchange on user_id, no join anywhere (the naive self-join
    formulation shuffles the event log twice)."""
    plan = _plan(spark, "q_attribution_last_touch", "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_debounce_single_exchange_no_join(spark):
    plan = _plan(spark, "q_event_debounce", "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_debounce_resets_clock_on_kept_events(spark):
    """Toy stream: events at t=0, 5, 9, 20 minutes for one (user,
    type). With a 10-minute debounce over the RAW stream, t=0 keeps,
    t=5 drops (5 < 10 after t=0), t=9 drops (4 after t=5 — the DROPPED
    event still reset the clock), t=20 keeps (11 after t=9)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, "click", base + dt.timedelta(minutes=m))
        for i, m in enumerate([0, 5, 9, 20])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    kept = (
        df.select("event_id", prev.alias("p"), "ts")
        .filter(
            F.col("p").isNull()
            | (F.unix_micros("ts") - F.unix_micros("p") > 600_000_000)
        )
        .select("event_id")
        .collect()
    )
    assert sorted(r.event_id for r in kept) == [0, 3]


def test_outlier_mad_flags_are_rare_and_extreme(spark):
    """MAD outliers must be a small tail, and every flagged row's
    |robust_z| must exceed every unflagged row's within its group."""
    rows = registry.queries()["q_outlier_mad"](spark, SF_SMALL).collect()
    n_out = sum(r.is_outlier for r in rows)
    assert 0 <= n_out < 0.1 * len(rows)
    worst_in = {}
    best_out = {}
    for r in rows:
        z = abs(r.robust_z)
        if r.is_outlier:
            best_out[r.event_type] = min(best_out.get(r.event_type, z), z)
        else:
            worst_in[r.event_type] = max(worst_in.get(r.event_type, 0.0), z)
    for et, z in best_out.items():
        assert z > worst_in.get(et, 0.0)
