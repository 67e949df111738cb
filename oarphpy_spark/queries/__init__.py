"""Query definitions, grouped by SURVEY.md §2 category.

Importing this package registers every declared query into
``oarphpy_spark.registry``.

External correctness harnesses may only check a bounded prefix of the
registered queries, so ``_ROUND_PRIORITY`` pins the prefix to the
queries that most need fresh verification this round.  The round-9
window spends 49 of 50 slots on verification (VERDICT r8 item 1): the
single new query (q_link_prediction_sketch), the 7 implementations
changed closing round-8 ADVICE / this round's performance work, the 3
rows-only-by-design slugs (stale since r04), and 39 slots of stalest
backlog in audit rank.
``scripts/staleness_audit.py`` machine-checks this allocation (window
saturated stale-first, backlog recorded); the union of all rounds'
windows plus the full-registry local parity gate covers every
declared query.
"""

import oarphpy_spark.queries.analytics_extras  # noqa: F401
import oarphpy_spark.queries.codec_queries  # noqa: F401
import oarphpy_spark.queries.corpus_extras  # noqa: F401
import oarphpy_spark.queries.curation  # noqa: F401
import oarphpy_spark.queries.engineering  # noqa: F401
import oarphpy_spark.queries.experiment_extras  # noqa: F401
import oarphpy_spark.queries.fidelity  # noqa: F401
import oarphpy_spark.queries.graph_queries  # noqa: F401
import oarphpy_spark.queries.inventory_extras  # noqa: F401
import oarphpy_spark.queries.joins  # noqa: F401
import oarphpy_spark.queries.llm_queries  # noqa: F401
import oarphpy_spark.queries.ml_eval  # noqa: F401
import oarphpy_spark.queries.pipeline_extras  # noqa: F401
import oarphpy_spark.queries.profiling  # noqa: F401
import oarphpy_spark.queries.relational  # noqa: F401
import oarphpy_spark.queries.scalar_fns  # noqa: F401
import oarphpy_spark.queries.spatial  # noqa: F401
import oarphpy_spark.queries.sql_api  # noqa: F401
import oarphpy_spark.queries.streaming_queries  # noqa: F401
import oarphpy_spark.queries.tpch  # noqa: F401
import oarphpy_spark.queries.windows_events  # noqa: F401

from oarphpy_spark import registry

_ROUND_PRIORITY = [
    # --- round 9: the one new query (HT link-prediction sketch) ---
    "q_link_prediction_sketch",
    # --- implementations changed this round (round-8 ADVICE closes +
    # the containment array-verify and link-prediction degree cap):
    # changed code outranks helper-churn staleness because that is
    # where a regression can actually hide ---
    "q_containment_join",
    "q_link_prediction",
    "q_delete_vector_apply",
    "q_dynamic_partition_overwrite",
    "q_sql_pivot_clause",
    "q_stream_running_anomaly",
    "q_set_similarity_join",
    # --- the 3 rows-only-by-design slugs (last driver rows r04;
    # VERDICT r8 item 8: keep 'rows-only by design' an observed
    # fact, not a remembered one) ---
    "q_cluster_cpu_count",
    "q_for_each_executor",
    "q_monte_carlo_pi",
    # --- 39 slots of stalest backlog, audit rank (own-fn edits
    # first — the docstring-filled r01-era slugs — then oldest
    # last-green; VERDICT r8 item 1: drain the driver backlog) ---
    "q_text_stats",
    "q_distinct",
    "q_filter_eq",
    "q_filter_range",
    "q_fn_array",
    "q_fn_date",
    "q_fn_json",
    "q_fn_math",
    "q_fn_string",
    "q_grouping_sets",
    "q_intersect_except",
    "q_orderby",
    "q_project",
    "q_union_all",
    "q_sink_parquet_lz4",
    "q_sink_parquet_zstd",
    "q_window_distribution",
    "q_graph_profile",
    "q_stream_dropdup",
    "q_agg_sum_avg_minmax",
    "q_curation_pipeline",
    "q_dedup_embedding",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash_hamming",
    "q_join_asof",
    "q_join_broadcast",
    "q_join_inner_hash",
    "q_join_left_right_full",
    "q_join_semi_anti",
    "q_join_theta_range",
    "q_multimodal_blob",
    "q_multimodal_features",
    "q_multimodal_stats",
    "q_multiway_star",
    "q_percentiles",
    "q_row_of_constants",
    "q_scan_parquet",
    "q_size_of_deep",
]

registry.set_priority(_ROUND_PRIORITY)

# NEXT ROUND: the window must stay SATURATED (scripts/staleness_audit
# enforces it). Lead with any new queries, then implementations
# changed during the round, then the audit's recommended_window order.
# After this round's 40-slot drain the backlog is ~167; the oldest
# remaining last-green cohort (r01/r02 text/curation family tail plus
# the r02 window/join families) continues next round — at 40+
# verification slots per round the whole registry re-greens in ~4
# rounds.
