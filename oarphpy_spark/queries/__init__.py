"""Query definitions, grouped by SURVEY.md §2 category.

Importing this package registers every declared query into
``oarphpy_spark.registry``.

External correctness harnesses may only check a bounded prefix of the
registered queries, so ``_ROUND_PRIORITY`` pins the prefix to the
queries that most need fresh verification this round: never-verified
new queries first, then every implementation changed during the
round, then the stalest driver records (code-churn staleness AND,
since round 13, record-age staleness — a green row older than
AGE_LIMIT=4 rounds becomes seatable even when its code is unchanged).
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
import oarphpy_spark.queries.order_stats  # noqa: F401
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
    # --- round 13: the never-verified new query first, then every
    # implementation changed this round (the 7-query graph family on
    # the shared edge cache, both link-prediction paths, the
    # retrieval-ndcg left-join restatement), then the record-age
    # backlog stalest-first (r04 codec pair, the r05 band, the r06
    # band). q_sim_topk (r08, VERDICT r12 item 4) takes the final
    # slot. The audit's record-age rule (AGE_LIMIT=4) makes unchanged
    # old records seatable — the driver record itself ages.
    "q_cluster_get_info",
    "q_kcore",
    "q_ktruss",
    "q_triangle_count",
    "q_triangle_count_sampled",
    "q_degree_distribution",
    "q_graph_assortativity",
    "q_graph_profile",
    "q_link_prediction",
    "q_link_prediction_sketch",
    "q_retrieval_ndcg",
    "q_rowadapter_roundtrip",
    "q_tensor_codec",
    "q_cohort_retention",
    "q_group_sample_k",
    "q_min_max_by",
    "q_regexp_extract_all",
    "q_sql_correlated_scalar",
    "q_sql_tpch_q1",
    "q_sql_tpch_q11",
    "q_sql_tpch_q13",
    "q_sql_tpch_q14",
    "q_sql_tpch_q15",
    "q_sql_tpch_q16",
    "q_sql_tpch_q17",
    "q_sql_tpch_q19",
    "q_sql_tpch_q2",
    "q_sql_tpch_q20",
    "q_sql_tpch_q21",
    "q_sql_tpch_q22",
    "q_sql_tpch_q4",
    "q_sql_tpch_q7",
    "q_sql_tpch_q8",
    "q_unpivot",
    "q_window_first_last",
    "q_zorder_layout",
    "q_archive_source",
    "q_attribution_last_touch",
    "q_bigram_lm_score",
    "q_binary_auc",
    "q_bridge_shard_roundtrip",
    "q_cdc_apply",
    "q_compact_files",
    "q_drift_ks",
    "q_drift_tvd",
    "q_dup_span_detect",
    "q_entity_resolution",
    "q_event_debounce",
    "q_feature_hashing",
    "q_sim_topk",
]

registry.set_priority(_ROUND_PRIORITY)

# NEXT ROUND (14): keep the window SATURATED (scripts/staleness_audit
# enforces it). Lead with any new queries, then implementations
# changed during the round, then the audit's recommended_window
# order (the audit's record-age rule now surfaces old-but-unchanged
# driver rows too). After the round-13 window the oldest remaining
# driver evidence is the r06 band; two more disciplined windows
# re-green everything within the AGE_LIMIT=4 horizon.
