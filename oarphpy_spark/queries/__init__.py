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
    # --- round 14: no never-verified slugs remain. Changed code
    # first: the shared-edge-cache restructure (public release API,
    # lazy degree build) touches the whole graph family, the sketch
    # dg<=T bypass touches both link-prediction paths, and
    # q_scc_sizes / q_revenue_gini share the module / the weighted
    # edge helper. Then the record-age backlog oldest-first from
    # scripts/staleness_audit.py (the r06 stream band, the r06/r07
    # iterative-graph band, the r07 analytics band).
    "q_kcore",
    "q_ktruss",
    "q_triangle_count",
    "q_triangle_count_sampled",
    "q_degree_distribution",
    "q_graph_assortativity",
    "q_graph_profile",
    "q_link_prediction",
    "q_link_prediction_sketch",
    "q_scc_sizes",
    "q_revenue_gini",
    "q_join_asof_tolerance",
    "q_label_propagation",
    "q_markov_transitions",
    "q_multimodal_audio",
    "q_nhop_reach",
    "q_outlier_mad",
    "q_pagerank",
    "q_pareto_skyline",
    "q_ppr",
    "q_scd2_intervals",
    "q_score_calibration",
    "q_sink_orc",
    "q_sql_tpch_q12",
    "q_sql_tpch_q9",
    "q_stream_enriched",
    "q_stream_interval_join",
    "q_stream_sessionize",
    "q_stream_sliding",
    "q_stream_stateful_totals",
    "q_stream_tumbling",
    "q_stream_upsert",
    "q_table_diff",
    "q_tfevents_scan",
    "q_ts_gapfill",
    "q_unigram_lm_score",
    "q_weighted_sample",
    "q_anomaly_rolling_z",
    "q_assoc_rules",
    "q_attribution_linear",
    "q_bootstrap_ci",
    "q_bpe_merge_candidates",
    "q_chi_square",
    "q_cogroup_click_purchase",
    "q_component_sizes",
    "q_confusion_matrix",
    "q_cuped",
    "q_embedding_covariance",
    "q_embedding_norm_stats",
    "q_ewma_dyadic",
]

registry.set_priority(_ROUND_PRIORITY)

# NEXT ROUND (14): keep the window SATURATED (scripts/staleness_audit
# enforces it). Lead with any new queries, then implementations
# changed during the round, then the audit's recommended_window
# order (the audit's record-age rule now surfaces old-but-unchanged
# driver rows too). After the round-13 window the oldest remaining
# driver evidence is the r06 band; two more disciplined windows
# re-green everything within the AGE_LIMIT=4 horizon.
