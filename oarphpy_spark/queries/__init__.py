"""Query definitions, grouped by SURVEY.md §2 category.

Importing this package registers every declared query into
``oarphpy_spark.registry``.

External correctness harnesses may only check a bounded prefix of the
registered queries, so ``_ROUND_PRIORITY`` pins the prefix to the
queries that most need fresh verification this round.  The round-8
window: 40 never-verified additions (spatial grid join + DBSCAN,
containment join, Theil-Sen, rank-1 ALS, mergeable heavy hitters,
CUSUM, bitmap algebra, seasonality, readability, deletion vectors,
link prediction, Holt smoothing, chained streaming rollup, exact
global median, GROUP BY ALL / set-ops-ALL / ntile / PIVOT /
parse_url), then the FOUR slugs
whose implementations changed closing round-7 ADVICE (SCC + SSSP
type-generic seeds, watermark-evictable streaming dedup, half-away
replay rounding — a changed implementation outranks helper-churn
staleness because that's where a regression can actually hide), then
the 6 stalest backlog slugs in audit rank.
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
    # --- round 8 (this build round): new queries, never driver-seen ---
    "q_heavy_hitters_mergeable",
    "q_seasonality_index",
    "q_cusum_changepoint",
    "q_containment_join",
    "q_delete_vector_apply",
    "q_bitmap_intersect",
    "q_theil_sen",
    "q_text_readability",
    "q_rank1_als",
    "q_set_ops_all",
    "q_fn_url",
    "q_spatial_grid_join",
    "q_dbscan_grid",
    "q_sql_groupby_all",
    "q_ntile_deciles",
    "q_link_prediction",
    "q_sql_pivot_clause",
    "q_exact_global_median",
    "q_stream_hierarchical_rollup",
    "q_holt_linear",
    "q_fn_listagg",
    "q_sql_exists_decorrelate",
    "q_event_pattern",
    "q_stream_dedup_within_watermark",
    "q_trimmed_mean",
    "q_emb_pq_codebook",
    "q_target_encoding_loo",
    "q_kaplan_meier",
    "q_stream_running_anomaly",
    "q_spatial_density",
    "q_spatial_knn_bounded",
    "q_table_checksum",
    "q_multimodal_dedup",
    "q_acf",
    "q_k_anonymity",
    "q_sql_grouping_id",
    "q_p99_contributors",
    "q_weighted_median",
    "q_graph_reciprocity",
    "q_benford_digits",
    # --- implementations changed this round (round-7 ADVICE closes):
    # type-generic SCC/SSSP seeds + non-numeric color convergence,
    # watermark-evictable window-struct dedup, half-away replay
    # rounding ---
    "q_scc_sizes",
    "q_sssp",
    "q_stream_distinct_users",
    "q_stream_python_source",
    # --- stalest backlog, audit rank (own-fn edits first, then
    # oldest last-green round) ---
    "q_dedup_simhash",
    "q_sim_ivf_topk",
    "q_sim_lsh_multiprobe",
    "q_sim_lsh_topk",
    "q_sim_topk",
    "q_grouped_apply_zscore",
]

registry.set_priority(_ROUND_PRIORITY)

# NEXT ROUND: the window must stay SATURATED (scripts/staleness_audit
# enforces it; backlog 202 after this allocation). Lead with any new
# queries, then implementations changed during the round, then the
# audit's recommended_window order (own-fn-changed stale first —
# still headed by the r7-changed iterative-graph family:
# pagerank/ppr/kcore/ktruss/lpa/dedup_clusters — then oldest
# helper-churn stale; the r01-era curation/text family continues to
# drain this round).
