"""Query definitions, grouped by SURVEY.md §2 category.

Importing this package registers every declared query into
``oarphpy_spark.registry``.

External correctness harnesses may only check a bounded prefix of the
registered queries, so ``_ROUND_PRIORITY`` pins the prefix to the
queries that most need fresh verification this round.  Round 7 closed
with FORTY-NINE never-verified queries (the 29 from the first session
— SSSP, association rules, classical stats, recursive-CTE reach,
streaming late-drop, OHLC, covariance, HLL — plus the 20 round-8
additions — SCC, relational k-means, bootstrap/CUPED/Mann-Whitney,
hybrid RRF, JL projection, streaming Python source, dynamic partition
overwrite, Gini, entropy, and friends), so the 50-slot window is
exactly those plus ``q_set_similarity_join`` (implementation changed
this round).  ``scripts/staleness_audit.py`` machine-checks this
allocation (window saturated stale-first, backlog recorded); the
union of all rounds' windows plus the full-registry local parity
gate covers every declared query.
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
    # --- round 7: new queries, never seen by any driver window ---
    "q_scc_sizes",
    "q_kmeans_relational",
    "q_stream_distinct_users",
    "q_dynamic_partition_overwrite",
    "q_bootstrap_ci",
    "q_cuped",
    "q_mann_whitney",
    "q_random_projection",
    "q_stream_python_source",
    "q_attribution_linear",
    "q_hll_merge",
    "q_hybrid_rrf",
    "q_revenue_gini",
    "q_session_entropy",
    "q_graph_assortativity",
    "q_time_weighted_avg",
    "q_negative_sampling",
    "q_sql_lateral_topk",
    "q_variant_shred",
    "q_cogroup_click_purchase",
    "q_sssp",
    "q_assoc_rules",
    "q_chi_square",
    "q_welch_ttest",
    "q_ewma_dyadic",
    "q_rolling_median",
    "q_anomaly_rolling_z",
    "q_sql_recursive_reach",
    "q_embedding_norm_stats",
    "q_component_sizes",
    "q_stream_late_data",
    "q_token_pmi",
    "q_grouped_linreg",
    "q_ohlc_bars",
    "q_interval_coverage",
    "q_embedding_covariance",
    "q_funnel_latency",
    "q_hll_relational",
    "q_session_paths",
    "q_pi_deterministic",
    "q_stream_ohlc",
    "q_confusion_matrix",
    "q_degree_distribution",
    "q_join_salted_skew",
    "q_udtf_chunks",
    "q_snapshot_time_travel",
    "q_bpe_merge_candidates",
    "q_histogram_2d",
    "q_graph_modularity",
    # --- implementations changed this round ---
    "q_set_similarity_join",   # PPJoin positional + suffix filters
    "q_graph_profile",         # integer wedge arithmetic
    "q_stream_dropdup",        # wrapper-dir cleanup
    "q_stream_upsert",         # stale-replay guard in merge_batch
    "q_cdc_apply",             # tie-contract docs (max_by path)
    "q_dedup_clusters",        # truncate_lineage refactor
    "q_pagerank",              # truncate_lineage refactor
    "q_ppr",                   # truncate_lineage refactor
    "q_kcore",                 # truncate_lineage refactor
    "q_ktruss",                # truncate_lineage refactor
    "q_label_propagation",     # truncate_lineage refactor
    # --- stalest by scripts/staleness_audit.py rank: slugs whose OWN
    # query function changed since their last driver-green row ---
    "q_dedup_simhash",
    "q_sim_ivf_topk",
    "q_sim_lsh_multiprobe",
    "q_sim_lsh_topk",
    "q_sim_topk",
    "q_grouped_apply_zscore",
    "q_window_distribution",
    # --- least-recently-verified rotation (last green row: r01) ---
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
    "q_scan_parquet",
    "q_text_fingerprint",
    "q_text_langid",
    "q_text_quality",
    "q_text_stats",
    "q_text_tokens",
]

registry.set_priority(_ROUND_PRIORITY)

# NEXT ROUND: the window must stay SATURATED (scripts/staleness_audit
# enforces it). This round closed with exactly 49 never-verified
# queries + q_set_similarity_join filling all 50 slots, which pushed
# the r7-changed iterative-graph family (pagerank/ppr/kcore/ktruss/
# lpa/dedup_clusters, truncate_lineage refactor, last green r06) into
# the backlog — next round's prefix should lead with the audit's
# recommended_window: any new queries, then own-fn-changed stale,
# then that family, then oldest helper-churn stale.
