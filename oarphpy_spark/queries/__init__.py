"""Query definitions, grouped by SURVEY.md §2 category.

Importing this package registers every declared query into
``oarphpy_spark.registry``.

External correctness harnesses may only check a bounded prefix of the
registered queries, so ``_ROUND_PRIORITY`` pins the prefix to the
queries that most need fresh verification this round.  The round-11
window spends 48 of 50 slots on verification (VERDICT r9 item 1): the
2 new queries, the 5 implementations changed by the sketch top-T
rewrite and the minhash band-bucket refactor, and 43 slots of stalest
backlog in audit rank — covering every remaining r01-era and r02-era
slug.
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
    # --- round 11: the three new queries (batch-vs-corpus LSH
    # near-dup gate; leakage-safe group split; int8-coarse +
    # exact-rerank two-stage retrieval) ---
    "q_dedup_minhash_incremental",
    "q_group_holdout_split",
    "q_sim_rerank_two_stage",
    # --- implementations changed this round: the link-prediction
    # candidate-table rewrite (degree-carry + packed uv key +
    # SHUFFLE_HASH anti-join, both paths), the sketch top-T
    # partial-aggregation rewrite, and the minhash family whose
    # band-bucket construction was factored into
    # minhash_band_buckets (changed code outranks staleness) ---
    "q_link_prediction_sketch",
    "q_link_prediction",
    "q_dedup_minhash",
    "q_dedup_minhash_verified",
    "q_dedup_clusters",
    "q_dedup_incremental",
    # --- 43 slots of stalest backlog in audit rank (VERDICT r09
    # item 1: all 5 r01-era and every r02-era slug fit in this
    # window; the drain completes next round) ---
    "q_source_local_rows",
    "q_text_fingerprint",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokens",
    "q_case_when",
    "q_collect_list_examples",
    "q_cube",
    "q_emb_quantize_int8",
    "q_events_funnel",
    "q_events_session",
    "q_events_sliding",
    "q_events_tumbling",
    "q_filter_sql_string",
    "q_fn_hash",
    "q_fn_map",
    "q_groupby_count",
    "q_join_bloom_prune",
    "q_join_full_outer",
    "q_join_range_bucketed",
    "q_limit_topk",
    "q_multimodal_frames",
    "q_nested_path_predicate",
    "q_pandas_udf_norm",
    "q_select_nested_field",
    "q_seq_packing",
    "q_sim_ivf_multiprobe",
    "q_skew_salted_agg",
    "q_sql_tpch_q18",
    "q_sql_tpch_q3",
    "q_sql_tpch_q5",
    "q_sql_tpch_q6",
    "q_text_clean",
    "q_token_doc_freq",
    "q_token_topk",
    "q_train_val_split",
    "q_window_rank",
    "q_window_running_agg",
    "q_window_topk_per_group",
    "q_balanced_sample",
    "q_bm25_rank",
    "q_bucket_case_when",
    "q_cdc_latest",
]

registry.set_priority(_ROUND_PRIORITY)

# NEXT ROUND (12): the window must stay SATURATED (scripts/
# staleness_audit enforces it). Lead with any new queries, then
# implementations changed during the round, then the audit's
# recommended_window order. After the round-11 drain no slug's last
# green row predates r03 except the two r04-band slugs this window
# evicted for changed code (q_bucket_case_when, q_cdc_latest) — put
# those two back first, then follow audit rank; backlog ~165 means
# roughly three more windows re-green everything through r08.
