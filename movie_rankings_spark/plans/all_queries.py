"""Assembles the full named-query registry by importing every
registration module (import order = SURVEY.md §2 section order).

The exported dicts are COST-ORDERED: cheap batch queries first, the
handful of >1 s entries (Arrow/Python ANN passes, streaming-engine
runs) last, so a time-boxed harness walking the dict in order checks
the maximum number of queries before its budget runs out. Timings
from the per-round bench runs at sf0.01."""

from __future__ import annotations

import movie_rankings_spark.plans.analytics_queries  # noqa: F401
import movie_rankings_spark.plans.flagship_queries  # noqa: F401
import movie_rankings_spark.plans.frontier_queries  # noqa: F401
import movie_rankings_spark.plans.llm_queries  # noqa: F401
import movie_rankings_spark.plans.relational_ext_queries  # noqa: F401
import movie_rankings_spark.plans.relational_queries  # noqa: F401
import movie_rankings_spark.plans.streaming_queries  # noqa: F401
import movie_rankings_spark.plans.tpch_wide_queries  # noqa: F401
import movie_rankings_spark.plans.warehouse_queries  # noqa: F401
from movie_rankings_spark.plans.registry import REGISTRY

#: The correctness harness walks queries() in dict order and records
#: a row for the first ~50 only; r1-r4 samples together covered 159
#: of the 216 registered queries, leaving 57 with no driver row.
#: This head is the r5 rotation (regenerated from CORRECTNESS_r01-r04
#: at round start): never-driver-checked ORACLE-BACKED batch queries
#: first, then the never-checked streaming tail (oracle-backed, ~1-5 s
#: each), then rows-only entries (their driver row is the weaker
#: check). Regenerate next round from CORRECTNESS_r05.json.
_UNSEEN_FIRST = (
    # never driver-checked, oracle-backed batch
    "decay_user_activity",
    "similarity_tfidf_topk",
    "triangles_copurchase",
    "cogroup_asof_purchase",
    "embedding_covariance",
    "skew_profile_join_keys",
    "dedup_jaccard_prefix",
    "classifier_doc_scores",
    "decontaminate_bloom_gate",
    "cms_word_frequency",
    "basket_association_rules",
    "drift_train_val_js",
    "histogram_equidepth_price",
    "sample_k_per_lang",
    "dedup_cluster_reps_star",
    "bitmap_users_rollup",
    "session_paths_top",
    "quantile_normalize_price",
    "knn_label_propagation",
    "classifier_auc_eval",
    "anomaly_rolling_zscore",
    "quality_filtered_per_lang",
    "active_users_rolling",
    "session_transition_matrix",
    "winsorized_mean_price",
    "histogram2d_qty_price",
    "pagerank_copurchase",
    "similarity_mmr_topk",
    "join_size_cms_events",
    "histogram_rollup_events",
    "flagship_fuzzy_resolved",
    "bootstrap_mean_ci_orders",
    "mi_lang_source",
    "topmovers_segment_monthly",
    "kappa_quality_raters",
    "coverage_topdoc_chars",
    "ks_price_priority",
    "mannwhitney_price_priority",
    "benford_totalprice",
    "spearman_qty_price",
    "acf_daily_revenue",
    "changepoint_daily_revenue",
    "search_hybrid_rrf",
    "abtest_conversion_events",
    "drift_train_val_psi",
    "stream_psi_monitor",
    "embedding_jl_rademacher",
    "centrality_harmonic_hubs",
    "ks_source_length_profiles",
    # never driver-checked streaming (oracle-backed)
    "stream_running_topk_users",
    "stream_session_dynamic_gap",
    "stream_dedup_then_window",
    "stream_sliding_6h",
    "stream_session_windows",
    "stream_dedup_user_types",
    "stream_dedup_watermark_bounded",
    "stream_static_join_segments",
    "stream_stream_view_purchase",
    "stream_stream_outer_attribution",
    "stream_tumbling_daily",
    "stream_user_lifetime_stats",
    "stream_upsert_snapshot",
    "stream_dedup_incremental",
    "stream_cms_maintained",
    "stream_bitmap_users_rollup",
    "stream_histogram_rollup",
    # never driver-checked rows-only (weaker driver row)
    "approx_percentiles_price",
    "similarity_ivf_kmeans_topk",
    "similarity_pq_topk",
    "dedup_semantic_clusters",
    "embedding_jl_projection",
    "hll_users_mergeable_rollup",
    "embedding_pca_project",
    "bpe_train_merges",
    "logreg_train_quality",
    "retrieval_eval_ivf",
    "tokenizer_encode_bpe",
    "profile_columns_orders_approx",
    "knn_label_propagation_ivf",
)

#: most expensive entries at sf0.01, slowest-last; everything absent
#: from this tuple keeps registration order ahead of it.
_COSTLY_LAST = (
    "similarity_cosine_topk",
    "q7_volume_shipping",
    "q8_market_share",
    "similarity_ivf_topk",
    "similarity_ivf_kmeans_topk",
    "dedup_embedding_lsh",
    "dedup_minhash_lsh",
    "skew_profile_join_keys",
    "dedup_jaccard_prefix",
    "classifier_doc_scores",
    "decontaminate_bloom_gate",
    "cms_word_frequency",
    "basket_association_rules",
    "drift_train_val_js",
    "histogram_equidepth_price",
    "sample_k_per_lang",
    "dedup_cluster_reps_star",
    "bitmap_users_rollup",
    "session_paths_top",
    "quantile_normalize_price",
    "knn_label_propagation",
    "classifier_auc_eval",
    "anomaly_rolling_zscore",
    "quality_filtered_per_lang",
    "active_users_rolling",
    "session_transition_matrix",
    "winsorized_mean_price",
    "histogram2d_qty_price",
    "stream_sliding_6h",
    "stream_session_windows",
    "stream_dedup_user_types",
    "stream_dedup_watermark_bounded",
    "stream_static_join_segments",
    "stream_stream_view_purchase",
    "stream_stream_outer_attribution",
    "stream_tumbling_daily",
    "stream_user_lifetime_stats",
    "stream_upsert_snapshot",
    "stream_dedup_incremental",
    "stream_cms_maintained",
    "stream_bitmap_users_rollup",
    "stream_histogram_rollup",
)


def _cost_ordered(items: dict) -> dict:
    head = {n: items[n] for n in _UNSEEN_FIRST if n in items}
    tail = {n: items[n] for n in _COSTLY_LAST if n in items and n not in head}
    mid = {n: v for n, v in items.items() if n not in head and n not in tail}
    return {**head, **mid, **tail}


QUERIES = _cost_ordered(REGISTRY.queries)
ORACLES = _cost_ordered(REGISTRY.oracles)
