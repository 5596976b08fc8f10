"""Physical-plan anti-pattern audit over every registered batch query.

Flags the node types that kill 100 TB plans when they appear
unreviewed:

  * CartesianProduct / BroadcastNestedLoopJoin — non-equi joins that
    scale as |A|x|B|. Legit only when one side is provably tiny
    (allowlisted per query with the reason).
  * BatchEvalPython — row-at-a-time Python UDF (the slow path; this
    repo's contract is Arrow-vectorized Python only).
  * Exchange SinglePartition feeding a Window — a global window
    funnels the whole input through one task (the class of the old
    shuffle_docs_deterministic defect). Single-partition exchanges
    that feed 1-row global AGGREGATES are fine and not flagged.

Text-plan caveats: AQE/cached subtrees repeat text, so this audit is
"open the plan on finding", not "bug on finding" — same contract as
scan_audit.py. Allowlist entries each carry the review verdict.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from movie_rankings_spark.caching import release_persisted  # noqa: E402
from movie_rankings_spark.plans import all_queries  # noqa: E402
from movie_rankings_spark.session import get_spark  # noqa: E402

#: queries whose plan BUILD executes driver-loop jobs (skip: slow)
EXECUTING = {"bpe_train_merges", "logreg_train_quality", "tokenizer_encode_bpe"}

#: reviewed nested-loop / cartesian shapes — each joins a provably
#: tiny side (collected scalar, |labels| rows, |groups| thresholds)
NESTED_LOOP_LEGIT = {
    "join_size_cms_events",  # 1-row exact size x 1-row sketch estimate (r5)
    "anova_price_returnflag",  # |groups|-row table x 1-row totals (r6)
    "kruskal_doclen_source",  # bounded distinct-value grid theta join + 1-row totals (r6)
    "kendall_qty_shipdelay",  # |X|x|Y| cell-table theta self-join, domain-bounded (r6)
    "dedup_embedding_lsh",  # 1-row exact-pair count x 1-row LSH count (r6 recall gate)
    "survival_customer_km",  # 1-row horizon-date scalar vs per-customer table (r6)
    "target_encode_segment_loo",  # 1-row global-mean scalar vs encode join-back (r6)
    "nb_train_lang_model",  # 1-row vocab/doc-total scalars + |vocab|-row grid expansion (r6)
    "seqmine_event_triples",  # 1-row total-sequence scalar vs |types|^3 support rows (r6)
    "conformal_interval_price",  # 1-row conformal-quantile scalar vs test rows (r6)
    "welch_price_priority",  # 1-row moment vector (r6)
    "runs_daily_revenue",  # date-bounded daily table x 1-row total (r7)
    "binseg_changepoint_revenue",  # date-bounded daily prefix/rank windows x 1-row totals (r7)
    "seasonal_decompose_revenue",  # date-bounded daily MA window; 7-row position map broadcast (r7)
    "grubbs_daily_revenue",  # daily table x 1-row moment frame (r7)
    "friedman_price_month_priority",  # |treatments|-row sums x 1-row totals (r7)
    "dw_trend_daily_revenue",  # daily table x 1-row OLS-fit scalars (r7)
    "inclusion_deps_tpch",  # per-pair 1-row count x 1-row dangling count (r7)
    "pmi_collocations_docs",  # scored bigrams x 1-row corpus totals (r7)
    "nb_score_docs",  # model grid construction: bounded vocab x classes (r7)
    "mk_trend_daily_revenue",  # date-bounded daily theta self-join + 1-row ties (r7)
    "jt_priority_linecount",  # |groups|x|V| cell-table theta join + 1-row marginals (r7)
    "concentration_supplier_revenue",  # per-key share table x 1-row totals (r7)
    "mood_median_doclen_source",  # bounded cells x 1-row median/total scalars (r7)
    "hellinger_qty_returnflag",  # bounded value cells x 1-row totals (r7)
    "bartlett_doclen_source",  # |groups| variance rows x 1-row pooled scalars (r7)
    "survival_nelson_aalen",  # 1-row horizon scalar x per-customer table; duration-bounded windows (r7)
    "periodogram_daily_revenue",  # 1-row N/S totals x bounded daily/angle tables (r7)
    "assortativity_copurchase",  # 1-row node-count scalar x 1-row moment row (r7)
    "ordinal_gamma_qty_discount",  # bounded |X|x|Y| cell theta join x 1-row marginals (r7)
    "uncertainty_priority_segment",  # bounded cells x 1-row entropy/MI scalars (r7)
    "hurst_daily_revenue",  # 1-row N scalar x bounded daily; 4-row fit scalar (r7)
    "yuen_trimmed_doclen",  # bounded length cells x 1-row side totals (r7)
    "retrieval_ql_dirichlet",  # 1-row corpus scalar x |q|-term stats; candidate grid (r7)
    "rbo_bm25_vs_ql",  # two bounded top-10 rankings x 10-row depth grid + 1-row rbo scalar (r7)
    "burrows_delta_sources",  # bounded top-N vocab x group grid; 1-row scalars (r7)
    "good_turing_vocab",  # bounded count-of-counts x 1-row totals (r7)
    "kneser_ney_source_scores",  # bounded model tiers x 1-row continuation total (r7)
    "ndcg_ql_ranking",  # 10-row ranking x 1-row dcg/idcg scalars (r7)
    "survival_logrank_segment",  # 1-row horizon + 2-row group grid broadcasts; duration-bounded windows (r7)
    "cramersv_priority_segment",  # 1-row grand total / levels / chi2 scalars (r7)
    "fleiss_quality_raters",  # 1-row moment x 1-row chance-agreement scalars (r7)
    "q11_important_parts",  # 1-row global threshold vs group sums
    "q22_global_sales_opportunity",  # 1-row avg-balance scalar
    "percentiles_lineitem_price",  # interpolation bounds vs 1-row
    "udaf_price_median",  # same shape through the UDAF
    "approx_percentiles_price",
    "histogram_totalprice",  # 1-row min/max bounds broadcast
    "histogram_equidepth_price",  # 1-row quantile boundary array
    "quantile_normalize_price",  # 1-row bucket-bound array
    "corr_price_quantity",  # 1-row moment vector
    "regression_monthly_trend",
    "winsorized_mean_price",
    "robust_outliers_mad",
    "chi2_lang_source",  # 1-row totals vs contingency cells
    "drift_train_val_js",
    "quality_filtered_docs",  # 1-row percentile threshold
    "quality_filtered_per_lang",  # |langs|-row thresholds
    "text_lm_score",
    "pipeline_curated_chunks",
    "mix_corpus_token_budget",  # |langs|-row rate table
    "mix_temperature_sampling",  # |langs|-row rate table (n_min scalar)
    "text_top_terms",  # 1-row doc-count
    "vocab_heavy_hitters",  # 1-row n/k threshold
    "centroid_similarity_labels",  # |labels| x |labels| prototype join
    "cube_lineitem_flags",  # grand-total row against 1-row
    "decay_user_activity",  # 1-row reference-time scalar
    "curriculum_order_docs",  # 1-row quantile boundary array
    "split_train_val_test",  # 3-row ratio table
    "sample_docs_weighted",  # 1-row total-weight scalar
    "embedding_covariance",  # 1-row mean vector
    "embedding_pca_project",  # d x d covariance against 1-row
    "anomaly_events_zscore",  # 1-row global moments
    "audit_orders_quality",  # 1-row expectation summary vs bounds
    "decontaminate_report",  # 1-row corpus size
    "decontaminate_bloom_gate",  # 1-row bloom bit array
    "cms_word_frequency",  # d x w cells vs 1-row probe list
    "skew_profile_join_keys",  # per-key 1-row profiles unioned
    "dedup_semantic_clusters",  # centroid table vs 1-row stats
    "similarity_ivf_kmeans_topk",  # centroid refresh scalars
    "stream_cms_maintained",  # cells vs 1-row version pointer
    "stream_bitmap_users_rollup",
    "q20_heavy_red_shippers",  # qty > 1-row aggregated threshold
    "collocations_lift",  # 1-row corpus totals vs bigram counts
    "similarity_tfidf_topk",  # 1-row idf normalizer / query slice
    "triangles_copurchase",  # 1-row totals cross joins
    "basket_association_rules",  # 1-row basket count vs rules
    "knn_label_propagation",  # documented exact kNN: 1/97 holdout x corpus
    "classifier_auc_eval",  # theta join of the BOUNDED logit histogram
    "active_users_rolling",  # day x bucket grid densify (bounded)
    "similarity_mmr_topk",  # bounded query set vs pool
    "retrieval_eval_prefix",  # bounded 8-query broadcast sides x2 + 1-row scalars (r8)
    "similarity_ivf_exact_topk",  # broadcast 32-centroid codebook + 8-query probe sides (documented exact IVF tier, r8)
    "sink_sorted_write_roundtrip",  # 8-row file-span self-join + 1-row audit scalars cross-joined (r8)
    "interchange_files_roundtrip",  # 1-row per-format audit aggregates cross-joined (r8)
    "dedup_embedding_cosine",  # documented exact verifier tier (scale path: dedup_embedding_lsh)
    "similarity_cosine_topk",  # broadcast 8-query side (documented exact tier)
    "matryoshka_prefix_recall",  # broadcast 8-query sides x2 + 1-row mean scalar (r7)
    "search_bm25_topk",  # 1-row corpus stats onto the |terms|-row weight table
    "dsir_importance_topk",  # 1-row totals onto the vocab table
    "split_time_embargo",  # 1-row cut scalar broadcast onto the fact
    "seasonality_monthly_index",  # 1-row grand mean onto 12 month cells
    "sample_neyman_allocation",  # 1-row N_h*sigma_h total onto |langs| strata
    "rfm_customer_segments",  # 1-row median-threshold vector onto customers
    "pps_sample_orders",  # 1-row total-weight scalar onto the fact (r4)
    "classifier_roc_curve",  # theta join of the BOUNDED logit histogram (AUC shape, r4)
    "corpus_heaps_law",  # 1-row OLS fit broadcast onto |sources| rows (r4)
    "hll_audience_overlap",  # |groups| x |groups| pair enumeration over the bounded group list (r4)
    "mi_lang_source",  # 1-row grand total onto |langs|*|sources| cells (chi2 shape, r5)
    "coverage_topdoc_chars",  # theta join of the BOUNDED length histogram (ROC shape, r5)
    "benford_totalprice",  # 1-row total onto the <=9-digit frame (r5)
    "acf_daily_revenue",  # 14-row lag frame onto the bounded daily series (r5)
    "changepoint_daily_revenue",  # 1-row totals onto the bounded daily series (r5)
    "search_hybrid_rrf",  # 1-query broadcast in the cosine arm + 1-row corpus stats in the BM25 arm (r5)
    "drift_train_val_psi",  # 1-row totals onto the 10-bin frame (r5)
    "embedding_jl_rademacher",  # 16-row sign table broadcast onto the vectors (JIT-able per-row fold) (r5)
    "ks_source_length_profiles",  # theta join of the BOUNDED length grid (ROC shape) + 1-row total (r5)
    "isotonic_price_status",  # prefix/minimax theta joins over the <=20-row BIN grid (r6)
    "brown_forsythe_price_priority",  # anova 1-row totals cross join (|groups|=5 table) (r6)
    "attribution_shapley_channels",  # 16-row subset-grid bitmask theta joins + 1-row total (r6)
    "ccf_views_purchases",  # 15-row lag frame onto the date-domain-bounded daily series (acf shape) (r6)
    "ks_sweep_fdr_sources",  # ks-sweep grid (allowlisted shape) + |groups|^2 BH rank/run-min theta self-joins + 50-row k-grid (r6)
    "markov_steady_state_sessions",  # 1-row folded pi vector cross-joined onto the 5-row state list + 1-row total (r6)
    "group_percentiles_priority",  # 5-row quantile-fraction frame cross-joined onto the per-group cell table (r6)
    "dunn_posthoc_doclen",  # kruskal's bounded distinct-value grid theta join + |groups|^2 pair self-join + 1-row ties (r6)
}

#: row-at-a-time Python allowed ONLY for the literal Spark-4 @udtf
#: demonstration front-end (the UDTF API is row-based by design; the
#: production form is flagship_scraped's Arrow mapInPandas)
ROW_PYTHON_LEGIT = {"flagship_scraped_udtf"}

#: reviewed single-partition-into-window shapes (tiny inputs)
GLOBAL_WINDOW_LEGIT = {
    "vocab_top_words",  # top-k already reduced to k rows
    "vocab_top_bigrams",
    "bpe_pair_counts",
    "session_paths_top",  # k path rows
    "collocations_lift",  # k collocation rows
    "basket_association_rules",  # k rule rows
    "histogram_equidepth_price",  # b boundary rows
    "session_transition_matrix",  # |types|^2 rows
    "classifier_auc_eval",  # bounded logit histogram
    "classifier_calibration_bins",
    "knn_label_propagation",  # holdout votes (bounded query set)
    "retrieval_eval_prefix",
    "similarity_mmr_topk",
    "corpus_zipf_slope",  # rank window over the top-k (100-row) histogram (r4)
    "changepoint_daily_revenue",  # prefix window over the date-domain-bounded daily series (r5)
    "forecast_backtest_daily",  # LAG window over the date-domain-bounded daily series (r6)
}


def audit_plan(name: str, plan: str) -> list[str]:
    flags: list[str] = []
    if "CartesianProduct" in plan and name not in NESTED_LOOP_LEGIT:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_LEGIT:
        flags.append("BroadcastNestedLoopJoin")
    if "BatchEvalPython" in plan and name not in ROW_PYTHON_LEGIT:
        flags.append("BatchEvalPython(row-at-a-time UDF)")
    if name not in GLOBAL_WINDOW_LEGIT:
        # SinglePartition exchange CONSUMED by a Window: in tree text
        # the consumer is the nearest ancestor line, i.e. the closest
        # PREVIOUS line with a shallower node marker (":-"/"+-").
        lines = plan.splitlines()

        def depth(line: str) -> int:
            m = re.search(r"[:+]-", line)
            return m.start() if m else -1

        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            d = depth(line)
            for j in range(i - 1, -1, -1):
                dj = depth(lines[j])
                if dj != -1 and dj < d:
                    if re.search(r"\bWindow\b", lines[j]):
                        flags.append("SinglePartition->Window")
                    break
            if "SinglePartition->Window" in flags:
                break
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or [
        n
        for n in all_queries.QUERIES
        if not n.startswith("stream_") and n not in EXECUTING
    ]
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    findings = 0
    for name in names:
        try:
            df = all_queries.QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            print(f"ERR   {name}: {str(ex)[:80]}")
            findings += 1
            continue
        finally:
            # per-query isolation: a fragment persisted by an earlier
            # query otherwise rewrites a LATER query's plan via the
            # shared CacheManager (see scan_audit for the scan-count
            # version of the same pollution)
            release_persisted()
        flags = audit_plan(name, plan)
        if flags:
            findings += 1
            print(f"FLAG  {name}: {', '.join(flags)}")
    print(f"{findings} findings / {len(names)} queries audited")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
