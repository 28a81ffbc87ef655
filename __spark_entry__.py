"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query DataFrame at sf0.001
queries()      -> {name: fn(spark, sf_dir) -> DataFrame} per SURVEY §2
oracle_sql()   -> {name: DuckDB-runnable ANSI SQL} for value-hash compare

Query implementations live in biosets_spark/queries.py (relational
inventory) and biosets_spark/queries_ext.py (dedup / similarity / text
/ events extensions); this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from biosets_spark import queries as _q  # noqa: E402
from biosets_spark import queries_ext  # noqa: E402,F401  (registers extension queries)
from biosets_spark import queries_more  # noqa: E402,F401  (registers second-wave queries)
from biosets_spark import queries_wave3  # noqa: E402,F401
from biosets_spark import queries_wave4  # noqa: E402,F401
from biosets_spark import queries_wave5  # noqa: E402,F401
from biosets_spark import queries_wave6  # noqa: E402,F401
from biosets_spark import queries_wave7  # noqa: E402,F401
from biosets_spark import queries_wave8  # noqa: E402,F401
from biosets_spark import queries_wave9  # noqa: E402,F401
from biosets_spark import queries_wave10  # noqa: E402,F401
from biosets_spark import queries_wave11  # noqa: E402,F401
from biosets_spark import queries_wave12  # noqa: E402,F401
from biosets_spark import queries_wave13  # noqa: E402,F401
from biosets_spark import queries_wave14  # noqa: E402,F401
from biosets_spark import queries_wave15  # noqa: E402,F401
from biosets_spark import queries_wave16  # noqa: E402,F401
from biosets_spark import queries_wave17  # noqa: E402,F401
from biosets_spark import queries_wave18  # noqa: E402,F401
from biosets_spark import queries_wave19  # noqa: E402,F401
from biosets_spark import queries_wave20  # noqa: E402,F401
from biosets_spark import queries_wave21  # noqa: E402,F401
from biosets_spark import queries_wave22  # noqa: E402,F401
from biosets_spark import queries_wave23  # noqa: E402,F401
from biosets_spark import queries_wave24  # noqa: E402,F401
from biosets_spark import queries_wave25  # noqa: E402,F401
from biosets_spark import queries_wave26  # noqa: E402,F401
from biosets_spark import queries_wave27  # noqa: E402,F401
from biosets_spark import queries_wave28  # noqa: E402,F401
from biosets_spark import queries_wave29  # noqa: E402,F401
from biosets_spark import queries_wave30  # noqa: E402,F401
from biosets_spark import queries_wave31  # noqa: E402,F401
from biosets_spark import queries_wave32  # noqa: E402,F401
from biosets_spark import queries_wave33  # noqa: E402,F401
from biosets_spark import queries_wave34  # noqa: E402,F401
from biosets_spark import queries_wave35  # noqa: E402,F401
from biosets_spark import queries_wave36  # noqa: E402,F401
from biosets_spark import queries_wave37  # noqa: E402,F401
from biosets_spark import queries_wave38  # noqa: E402,F401
from biosets_spark import queries_wave39  # noqa: E402,F401
from biosets_spark import queries_wave40  # noqa: E402,F401
from biosets_spark import queries_wave41  # noqa: E402,F401
from biosets_spark import queries_wave42  # noqa: E402,F401
from biosets_spark import queries_wave43  # noqa: E402,F401
from biosets_spark import queries_wave44  # noqa: E402,F401
from biosets_spark import queries_wave45  # noqa: E402,F401
from biosets_spark import queries_wave46  # noqa: E402,F401
from biosets_spark import queries_wave47  # noqa: E402,F401
from biosets_spark import queries_wave48  # noqa: E402,F401
from biosets_spark import queries_wave49  # noqa: E402,F401
from biosets_spark import queries_wave50  # noqa: E402,F401
from biosets_spark import queries_wave51  # noqa: E402,F401
from biosets_spark import queries_wave52  # noqa: E402,F401
from biosets_spark import queries_wave53  # noqa: E402,F401
from biosets_spark import queries_wave54  # noqa: E402,F401
from biosets_spark import queries_wave55  # noqa: E402,F401
from biosets_spark import queries_wave56  # noqa: E402,F401
from biosets_spark import queries_wave57  # noqa: E402,F401
from biosets_spark import queries_wave58  # noqa: E402,F401
from biosets_spark import queries_wave59  # noqa: E402,F401
from biosets_spark import queries_wave60  # noqa: E402,F401
from biosets_spark import queries_wave61  # noqa: E402,F401
from biosets_spark import queries_wave62  # noqa: E402,F401
from biosets_spark import queries_wave63  # noqa: E402,F401
from biosets_spark import queries_wave64  # noqa: E402,F401
from biosets_spark import queries_wave65  # noqa: E402,F401
from biosets_spark import queries_wave66  # noqa: E402,F401
from biosets_spark import queries_wave67  # noqa: E402,F401
from biosets_spark import queries_wave68  # noqa: E402,F401
from biosets_spark import queries_wave69  # noqa: E402,F401
from biosets_spark import queries_wave70  # noqa: E402,F401
from biosets_spark import queries_wave71  # noqa: E402,F401
from biosets_spark import queries_wave72  # noqa: E402,F401
from biosets_spark import queries_wave73  # noqa: E402,F401
from biosets_spark import queries_wave74  # noqa: E402,F401
from biosets_spark import queries_wave75  # noqa: E402,F401
from biosets_spark import queries_wave76  # noqa: E402,F401
from biosets_spark import queries_wave77  # noqa: E402,F401
from biosets_spark import queries_wave78  # noqa: E402,F401
from biosets_spark import queries_wave79  # noqa: E402,F401
from biosets_spark import queries_wave80  # noqa: E402,F401
from biosets_spark import queries_wave81  # noqa: E402,F401
from biosets_spark import queries_wave82  # noqa: E402,F401
from biosets_spark import queries_wave83  # noqa: E402,F401
from biosets_spark import queries_wave84  # noqa: E402,F401
from biosets_spark import queries_wave85  # noqa: E402,F401
from biosets_spark import queries_wave86  # noqa: E402,F401
from biosets_spark import queries_wave87  # noqa: E402,F401
from biosets_spark import queries_wave88  # noqa: E402,F401
from biosets_spark import queries_wave89  # noqa: E402,F401
from biosets_spark import queries_wave90  # noqa: E402,F401
from biosets_spark import queries_wave91  # noqa: E402,F401
from biosets_spark import queries_wave92  # noqa: E402,F401
from biosets_spark import queries_wave93  # noqa: E402,F401
from biosets_spark import queries_wave94  # noqa: E402,F401
from biosets_spark import queries_wave95  # noqa: E402,F401
from biosets_spark import queries_wave96  # noqa: E402,F401
from biosets_spark import queries_wave97  # noqa: E402,F401
from biosets_spark import queries_wave98  # noqa: E402,F401
from biosets_spark import queries_wave99  # noqa: E402,F401
from biosets_spark.session import apply_session_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the M0 vertical slice —
    metadata-style broadcast join + label encoding + aggregation over
    the star schema (SURVEY §7.1)."""
    apply_session_conf(spark)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast, col, lit

    from biosets_spark import tables
    from biosets_spark.operators import labels as L

    sf_dir = "/root/testdata/sf0.001"
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")

    # enrich orders (data) with customer attributes (sample metadata)
    enriched = o.join(
        broadcast(c.select(col("c_custkey").alias("o_custkey"), "c_mktsegment", "c_nationkey")),
        on="o_custkey", how="left",
    ).join(broadcast(n), col("c_nationkey") == col("n_nationkey"), "left")
    encoded, _ = L.encode_labels(enriched, "c_mktsegment")
    return (
        encoded.groupBy("n_name", "encoded_labels", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .orderBy("n_name", "encoded_labels")
    )


# Current build round (bump each round; drives the defer-age invariant
# in tests/test_registry.py).
_ROUND = 7

# Queries that already have GREEN driver CORRECTNESS rows (r1..r4
# windows — the union of CORRECTNESS_r0{1..4}.json). The driver records
# the first ~50 entries of queries(); registration order below puts
# everything NOT in this set first, so queries that have never had a
# green driver row land inside the recorded window. All queries keep
# their oracles either way.
_DRIVER_CHECKED = frozenset({
    # --- r1/r2 windows ---
    "q_scan_filter_project", "q_cast_project", "q_pricing_summary",
    "q_forecast_revenue", "q_distinct_agg", "q_rollup", "q_cube", "q_quantiles",
    "q_join_agg", "q_top_orders", "q_left_join_histogram", "q_semi_join",
    "q_anti_join", "q_full_outer", "q_meta_left_join", "q_set_intersect",
    "q_set_except", "q_union_promote", "q_window_topk_per_group",
    "q_window_running_sum", "q_window_lag_gap", "q_ntile_kfold",
    "q_string_funcs", "q_date_funcs", "q_math_funcs", "q_json_funcs",
    "q_array_funcs", "q_label_encode", "q_label_binary",
    "q_label_decode_roundtrip", "q_dedup_exact", "q_dedup_fingerprint",
    "q_dedup_ngram_jaccard", "q_dedup_minhash_lsh", "q_dedup_simhash",
    "q_knn_bruteforce", "q_knn_pairs", "q_knn_lsh", "q_text_tokens",
    "q_text_quality", "q_lang_distribution", "q_events_hourly",
    "q_events_sessions", "q_events_dedup_stateful", "q_multimodal_binary",
    "q_knn_ivf", "q_asof_join", "q_cross_join", "q_range_join",
    "q_flatten_struct",
    # --- r3 window (48 green; q_collect_list / q_quantize_embeddings
    # ERR'd on array hashing, now string-serialized — kept OUT so the
    # r4 window records them green) ---
    "q_dedup_ngram_jaccard_bounded", "q_slice_offset", "q_pivot", "q_having",
    "q_grouping_sets", "q_join_renamed_keys", "q_join_multi_key",
    "q_sort_nulls", "q_union_type_promotion", "q_join_salted",
    "q_events_funnel", "q_events_retention", "q_text_langid",
    "q_text_quality_score", "q_text_bpe_tokens", "q_window_first_last",
    "q_events_sliding", "q_grouped_map_normalize", "q_approx_distinct",
    "q_term_doc_freq", "q_dedup_clusters", "q_window_range_frame",
    "q_pipeline_clean_corpus", "q_dedup_embedding", "q_exists_subquery",
    "q_scalar_subquery", "q_not_exists_customers", "q_knn_quantized",
    "q_events_multires", "q_events_gapfill", "q_stratified_sample",
    "q_mix_resample", "q_pack_sequences", "q_top_ngrams", "q_contamination",
    "q_chunk_stats", "q_quality_gopher", "q_text_repetition", "q_text_entropy",
    "q_pii_redact", "q_bm25_topk", "q_volume_shipping", "q_market_share",
    "q_returned_items", "q_promo_effect", "q_large_orders",
    "q_order_priority_check", "q_product_profit",
    # --- r4 window (50/50 green, CORRECTNESS_r04.json) ---
    "q_collect_list", "q_quantize_embeddings", "q_important_suppliers",
    "q_ship_delay_priority", "q_top_supplier", "q_supplier_part_variety",
    "q_disjunctive_filter", "q_excess_parts_suppliers", "q_waiting_suppliers",
    "q_min_cost_supplier", "q_vocab_stats", "q_token_pmi", "q_mix_temperature",
    "q_order_count_distribution", "q_small_quantity_revenue",
    "q_idle_rich_customers", "q_unigram_surprise", "q_script_ratio",
    "q_head_coverage", "q_mann_whitney", "q_shard_assignment",
    "q_cohens_kappa", "q_k_anonymity", "q_l_diversity",
    "q_feature_hash_collisions", "q_partial_correlation",
    "q_hhi_concentration", "q_cohort_ltv", "q_abc_xyz",
    "q_graph_assortativity", "q_powerlaw_alpha", "q_heaps_law",
    "q_word_adaptation", "q_retention_half_life", "q_peak_concurrency",
    "q_power_analysis", "q_odds_ratio", "q_mcnemar_paired",
    "q_threshold_sweep", "q_calibration_bins", "q_stratified_effect",
    "q_anova_oneway", "q_diff_in_diff", "q_capture_recapture", "q_cramers_v",
    "q_round_price_bias", "q_skyline_orders", "q_knee_point",
    "q_control_chart", "q_seasonal_strength",
    # --- r5 window (50/50 green, CORRECTNESS_r05.json) ---
    "q_span_dedup", "q_containment", "q_keep_latest_event",
    "q_sessionize_batch", "q_unpivot_measures", "q_percent_rank",
    "q_corr_exact", "q_length_histogram", "q_levenshtein_brands",
    "q_events_anomaly", "q_winsorize", "q_tfidf_keywords", "q_zipf_slope",
    "q_random_projection", "q_cohort_retention", "q_quick_succession",
    "q_grouping_id", "q_token_fertility", "q_source_quality_matrix",
    "q_dup_rate_by_source", "q_langid_confusion", "q_activity_streaks",
    "q_minhash_estimate_quality", "q_span_dedup_applied",
    "q_incremental_dedup", "q_ann_recall_audit", "q_bigram_surprise",
    "q_cogroup_reconcile", "q_mad_outliers", "q_group_sample",
    "q_approx_quantile_audit", "q_countmin_audit", "q_label_centroids",
    "q_equal_freq_bins", "q_time_weighted_avg", "q_hll_portable_audit",
    "q_rolling_active_users", "q_first_touch_attribution", "q_basket_pairs",
    "q_rfm_segments", "q_event_transitions", "q_revenue_share", "q_yoy_growth",
    "q_weekly_percentiles", "q_ship_latency_histogram", "q_ks_drift",
    "q_psi_drift", "q_chi2_assoc", "q_ewma_daily", "q_weighted_sample",
    # --- r6 window (50/50 green, CORRECTNESS_r06.json) ---
    "q_scd2_pit_join", "q_pagerank_nations", "q_centroid_confusion",
    "q_dup_graph_degree", "q_lift_rules", "q_interval_overlap",
    "q_triangle_count", "q_simjoin_names", "q_bloom_audit",
    "q_column_profile", "q_ngram_novelty", "q_funnel_latency",
    "q_referential_audit", "q_crosslingual_dup", "q_quantile_normalize",
    "q_clr_transform", "q_alpha_diversity", "q_bray_curtis",
    "q_feature_correlation", "q_pca_power", "q_cusum_changepoint",
    "q_sax_symbolize", "q_ab_test_z", "q_survival_km", "q_bootstrap_ci",
    "q_welch_ttest", "q_ols_normal_eq", "q_interval_union",
    "q_weighted_median", "q_gini_revenue", "q_decile_lift",
    "q_autocorrelation", "q_theil_sen", "q_spearman_corr", "q_benford_digits",
    "q_mutual_information", "q_skew_kurtosis", "q_rolling_median",
    "q_zorder_layout", "q_readability", "q_rarefaction", "q_core_prevalence",
    "q_auc_roc", "q_good_turing", "q_session_paths", "q_log2_histogram",
    "q_jackknife_variance", "q_entropy_rate", "q_seasonal_index",
    "q_burstiness",
})


# Never-driver-checked queries that do NOT fit in this round's ~50-row
# window. The backlog (judge-verified green in the full local oracle
# re-run every round) rotates through the driver window at ~50/round:
# round 7's front block is the 50 oldest backlog names (the r6
# defer-list head); the 34 entries below are the tail, scheduled as
# the FIRST 34 rows of the r8 window. Each entry is (name,
# round_re-deferred); the test_registry invariant asserts no entry
# ages more than 2 rounds. Round 7 adds NO new q_* names (wave freeze
# holds until the backlog fully drains) so the backlog goes 84 -> 34.
#
# R8 HANDOFF: after recording CORRECTNESS_r07, (1) add its 50 green
# names to _DRIVER_CHECKED, (2) bump _ROUND to 8, (3) EMPTY this list
# — all 34 remaining names go in front, draining the backlog to zero.
#
# POST-DRAIN RE-VERIFICATION POLICY (pre-committed per the r6
# verdict): r8's window has ~16 spare rows after the 34 never-checked
# names, and every window from r9 on is entirely spare. Spare rows
# re-sample OLDEST-GREEN-FIRST: convert _DRIVER_CHECKED to a
# round-tagged mapping {name: round_last_green} and order spare
# slots by ascending tag (r1/r2 greens first — those rows are six
# rounds of code drift old), re-tagging each name with the round its
# fresh green row lands. A re-sampled name that goes RED is removed
# from _DRIVER_CHECKED until fixed and re-verified. This keeps every
# driver row at most ~6 rounds stale in steady state while never
# displacing a never-checked name, which always outranks re-sampling.
_DEFER_NEXT_WINDOW_TAGGED = (
    ("q_page_trend", 7),
    ("q_cvar_shortfall", 7),
    ("q_fleiss_kappa", 7),
    ("q_icc_reliability", 7),
    ("q_average_precision", 7),
    ("q_ndcg_at_100", 7),
    ("q_cochran_armitage", 7),
    ("q_moods_median", 7),
    ("q_fisher_z_diff", 7),
    ("q_welch_anova", 7),
    ("q_capm_beta", 7),
    ("q_max_drawdown", 7),
    ("q_hurst_exponent", 7),
    ("q_jain_fairness", 7),
    ("q_neyman_allocation", 7),
    ("q_mixture_gap", 7),
    ("q_youden_cutpoint", 7),
    ("q_hosmer_lemeshow", 7),
    ("q_mantel_haenszel", 7),
    ("q_meta_heterogeneity", 7),
    ("q_bonferroni_family", 7),
    ("q_bh_fdr", 7),
    ("q_log_rank_test", 7),
    ("q_rmst", 7),
    ("q_cuped_adjustment", 7),
    ("q_winsor_variance_gain", 7),
    ("q_eb_shrinkage", 7),
    ("q_kish_ess", 7),
    ("q_covariate_balance", 7),
    ("q_e_value", 7),
    ("q_sharpe_revenue", 7),
    ("q_price_dispersion", 7),
    ("q_chao1_richness", 7),
    ("q_doubling_time", 7),
)

_DEFER_NEXT_WINDOW = tuple(n for n, _ in _DEFER_NEXT_WINDOW_TAGGED)


def _ordered_names() -> list[str]:
    names = list(_q.QUERIES)
    defer = [n for n in names if n in _DEFER_NEXT_WINDOW]
    front = [n for n in names if n not in _DRIVER_CHECKED and n not in _DEFER_NEXT_WINDOW]
    return (
        front
        + defer
        + [n for n in names if n in _DRIVER_CHECKED]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for name in _ordered_names():
        query = _q.QUERIES[name]
        def make(fn):
            def wrapped(spark, sf_dir, _fn=fn):
                apply_session_conf(spark)
                return _fn(spark, sf_dir)
            return wrapped
        out[name] = make(query.fn)
    return out


def oracle_sql() -> dict[str, str]:
    return {
        name: _q.QUERIES[name].oracle
        for name in _ordered_names()
        if _q.QUERIES[name].oracle
    }
