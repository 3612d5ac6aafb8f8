"""The named query catalog — single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 (and the training-data-pipeline
extensions) is registered here as a :class:`QuerySpec`:

- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
- ``oracle`` — an equivalent DuckDB SQL string over the same parquet tables
  (views pre-registered by the driver), or ``None`` for ops that are not
  SQL-expressible (the driver then records a weaker rows-only check).

``__spark_entry__.py`` re-exports this registry verbatim; ``bench.py`` runs
the ``headline`` subset; ``tests/test_oracle_parity.py`` replays the
driver's compare locally at sf0.001.

Output-normalization convention (keeps the order-insensitive value-hash
compare engine-neutral): every final projection rounds doubles, casts
integral aggregates to BIGINT, renders timestamps as strings, and joins
arrays to strings — on BOTH sides, from shared helpers below.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    doc: str = ""
    headline: bool = False
    survey_ids: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}

_QUERY_MODULES = [
    "project_bigdata_spark.plans.medallion_queries",
    "project_bigdata_spark.plans.analytics_queries",
    "project_bigdata_spark.plans.aqi_queries",
    "project_bigdata_spark.plans.relational_queries",
    "project_bigdata_spark.plans.relational_queries2",
    "project_bigdata_spark.plans.relational_queries3",
    "project_bigdata_spark.plans.relational_queries4",
    "project_bigdata_spark.plans.feature_queries",
    "project_bigdata_spark.plans.dedup_queries",
    "project_bigdata_spark.plans.similarity_queries",
    "project_bigdata_spark.plans.text_queries",
    "project_bigdata_spark.plans.corpus_queries",
    "project_bigdata_spark.plans.corpus_queries2",
    "project_bigdata_spark.plans.layout_queries",
    "project_bigdata_spark.plans.warehouse_queries",
    "project_bigdata_spark.plans.behavior_queries",
    "project_bigdata_spark.plans.ml_queries",
    "project_bigdata_spark.plans.io_queries",
    "project_bigdata_spark.plans.streaming_queries",
    "project_bigdata_spark.plans.profiling_queries",
    "project_bigdata_spark.plans.curation_queries",
    "project_bigdata_spark.plans.stats_queries",
    "project_bigdata_spark.plans.eval_queries",
    "project_bigdata_spark.plans.web_queries",
]


def query(
    name: str,
    oracle: str | None,
    doc: str = "",
    headline: bool = False,
    survey_ids: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator registering a catalog query."""

    def wrap(fn: Builder) -> Builder:
        if name in QUERIES:  # a silent overwrite would hide an operator
            raise ValueError(f"duplicate catalog query name: {name!r}")
        QUERIES[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or "").strip(),
            headline=headline,
            survey_ids=survey_ids,
        )
        return fn

    return wrap


# The driver attests only the first 50 ``queries()`` entries per round, so
# catalog order is the attestation schedule. Rounds 1-7 attested all 320
# then-registered entries across seven disjoint windows (CORRECTNESS_r01
# ∪ ... ∪ r07), all green at latest status.
# tests/test_sql_catalog.py enforces freshness: while entries without a
# GREEN driver row exist, the window must be spent on them (a RED row
# counts as needing attestation, so re-attesting repaired entries
# satisfies the invariant rather than violating it).
_ATTESTATION_PRIORITY = [
    # ==== ROUND-11 WINDOW (positions 1-50), per the round-10 verdict
    # asks #1/#4/#6: the 1 round-11 addition (the A9 observe()
    # promotion), then the 4 entries whose RESULTS changed this round
    # (the content-keyed terminal-punctuation seed flows through all
    # three line-tier entries; pii_redaction_apply's anchored patterns
    # change chars_removed/md5), then the rotation the verdict
    # prescribed: ALL 24 remaining r2-vintage entries + the first 21
    # (alphabetical) of the 48 r3-vintage entries — retiring the
    # oldest-attestation tail (r2 count -> 0, r3 tail -> 27 <= 32). ====
    # -- round-11 addition (never attested) ------------------------------
    "observe_layer_counts",
    # -- round-11 re-planned entries (results changed after last green) --
    "line_quality_stats",
    "line_dedup_apply",
    "line_gate_filter",
    "pii_redaction_apply",
    # -- r2-vintage rotation probes (ALL 24 remaining) -------------------
    "minhash_near_dups",
    "minhash_signatures",
    "multimodal_decode",
    "q11_important_parts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_bulk_suppliers",
    "q21_sole_returner",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q7_nation_pair_revenue",
    "q8_market_share",
    "q9_nation_profit",
    "quality_scores",
    "ranking_suite",
    "rolling_features",
    "rollup_order_stats",
    "set_ops",
    "text_to_embedding",
    "time_features",
    "time_split_counts",
    "token_stats",
    # -- r3-vintage rotation probes (alphabetical first 21 of 48) --------
    "approx_distinct_audit",
    "asof_tolerance_join",
    "bigram_logprob",
    "bloom_dedup_prefilter",
    "bm25_retrieval",
    "boilerplate_ngrams",
    "bpe_pair_counts",
    "contamination_check",
    "corpus_composition",
    "corpus_mix",
    "dedup_apply",
    "diversity_sample",
    "embedding_quantize",
    "feature_hashing",
    "feature_scaling",
    "frame_sample",
    "hash_split",
    "incremental_dedup",
    "inverted_index",
    "knn_batch",
    "knn_quantized",
    # -- behind the window: prior rounds' order preserved --------------
    # (round-10 window first, then the r1/r2 rotation it displaced)
    "stream_stream_full_outer_attested",
    "udtf_trigram_spans",
    "gbm_depth2_trees",
    "aqi_recommendation_rollup",
    "stream_stream_outer_attested",
    "connected_components_minlabel",
    "neyman_allocation",
    "cohens_d_effect",
    "q12_shipmode_priority",
    "q14_promo_share",
    "q18_large_orders",
    "q19_bracketed_revenue",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "scalar_misc",
    "semi_join_customers",
    "stratified_sample",
    "time_bucketed_counts",
    "top3_per_group",
    "top_k_latest",
    "union_distinct_keys",
    "value_histogram",
    "value_outliers",
    "weekly_retention",
    "ann_lsh_buckets",
    "ann_lsh_query",
    "asof_join_events",
    "chunk_embed_search",
    "cube_lineitem_flags",
    "curation_pipeline",
    "dedup_bow_fingerprint",
    "dedup_clusters",
    "dedup_exact",
    "doc_chunks",
    "doc_fingerprints",
    "embedding_norms",
    "feature_frame",
    "gap_fill_ffill",
    "gap_fill_hourly",
    "ivf_assign",
    "ivf_search",
    "knn_brute_force",
    "label_encode",
    "lang_id_confusion",
    "url_canonicalize",
    "domain_share_stats",
    "domain_blocklist_filter",
    "url_exact_dedup",
    "repetition_dedup_apply",
    "kruskal_wallis_value",
    "cramers_v_effect",
    "brown_forsythe_variance",
    "isotonic_calibration",
    "compression_codec_roundtrip",
    "textrank_keywords",
    "wilcoxon_signed_rank",
    "fleiss_kappa_gates",
    "label_cosine_matrix",
    "kfold_assignment",
    "jensen_shannon_sources",
    "randomization_test_diff",
    "nelson_aalen_hazard",
    "log_rank_test",
    "benjamini_hochberg_pairs",
    "ams_f2_audit",
    "block_jackknife_variance",
    "streaming_availablenow_attested",
    "err_eval",
    "mcnemar_filter_agreement",
    "cochran_q_gates",
    "lagged_crosscorr",
    "embedding_isotropy",
    "deterministic_sample",
    "distinct_entities",
    "dq_check_suite",
    "dq_conditional_counts",
    "dq_referential_integrity",
    "entity_activity_profile",
    "event_transitions",
    "event_type_distribution",
    "funnel_conversion",
    "gold_unpivot",
    "iso_parsing",
    "latest_per_entity",
    "layer_stats",
    "null_fill",
    "orders_lag_lead",
    "orders_running_total",
    "pivot_type_avg",
    "q10_top_customers",
    "dsir_resample",
    "bpe_train_merges",
    "anchor_substring_spans",
    "contamination_audit",
    "leakage_safe_split",
    "gopher_quality_gates",
    "tokenizer_fertility",
    "mrr_map_eval",
    "query_likelihood_retrieval",
    "ridge_normal_equations",
    "logistic_gd_classifier",
    "gbm_residual_stumps",
    "word_burstiness",
    "soft_dedup_weights",
    "ccnet_perplexity_buckets",
    "hits_hubs_authorities",
    "clustering_ari_eval",
    "gmm_em_1d",
    "wasserstein_drift",
    "mann_whitney_u",
    "doremi_domain_weights",
    "char_entropy_compression",
    "corpus_self_bleu",
    "hll_intersection",
    "kneser_ney_bigram",
    "svm_hinge_gd",
    "item_cooccurrence_recs",
    "interarrival_fit",
    "user_sequence_anomaly",
    "markov_backtest",
    "brier_decomposition",
    "rbo_rankings",
    "wilson_proportion_ci",
    "hod_uniformity_test",
    "cluster_quality_indices",
    "yule_k_richness",
    "rec_coverage_audit",
    "ngram_jaccard_block",
    "embedding_near_dups",
    "blocking_quality_audit",
    "simhash_hamming_pairs",
    "simhash_fingerprints",
    "anti_join_customers",
    "dataset_profile_5v",
    "date_range_filter",
    "kendall_tau_hourly",
    "pacf_profile",
    "friedman_daily_types",
    "overdispersion_test",
    "ndcg_eval",
    "precision_recall_at_k",
    "roc_curve_points",
    "calibration_bins",
    "jaccard_link_prediction",
    "k_core_decomposition",
    "naive_bayes_eval",
    "matryoshka_truncation_audit",
    "shingle_granularity_curve",
    "csv_malformed_audit",
    "mutual_information_profile",
    "zipf_slope_fit",
    "hll_distinct_audit",
    "chao1_vocab_richness",
    "heaps_law_fit",
    "luhn_pii_audit",
    "readability_scores",
    "temperature_mix_allocation",
    "ann_recall_audit",
    "event_order_inversions",
    "gumbel_topk_sample",
    "winnowing_fingerprints",
    "tfidf_cosine_pairs",
    "kcenter_maximin_init",
    "fellegi_sunter_linkage",
    "semantic_dedup",
    "edit_distance_linkage",
    "recursive_reachability",
    "knn_classifier_eval",
    "poisson_bootstrap_ci",
    "ngram_novelty",
    "wordpiece_apply",
    "bronze_ingest",
    "silver_clean",
    "gold_hourly",
    "gold_cohort_stats",
    "aqi_pm25",
    "aqi_full_pipeline",
    "aqi_category_rollup",
    "q1_pricing_summary",
    "broadcast_dim_join",
    "exact_percentiles",
    "temperature_mix",
    "period_over_period",
    "conversion_ci",
    "gini_concentration",
    "approx_stats",
    "label_propagation",
    "adamic_adar_links",
    "degree_assortativity",
    "modularity_lpa",
    "quality_auc",
    "uncertainty_sampling",
    "benford_audit",
    "cusum_drift",
    "domain_kl_divergence",
    "minhash_containment",
    "margin_bitext_mining",
    "kmeans_lloyd",
    "hilbert_layout",
    "pca_power_iteration",
    "golden_record_survivorship",
    "holt_forecast",
    "theil_sen_trend",
    "mann_kendall_test",
    "sequential_patterns",
    "word_pmi",
    "entropy_rate",
    "runs_test",
    "acf_lags",
    "spearman_hourly",
    "changepoint_best_split",
    "anova_oneway",
    "stl_profile",
    "xcorr_lags",
    "kaplan_meier",
    "retention_cohorts",
    "harmonic_regression",
    "trimmed_stats",
    "hill_tail_index",
    "decision_stump",
    "conformal_intervals",
    "median_polish",
    "forecast_backtest",
    "ljung_box_test",
    "stratified_ate",
    "diff_in_diff",
    "cuped_adjustment",
    "raking_ipf",
    "power_analysis",
    "csv_roundtrip",
    "partitioned_parquet_roundtrip",
    "streaming_hourly_attested",
    "streaming_sliding_attested",
    "stream_static_join_attested",
    "state_merge_audit",
    "hopping_window_counts",
    "streaming_dedup_attested",
    "stream_stream_join_attested",
    "custom_state_stream_attested",
    "streaming_multibatch_attested",
    "streaming_upsert_sink_attested",
    "bucketed_join_roundtrip",
    "partition_upsert_roundtrip",
    "orc_roundtrip",
    "schema_evolution_roundtrip",
    "dynamic_partition_pruning_roundtrip",
    "python_sink_roundtrip",
    "triangle_count",
    "pagerank_parts",
    "variant_shred",
    "sql_udf_pipeline",
    "lateral_topk_orders",
    "xml_pack_unpack",
    "listagg_profile",
    "try_arithmetic_audit",
    "weighted_median_delay",
    "ohlc_bars",
    "interval_overlap_join",
    "ks_drift_by_type",
    "audience_overlap",
    "grouping_sets_profile",
    "pareto_frontier_suppliers",
    "quantile_normalize",
    "mmr_rerank",
    "corr_matrix_lineitem",
    "scd2_point_in_time_join",
    "time_weighted_avg",
    "loo_target_encode",
    "json_pack_unpack",
    "higher_moments",
    "chi_square_independence",
    "welch_ttest",
    "trend_fit",
    "mad_outliers",
    "approx_quantile_audit",
    "unigram_entropy",
    "dup_cluster_histogram",
    "exact_percentile_bands",
    "jsonl_roundtrip",
    "streaming_session_attested",
    "scd2_customer",
    "cdc_state",
    "salted_hourly_agg",
    "salted_join_attested",
    "key_skew_profile",
    "ivfpq_search",
    "hybrid_rrf_search",
    "prf_expanded_search",
    "copurchase_affinity",
    "ship_delay_sla",
    "image_resize_grid",
    "audio_segments",
    "segment_dedup_apply",
    "python_source_stats",
    "source_reputation",
    "ewma_features",
    "embedding_drift",
    "hard_negative_mining",
    "training_prep_audit",
    "mahalanobis_outliers",
    "centroid_classifier_eval",
    "woe_iv_encoding",
    "shard_manifest",
    "epoch_shuffle",
    "global_ids",
    "drift_psi",
    "rfm_segments",
    "session_paths",
    "markov_steady_state",
    "seasonal_anomaly",
    "concurrency_curve",
    "touch_attribution",
    "time_to_conversion",
    "assoc_rules",
    "funnel_depth",
    "distinct_rollup_two_level",
    "rolling_distinct_24h",
    "countmin_audit",
    "equi_depth_histogram",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry,
    ordered so never-attested entries fill the driver's 50-query window."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    ordered = {
        name: QUERIES[name] for name in _ATTESTATION_PRIORITY if name in QUERIES
    }
    for name, spec in QUERIES.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
