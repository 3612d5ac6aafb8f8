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
# catalog order is the attestation schedule. Round 1 ran the registration
# order (CORRECTNESS_r01.json == first 50); round 2 led with the LLM-pipeline
# operators + TPC-H tail + feature/window queries. Round 3 leads with the 20
# entries that have never had a driver row (added after the round-2 window
# froze, or deferred then), then the 2 rows that FAILED r2 on the
# TIMESTAMP_NTZ testdata change (now fixed in sources/registry.py), then
# backfills the window with the headline set and conf-sensitive queries so
# the repaired timestamp path is double-attested.
#
# Round-4 window TODO: 26 entries added late in round 3 sit past the
# 50-slot window and are local-parity + sf0.01-contract green only —
# audio_segments, segment_dedup_apply, dup_cluster_histogram,
# unigram_entropy, python_source_stats, ewma_features, scd2_customer,
# cdc_state, mad_outliers, approx_quantile_audit, salted_hourly_agg,
# trend_fit, shard_manifest, image_resize_grid, epoch_shuffle, ivfpq_search, hybrid_rrf_search, prf_expanded_search, drift_psi, higher_moments, chi_square_independence, woe_iv_encoding, rfm_segments, global_ids, session_paths, markov_steady_state, gini_concentration, seasonal_anomaly, concurrency_curve, welch_ttest, touch_attribution, time_to_conversion, state_merge_audit, assoc_rules, funnel_depth, distinct_rollup_two_level, temperature_mix, source_reputation, centroid_classifier_eval, knn_classifier_eval, exact_percentile_bands, csv_roundtrip, jsonl_roundtrip, partitioned_parquet_roundtrip, wordpiece_apply, hopping_window_counts, period_over_period, rolling_distinct_24h, key_skew_profile, embedding_drift, streaming_hourly_attested, streaming_sliding_attested, stream_static_join_attested, salted_join_attested, hard_negative_mining, training_prep_audit, countmin_audit, equi_depth_histogram, mahalanobis_outliers, streaming_session_attested, conversion_ci, copurchase_affinity, ship_delay_sla. Lead the next round's
# priority list with exactly these.
_ATTESTATION_PRIORITY = [
    # never driver-attested: window/rollup family
    "multi_granularity_rollup",
    "lag_lead_features",
    "time_range_rolling",
    # never driver-attested: dedup/corpus lifecycle
    "contamination_check",
    "incremental_dedup",
    "dedup_apply",
    # never driver-attested: similarity / quantization
    "knn_batch",
    "embedding_quantize",
    "knn_quantized",
    # never driver-attested: text / corpus ops
    "pii_redact",
    "repetition_scores",
    "token_packing",
    "corpus_mix",
    "frame_sample",
    "unigram_logprob",
    "quality_quantile_filter",
    "snapshot_diff",
    "hash_split",
    "text_normalize",
    "top_ngrams",
    # FAILED r2 on TIMESTAMP_NTZ; re-attest post-fix
    "sessionize_events",
    "range_join_events",
    # new this round, no driver row yet
    "repeated_ngram_spans",
    "semantic_dedup",
    "bloom_dedup_prefilter",
    "diversity_sample",
    "bigram_logprob",
    "zorder_events",
    "pq_encode",
    "pq_search",
    "inverted_index",
    "tfidf_top_terms",
    "bm25_retrieval",
    "minhash_error_eval",
    "random_projection",
    # new this session (corpus_queries2), no driver row yet
    "segment_dedup",
    "boilerplate_ngrams",
    "corpus_composition",
    "vocab_coverage",
    "length_bucket_stats",
    "stratified_fixed_n",
    "feature_scaling",
    "asof_tolerance_join",
    "session_window_native",
    "edit_distance_linkage",
    "approx_distinct_audit",
    "weighted_sample",
    "value_hour_correlation",
    "feature_hashing",
    "bpe_pair_counts",
    # (backfill slots consumed by this round's 27 new entries; every
    # displaced headliner already carries green r1 AND r2 driver rows
    # plus per-round bench timings)
    # backfill: other timestamp-path queries (same NTZ blast radius)
    "time_features",
    "time_split_counts",
    "gap_fill_hourly",
    "gap_fill_ffill",
    "iso_parsing",
    "date_range_filter",
    "time_bucketed_counts",
    "latest_per_entity",
    "orders_lag_lead",
    # (dedup_exact/minhash_signatures/dedup_clusters backfills were
    # displaced by the three round-3 additions above — all already carry
    # green rows in r1 and/or r2)
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
