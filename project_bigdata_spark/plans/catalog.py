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
# catalog order is the attestation schedule. Rounds 1-3 attested 147 of the
# 210 entries (CORRECTNESS_r01 ∪ r02 ∪ r03 — disjoint windows). Round 4's
# window below holds exactly the 50 highest-priority entries of the 63 that
# have NEVER had a driver row (all added in round 3, all local-parity green):
# SURVEY-§2-relevant IO roundtrips and streaming attestations first, then
# warehouse/SCD2/CDC, skew handling, the retrieval stack, and the remaining
# feature/behavioral analytics.
#
# ROUND-5 WINDOW (47 entries, positions 51-97): the 13-entry round-3
# overflow (63 > 50; deliberately the least-risky scalar readouts) at
# positions 51-63, then the 34 operators ADDED in round 4 (positions
# 64-97; each sf0.01-differential green + semantic-invariant tested this
# round). 47 < 50, so round 5's window attests every one of them and
# backfills ~3 slots with already-green entries — backfill preference:
# the headline set, so timings and attestation stay paired. Round 4 is
# the LAST round that may add entries without staging: the round-5
# window is now nearly full.
# tests/test_sql_catalog.py enforces freshness: while never-attested
# entries exist, the first 50 of load_all() must be (almost) all
# never-attested.
_ATTESTATION_PRIORITY = [
    # -- round-4 window, positions 1-50: never driver-attested ---------
    # IO sink/scan roundtrips (SURVEY S6/S7/S10)
    "csv_roundtrip",
    "jsonl_roundtrip",
    "partitioned_parquet_roundtrip",
    # streaming attestations (T1/T2/T4 — real readStream vs batch SQL)
    "streaming_hourly_attested",
    "streaming_sliding_attested",
    "stream_static_join_attested",
    "streaming_session_attested",
    # warehouse: SCD2 / CDC / state-merge
    "scd2_customer",
    "cdc_state",
    "state_merge_audit",
    # skew handling
    "salted_hourly_agg",
    "salted_join_attested",
    "key_skew_profile",
    # retrieval stack
    "ivfpq_search",
    "hybrid_rrf_search",
    "prf_expanded_search",
    # relational analytics
    "copurchase_affinity",
    "ship_delay_sla",
    # multimodal
    "image_resize_grid",
    "audio_segments",
    # text / corpus
    "wordpiece_apply",
    "segment_dedup_apply",
    "python_source_stats",
    "source_reputation",
    # features / ML evaluation
    "ewma_features",
    "embedding_drift",
    "hard_negative_mining",
    "training_prep_audit",
    "mahalanobis_outliers",
    "centroid_classifier_eval",
    "knn_classifier_eval",
    "woe_iv_encoding",
    # publishing / layout
    "shard_manifest",
    "epoch_shuffle",
    "global_ids",
    # behavioral analytics
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
    # remaining analytics
    "distinct_rollup_two_level",
    "hopping_window_counts",
    "rolling_distinct_24h",
    "countmin_audit",
    "equi_depth_histogram",
    # -- round-5 window, positions 51-63: the staged overflow ----------
    "conversion_ci",
    "gini_concentration",
    "higher_moments",
    "chi_square_independence",
    "welch_ttest",
    "trend_fit",
    "mad_outliers",
    "approx_quantile_audit",
    "unigram_entropy",
    "dup_cluster_histogram",
    "exact_percentile_bands",
    "period_over_period",
    "temperature_mix",
    # -- round-4 additions: queue behind the round-5 overflow ----------
    "weighted_median_delay",
    "ohlc_bars",
    "interval_overlap_join",
    "ks_drift_by_type",
    "audience_overlap",
    "streaming_dedup_attested",
    "bucketed_join_roundtrip",
    "partition_upsert_roundtrip",
    "grouping_sets_profile",
    "pareto_frontier_suppliers",
    "streaming_upsert_sink_attested",
    "quantile_normalize",
    "mmr_rerank",
    "corr_matrix_lineitem",
    "schema_evolution_roundtrip",
    "streaming_multibatch_attested",
    "scd2_point_in_time_join",
    "orc_roundtrip",
    "time_weighted_avg",
    "loo_target_encode",
    "json_pack_unpack",
    "dynamic_partition_pruning_roundtrip",
    "stream_stream_join_attested",
    "custom_state_stream_attested",
    "python_sink_roundtrip",
    "triangle_count",
    "pagerank_parts",
    "variant_shred",
    "recursive_reachability",
    "sql_udf_pipeline",
    "lateral_topk_orders",
    "xml_pack_unpack",
    "listagg_profile",
    "try_arithmetic_audit",
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
