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
# order (CORRECTNESS_r01.json == first 50); round 2 leads with everything the
# driver has not yet attested — all LLM-pipeline operators (dedup / ANN /
# text / multimodal), the TPC-H tail, and the feature/window queries — plus
# the repaired ``approx_stats``. Four entries whose operator family already
# has an attested sibling (``knn_batch``, ``lag_lead_features``,
# ``time_range_rolling``, ``multi_granularity_rollup``) wait for round 3.
#
# ROUND 3 TODO: replace this list with the entries still lacking a green row
# after CORRECTNESS_r02 — the four deferred above (``knn_batch``,
# ``lag_lead_features``, ``time_range_rolling``, ``multi_granularity_rollup``)
# plus every query added after the round-2 window was frozen
# (``pii_redact``, ``repetition_scores``, ``contamination_check``,
# ``token_packing``, ``corpus_mix``, ``unigram_logprob``,
# ``quality_quantile_filter``, ``snapshot_diff``, ``incremental_dedup``,
# ``hash_split``, ``dedup_apply``, ``frame_sample``, ``text_normalize``,
# ``embedding_quantize``, ``knn_quantized``, ``top_ngrams``) — then
# backfill with round-1-attested names.
_ATTESTATION_PRIORITY = [
    # M7: dedup family
    "dedup_exact",
    "dedup_bow_fingerprint",
    "minhash_signatures",
    "minhash_near_dups",
    "simhash_fingerprints",
    "ngram_jaccard_block",
    "dedup_clusters",
    # M7: embedding similarity / ANN
    "embedding_norms",
    "knn_brute_force",
    "ann_lsh_buckets",
    "ann_lsh_query",
    "ivf_assign",
    "ivf_search",
    "embedding_near_dups",
    # M7: text analysis + multimodal + capstones
    "token_stats",
    "quality_scores",
    "lang_id_confusion",
    "doc_fingerprints",
    "doc_chunks",
    "multimodal_decode",
    "text_to_embedding",
    "chunk_embed_search",
    "curation_pipeline",
    # repaired in round 2 (scalar quantile columns)
    "approx_stats",
    # TPC-H tail
    "q2_min_cost_supplier",
    "q7_nation_pair_revenue",
    "q8_market_share",
    "q9_nation_profit",
    "q11_important_parts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_bulk_suppliers",
    "q21_sole_returner",
    "q22_idle_customers",
    # feature/window queries
    "time_features",
    "rolling_features",
    "label_encode",
    "time_split_counts",
    "gap_fill_hourly",
    "gap_fill_ffill",
    "asof_join_events",
    "feature_frame",
    # grouping sets / sessionization / range join / set ops / ranking
    "rollup_order_stats",
    "cube_lineitem_flags",
    "sessionize_events",
    "range_join_events",
    "ranking_suite",
    "set_ops",
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
