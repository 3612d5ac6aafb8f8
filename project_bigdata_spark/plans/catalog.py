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


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    return QUERIES
