"""project_bigdata_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine with the query and data-processing
capabilities of the reference air-quality data-lake pipeline
(HoangTran223/Project_BigData), re-expressed Spark-first:

- ``session``     — SparkSession factory tuned for columnar OLAP at scale.
- ``functions``   — scalar expression library (AQI math, time parts, arrays).
- ``operators``   — composable DataFrame->DataFrame operators: medallion
                    ETL, analytics, joins, window features, dedup,
                    similarity search, text analysis, multimodal plumbing.
- ``sources``     — source/sink registry (parquet, csv, json, kafka-gated).
- ``plans``       — the named query catalog: every operator exposed as a
                    (spark, sf_dir) -> DataFrame builder with a matching
                    DuckDB oracle SQL string for differential testing.
- ``streaming``   — Structured Streaming variant of the medallion pipeline.

Everything is declarative DataFrame/SQL so Catalyst applies predicate
pushdown, column pruning, partition pruning, and whole-stage codegen;
Python UDFs appear only as Arrow-batched pandas UDFs in differential
tests and in the (stubbed) multimodal decode path.
"""

__version__ = "0.1.0"
