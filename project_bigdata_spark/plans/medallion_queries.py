"""Catalog entries for the medallion ETL (SURVEY.md §2.1-2.3, §3.1).

The ``events`` table plays the measurement-fact role (SURVEY.md §1.1):
``(user_id, event_type, ts, value)`` ≙ ``(station, pollutant, datetime,
concentration)``. Each layer is registered as its own query so the driver's
DuckDB oracle pins the exact filter/projection/aggregation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_spark.functions.aqi import aqi_category_sql
from project_bigdata_spark.operators import medallion as M
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table

# Shared CTE text so every layer's oracle is literally built on the previous
# layer's SQL — same single-source-of-truth idea as the Spark side.
BRONZE_CTE = """
bronze AS (
  SELECT event_id, ts, user_id, event_type, value,
         CAST(json_extract_string(props, '$.k') AS INT) AS props_k,
         CAST(year(ts) AS INT) AS year,
         CAST(month(ts) AS INT) AS month,
         CAST(day(ts) AS INT) AS day
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
)"""

SILVER_CTE = (
    BRONZE_CTE
    + """,
silver AS (
  SELECT event_id, ts, user_id, event_type, value, props_k, year, month, day
  FROM bronze
  WHERE value IS NOT NULL AND NOT isnan(value) AND value >= 0
)"""
)

_VC = N.sql_cents("value")
_MVC = N.sql_cents("max_value")

GOLD_CTE = (
    SILVER_CTE
    + f""",
gold AS (
  SELECT user_id,
         date_trunc('hour', ts) AS hour_ts,
         year, month, day,
         max(value) AS max_value,
         CAST(sum({_VC}) AS DOUBLE) / 1e2 / count(*) AS avg_value,
         count(*) AS n_events,
         list(event_type ORDER BY event_type, value) AS event_types,
         list(value ORDER BY event_type, value) AS values
  FROM silver
  GROUP BY user_id, date_trunc('hour', ts), year, month, day
)"""
)


def _bronze(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.bronze(load_table(spark, sf_dir, "events"))


def _bronze_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze over an entity-keyed fan-out of the scan, for the gold-grain
    consumers: hash-partitioning on ``user_id`` (a subset of the gold
    grouping key) replaces the aggregation's own exchange and — being an
    explicit REPARTITION_BY_NUM — is exempt from AQE's small-partition
    coalescing, so the heavy (entity, hour) aggregate runs wide even when
    the input arrives as one parquet split. No-op at scale (enough splits:
    the partial-agg-then-ENSURE exchange shuffles fewer bytes there)."""
    from project_bigdata_spark.operators.dedup import fan_out_by_key

    return M.bronze(fan_out_by_key(load_table(spark, sf_dir, "events"), "user_id"))


@query(
    "bronze_ingest",
    oracle="WITH"
    + BRONZE_CTE
    + """
SELECT CAST(event_id AS BIGINT) AS event_id,
       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
       CAST(user_id AS BIGINT) AS user_id,
       event_type,
       round(value, 4) AS value,
       CAST(props_k AS BIGINT) AS props_k,
       CAST(year AS BIGINT) AS year, CAST(month AS BIGINT) AS month,
       CAST(day AS BIGINT) AS day
FROM bronze""",
    doc="P1/P2/P5/P6: JSON shred + null-gate + partition-col derivation.",
    survey_ids=("P1", "P2", "P5", "P6"),
)
def bronze_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _bronze(spark, sf_dir)
    return b.select(
        N.big("event_id").alias("event_id"),
        N.ts_str("ts", micros=True).alias("ts"),
        N.big("user_id").alias("user_id"),
        "event_type",
        N.rnd("value").alias("value"),
        N.big("props_k").alias("props_k"),
        N.big("year").alias("year"),
        N.big("month").alias("month"),
        N.big("day").alias("day"),
    )


@query(
    "silver_clean",
    oracle="WITH"
    + SILVER_CTE
    + """
SELECT CAST(event_id AS BIGINT) AS event_id,
       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
       CAST(user_id AS BIGINT) AS user_id,
       event_type,
       round(value, 4) AS value,
       CAST(props_k AS BIGINT) AS props_k
FROM silver""",
    doc="P3/P4: validation filter (NOT NULL, >=0, non-NaN) + prune/rename.",
    survey_ids=("P3", "P4"),
)
def silver_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = M.silver(_bronze(spark, sf_dir))
    return s.select(
        N.big("event_id").alias("event_id"),
        N.ts_str("ts", micros=True).alias("ts"),
        N.big("user_id").alias("user_id"),
        "event_type",
        N.rnd("value").alias("value"),
        N.big("props_k").alias("props_k"),
    )


@query(
    "gold_hourly",
    oracle="WITH"
    + GOLD_CTE
    + f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       round(max_value, 4) AS max_value,
       round(avg_value, 4) AS avg_value,
       CAST(n_events AS BIGINT) AS n_events,
       array_to_string(event_types, ',') AS event_types,
       array_to_string(list_transform(values, v -> CAST(round(v, 2) AS VARCHAR)), ',')
         AS values,
       {aqi_category_sql('max_value')} AS category
FROM gold""",
    doc="A1 flagship agg: (entity, hour) grain, deterministic parallel "
    "arrays + map companion, category from max post-agg (fixes §4.3-4/6).",
    headline=True,
    survey_ids=("A1", "P7", "F3"),
)
def gold_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = M.gold_hourly(M.silver(_bronze_keyed(spark, sf_dir)))
    return g.select(
        N.big("user_id").alias("user_id"),
        N.ts_str("hour_ts").alias("hour_ts"),
        N.rnd("max_value").alias("max_value"),
        N.rnd("avg_value").alias("avg_value"),
        N.big("n_events").alias("n_events"),
        N.arr_str("event_types").alias("event_types"),
        F.concat_ws(
            ",", F.transform(F.col("values"), lambda v: F.round(v, 2).cast("string"))
        ).alias("values"),
        "category",
    )


@query(
    "gold_cohort_stats",
    oracle="WITH"
    + GOLD_CTE
    + """
SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
       CAST(count(*) AS BIGINT) AS n_hours,
       round(CAST(sum({mvc}) AS DOUBLE) / 1e2 / count(*), 4)
         AS avg_max_value,
       round(max(max_value), 4) AS peak_value,
       round(min(max_value), 4) AS low_value,
       {stddev_pop_sql} AS stddev_value
FROM gold
GROUP BY user_id % 10""".format(
        mvc=_MVC,
        stddev_pop_sql=N.sql_stddev_exact("max_value", pop=True),
    ),
    doc="The reference's flagship analytic (clickhouse_queries.sql:94-105): "
    "per-dimension stats over hourly Gold — count/avg/max/min/stddev_pop.",
    headline=True,
    survey_ids=("A4", "O1"),
)
def gold_cohort_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = M.gold_hourly(M.silver(_bronze_keyed(spark, sf_dir)))
    return (
        g.groupBy((F.col("user_id") % 10).cast("bigint").alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            N.avg_exact("max_value").alias("avg_max_value"),
            N.rnd(F.max("max_value")).alias("peak_value"),
            N.rnd(F.min("max_value")).alias("low_value"),
            N.stddev_exact("max_value", pop=True).alias("stddev_value"),
        )
        .orderBy(F.desc("avg_max_value"))
    )


@query(
    "gold_unpivot",
    oracle="WITH"
    + GOLD_CTE
    + """
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       unnest(event_types) AS event_type,
       round(unnest(values), 4) AS value
FROM gold""",
    doc="Explode/unpivot: the Gold parallel arrays back to long format — "
    "the inverse of A1's collect, via arrays_zip + explode (the reference "
    "re-zips driver-side at data_loader.py:177-194).",
    survey_ids=("F6", "A1"),
)
def gold_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = M.gold_hourly(M.silver(_bronze_keyed(spark, sf_dir)))
    exploded = g.select(
        N.big("user_id").alias("user_id"),
        N.ts_str("hour_ts").alias("hour_ts"),
        F.explode(F.arrays_zip("event_types", "values")).alias("z"),
    )
    return exploded.select(
        "user_id",
        "hour_ts",
        F.col("z.event_types").alias("event_type"),
        N.rnd(F.col("z.values")).alias("value"),
    )


@query(
    "exact_percentiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type""",
    doc="Exact interpolated percentiles per group (Spark `percentile` == "
    "SQL quantile_cont continuous interpolation). The approx_stats entry "
    "is the sketch-based scale path; this is the exact baseline.",
    survey_ids=("A4",),
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        N.rnd(F.percentile("value", F.lit(0.5))).alias("p50"),
        N.rnd(F.percentile("value", F.lit(0.9))).alias("p90"),
        N.rnd(F.percentile("value", F.lit(0.99))).alias("p99"),
    )


@query(
    "scalar_misc",
    oracle="""
SELECT CAST(event_id AS BIGINT) AS event_id,
       upper(event_type) AS type_upper,
       CAST(greatest(0.0, value - 100) AS DOUBLE) AS clamped_excess,
       strftime(CAST(ts AS TIMESTAMP) + INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S.%f')
         AS ts_plus_7d,
       strftime(date_trunc('month', ts), '%Y%m') AS yyyymm,
       concat('evt-', CAST(user_id AS VARCHAR), '/', event_type) AS event_path
FROM events""",
    doc="Scalar grab-bag F8-F11/F13: clamp via greatest, interval "
    "arithmetic, toYYYYMM, case mapping, path formatting — all codegen'd "
    "expressions (driver-side Python in the reference: app.py:490,527, "
    "collect_data.py:57).",
    survey_ids=("F8", "F9", "F10", "F11"),
)
def scalar_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        N.big("event_id").alias("event_id"),
        F.upper("event_type").alias("type_upper"),
        F.greatest(F.lit(0.0), F.col("value") - 100).cast("double").alias(
            "clamped_excess"
        ),
        N.ts_str(
            F.col("ts") + F.expr("INTERVAL 7 DAYS"), micros=True
        ).alias("ts_plus_7d"),
        F.date_format(F.date_trunc("month", "ts"), "yyyyMM").alias("yyyymm"),
        F.concat(
            F.lit("evt-"),
            F.col("user_id").cast("string"),
            F.lit("/"),
            F.col("event_type"),
        ).alias("event_path"),
    )


@query(
    "observe_layer_counts",
    oracle="WITH"
    + GOLD_CTE
    + """
SELECT 'bronze' AS layer, CAST(count(*) AS BIGINT) AS n_rows FROM bronze
UNION ALL
SELECT 'silver' AS layer, CAST(count(*) AS BIGINT) AS n_rows FROM silver
UNION ALL
SELECT 'gold' AS layer, CAST(count(*) AS BIGINT) AS n_rows FROM gold""",
    doc="A9 count-once, driver-attested: the reference re-runs "
    "`df.count()` after every layer write, recomputing the whole "
    "lineage (and re-reading Kafka) three times per batch "
    "(spark/batch_processor.py:131,177,220 — the §4.3-1 anti-pattern). "
    "Here `observe()` attaches a CollectMetrics count to each medallion "
    "layer, ONE noop-write action drives bronze→silver→gold, and the "
    "three per-layer row counts come back on the action itself as "
    "accumulator metrics — zero extra jobs, zero recomputation. The "
    "observed counts are emitted as the result frame and oracled "
    "against plain COUNTs of the same layer CTEs, turning the metric "
    "side-channel into a hash-attested surface. Scale: observe() is an "
    "accumulator merged at task completion — no extra shuffle, no "
    "extra scan; at 100 TB the counts are free where the reference "
    "pays 3 full recomputes.",
    survey_ids=("A9",),
)
def observe_layer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    raw = load_table(spark, sf_dir, "events")
    obs = {layer: Observation() for layer in ("bronze", "silver", "gold")}
    b = M.bronze(raw).observe(obs["bronze"], F.count(F.lit(1)).alias("n"))
    s = M.silver(b).observe(obs["silver"], F.count(F.lit(1)).alias("n"))
    g = M.gold_hourly(s).observe(obs["gold"], F.count(F.lit(1)).alias("n"))
    g.write.format("noop").mode("overwrite").save()
    return spark.createDataFrame(
        [(layer, int(o.get["n"])) for layer, o in obs.items()],
        "layer string, n_rows bigint",
    )
