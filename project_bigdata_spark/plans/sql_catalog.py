"""Spark-SQL view catalog: the engine's raw-SQL interface (SURVEY.md §3.3-2).

The reference exports Gold to ClickHouse and runs SQL there; this engine
replaces that whole hop — :func:`register_views` publishes every base
table plus the medallion layers and the latest-per-entity view as temp
views, so any analytic in ``clickhouse_queries.sql`` runs as ``spark.sql``
against the same session. One engine, no export, no loader null-fill
shims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from project_bigdata_spark.operators import medallion as M
from project_bigdata_spark.sources import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register base tables + bronze/silver/gold + latest_per_entity.

    Returns the view names. Views are lazy — nothing materializes until a
    query runs; Catalyst prunes and pushes down through them like any
    subquery.
    """
    names: list[str] = []
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)

    bronze = M.bronze(load_table(spark, sf_dir, "events"))
    bronze.createOrReplaceTempView("bronze")
    silver = M.silver(bronze)
    silver.createOrReplaceTempView("silver")
    gold = M.gold_hourly(silver)
    gold.createOrReplaceTempView("gold")
    names += ["bronze", "silver", "gold"]

    # the reference's latest_aqi materialized view (clickhouse/init.sql:
    # 67-80) as a window view — insert-time maintenance not needed, the
    # optimizer computes it on demand with a per-entity top-1
    w = Window.partitionBy("user_id").orderBy(F.desc("hour_ts"))
    latest = (
        gold.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    latest.createOrReplaceTempView("latest_per_entity")
    names.append("latest_per_entity")
    return names


def sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """Convenience: ensure views exist, then run a SQL statement."""
    register_views(spark, sf_dir)
    return spark.sql(statement)
