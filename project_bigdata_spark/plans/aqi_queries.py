"""Catalog entries exercising the AQI scalar library (SURVEY.md §2.7 F1-F3).

The ``events`` table supplies concentrations: ``value`` is read as a µg/m³
measurement and ``event_type`` maps onto a pollutant. Both the Spark columns
and the oracle SQL are generated from the SAME breakpoint tables in
:mod:`project_bigdata_spark.functions.aqi`, so the differential test pins
the piecewise-linear math, the unit conversions, the HALF-UP rounding, and
the gap/over-max/NaN edge semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_spark.functions import aqi as AQ
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table

# event_type -> pollutant assignment (arbitrary but fixed; gives the
# dispatching CASE real fan-out across all six breakpoint tables).
TYPE_TO_POLLUTANT = {
    "click": "pm25",
    "view": "pm10",
    "purchase": "o3",
    "signup": "co",
    "error": "so2",
}


def _pollutant_col() -> F.Column:
    expr = None
    for etype, pol in TYPE_TO_POLLUTANT.items():
        cond = F.col("event_type") == F.lit(etype)
        expr = F.when(cond, F.lit(pol)) if expr is None else expr.when(cond, F.lit(pol))
    return expr.otherwise(F.lit("no2"))


def _pollutant_sql() -> str:
    cases = [
        f"WHEN event_type = '{etype}' THEN '{pol}'"
        for etype, pol in TYPE_TO_POLLUTANT.items()
    ]
    return "CASE " + " ".join(cases) + " ELSE 'no2' END"


@query(
    "aqi_pm25",
    oracle=f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       round(value, 4) AS conc,
       {AQ.aqi_for_pollutant_sql('value', 'pm25')} AS aqi,
       {AQ.aqi_category_sql(AQ.aqi_for_pollutant_sql('value', 'pm25'))} AS category
FROM events""",
    doc="F1+F3: PM2.5 piecewise-linear AQI + 6-bucket category as one "
    "codegen'd CASE chain (aqi_calculator.py:59-88,115-128) — no UDF.",
    survey_ids=("F1", "F3"),
)
def aqi_pm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    aqi = AQ.aqi_for_pollutant(F.col("value"), "pm25")
    return e.select(
        N.big("event_id").alias("event_id"),
        N.rnd("value").alias("conc"),
        aqi.alias("aqi"),
        AQ.aqi_category(aqi).alias("category"),
    )


@query(
    "aqi_full_pipeline",
    oracle=f"""
WITH typed AS (
  SELECT event_id, value, {_pollutant_sql()} AS pollutant FROM events
), converted AS (
  SELECT event_id, pollutant,
         {AQ.convert_unit_to_standard_sql('value', 'pollutant', "'µg/m³'")} AS conc
  FROM typed
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       pollutant,
       round(conc, 6) AS conc,
       {AQ.aqi_any_pollutant_sql('conc', 'pollutant')} AS aqi
FROM converted""",
    doc="F1+F2 end-to-end: unit conversion µg/m³->ppm for gas pollutants "
    "then AQI dispatched on the pollutant column (collect_data.py:210-217 "
    "semantics, executor-side).",
    survey_ids=("F1", "F2"),
)
def aqi_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    typed = e.select(
        "event_id", "value", _pollutant_col().alias("pollutant")
    )
    conc = AQ.convert_unit_to_standard(
        F.col("value"), F.col("pollutant"), F.lit("µg/m³")
    )
    converted = typed.select("event_id", "pollutant", conc.alias("conc"))
    return converted.select(
        N.big("event_id").alias("event_id"),
        "pollutant",
        N.rnd("conc", 6).alias("conc"),
        AQ.aqi_any_pollutant(F.col("conc"), F.col("pollutant")).alias("aqi"),
    )


@query(
    "aqi_category_rollup",
    oracle=f"""
WITH scored AS (
  SELECT user_id, {AQ.aqi_for_pollutant_sql('value', 'pm25')} AS aqi FROM events
), per_entity AS (
  SELECT user_id, max(aqi) AS max_aqi FROM scored GROUP BY user_id
)
SELECT {AQ.aqi_category_sql('max_aqi')} AS category,
       CAST(count(*) AS BIGINT) AS n_entities
FROM per_entity
GROUP BY 1 ORDER BY 1""",
    doc="F3+A11: per-entity max-AQI roll-up then category histogram — the "
    "serving layer's overall-AQI semantics (app.py:752-755,1008-1031), "
    "with category derived from max(aqi) post-agg (fixes §4.3-4).",
    survey_ids=("F3", "A11"),
)
def aqi_category_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        "user_id", AQ.aqi_for_pollutant(F.col("value"), "pm25").alias("aqi")
    )
    per_entity = scored.groupBy("user_id").agg(F.max("aqi").alias("max_aqi"))
    return (
        per_entity.select(AQ.aqi_category(F.col("max_aqi")).alias("category"))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_entities"))
        .orderBy("category")
    )


def _reco_case_sql(field_idx: int) -> str:
    """CASE chain for one AQI_RECOMMENDATIONS payload field — generated
    from the SAME dict the Spark expression uses, so they cannot drift."""
    whens = " ".join(
        f"WHEN '{cat}' THEN '{payload[field_idx]}'"
        for cat, payload in AQ.AQI_RECOMMENDATIONS.items()
    )
    return f"(CASE category {whens} END)"


@query(
    "aqi_recommendation_rollup",
    oracle=f"""
WITH scored AS (
  SELECT user_id, {AQ.aqi_for_pollutant_sql('value', 'pm25')} AS aqi FROM events
), per_entity AS (
  SELECT user_id, max(aqi) AS max_aqi FROM scored GROUP BY user_id
), cat AS (
  SELECT {AQ.aqi_category_sql('max_aqi')} AS category,
         CAST(count(*) AS BIGINT) AS n_entities
  FROM per_entity GROUP BY 1
)
SELECT category,
       {_reco_case_sql(0)} AS message,
       {_reco_case_sql(1)} AS icon,
       {_reco_case_sql(2)} AS color,
       n_entities
FROM cat""",
    doc="F12 end-to-end: the serving layer's advisory payload — "
    "per-entity max-AQI roll-up, category, then the 6-way "
    "category -> (message, icon, color) recommendation mapping the "
    "reference duplicates in app.py:65-104 and static/js/app.js:240-247, "
    "here ONE struct-returning chained-CASE expression "
    "(functions/aqi.py:263) flattened into the rollup. The oracle CASE "
    "chains are GENERATED from the same AQI_RECOMMENDATIONS dict the "
    "Spark expression folds over, so mapping and oracle cannot drift. "
    "Plan: the aqi_category_rollup aggregate (entity-keyed, map-side "
    "combined) + a constant-table projection — the recommendation "
    "attach costs zero exchanges at any scale.",
    survey_ids=("F12",),
)
def aqi_recommendation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        "user_id", AQ.aqi_for_pollutant(F.col("value"), "pm25").alias("aqi")
    )
    per_entity = scored.groupBy("user_id").agg(F.max("aqi").alias("max_aqi"))
    cat = (
        per_entity.select(AQ.aqi_category(F.col("max_aqi")).alias("category"))
        .groupBy("category")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_entities"))
    )
    reco = AQ.aqi_recommendation(F.col("category")).alias("reco")
    return cat.select("category", reco, "n_entities").select(
        "category",
        F.col("reco.message").alias("message"),
        F.col("reco.icon").alias("icon"),
        F.col("reco.color").alias("color"),
        "n_entities",
    )
