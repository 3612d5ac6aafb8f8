"""Data-layout catalog entries: Z-order clustering keys.

The write path itself (``operators/layout.py::zorder_write``) is a sink
job; what the differential gate can attest is the z-VALUE computation —
min-max rank normalization + bit interleave — which both engines replay
bit-for-bit (pure IEEE-double + integer-shift arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_spark.operators import layout as LO
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table

_BITS = LO.Z_BITS
_TOP = float((1 << _BITS) - 1)


def _scale_sql(col: str) -> str:
    return (
        f"CASE WHEN mx_{col} = mn_{col} THEN 0 "
        f"ELSE CAST(floor(((CAST({col} AS DOUBLE) - mn_{col}) "
        f"/ (mx_{col} - mn_{col})) * {_TOP}) AS BIGINT) END"
    )


def _interleave_sql(cols: list[str]) -> str:
    n = len(cols)
    terms = [
        f"(((s_{c} >> {b}) & 1) << {b * n + j})"
        for j, c in enumerate(cols)
        for b in range(_BITS)
    ]
    return " + ".join(terms)


@query(
    "zorder_events",
    oracle=f"""
WITH stats AS (
  SELECT CAST(min(user_id) AS DOUBLE) AS mn_user_id,
         CAST(max(user_id) AS DOUBLE) AS mx_user_id,
         CAST(min(value) AS DOUBLE) AS mn_value,
         CAST(max(value) AS DOUBLE) AS mx_value
  FROM events
), scaled AS (
  SELECT event_id,
         {_scale_sql('user_id')} AS s_user_id,
         {_scale_sql('value')} AS s_value
  FROM events CROSS JOIN stats
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST({_interleave_sql(['user_id', 'value'])} AS BIGINT) AS zval
FROM scaled""",
    doc="Z-order clustering key over events(user_id, value): min-max "
    "rank to 16-bit integers (one broadcast stats row), bit interleave "
    "as pure shift/AND arithmetic. The layout key behind "
    "operators/layout.py::zorder_write — ONE sorted layout that lets "
    "parquet footer stats prune range predicates on EITHER column "
    "(reference writes in arrival order: batch_processor.py:125-129).",
    survey_ids=("M7-L3",),
)
def zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    z = LO.with_zorder(e, ["user_id", "value"])
    return z.select(
        N.big("event_id").alias("event_id"),
        N.big("_zval").alias("zval"),
    )
