"""Spark-side output normalization helpers for the query catalog.

Mirror rules (DuckDB side) are inlined in each oracle SQL string:
- doubles      -> ``round(x, n)``          <-> ``round(x, n)``
- integrals    -> ``.cast("bigint")``      <-> ``CAST(.. AS BIGINT)``
- timestamps   -> ``date_format``          <-> ``strftime``
- arrays       -> ``concat_ws(",", ...)``  <-> ``array_to_string``

Rationale: the driver compares results via an order-insensitive value hash;
engine-native types (int32 vs int64, timestamp_us vs timestamp_ns, float
summation order) would otherwise produce spurious mismatches that have
nothing to do with operator semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"
TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def ts_str(col: Column | str, micros: bool = False) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, TS_FMT_US if micros else TS_FMT)


def rnd(col: Column | str, n: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double"), n)


def big(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("bigint")


def arr_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(",", c.cast("array<string>"))
