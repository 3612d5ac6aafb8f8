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
    """Round a double exactly like DuckDB's ``round(x, n)``.

    Spark's ``round`` rounds the *decimal string repr* of the double
    (BigDecimal.valueOf -> HALF_UP), DuckDB rounds the *binary value* (C
    ``round``: half away from zero after scaling). For a double whose
    shortest repr ends on a rounding boundary (e.g. 38.37875 whose binary
    value is 38.3787499999...), the two disagree. This sign-aware
    floor-form reproduces the C semantics on the binary value, so the
    oracle side can keep plain ``round(x, n)``.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    s = F.lit(float(10**n))
    pos = F.floor(c * s + F.lit(0.5)) / s
    neg = -(F.floor(-c * s + F.lit(0.5)) / s)
    return F.when(c >= 0, pos).otherwise(neg)


def big(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("bigint")


def avg_exact(col: Column | str, n: int = 4) -> Column:
    """Rounded average computed as exact-decimal sum / count.

    ``avg`` over doubles is summation-order-dependent, and averages of
    2-decimal data land *exactly* on 1e-4 rounding boundaries (multiples of
    1/n), so a naive ``round(avg(x), 4)`` flips between engines. Summing in
    DECIMAL is exact and order-free; the final double division is then
    bit-identical everywhere. Oracle-side mirror:
    ``round(CAST(sum(CAST(x AS DECIMAL(12,2))) AS DOUBLE) / count(*), n)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return rnd(F.sum(c.cast("decimal(12,2)")).cast("double") / F.count(F.lit(1)), n)


def stddev_exact(col: Column | str, n: int = 4, pop: bool = False) -> Column:
    """Engine-neutral rounded stddev over 2-decimal data.

    Native ``stddev`` over doubles is summation-order-dependent, so Spark
    and an oracle disagree in the last bits — enough to flip a rounding
    boundary. Sum x and x² exactly in DECIMAL (2-decimal inputs square to
    4 decimals), then evaluate the one-pass variance formula in double:
    every engine computes the identical IEEE result. Mirror SQL:
    :func:`sql_stddev_exact`.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("decimal(12,2)")
    cnt = F.count(F.lit(1)).cast("double")
    s = F.sum(c).cast("double")
    sq = F.sum((c * c).cast("decimal(28,4)")).cast("double")
    denom = cnt if pop else cnt - F.lit(1.0)
    var = F.greatest((sq - s * s / cnt) / denom, F.lit(0.0))
    return F.when(
        F.count(F.lit(1)) <= (0 if pop else 1), F.lit(None).cast("double")
    ).otherwise(rnd(F.sqrt(var), n))


def sql_avg_exact(expr: str, n: int = 4) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE) / count(*), {n})"
    )


def sql_stddev_exact(expr: str, n: int = 4, pop: bool = False) -> str:
    d = f"CAST({expr} AS DECIMAL(12,2))"
    s = f"CAST(sum({d}) AS DOUBLE)"
    sq = f"CAST(sum(CAST({d} * {d} AS DECIMAL(28,4))) AS DOUBLE)"
    cnt = "CAST(count(*) AS DOUBLE)"
    denom = cnt if pop else f"({cnt} - 1.0)"
    var = f"greatest(({sq} - {s} * {s} / {cnt}) / {denom}, 0.0)"
    guard = "count(*) <= 0" if pop else "count(*) <= 1"
    return f"CASE WHEN {guard} THEN NULL ELSE round(sqrt({var}), {n}) END"


def arr_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(",", c.cast("array<string>"))
