"""AQI golden-vector tests (SURVEY.md §5-1): exact boundary values from the
EPA breakpoint table, gap/over-max/negative/NaN edges, and a dense
differential sweep of the Spark expression vs the plain-Python reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from project_bigdata_spark.functions import aqi as AQ

GOLDENS = [
    # (pollutant, concentration, expected aqi)
    ("pm25", 0.0, 0),
    ("pm25", 12.0, 50),          # bracket upper edge
    ("pm25", 12.05, None),       # EPA table gap (12.0, 12.1)
    ("pm25", 12.1, 51),          # next bracket lower edge
    ("pm25", 35.4, 100),
    ("pm25", 55.4, 150),
    ("pm25", 150.4, 200),
    ("pm25", 250.4, 300),
    ("pm25", 500.4, 500),
    ("pm25", 500.5, 500),        # above top -> pinned 500
    ("pm25", 9999.0, 500),
    ("pm25", -0.1, None),        # negative -> NULL
    ("pm10", 54.0, 50),
    ("pm10", 154.0, 100),
    ("pm10", 604.0, 500),
    ("o3", 0.054, 50),
    ("o3", 0.070, 100),
    ("o3", 0.200, 300),
    ("o3", 0.201, 500),          # o3 has no 301-500 band: over-max -> 500
    ("co", 4.4, 50),
    ("co", 9.4, 100),
    ("so2", 0.035, 50),
    ("no2", 0.053, 50),
    # interpolation mid-bracket, HALF-UP pinned:
    ("pm25", 6.0, 25),           # 50/12*6 = 25.0
    ("pm25", 6.06, 25),          # 25.25 -> 25
    ("pm25", 35.5, 101),
]


@pytest.fixture(scope="module")
def scored(spark):
    rows = [(i, pol, c) for i, (pol, c, _) in enumerate(GOLDENS)]
    df = spark.createDataFrame(rows, ["i", "pollutant", "conc"])
    out = df.select(
        "i", AQ.aqi_any_pollutant(F.col("conc"), F.col("pollutant")).alias("aqi")
    )
    return {r.i: r.aqi for r in out.collect()}


def test_golden_vectors_spark(scored):
    for i, (pol, c, expected) in enumerate(GOLDENS):
        assert scored[i] == expected, f"{pol}({c}): got {scored[i]}, want {expected}"


def test_golden_vectors_python_reference():
    for pol, c, expected in GOLDENS:
        assert AQ.aqi_reference_py(c, pol) == expected, f"{pol}({c})"


def test_nan_yields_null(spark):
    df = spark.createDataFrame([(float("nan"),)], ["conc"])
    row = df.select(AQ.aqi_for_pollutant(F.col("conc"), "pm25").alias("a")).first()
    assert row.a is None
    assert AQ.aqi_reference_py(float("nan"), "pm25") is None


def test_dense_differential_sweep(spark):
    """Spark expression == Python reference over a dense concentration grid
    for every pollutant (catches any breakpoint transcription drift)."""
    grids = {
        "pm25": [i * 0.37 for i in range(0, 1500)],
        "pm10": [i * 0.61 for i in range(0, 1100)],
        "o3": [i * 0.0004 for i in range(0, 600)],
        "co": [i * 0.07 for i in range(0, 800)],
        "so2": [i * 0.0011 for i in range(0, 1000)],
        "no2": [i * 0.0027 for i in range(0, 800)],
    }
    rows = [(pol, c) for pol, grid in grids.items() for c in grid]
    df = spark.createDataFrame(rows, ["pollutant", "conc"])
    got = df.select(
        "pollutant", "conc",
        AQ.aqi_any_pollutant(F.col("conc"), F.col("pollutant")).alias("aqi"),
    ).collect()
    for r in got:
        assert r.aqi == AQ.aqi_reference_py(r.conc, r.pollutant), (
            f"{r.pollutant}({r.conc})"
        )


def test_category_buckets(spark):
    vals = [(0, "Good"), (50, "Good"), (51, "Moderate"), (100, "Moderate"),
            (150, "Unhealthy for Sensitive Groups"), (200, "Unhealthy"),
            (300, "Very Unhealthy"), (301, "Hazardous"), (500, "Hazardous"),
            (None, None)]
    df = spark.createDataFrame([(v,) for v, _ in vals], "aqi int")
    got = [r.c for r in df.select(AQ.aqi_category(F.col("aqi")).alias("c")).collect()]
    assert got == [c for _, c in vals]


def test_unit_conversion(spark):
    rows = [
        ("o3", "µg/m³", 100.0, 100.0 * 24.45 / 48.0 / 1000),
        ("co", "µg/m³", 1000.0, 1000.0 * 24.45 / 28.0 / 1000),
        ("so2", "ppm", 0.5, 0.5),            # ppm passthrough
        ("pm25", "µg/m³", 42.0, 42.0),       # PM unchanged
        ("no2", "other", 10.0, 10.0),        # unknown unit passthrough
    ]
    df = spark.createDataFrame(rows, ["p", "u", "v", "expected"])
    got = df.select(
        AQ.convert_unit_to_standard(F.col("v"), F.col("p"), F.col("u")).alias("c"),
        "expected",
    ).collect()
    for r in got:
        assert math.isclose(r.c, r.expected, rel_tol=1e-12)


def test_pandas_udf_reference_matches_native(spark):
    """SURVEY §2.9: the engine keeps AQI as native column expressions; this
    pins them against an Arrow-batched pandas-UDF port of the same math —
    the differential-reference role the survey assigns to pandas UDFs."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    # NOTE: no pd.Series type hints — `from __future__ import annotations`
    # turns them into strings pyspark can't resolve with pandas imported
    # function-locally; the default SCALAR eval type is what we want.
    @F.pandas_udf(LongType())
    def aqi_udf(conc, pollutant):
        # self-contained worker closure (no package import)
        import math

        tables = {
            "pm25": [(0.0, 12.0, 0, 50), (12.1, 35.4, 51, 100),
                     (35.5, 55.4, 101, 150), (55.5, 150.4, 151, 200),
                     (150.5, 250.4, 201, 300), (250.5, 500.4, 301, 500)],
            "o3": [(0.0, 0.054, 0, 50), (0.055, 0.07, 51, 100),
                   (0.071, 0.085, 101, 150), (0.086, 0.105, 151, 200),
                   (0.106, 0.2, 201, 300)],
        }

        def one(c, p):
            if c is None or (isinstance(c, float) and math.isnan(c)) or c < 0:
                return None
            brackets = tables.get(p)
            if not brackets:
                return None
            for lo, hi, ilo, ihi in brackets:
                if lo <= c <= hi:
                    return int(math.floor((ihi - ilo) / (hi - lo) * (c - lo)
                                          + ilo + 0.5))
            return 500 if c > brackets[-1][1] else None

        return pd.Series(
            [one(c, p) for c, p in zip(conc, pollutant)], dtype="object"
        )

    from project_bigdata_spark.functions import aqi as AQ

    rows = [(i * 0.9, "pm25") for i in range(600)] + [
        (i * 0.00041, "o3") for i in range(600)
    ]
    df = spark.createDataFrame(rows, "conc double, pollutant string")
    out = df.select(
        AQ.aqi_any_pollutant(F.col("conc"), F.col("pollutant")).alias("native"),
        aqi_udf("conc", "pollutant").alias("udf"),
    ).collect()
    for r in out:
        assert r.native == r.udf
