"""AQI scalar function library (SURVEY.md §2.7 F1-F3) as native Spark columns.

The reference computes these driver-side in plain Python *before* data ever
reaches Spark (``aqi_calculator.py:59-128``, applied at
``collect_data.py:210-217``). Here they are Catalyst column expressions —
codegen'd chained CASE, no UDF, fully pushdown/prune-friendly — so the same
math runs distributed over any number of executors.

Single-source-of-truth design: the breakpoint/threshold tables below (US
EPA public data, mirrored from ``aqi_calculator.py:8-56,115-128``) feed BOTH
the Spark ``Column`` builders and SQL-text generators used for the DuckDB
oracles. The two sides cannot drift.

Pinned semantics (SURVEY.md §7.4-1):

- Rounding is HALF-UP via ``floor(x + 0.5)`` in both engines. The reference
  uses Python ``round`` (banker's); we pin the deterministic engine-neutral
  form and encode it in the golden tests.
- NaN / negative / in-gap concentrations -> NULL (the EPA table has gaps,
  e.g. pm25 (12.0, 12.1)); above the top breakpoint -> 500. Explicit
  ``isnan`` guard because both Spark and DuckDB order NaN above +inf.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# US EPA AQI breakpoints: pollutant -> [(c_low, c_high, i_low, i_high)].
# Public EPA table; reference copy at aqi_calculator.py:8-56.
AQI_BREAKPOINTS: dict[str, list[tuple[float, float, int, int]]] = {
    "pm25": [
        (0.0, 12.0, 0, 50),
        (12.1, 35.4, 51, 100),
        (35.5, 55.4, 101, 150),
        (55.5, 150.4, 151, 200),
        (150.5, 250.4, 201, 300),
        (250.5, 500.4, 301, 500),
    ],
    "pm10": [
        (0.0, 54.0, 0, 50),
        (55.0, 154.0, 51, 100),
        (155.0, 254.0, 101, 150),
        (255.0, 354.0, 151, 200),
        (355.0, 424.0, 201, 300),
        (425.0, 604.0, 301, 500),
    ],
    "o3": [
        (0.000, 0.054, 0, 50),
        (0.055, 0.070, 51, 100),
        (0.071, 0.085, 101, 150),
        (0.086, 0.105, 151, 200),
        (0.106, 0.200, 201, 300),
    ],
    "co": [
        (0.0, 4.4, 0, 50),
        (4.5, 9.4, 51, 100),
        (9.5, 12.4, 101, 150),
        (12.5, 15.4, 151, 200),
        (15.5, 30.4, 201, 300),
        (30.5, 50.4, 301, 500),
    ],
    "so2": [
        (0.000, 0.035, 0, 50),
        (0.036, 0.075, 51, 100),
        (0.076, 0.185, 101, 150),
        (0.186, 0.304, 151, 200),
        (0.305, 0.604, 201, 300),
        (0.605, 1.004, 301, 500),
    ],
    "no2": [
        (0.000, 0.053, 0, 50),
        (0.054, 0.100, 51, 100),
        (0.101, 0.360, 101, 150),
        (0.361, 0.649, 151, 200),
        (0.650, 1.249, 201, 300),
        (1.250, 2.049, 301, 500),
    ],
}

# µg/m³ -> ppm molar conversion factors (24.45 L/mol at 25°C / 1 atm);
# reference copy at aqi_calculator.py:102-107. PM stays in µg/m³.
UNIT_CONVERSION_FACTORS: dict[str, float] = {
    "o3": 24.45 / 48.0 / 1000,
    "co": 24.45 / 28.0 / 1000,
    "so2": 24.45 / 64.0 / 1000,
    "no2": 24.45 / 46.0 / 1000,
}

# AQI value -> category label (upper bound inclusive); aqi_calculator.py:115-128.
AQI_CATEGORIES: list[tuple[float, str]] = [
    (50, "Good"),
    (100, "Moderate"),
    (150, "Unhealthy for Sensitive Groups"),
    (200, "Unhealthy"),
    (300, "Very Unhealthy"),
]
AQI_TOP_CATEGORY = "Hazardous"


def _round_half_up(col: Column) -> Column:
    return F.floor(col + F.lit(0.5)).cast("bigint")


def _f(x: float) -> str:
    """Float literal for oracle SQL, in scientific notation.

    A bare ``0.9259259259259259`` parses as DECIMAL in DuckDB (even inside
    ``CAST(... AS DOUBLE)`` the decimal parse happens first) and converts
    to a *different double* than the Python/Spark literal. ``9.259...e-01``
    parses directly as DOUBLE and round-trips exactly.
    """
    return f"{float(x):.17e}"


def aqi_for_pollutant(conc: Column, pollutant: str) -> Column:
    """F1: piecewise-linear AQI for one pollutant (aqi_calculator.py:59-88).

    Chained ``when`` over the static breakpoint table — Catalyst folds this
    into one codegen'd CASE; cost is O(#brackets) comparisons per row with
    zero Python involvement.
    """
    brackets = AQI_BREAKPOINTS[pollutant]
    expr: Column | None = None
    for c_low, c_high, i_low, i_high in brackets:
        slope = (i_high - i_low) / (c_high - c_low)
        interp = _round_half_up(F.lit(slope) * (conc - F.lit(c_low)) + F.lit(i_low))
        cond = (conc >= F.lit(c_low)) & (conc <= F.lit(c_high))
        expr = F.when(cond, interp) if expr is None else expr.when(cond, interp)
    assert expr is not None
    guarded = (
        F.when(conc.isNull() | F.isnan(conc) | (conc < 0), F.lit(None).cast("bigint"))
        .when(conc > F.lit(brackets[-1][1]), F.lit(500).cast("bigint"))
        .otherwise(expr)
    )
    return guarded


def aqi_for_pollutant_sql(conc: str, pollutant: str) -> str:
    """DuckDB/ANSI SQL text computing exactly :func:`aqi_for_pollutant`."""
    brackets = AQI_BREAKPOINTS[pollutant]
    cases = []
    for c_low, c_high, i_low, i_high in brackets:
        slope = (i_high - i_low) / (c_high - c_low)
        cases.append(
            f"WHEN ({conc}) >= {_f(c_low)} AND ({conc}) <= {_f(c_high)} THEN "
            f"CAST(floor({_f(slope)} * (({conc}) - {_f(c_low)}) + {i_low} + 0.5)"
            " AS BIGINT)"
        )
    inner = "\n      ".join(cases)
    return (
        f"CASE WHEN ({conc}) IS NULL OR isnan({conc}) OR ({conc}) < 0 THEN NULL\n"
        f"      WHEN ({conc}) > {_f(brackets[-1][1])} THEN CAST(500 AS BIGINT)\n"
        f"      {inner}\n      ELSE NULL END"
    )


def aqi_any_pollutant(conc: Column, pollutant: Column) -> Column:
    """F1 dispatched on a pollutant *column* — one nested CASE, still no UDF."""
    expr: Column | None = None
    for name in AQI_BREAKPOINTS:
        branch = aqi_for_pollutant(conc, name)
        cond = pollutant == F.lit(name)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    assert expr is not None
    return expr.otherwise(F.lit(None).cast("bigint"))


def aqi_any_pollutant_sql(conc: str, pollutant: str) -> str:
    cases = [
        f"WHEN ({pollutant}) = '{name}' THEN {aqi_for_pollutant_sql(conc, name)}"
        for name in AQI_BREAKPOINTS
    ]
    return "CASE " + "\n  ".join(cases) + " ELSE NULL END"


def convert_unit_to_standard(value: Column, parameter: Column, unit: Column) -> Column:
    """F2: µg/m³ -> ppm for gas pollutants; passthrough otherwise
    (aqi_calculator.py:91-112)."""
    expr = F.when(unit == F.lit("ppm"), value)
    for name, factor in UNIT_CONVERSION_FACTORS.items():
        expr = expr.when(
            (parameter == F.lit(name)) & (unit == F.lit("µg/m³")),
            value * F.lit(factor),
        )
    return expr.otherwise(value)


def convert_unit_to_standard_sql(value: str, parameter: str, unit: str) -> str:
    cases = [f"WHEN ({unit}) = 'ppm' THEN ({value})"]
    for name, factor in UNIT_CONVERSION_FACTORS.items():
        cases.append(
            f"WHEN ({parameter}) = '{name}' AND ({unit}) = 'µg/m³' "
            f"THEN ({value}) * {_f(factor)}"
        )
    return "CASE " + "\n  ".join(cases) + f" ELSE ({value}) END"


def aqi_category(aqi: Column) -> Column:
    """F3: 6-bucket categorization (aqi_calculator.py:115-128).

    NULL-safe (NULL aqi -> NULL category), unlike the reference which would
    raise on None; and applied to ``max(aqi)`` post-agg rather than the
    lexicographic ``max(aqi_category)`` defect (SURVEY.md §4.3-4).
    """
    expr = F.when(aqi.isNull(), F.lit(None).cast("string"))
    for bound, label in AQI_CATEGORIES:
        expr = expr.when(aqi <= F.lit(bound), F.lit(label))
    return expr.otherwise(F.lit(AQI_TOP_CATEGORY))


def aqi_category_sql(aqi: str) -> str:
    cases = [f"WHEN ({aqi}) IS NULL THEN NULL"]
    for bound, label in AQI_CATEGORIES:
        cases.append(f"WHEN ({aqi}) <= {bound} THEN '{label}'")
    return "CASE " + "\n  ".join(cases) + f" ELSE '{AQI_TOP_CATEGORY}' END"


def aqi_reference_py(concentration: float | None, pollutant: str) -> int | None:
    """Plain-Python reference implementation for golden/differential tests.

    Mirrors ``aqi_calculator.py:59-88`` except rounding is pinned HALF-UP
    (matching the engine). Used by tests only — never in a Spark plan.
    """
    import math

    if concentration is None or (
        isinstance(concentration, float) and math.isnan(concentration)
    ):
        return None
    if concentration < 0:
        return None
    brackets = AQI_BREAKPOINTS.get(pollutant)
    if not brackets:
        return None
    for c_low, c_high, i_low, i_high in brackets:
        if c_low <= concentration <= c_high:
            aqi = ((i_high - i_low) / (c_high - c_low)) * (concentration - c_low) + i_low
            return int(math.floor(aqi + 0.5))
    if concentration > brackets[-1][1]:
        return 500
    return None


# AQI category -> advisory payload (F12; reference duplicates this 6-way
# mapping in app.py:65-104 and static/js/app.js:240-247 — here it is one
# struct-returning expression usable from any query).
AQI_RECOMMENDATIONS: dict[str, tuple[str, str, str]] = {
    "Good": ("Air quality is satisfactory.", "smile", "#00e400"),
    "Moderate": ("Acceptable; unusually sensitive people should reduce "
                 "prolonged outdoor exertion.", "meh", "#ffff00"),
    "Unhealthy for Sensitive Groups": (
        "Sensitive groups should reduce outdoor exertion.", "frown", "#ff7e00"),
    "Unhealthy": ("Everyone may experience effects; limit outdoor "
                  "exertion.", "mask", "#ff0000"),
    "Very Unhealthy": ("Health alert: avoid outdoor activity.", "alert",
                       "#8f3f97"),
    "Hazardous": ("Emergency conditions: stay indoors.", "danger",
                  "#7e0023"),
}


def aqi_recommendation(category: Column) -> Column:
    """F12: category -> struct(message, icon, color) as a chained CASE."""
    expr: Column | None = None
    for cat, (msg, icon, color) in AQI_RECOMMENDATIONS.items():
        payload = F.struct(
            F.lit(msg).alias("message"),
            F.lit(icon).alias("icon"),
            F.lit(color).alias("color"),
        )
        cond = category == F.lit(cat)
        expr = F.when(cond, payload) if expr is None else expr.when(cond, payload)
    assert expr is not None
    return expr.otherwise(F.lit(None))
