"""Local replay of the driver's differential gate (SURVEY.md §5-2).

For every catalog entry with an oracle: run the Spark builder and the
DuckDB SQL over the same parquet tables and require identical row count,
column names, and an order-insensitive multiset of stringified rows —
a *stricter* local version of the driver's value-hash compare, so any
engine-formatting drift is caught here first.
"""

from __future__ import annotations

import math

import pytest

from project_bigdata_spark.plans.catalog import load_all


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rows_multiset(cols, rows):
    return sorted("|".join(_canon(v) for v in row) for row in rows)


def all_specs():
    return [s for s in load_all().values() if s.oracle is not None]


@pytest.mark.parametrize("spec", all_specs(), ids=lambda s: s.name)
def test_parity(spec, spark, duck, sf_dir):
    sdf = spec.builder(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    rel = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = [tuple(r) for r in rel.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{spec.name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    # align duck column order to spark's
    idx = [duck_cols.index(c) for c in spark_cols]
    duck_rows = [tuple(r[i] for i in idx) for r in duck_rows]

    assert len(spark_rows) == len(duck_rows), (
        f"{spec.name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ms_s = _rows_multiset(spark_cols, spark_rows)
    ms_d = _rows_multiset(spark_cols, duck_rows)
    if ms_s != ms_d:
        diff_s = [r for r in ms_s if r not in set(ms_d)][:5]
        diff_d = [r for r in ms_d if r not in set(ms_s)][:5]
        raise AssertionError(
            f"{spec.name}: value mismatch\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )
