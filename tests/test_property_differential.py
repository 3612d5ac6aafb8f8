"""Property-based differential tests (hypothesis): randomized inputs
through the Spark expressions vs the plain-Python/pandas references.
Bounded example counts keep the Spark round-trips cheap — each property
evaluates one batch DataFrame per test, not per example."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from project_bigdata_spark.functions import aqi as AQ

_conc = st.one_of(
    st.floats(min_value=-10, max_value=700, allow_nan=False),
    st.just(float("nan")),
    st.sampled_from([0.0, 12.0, 12.05, 12.1, 35.4, 55.4, 150.4, 250.4,
                     500.4, 500.5, 0.054, 0.2, 0.201]),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(_conc, st.sampled_from(list(AQ.AQI_BREAKPOINTS))),
                min_size=1, max_size=40))
def test_aqi_spark_matches_python_reference(spark, batch):
    df = spark.createDataFrame(
        [(float(c), p) for c, p in batch], "conc double, pollutant string"
    )
    got = df.select(
        "conc", "pollutant",
        AQ.aqi_any_pollutant(F.col("conc"), F.col("pollutant")).alias("aqi"),
    ).collect()
    for r in got:
        assert r.aqi == AQ.aqi_reference_py(r.conc, r.pollutant), (
            f"{r.pollutant}({r.conc})"
        )


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),       # entity
            st.integers(min_value=0, max_value=10**6),   # ts offset seconds
            st.floats(min_value=0, max_value=500),       # value
        ),
        min_size=2,
        max_size=60,
    )
)
def test_rolling_mean_matches_pandas(spark, rows):
    from project_bigdata_spark.operators import features as FE

    pdf = pd.DataFrame(rows, columns=["user_id", "off", "value"])
    pdf["value"] = pdf["value"].round(2)
    pdf["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(pdf["off"], unit="s")
    pdf["event_id"] = range(len(pdf))
    sdf = FE.add_rolling_features(
        spark.createDataFrame(pdf[["user_id", "ts", "event_id", "value"]]),
        "value", order_by=["ts", "event_id"], window_rows=5, long_window_rows=9,
    )
    got = sdf.toPandas().sort_values(["user_id", "ts", "event_id"])
    ref = pdf.sort_values(["user_id", "ts", "event_id"])
    g = ref.groupby("user_id")["value"]
    expected = g.rolling(5, min_periods=1).mean().reset_index(level=0, drop=True)
    np.testing.assert_allclose(
        expected.to_numpy(), got["value_mean_5"].to_numpy(dtype=float),
        rtol=1e-9, atol=1e-9,
    )


_round_vals = st.one_of(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    # half-way rounding boundaries: k/2 * 1e-4 lands exactly between
    # 4-decimal grid points — where Spark's string-repr rounding and C's
    # binary-value rounding historically disagree
    st.integers(min_value=-2 * 10**6, max_value=2 * 10**6).map(
        lambda k: k / 2 * 1e-4
    ),
    st.sampled_from([38.37875, -38.37875, 2.5e-5, -2.5e-5, 0.00015]),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_round_vals, min_size=1, max_size=50))
def test_rnd_matches_duckdb_round(spark, vals):
    """plans/_norm.rnd must equal DuckDB's round(x, 4) on the BINARY
    double value for every input — the invariant every oracle compare
    stands on."""
    import duckdb

    from project_bigdata_spark.plans import _norm as N

    got = [
        r.r
        for r in spark.createDataFrame([(float(v),) for v in vals], "x double")
        .select(N.rnd("x").alias("r"))
        .collect()
    ]
    exp = [
        row[0]
        for row in duckdb.connect()
        .execute(
            "SELECT round(x, 4) FROM (SELECT unnest(?::DOUBLE[]) AS x)",
            [[float(v) for v in vals]],
        )
        .fetchall()
    ]
    assert got == exp


@settings(max_examples=5, deadline=None)
@given(
    st.sets(
        st.text(alphabet="abcdef0123456789", min_size=1, max_size=16),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([1, 3]),
)
def test_bloom_never_false_negative(spark, keys, shards):
    """For ANY key set and shard count, every built key must probe true
    — the invariant the exact-dedup prefilter's correctness rests on."""
    from project_bigdata_spark.operators import dedup as DD

    df = spark.createDataFrame([(k,) for k in sorted(keys)], "k string")
    bloom = DD.bloom_build(df, "k", num_shards=shards)
    hits = (
        DD.bloom_probe(df, bloom, F.col("k"), num_shards=shards)
        .filter("bloom_hit")
        .count()
    )
    assert hits == len(keys)
