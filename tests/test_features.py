"""Feature-parity tests (SURVEY.md §5-5): Spark Window features vs the
pandas operations the reference actually runs (data_loader.py:134-173),
on the same frame — including the ddof=1 std and min_periods=1 edges."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest


from project_bigdata_spark.operators import asof as ASOF
from project_bigdata_spark.operators import features as FE


@pytest.fixture(scope="module")
def frame():
    rng = np.random.RandomState(7)
    rows = []
    for uid in range(3):
        n = 40 + uid * 13
        t = dt.datetime(2024, 1, 1)
        for i in range(n):
            # irregular gaps: the row-lag-vs-time-lag distinction is real
            t += dt.timedelta(hours=int(rng.randint(1, 4)))
            rows.append((uid * 1000 + i, t, uid, round(float(rng.rand() * 100), 2)))
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])


def test_lag_lead_match_pandas_shift(spark, frame):
    pdf = frame.sort_values(["user_id", "ts", "event_id"]).copy()
    g = pdf.groupby("user_id")["value"]
    pdf["lag1"], pdf["lag3"], pdf["lead1"] = g.shift(1), g.shift(3), g.shift(-1)

    sdf = FE.add_lag_features(
        spark.createDataFrame(frame), "value", order_by=["ts", "event_id"], lags=(1, 3)
    )
    sdf = FE.add_target_lead(sdf, "value", order_by=["ts", "event_id"])
    got = sdf.toPandas().sort_values(["user_id", "ts", "event_id"])

    for pcol, scol in [("lag1", "value_lag_1"), ("lag3", "value_lag_3"),
                       ("lead1", "value_next")]:
        pd.testing.assert_series_equal(
            pdf[pcol].reset_index(drop=True),
            got[scol].reset_index(drop=True),
            check_names=False,
        )


def test_rolling_match_pandas_rolling(spark, frame):
    pdf = frame.sort_values(["user_id", "ts", "event_id"]).copy()
    g = pdf.groupby("user_id")["value"]
    pdf["m7"] = g.rolling(7, min_periods=1).mean().reset_index(level=0, drop=True)
    pdf["s7"] = g.rolling(7, min_periods=1).std().reset_index(level=0, drop=True)
    pdf["mx7"] = g.rolling(7, min_periods=1).max().reset_index(level=0, drop=True)
    pdf["mn7"] = g.rolling(7, min_periods=1).min().reset_index(level=0, drop=True)
    pdf["m20"] = g.rolling(20, min_periods=1).mean().reset_index(level=0, drop=True)

    sdf = FE.add_rolling_features(
        spark.createDataFrame(frame), "value", order_by=["ts", "event_id"],
        window_rows=7, long_window_rows=20,
    )
    got = sdf.toPandas().sort_values(["user_id", "ts", "event_id"])

    for pcol, scol in [("m7", "value_mean_7"), ("s7", "value_std_7"),
                       ("mx7", "value_max_7"), ("mn7", "value_min_7"),
                       ("m20", "value_mean_20")]:
        np.testing.assert_allclose(
            pdf[pcol].to_numpy(), got[scol].to_numpy(dtype=float),
            rtol=1e-9, atol=1e-9, err_msg=f"{pcol} vs {scol}",
        )
    # first row of each entity: std must be NULL (pandas NaN, ddof=1)
    firsts = got.groupby("user_id").head(1)["value_std_7"]
    assert firsts.isna().all()


def test_time_features_match_pandas(spark, frame):
    pdf = frame.copy()
    pdf["dow"] = pdf["ts"].dt.dayofweek
    pdf["weekend"] = pdf["dow"] >= 5

    got = (
        FE.add_time_features(spark.createDataFrame(frame))
        .select("event_id", "day_of_week", "is_weekend")
        .toPandas()
        .set_index("event_id")
    )
    merged = pdf.set_index("event_id").join(got)
    assert (merged["dow"] == merged["day_of_week"]).all()
    assert (merged["weekend"] == merged["is_weekend"]).all()


def test_label_encode_matches_sklearn_order(spark):
    df = spark.createDataFrame(
        [("VN",), ("TH",), ("ID",), ("VN",), ("KH",)], ["country"]
    )
    got = dict(
        FE.label_encode(df, "country")
        .select("country", "country_encoded")
        .distinct()
        .collect()
    )
    # lexicographic dense codes, like sklearn LabelEncoder.fit on the data
    assert got == {"ID": 0, "KH": 1, "TH": 2, "VN": 3}


def test_gap_fill_hourly(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0), 5.0),
        (1, dt.datetime(2024, 1, 1, 3), 7.0),  # hours 1,2 missing
        (2, dt.datetime(2024, 1, 1, 10), 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "hour_ts", "max_value"])
    filled = FE.gap_fill_hourly(df).orderBy("user_id", "hour_ts").collect()
    u1 = [r for r in filled if r.user_id == 1]
    assert [r.hour_ts.hour for r in u1] == [0, 1, 2, 3]
    assert [r.max_value for r in u1] == [5.0, None, None, 7.0]
    # after gap-fill, row-lag IS time-lag: lag(3) at hour 3 sees hour 0
    lagged = FE.add_lag_features(
        FE.gap_fill_hourly(df), "max_value", order_by=["hour_ts"], lags=(3,)
    ).collect()
    at3 = [r for r in lagged if r.user_id == 1 and r.hour_ts.hour == 3][0]
    assert at3.max_value_lag_3 == 5.0


def test_asof_join_matches_merge_asof(spark, frame):
    left = frame[frame.event_id % 3 == 0][["event_id", "user_id", "ts", "value"]]
    right = frame[frame.event_id % 3 == 1][["user_id", "ts", "event_id", "value"]]
    right = right.rename(columns={"event_id": "seq", "value": "rv"})

    expected = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
    ).sort_values("event_id")

    got = (
        ASOF.asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            key="user_id",
            ts_col="ts",
            right_seq="seq",
            carry_cols=["rv"],
        )
        .toPandas()
        .sort_values("event_id")
    )
    np.testing.assert_allclose(
        expected["rv"].to_numpy(dtype=float),
        got["rv_asof"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_hash_split_deterministic_and_roughly_80_10_10(spark):
    from project_bigdata_spark.operators.features import hash_split_assign

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split_assign(df, "doc_id").collect()}
    b = {r.doc_id: r.split for r in hash_split_assign(df, "doc_id").collect()}
    assert a == b  # stable across runs — a doc keeps its split forever
    frac = {s: sum(1 for v in a.values() if v == s) / len(a) for s in set(a.values())}
    assert 0.75 < frac["train"] < 0.85
    assert 0.06 < frac["val"] < 0.15
    assert 0.06 < frac["test"] < 0.15
