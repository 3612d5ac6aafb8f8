"""Skewed-data robustness: a pathological hot key through the heavy
operators — correctness (not timing) under extreme imbalance."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from pyspark.sql import functions as F


def _skewed(spark, hot_rows=20000, cold_users=20):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=30 * i), 1, "click",
         round((i % 997) * 0.37, 2), None)
        for i in range(hot_rows)
    ]
    rows += [
        (100000 + u * 10 + j, t0 + dt.timedelta(hours=j), 100 + u, "view",
         5.0, None)
        for u in range(cold_users) for j in range(3)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"]
    )
    return spark.createDataFrame(
        pdf,
        schema="event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).repartition(16)


def test_gold_and_salted_agree_on_hot_key(spark):
    from project_bigdata_spark.operators import medallion as M
    from project_bigdata_spark.operators.skew import salted_hourly_gold

    df = _skewed(spark)
    silver = M.silver(M.bronze(df))
    plain = M.gold_hourly(silver)
    salted = salted_hourly_gold(silver, buckets=8)
    p = {(r.user_id, r.hour_ts): (r.max_value, r.n_events)
         for r in plain.collect()}
    s = {(r.user_id, r.hour_ts): (r.max_value, r.n_events)
         for r in salted.collect()}
    assert p == s
    # hot user contributed ~20000/120 rows per hour group
    hot_groups = [k for k in p if k[0] == 1]
    assert len(hot_groups) > 100


def test_salted_capped_pairs_exact_topk(spark):
    """max_pairs keeps EXACTLY the globally-smallest pairs (per struct
    sort order) — per-bucket truncation before the merge loses nothing,
    and max/count remain exact over all rows."""
    from project_bigdata_spark.operators import medallion as M
    from project_bigdata_spark.operators.skew import salted_hourly_gold

    df = _skewed(spark, hot_rows=5000)
    silver = M.silver(M.bronze(df))
    full = salted_hourly_gold(silver, buckets=8, salt_col="event_id")
    capped = salted_hourly_gold(
        silver, buckets=8, salt_col="event_id", max_pairs=7
    )
    f = {(r.user_id, r.hour_ts): r for r in full.collect()}
    c = {(r.user_id, r.hour_ts): r for r in capped.collect()}
    assert f.keys() == c.keys()
    for k, fr in f.items():
        cr = c[k]
        assert (cr.max_value, cr.n_events) == (fr.max_value, fr.n_events)
        want = sorted(zip(fr.event_types, fr.values))[:7]
        got = list(zip(cr.event_types, cr.values))
        assert got == want, k


def test_salt_col_fans_out_duplicate_timestamps(spark):
    """An exact-duplicate burst (identical ts) un-salts a ts-hashed salt;
    salting on a row-unique column must still fan it out."""
    import pandas as pd

    from project_bigdata_spark.operators.skew import salted_hourly_gold

    t = dt.datetime(2024, 3, 1, 12, 30)
    pdf = pd.DataFrame(
        [(i, t, 7, "click", 1.0, None) for i in range(200)],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df = spark.createDataFrame(
        pdf,
        schema="event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    salt = (F.abs(F.xxhash64("event_id")) % 8).alias("s")
    assert df.select(salt).distinct().count() > 1  # fans out
    out = salted_hourly_gold(df, buckets=8, salt_col="event_id").collect()
    assert len(out) == 1 and out[0].n_events == 200


def test_rolling_windows_bounded_on_hot_key(spark):
    """The 720-row frame stays bounded state even when one entity has 20k
    rows (SURVEY §7.4-3)."""
    from project_bigdata_spark.operators import features as FE

    df = _skewed(spark)
    out = FE.add_rolling_features(
        df, "value", order_by=["ts", "event_id"], window_rows=168,
        long_window_rows=720,
    )
    hot = out.filter(F.col("user_id") == 1)
    assert hot.count() == 20000
    # spot-check: means stay within the value domain
    row = hot.orderBy(F.desc("ts")).first()
    assert 0 <= row.value_mean_720 <= 400
