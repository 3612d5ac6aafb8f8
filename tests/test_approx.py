"""Approximate aggregates: sketch outputs vs exact values within tolerance.

``approx_stats`` carries the flag-based differential oracle since round 6
(it was the catalog's one rows-only entry through round 5): the builder
emits EXACT values plus within-contract audit flags, so these tests assert
the flags really come back true and the exact columns agree with an
independent recomputation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_spark.plans.catalog import load_all
from project_bigdata_spark.sources import load_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    df = load_all()["approx_stats"].builder(spark, sf_dir)
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    rows = df.collect()
    assert len(rows) == len(exact)
    for r in rows:
        assert r.exact_users == exact[r.event_type]
        assert r.users_ok == 1, f"{r.event_type}: HLL outside 10% contract"


def test_approx_quantiles_ordered_and_bounded(spark, sf_dir):
    df = load_all()["approx_stats"].builder(spark, sf_dir)
    for r in df.collect():
        q50, q95, q99 = r.p50, r.p95, r.p99
        assert q50 <= q95 <= q99
        assert 0 <= q50 and q99 <= 500.1
        assert r.rank_ok == 1, f"{r.event_type}: GK estimate outside rank bound"
