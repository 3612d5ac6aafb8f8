"""Approximate aggregates: sketch outputs vs exact values within tolerance."""

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
    for r in df.collect():
        rel_err = abs(r.approx_users - exact[r.event_type]) / exact[r.event_type]
        assert rel_err < 0.05, f"{r.event_type}: {rel_err}"


def test_approx_quantiles_ordered_and_bounded(spark, sf_dir):
    df = load_all()["approx_stats"].builder(spark, sf_dir)
    for r in df.collect():
        q50, q95, q99 = r.p50, r.p95, r.p99
        assert q50 <= q95 <= q99
        assert 0 <= q50 and q99 <= 500.1
