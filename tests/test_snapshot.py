"""snapshot_diff semantics: added/removed/changed/unchanged classification
on hand-built snapshot pairs (the catalog query covers the rollup path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_spark.operators import snapshot as SN


def _frames(spark):
    old = spark.createDataFrame(
        [(1, "h1"), (2, "h2"), (3, "h3")], ["doc_id", "digest"]
    )
    new = spark.createDataFrame(
        [(2, "h2"), (3, "h3x"), (4, "h4")], ["doc_id", "digest"]
    )
    return old, new


def test_snapshot_diff_classifies_each_id(spark):
    old, new = _frames(spark)
    got = {r.doc_id: r.status for r in SN.snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_summary_counts(spark):
    old, new = _frames(spark)
    got = {
        r.status: r.n_docs
        for r in SN.snapshot_diff_summary(old, new).collect()
    }
    assert got == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}
