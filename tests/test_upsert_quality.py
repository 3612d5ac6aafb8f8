"""Upsert (MERGE emulation) + data-quality framework tests."""

from __future__ import annotations

from project_bigdata_spark.operators import quality as Q
from project_bigdata_spark.operators.upsert import upsert_partitioned


def test_upsert_touches_only_named_partitions(spark, tmp_path):
    p = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 2024, 1), (2, "b", 2024, 1), (3, "c", 2024, 2)],
        ["id", "v", "year", "month"],
    )
    base.write.partitionBy("year", "month").parquet(p)

    # update id=2 (replace) and id=9 (insert), both in month=1 only
    updates = spark.createDataFrame(
        [(2, "B2", 2024, 1), (9, "new", 2024, 1)], ["id", "v", "year", "month"]
    )
    upsert_partitioned(spark, p, updates, key_cols=["id"],
                       partition_cols=["year", "month"])

    got = {r.id: (r.v, r.month) for r in spark.read.parquet(p).collect()}
    assert got == {1: ("a", 1), 2: ("B2", 1), 9: ("new", 1), 3: ("c", 2)}


def test_upsert_empty_updates_is_noop(spark, tmp_path):
    p = str(tmp_path / "t2")
    base = spark.createDataFrame([(1, "a", 2024, 1)], ["id", "v", "year", "month"])
    base.write.partitionBy("year", "month").parquet(p)
    empty = base.limit(0)
    upsert_partitioned(spark, p, empty, ["id"], ["year", "month"])
    assert spark.read.parquet(p).count() == 1


def test_quality_checks_single_pass(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "click"), (2, -1.0, "click"), (3, None, "bogus"),
         (None, 2000.0, "view")],
        "id long, value double, etype string",
    )
    report = {
        r.check: r.violations
        for r in Q.run_checks(
            df,
            [Q.not_null("id"), Q.non_negative("value"),
             Q.in_range("value", 0, 1000), Q.in_set("etype", ["click", "view"])],
        ).collect()
    }
    assert report["not_null(id)"] == 1
    assert report["non_negative(value)"] == 1
    assert report["in_range(value,0,1000)"] == 2  # -1 and 2000
    assert report["in_set(etype)"] == 1


def test_uniqueness_and_referential(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
    u = Q.uniqueness(df, ["k"]).first()
    assert u.duplicate_keys == 1 and u.rows_involved == 2

    child = spark.createDataFrame([(1,), (5,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,)], ["pk"])
    r = Q.referential_integrity(child, parent, "fk", "pk").first()
    assert r.orphan_rows == 1


class TestPsiDrift:
    def test_identical_halves_near_zero(self, spark):
        from pyspark.sql import functions as F

        from project_bigdata_spark.operators import quality as Q

        rows = [("a", float(v % 100), i % 2 == 0) for i, v in enumerate(range(400))]
        df = spark.createDataFrame(rows, "g string, value double, first boolean")
        out = Q.psi_drift(
            df, value_col="value", group_col="g",
            split_pred=F.col("first"),
        ).collect()[0]
        assert abs(out["psi"]) < 0.01

    def test_shifted_distribution_flags(self, spark):
        from pyspark.sql import functions as F

        from project_bigdata_spark.operators import quality as Q

        rows = [("a", 10.0, True)] * 200 + [("a", 210.0, False)] * 200
        df = spark.createDataFrame(rows, "g string, value double, first boolean")
        out = Q.psi_drift(
            df, value_col="value", group_col="g",
            split_pred=F.col("first"),
        ).collect()[0]
        assert out["psi"] > 0.25
        assert out["n_baseline"] == 200 and out["n_current"] == 200
