"""Semantics tests for the warehouse-lifecycle operators
(operators/warehouse.py): EWMA fold, SCD2 versioning + no-op
suppression, CDC tombstone ordering, MAD robustness."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from project_bigdata_spark.operators import warehouse as WH

T0 = dt.datetime(2024, 1, 1)


def _ts(h):
    return T0 + dt.timedelta(hours=h)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


class TestEwma:
    def test_single_row_is_identity(self, spark):
        df = _events(spark, [(1, 1, _ts(0), 5.0)])
        out = WH.ewma_col(df, "value").collect()
        assert out[0]["value_ewma_24"] == 5.0

    def test_matches_reference_fold(self, spark):
        vals = [1.0, 2.0, 4.0, 8.0]
        df = _events(
            spark, [(i, 1, _ts(i), v) for i, v in enumerate(vals)]
        )
        out = (
            WH.ewma_col(df, "value", rows=24, alpha=0.9)
            .orderBy("event_id")
            .collect()
        )
        for n in range(1, len(vals) + 1):
            w = [0.9 ** (n - 1 - i) for i in range(n)]
            expect = sum(x * wi for x, wi in zip(vals[:n], w)) / sum(w)
            assert math.isclose(out[n - 1]["value_ewma_24"], expect, rel_tol=1e-12)

    def test_window_bounded(self, spark):
        # with rows=2 only the last 2 values matter
        df = _events(
            spark, [(i, 1, _ts(i), v) for i, v in enumerate([100.0, 3.0, 1.0])]
        )
        out = (
            WH.ewma_col(df, "value", rows=2, alpha=0.5)
            .orderBy("event_id")
            .collect()
        )
        # frame = [3.0, 1.0]; weights = [0.5, 1.0]
        assert math.isclose(
            out[2]["value_ewma_2"], (3.0 * 0.5 + 1.0) / 1.5, rel_tol=1e-12
        )

    def test_partitioned_by_entity(self, spark):
        df = _events(spark, [(1, 1, _ts(0), 2.0), (2, 2, _ts(0), 10.0)])
        out = {
            r["user_id"]: r["value_ewma_24"]
            for r in WH.ewma_col(df, "value").collect()
        }
        assert out == {1: 2.0, 2: 10.0}


def _dim(spark, rows):
    return spark.createDataFrame(rows, "k long, bal double")


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k long, bal double, eff_ts timestamp")


class TestScd2:
    def test_changed_key_gets_two_versions(self, spark):
        dim = _dim(spark, [(1, 10.0), (2, 20.0)])
        upd = _upd(spark, [(1, 15.0, _ts(5))])
        out = WH.scd2_apply(dim, upd, "k", ["bal"], "eff_ts")
        rows = {(r["k"], r["version"]): r for r in out.collect()}
        assert len(rows) == 3
        closed = rows[(1, 1)]
        assert closed["bal"] == 10.0 and not closed["is_current"]
        assert closed["valid_to"] == _ts(5) and closed["valid_from"] is None
        opened = rows[(1, 2)]
        assert opened["bal"] == 15.0 and opened["is_current"]
        assert opened["valid_from"] == _ts(5) and opened["valid_to"] is None
        untouched = rows[(2, 1)]
        assert untouched["bal"] == 20.0 and untouched["is_current"]

    def test_noop_update_suppressed(self, spark):
        dim = _dim(spark, [(1, 10.0)])
        upd = _upd(spark, [(1, 10.0, _ts(5))])  # identical value re-delivered
        out = WH.scd2_apply(dim, upd, "k", ["bal"], "eff_ts").collect()
        assert len(out) == 1
        assert out[0]["version"] == 1 and out[0]["is_current"]

    def test_null_safe_attr_compare(self, spark):
        dim = spark.createDataFrame([(1, None)], "k long, bal double")
        upd = _upd(spark, [(1, 5.0, _ts(1))])
        out = WH.scd2_apply(dim, upd, "k", ["bal"], "eff_ts")
        # NULL -> 5.0 is a real change: two versions
        assert out.count() == 2


class TestCdc:
    def _log(self, spark, rows):
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, op string"
        )
        return df

    def test_trailing_delete_erases(self, spark):
        log = self._log(
            spark, [(1, 1, _ts(0), "U"), (2, 1, _ts(1), "D")]
        )
        assert WH.cdc_latest(log, order_by=["ts", "event_id"]).count() == 0

    def test_reinsert_after_delete_resurrects(self, spark):
        log = self._log(
            spark,
            [(1, 1, _ts(0), "U"), (2, 1, _ts(1), "D"), (3, 1, _ts(2), "U")],
        )
        out = WH.cdc_latest(log, order_by=["ts", "event_id"]).collect()
        assert len(out) == 1 and out[0]["event_id"] == 3

    def test_tie_broken_by_full_order(self, spark):
        # same ts: higher event_id wins
        log = self._log(spark, [(1, 1, _ts(0), "U"), (2, 1, _ts(0), "U")])
        out = WH.cdc_latest(log, order_by=["ts", "event_id"]).collect()
        assert out[0]["event_id"] == 2


class TestMad:
    def test_outlier_does_not_drag_threshold(self, spark):
        # 9 points near 10 plus one huge spike; stddev-based 3-sigma would
        # swallow the spike into the threshold, MAD flags exactly it
        vals = [9.0, 9.5, 10.0, 10.0, 10.0, 10.5, 10.5, 11.0, 9.5, 1000.0]
        df = spark.createDataFrame(
            [("a", v) for v in vals], "g string, value double"
        )
        out = WH.mad_outlier_stats(df, "g", "value").collect()[0]
        assert out["n"] == 10
        assert out["med"] == 10.0
        assert out["n_outliers"] == 1

    def test_group_without_outliers_reports_zero(self, spark):
        df = spark.createDataFrame(
            [("a", float(v)) for v in range(5)], "g string, value double"
        )
        out = WH.mad_outlier_stats(df, "g", "value").collect()[0]
        assert out["n_outliers"] == 0

    def test_constant_group_mad_zero(self, spark):
        df = spark.createDataFrame(
            [("a", 5.0)] * 4 + [("a", 6.0)], "g string, value double"
        )
        out = WH.mad_outlier_stats(df, "g", "value").collect()[0]
        assert out["mad"] == 0.0
        # 6.0 deviates from median 5.0 with MAD 0 -> flagged
        assert out["n_outliers"] == 1
