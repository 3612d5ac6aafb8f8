"""ML layer: distributed feature frame -> Spark ML regressor -> metrics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from project_bigdata_spark.ml import train as ML


def test_prepare_training_frame(spark, sf_dir):
    frame = ML.prepare_training_frame(spark, sf_dir)
    assert set(ML.FEATURE_COLS) <= set(frame.columns)
    # no nulls anywhere in the feature matrix
    null_counts = frame.select(
        [F.sum(F.col(c).isNull().cast("int")).alias(c) for c in ML.FEATURE_COLS]
    ).first()
    assert all(null_counts[c] == 0 for c in ML.FEATURE_COLS)
    assert frame.filter(F.col(ML.TARGET).isNull()).count() == 0


def test_train_and_evaluate_linear(spark, sf_dir):
    m = ML.train_and_evaluate(spark, sf_dir, kind="linear")
    assert math.isfinite(m["rmse"]) and m["rmse"] > 0
    assert math.isfinite(m["mae"]) and 0 < m["mae"] <= m["rmse"]
    assert math.isfinite(m["mape"])


def test_predictions_clamped_nonnegative(spark, sf_dir):
    frame = ML.prepare_training_frame(spark, sf_dir).drop("hour_ts")
    model = ML.train_regressor(frame, kind="linear")
    pred = ML.predict(model, frame)
    assert pred.filter(F.col("prediction") < 0).count() == 0
