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


def test_kmeans_ivf_centroids_plug_into_assign(spark, sf_dir):
    """End-to-end IVF index build: sampled k-means centroids -> ivf_assign.
    Every vector gets a cell; the cells partition the corpus; and a
    numpy cross-check confirms the fold-argmax picked the true nearest
    centroid for every vector."""
    import numpy as np

    from project_bigdata_spark.ml.kmeans import fit_ivf_centroids
    from project_bigdata_spark.operators import similarity as SIM
    from project_bigdata_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    cents = fit_ivf_centroids(e, k=4, seed=7)
    assert cents.count() == 4
    assigned = SIM.ivf_assign(e, cents).collect()
    assert len(assigned) == n
    assert {r.centroid_id for r in assigned} <= {0, 1, 2, 3}

    cvecs = {r.centroid_id: np.array(r.embedding) for r in cents.collect()}
    evecs = {r.vec_id: np.array(r.embedding, dtype=float) for r in e.collect()}
    for r in assigned:
        v = evecs[r.vec_id]
        sims = {
            cid: float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
            for cid, c in cvecs.items()
        }
        best = max(sims, key=lambda cid: (sims[cid], -cid))
        assert best == r.centroid_id, (r.vec_id, sims, r.centroid_id)
        assert abs(sims[r.centroid_id] - r.cosine) < 1e-9
