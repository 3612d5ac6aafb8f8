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


def test_artifact_roundtrip_identical_predictions(spark, sf_dir, tmp_path):
    """Save/load of {model, feature order, encoder dict, metrics} — the
    reference's pickle bundle (train_lightgbm.py:192-201). The reloaded
    model must predict bit-identically and the encoder dictionary must
    preserve its code assignment exactly (ordering survives)."""
    from project_bigdata_spark.operators.features import label_encode

    frame = ML.prepare_training_frame(spark, sf_dir).drop("hour_ts")
    model = ML.train_regressor(frame, kind="linear")
    m = ML.metrics(ML.predict(model, frame))
    encoder = (
        label_encode(
            frame.select(F.col("user_encoded").alias("user_id")).distinct(),
            "user_id",
        )
        .select("user_id", "user_id_encoded")
    )
    path = str(tmp_path / "bundle")
    ML.save_artifacts(model, path, ML.FEATURE_COLS, m, encoder=encoder)

    model2, meta, encoder2 = ML.load_artifacts(spark, path)
    assert meta["feature_cols"] == ML.FEATURE_COLS
    assert meta["metrics"]["rmse"] == m["rmse"]
    before = {
        r.user_encoded: r.prediction
        for r in ML.predict(model, frame).select("user_encoded", "prediction").collect()
    }
    after = {
        r.user_encoded: r.prediction
        for r in ML.predict(model2, frame).select("user_encoded", "prediction").collect()
    }
    assert before == after  # bit-identical, not approx
    codes = {r.user_id: r.user_id_encoded for r in encoder2.collect()}
    expect = {u: i for i, u in enumerate(sorted(codes))}
    assert codes == expect  # lexicographic code order survived the round-trip


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
