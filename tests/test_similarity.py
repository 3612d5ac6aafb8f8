"""Unit edges for similarity operators (the catalog queries cover bulk
parity; these pin hand-computed values and degenerate inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_spark.operators import similarity as SIM


def test_quantize_int8_known_codes_and_error(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0])], ["vec_id", "embedding"]
    )
    r = SIM.quantize_int8(df).collect()[0]
    # scale = 1/127; codes = round(v/scale) = [127, -64 (63.5 rounds away), 32, 0]
    assert r.dim == 4
    assert abs(r.scale - 1 / 127) < 1e-12
    assert r.q == [127, -64, 32, 0]
    # reconstruction error: only the .5-rounded and 31.75->32 components err
    exp_err = (abs(-0.5 - (-64 / 127)) + abs(0.25 - 32 / 127)) / 4
    assert abs(r.mean_abs_err - exp_err) < 1e-9


def test_quantize_int8_zero_vector_no_nan(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], ["vec_id", "embedding"])
    r = SIM.quantize_int8(df).collect()[0]
    assert r.scale == 0.0
    assert r.q == [0, 0]
    assert r.mean_abs_err == 0.0


def test_semantic_dedup_pairs_clusters_and_cap(spark):
    """Pairs form only within a cluster; near-identical vectors cross the
    threshold; max_cluster drops a degenerate mega-cluster."""
    from project_bigdata_spark.operators import similarity as SIM

    rows = [
        (0, [1.0, 0.0, 0.0]),   # centroid A
        (1, [0.0, 1.0, 0.0]),   # centroid B
        (10, [0.9, 0.1, 0.0]),  # cluster A
        (11, [0.95, 0.05, 0.0]),  # cluster A, ~dup of 10
        (20, [0.1, 0.9, 0.0]),  # cluster B — no partner
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    pairs = SIM.semantic_dedup_pairs(
        df.filter(F.col("vec_id") >= 10), cents, threshold=0.95
    ).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(10, 11)}
    assert all(p.cosine >= 0.95 for p in pairs)

    capped = SIM.semantic_dedup_pairs(
        df.filter(F.col("vec_id") >= 10), cents,
        threshold=0.0, max_cluster=1,
    ).collect()
    assert capped == []


def test_diversity_sample_quota_and_stability(spark):
    """Per-cell quota respected; rank deterministic across invocations;
    bucket_size reports the FULL cell population, not the sample's."""
    import pandas as pd
    import numpy as np
    from project_bigdata_spark.operators import similarity as SIM

    rng = np.random.default_rng(7)
    # two dense modes + sparse tail: uniform sampling would drown the tail
    vecs = [
        (i, (rng.standard_normal(SIM.DIM) * 0.01 + (1.0 if i % 50 else -1.0)).tolist())
        for i in range(300)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(vecs, columns=["vec_id", "embedding"])
    )
    s1 = SIM.diversity_sample(df, "vec_id", "embedding", per_bucket=5)
    got = s1.groupBy("bucket").count().collect()
    assert all(r["count"] <= 5 for r in got)
    full = {r.bucket: r.bucket_size for r in s1.select("bucket", "bucket_size").distinct().collect()}
    assert max(full.values()) > 5  # dense cells exceed the quota
    a = sorted((r.vec_id, r.sample_rank) for r in s1.collect())
    b = sorted(
        (r.vec_id, r.sample_rank)
        for r in SIM.diversity_sample(df, "vec_id", "embedding", per_bucket=5).collect()
    )
    assert a == b


def test_pq_encode_hand_computed(spark):
    # dim=4, 2 subspaces of 2; codebook: cw0=[0,0,0,0], cw1=[1,1,1,1].
    # v=[0.9, 0.9, 0.1, 0.1] -> sub0 nearest cw1 (dist 0.02 vs 1.62),
    # sub1 nearest cw0 (dist 0.02 vs 1.62).
    corpus = spark.createDataFrame(
        [(10, [0.9, 0.9, 0.1, 0.1])], "vec_id long, embedding array<double>"
    )
    cb = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [1.0] * 4)],
        "code_id long, embedding array<double>",
    )
    rows = {
        (r["m"], r["code"]): r["dist"]
        for r in SIM.pq_encode_flat(corpus, cb, n_sub=2, dim=4).collect()
    }
    assert rows == {(0, 1): 0.02, (1, 0): 0.02}


def test_pq_encode_tie_breaks_to_smallest_code_id(spark):
    corpus = spark.createDataFrame(
        [(7, [0.5, 0.5])], "vec_id long, embedding array<double>"
    )
    cb = spark.createDataFrame(  # duplicate codewords -> tie on dist
        [(3, [0.0, 0.0]), (1, [0.0, 0.0])],
        "code_id long, embedding array<double>",
    )
    out = SIM.pq_encode_flat(corpus, cb, n_sub=1, dim=2).collect()
    assert len(out) == 1 and out[0]["code"] == 1


def test_pq_search_self_query_ranks_first_and_codes_are_cids(spark):
    # codebook ids deliberately NOT dense-from-zero: codes column must
    # report cids while the distance table is indexed positionally.
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    cb = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [0.0, 1.0]), (30, [5.0, 5.0])],
        "code_id long, embedding array<double>",
    )
    q = corpus.filter(F.col("vec_id") == 3).select("embedding")
    got = SIM.pq_search_adc(corpus, cb, q, k=3, n_sub=1, dim=2).collect()
    assert [r["vec_id"] for r in got] == [3, 1, 2]
    assert got[0]["codes"] == "30" and got[0]["adc_dist"] == 0.0
    assert got[1]["codes"] == "10"


def test_random_projection_preserves_pairwise_distance(spark):
    import math
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    proj = {
        r["vec_id"]: r["projected"]
        for r in SIM.random_project(df, out_dim=16).collect()
    }
    orig = dict(rows)

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    ratios = []
    for i in range(20):
        for j in range(i + 1, 20):
            ratios.append(d2(proj[i], proj[j]) / d2(orig[i], orig[j]))
    mean = sum(ratios) / len(ratios)
    # JL: E[ratio]=1; with 16 components spread is wide per pair but the
    # mean over 190 pairs concentrates
    assert 0.7 < mean < 1.3
    assert all(r > 0.05 for r in ratios)
    # determinism: same input -> identical doubles
    again = {
        r["vec_id"]: r["projected"]
        for r in SIM.random_project(df, out_dim=16).collect()
    }
    assert again == proj
