"""Semantic invariants for the round-6 operators — third-implementation
differentials in plain Python, so a shared Spark/DuckDB bug cannot hide
behind engine agreement."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from project_bigdata_spark.plans.catalog import load_all


def _q(name):
    return load_all()[name].builder


def _hourly_series(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias(
                "t"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5)
                ).otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            ).alias("c"),
        )
        .collect()
    )
    out = defaultdict(list)
    for r in rows:
        out[r.event_type].append((r.t, r.n, int(r.c)))
    for v in out.values():
        v.sort()
    return out


def test_kendall_tau_matches_python(spark, sf_dir):
    series = _hourly_series(spark, sf_dir)
    rows = {r.event_type: r for r in _q("kendall_tau_hourly")(spark, sf_dir).collect()}
    assert set(rows) == set(series)
    for et, pts in series.items():
        us = [p[1] for p in pts]
        vs = [p[2] for p in pts]
        n = len(pts)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                du, dv = us[i] - us[j], vs[i] - vs[j]
                s += (du * dv > 0) - (du * dv < 0)
        n0 = n * (n - 1) // 2
        tie = lambda xs: sum(  # noqa: E731
            c * (c - 1) // 2
            for c in defaultdict(
                int, {x: xs.count(x) for x in set(xs)}
            ).values()
        )
        tu, tv = tie(us), tie(vs)
        r = rows[et]
        assert r.nc_minus_nd == s
        if n0 - tu > 0 and n0 - tv > 0:
            tau = s / (math.sqrt(n0 - tu) * math.sqrt(n0 - tv))
            assert abs(r.tau_b - tau) < 1e-5
            assert -1.0 <= r.tau_b <= 1.0


def test_pacf_matches_python(spark, sf_dir):
    series = _hourly_series(spark, sf_dir)
    rows = {r.event_type: r for r in _q("pacf_profile")(spark, sf_dir).collect()}
    for et, r in rows.items():
        xs = [p[2] for p in series[et]]
        n = len(xs)
        m = sum(xs) / n
        den = sum((x - m) ** 2 for x in xs)
        if den == 0:
            continue
        rk = [
            sum((xs[i] - m) * (xs[i + k] - m) for i in range(n - k)) / den
            for k in (1, 2, 3)
        ]
        r1, r2, r3 = rk
        assert abs(r.pacf1 - r1) < 1e-5
        assert abs(r.pacf2 - (r2 - r1 * r1) / (1 - r1 * r1)) < 1e-5
        den3 = 1 - 2 * r1 * r1 - r2 * r2 + 2 * r1 * r1 * r2
        num3 = r3 - 2 * r1 * r2 - r1 * r1 * r3 + r1 * r2 * r2 + r1 ** 3
        assert abs(r.pacf3 - num3 / den3) < 1e-5


def test_friedman_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("unix_timestamp(date_trunc('day', ts)) div 86400").alias(
                "day"
            ),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5)
                ).otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            ).alias("c")
        )
        .collect()
    )
    by_day = defaultdict(dict)
    types = set()
    for r in ev:
        by_day[r.day][r.event_type] = int(r.c)
        types.add(r.event_type)
    k = len(types)
    blocks = [d for d, vals in by_day.items() if len(vals) == k]
    rank_sums = defaultdict(float)
    for d in blocks:
        vals = by_day[d]
        svals = sorted(vals.values())
        for et, c in vals.items():
            lo = svals.index(c) + 1
            ties = svals.count(c)
            rank_sums[et] += lo + (ties - 1) / 2.0  # midrank
    n = len(blocks)
    q = 12.0 / (n * k * (k + 1)) * sum(
        rj ** 2 for rj in rank_sums.values()
    ) - 3.0 * n * (k + 1)
    row = _q("friedman_daily_types")(spark, sf_dir).first()
    assert row.n_blocks == n and row.k_treatments == k and row.df == k - 1
    assert abs(row.q_stat - q) < 1e-4
    assert row.decision in ("types_differ", "no_evidence")


def test_overdispersion_matches_python(spark, sf_dir):
    series = _hourly_series(spark, sf_dir)
    rows = {
        r.event_type: r
        for r in _q("overdispersion_test")(spark, sf_dir).collect()
    }
    for et, r in rows.items():
        xs = [p[1] for p in series[et]]
        n = len(xs)
        s = sum(xs)
        mean = s / n
        var = sum((x - mean) ** 2 for x in xs) / (n - 1)
        assert r.n_hours == n
        assert abs(r.mean_per_hour - mean) < 1e-5
        assert abs(r.vmr - var / mean) < 1e-4
        # the synthetic generator draws uniform hours: VMR near/below 1
        disp = (n - 1) * var / mean
        df = n - 1
        z = 1.6448536269514722
        wh = df * (1 - 2 / (9 * df) + z * math.sqrt(2 / (9 * df))) ** 3
        want = "overdispersed" if disp > wh else "poisson_ok"
        assert r.decision == want


def _doc_scores(spark, sf_dir):
    """Independent replay of the stub cosine + lexical relevance."""
    import hashlib

    from project_bigdata_spark.sources import load_table

    def emb(text):
        h = hashlib.md5(text.encode()).hexdigest()
        return [int(h[4 * k : 4 * k + 4], 16) / 3.27675e4 - 1.0 for k in range(8)]

    q = emb("spark window join")
    qn = math.sqrt(sum(x * x for x in q))
    rows = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    out = []
    for r in rows:
        e = emb(r.text)
        en = math.sqrt(sum(x * x for x in e))
        cos = sum(a * b for a, b in zip(e, q)) / (en * qn)
        words = set(r.text.lower().split())
        rel = sum(t in words for t in ("spark", "window", "join"))
        c6 = math.floor(cos * 1e6 + 0.5) if cos >= 0 else -math.floor(-cos * 1e6 + 0.5)
        out.append((r.doc_id, int(c6), rel))
    return out


def test_ndcg_matches_python(spark, sf_dir):
    scored = _doc_scores(spark, sf_dir)
    topd = sorted(scored, key=lambda x: (-x[1], x[0]))[:10]
    topi = sorted(scored, key=lambda x: (-x[2], x[0]))[:10]
    dcg = sum(r[2] / math.log2(i + 2) for i, r in enumerate(topd))
    idcg = sum(r[2] / math.log2(i + 2) for i, r in enumerate(topi))
    row = _q("ndcg_eval")(spark, sf_dir).first()
    assert row.k == 10
    assert abs(row.dcg - dcg) < 1e-4
    assert abs(row.idcg - idcg) < 1e-4
    if idcg > 0:
        assert abs(row.ndcg - dcg / idcg) < 1e-4
        assert 0.0 <= row.ndcg <= 1.0
    assert row.dcg <= row.idcg + 1e-9  # ideal ordering dominates


def test_precision_recall_matches_python(spark, sf_dir):
    scored = _doc_scores(spark, sf_dir)
    ranked = sorted(scored, key=lambda x: (-x[1], x[0]))
    n_rel = sum(1 for r in scored if r[2] >= 2)
    rows = {r.k: r for r in _q("precision_recall_at_k")(spark, sf_dir).collect()}
    assert set(rows) == {5, 10, 20}
    prev_recall = -1.0
    for k in (5, 10, 20):
        hits = sum(1 for r in ranked[:k] if r[2] >= 2)
        r = rows[k]
        assert r.hits == hits and r.n_rel == n_rel
        assert abs(r.precision_at_k - hits / k) < 1e-6
        if n_rel:
            assert abs(r.recall_at_k - hits / n_rel) < 1e-6
            assert r.recall_at_k >= prev_recall  # monotone in k
            prev_recall = r.recall_at_k


def test_roc_points_match_python(spark, sf_dir):
    from project_bigdata_spark.operators import text as TX

    scored = (
        load_all()["quality_scores"].builder(spark, sf_dir).collect()
    )
    # quality_scores rounds to 4 decimals; recompute exact s6 instead
    rows = {round(r.threshold, 1): r for r in _q("roc_curve_points")(spark, sf_dir).collect()}
    assert len(rows) == 9
    prev_tpr, prev_fpr = 1.1, 1.1
    for i in range(1, 10):
        r = rows[round(i / 10, 1)]
        assert r.tp + (r.n_pos - r.tp) == r.n_pos
        assert 0 <= r.tpr <= 1 and 0 <= r.fpr <= 1
        # raising the threshold can only shrink the positive set
        assert r.tpr <= prev_tpr + 1e-12 and r.fpr <= prev_fpr + 1e-12
        prev_tpr, prev_fpr = r.tpr, r.fpr
    assert rows[0.1].tp + rows[0.1].fp >= rows[0.9].tp + rows[0.9].fp


def test_calibration_bins_match_python(spark, sf_dir):
    rows = _q("calibration_bins")(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    docs = load_all()["quality_scores"].builder(spark, sf_dir).count()
    assert total == docs  # every document lands in exactly one bin
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.en_rate <= 1.0
        assert abs(r.gap - abs(r.mean_score - r.en_rate)) < 1e-5
        # mean score must sit inside its bin (clamped top bin excepted)
        if r.bin < 9:
            assert r.bin / 10 - 1e-6 <= r.mean_score <= (r.bin + 1) / 10 + 1e-6
