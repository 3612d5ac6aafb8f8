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


def _copurchase_graph(spark, sf_dir):
    """Independent replay of the co-purchase graph (edges u<v, >=2 shared
    orders) in plain Python."""
    from project_bigdata_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in rows:
        by_order[r.l_orderkey].add(r.l_partkey)
    pair_orders = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_orders[(ps[i], ps[j])] += 1
    edges = {p for p, c in pair_orders.items() if c >= 2}
    nbr = defaultdict(set)
    for u, v in edges:
        nbr[u].add(v)
        nbr[v].add(u)
    return edges, nbr


def test_jaccard_link_prediction_matches_python(spark, sf_dir):
    edges, nbr = _copurchase_graph(spark, sf_dir)
    cap = 64
    # candidates via sub-hub wedges (the documented generation rule)
    cands = defaultdict(int)
    for w, ns in nbr.items():
        if not (2 <= len(ns) <= cap):
            continue
        ns_s = sorted(ns)
        for i in range(len(ns_s)):
            for j in range(i + 1, len(ns_s)):
                cands[(ns_s[i], ns_s[j])] += 1
    scored = []
    for (u, v), common in cands.items():
        if (u, v) in edges:
            continue
        union = len(nbr[u]) + len(nbr[v]) - common
        j6 = math.floor(common * 1e6 / union + 0.5)
        scored.append((-j6, u, v, common, union))
    scored.sort()
    rows = _q("jaccard_link_prediction")(spark, sf_dir).collect()
    assert len(rows) == min(20, len(scored))
    for r, (nj6, u, v, common, union) in zip(rows, scored[:20]):
        assert (r.u, r.v, r.n_common, r.n_union) == (u, v, common, union)
        assert abs(r.jaccard - (-nj6) / 1e6) < 5.1e-5  # output rounds to 4dp
        assert 0.0 < r.jaccard <= 1.0


def test_k_core_matches_python(spark, sf_dir):
    edges, nbr = _copurchase_graph(spark, sf_dir)
    cur = {tuple(e) for e in edges}
    expected = []
    for _ in range(3):
        deg = defaultdict(int)
        for u, v in cur:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= 3}
        cur = {(u, v) for u, v in cur if u in keep and v in keep}
        nodes = {n for e in cur for n in e}
        expected.append((len(nodes), len(cur)))
    rows = sorted(
        _q("k_core_decomposition")(spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    assert [(r.n_nodes, r.n_edges) for r in rows] == expected
    # peeling is monotone: censuses never grow
    for a, b in zip(expected, expected[1:]):
        assert b[0] <= a[0] and b[1] <= a[1]


def test_naive_bayes_matches_python(spark, sf_dir):
    import hashlib

    from project_bigdata_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    snap = lambda x: math.floor(x * 1e9 + 0.5) if x >= 0 else -math.floor(  # noqa: E731
        -x * 1e9 + 0.5
    )
    train, test = [], []
    for r in docs:
        b = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:2], 16)
        (train if b < 204 else test).append(r)
    counts = defaultdict(lambda: defaultdict(int))
    nl = defaultdict(int)
    dl = defaultdict(int)
    vocab = set()
    for r in train:
        dl[r.lang] += 1
        for w in r.text.lower().split():
            counts[r.lang][w] += 1
            nl[r.lang] += 1
            vocab.add(w)
    V, D = len(vocab), len(train)
    langs = sorted(nl)
    confusion = defaultdict(int)
    for r in test:
        words = defaultdict(int)
        for w in r.text.lower().split():
            words[w] += 1
        best = None
        for lang in langs:
            s9 = snap(math.log(dl[lang] / D))
            u9 = snap(math.log(1.0 / (nl[lang] + V)))
            for w, k in words.items():
                if w in counts[lang]:
                    s9 += k * snap(
                        math.log((counts[lang][w] + 1) / (nl[lang] + V))
                    )
                else:
                    s9 += k * u9
            if best is None or (-s9, lang) < best:
                best = (-s9, lang)
        confusion[(r.lang, best[1])] += 1
    rows = _q("naive_bayes_eval")(spark, sf_dir).collect()
    got = {(r.lang_true, r.predicted): r.n for r in rows}
    assert got == dict(confusion)
    # the classifier must beat chance on its own training distribution
    correct = sum(n for (t, p), n in got.items() if t == p)
    assert correct / max(1, len(test)) > 1.0 / max(2, len(langs))


def test_matryoshka_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    vecs = [
        list(r.embedding)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    ]
    rows = {r.m_dims: r for r in _q("matryoshka_truncation_audit")(spark, sf_dir).collect()}
    assert set(rows) == {8, 16, 32, 64}
    prev = -1.0
    for m in (8, 16, 32, 64):
        r = rows[m]
        assert r.n_vectors == len(vecs)
        rets = []
        for v in vecs:
            vd = [float(x) for x in v]
            full = math.sqrt(sum(x * x for x in vd))
            part = math.sqrt(sum(x * x for x in vd[:m]))
            rets.append(part / full)
        avg = sum(rets) / len(rets)
        assert abs(r.avg_norm_retention - avg) < 1e-4
        assert abs(r.min_norm_retention - min(rets)) < 1e-4
        # retention grows with m; m=64 is the whole vector
        assert r.avg_norm_retention >= prev
        prev = r.avg_norm_retention
    assert abs(rows[64].avg_norm_retention - 1.0) < 1e-6
    assert abs(rows[64].energy_share - 1.0) < 1e-6


def test_shingle_curve_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    texts = [
        r.text
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    rows = {r.k_words: r for r in _q("shingle_granularity_curve")(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3, 5, 8}
    for k in (1, 2, 3, 5, 8):
        total, distinct = 0, set()
        for t in texts:
            ws = [w for w in t.lower().split() if w]
            if k == 1:
                sh = ws
            elif len(ws) >= k:
                sh = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
            else:
                sh = [t.lower()]
            total += len(sh)
            distinct.update(sh)
        r = rows[k]
        assert (r.total_shingles, r.distinct_shingles) == (total, len(distinct))
        assert abs(
            r.dup_occurrence_share - (total - len(distinct)) / total
        ) < 1e-6


def test_csv_malformed_audit_matches_python(spark, sf_dir):
    import hashlib

    from project_bigdata_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    per = defaultdict(lambda: [0, 0, 0])  # rows, corrupt, clean cents
    for r in ev:
        b = int(hashlib.md5(str(r.event_id).encode()).hexdigest()[:2], 16)
        p = per[r.event_type]
        p[0] += 1
        if b % 16 == 0:
            p[1] += 1
        else:
            c = (
                math.floor(r.value * 100 + 0.5)
                if r.value >= 0
                else -math.floor(-r.value * 100 + 0.5)
            )
            p[2] += c
    rows = _q("csv_malformed_audit")(spark, sf_dir).collect()
    assert len(rows) == len(per)
    for r in rows:
        n, nc, cents = per[r.event_type]
        assert (r.n_rows, r.n_corrupt) == (n, nc)
        assert abs(r.clean_value_sum - cents / 100) < 1e-9


def test_mutual_information_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    cells = {(r.event_type, r.h): r.n for r in ev}
    nt = sum(cells.values())
    nr = defaultdict(int)
    nc = defaultdict(int)
    for (t, h), n in cells.items():
        nr[t] += n
        nc[h] += n
    mi = sum(
        n / nt * math.log(n * nt / (nr[t] * nc[h]))
        for (t, h), n in cells.items()
    )
    hx = -sum(v / nt * math.log(v / nt) for v in nr.values())
    row = _q("mutual_information_profile")(spark, sf_dir).first()
    assert row.n_events == nt
    assert abs(row.mi_nats - mi) < 1e-4
    assert abs(row.h_type_nats - hx) < 1e-4
    assert abs(row.uncertainty_coefficient - mi / hx) < 1e-4
    # MI is non-negative and bounded by the type entropy
    assert -1e-9 <= row.mi_nats <= row.h_type_nats + 1e-9
    assert 0.0 <= row.uncertainty_coefficient <= 1.0


def test_zipf_slope_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    texts = [
        r.text
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    freq = defaultdict(int)
    for t in texts:
        for w in t.lower().split():
            if w:
                freq[w] += 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    pts = [
        (math.log(i + 1), math.log(f)) for i, (_, f) in enumerate(ranked)
    ]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    syy = sum(p[1] ** 2 for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    row = _q("zipf_slope_fit")(spark, sf_dir).first()
    assert row.n_ranks == n
    assert abs(row.zipf_slope - slope) < 1e-4
    assert abs(row.r_squared - r2) < 1e-4
    assert row.zipf_slope < 0.0 and 0.0 <= row.r_squared <= 1.0
