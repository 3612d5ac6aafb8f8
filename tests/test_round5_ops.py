"""Semantic invariants for the round-5 curation/monitoring operators —
properties the DuckDB differential cannot express (it proves engine
agreement, not that the SHARED semantics are the intended ones)."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from project_bigdata_spark.plans.catalog import load_all
from project_bigdata_spark.plans.curation_queries import BENFORD_P


def _q(name):
    return load_all()[name].builder


def test_benford_is_a_proper_audit(spark, sf_dir):
    rows = _q("benford_audit")(spark, sf_dir).collect()
    assert {r.digit for r in rows} == set(range(1, 10))
    # shares sum to 1 on both columns; chi2 terms are non-negative
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 2e-3
    assert abs(sum(r.expected_share for r in rows) - 1.0) < 2e-3
    assert all(r.chi2_term >= 0 for r in rows)
    # the expected column IS Benford's law
    for r in rows:
        assert abs(r.expected_share - math.log10(1 + 1 / r.digit)) < 1e-4


def test_cusum_matches_sequential_recursion(spark, sf_dir):
    """The prefix-sum/prefix-min rewrite must equal the literal
    S_t = max(0, S_{t-1} + dev_t) recursion, replayed in Python."""
    rows = _q("cusum_drift")(spark, sf_dir).collect()
    assert rows
    series = defaultdict(list)
    for r in rows:
        series[r.event_type].append(r)
    for et, rs in series.items():
        rs.sort(key=lambda r: r.hour_ts)
        cents = [round(r.hourly_value * 100) for r in rs]
        t, tot = len(cents), sum(cents)
        s = 0
        for r, x in zip(rs, cents):
            s = max(0, s + 4 * t * x - 5 * tot)
            assert abs(r.cusum - s / (400 * t)) < 1e-3, (et, r.hour_ts)
            assert r.alarm == (1 if s > 8 * tot else 0)
            assert r.cusum >= 0


def test_kl_nonnegative_per_source(spark, sf_dir):
    rows = _q("domain_kl_divergence")(spark, sf_dir).collect()
    assert len(rows) == 20  # every source scored
    for r in rows:
        assert r.kl_top256 >= 0  # proper distributions -> Gibbs holds
        assert r.n_vocab_tokens > 0


def test_containment_bounds_and_classes(spark, sf_dir):
    rows = _q("minhash_containment")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.jaccard <= 1
        assert 0 <= r.containment_a <= 1 and 0 <= r.containment_b <= 1
        # Jaccard can never exceed either one-sided containment
        assert r.jaccard <= r.containment_a + 1e-9
        assert r.jaccard <= r.containment_b + 1e-9
        if r.relation == "duplicate":
            assert r.jaccard >= 0.8 - 1e-9
        elif r.relation == "a_contains_b":
            assert r.containment_b >= 0.9 - 1e-9
        elif r.relation == "b_contains_a":
            assert r.containment_a >= 0.9 - 1e-9
        else:
            assert r.relation == "overlap"


def test_bitext_pairs_are_mutual_and_margined(spark, sf_dir):
    df = _q("margin_bitext_mining")(spark, sf_dir)
    rows = df.collect()
    assert rows
    # mutual top-1 => each side appears at most once
    a_ids = [r.a_id for r in rows]
    b_ids = [r.b_id for r in rows]
    assert len(a_ids) == len(set(a_ids))
    assert len(b_ids) == len(set(b_ids))
    for r in rows:
        assert r.margin > 1.05 - 1e-9
        assert -1.000001 <= r.cosine <= 1.000001
        assert r.a_id % 20 == 0 and r.b_id % 20 != 0


def test_kmeans_matches_numpy_replication(spark, sf_dir):
    """Third-implementation differential: replay the exact algorithm
    (1e-6 grid snap, init = first 8 vectors, 2 Lloyd rounds, (dist, cid)
    argmin) in NumPy and require identical assignments."""
    import numpy as np

    out = {r.vec_id: r for r in _q("kmeans_lloyd")(spark, sf_dir).collect()}
    raw = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in raw])
    order = np.argsort(ids)
    ids = ids[order]
    v = np.array([raw[i].embedding for i in order], dtype=np.float64)
    vi = np.floor(np.abs(v) * 1e6 + 0.5) * np.sign(v)  # grid ints
    vd = vi / 1e6
    cents = vd[ids < 8]
    for it in range(3):
        d = ((vd[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties: lowest cid, matches (d9, cid)
        if it == 2:
            break
        cents = np.stack(
            [
                (vi[assign == c].sum(axis=0) / (assign == c).sum()) / 1e6
                for c in range(8)
            ]
        )
    mism = [
        (int(i), int(a), out[int(i)].cluster)
        for i, a in zip(ids, assign)
        if out[int(i)].cluster != int(a)
    ]
    assert not mism, mism[:5]
    assert len({r.cluster for r in out.values()}) > 1
    assert all(r.dist_sq >= 0 for r in out.values())


def test_hilbert_locality_beats_random(spark, sf_dir):
    """Hilbert buckets must be LOCAL: the mean per-bucket coordinate
    span has to be far below the full 0..255 range (a random bucketing
    of the same rows would span ~the whole range)."""
    rows = _q("hilbert_layout")(spark, sf_dir).collect()
    assert rows
    total = sum(r.n_rows for r in rows)
    assert total > 0
    wx = sum(r.x_span * r.n_rows for r in rows) / total
    wy = sum(r.y_span * r.n_rows for r in rows) / total
    # each 256-cell curve segment fits in a small tile; row-weighted
    # mean span per axis stays well under half the 256-wide domain
    assert wx < 128 and wy < 128, (wx, wy)
    for r in rows:
        assert 0 <= r.bucket < 256
        assert r.x_span <= 255 and r.y_span <= 255


def test_pca_matches_numpy_eigenvector(spark, sf_dir):
    """Differential vs numpy's exact eigendecomposition: the 8-round
    power-iteration loading vector must be unit-norm and aligned (up to
    sign) with the true top eigenvector of the SAME macro between-class
    scatter (1e-6-grid vectors, 1e-9-grid class means)."""
    import numpy as np

    rows = _q("pca_power_iteration")(spark, sf_dir).collect()
    assert len(rows) == 64
    w = np.array([r.loading for r in sorted(rows, key=lambda r: r.dim)])
    assert abs(np.linalg.norm(w) - 1.0) < 1e-4
    raw = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("label", "embedding")
        .collect()
    )
    v = np.array([r.embedding for r in raw], dtype=np.float64)
    vg = np.floor(np.abs(v) * 1e6 + 0.5) * np.sign(v)  # 1e-6-grid ints
    lab = np.array([r.label for r in raw])
    classes = sorted(set(lab.tolist()))
    means = np.stack([vg[lab == c].mean(axis=0) / 1e6 for c in classes])
    m9 = np.floor(np.abs(means) * 1e9 + 0.5) * np.sign(means)
    d = len(classes) * m9 - m9.sum(axis=0)  # exact centering
    bmat = d.T @ d
    evals, evecs = np.linalg.eigh(bmat)
    cos = abs(float(np.dot(w, evecs[:, -1])))
    assert cos > 0.97, cos  # 8 rounds close the measured spectral gap
    ev = rows[0].ev_ratio
    assert 0 < ev <= 1
    assert all(r.ev_ratio == ev for r in rows)


def test_golden_record_rules(spark, sf_dir):
    rows = _q("golden_record_survivorship")(spark, sf_dir).collect()
    assert rows
    langs = {
        r.lang
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang")
        .distinct()
        .collect()
    }
    ids = [r.cluster_id for r in rows]
    assert len(ids) == len(set(ids))  # one golden record per cluster
    for r in rows:
        assert r.n_members >= 2  # clusters come from dup pairs
        # cluster_id is the min member id, so it bounds the canonical id
        assert r.cluster_id <= r.canonical_doc_id
        assert r.canonical_chars > 0
        assert r.lang_vote in langs
        assert 1 <= r.n_sources <= r.n_members


def test_hilbert_chain_is_bijective_with_unit_steps(spark):
    """Exhaustive check of the unrolled xy2d expression chain itself,
    over the ENTIRE 256x256 grid: the produced d values must be a
    perfect permutation of 0..65535 (no collisions, no gaps) and
    consecutive d must map to Manhattan-adjacent cells (the defining
    Hilbert locality property)."""
    from project_bigdata_spark.plans.curation_queries import hilbert_chain

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
        (F.col("id") % 256).alias("x0"),
        (F.col("id") / 256).cast("long").alias("y0"),
        F.lit(0).alias("d"),
    )
    out = hilbert_chain(grid, carry=["x0", "y0"]).select("x0", "y0", "d")
    rows = out.collect()
    ds = sorted(r.d for r in rows)
    assert ds == list(range(65536))  # bijection
    inv = {r.d: (r.x0, r.y0) for r in rows}
    for d in range(65535):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d  # unit curve steps


def test_holt_matches_python_recursion(spark, sf_dir):
    """Third-implementation differential: replay the exact Holt
    recursion (l2=x2, b2=x2-x1 init; alpha=0.3, beta=0.1) in Python
    over the same hourly series and require agreement to the rounding
    grid."""
    rows = _q("holt_forecast")(spark, sf_dir).collect()
    assert rows
    from project_bigdata_spark.sources import load_table

    hourly = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.date_trunc("hour", "ts").alias("h"),
            "value",
        )
        .groupBy("event_type", "h")
        .agg(
            F.sum(
                F.when(
                    F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5)
                ).otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            ).alias("cents")
        )
        .collect()
    )
    series = defaultdict(list)
    for r in hourly:
        series[r.event_type].append((r.h, r.cents / 100.0))
    for r in rows:
        xs = [x for _, x in sorted(series[r.event_type])]
        assert r.n_hours == len(xs)
        level, b = xs[1], xs[1] - xs[0]
        k, sse = 2.0, 0.0
        for xv in xs[2:]:
            e = xv - (level + b)
            lp = 0.3 * xv + 0.7 * (level + b)
            b = 0.1 * (lp - level) + 0.9 * b
            level = lp
            k += 1.0
            sse += e * e
        assert abs(r.level - level) < 1e-3, r.event_type
        assert abs(r.trend - b) < 1e-3
        assert abs(r.forecast_1h - (level + b)) < 1e-3
        assert abs(r.forecast_24h - (level + 24 * b)) < 2e-3
        assert abs(r.rmse_1step - (sse / (k - 2)) ** 0.5) < 1e-3


def test_theil_sen_matches_python_median(spark, sf_dir):
    """Third-implementation differential: recompute the Theil-Sen lower
    median of pairwise slopes in Python over the same hourly series."""
    from project_bigdata_spark.sources import load_table

    rows = _q("theil_sen_trend")(spark, sf_dir).collect()
    assert rows
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias(
                "th"
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
    series = defaultdict(list)
    for r in hourly:
        series[r.event_type].append((r.th, r.c))
    for r in rows:
        pts = sorted(series[r.event_type])
        t0 = pts[0][0]
        pts = [(t - t0, c) for t, c in pts]
        slopes = sorted(
            (
                (cj - ci) / (tj - ti),
                cj - ci,
                tj - ti,
                ti,
                tj,
            )
            for i, (ti, ci) in enumerate(pts)
            for tj, cj in pts[i + 1 :]
        )
        assert r.n_pairs == len(slopes)
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        assert abs(r.sen_slope_per_hour - med / 100) < 1e-5, r.event_type
        resid = sorted(
            (c - med * t, t) for t, c in pts
        )
        icept = resid[(len(resid) + 1) // 2 - 1][0]
        assert abs(r.sen_intercept - icept / 100) < 1e-3


def test_mann_kendall_matches_python(spark, sf_dir):
    """Third-implementation differential: recompute S, the tie-corrected
    variance, and Z in Python over the same hourly series."""
    from project_bigdata_spark.sources import load_table

    rows = _q("mann_kendall_test")(spark, sf_dir).collect()
    assert rows
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias(
                "t"
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
    series = defaultdict(list)
    for r in hourly:
        series[r.event_type].append((r.t, r.c))
    for r in rows:
        xs = [c for _, c in sorted(series[r.event_type])]
        n = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        assert r.s_stat == s and r.n_hours == n
        from collections import Counter

        tie = sum(
            tg * (tg - 1) * (2 * tg + 5)
            for tg in Counter(xs).values()
            if tg > 1
        )
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18
        z = 0.0 if s == 0 else (s - 1 if s > 0 else s + 1) / var**0.5
        assert abs(r.z_stat - z) < 1e-3
        expected = (
            "increasing"
            if z > 1.96
            else "decreasing"
            if z < -1.96
            else "no_trend"
        )
        assert r.trend == expected, (r.event_type, z, r.trend)


def test_ngram_novelty_matches_python(spark, sf_dir):
    """Recompute global trigram counts and per-slice novelty in Python."""
    from project_bigdata_spark.sources import load_table
    from collections import Counter

    rows = _q("ngram_novelty")(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "source", "text"
    ).collect()
    global_cnt = Counter()
    per_slice = defaultdict(list)
    n_docs = Counter()
    for d in docs:
        n_docs[(d.lang, d.source)] += 1
        ws = [w for w in d.text.lower().split() if w]
        tris = [
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        ] if len(ws) >= 3 else []
        global_cnt.update(tris)
        per_slice[(d.lang, d.source)].extend(tris)
    for r in rows:
        key = (r.lang, r.source)
        tris = per_slice.get(key, [])
        assert r.n_docs == n_docs[key]
        assert r.n_trigrams == len(tris)
        novel = sum(1 for t in tris if global_cnt[t] == 1)
        assert r.n_novel == novel
        if tris:
            assert abs(r.novelty_rate - novel / len(tris)) < 1e-5
        else:
            assert r.novelty_rate is None
    # every (lang, source) present
    assert {(r.lang, r.source) for r in rows} == set(n_docs)


def test_sequential_patterns_matches_python(spark, sf_dir):
    """Replay 30-min sessionization + exists-before pair support in
    Python over the raw events."""
    from project_bigdata_spark.sources import load_table

    rows = _q("sequential_patterns")(spark, sf_dir).collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
        )
        .collect()
    )
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append((e.us, e.event_id, e.event_type))
    sessions = []
    for u, es in by_user.items():
        es.sort()
        cur = []
        last = None
        for us, _, et in es:
            if last is not None and us - last <= 30 * 60 * 1_000_000:
                cur.append((us, et))
            else:
                if cur:
                    sessions.append(cur)
                cur = [(us, et)]
            last = us
        sessions.append(cur)
    n_total = len(sessions)
    from collections import Counter

    with_t = Counter()
    support = Counter()
    for s in sessions:
        first = {}
        last_ = {}
        for us, et in s:
            first.setdefault(et, us)
            first[et] = min(first[et], us)
            last_[et] = max(last_.get(et, us), us)
        for et in first:
            with_t[et] += 1
        for a in first:
            for b in last_:
                if a != b and first[a] < last_[b]:
                    support[(a, b)] += 1
    seen = {(r.antecedent, r.consequent): r for r in rows}
    assert set(seen) == set(support)
    for (a, b), n in support.items():
        r = seen[(a, b)]
        assert r.support_sessions == n
        assert r.sessions_with_a == with_t[a]
        assert r.sessions_with_b == with_t[b]
        assert abs(r.confidence - n / with_t[a]) < 1e-5
        assert abs(r.lift - n * n_total / (with_t[a] * with_t[b])) < 1e-4


def test_word_pmi_matches_python(spark, sf_dir):
    import math
    from collections import Counter
    from itertools import combinations

    from project_bigdata_spark.plans.curation_queries import (
        PMI_MIN_DOCS,
        PMI_TOP_K,
    )
    from project_bigdata_spark.sources import load_table

    rows = _q("word_pmi")(spark, sf_dir).collect()
    assert 0 < len(rows) <= PMI_TOP_K
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    n = len(docs)
    df = Counter()
    both = Counter()
    for d in docs:
        ws = sorted({w for w in d.text.lower().split() if w})
        df.update(ws)
        both.update(combinations(ws, 2))
    scored = [
        (n * c / (df[a] * df[b]), a, b, c)
        for (a, b), c in both.items()
        if c >= PMI_MIN_DOCS
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    top = scored[:PMI_TOP_K]
    assert [(r.w1, r.w2) for r in rows] == [(a, b) for _, a, b, _ in top] or {
        (r.w1, r.w2) for r in rows
    } == {(a, b) for _, a, b, _ in top}
    by_pair = {(r.w1, r.w2): r for r in rows}
    for lift, a, b, c in top:
        r = by_pair[(a, b)]
        assert r.n_docs_both == c
        assert abs(r.lift - lift) < 1e-3
        assert abs(r.pmi - math.log(lift)) < 1e-3


def test_decision_stump_matches_exhaustive_python(spark, sf_dir):
    """Check the picked threshold maximizes the split criterion over the
    decile candidates, recomputed exactly with Fractions."""
    from fractions import Fraction

    from project_bigdata_spark.sources import load_table

    rows = _q("decision_stump")(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            F.when(F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5))
            .otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            .alias("c"),
        )
        .collect()
    )
    data = sorted((e.c, e.event_id, e.event_type) for e in ev)
    n = len(data)
    # candidate thresholds: deciles of the 1000 hash-smallest rows
    import hashlib

    sample = sorted(
        (hashlib.md5(str(e.event_id).encode()).hexdigest(), e.event_id, e.c)
        for e in ev
    )[:1000]
    sample_c = sorted((c, eid) for _, eid, c in sample)
    m = len(sample_c)
    cands = sorted({sample_c[(i * m) // 10 - 1][0] for i in range(1, 10)})
    classes = sorted({t for _, _, t in data})
    best = None
    for theta in cands:
        lk = defaultdict(int)
        tk = defaultdict(int)
        for c, _, t in data:
            tk[t] += 1
            if c <= theta:
                lk[t] += 1
        nl = sum(lk.values())
        nr = n - nl
        if nl == 0 or nr == 0:
            continue
        f = Fraction(
            sum(v * v for v in lk.values()), nl
        ) + Fraction(sum((tk[t] - lk[t]) ** 2 for t in classes), nr)
        if best is None or f > best[0] or (f == best[0] and theta < best[1]):
            if best is None or f > best[0]:
                best = (f, theta, nl, nr, tk, lk)
    f, theta, nl, nr, tk, lk = best
    assert abs(r.threshold_value - theta / 100) < 1e-3
    assert (r.n_left, r.n_right) == (nl, nr)
    gp = 1 - sum(v * v for v in tk.values()) / n**2
    gl = 1 - sum(v * v for v in lk.values()) / nl**2
    gr = 1 - sum((tk[t] - lk[t]) ** 2 for t in classes) / nr**2
    assert abs(r.gini_parent - gp) < 1e-4
    assert abs(r.gini_left - gl) < 1e-4
    assert abs(r.gini_right - gr) < 1e-4
    assert abs(r.gini_gain - (gp - nl / n * gl - nr / n * gr)) < 1e-4
    assert r.gini_gain >= -1e-9


def test_entropy_rate_matches_python(spark, sf_dir):
    import math

    from project_bigdata_spark.sources import load_table

    rows = _q("entropy_rate")(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append((e.us, e.event_id, e.event_type))
    trans = defaultdict(int)
    for es in by_user.values():
        es.sort()
        for (_, _, a), (_, _, b) in zip(es, es[1:]):
            trans[(a, b)] += 1
    c_i = defaultdict(int)
    for (a, _), c in trans.items():
        c_i[a] += c
    total = sum(trans.values())
    h = sum(c * math.log(c_i[a] / c) for (a, _), c in trans.items()) / total
    k = len({e.event_type for e in ev})
    assert r.n_transitions == total
    assert r.n_states == k
    assert r.n_observed_edges == len(trans)
    assert abs(r.entropy_rate_nats - h) < 1e-4
    assert abs(r.max_entropy_nats - math.log(k)) < 1e-4
    assert 0 <= r.entropy_rate_nats <= r.max_entropy_nats + 1e-9


def test_quality_auc_matches_sklearn_style_python(spark, sf_dir):
    """Replay the tie-corrected Mann-Whitney AUC from raw scores in
    Python and compare; also pin AUC in [0,1] and the one-vs-rest
    complement identity for a two-language reduction."""
    from project_bigdata_spark.operators import text as TX
    from project_bigdata_spark.sources import load_table

    rows = _q("quality_auc")(spark, sf_dir).collect()
    assert rows
    scored = (
        load_table(spark, sf_dir, "documents")
        .select(
            "lang",
            F.when(
                TX.quality_score(F.col("text")) >= 0,
                F.floor(TX.quality_score(F.col("text")) * 1_000_000 + 0.5),
            )
            .otherwise(
                -F.floor(
                    -TX.quality_score(F.col("text")) * 1_000_000 + 0.5
                )
            )
            .alias("s6"),
        )
        .collect()
    )
    data = [(r.s6, r.lang) for r in scored]
    n = len(data)
    ranks = {}
    data_sorted = sorted(x for x, _ in data)
    import bisect

    for r in rows:
        pos = [s for s, l in data if l == r.lang]
        n_pos = len(pos)
        assert r.n_pos == n_pos and r.n_neg == n - n_pos
        su = 0
        for s in pos:
            lo = bisect.bisect_left(data_sorted, s)
            hi = bisect.bisect_right(data_sorted, s)
            su += 2 * lo + (hi - lo) + 1  # doubled midrank
        auc = (su - n_pos * (n_pos + 1)) / (2 * n_pos * (n - n_pos))
        assert abs(r.auc - auc) < 1e-5, r.lang
        assert 0.0 <= r.auc <= 1.0


def test_label_propagation_matches_python(spark, sf_dir):
    """Replay 3 synchronous LPA rounds in pure Python over the same
    co-purchase edges and require the identical community census."""
    from collections import Counter

    from project_bigdata_spark.sources import load_table

    rows = _q("label_propagation")(spark, sf_dir).collect()
    assert rows
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    pair_cnt = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_cnt[(ps[i], ps[j])] += 1
    adj = defaultdict(list)
    for (u, v), c in pair_cnt.items():
        if c >= 2:
            adj[u].append(v)
            adj[v].append(u)
    lab = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n, nbrs in adj.items():
            votes = Counter(lab[m] for m in nbrs)
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            new[n] = best[0]
        lab = new
    census = Counter(lab.values())
    expect = {k: v for k, v in census.items() if v >= 2}
    got = {r.community_id: r.n_members for r in rows}
    assert got == expect
    # communities must be non-trivial: at least one with >= 3 members
    assert rows and max(got.values()) >= 2


def test_adamic_adar_matches_python(spark, sf_dir):
    import math
    from collections import Counter

    from project_bigdata_spark.plans.relational_queries4 import (
        AA_HUB_CAP,
        AA_TOP_K,
    )
    from project_bigdata_spark.sources import load_table

    rows = _q("adamic_adar_links")(spark, sf_dir).collect()
    assert rows
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    pair_cnt = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_cnt[(ps[i], ps[j])] += 1
    edges = {p for p, c in pair_cnt.items() if c >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    scores = Counter()
    commons = Counter()
    for w, nbrs in adj.items():
        d = len(nbrs)
        if not (2 <= d <= AA_HUB_CAP):
            continue
        t9 = math.floor(1e9 / math.log(d) + 0.5)
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                if p not in edges:
                    scores[p] += t9
                    commons[p] += 1
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:AA_TOP_K]
    got = [(r.u, r.v, r.n_common) for r in rows]
    expect = [(u, v, commons[(u, v)]) for (u, v), _ in top]
    assert got == expect or set(got) == set(expect)
    for r, ((u, v), s9) in zip(rows, top):
        assert abs(r.aa_score - s9 / 1e9) < 1e-3
        assert r.aa_score > 0


def test_graph_stats_match_python(spark, sf_dir):
    """Replay assortativity and LPA-modularity in pure Python from the
    same co-purchase graph."""
    from collections import Counter

    from project_bigdata_spark.sources import load_table

    ar = _q("degree_assortativity")(spark, sf_dir).collect()[0]
    mr = _q("modularity_lpa")(spark, sf_dir).collect()[0]
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    pair_cnt = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_cnt[(ps[i], ps[j])] += 1
    edges = {p for p, c in pair_cnt.items() if c >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    deg = {n: len(v) for n, v in adj.items()}
    # assortativity over directed pairs
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    assert ar.n_edges == len(edges)
    if dx <= 0 or dy <= 0:
        assert ar.assortativity is None
    else:
        r = (n * sxy - sx * sy) / (dx**0.5 * dy**0.5)
        assert abs(ar.assortativity - r) < 1e-5
    # LPA labels then modularity
    lab = {nn: nn for nn in adj}
    for _ in range(3):
        new = {}
        for nn, nbrs in adj.items():
            votes = Counter(lab[m] for m in nbrs)
            new[nn] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    m_edges = len(edges)
    e_in = sum(1 for u, v in edges if lab[u] == lab[v])
    dsum = Counter()
    for nn, d in deg.items():
        dsum[lab[nn]] += d
    sum_dc2 = sum(d * d for d in dsum.values())
    q = (4 * m_edges * e_in - sum_dc2) / (4 * m_edges * m_edges)
    assert mr.n_edges == m_edges
    assert mr.intra_edges == e_in
    assert mr.n_communities == len(dsum)
    assert abs(mr.modularity - q) < 1e-5
    assert -1.0 <= mr.modularity <= 1.0
