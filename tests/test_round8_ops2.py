"""Semantic invariants for the round-8 second-wave operators —
third-implementation differentials in plain Python (and numpy for the
closed-form solver), so a shared Spark/DuckDB bug cannot hide behind
engine agreement."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest

from project_bigdata_spark.plans.catalog import load_all


def _q(name):
    return load_all()[name].builder


def _snap(x: float, s: float = 1e9) -> int:
    return math.floor(x * s + 0.5) if x >= 0 else -math.floor(-x * s + 0.5)


def _rnd(x: float, n: int = 6) -> float:
    s = float(10**n)
    return (
        math.floor(x * s + 0.5) / s
        if x >= 0
        else -(math.floor(-x * s + 0.5) / s)
    )


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w != ""]


def _docs(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars", "text")
        .collect()
    )


# ---------------------------------------------------------------------------
# mrr_map_eval — metric math replayed in Python over the attested
# (c6, rel) scoring frame
# ---------------------------------------------------------------------------


def test_mrr_map_eval_matches_python(spark, sf_dir):
    from project_bigdata_spark.plans.eval_queries import _scored

    scored = [
        (r.c6, r.rel, r.doc_id)
        for r in _scored(spark, sf_dir)
        .selectExpr("doc_id", "c6", "rel")
        .collect()
    ]
    ranked = sorted(scored, key=lambda t: (-t[0], t[2]))[:100]
    n_rel = sum(1 for c6, rel, _ in scored if rel >= 2)
    h = 0
    ap9 = 0
    first = None
    for i, (_, rel, _) in enumerate(ranked, start=1):
        if rel >= 2:
            h += 1
            ap9 += _snap(h / i)
            if first is None:
                first = i
    row = _q("mrr_map_eval")(spark, sf_dir).collect()[0]
    assert row.k == 100 and row.n_rel == n_rel
    assert row.first_hit_rank == first
    if first is None:
        assert row.mrr is None
    else:
        assert row.mrr == pytest.approx(_rnd(1.0 / first), abs=1e-9)
    if n_rel == 0:
        assert row.map_at_k is None
    else:
        assert row.map_at_k == pytest.approx(
            _rnd(ap9 / 1e9 / min(n_rel, 100)), abs=1e-9
        )


# ---------------------------------------------------------------------------
# query_likelihood_retrieval
# ---------------------------------------------------------------------------


def test_query_likelihood_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    terms = ("spark", "window", "join")
    mu = 100.0
    cf = Counter()
    total = 0
    perdoc = {}
    for r in docs:
        ws = _words(r.text)
        if not ws:
            continue
        total += len(ws)
        c = Counter(ws)
        perdoc[r.doc_id] = (len(ws), c)
        for t in terms:
            cf[t] += c.get(t, 0)
    scored = []
    for doc_id, (dl, c) in perdoc.items():
        s9 = 0
        hits = 0
        for t in terms:
            tf = c.get(t, 0)
            if tf:
                hits += 1
            s9 += _snap(math.log((tf + mu * cf[t] / total) / (dl + mu)))
        scored.append((-s9, doc_id, s9, hits))
    scored.sort()
    expect = {
        (i + 1): (doc_id, _rnd(s9 / 1e9), hits)
        for i, (_, doc_id, s9, hits) in enumerate(scored[:10])
    }
    got = {
        r["rank"]: (r.doc_id, r.ql_score, r.n_terms_hit)
        for r in _q("query_likelihood_retrieval")(spark, sf_dir).collect()
    }
    assert got == expect


def test_query_likelihood_term_docs_outrank(spark, sf_dir):
    """Every top-10 result should contain at least one query term (the
    smoothed-only score is strictly below any tf > 0 score at equal
    length, and the corpus has hundreds of term-bearing docs)."""
    rows = _q("query_likelihood_retrieval")(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.n_terms_hit >= 1 for r in rows)


# ---------------------------------------------------------------------------
# ridge_normal_equations — independent numpy solve
# ---------------------------------------------------------------------------


def test_ridge_matches_numpy(spark, sf_dir):
    import numpy as np

    from project_bigdata_spark.sources import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_discount", "l_tax", "l_extendedprice")
        .collect()
    )
    q = np.array([int(r.l_quantity) for r in li], dtype=float)
    d = np.array([_snap(r.l_discount, 100) for r in li], dtype=float)
    t = np.array([_snap(r.l_tax, 100) for r in li], dtype=float)
    p = np.array([_snap(r.l_extendedprice, 100) for r in li], dtype=float)
    X = np.column_stack([q, d, t])
    n = len(li)
    Xc = X - X.mean(axis=0)
    pc = p - p.mean()
    A = Xc.T @ Xc + 1000.0 * np.eye(3)
    b = Xc.T @ pc
    w = np.linalg.solve(A, b)
    row = _q("ridge_normal_equations")(spark, sf_dir).collect()[0]
    assert row.n_rows == n
    assert row.w_quantity == pytest.approx(w[0], rel=1e-4, abs=1e-4)
    assert row.w_discount == pytest.approx(w[1], rel=1e-4, abs=1e-4)
    assert row.w_tax == pytest.approx(w[2], rel=1e-4, abs=1e-4)
    icept = (p.mean() - w @ X.mean(axis=0)) / 100
    assert row.intercept_usd == pytest.approx(icept, rel=1e-6, abs=1e-2)
    sse = pc @ pc - 2 * w @ b + w @ (Xc.T @ Xc) @ w
    assert row.r2 == pytest.approx(1 - sse / (pc @ pc), abs=1e-4)


# ---------------------------------------------------------------------------
# logistic_gd_classifier — exact grid replay in Python
# ---------------------------------------------------------------------------


def test_logistic_gd_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("label", "embedding")
        .collect()
    )
    rows = [
        (
            1 if r.label < 5 else 0,
            [_snap(float(r.embedding[j]), 1e6) for j in range(4)],
        )
        for r in emb
        if r.embedding is not None
    ]
    n = len(rows)
    w9 = [0, 0, 0, 0, 0]  # bias + 4 dims, on the 1e-9 grid
    for _ in range(3):
        g9 = [0, 0, 0, 0, 0]
        for y, x6 in rows:
            m = w9[0] / 1e9 + sum(
                (w9[j + 1] / 1e9) * (x6[j] / 1e6) for j in range(4)
            )
            pr = 1.0 / (1.0 + math.exp(-m))
            g9[0] += _snap(y - pr)
            for j in range(4):
                g9[j + 1] += _snap((y - pr) * (x6[j] / 1e6))
        for j in range(5):
            w9[j] += _snap(10.0 * g9[j] / n, 1)
    n_correct = 0
    ll9 = 0
    for y, x6 in rows:
        m = w9[0] / 1e9 + sum(
            (w9[j + 1] / 1e9) * (x6[j] / 1e6) for j in range(4)
        )
        pr = 1.0 / (1.0 + math.exp(-m))
        n_correct += int((m >= 0) == (y == 1))
        ll9 += _snap(math.log(pr if y == 1 else 1.0 - pr))
    row = _q("logistic_gd_classifier")(spark, sf_dir).collect()[0]
    assert row.n_steps == 3 and row.n == n
    assert row.n_pos == sum(y for y, _ in rows)
    got_w = [row.w_bias, row.w1, row.w2, row.w3, row.w4]
    for j in range(5):
        assert got_w[j] == pytest.approx(_rnd(w9[j] / 1e9), abs=1e-9)
    assert row.train_acc == pytest.approx(_rnd(n_correct / n), abs=1e-9)
    assert row.log_loss == pytest.approx(_rnd(-ll9 / 1e9 / n), abs=1e-9)


# ---------------------------------------------------------------------------
# gbm_residual_stumps — exact integer replay in Python
# ---------------------------------------------------------------------------


def test_gbm_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "hour(ts) AS h", "value"
    ).collect()
    res = [(r.h, _snap(r.value, 1e6)) for r in ev]
    expect = []
    for step in range(1, 4):
        best = None
        ss = sum(v * v for _, v in res)
        n = len(res)
        st = sum(v for _, v in res)
        for theta in range(23):
            nl = sum(1 for h, _ in res if h <= theta)
            if nl == 0 or nl == n:
                continue
            sl = sum(v for h, v in res if h <= theta)
            f = (sl / (nl * 1.0)) * sl + ((st - sl) / ((n - nl) * 1.0)) * (
                st - sl
            )
            if best is None or f > best[0]:
                best = (f, theta, nl, sl)
        _, theta, nl, sl = best
        gl6 = _snap(0.5 * sl / nl, 1)
        gr6 = _snap(0.5 * (st - sl) / (n - nl), 1)
        sse_after = (
            ss
            - 2 * (gl6 * sl + gr6 * (st - sl))
            + nl * gl6 * gl6
            + (n - nl) * gr6 * gr6
        )
        expect.append(
            (
                step,
                theta,
                nl,
                n - nl,
                _rnd(gl6 / 1e6),
                _rnd(gr6 / 1e6),
                _rnd(ss / 1e12, 4),
                _rnd(sse_after / 1e12, 4),
            )
        )
        res = [
            (h, v - (gl6 if h <= theta else gr6)) for h, v in res
        ]
    got = [
        (
            r.step,
            r.theta_hour,
            r.n_left,
            r.n_right,
            r.leaf_left,
            r.leaf_right,
            r.sse_before,
            r.sse_after,
        )
        for r in sorted(
            _q("gbm_residual_stumps")(spark, sf_dir).collect(),
            key=lambda r: r.step,
        )
    ]
    for e, g in zip(expect, got):
        assert g[:4] == e[:4]
        for ev_, gv in zip(e[4:], g[4:]):
            assert gv == pytest.approx(ev_, abs=1e-9)
    # boosting must reduce SSE every round
    for _, _, _, _, _, _, before, after in got:
        assert after < before


# ---------------------------------------------------------------------------
# word_burstiness
# ---------------------------------------------------------------------------


def test_word_burstiness_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    stats = defaultdict(lambda: [0, 0, 0, 0])  # stf, df, df2, stf2
    n_docs = len(docs)
    for r in docs:
        for w, tf in Counter(_words(r.text)).items():
            s = stats[w]
            s[0] += tf
            s[1] += 1
            s[2] += int(tf >= 2)
            s[3] += tf * tf
    top = sorted(stats.items(), key=lambda kv: (-kv[1][0], kv[0]))[:50]
    expect = {}
    for w, (stf, df, df2, stf2) in top:
        vmr = (stf2 / (n_docs * 1.0) - (stf / (n_docs * 1.0)) ** 2) / (
            stf / (n_docs * 1.0)
        )
        expect[w] = (
            stf,
            df,
            df2,
            _rnd(df2 / (df * 1.0)),
            _rnd(stf / (df * 1.0)),
            _rnd(vmr),
        )
    got = {
        r.term: (
            r.total_tf,
            r.df,
            r.df2,
            r.burstiness,
            r.mean_tf_in_docs,
            r.vmr,
        )
        for r in _q("word_burstiness")(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for w in expect:
        assert got[w][:3] == expect[w][:3], w
        for a, b in zip(got[w][3:], expect[w][3:]):
            assert a == pytest.approx(b, abs=2e-6), w


# ---------------------------------------------------------------------------
# soft_dedup_weights
# ---------------------------------------------------------------------------


def test_soft_dedup_weights_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = [(r.source, r.n_chars, r.text) for r in docs]
    corpus += [
        ("dup_mirror", r.n_chars, r.text)
        for r in docs
        if r.doc_id % 17 == 3
    ]
    corpus += [
        ("dup_mirror", r.n_chars, r.text)
        for r in docs
        if r.doc_id % 34 == 3
    ]
    k = Counter(text for _, _, text in corpus)
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, ndup, w6 sum, chars*w6
    for src, nc, text in corpus:
        kk = k[text]
        w6 = _snap(1.0 / kk, 1e6)
        a = agg[src]
        a[0] += 1
        a[1] += int(kk >= 2)
        a[2] += w6
        a[3] += nc * w6
    got = {
        r.source: (
            r.n_docs,
            r.n_dup_docs,
            r.effective_docs,
            r.effective_chars,
            r.redundancy,
        )
        for r in _q("soft_dedup_weights")(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for src, (n, ndup, w6, cw6) in agg.items():
        g = got[src]
        assert g[0] == n and g[1] == ndup, src
        assert g[2] == pytest.approx(_rnd(w6 / 1e6), abs=1e-9), src
        assert g[3] == pytest.approx(_rnd(cw6 / 1e6, 2), abs=1e-9), src
        assert g[4] == pytest.approx(_rnd(n / (w6 / 1e6)), abs=2e-6), src
    # the mirror source must exist and every one of its docs be a dup
    assert got["dup_mirror"][0] == got["dup_mirror"][1] > 0


# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets
# ---------------------------------------------------------------------------


def test_ccnet_buckets_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    counts = Counter()
    for r in docs:
        counts.update(_words(r.text))
    total = float(sum(counts.values()))
    vocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4096]
    )
    per_lang = defaultdict(list)
    for r in docs:
        ws = _words(r.text)
        if not ws:
            continue
        s9 = sum(
            _snap(math.log(vocab.get(w, 0.5) / total)) for w in ws
        )
        nw = len(ws)
        ppl4 = _snap(math.exp(-(s9 / 1e9) / nw), 1e4)
        per_lang[r.lang].append((s9 * 1.0 / nw, r.doc_id, ppl4))
    expect = defaultdict(lambda: [0, 0, None, None])
    for lang, lst in per_lang.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        cnt = len(lst)
        for rk, (_, _, ppl4) in enumerate(lst, start=1):
            bkt = int(math.floor((3.0 * (rk - 1)) / cnt))
            name = ["head", "middle", "tail"][bkt]
            e = expect[(lang, name)]
            e[0] += 1
            e[1] += ppl4
            e[2] = ppl4 if e[2] is None else min(e[2], ppl4)
            e[3] = ppl4 if e[3] is None else max(e[3], ppl4)
    got = {
        (r.lang, r.bucket): (r.n_docs, r.mean_ppl, r.min_ppl, r.max_ppl)
        for r in _q("ccnet_perplexity_buckets")(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for key, (n, s, lo, hi) in expect.items():
        g = got[key]
        assert g[0] == n, key
        assert g[1] == pytest.approx(round(s / n / 1e4, 4), abs=2e-4), key
        assert g[2] == pytest.approx(lo / 1e4, abs=1e-9), key
        assert g[3] == pytest.approx(hi / 1e4, abs=1e-9), key
    # head must not have higher mean perplexity than tail, per language
    for lang in {k[0] for k in got}:
        assert got[(lang, "head")][1] <= got[(lang, "tail")][1]


# ---------------------------------------------------------------------------
# hits_hubs_authorities — exact integer replay in Python
# ---------------------------------------------------------------------------


def test_hits_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    o = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    edges = {
        (o[r.l_orderkey], r.l_suppkey)
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .collect()
        if r.l_orderkey in o
    }
    hubs = sorted({u for u, _ in edges})
    U = 1_000_000_000_000
    h = {u: U // len(hubs) for u in hubs}
    a = {}
    for _ in range(3):
        raw = defaultdict(int)
        for u, v in edges:
            raw[v] += h[u]
        tot = sum(raw.values())
        a = {v: r // max(tot // U, 1) for v, r in raw.items()}
        raw = defaultdict(int)
        for u, v in edges:
            raw[u] += a[v]
        tot = sum(raw.values())
        h = {u: r // max(tot // U, 1) for u, r in raw.items()}
    top_h = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    top_a = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = {
        ("hub", i + 1): (u, s) for i, (u, s) in enumerate(top_h)
    } | {
        ("authority", i + 1): (v, s) for i, (v, s) in enumerate(top_a)
    }
    got = {
        (r.role, r["rank"]): (r.node_id, r.score_units)
        for r in _q("hits_hubs_authorities")(spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# clustering_ari_eval — ARI recomputed in Python from the attested
# kmeans assignment and the true labels
# ---------------------------------------------------------------------------


def test_clustering_ari_matches_python(spark, sf_dir):
    from project_bigdata_spark.plans.curation_queries import kmeans_lloyd
    from project_bigdata_spark.sources import load_table

    km = {r.vec_id: r.cluster for r in kmeans_lloyd(spark, sf_dir).collect()}
    lab = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    ct = Counter((km[v], lab[v]) for v in km)
    a = Counter()
    b = Counter()
    for (c, l), n in ct.items():
        a[c] += n
        b[l] += n
    comb = lambda x: x * (x - 1) // 2  # noqa: E731
    sij = sum(comb(n) for n in ct.values())
    sa = sum(comb(n) for n in a.values())
    sb = sum(comb(n) for n in b.values())
    n = sum(ct.values())
    cn2 = comb(n)
    exp = sa * sb / cn2
    ari = (sij - exp) / ((sa + sb) / 2.0 - exp)
    ri = 1.0 + (2.0 * sij - sa - sb) / cn2
    row = _q("clustering_ari_eval")(spark, sf_dir).collect()[0]
    assert (row.n, row.pairs_same_both, row.pairs_same_cluster,
            row.pairs_same_label) == (n, sij, sa, sb)
    assert row.rand_index == pytest.approx(ri, abs=2e-6)
    assert row.adjusted_rand_index == pytest.approx(ari, abs=2e-6)
    assert -1.0 <= row.adjusted_rand_index <= 1.0


# ---------------------------------------------------------------------------
# wasserstein_drift — exact W1 recomputed in Python (and scipy-free)
# ---------------------------------------------------------------------------


def _events(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    return (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )


def test_wasserstein_matches_python(spark, sf_dir):
    ev = _events(spark, sf_dir)
    cents = [(r.event_type, _snap(r.value, 100)) for r in ev]
    pooled = sorted(c for _, c in cents)
    nb = len(pooled)
    got = {
        r.event_type: (r.n_type, r.n_pooled, r.w1_distance, r.mean_diff)
        for r in _q("wasserstein_drift")(spark, sf_dir).collect()
    }
    types = {t for t, _ in cents}
    assert set(got) == types
    import bisect

    for t in types:
        mine = sorted(c for tt, c in cents if tt == t)
        na = len(mine)
        # exact segment integral over the pooled grid
        grid = sorted(set(pooled))
        s = 0
        for i in range(len(grid) - 1):
            ca = bisect.bisect_right(mine, grid[i])
            cb = bisect.bisect_right(pooled, grid[i])
            s += abs(ca * nb - cb * na) * (grid[i + 1] - grid[i])
        w1 = (s / (na * nb)) / 100
        md = (sum(mine) / na - sum(pooled) / nb) / 100
        assert got[t][0] == na and got[t][1] == nb
        assert got[t][2] == pytest.approx(w1, abs=2e-6), t
        assert got[t][3] == pytest.approx(md, abs=2e-4), t
    # W1 must dominate the mean shift (transport lower bound)
    for t in types:
        assert got[t][2] >= abs(got[t][3]) - 1e-6


# ---------------------------------------------------------------------------
# mann_whitney_u — midrank replay in Python
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_python(spark, sf_dir):
    ev = _events(spark, sf_dir)
    cents = [(r.event_type, _snap(r.value, 100)) for r in ev]
    pooled = Counter(c for _, c in cents)
    grid = sorted(pooled)
    cumlt = {}
    run = 0
    for c in grid:
        cumlt[c] = run
        run += pooled[c]
    n = len(cents)
    tcorr = sum(t * t * t - t for t in pooled.values())
    got = {
        r.event_type: (
            r.n_type,
            r.n_rest,
            r.u_statistic,
            r.z_score,
            r.rank_biserial,
        )
        for r in _q("mann_whitney_u")(spark, sf_dir).collect()
    }
    for t in {tt for tt, _ in cents}:
        mine = [c for tt, c in cents if tt == t]
        na = len(mine)
        nbr = n - na
        r2 = sum(2 * cumlt[c] + pooled[c] + 1 for c in mine)
        u2 = r2 - na * (na + 1)
        var = (na * nbr / 12.0) * ((n + 1) - tcorr / (n * (n - 1.0)))
        z = (u2 / 2.0 - na * nbr / 2.0) / math.sqrt(var)
        rb = 1.0 - u2 / (na * 1.0 * nbr)
        g = got[t]
        assert g[0] == na and g[1] == nbr, t
        assert g[2] == pytest.approx(u2 / 2.0, abs=0.51), t
        assert g[3] == pytest.approx(z, abs=2e-4), t
        assert g[4] == pytest.approx(rb, abs=2e-6), t


def test_mann_whitney_u_range(spark, sf_dir):
    for r in _q("mann_whitney_u")(spark, sf_dir).collect():
        assert 0 <= r.u_statistic <= r.n_type * r.n_rest
        assert -1.0 <= r.rank_biserial <= 1.0


# ---------------------------------------------------------------------------
# gmm_em_1d — exact grid replay in Python
# ---------------------------------------------------------------------------


def test_gmm_em_matches_python(spark, sf_dir):
    ev = _events(spark, sf_dir)
    cs = [_snap(r.value, 100) for r in ev]
    n = float(len(cs))
    n9 = n * 1.0e9
    cmin, cmax = float(min(cs)), float(max(cs))
    sc = float(sum(cs))
    sc2 = float(sum(c * c for c in cs))
    w1 = 0.5
    mu1 = (cmin + (cmax - cmin) / 4.0) / 1.0e2
    mu2 = (cmin + 3.0 * (cmax - cmin) / 4.0) / 1.0e2
    v1 = v2 = (sc2 / n - (sc / n) * (sc / n)) / 1.0e4

    def dens(c, w, mu, v):
        v = max(v, 1.0e-6)
        x = c / 1.0e2
        return w * math.exp(-((x - mu) * (x - mu) / (2.0 * v))) / math.sqrt(v)

    for _ in range(3):
        sr = srx = srx2 = 0
        for c in cs:
            p1 = dens(c, w1, mu1, v1)
            p2 = dens(c, 1.0 - w1, mu2, v2)
            r9 = _snap(p1 / (p1 + p2))
            sr += r9
            srx += r9 * c
            srx2 += r9 * c * c
        sr, srx, srx2 = float(sr), float(srx), float(srx2)
        w1 = sr / n9
        mu1_n = (srx / sr) / 1.0e2
        v1 = (srx2 / sr - (srx / sr) * (srx / sr)) / 1.0e4
        mu2_n = ((sc * 1.0e9 - srx) / (n9 - sr)) / 1.0e2
        v2 = (
            (sc2 * 1.0e9 - srx2) / (n9 - sr)
            - ((sc * 1.0e9 - srx) / (n9 - sr))
            * ((sc * 1.0e9 - srx) / (n9 - sr))
        ) / 1.0e4
        mu1, mu2 = mu1_n, mu2_n
    n1 = 0
    ll9 = 0
    for c in cs:
        p1 = dens(c, w1, mu1, v1)
        p2 = dens(c, 1.0 - w1, mu2, v2)
        n1 += int(_snap(p1 / (p1 + p2)) >= 500000000)
        ll9 += _snap(math.log(p1 + p2) - 9.189385332046727e-1)
    row = _q("gmm_em_1d")(spark, sf_dir).collect()[0]
    assert row.n_rounds == 3 and row.n == int(n)
    assert row.w1 == pytest.approx(_rnd(w1), abs=2e-6)
    assert row.mu1 == pytest.approx(_rnd(mu1), abs=2e-6)
    assert row.v1 == pytest.approx(_rnd(v1), abs=2e-4)
    assert row.mu2 == pytest.approx(_rnd(mu2), abs=2e-6)
    assert row.v2 == pytest.approx(_rnd(v2), abs=2e-4)
    assert row.n_comp1 == n1
    assert row.mean_loglik == pytest.approx(_rnd(ll9 / 1e9 / n), abs=2e-6)
    # the mixture must actually separate: distinct means, valid weight
    assert 0.0 < row.w1 < 1.0 and row.mu1 != row.mu2


# ---------------------------------------------------------------------------
# doremi_domain_weights
# ---------------------------------------------------------------------------


def test_doremi_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = {r.doc_id: _words(r.text) for r in docs if _words(r.text)}
    src = {r.doc_id: r.source for r in docs}
    counts = Counter()
    for ws in toks.values():
        counts.update(ws)
    total = float(sum(counts.values()))
    uvocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4096]
    )
    bcounts = Counter()
    for ws in toks.values():
        bcounts.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    bvocab = dict(
        sorted(bcounts.items(), key=lambda kv: (-kv[1], kv[0]))[:8192]
    )
    dom = defaultdict(lambda: [0, 0])  # n, sum e9
    for doc_id, ws in toks.items():
        s9u = sum(
            _snap(math.log(uvocab.get(w, 0.5) / total)) for w in ws
        )
        nu = len(ws)
        prs = list(zip(ws, ws[1:]))
        if not prs:
            continue
        s9b = 0
        for a, b in prs:
            bg = f"{a} {b}"
            if bg in bvocab:
                v = bvocab[bg] / uvocab.get(a, 0.5)
            else:
                v = 0.4 * uvocab.get(b, 0.5) / total
            s9b += _snap(math.log(v))
        nb = len(prs)
        e = max(0.0, (s9b / (nb * 1.0) - s9u / (nu * 1.0)) / 1.0e9)
        d = dom[src[doc_id]]
        d[0] += 1
        d[1] += _snap(e)
    t9 = {
        s: _snap(math.exp(1.0 * (se9 / (n * 1.0)) / 1.0e9))
        for s, (n, se9) in dom.items()
    }
    zt = sum(t9.values())
    got = {
        r.source: (r.n_docs, r.mean_excess_loss, r.domain_weight)
        for r in _q("doremi_domain_weights")(spark, sf_dir).collect()
    }
    assert set(got) == set(dom)
    wsum = 0.0
    for s, (n, se9) in dom.items():
        g = got[s]
        assert g[0] == n, s
        assert g[1] == pytest.approx(
            _rnd((se9 / (n * 1.0)) / 1.0e9), abs=2e-6
        ), s
        assert g[2] == pytest.approx(_rnd(t9[s] / zt), abs=2e-6), s
        wsum += g[2]
    assert wsum == pytest.approx(1.0, abs=1e-3)
    # higher excess loss must never get a lower weight
    rows = sorted(got.values(), key=lambda t: t[1])
    for x, y in zip(rows, rows[1:]):
        assert y[2] >= x[2] - 1e-9


# ---------------------------------------------------------------------------
# char_entropy_compression
# ---------------------------------------------------------------------------


def test_char_entropy_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    got = {
        r.doc_id: (
            r.n_chars_total,
            r.n_distinct,
            r.entropy_bits,
            r.compression_bound,
            r.low_entropy,
        )
        for r in _q("char_entropy_compression")(spark, sf_dir).collect()
    }
    for r in docs:
        chars = [ch for ch in r.text if ch != ""]
        if not chars:
            assert r.doc_id not in got
            continue
        cc = Counter(chars)
        n = len(chars)
        h9 = sum(
            _snap(-(c / (n * 1.0)) * math.log2(c / (n * 1.0)))
            for c in cc.values()
        )
        g = got[r.doc_id]
        assert g[0] == n and g[1] == len(cc), r.doc_id
        assert g[2] == pytest.approx(_rnd(h9 / 1e9), abs=2e-6), r.doc_id
        assert g[3] == pytest.approx(_rnd(h9 / 8e9), abs=2e-6), r.doc_id
        assert g[4] == int(h9 < 3000000000), r.doc_id
        # order-0 entropy can never exceed log2(alphabet)
        assert g[2] <= math.log2(len(cc)) + 1e-6


# ---------------------------------------------------------------------------
# corpus_self_bleu
# ---------------------------------------------------------------------------


def test_self_bleu_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    uni = {}
    bi = {}
    for r in docs:
        ws = _words(r.text)
        if len(ws) < 2:
            continue
        uni[r.doc_id] = Counter(ws)
        bi[r.doc_id] = Counter(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    cu = Counter()
    cb = Counter()
    for c in uni.values():
        cu.update(c)
    for c in bi.values():
        cb.update(c)
    got = {
        r.doc_id: (r.n_unigrams, r.p1_clipped, r.p2_clipped, r.self_bleu)
        for r in _q("corpus_self_bleu")(spark, sf_dir).collect()
    }
    assert set(got) == set(uni)
    for doc_id in uni:
        p1n = sum(min(tf, cu[g] - tf) for g, tf in uni[doc_id].items())
        p1d = sum(uni[doc_id].values())
        p2n = sum(min(tf, cb[g] - tf) for g, tf in bi[doc_id].items())
        p2d = sum(bi[doc_id].values())
        if p1n == 0 or p2n == 0:
            sb = 0.0
        else:
            sb = math.exp(
                0.5 * (math.log(p1n / (p1d * 1.0)) + math.log(p2n / (p2d * 1.0)))
            )
        g = got[doc_id]
        assert g[0] == p1d, doc_id
        assert g[1] == pytest.approx(_rnd(p1n / (p1d * 1.0)), abs=2e-6)
        assert g[2] == pytest.approx(_rnd(p2n / (p2d * 1.0)), abs=2e-6)
        assert g[3] == pytest.approx(_rnd(sb), abs=2e-6)
        # geometric mean is bounded by the factors
        assert min(g[1], g[2]) - 1e-6 <= g[3] <= max(g[1], g[2]) + 1e-6
