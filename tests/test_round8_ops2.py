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
