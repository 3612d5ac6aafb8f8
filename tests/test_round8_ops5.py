"""Semantic invariants for the round-8 eighth-wave operators —
third-implementation differentials in plain Python (Fractions for the
exact ERR cascade), so a shared Spark/DuckDB bug cannot hide behind
engine agreement."""

from __future__ import annotations

import json
import math
import re
from collections import Counter, defaultdict
from fractions import Fraction

import pyarrow.parquet as pq

from project_bigdata_spark.plans.catalog import load_all


def _q(name):
    return load_all()[name].builder


def _snap(x: float, s: float = 1e9) -> int:
    return (
        math.floor(x * s + 0.5) if x >= 0 else -math.floor(-x * s + 0.5)
    )


def _rnd(x: float, n: int = 6) -> float:
    s = float(10**n)
    return (
        math.floor(x * s + 0.5) / s
        if x >= 0
        else -(math.floor(-x * s + 0.5) / s)
    )


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w != ""]


# ---------------------------------------------------------------------------
# cluster_quality_indices — silhouette/DB math replayed from the
# attested kmeans assignment + raw embeddings
# ---------------------------------------------------------------------------


def test_cluster_quality_indices_matches_python(spark, sf_dir):
    km = {
        r.vec_id: r.cluster
        for r in _q("kmeans_lloyd")(spark, sf_dir).collect()
    }
    vecs = {
        r["vec_id"]: [
            _snap(float(x), 1e6) for x in r["embedding"]
        ]
        for r in pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
        if r["embedding"] is not None
    }
    dims = len(next(iter(vecs.values())))
    sums: dict[int, list[int]] = {}
    cnt: dict[int, int] = Counter()
    for vid, cl in km.items():
        cnt[cl] += 1
        s = sums.setdefault(cl, [0] * dims)
        for d in range(dims):
            s[d] += vecs[vid][d]
    cent = {
        cl: [(s[d] / cnt[cl]) / 1e6 for d in range(dims)]
        for cl, s in sums.items()
    }

    def edist9(v6, c):
        acc = 0.0
        for d in range(dims):
            t = v6[d] / 1e6 - c[d]
            acc += t * t
        return _snap(math.sqrt(acc), 1e9)

    percl: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0])
    for vid, own in km.items():
        ds = {cl: edist9(vecs[vid], c) for cl, c in cent.items()}
        a9 = ds[own]
        b9 = min(v for cl, v in ds.items() if cl != own)
        sil = (
            0.0 if max(a9, b9) == 0 else (b9 - a9) / (1.0 * max(a9, b9))
        )
        p = percl[own]
        p[0] += 1
        p[1] += _snap(sil, 1e9)
        p[2] += a9
    expect = {}
    for k in percl:
        n, ssil9, sa9 = percl[k]
        dbc = max(
            (
                (percl[k][2] / (1.0 * percl[k][0]))
                + (percl[j][2] / (1.0 * percl[j][0]))
            )
            / (
                1.0
                * _snap(
                    math.sqrt(
                        sum(
                            (cent[k][d] - cent[j][d]) ** 2
                            for d in range(dims)
                        )
                    ),
                    1e9,
                )
            )
            for j in percl
            if j != k
        )
        expect[k] = (
            n,
            _rnd(sa9 / 1e9 / n, 6),
            _rnd(ssil9 / 1e9 / n, 6),
            _rnd(dbc, 6),
        )
    got = {
        r.cluster: (
            r.n_vecs,
            r.s_intra,
            r.mean_silhouette,
            r.db_component,
        )
        for r in _q("cluster_quality_indices")(spark, sf_dir).collect()
    }
    assert got == expect
    # silhouettes live in [-1, 1]; intra distances are non-negative
    for (_, s_intra, sil, _) in got.values():
        assert -1.0 <= sil <= 1.0 and s_intra >= 0


# ---------------------------------------------------------------------------
# err_eval — the cascade model replayed with EXACT rational arithmetic
# ---------------------------------------------------------------------------


def test_err_eval_matches_python(spark, sf_dir):
    from project_bigdata_spark.plans.eval_queries import _scored

    scored = sorted(
        (
            (r.c6, r.doc_id, r.rel)
            for r in _scored(spark, sf_dir).collect()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    cont = Fraction(1)
    cum6 = 0
    expect = {}
    for rk, (_, doc_id, rel) in enumerate(scored, 1):
        rprob = Fraction(2**rel - 1, 8)
        term = Fraction(1, rk) * rprob * cont
        t6 = _snap(float(term), 1e6)
        cum6 += t6
        expect[rk] = (
            doc_id,
            rel,
            _rnd(float(rprob), 6),
            _rnd(t6 / 1e6, 6),
            _rnd(cum6 / 1e6, 6),
        )
        cont *= 1 - rprob
    got = {
        r.rk: (r.doc_id, r.rel, r.r_prob, r.err_term, r.err_cum)
        for r in _q("err_eval")(spark, sf_dir).collect()
    }
    assert got == expect
    # ERR is a stopping probability-weighted reciprocal rank: bounded
    # by 1, monotone in depth
    cums = [got[rk][4] for rk in range(1, 11)]
    assert cums == sorted(cums) and cums[-1] <= 1.0


# ---------------------------------------------------------------------------
# cochran_q_gates — the omnibus statistic replayed from raw text
# ---------------------------------------------------------------------------


def test_cochran_q_matches_python(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    stop = {"the", "a", "of"}
    ca = cb = cc = t = r2 = 0
    for d in docs:
        ws = _words(d["text"])
        a = 1 if len(ws) >= 30 else 0
        b = 1 if 100 * len(set(ws)) >= 55 * len(ws) else 0
        c = 1 if stop & set(ws) else 0
        ca += a
        cb += b
        cc += c
        t += a + b + c
        r2 += (a + b + c) ** 2
    q = (
        (3 - 1)
        * (3.0 * (ca * ca + cb * cb + cc * cc) - 1.0 * t * t)
        / (3.0 * t - r2)
    )
    r = _q("cochran_q_gates")(spark, sf_dir).collect()[0]
    assert (
        r.n_docs,
        r.keep_length,
        r.keep_ttr,
        r.keep_stopword,
    ) == (len(docs), ca, cb, cc)
    assert r.q_statistic == _rnd(q, 6)
    assert r.gates_differ_95 == (1 if q > 5.991464547107979 else 0)
    assert r.q_statistic >= 0


# ---------------------------------------------------------------------------
# yule_k_richness — the count-of-counts constants replayed
# ---------------------------------------------------------------------------


def test_yule_k_matches_python(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    tf: dict[str, Counter] = defaultdict(Counter)
    for d in docs:
        for w in _words(d["text"]):
            tf[d["lang"]][w] += 1
    expect = {}
    for lang, c in tf.items():
        n = sum(c.values())
        if n <= 1:
            continue
        s2 = sum(v * v for v in c.values())
        expect[lang] = (
            n,
            len(c),
            _rnd(1.0e4 * (1.0 * s2 - n) / (1.0 * n * n), 4),
            _rnd((1.0 * s2 - n) / (1.0 * n * (n - 1)), 8),
        )
    got = {
        r.lang: (r.n_tokens, r.vocab, r.yule_k, r.repeat_rate)
        for r in _q("yule_k_richness")(spark, sf_dir).collect()
    }
    assert got == expect
    # repeat rate is a probability
    assert all(0 <= rr <= 1 for (_, _, _, rr) in got.values())


# ---------------------------------------------------------------------------
# rec_coverage_audit — coverage + exposure Gini replayed from raw events
# ---------------------------------------------------------------------------


def test_rec_coverage_matches_python(spark, sf_dir):
    from project_bigdata_spark.plans.behavior_queries import (
        _CO_MAX_BASKET,
        _CO_TOPK,
    )

    baskets: dict[int, set] = defaultdict(set)
    for r in pq.read_table(f"{sf_dir}/events.parquet").to_pylist():
        if r["props"] is not None:
            baskets[r["user_id"]].add(int(json.loads(r["props"])["k"]))
    catalog = len({k for ks in baskets.values() for k in ks})
    kept = {
        u: ks for u, ks in baskets.items() if len(ks) <= _CO_MAX_BASKET
    }
    nu: dict[int, int] = Counter()
    for ks in kept.values():
        for k in ks:
            nu[k] += 1
    cooc: dict[tuple[int, int], int] = Counter()
    for ks in kept.values():
        s = sorted(ks)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                cooc[(a, b)] += 1
    scored: dict[int, list] = defaultdict(list)
    for (a, b), c in cooc.items():
        cos6 = _snap(c / math.sqrt((1.0 * nu[a]) * nu[b]), 1e6)
        scored[a].append((cos6, c, b))
        scored[b].append((cos6, c, a))
    expo: dict[int, int] = Counter()
    for item, cands in scored.items():
        cands.sort(key=lambda x: (-x[0], -x[1], x[2]))
        for _, _, rec in cands[:_CO_TOPK]:
            expo[rec] += 1
    ranked = sorted(expo.items(), key=lambda kv: (kv[1], kv[0]))
    nrec = len(ranked)
    t = sum(c for _, c in ranked)
    swc = sum((i + 1) * c for i, (_, c) in enumerate(ranked))
    gini = (2.0 * swc) / (1.0 * nrec * t) - (nrec + 1.0) / nrec
    r = _q("rec_coverage_audit")(spark, sf_dir).collect()[0]
    assert (r.catalog_items, r.recommended_items, r.n_rec_rows) == (
        catalog,
        nrec,
        t,
    )
    assert r.coverage == _rnd((1.0 * nrec) / catalog, 6)
    assert r.exposure_gini == _rnd(gini, 6)
    assert r.max_exposure == max(c for _, c in ranked)
    assert 0.0 <= r.exposure_gini < 1.0
