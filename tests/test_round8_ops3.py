"""Semantic invariants for the round-8 fifth-wave operators —
third-implementation differentials in plain Python (numpy only for the
brute-force isotropy pair sum), so a shared Spark/DuckDB bug cannot hide
behind engine agreement."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

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


def _events(sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet")
    return t.to_pylist()


def _embeddings(sf_dir):
    return pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()


def _documents(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()


def _epoch_hour(ts) -> int:
    """Hour index exactly as unix_timestamp(date_trunc('hour', ts)) div
    3600 / epoch_us // 3600000000 compute it (timestamps are stored
    naive; both engines treat them as UTC instants)."""
    import datetime as dt

    return int(
        ts.replace(tzinfo=dt.timezone.utc).timestamp() // 3600
    )


# ---------------------------------------------------------------------------
# lagged_crosscorr — dense-grid CCF replayed from the raw events
# ---------------------------------------------------------------------------


def test_lagged_crosscorr_matches_python(spark, sf_dir):
    rows = _events(sf_dir)
    cnt: dict[tuple[str, int], int] = Counter()
    for r in rows:
        if r["event_type"] in ("click", "purchase"):
            cnt[(r["event_type"], _epoch_hour(r["ts"]))] += 1
    hours = [t for (_, t) in cnt]
    lo, hi = min(hours), max(hours)
    xs = {t: cnt.get(("click", t), 0) for t in range(lo, hi + 1)}
    ys = {t: cnt.get(("purchase", t), 0) for t in range(lo, hi + 1)}
    expect = {}
    for lag in range(-6, 7):
        pairs = [
            (xs[t], ys[t + lag])
            for t in range(lo, hi + 1)
            if lo <= t + lag <= hi
        ]
        n = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] * p[0] for p in pairs)
        syy = sum(p[1] * p[1] for p in pairs)
        r = (1.0 * (n * sxy - sx * sy)) / (
            math.sqrt(1.0 * (n * sxx - sx * sx))
            * math.sqrt(1.0 * (n * syy - sy * sy))
        )
        expect[lag] = (n, _rnd(r, 6))
    got = {
        r.lag: (r.n_hours, r.xcorr)
        for r in _q("lagged_crosscorr")(spark, sf_dir).collect()
    }
    assert got == expect
    # zero lag must be the max-n alignment and CCF must be symmetric in
    # pair count
    assert got[0][0] == hi - lo + 1
    assert all(got[k][0] == got[-k][0] for k in range(7))


# ---------------------------------------------------------------------------
# hll_intersection — register construction + merge + inclusion-exclusion
# replayed bit-for-bit from hashlib.md5
# ---------------------------------------------------------------------------

_ALPHA = 0.673 * 256.0 * 2.0**33


def _hll_est(regs: list[int]) -> float:
    t = sum(1 << (33 - m) for m in regs)
    v = sum(1 for m in regs if m == 0)
    raw = _ALPHA / t
    if raw <= 40.0 and v > 0:
        return 16.0 * (_snap(math.log(16.0 / v), 1e9) / 1e9)
    return raw


def test_hll_intersection_matches_python(spark, sf_dir):
    rows = _events(sf_dir)
    regs: dict[str, list[int]] = defaultdict(lambda: [0] * 16)
    users: dict[str, set] = defaultdict(set)
    for r in rows:
        et, uid = r["event_type"], r["user_id"]
        users[et].add(uid)
        h = hashlib.md5(str(uid).encode()).hexdigest()
        reg = int(h[0], 16)
        w = int(h[1:9], 16)
        rho = 33 - w.bit_length()
        regs[et][reg] = max(regs[et][reg], rho)
    types = sorted(regs)
    expect = {}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            ea, eb = _hll_est(regs[a]), _hll_est(regs[b])
            eu = _hll_est(
                [max(x, y) for x, y in zip(regs[a], regs[b])]
            )
            exact = len(users[a] & users[b])
            est = ea + eb - eu
            expect[(a, b)] = (
                exact,
                _rnd(est, 4),
                _rnd((est - exact) / exact, 4),
            )
    got = {
        (r.type_a, r.type_b): (r.exact_overlap, r.hll_intersect, r.rel_err)
        for r in _q("hll_intersection")(spark, sf_dir).collect()
    }
    assert got == expect
    # merge property sanity: the union estimate can never fall below
    # either side, so the intersection estimate never exceeds them
    for (a, b), (_, est, _) in got.items():
        assert est <= _rnd(_hll_est(regs[a]), 4) + 1e-9
        assert est <= _rnd(_hll_est(regs[b]), 4) + 1e-9


# ---------------------------------------------------------------------------
# kneser_ney_bigram — the KN probability law replayed from raw text
# ---------------------------------------------------------------------------


def test_kneser_ney_bigram_matches_python(spark, sf_dir):
    docs = _documents(sf_dir)
    db: dict[tuple[int, str, str], int] = Counter()
    for d in docs:
        ws = _words(d["text"])
        for i in range(len(ws) - 1):
            db[(d["doc_id"], ws[i], ws[i + 1])] += 1
    bg: dict[tuple[str, str], int] = Counter()
    for (_, v, w), tf in db.items():
        bg[(v, w)] += tf
    c_v: dict[str, int] = Counter()
    n1p_fwd: dict[str, int] = Counter()
    n1p_bwd: dict[str, int] = Counter()
    for (v, w), c in bg.items():
        c_v[v] += c
        n1p_fwd[v] += 1
        n1p_bwd[w] += 1
    n1p_all = len(bg)
    D = 0.75
    s9: dict[int, int] = Counter()
    nb: dict[int, int] = Counter()
    for (doc, v, w), tf in db.items():
        p = max(bg[(v, w)] - D, 0.0) / c_v[v] + (
            D * n1p_fwd[v] / c_v[v]
        ) * (n1p_bwd[w] / (1.0 * n1p_all))
        s9[doc] += tf * _snap(math.log(p), 1e9)
        nb[doc] += tf
    expect = {
        doc: (
            nb[doc],
            _rnd(s9[doc] / 1e9 / nb[doc], 4),
            _rnd(math.exp(-(s9[doc] / 1e9 / nb[doc])), 4),
        )
        for doc in nb
    }
    got = {
        r.doc_id: (r.n_bigrams, r.kn_logprob, r.kn_ppl)
        for r in _q("kneser_ney_bigram")(spark, sf_dir).collect()
    }
    assert got == expect
    # KN probabilities are proper: every per-doc mean logprob < 0
    assert all(lp < 0 for (_, lp, _) in got.values())


# ---------------------------------------------------------------------------
# svm_hinge_gd — the integer-grid training trajectory replayed exactly
# ---------------------------------------------------------------------------


def test_svm_hinge_gd_matches_python(spark, sf_dir):
    from project_bigdata_spark.plans.ml_queries import (
        _SVM_DIMS,
        _SVM_LAM,
        _SVM_LR,
        _SVM_STEPS,
    )

    rows = [
        (
            1 if r["label"] < 5 else -1,
            [
                _snap(float(r["embedding"][j]), 1e6)
                for j in range(_SVM_DIMS)
            ],
        )
        for r in _embeddings(sf_dir)
        if r["embedding"] is not None
    ]
    n = len(rows)
    b9 = 0
    w9 = [0] * _SVM_DIMS

    def margin(x6):
        return b9 / 1e9 + sum(
            (w9[j] / 1e9) * (x6[j] / 1e6) for j in range(_SVM_DIMS)
        )

    decay = 1.0 - _SVM_LR * _SVM_LAM
    for _ in range(_SVM_STEPS):
        gb9 = sum(
            _snap(1.0 * (1 if y * margin(x6) < 1.0 else 0) * y, 1e9)
            for y, x6 in rows
        )
        g9 = [
            sum(
                _snap(
                    (1 if y * margin(x6) < 1.0 else 0)
                    * y
                    * (x6[j] / 1e6),
                    1e9,
                )
                for y, x6 in rows
            )
            for j in range(_SVM_DIMS)
        ]
        nb9 = b9 + _snap(_SVM_LR * gb9 / 1e9 / n, 1e9)
        nw9 = [
            _snap(
                (w9[j] / 1e9) * decay + _SVM_LR * g9[j] / 1e9 / n, 1e9
            )
            for j in range(_SVM_DIMS)
        ]
        b9, w9 = nb9, nw9
    n_correct = sum(
        1 for y, x6 in rows if (margin(x6) >= 0) == (y == 1)
    )
    hl9 = sum(
        _snap(max(0.0, 1.0 - y * margin(x6)), 1e9) for y, x6 in rows
    )
    r = _q("svm_hinge_gd")(spark, sf_dir).collect()[0]
    assert r.n_steps == _SVM_STEPS and r.n == n
    assert r.n_pos == sum(1 for y, _ in rows if y == 1)
    assert r.w_bias == _rnd(b9 / 1e9, 6)
    for j in range(_SVM_DIMS):
        assert r[f"w{j + 1}"] == _rnd(w9[j] / 1e9, 6)
    assert r.train_acc == _rnd(n_correct / n, 6)
    assert r.hinge_loss == _rnd(hl9 / 1e9 / n, 6)
    # the trained separator must beat the majority-class baseline
    assert r.train_acc > max(r.n_pos, n - r.n_pos) / n - 1e-9


# ---------------------------------------------------------------------------
# embedding_isotropy — snapped-grid replay PLUS the brute-force O(n²)
# pairwise mean cosine the identity is supposed to avoid
# ---------------------------------------------------------------------------


def test_embedding_isotropy_matches_python(spark, sf_dir):
    import numpy as np

    vecs = [
        (r["label"], [float(x) for x in r["embedding"]])
        for r in _embeddings(sf_dir)
        if r["embedding"] is not None
    ]
    dims = len(vecs[0][1])
    u9s = []
    for lbl, xs in vecs:
        n2_12 = sum(_snap(x * x, 1e12) for x in xs)
        if n2_12 <= 0:
            continue
        nrm = math.sqrt(n2_12 / 1e12)
        u9s.append((lbl, [_snap(x / nrm, 1e9) for x in xs]))
    cells: dict[tuple[str, int], list[int]] = {}
    ncnt: dict[str, int] = Counter()
    for lbl, u9 in u9s:
        for scope in (str(lbl), "ALL"):
            ncnt[scope] += 0  # ensure key
        ncnt[str(lbl)] += 1
        for d in range(dims):
            for scope in (str(lbl), "ALL"):
                c = cells.setdefault((scope, d), [0, 0])
                c[0] += u9[d]
                c[1] += u9[d] * u9[d]
    ncnt["ALL"] = sum(v for k, v in ncnt.items() if k != "ALL")
    expect = {}
    for scope in ncnt:
        s6 = sum(
            _snap((cells[(scope, d)][0] / 1e9) ** 2, 1e6)
            for d in range(dims)
        )
        t18 = sum(cells[(scope, d)][1] for d in range(dims))
        qq6 = sum(
            _snap((cells[(scope, d)][1] / 1e18) ** 2, 1e6)
            for d in range(dims)
        )
        n = ncnt[scope]
        expect[scope] = (
            n,
            _rnd((s6 / 1e6 - t18 / 1e18) / (n * (n - 1.0)), 6),
            _rnd((t18 / 1e18) ** 2 / (qq6 / 1e6), 4),
        )
    got = {
        r.scope: (r.n_vecs, r.mean_cosine, r.participation_ratio)
        for r in _q("embedding_isotropy")(spark, sf_dir).collect()
    }
    assert got == expect
    # brute force: the sum-vector identity vs the O(n²) pair mean on the
    # same snapped unit vectors (exact in integer arithmetic)
    U = np.array([u for _, u in u9s], dtype=np.float64) / 1e9
    n = len(U)
    g = U @ U.T
    brute = (g.sum() - np.trace(g)) / (n * (n - 1.0))
    assert abs(got["ALL"][1] - brute) < 5e-6
    # PR is bounded by the ambient dimension
    assert all(1.0 <= pr <= dims + 1e-6 for (_, _, pr) in got.values())


# ---------------------------------------------------------------------------
# item_cooccurrence_recs — baskets, degree cap, cosine and ranking
# replayed from raw events
# ---------------------------------------------------------------------------


def test_item_cooccurrence_recs_matches_python(spark, sf_dir):
    import json

    from project_bigdata_spark.plans.behavior_queries import (
        _CO_MAX_BASKET,
        _CO_TOPK,
    )

    baskets: dict[int, set] = defaultdict(set)
    for r in _events(sf_dir):
        if r["props"] is not None:
            baskets[r["user_id"]].add(int(json.loads(r["props"])["k"]))
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
    expect = set()
    for item, cands in scored.items():
        cands.sort(key=lambda t: (-t[0], -t[1], t[2]))
        for rk, (cos6, c, rec) in enumerate(cands[:_CO_TOPK], 1):
            expect.add((item, rec, c, _rnd(cos6 / 1e6, 6), rk))
    got = {
        (r.item, r.rec_item, r.cooc, r.cosine, r.rk)
        for r in _q("item_cooccurrence_recs")(spark, sf_dir).collect()
    }
    assert got == expect
    # every item with any co-occurrence gets at most TOPK recs and rank
    # sequences are 1..k
    per_item: dict[int, list[int]] = defaultdict(list)
    for item, _, _, _, rk in got:
        per_item[item].append(rk)
    assert all(
        sorted(v) == list(range(1, len(v) + 1)) and len(v) <= _CO_TOPK
        for v in per_item.values()
    )
