"""Semantic invariants for the round-8 sixth-wave operators —
third-implementation differentials in plain Python. Raw data access goes
through pyarrow (micros exactly as epoch_us computes them); all operator
math is replayed independently of both engines."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter, defaultdict

import pyarrow as pa
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


def _events_us(sf_dir):
    """Events with ts as exact integer microseconds (epoch_us grid)."""
    t = pq.read_table(f"{sf_dir}/events.parquet")
    us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
    t = t.drop_columns(["ts"]).append_column("us", us)
    return t.to_pylist()


# ---------------------------------------------------------------------------
# interarrival_fit — exponential MLE + KS replayed from integer micros
# ---------------------------------------------------------------------------


def test_interarrival_fit_matches_python(spark, sf_dir):
    rows = sorted(
        _events_us(sf_dir), key=lambda r: (r["us"], r["event_id"])
    )
    seqs: dict[str, list[int]] = defaultdict(list)
    for r in rows:
        seqs[r["event_type"]].append(r["us"])
    expect = {}
    for et, times in seqs.items():
        gaps = sorted(
            times[i] - times[i - 1] for i in range(1, len(times))
        )
        n, tot = len(gaps), sum(gaps)
        ks = max(
            max(
                (i + 1) / (1.0 * n)
                - (1.0 - math.exp(-((g * n) / (1.0 * tot)))),
                (1.0 - math.exp(-((g * n) / (1.0 * tot))))
                - i / (1.0 * n),
            )
            for i, g in enumerate(gaps)
        )
        expect[et] = (
            n,
            _rnd((tot / (1.0 * n)) / 1e6, 4),
            _rnd(n * 3.6e9 / (1.0 * tot), 4),
            _rnd(ks, 6),
            1 if ks > 1.36 / math.sqrt(1.0 * n) else 0,
        )
    got = {
        r.event_type: (
            r.n_gaps,
            r.mean_gap_s,
            r.lambda_per_hour,
            r.ks_stat,
            r.reject_95,
        )
        for r in _q("interarrival_fit")(spark, sf_dir).collect()
    }
    assert got == expect
    # KS is a sup-norm: always in (0, 1)
    assert all(0 < ks < 1 for (_, _, _, ks, _) in got.values())


def _transitions(sf_dir):
    rows = sorted(
        _events_us(sf_dir), key=lambda r: (r["us"], r["event_id"])
    )
    per_user: dict[int, list] = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append((r["us"], r["event_type"]))
    out = []
    for uid, seq in per_user.items():
        for i in range(1, len(seq)):
            out.append((uid, seq[i - 1][1], seq[i][1], seq[i][0]))
    return out


# ---------------------------------------------------------------------------
# user_sequence_anomaly — Markov NLL scoring replayed
# ---------------------------------------------------------------------------


def test_user_sequence_anomaly_matches_python(spark, sf_dir):
    tr = _transitions(sf_dir)
    cab: dict[tuple[str, str], int] = Counter()
    for _, a, b, _ in tr:
        cab[(a, b)] += 1
    ca: dict[str, int] = Counter()
    for (a, _), c in cab.items():
        ca[a] += c
    tt = len({r["event_type"] for r in _events_us(sf_dir)})
    s9: dict[int, int] = Counter()
    ntr: dict[int, int] = Counter()
    for uid, a, b, _ in tr:
        p = (cab[(a, b)] + 1) / (1.0 * (ca[a] + tt))
        s9[uid] += _snap(-math.log(p), 1e9)
        ntr[uid] += 1
    order = sorted(
        s9, key=lambda u: (-(s9[u] * 1.0 / ntr[u]), u)
    )[:20]
    expect = {
        (rk + 1, uid): (ntr[uid], _rnd(s9[uid] / 1e9 / ntr[uid], 6))
        for rk, uid in enumerate(order)
    }
    got = {
        (r.rk, r.user_id): (r.n_transitions, r.mean_nll)
        for r in _q("user_sequence_anomaly")(spark, sf_dir).collect()
    }
    assert got == expect
    # NLLs are positive and ranks descend in score
    vals = [got[k][1] for k in sorted(got)]
    assert all(v > 0 for v in vals)
    assert vals == sorted(vals, reverse=True)


# ---------------------------------------------------------------------------
# markov_backtest — time-split next-event prediction replayed
# ---------------------------------------------------------------------------


def test_markov_backtest_matches_python(spark, sf_dir):
    split_us = int(
        dt.datetime(
            2024, 1, 24, tzinfo=dt.timezone.utc
        ).timestamp()
        * 1_000_000
    )
    tr = _transitions(sf_dir)
    train = Counter(
        (a, b) for _, a, b, us in tr if us < split_us
    )
    test = [(a, b) for _, a, b, us in tr if us >= split_us]
    ctx = defaultdict(list)
    for (a, b), c in train.items():
        ctx[a].append((c, b))
    pred = {
        a: min(cands, key=lambda t: (-t[0], t[1]))[1]
        for a, cands in ctx.items()
    }
    nxt = Counter()
    for (_, b), c in train.items():
        nxt[b] += c
    maj = min(nxt.items(), key=lambda t: (-t[1], t[0]))[0]
    per: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for a, b in test:
        for scope in (a, "ALL"):
            per[scope][0] += 1
            per[scope][1] += 1 if b == pred.get(a, maj) else 0
            per[scope][2] += 1 if b == maj else 0
    expect = {
        s: (
            n,
            c,
            _rnd(c / (1.0 * n), 6),
            _rnd(bc / (1.0 * n), 6),
        )
        for s, (n, c, bc) in per.items()
    }
    got = {
        r.scope: (r.n_test, r.n_correct, r.top1_acc, r.baseline_acc)
        for r in _q("markov_backtest")(spark, sf_dir).collect()
    }
    assert got == expect
    # context must not lose to the blind baseline overall
    assert got["ALL"][2] >= got["ALL"][3] - 1e-9


# ---------------------------------------------------------------------------
# mcnemar_filter_agreement — 2x2 census, kappa and chi2 replayed
# ---------------------------------------------------------------------------


def test_mcnemar_filter_agreement_matches_python(spark, sf_dir):
    import re

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    n11 = n10 = n01 = n00 = 0
    for d in docs:
        ws = [
            w
            for w in re.split(r"\s+", d["text"].lower())
            if w != ""
        ]
        a = len(ws) >= 30
        b = 100 * len(set(ws)) >= 55 * len(ws)
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    nn = n11 + n10 + n01 + n00
    x = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    kappa = ((1.0 * nn * (n11 + n00)) - x) / ((1.0 * nn * nn) - x)
    chi2 = (
        0.0
        if n10 + n01 == 0
        else ((n10 - n01) * (n10 - n01)) / (1.0 * (n10 + n01))
    )
    r = _q("mcnemar_filter_agreement")(spark, sf_dir).collect()[0]
    assert (r.n_docs, r.both_keep, r.a_only, r.b_only, r.both_drop) == (
        nn,
        n11,
        n10,
        n01,
        n00,
    )
    assert r.agreement == _rnd((n11 + n00) / (1.0 * nn), 6)
    assert r.kappa == _rnd(kappa, 6)
    assert r.mcnemar_chi2 == _rnd(chi2, 6)
    # kappa never exceeds raw agreement
    assert r.kappa <= r.agreement + 1e-9


# ---------------------------------------------------------------------------
# brier_decomposition — the decomposition math replayed over the
# attested (s6, pos) scoring frame; the identity must close exactly
# ---------------------------------------------------------------------------


def test_brier_decomposition_matches_python(spark, sf_dir):
    from project_bigdata_spark.plans.eval_queries import _qscored

    rows = [
        (r.s6, r.pos) for r in _qscored(spark, sf_dir).collect()
    ]
    nn = len(rows)
    pp = sum(p for _, p in rows)
    br9 = sum(
        _snap((s6 / 1e6 - p) * (s6 / 1e6 - p), 1e9) for s6, p in rows
    )
    bins: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0])
    for s6, p in rows:
        k = min(s6 // 100000, 9)
        bins[k][0] += 1
        bins[k][1] += s6
        bins[k][2] += p
    obar = pp / (1.0 * nn)
    rel9 = sum(
        _snap(
            nk
            * ((ss / (1.0 * nk) / 1e6) - (pk / (1.0 * nk)))
            * ((ss / (1.0 * nk) / 1e6) - (pk / (1.0 * nk))),
            1e9,
        )
        for nk, ss, pk in bins.values()
    )
    res9 = sum(
        _snap(
            nk
            * ((pk / (1.0 * nk)) - obar)
            * ((pk / (1.0 * nk)) - obar),
            1e9,
        )
        for nk, ss, pk in bins.values()
    )
    unc = obar * (1.0 - obar)
    r = _q("brier_decomposition")(spark, sf_dir).collect()[0]
    assert r.n_docs == nn
    assert r.brier == _rnd(br9 / 1e9 / nn, 6)
    assert r.reliability == _rnd(rel9 / 1e9 / nn, 6)
    assert r.resolution == _rnd(res9 / 1e9 / nn, 6)
    assert r.uncertainty == _rnd(unc, 6)
    assert r.within_bin == _rnd(
        br9 / 1e9 / nn - (rel9 / 1e9 / nn - res9 / 1e9 / nn + unc), 6
    )
    # Murphy identity: BS = REL - RES + UNC + (WBV - WBC) — the
    # generalized residual combines Stephenson's within-bin variance
    # AND covariance terms, so it can be negative; it is only bounded
    # by being a small within-bin refinement of the binned identity
    assert abs(r.within_bin) <= r.brier
    assert all(v >= 0 for v in (r.brier, r.reliability, r.resolution))


# ---------------------------------------------------------------------------
# rbo_rankings — RBO math replayed over the two attested rankings
# ---------------------------------------------------------------------------


def test_rbo_rankings_matches_python(spark, sf_dir):
    # deterministic tie-break mirrors the query: bm25 desc, doc_id asc
    a_rows = _q("bm25_retrieval")(spark, sf_dir).collect()
    a_sorted = sorted(a_rows, key=lambda r: (-r.bm25, r.doc_id))
    ra = {r.doc_id: i + 1 for i, r in enumerate(a_sorted)}
    rb = {
        r.doc_id: r.rank
        for r in _q("query_likelihood_retrieval")(spark, sf_dir).collect()
    }
    m = {
        d: max(ra[d], rb[d]) for d in set(ra) & set(rb)
    }
    p = 0.9
    cum6 = 0
    expect = {}
    for d in range(1, 11):
        ov = sum(1 for v in m.values() if v <= d)
        w = (1.0 - p) * p ** (d - 1)
        cum6 += _snap(w * ov / (1.0 * d), 1e6)
        expect[d] = (ov, _rnd(ov / (1.0 * d), 6), _rnd(cum6 / 1e6, 6))
    got = {
        r.depth: (r.overlap, r.agreement, r.rbo_cum)
        for r in _q("rbo_rankings")(spark, sf_dir).collect()
    }
    assert got == expect
    # RBO is bounded by 1 and the cumulative sum is monotone
    cums = [got[d][2] for d in range(1, 11)]
    assert cums == sorted(cums) and cums[-1] <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# wilson_proportion_ci — interval algebra replayed from exact (k, n)
# ---------------------------------------------------------------------------


def test_wilson_proportion_ci_matches_python(spark, sf_dir):
    z = 1.959963984540054
    kn: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for r in _events_us(sf_dir):
        c = kn[r["event_type"]]
        c[1] += 1
        v = r["value"]
        cents = (
            math.floor(v * 100 + 0.5)
            if v >= 0
            else -math.floor(-v * 100 + 0.5)
        )
        c[0] += 1 if cents >= 5000 else 0
    expect = {}
    for et, (k, n) in kn.items():
        p = k / (1.0 * n)
        half = z * math.sqrt(
            p * (1.0 - p) / n + z * z / (4.0 * n * n)
        )
        den = 1.0 + z * z / n
        mid = p + z * z / (2.0 * n)
        wald = z * math.sqrt(p * (1.0 - p) / n)
        expect[et] = (
            n,
            k,
            _rnd(p, 6),
            _rnd((mid - half) / den, 6),
            _rnd((mid + half) / den, 6),
            _rnd(max(p - wald, 0.0), 6),
            _rnd(min(p + wald, 1.0), 6),
        )
    got = {
        r.event_type: (
            r.n_events,
            r.n_success,
            r.p_hat,
            r.wilson_lo,
            r.wilson_hi,
            r.wald_lo,
            r.wald_hi,
        )
        for r in _q("wilson_proportion_ci")(spark, sf_dir).collect()
    }
    assert got == expect
    # Wilson stays inside [0,1] and contains p_hat
    for (_, _, p, lo, hi, _, _) in got.values():
        assert 0.0 <= lo <= p <= hi <= 1.0


# ---------------------------------------------------------------------------
# hod_uniformity_test — the collapsed integer chi2 replayed
# ---------------------------------------------------------------------------


def test_hod_uniformity_matches_python(spark, sf_dir):
    crit = 35.17246162690805
    hod: dict[str, Counter] = defaultdict(Counter)
    for r in _events_us(sf_dir):
        h = (r["us"] // 3_600_000_000) % 24
        hod[r["event_type"]][h] += 1
    expect = {}
    for et, c in hod.items():
        if len(c) != 24:
            continue
        n = sum(c.values())
        q = sum(o * o for o in c.values())
        chi2 = (24.0 * q - 1.0 * n * n) / n
        # identity: the collapsed form equals the textbook per-bin sum
        e = n / 24.0
        textbook = sum((o - e) ** 2 / e for o in c.values())
        assert abs(chi2 - textbook) < 1e-6
        expect[et] = (
            n,
            24,
            max(c.values()),
            min(c.values()),
            _rnd(chi2, 6),
            1 if chi2 > crit else 0,
        )
    got = {
        r.event_type: (
            r.n_events,
            r.n_hours_seen,
            r.peak,
            r.trough,
            r.chi2,
            r.nonuniform_95,
        )
        for r in _q("hod_uniformity_test")(spark, sf_dir).collect()
    }
    assert got == expect
