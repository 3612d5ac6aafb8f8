"""Semantic invariants for the round-7 operators — third-implementation
differentials in plain Python, so a shared Spark/DuckDB bug cannot hide
behind engine agreement."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import pyspark.sql.functions as F

from project_bigdata_spark.plans.catalog import load_all


def _q(name):
    return load_all()[name].builder


def _snap(x: float, s: float) -> int:
    return math.floor(x * s + 0.5) if x >= 0 else -math.floor(-x * s + 0.5)


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w != ""]


def _docs(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    ).collect()


# ---------------------------------------------------------------------------
# simhash_hamming_pairs
# ---------------------------------------------------------------------------

def _simhash60(text: str) -> int:
    votes = [0] * 60
    for w in _words(text):
        h = hashlib.md5(w.encode()).hexdigest()
        for b in range(60):
            nibble = int(h[b // 4], 16)
            bit = (nibble >> (3 - b % 4)) & 1
            votes[b] += 2 * bit - 1
    total = 0
    for b in range(60):
        if votes[b] > 0:
            total |= 1 << (59 - b)
    return total


def test_simhash_hamming_pairs_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = [(r.doc_id, r.text) for r in docs] + [
        (r.doc_id + 10_000_000, r.text) for r in docs if r.doc_id % 31 == 0
    ]
    sh = {i: _simhash60(t) for i, t in corpus}
    buckets = defaultdict(list)
    for i, s in sh.items():
        for band in range(4):
            buckets[(band, (s >> (15 * band)) & 32767)].append(i)
    expect = {}
    for _, ids in buckets.items():
        if len(ids) > 1000:
            continue
        for a in ids:
            for b in ids:
                if a < b:
                    h = bin(sh[a] ^ sh[b]).count("1")
                    if h <= 3:
                        expect[(a, b)] = h
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in _q("simhash_hamming_pairs")(spark, sf_dir).collect()
    }
    assert got == expect
    # the seeded exact copies must be present at distance 0
    seeded = {(r.doc_id, r.doc_id + 10_000_000) for r in docs if r.doc_id % 31 == 0}
    assert seeded <= set(got) and all(got[p] == 0 for p in seeded)


# ---------------------------------------------------------------------------
# hll_distinct_audit
# ---------------------------------------------------------------------------

def test_hll_distinct_audit_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .collect()
    )
    regs: dict[str, list[int]] = defaultdict(lambda: [0] * 16)
    exact: dict[str, set] = defaultdict(set)
    for r in rows:
        h = hashlib.md5(str(r.user_id).encode()).hexdigest()
        reg = int(h[0], 16)
        w = int(h[1:9], 16)
        rho = 33 if w == 0 else 32 - w.bit_length() + 1
        regs[r.event_type][reg] = max(regs[r.event_type][reg], rho)
        exact[r.event_type].add(r.user_id)
    got = {r.event_type: r for r in _q("hll_distinct_audit")(spark, sf_dir).collect()}
    assert set(got) == set(regs)
    for et, ms in regs.items():
        t = sum(1 << (33 - m) for m in ms)
        v = sum(1 for m in ms if m == 0)
        raw = (0.673 * 256.0 * 2.0**33) / t
        if raw <= 40.0 and v > 0:
            est = 16.0 * (_snap(math.log(16.0 / v), 1e9) / 1e9)
        else:
            est = raw
        assert got[et].exact_distinct == len(exact[et])
        assert abs(got[et].hll_estimate - est) < 1e-3
        # the estimator must actually be in the right ballpark
        assert abs(got[et].rel_err) < 0.6


# ---------------------------------------------------------------------------
# chao1_vocab_richness
# ---------------------------------------------------------------------------

def test_chao1_matches_python(spark, sf_dir):
    counts: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for r in _docs(spark, sf_dir):
        for w in _words(r.text):
            counts[r.lang][w] += 1
    got = {r.lang: r for r in _q("chao1_vocab_richness")(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    for lang, wc in counts.items():
        v = len(wc)
        f1 = sum(1 for c in wc.values() if c == 1)
        f2 = sum(1 for c in wc.values() if c == 2)
        n = sum(wc.values())
        row = got[lang]
        assert (row.vocab, row.f1, row.f2, row.n_tokens) == (v, f1, f2, n)
        assert abs(row.chao1_richness - (v + f1 * (f1 - 1) / (2.0 * (f2 + 1)))) < 1e-3
        assert abs(row.gt_unseen_mass - f1 / n) < 1e-5
        assert row.chao1_richness >= row.vocab  # richness never below observed


# ---------------------------------------------------------------------------
# heaps_law_fit
# ---------------------------------------------------------------------------

def test_heaps_law_fit_matches_python(spark, sf_dir):
    slices: dict[tuple, list[str]] = defaultdict(list)
    for r in _docs(spark, sf_dir):
        slices[(r.lang, r.source)].extend(_words(r.text))
    pts = [
        (_snap(math.log(len(ws)), 1e9), _snap(math.log(len(set(ws))), 1e9))
        for ws in slices.values()
    ]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    syy = sum(p[1] * p[1] for p in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    row = _q("heaps_law_fit")(spark, sf_dir).collect()[0]
    assert row.n_slices == n
    assert abs(row.heaps_beta - beta) < 1e-4
    assert abs(row.r_squared - r2) < 1e-4
    assert 0.0 < row.heaps_beta < 1.0  # sub-linear vocabulary growth


# ---------------------------------------------------------------------------
# luhn_pii_audit
# ---------------------------------------------------------------------------

def _luhn_ok(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_luhn_pii_audit_matches_python(spark, sf_dir):
    per = defaultdict(lambda: [0, 0])  # lang -> [n_even, n_odd]
    for r in _docs(spark, sf_dir):
        per[r.lang][r.doc_id % 2] += 1
        # the seeded PAN must itself satisfy the operator's claim
        pan15 = str((r.doc_id * 7919) % 10**14).zfill(15)
        for chk in range(10):
            if _luhn_ok(pan15 + str(chk)):
                break
        assert _luhn_ok(pan15 + str(chk))
    got = {r.lang: r for r in _q("luhn_pii_audit")(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for lang, (n_even, n_odd) in per.items():
        row = got[lang]
        assert row.n_candidates == n_even + n_odd
        assert row.n_luhn_valid == n_even      # even doc_ids seeded valid
        assert row.n_luhn_invalid == n_odd     # odd doc_ids seeded broken
        assert row.n_residual_after_scrub == 0


# ---------------------------------------------------------------------------
# readability_scores
# ---------------------------------------------------------------------------

def test_readability_matches_python(spark, sf_dir):
    sums = defaultdict(lambda: [0, 0, 0])  # lang -> [n, sum_fl6, sum_fk6]
    for r in _docs(spark, sf_dir):
        wn = max(1, len(_words(r.text)))
        sn = max(1, len(re.findall(r"[.!?]+", r.text)))
        yn = len(re.findall(r"[aeiouy]+", r.text.lower()))
        fl = 206.835 - 1.015 * (wn / sn) - 84.6 * (yn / wn)
        fk = 0.39 * (wn / sn) + 11.8 * (yn / wn) - 15.59
        s = sums[r.lang]
        s[0] += 1
        s[1] += _snap(fl, 1e6)
        s[2] += _snap(fk, 1e6)
    got = {r.lang: r for r in _q("readability_scores")(spark, sf_dir).collect()}
    assert set(got) == set(sums)
    for lang, (n, sfl, sfk) in sums.items():
        row = got[lang]
        assert row.n_docs == n
        assert abs(row.avg_flesch - sfl / n / 1e6) < 1e-3
        assert abs(row.avg_fk_grade - sfk / n / 1e6) < 1e-3


# ---------------------------------------------------------------------------
# temperature_mix_allocation
# ---------------------------------------------------------------------------

def test_temperature_mix_allocation_matches_python(spark, sf_dir):
    langs = defaultdict(int)
    for r in _docs(spark, sf_dir):
        langs[r.lang] += 1
    nt = sum(langs.values())
    w9 = {l: _snap(math.sqrt(math.sqrt(n / nt)), 1e9) for l, n in langs.items()}
    s = sum(w9.values())
    base = {l: (1000 * w) // s for l, w in w9.items()}
    rem = {l: (1000 * w) % s for l, w in w9.items()}
    extras = 1000 - sum(base.values())
    order = sorted(langs, key=lambda l: (-rem[l], l))
    alloc = {
        l: base[l] + (1 if order.index(l) < extras else 0) for l in langs
    }
    got = {r.lang: r for r in _q("temperature_mix_allocation")(spark, sf_dir).collect()}
    assert {l: r.alloc for l, r in got.items()} == alloc
    assert sum(r.alloc for r in got.values()) == 1000  # exact apportionment
    # temperature flattening: every language's share sits between its raw
    # share and the uniform share (the point of the exponent)
    uni = 1000 / len(langs)
    for l, n in langs.items():
        raw = 1000 * n / nt
        lo, hi = min(raw, uni) - 1, max(raw, uni) + 1
        assert lo <= got[l].alloc <= hi


# ---------------------------------------------------------------------------
# ann_recall_audit
# ---------------------------------------------------------------------------

def test_ann_recall_audit_matches_python(spark, sf_dir):
    from project_bigdata_spark.operators import similarity as SIM
    from project_bigdata_spark.sources import load_table

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    signs = [SIM.plane_signs(p) for p in range(SIM.N_PLANES)]

    def bucket(v):
        return "".join(
            "1" if sum(a * b for a, b in zip(v, sg)) > 0 else "0"
            for sg in signs
        )

    def cos6(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b)
        )
        return _snap(num / den, 1e6)

    bk = {i: bucket(v) for i, v in vecs.items()}
    got = {r.query_id: r for r in _q("ann_recall_audit")(spark, sf_dir).collect()}
    for qid in range(8):
        qv = vecs[qid]
        probes = {bk[qid]} | {
            bk[qid][:p] + ("0" if bk[qid][p] == "1" else "1") + bk[qid][p + 1:]
            for p in range(8)
        }
        cand = [i for i, b in bk.items() if b in probes and i != qid]
        rank = lambda ids: sorted(ids, key=lambda i: (-cos6(vecs[i], qv), i))
        ann10 = set(rank(cand)[:10])
        gt10 = set(rank([i for i in vecs if i != qid])[:10])
        row = got[qid]
        assert row.n_candidates == len(cand)
        assert row.n_hits == len(ann10 & gt10)
        assert abs(row.recall_at_10 - len(ann10 & gt10) / 10.0) < 1e-9


# ---------------------------------------------------------------------------
# event_order_inversions
# ---------------------------------------------------------------------------

def test_event_order_inversions_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        jit = int(hashlib.md5(str(r.event_id).encode()).hexdigest()[:2], 16) % 8
        per_user[r.user_id].append(
            (r.ts_us + 3_600_000_000 * jit, r.event_id, r.ts_us, r.event_type)
        )
    stats = defaultdict(lambda: [0, 0, 0, 0])  # type -> [n, late, max, sum]
    n_late_total = 0
    for evs in per_user.values():
        evs.sort()
        prev = None
        for _, _, ts_us, et in evs:
            s = stats[et]
            s[0] += 1
            if prev is not None and prev > ts_us:
                s[1] += 1
                s[2] = max(s[2], prev - ts_us)
                s[3] += prev - ts_us
                n_late_total += 1
            prev = ts_us
    assert n_late_total > 0  # the seeded jitter must create real lateness
    got = {r.event_type: r for r in _q("event_order_inversions")(spark, sf_dir).collect()}
    assert set(got) == set(stats)
    for et, (n, late, mx, tot) in stats.items():
        row = got[et]
        assert (row.n_events, row.n_late, row.max_lateness_us) == (n, late, mx)
        assert abs(row.avg_lateness_us - tot / max(1, late)) < 1e-2


# ---------------------------------------------------------------------------
# gumbel_topk_sample
# ---------------------------------------------------------------------------

def test_gumbel_topk_sample_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    from project_bigdata_spark.sources import load_table

    nchars = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    keys = {}
    for i, nc in nchars.items():
        u32 = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (u32 + 0.5) / 4294967296.0
        keys[i] = _snap(math.log(nc), 1e9) + _snap(-math.log(-math.log(u)), 1e9)
    expect = sorted(keys, key=lambda i: (-keys[i], i))[:100]
    got = [r.doc_id for r in sorted(
        _q("gumbel_topk_sample")(spark, sf_dir).collect(),
        key=lambda r: (-r.gumbel_key, r.doc_id),
    )]
    assert got == expect[: len(got)]
    assert len(got) == min(100, len(nchars))
    # weight-proportionality sanity: the sampled docs skew long
    if len(nchars) > 150:
        samp = sum(nchars[i] for i in got) / len(got)
        pop = sum(nchars.values()) / len(nchars)
        assert samp > pop


# ---------------------------------------------------------------------------
# winnowing_fingerprints
# ---------------------------------------------------------------------------

def _shingles(text):
    ws = _words(text)
    if len(ws) >= 3:
        return [" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)]
    return [text.lower()]


def test_winnowing_fingerprints_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = [(r.doc_id, r.text) for r in docs] + [
        (r.doc_id + 10_000_000, r.text) for r in docs if r.doc_id % 31 == 0
    ]
    fps = {}
    for i, t in corpus:
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            for s in _shingles(t)
        ]
        if len(hs) >= 4:
            wins = [min(hs[j:j + 4]) for j in range(len(hs) - 3)]
        else:
            wins = [min(hs)]
        fps[i] = set(wins)
    postings = defaultdict(set)
    for i, s in fps.items():
        for f in s:
            postings[f].add(i)
    shared = defaultdict(int)
    for f, ids in postings.items():
        if len(ids) > 64:
            continue
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                shared[(ids[x], ids[y])] += 1
    expect = {p: c for p, c in shared.items() if c >= 2}
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in _q("winnowing_fingerprints")(spark, sf_dir).collect()
    }
    assert got == expect
    # winnowing coverage: every seeded exact copy shares ALL fingerprints
    for i, t in corpus:
        if i >= 10_000_000:
            assert got.get((i - 10_000_000, i)) == len(fps[i])


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs
# ---------------------------------------------------------------------------

def test_tfidf_cosine_pairs_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = [(r.doc_id, r.text) for r in docs] + [
        (r.doc_id + 10_000_000, r.text) for r in docs if r.doc_id % 31 == 0
    ]
    tf = {i: defaultdict(int) for i, _ in corpus}
    for i, t in corpus:
        for s in _shingles(t):
            tf[i][s] += 1
    df = defaultdict(int)
    for i in tf:
        for s in tf[i]:
            df[s] += 1
    n = len(corpus)
    wt = {
        i: {
            s: c * _snap(math.log(n / df[s]), 1e9)
            for s, c in tf[i].items()
            if df[s] <= 16
        }
        for i in tf
    }
    nrm = {
        i: math.sqrt(sum(w * w for w in v.values()))
        for i, v in wt.items()
        if v
    }
    expect = {}
    ids = sorted(nrm)
    postings = defaultdict(list)
    for i in ids:
        for s in wt[i]:
            postings[s].append(i)
    dots = defaultdict(int)
    for s, ps in postings.items():
        for x in range(len(ps)):
            for y in range(x + 1, len(ps)):
                dots[(ps[x], ps[y])] += wt[ps[x]][s] * wt[ps[y]][s]
    for (a, b), dot in dots.items():
        cos = _snap(dot / (nrm[a] * nrm[b]), 1e6) / 1e6
        if cos >= 0.3:
            expect[(a, b)] = cos
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in _q("tfidf_cosine_pairs")(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for p, c in expect.items():
        assert abs(got[p] - c) < 2e-6
    # every seeded exact copy pairs with its original at cosine 1.0
    for i, _ in corpus:
        if i >= 10_000_000 and (i - 10_000_000) in nrm and i in nrm:
            assert got.get((i - 10_000_000, i)) == 1.0


# ---------------------------------------------------------------------------
# kcenter_maximin_init
# ---------------------------------------------------------------------------

def test_kcenter_maximin_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }

    def d6(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b)
        )
        return 1000000 - _snap(num / den, 1e6)

    centers = [0]
    dmin = {i: d6(v, vecs[0]) for i, v in vecs.items() if i != 0}
    expect = [(0, 0, None)]
    for r in range(1, 8):
        nxt = min(dmin, key=lambda i: (-dmin[i], i))
        expect.append((r, nxt, dmin[nxt] / 1e6))
        centers.append(nxt)
        del dmin[nxt]
        for i in dmin:
            dmin[i] = min(dmin[i], d6(vecs[i], vecs[nxt]))
    got = sorted(
        (r.sel_round, r.center_id, r.radius)
        for r in _q("kcenter_maximin_init")(spark, sf_dir).collect()
    )
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in expect]
    for (_, _, rg), (_, _, re_) in zip(got[1:], expect[1:]):
        assert abs(rg - re_) < 2e-6
    # maximin property: selection radii are non-increasing
    radii = [x for _, _, x in got[1:]]
    assert all(radii[i] >= radii[i + 1] for i in range(len(radii) - 1))


# ---------------------------------------------------------------------------
# fellegi_sunter_linkage
# ---------------------------------------------------------------------------

def test_fellegi_sunter_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    from project_bigdata_spark.sources import load_table

    nchars = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    recs = {}
    for r in docs:
        recs[r.doc_id] = (r.lang, r.source, r.text, nchars[r.doc_id])
        if r.doc_id % 31 == 0:
            recs[r.doc_id + 10_000_000] = (
                r.lang, r.source, r.text, nchars[r.doc_id],
            )
    keyed = {}
    for i, (lang, src, text, nc) in recs.items():
        ws = _words(text)
        keyed[i] = (lang, ws[0], text.lower()[:16], nc // 50, src)
    blocks = defaultdict(list)
    for i, k in keyed.items():
        blocks[(k[0], k[1])].append(i)
    cand = []
    for ids in blocks.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                ka, kb = keyed[a], keyed[b]
                cand.append((
                    int(ka[2] == kb[2]), int(ka[3] == kb[3]),
                    int(ka[4] == kb[4]),
                    int(b - a == 10_000_000 and a % 31 == 0),
                ))
    nm = sum(c[3] for c in cand)
    nu = len(cand) - nm
    ms = [sum(c[f] * c[3] for c in cand) for f in range(3)]
    us = [sum(c[f] * (1 - c[3]) for c in cand) for f in range(3)]

    def w9(agree, f):
        if agree:
            return _snap(math.log(((ms[f] + 1.0) / (nm + 2))
                                  / ((us[f] + 1.0) / (nu + 2))), 1e9)
        return _snap(math.log(((nm - ms[f] + 1.0) / (nm + 2))
                              / ((nu - us[f] + 1.0) / (nu + 2))), 1e9)

    cells = defaultdict(lambda: [0, 0])
    for c in cand:
        w = sum(w9(c[f], f) for f in range(3))
        key = (1 if w >= 0 else 0, c[3])
        cells[key][0] += 1
        cells[key][1] += w
    got = {
        (r.pred_match, r.true_match): r
        for r in _q("fellegi_sunter_linkage")(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for k, (n, wsum) in cells.items():
        assert got[k].n_pairs == n
        assert abs(got[k].avg_weight - wsum / n / 1e9) < 1e-3
    # every seeded true match must be classified as a match
    assert (0, 1) not in cells or cells[(0, 1)][0] == 0
    assert cells[(1, 1)][0] == sum(1 for r in docs if r.doc_id % 31 == 0)


# ---------------------------------------------------------------------------
# blocking_quality_audit
# ---------------------------------------------------------------------------

def test_blocking_quality_audit_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    recs = {r.doc_id: (r.lang, r.source, r.text) for r in docs}
    truth = []
    for r in docs:
        if r.doc_id % 31 != 0:
            continue
        if r.doc_id % 3 == 0:
            t = r.text
        elif r.doc_id % 3 == 1:
            t = "zz " + r.text
        else:
            t = r.text[: max(20, (len(r.text) * 3) // 5)]
        recs[r.doc_id + 10_000_000] = (r.lang, r.source, t)
        truth.append((r.doc_id, r.doc_id + 10_000_000))

    def keys(lang, src, text):
        ws = _words(text)
        return {
            "lang_fw": (lang, ws[0]),
            "lang_source": (lang, src),
            "prefix8": text.lower()[:8],
            "lenbucket": (lang, len(text) // 50),
        }

    keyed = {i: keys(*v) for i, v in recs.items()}
    n = len(keyed)
    total = n * (n - 1) / 2.0
    got = {
        r.scheme: r
        for r in _q("blocking_quality_audit")(spark, sf_dir).collect()
    }
    for s in ("lang_fw", "lang_source", "prefix8", "lenbucket"):
        blocks = defaultdict(int)
        for k in keyed.values():
            blocks[k[s]] += 1
        cand = sum(c * (c - 1) // 2 for c in blocks.values())
        found = sum(1 for o, se in truth if keyed[o][s] == keyed[se][s])
        row = got[s]
        assert row.n_blocks == len(blocks)
        assert row.candidate_pairs == cand
        assert abs(row.reduction_ratio - (1.0 - cand / total)) < 1e-5
        assert row.truth_pairs == len(truth)
        assert row.truth_found == found
        assert abs(row.pairs_completeness - found / len(truth)) < 1e-5
    # the edit-class seeding must actually differentiate the schemes:
    # metadata blocking keeps everything, content blocking loses edits
    assert got["lang_source"].pairs_completeness == 1.0
    if len(truth) >= 3:
        assert got["lang_fw"].pairs_completeness < 1.0
