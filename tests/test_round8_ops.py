"""Semantic invariants for the round-8 operators — third-implementation
differentials in plain Python, so a shared Spark/DuckDB bug cannot hide
behind engine agreement."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

from project_bigdata_spark.plans.catalog import load_all


def _q(name):
    return load_all()[name].builder


def _snap(x: float, s: float = 1e9) -> int:
    return math.floor(x * s + 0.5) if x >= 0 else -math.floor(-x * s + 0.5)


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w != ""]


def _md5u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()


# ---------------------------------------------------------------------------
# dsir_resample
# ---------------------------------------------------------------------------


def test_dsir_resample_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    B = 1024
    docb: dict[int, Counter] = {}
    lang = {}
    for r in docs:
        ws = _words(r.text)
        grams = list(ws)
        grams += [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        docb[r.doc_id] = Counter(_md5u32(g) % B for g in grams)
        lang[r.doc_id] = r.lang
    cr: Counter = Counter()
    ct: Counter = Counter()
    for i, c in docb.items():
        cr.update(c)
        if lang[i] == "en":
            ct.update(c)
    tr, tt = float(sum(cr.values())), float(sum(ct.values()))
    lr9 = {
        b: _snap(math.log((ct.get(b, 0) + 1) / (tt + B)))
        - _snap(math.log((cr[b] + 1) / (tr + B)))
        for b in cr
    }
    keyed = []
    for i, c in docb.items():
        logw9 = sum(n * lr9[b] for b, n in c.items())
        u = (_md5u32(str(i)) + 0.5) / 4294967296.0
        key9 = logw9 + _snap(-math.log(-math.log(u)))
        keyed.append((key9, i, logw9))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    expect = {
        i: (lang[i], round(logw9 / 1e9, 6), round(k9 / 1e9, 6))
        for k9, i, logw9 in keyed[:100]
    }
    got = {
        r.doc_id: (r.lang, r.log_weight, r.gumbel_key)
        for r in _q("dsir_resample")(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for i in expect:
        assert got[i][0] == expect[i][0]
        assert math.isclose(got[i][1], expect[i][1], abs_tol=2e-6)
        assert math.isclose(got[i][2], expect[i][2], abs_tol=2e-6)


def test_dsir_target_docs_rank_higher(spark, sf_dir):
    # the importance weight must, on average, favor the target slice
    rows = _q("dsir_resample")(spark, sf_dir).collect()
    en = sum(1 for r in rows if r.lang == "en")
    assert en > len(rows) // 2  # target share of the corpus is ~44%


# ---------------------------------------------------------------------------
# bpe_train_merges
# ---------------------------------------------------------------------------


def _bpe_reference(word_freq: dict[str, int], rounds: int):
    """Textbook sequential BPE trainer: true left-to-right greedy merge
    application (the catalog expresses this as parity-within-match-runs;
    here it is the literal scan, so the identity itself is under test)."""
    toks = {w: list(w) for w in word_freq}
    out = []
    for _ in range(rounds):
        counts: Counter = Counter()
        for w, ts in toks.items():
            for a, b in zip(ts, ts[1:]):
                counts[(a, b)] += word_freq[w]
        (lhs, rhs), total = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((lhs, rhs, total))
        for w, ts in toks.items():
            nts, i = [], 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == lhs and ts[i + 1] == rhs:
                    nts.append(lhs + rhs)
                    i += 2
                else:
                    nts.append(ts[i])
                    i += 1
            toks[w] = nts
    return out


def test_bpe_train_merges_matches_sequential_reference(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    wf: Counter = Counter()
    for r in docs:
        wf.update(_words(r.text))
    expect = _bpe_reference(dict(wf), 4)
    got = sorted(
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in _q("bpe_train_merges")(spark, sf_dir).collect()
    )
    assert got == [
        (i + 1, lhs, rhs, total) for i, (lhs, rhs, total) in enumerate(expect)
    ]


def test_bpe_parity_identity_on_runs():
    # the parity-within-match-runs identity vs the sequential scan on the
    # adversarial shapes the fixture lacks: runs, overlaps, repeats
    for word in ["aaaa", "aaaaa", "ababab", "aabaa", "abba", "aaabaaa"]:
        freq = {word: 1}  # the merge decision comes from the run word itself
        seq = _bpe_reference(freq, 1)
        # parity identity applied by hand to the same decision
        lhs, rhs, _ = seq[0]
        ts = list(word)
        n = len(ts)
        # m[p] (1-based p) = pair (ts[p], ts[p+1]) equals the merge
        m = {p: ts[p - 1] == lhs and ts[p] == rhs for p in range(1, n)}
        m[n] = False
        merge_at = {}
        last_nf = 0  # most recent non-matching position BEFORE p
        for p in range(1, n + 1):
            merge_at[p] = m[p] and (p - last_nf) % 2 == 1
            if not m[p]:
                last_nf = p
        merged = []
        consumed_prev = False
        for p in range(1, n + 1):
            if consumed_prev:  # token eaten by the previous merge
                consumed_prev = False
                continue
            if merge_at[p]:
                merged.append(ts[p - 1] + ts[p])
                consumed_prev = True
            else:
                merged.append(ts[p - 1])
        # sequential apply
        nts, i = [], 0
        while i < len(ts):
            if i + 1 < len(ts) and ts[i] == lhs and ts[i + 1] == rhs:
                nts.append(lhs + rhs)
                i += 2
            else:
                nts.append(ts[i])
                i += 1
        assert merged == nts, word


# ---------------------------------------------------------------------------
# anchor_substring_spans
# ---------------------------------------------------------------------------


def test_anchor_substring_spans_matches_bruteforce(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = [(r.doc_id, r.text) for r in docs] + [
        (r.doc_id + 9_000_000, "dup-seed " + r.text[16 : 16 + 140])
        for r in docs
        if r.doc_id % 29 == 0 and len(r.text) >= 160
    ]
    WIN, PROBE, RATE = 50, 8, 16
    anch = defaultdict(list)  # doc -> [(i, digest)]
    by_digest = defaultdict(set)
    for doc_id, text in corpus:
        n = len(text)
        for i in range(1, n - WIN + 2):
            probe = text[i - 1 : i - 1 + PROBE]
            if _md5u32(probe) % RATE == 0:
                dg = hashlib.md5(text[i - 1 : i - 1 + WIN].encode()).hexdigest()
                anch[doc_id].append((i, dg))
                by_digest[dg].add(doc_id)
    rep = {d for d, s in by_digest.items() if len(s) >= 2}
    expect = {}
    for doc_id, text in corpus:
        hits = sorted(i for i, dg in anch.get(doc_id, []) if dg in rep)
        spans, cur_s, cur_e = [], None, None
        for i in hits:
            e = i + WIN - 1
            if cur_e is None or i > cur_e + 1:
                if cur_e is not None:
                    spans.append((cur_s, cur_e))
                cur_s, cur_e = i, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            spans.append((cur_s, cur_e))
        covered = sum(e - s + 1 for s, e in spans)
        expect[doc_id] = (
            len(text),
            len(spans),
            covered,
            round(covered / max(len(text), 1), 4),
        )
    got = {
        r.doc_id: (r.total_chars, r.n_spans, r.covered_chars, r.coverage)
        for r in _q("anchor_substring_spans")(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for i in expect:
        assert got[i][:3] == expect[i][:3], i
        assert math.isclose(got[i][3], expect[i][3], abs_tol=1e-9), i


def test_anchor_spans_seeded_docs_are_covered(spark, sf_dir):
    rows = _q("anchor_substring_spans")(spark, sf_dir).collect()
    seeded = [r for r in rows if r.doc_id >= 9_000_000]
    if seeded:  # sf0.001 may have no qualifying seed docs
        # every synthetic near-copy must be detected with real coverage
        assert all(r.n_spans >= 1 for r in seeded)
        assert all(r.coverage > 0.3 for r in seeded)


# ---------------------------------------------------------------------------
# contamination_audit
# ---------------------------------------------------------------------------


def test_contamination_audit_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    K, STRIDE = 13, 41
    grams = {}
    for r in docs:
        ws = _words(r.text)
        if len(ws) >= K:
            grams[r.doc_id] = [
                " ".join(ws[i : i + K]) for i in range(len(ws) - K + 1)
            ]
    bench = set()
    for i, gs in grams.items():
        if i % STRIDE == 0:
            bench.update(gs)
    expect = {
        i: (len(gs), len(set(gs) & bench), int(bool(set(gs) & bench)))
        for i, gs in grams.items()
    }
    got = {
        r.doc_id: (r.n_grams, r.n_bench_hits, r.contaminated)
        for r in _q("contamination_audit")(spark, sf_dir).collect()
    }
    assert got == expect


def test_contamination_benchmark_donors_flagged(spark, sf_dir):
    rows = _q("contamination_audit")(spark, sf_dir).collect()
    donors = [r for r in rows if r.doc_id % 41 == 0]
    assert donors and all(r.contaminated == 1 for r in donors)


# ---------------------------------------------------------------------------
# leakage_safe_split
# ---------------------------------------------------------------------------


def test_leakage_safe_split_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = [(r.doc_id, r.text) for r in docs] + [
        (r.doc_id + 8_000_000, r.text) for r in docs if r.doc_id % 37 == 0
    ]
    expect = {}
    for scheme in ("doc_hash", "cluster_hash"):
        splits = defaultdict(set)  # ckey -> set of splits
        sizes = Counter()
        for doc_id, text in corpus:
            ckey = hashlib.md5(text.lower().encode()).hexdigest()
            b = (
                _md5u32(str(doc_id)) if scheme == "doc_hash" else _md5u32(ckey)
            ) % 10
            split = "train" if b <= 7 else ("val" if b == 8 else "test")
            splits[ckey].add(split)
            sizes[split] += 1
        expect[scheme] = (
            sizes["train"],
            sizes["val"],
            sizes["test"],
            len(splits),
            sum(1 for s in splits.values() if len(s) > 1),
        )
    got = {
        r.scheme: (r.n_train, r.n_val, r.n_test, r.n_clusters, r.n_leaky_clusters)
        for r in _q("leakage_safe_split")(spark, sf_dir).collect()
    }
    assert got == expect


def test_cluster_hash_never_leaks(spark, sf_dir):
    rows = {r.scheme: r for r in _q("leakage_safe_split")(spark, sf_dir).collect()}
    # the audited invariant: bucketing by cluster key CANNOT split a
    # cluster, whatever the data (exactness vs python is tested above)
    assert rows["cluster_hash"].n_leaky_clusters == 0


# ---------------------------------------------------------------------------
# gopher_quality_gates
# ---------------------------------------------------------------------------


def test_gopher_quality_gates_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    stop = {"the", "a", "be", "to", "of", "and", "that", "have", "with"}
    expect = {}
    for r in docs:
        ws = _words(r.text)
        n = len(ws)
        sum_len = sum(len(w) for w in ws)
        n_alpha = sum(1 for w in ws if re.search(r"[a-z]", w))
        n_stop = len({w for w in ws if w in stop})
        n_hash = r.text.count("#")
        n_ellip = (len(r.text) - len(r.text.replace("...", ""))) // 3
        lines = r.text.split("\n")
        n_bullet = sum(1 for x in lines if x.startswith(("-", "*")))
        n_ellip_end = sum(1 for x in lines if x.endswith("..."))
        bits = (
            int(50 <= n <= 100000),
            int(3 * n <= sum_len <= 10 * n),
            int(10 * (n_hash + n_ellip) < n),
            int(10 * n_bullet <= 9 * len(lines)),
            int(10 * n_ellip_end < 3 * len(lines)),
            int(5 * n_alpha >= 4 * n),
            int(n_stop >= 2),
        )
        expect[r.doc_id] = bits + (sum(bits), int(sum(bits) == 7))
    got = {
        r.doc_id: (
            r.r_word_count, r.r_mean_word_len, r.r_symbol_ratio,
            r.r_bullet_lines, r.r_ellipsis_lines, r.r_alpha_words,
            r.r_stopwords, r.n_rules_passed, r.pass_all,
        )
        for r in _q("gopher_quality_gates")(spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    wf: Counter = Counter()
    for r in docs:
        wf.update(_words(r.text))
    # replay the trainer, then segment-count per language
    toks = {w: list(w) for w in wf}
    for lhs, rhs, _ in _bpe_reference(dict(wf), 4):
        for w, ts in toks.items():
            nts, i = [], 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == lhs and ts[i + 1] == rhs:
                    nts.append(lhs + rhs)
                    i += 2
                else:
                    nts.append(ts[i])
                    i += 1
            toks[w] = nts
    stats = defaultdict(lambda: [0, 0, 0])  # lang -> [words, tokens, chars]
    for r in docs:
        for w in _words(r.text):
            s = stats[r.lang]
            s[0] += 1
            s[1] += len(toks[w])
            s[2] += len(w)
    expect = {
        lang: (nw, nt, nc, round(nt / nw, 6), round(nc / nt, 6))
        for lang, (nw, nt, nc) in stats.items()
    }
    got = {
        r.lang: (r.n_words, r.n_tokens, r.n_chars, r.fertility, r.chars_per_token)
        for r in _q("tokenizer_fertility")(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for lang in expect:
        assert got[lang][:3] == expect[lang][:3], lang
        assert math.isclose(got[lang][3], expect[lang][3], abs_tol=2e-6)
        assert math.isclose(got[lang][4], expect[lang][4], abs_tol=2e-6)
