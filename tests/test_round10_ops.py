"""Third-implementation semantic tests for the round-10 entries:
properties recomputed in plain Python against the Spark output,
independent of both the Spark plan and the DuckDB oracle."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import pytest

from project_bigdata_spark.plans.catalog import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    return load_all()


def _rnd(x: float, n: int) -> float:
    """Python mirror of _norm.sql_rnd (sign-aware floor, IEEE ops)."""
    s = 10.0**n
    if x >= 0:
        return math.floor(x * s + 0.5) / s
    return -(math.floor(-x * s + 0.5) / s)


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs(spark):
    return spark.read.parquet(SF + "/documents.parquet").collect()


def _lines(text: str, k: int = 3) -> list[str]:
    # independent of corpus casing/spacing (the plan's words_col
    # lowercases and splits on \s+), then the content-keyed
    # terminal-punctuation seed the shared seg frame applies
    ws = [w for w in re.split(r"\s+", text.lower()) if w]
    segs = [" ".join(ws[i : i + k]) for i in range(0, len(ws), k)]
    punct = {"e": ".", "r": "!", "n": "?"}
    return [s + punct.get(s[-1], "") if s else s for s in segs]


# ---------------------------------------------------------------------------
# udtf_trigram_spans
# ---------------------------------------------------------------------------


def test_udtf_trigram_spans_replay(spark, specs):
    rows = {
        r["doc_id"]: r
        for r in specs["udtf_trigram_spans"].builder(spark, SF).collect()
    }
    docs = _docs(spark)
    checked = 0
    for d in docs:
        words = d["text"].split(" ")
        if len(words) < 3:
            assert d["doc_id"] not in rows
            continue
        sig = 0
        pos = 0
        last = 0
        n = 0
        for i in range(len(words) - 2):
            span = " ".join(words[i : i + 3])
            sig += _md5_32(f"{span}:{pos}")
            last = pos
            n += 1
            pos += len(words[i]) + 1
        r = rows[d["doc_id"]]
        assert r["n_spans"] == n
        assert r["span_sig"] == sig
        assert r["last_start"] == last
        checked += 1
    assert checked == len(rows) > 0


# ---------------------------------------------------------------------------
# gbm_depth2_trees
# ---------------------------------------------------------------------------


def _cents6(v: float) -> int:
    s = 10**6
    if v >= 0:
        return math.floor(v * s + 0.5)
    return -math.floor(-v * s + 0.5)


def test_gbm_depth2_round1_replay(spark, specs):
    """Full Python replay of round 1: root split, per-side sub-splits,
    leaf values — exact equality on thetas/leaves (same IEEE ops)."""
    out = [
        r
        for r in specs["gbm_depth2_trees"].builder(spark, SF).collect()
        if r["step"] == 1
    ]
    ev = spark.read.parquet(SF + "/events.parquet").collect()
    pts = [
        (e["ts"].hour, e["ts"].day, _cents6(e["value"])) for e in ev
    ]
    cands = [("h", t) for t in range(0, 23)] + [
        ("d", t) for t in range(1, 31)
    ]

    def best(points):
        n = len(points)
        st = sum(p[2] for p in points)
        top = None
        for f, theta in cands:
            fi = 0 if f == "h" else 1
            nl = sum(1 for p in points if p[fi] <= theta)
            if nl == 0 or nl == n:
                continue
            sl = sum(p[2] for p in points if p[fi] <= theta)
            score = (sl / (nl * 1.0)) * sl + (
                (st - sl) / ((n - nl) * 1.0)
            ) * (st - sl)
            # tie-break: score DESC, f, theta (total order)
            key = (-score, f, theta)
            if top is None or key < top[0]:
                top = (key, f, theta, nl, sl)
        return top, n, st

    (_, rf, rtheta, _, _), _, _ = best(pts)
    by_side = {
        "L": [p for p in pts if (p[0] if rf == "h" else p[1]) <= rtheta],
        "R": [p for p in pts if (p[0] if rf == "h" else p[1]) > rtheta],
    }
    for r in out:
        assert r["root_feature"] == rf and r["root_theta"] == rtheta
        side_pts = by_side[r["side"]]
        top, n, st = best(side_pts)
        assert r["n_side"] == n
        if top is None:
            assert r["sub_feature"] == "-" and r["sub_theta"] == -1
            g = math.floor(0.5 * st / n + 0.5) if st >= 0 else -math.floor(
                -(0.5 * st / n) + 0.5
            )
            assert r["leaf_left"] == _rnd(g / 1.0e6, 6)
            assert r["leaf_right"] == _rnd(g / 1.0e6, 6)
        else:
            _, f2, theta2, nl, sl = top
            assert r["sub_feature"] == f2 and r["sub_theta"] == theta2
            assert r["n_sub_left"] == nl
            gl = 0.5 * sl / nl
            gr = 0.5 * (st - sl) / (n - nl)
            gl6 = math.floor(gl + 0.5) if gl >= 0 else -math.floor(-gl + 0.5)
            gr6 = math.floor(gr + 0.5) if gr >= 0 else -math.floor(-gr + 0.5)
            assert r["leaf_left"] == _rnd(gl6 / 1.0e6, 6)
            assert r["leaf_right"] == _rnd(gr6 / 1.0e6, 6)


def test_gbm_depth2_curve_below_stumps(spark, specs):
    """Per-round total SSE strictly below the depth-1 stump curve, and
    the depth-2 curve is internally consistent (after_r == before_{r+1},
    every split round reduces)."""
    d2 = specs["gbm_depth2_trees"].builder(spark, SF).collect()
    st = specs["gbm_residual_stumps"].builder(spark, SF).collect()
    after = defaultdict(float)
    before = defaultdict(float)
    for r in d2:
        after[r["step"]] += r["sse_after"]
        before[r["step"]] += r["sse_before"]
    stump_after = {r["step"]: r["sse_after"] for r in st}
    stump_before = {r["step"]: r["sse_before"] for r in st}
    for s in sorted(after):
        assert after[s] <= before[s] + 1e-3
        assert after[s] < stump_after[s], (s, after[s], stump_after[s])
        if s + 1 in before:
            assert abs(before[s + 1] - after[s]) < 1e-2
    # round 1 starts from the identical residual frame
    assert abs(before[1] - stump_before[1]) < 1e-2


# ---------------------------------------------------------------------------
# line-level FineWeb tier
# ---------------------------------------------------------------------------


def test_line_quality_stats_replay(spark, specs):
    rows = {
        r["doc_id"]: r
        for r in specs["line_quality_stats"].builder(spark, SF).collect()
    }
    punct_total = 0
    for d in _docs(spark):
        lines = _lines(d["text"])
        r = rows[d["doc_id"]]
        n_short = sum(1 for x in lines if len(x) < 14)
        n_punct = sum(1 for x in lines if re.search(r"[.!?]$", x))
        punct_total += n_punct
        assert r["n_lines"] == len(lines)
        assert r["n_short"] == n_short
        assert r["short_line_share"] == _rnd(n_short / len(lines), 6)
        assert r["terminal_punct_line_share"] == _rnd(
            n_punct / len(lines), 6
        )
        assert r["avg_line_chars"] == _rnd(
            sum(len(x) for x in lines) / len(lines), 6
        )
        assert r["max_line_chars"] == max(len(x) for x in lines)
    # the seeded signal must be NON-vacuous (round-11 verdict ask #4)
    assert punct_total > 0


def test_line_dedup_apply_replay(spark, specs):
    rows = {
        r["doc_id"]: r
        for r in specs["line_dedup_apply"].builder(spark, SF).collect()
    }
    any_removed = 0
    for d in _docs(spark):
        lines = _lines(d["text"])
        seen: set[str] = set()
        kept = []
        dropped_chars = 0
        for x in lines:
            if x in seen:
                dropped_chars += len(x)
            else:
                seen.add(x)
                kept.append(x)
        r = rows[d["doc_id"]]
        assert r["n_lines"] == len(lines)
        assert r["n_kept"] == len(kept)
        tot = sum(len(x) for x in lines)
        assert r["removed_char_share"] == _rnd(dropped_chars / tot, 6)
        assert (
            r["dedup_md5"]
            == hashlib.md5(" ".join(kept).encode()).hexdigest()
        )
        any_removed += len(lines) - len(kept)
    assert any_removed >= 0  # guard may be inactive at the smoke SF


def test_line_gate_filter_replay(spark, specs):
    rows = {
        r["lang"]: r
        for r in specs["line_gate_filter"].builder(spark, SF).collect()
    }
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0])
    for d in _docs(spark):
        lines = _lines(d["text"])
        n_lines = len(lines)
        n_short = sum(1 for x in lines if len(x) < 14)
        seen: set[str] = set()
        dup_chars = 0
        for x in lines:
            if x in seen:
                dup_chars += len(x)
            seen.add(x)
        tot = sum(len(x) for x in lines)
        f_short = 4 * n_short > n_lines
        f_dup = 20 * dup_chars > tot
        f_few = n_lines < 8
        a = agg[d["lang"]]
        a[0] += 1
        a[1] += not (f_short or f_dup or f_few)
        a[2] += f_short
        a[3] += f_dup
        a[4] += f_few
    assert set(rows) == set(agg)
    for lang, a in agg.items():
        r = rows[lang]
        assert [
            r["n_docs"],
            r["n_kept"],
            r["n_fail_short"],
            r["n_fail_dup"],
            r["n_fail_few"],
        ] == a
    # the gate must actually split at the smoke SF
    assert sum(a[1] for a in agg.values()) > 0
    assert sum(a[0] - a[1] for a in agg.values()) > 0


# ---------------------------------------------------------------------------
# stream_stream_full_outer_attested
# ---------------------------------------------------------------------------


def test_full_outer_stream_matches_batch(spark, specs):
    """The streaming replay must equal the batch FULL JOIN computed
    in Spark, and both null-extension paths must actually fire."""
    from pyspark.sql import functions as F

    got = {
        r["day"]: r
        for r in specs["stream_stream_full_outer_attested"]
        .builder(spark, SF)
        .collect()
    }
    ev = spark.read.parquet(SF + "/events.parquet")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    j = c.join(
        v,
        (F.col("cu") == F.col("vu"))
        & (
            F.abs(F.unix_micros("cts") - F.unix_micros("vts"))
            <= 30 * 60 * 1000000
        ),
        "full_outer",
    )
    want = {
        r["day"]: r
        for r in j.groupBy(
            F.dayofmonth(F.coalesce("cts", "vts"))
            .cast("bigint")
            .alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.coalesce(F.sum(F.when(F.col("vu").isNull(), 1)), F.lit(0))
            .cast("bigint")
            .alias("n_unmatched_clicks"),
            F.coalesce(F.sum(F.when(F.col("cu").isNull(), 1)), F.lit(0))
            .cast("bigint")
            .alias("n_unmatched_views"),
            F.count_distinct(F.coalesce("cu", "vu"))
            .cast("bigint")
            .alias("n_users"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for day, w in want.items():
        g = got[day]
        for col in (
            "n_rows",
            "n_unmatched_clicks",
            "n_unmatched_views",
            "n_users",
        ):
            assert g[col] == w[col], (day, col, g[col], w[col])
    assert sum(r["n_unmatched_clicks"] for r in got.values()) > 0
    assert sum(r["n_unmatched_views"] for r in got.values()) > 0


# ---------------------------------------------------------------------------
# aqi_recommendation_rollup (F12 promotion)
# ---------------------------------------------------------------------------


def test_aqi_recommendation_rollup_replay(spark, specs):
    """The rollup must carry aqi_category_rollup's exact census and the
    advisory payload must equal the AQI_RECOMMENDATIONS dict verbatim."""
    from project_bigdata_spark.functions.aqi import AQI_RECOMMENDATIONS

    got = {
        r["category"]: r
        for r in specs["aqi_recommendation_rollup"].builder(spark, SF).collect()
    }
    base = {
        r["category"]: r["n_entities"]
        for r in specs["aqi_category_rollup"].builder(spark, SF).collect()
    }
    assert set(got) == set(base)
    for cat, r in got.items():
        msg, icon, color = AQI_RECOMMENDATIONS[cat]
        assert r["message"] == msg
        assert r["icon"] == icon
        assert r["color"] == color
        assert r["n_entities"] == base[cat]


# ---------------------------------------------------------------------------
# pii_redaction_apply
# ---------------------------------------------------------------------------


def test_pii_redaction_apply_replay(spark, specs):
    """Python replay of the construction + redaction for every doc."""
    import re as _re

    rows = {
        r["doc_id"]: r
        for r in specs["pii_redaction_apply"].builder(spark, SF).collect()
    }
    for d in _docs(spark):
        raw = (
            d["text"]
            + f" contact user{d['doc_id']}@{d['source']}.example.com"
            + f" or call 555-{d['doc_id'] % 10000:04d}"
        )
        red = _re.sub(
            r" contact user[0-9]+@[a-z0-9.]+", " contact <EMAIL>", raw
        )
        red = _re.sub(r" call 555-[0-9]{4}", " call <PHONE>", red)
        r = rows[d["doc_id"]]
        assert r["n_email_redactions"] == 1
        assert r["n_phone_redactions"] == 1
        assert r["clean"] == 1
        assert r["chars_removed"] == len(raw) - len(red)
        assert r["redacted_md5"] == hashlib.md5(red.encode()).hexdigest()
        assert "@" not in red and "555-" not in red
