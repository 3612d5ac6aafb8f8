"""Invariant tests for the corpus-structure operators (operators/corpus.py,
operators/asof.py tolerance variant, operators/features.py scaling). The
oracle queries attest exact parity on real data; these pin the boundary
semantics parity can't see — caps, exact counts, null-out behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_spark.operators import asof as ASOF
from project_bigdata_spark.operators import corpus as CP
from project_bigdata_spark.operators import features as FT


def test_segment_dedup_counts_distinct_once(spark):
    # doc 2 repeats doc 1's segment exactly; doc 3 is novel.
    seg = " ".join(f"w{i}" for i in range(CP.SEGMENT_WORDS))
    df = spark.createDataFrame(
        [(1, seg), (2, seg), (3, "unique words only here")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in CP.segment_dedup_stats(df).collect()}
    assert (rows[1].n_segments, rows[1].n_kept) == (1, 1)
    assert (rows[2].n_segments, rows[2].n_kept) == (1, 0)  # duplicate loses
    assert (rows[3].n_segments, rows[3].n_kept) == (1, 1)


def test_segment_dedup_empty_doc_has_no_segments(spark):
    df = spark.createDataFrame([(1, ""), (2, "a b")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in CP.segment_dedup_stats(df).collect()}
    assert 1 not in rows  # zero segments -> no row
    assert rows[2].n_segments == 1


def test_segments_are_nonoverlapping_and_cover(spark):
    n_words = CP.SEGMENT_WORDS * 2 + 3
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    segs = (
        df.select(
            F.posexplode(
                CP.segments_col(CP.words_col(F.col("text")))
            ).alias("i", "seg")
        )
        .collect()
    )
    joined = " ".join(r.seg for r in sorted(segs, key=lambda r: r.i))
    assert joined == text.lower()
    assert len(segs) == 3


def test_stratified_fixed_n_exact_counts_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(100)],
        ["doc_id", "lang"],
    )
    s1 = CP.stratified_fixed_n(df, n_per_group=10)
    counts = {r.lang: r.n for r in s1.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 10, "fr": 10}
    # deterministic: second run picks the identical ids
    ids1 = sorted(r.doc_id for r in s1.collect())
    ids2 = sorted(r.doc_id for r in CP.stratified_fixed_n(
        df, n_per_group=10).collect())
    assert ids1 == ids2


def test_stratified_fixed_n_small_group_returns_all(spark):
    df = spark.createDataFrame([(1, "xx"), (2, "xx")], ["doc_id", "lang"])
    assert CP.stratified_fixed_n(df, n_per_group=20).count() == 2


def test_length_buckets_bound_token_count(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 33)), (2, "a b"), (3, " ".join(["w"] * 64))],
        ["doc_id", "text"],
    )
    rows = {r.bucket: r for r in CP.length_bucket_stats(df).collect()}
    # 33 words -> 64-bucket (31 padding) joined by the exact-64 doc (0 pad)
    assert rows[64].n_docs == 2
    assert rows[64].n_padding == 31
    assert rows[32].n_docs == 1
    assert rows[32].n_padding == 30


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 100, 1_000_000), (1, 101, 10_000_000)],
        ["user_id", "event_id", "us"],
    ).select("user_id", "event_id", F.timestamp_micros("us").alias("ts"))
    right = spark.createDataFrame(
        [(1, 0, 5.0)], ["user_id", "us", "click_value"]
    ).select("user_id", F.timestamp_micros("us").alias("ts"), "click_value")
    out = ASOF.asof_join_tolerance(
        left, right, key="user_id", ts_col="ts",
        tolerance_us=2_000_000, carry_cols=["click_value"],
    )
    rows = {r.event_id: r for r in out.collect()}
    assert rows[100].click_value_asof == 5.0  # 1s gap, within 2s
    assert rows[100].ts_asof is not None
    assert rows[101].click_value_asof is None  # 10s gap, stale
    assert rows[101].ts_asof is None


def test_feature_scaling_minmax_unit_interval(spark):
    df = spark.createDataFrame(
        [(i, "a", float(v)) for i, v in enumerate([1.0, 2.0, 3.0, 4.0])],
        ["event_id", "event_type", "value"],
    )
    rows = sorted(FT.feature_scaling(df).collect(), key=lambda r: r.value)
    mm = [r._minmax for r in rows]
    assert mm[0] == 0.0 and mm[-1] == 1.0
    assert all(0.0 <= v <= 1.0 for v in mm)


def test_feature_scaling_constant_group_yields_null_not_nan(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", 2.0)], ["event_id", "event_type", "value"]
    )
    rows = FT.feature_scaling(df).collect()
    assert all(r._zscore is None and r._minmax is None for r in rows)


def test_boilerplate_counts_docs_not_occurrences(spark):
    # "x y z" appears 3 times in doc 1 but only doc_freq=2 (docs 1 and 2)
    df = spark.createDataFrame(
        [(1, "x y z x y z x y z"), (2, "x y z"), (3, "p q r")],
        ["doc_id", "text"],
    )
    rows = {r.shingle: r.doc_freq for r in
            CP.boilerplate_shingles(df, top_n=50).collect()}
    assert rows["x y z"] == 2


def test_edit_distance_pairs_within_block_only(spark):
    from project_bigdata_spark.operators import dedup as DD

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en"),
            (2, "alpha beta gamme", "en"),   # 1 edit from doc 1
            (3, "alpha completely different text", "en"),
            (4, "alpha beta gamma", "fr"),   # same text, other block
        ],
        ["doc_id", "text", "lang"],
    )
    rows = {(r.id_a, r.id_b): r.edit_dist
            for r in DD.edit_distance_pairs(df, max_dist=2).collect()}
    assert rows == {(1, 2): 1}  # cross-lang twin and far text excluded


def test_edit_distance_pairs_drops_hot_blocks(spark):
    from project_bigdata_spark.operators import dedup as DD

    df = spark.createDataFrame(
        [(i, "same words here", "en") for i in range(12)],
        ["doc_id", "text", "lang"],
    )
    # block of 12 > max_block=10 -> dropped whole, no quadratic pair burst
    assert DD.edit_distance_pairs(df, max_block=10).count() == 0
    assert DD.edit_distance_pairs(df, max_block=12).count() == 66


def test_segment_dedup_apply_removes_later_copies(spark):
    seg = " ".join(f"w{i}" for i in range(CP.SEGMENT_WORDS))
    other = " ".join(f"x{i}" for i in range(CP.SEGMENT_WORDS))
    df = spark.createDataFrame(
        [(1, seg), (2, f"{other} {seg}"), (3, seg)],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in CP.segment_dedup_apply(df).collect()}
    assert rows[1].dedup_text == seg
    # doc 2 keeps its novel first segment, loses the copied second
    assert rows[2].dedup_text == other and rows[2].n_kept == 1
    # doc 3 is entirely recycled -> present but empty
    assert rows[3].dedup_text == "" and rows[3].n_kept == 0
