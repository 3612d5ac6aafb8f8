"""Edge cases for the document chunker (the oracle query covers the bulk
path; these pin boundary semantics: short docs, empty docs, exact-stride
tails)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_spark.operators import text as TX


def _chunks(spark, text: str):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return sorted(
        TX.chunk_documents_with_text(df).collect(), key=lambda r: r.chunk_id
    )


def test_chunk_short_doc_single_chunk(spark):
    rows = _chunks(spark, "a b c d e")
    assert len(rows) == 1
    r = rows[0]
    assert (r.chunk_id, r.start_token, r.chunk_len) == (0, 1, 5)
    assert r.chunk_text == "a b c d e"


def test_chunk_empty_doc_single_empty_chunk(spark):
    rows = _chunks(spark, "")
    assert len(rows) == 1
    assert (rows[0].chunk_len, rows[0].chunk_text) == (0, "")


def test_chunk_every_token_covered_with_overlap(spark):
    # 91 tokens, chunk=50, overlap=10, stride=40 -> starts 1, 41, 81
    text = " ".join(f"t{i}" for i in range(1, 92))
    rows = _chunks(spark, text)
    assert [(r.chunk_id, r.start_token, r.chunk_len) for r in rows] == [
        (0, 1, 50),
        (1, 41, 50),
        (2, 81, 11),
    ]
    covered = set()
    for r in rows:
        covered.update(range(r.start_token, r.start_token + r.chunk_len))
    assert covered == set(range(1, 92))
    # overlap: consecutive chunks share exactly `overlap` tokens
    assert rows[0].start_token + 50 - rows[1].start_token == TX.CHUNK_OVERLAP


def test_chunk_exact_stride_boundary_no_empty_tail(spark):
    # 90 tokens: greatest(90-10,1)=80 -> starts 1, 41 only (no start at 81)
    text = " ".join(f"t{i}" for i in range(1, 91))
    rows = _chunks(spark, text)
    assert [(r.chunk_id, r.start_token, r.chunk_len) for r in rows] == [
        (0, 1, 50),
        (1, 41, 50),
    ]


def test_pii_redact_and_counts(spark):
    rows = [
        (1, "mail me at jane.doe+x@corp.example.org today"),
        (2, "call 555-123-4567 or visit 10.0.0.1 now"),
        (3, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    counts = TX.pii_counts(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("e"),
            counts["phone"].alias("p"),
            counts["ipv4"].alias("i"),
            TX.pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert (out[1].e, out[1].p, out[1].i) == (1, 0, 0)
    assert out[1].red == "mail me at [EMAIL] today"
    assert (out[2].e, out[2].p, out[2].i) == (0, 1, 1)
    assert out[2].red == "call [PHONE] or visit [IPV4] now"
    assert out[3].red == rows[2][1]  # untouched


def test_repetition_metrics(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam eggs"), (2, "all words here differ")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in TX.repetition_metrics(df).collect()}
    assert out[1].n_words == 5 and out[1].n_distinct_words == 2
    assert abs(out[1].dup_word_ratio - 0.6) < 1e-9
    assert abs(out[1].top_word_share - 0.8) < 1e-9
    assert out[2].dup_word_ratio == 0.0
    assert abs(out[2].top_word_share - 0.25) < 1e-9


def test_pack_documents_bins(spark):
    # 6 docs of 4 tokens each in one shard, budget 8 -> bins of 2 docs
    rows = [(i * 64, "a b c d") for i in range(6)]  # same shard (id%64==0)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(
        (r.doc_id, r.bin_id)
        for r in TX.pack_documents(df, budget=8, shards=64).collect()
    )
    assert out == [(0, 0), (64, 0), (128, 1), (192, 1), (256, 2), (320, 2)]


def test_pack_documents_oversized_doc_gets_own_bin_start(spark):
    # doc bigger than the budget starts at its cumsum-derived bin and
    # pushes the next doc into a later bin — no doc is dropped
    rows = [(0, "w " * 20), (64, "x y")]  # 20 tokens then 2, same shard
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in TX.pack_documents(df, budget=8, shards=64).collect()}
    assert out[0].bin_id == 0
    assert out[64].bin_id == 2  # 20 tokens consumed bins 0-1
    assert out[0].n_tokens == 20 and out[64].n_tokens == 2


def test_pack_documents_shards_pack_independently(spark):
    rows = [(0, "a b"), (1, "c d"), (64, "e f")]  # shards 0,1,0
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.shard, r.bin_id)
           for r in TX.pack_documents(df, budget=2, shards=64).collect()}
    assert out[0] == (0, 0) and out[64] == (0, 1)   # shard 0 fills bins 0,1
    assert out[1] == (1, 0)                          # shard 1 starts fresh


def test_unigram_logprob_hand_computed(spark):
    import math

    # corpus: 6 tokens total; counts: a=3, b=2, c=1
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c"), (3, "")], ["doc_id", "text"]
    )
    vrow = TX.unigram_vocab_row(df, vocab_size=10)
    got = {
        r.doc_id: r.lm_logprob
        for r in TX.unigram_logprob_scores(df, vrow).collect()
    }
    exp1 = (2 * math.log(3) + math.log(2)) / 3 - math.log(6)
    exp2 = (math.log(3) + math.log(2) + math.log(1)) / 3 - math.log(6)
    assert abs(got[1] - exp1) < 1e-9
    assert abs(got[2] - exp2) < 1e-9
    assert 3 not in got  # empty doc has no tokens -> filtered


def test_unigram_vocab_cap_and_oov(spark):
    import math

    # vocab_size=1 keeps only the top token; everything else scores OOV
    df = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
    vrow = TX.unigram_vocab_row(df, vocab_size=1)
    row = TX.unigram_logprob_scores(df, vrow).collect()[0]
    exp = (2 * math.log(2) + math.log(0.5)) / 3 - math.log(3)
    assert abs(row.lm_logprob - exp) < 1e-9


def test_quantile_threshold_filter_keeps_upper_quartile(spark):
    rows = [(i, "en", float(i)) for i in range(1, 9)]  # scores 1..8
    df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
    kept = TX.quantile_threshold_filter(df, "score", q=0.25, group_col="lang")
    ids = sorted(r.doc_id for r in kept.collect())
    # p25 of 1..8 (interpolated) = 2.75 -> keep 3..8
    assert ids == [3, 4, 5, 6, 7, 8]


def test_quantile_threshold_filter_epsilon_admits_exact_ties(spark):
    # all-equal scores: threshold == the value; every row must survive
    rows = [(i, "en", 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
    kept = TX.quantile_threshold_filter(
        df, "score", q=0.25, group_col="lang", epsilon=1e-9
    )
    assert kept.count() == 4


def test_normalize_text_strips_junk_and_collapses_whitespace(spark):
    raw = "a​b\x07c   d\t\te\n\nf  g"
    df = spark.createDataFrame([(1, raw)], ["doc_id", "text"])
    got = df.select(TX.normalize_text(F.col("text")).alias("t")).collect()[0].t
    assert got == "ab" + "c d e f g"  # zero-width + BEL removed, ws collapsed


def test_repeated_ngram_spans_merging_and_short_docs(spark):
    """Overlapping and adjacent repeated-gram hits merge into one span;
    docs shorter than k yield zero coverage (and no bogus descending-
    sequence grams); unique text is uncovered."""
    from project_bigdata_spark.operators import text as TX

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 words
    rows = [
        (1, shared + " unique tail one"),
        (2, shared + " other ending here"),
        (3, "totally different words nothing shared with anyone else"),
        (4, "tiny doc"),  # < k words
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in TX.repeated_ngram_spans(
            df, "doc_id", "text", k=5, min_docs=2
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # docs 1+2 share words 1-7: grams at pos 1,2,3 (k=5) -> one merged
    # span covering [1, 7]
    assert out[1].n_spans == 1 and out[1].covered_words == 7
    assert out[2].n_spans == 1 and out[2].covered_words == 7
    assert out[1].total_words == 10
    assert abs(out[1].coverage - 0.7) < 1e-9
    assert out[3].n_spans == 0 and out[3].covered_words == 0
    assert out[4].n_spans == 0 and out[4].total_words == 2


def test_repeated_ngram_spans_disjoint_spans(spark):
    """Two repeated regions separated by unique words stay two spans."""
    from project_bigdata_spark.operators import text as TX

    blk_a = "one two three four five"
    blk_b = "six seven eight nine ten"
    rows = [
        (1, f"{blk_a} UNIQ1 UNIQ2 UNIQ3 {blk_b}"),
        (2, f"{blk_a} OTHER filler words x {blk_b}"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in TX.repeated_ngram_spans(
            df, "doc_id", "text", k=5, min_docs=2
        ).collect()
    }
    assert out[1].n_spans == 2
    assert out[1].covered_words == 10


def test_bigram_logprob_penalizes_shuffled_text(spark):
    """The conditional bigram score separates natural word ORDER from the
    same word SET shuffled — the failure mode the unigram proxy misses."""
    from project_bigdata_spark.operators import text as TX

    base = "the quick brown fox jumps over the lazy dog " * 6
    shuffled = " ".join(reversed(base.split()))
    corpus = [(i, base) for i in range(20)] + [(100, shuffled)]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    brow = TX.bigram_vocab_row(df)
    urow = TX.unigram_vocab_row(df)
    got = {
        r.doc_id: r.bigram_logprob
        for r in TX.bigram_logprob_scores(df, brow, urow).collect()
    }
    assert got[100] < got[0] - 1.0  # clearly separated
    # unigram proxy is blind to the permutation (same token multiset)
    ug = {
        r.doc_id: r.lm_logprob
        for r in TX.unigram_logprob_scores(df, urow).collect()
    }
    assert abs(ug[100] - ug[0]) < 1e-6


def test_tfidf_rarer_term_outranks_common(spark):
    from project_bigdata_spark.operators import text as TX

    df = spark.createDataFrame(
        [(1, "apple apple zebra"), (2, "apple pear"), (3, "apple fig")],
        "doc_id long, text string",
    )
    top = TX.tfidf_top_terms(df, k=1).collect()
    by_doc = {r["doc_id"]: r["term"] for r in top}
    # 'apple' appears in every doc -> idf ln(4/4)=0; unique terms win
    assert by_doc == {1: "zebra", 2: "pear", 3: "fig"}


def test_inverted_index_stats_counts(spark):
    from project_bigdata_spark.operators import text as TX

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    idx = {r["term"]: r for r in TX.inverted_index_stats(df).collect()}
    assert idx["a"]["n_docs"] == 1 and idx["a"]["total_tf"] == 2
    assert idx["b"]["n_docs"] == 2 and idx["b"]["total_tf"] == 2
    assert (idx["b"]["min_doc"], idx["b"]["max_doc"]) == (1, 2)


def test_bm25_exact_match_beats_partial(spark):
    from project_bigdata_spark.operators import text as TX

    df = spark.createDataFrame(
        [
            (1, "spark join window"),
            (2, "spark spark filler filler filler filler"),
            (3, "other words only here"),
        ],
        "doc_id long, text string",
    )
    got = TX.bm25_topk(df, ["spark", "join", "window"], k=3).collect()
    assert [r["doc_id"] for r in got][:1] == [1]
    assert got[0]["n_terms_hit"] == 3
    assert {r["doc_id"] for r in got} == {1, 2}  # doc 3 never enters
