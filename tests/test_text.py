"""Edge cases for the document chunker (the oracle query covers the bulk
path; these pin boundary semantics: short docs, empty docs, exact-stride
tails)."""

from __future__ import annotations

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
