"""Guard-ACTIVE parity for the round-6 scale guards (round-6 verdict ask #2).

The four adaptive guards introduced in round 6 — adaptive LSH plane count
(``operators/similarity.py:lsh_near_dup_pairs``), the corpus-scaled
semantic-dedup codebook (``plans/similarity_queries.py:semantic_dedup``),
and the dense-block prefix sub-blocking in ``ngram_jaccard_pairs`` /
``edit_distance_pairs`` (``operators/dedup.py``) — only depart from their
legacy behavior ABOVE every attested scale factor (n > 2048 embeddings;
(block) > 128 members). The sf1 soaks proved those branches are *fast*;
these tests prove they are *right*: each entry runs Spark-vs-DuckDB on a
constructed frame just past its activation threshold, using the SAME
catalog oracle SQL the driver uses, and must produce a NON-EMPTY,
value-identical multiset with the guard branch demonstrably taken.

The frame is the sf0.01 fixture replicated with shifted ids (documents
x15 -> 7,500 docs, dense (lang, source) blocks of 240 and (lang, first
word) blocks of 180; embeddings x5 -> 2,500 vectors), so every replicated
row is an exact near-dup of its original — the outputs are dense with
true pairs, never vacuous.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from project_bigdata_spark.plans.catalog import load_all

SF_SRC = "/root/testdata/sf0.01"

# activation thresholds under test (mirrors of the production constants)
REFINE_OVER = 128          # operators/dedup.py sub-blocking
ADAPTIVE_N = 2048          # 8 * 2^8: smallest corpus where k > N_PLANES
CODEBOOK_N = 2048          # smallest corpus where n//256 > 8


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


@pytest.fixture(scope="module")
def guard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("guard_sf")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT doc.* REPLACE (doc.doc_id + 100000 * t.r AS doc_id)
                  FROM read_parquet('{SF_SRC}/documents.parquet') doc,
                       range(15) t(r))
            TO '{d}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT e.* REPLACE (e.vec_id + 100000 * t.r AS vec_id)
                  FROM read_parquet('{SF_SRC}/embeddings.parquet') e,
                       range(5) t(r))
            TO '{d}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def guard_duck(guard_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{guard_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_thresholds_actually_crossed(guard_duck):
    """The constructed frame must sit PAST every activation threshold —
    otherwise the parity tests below would silently re-test the legacy
    branches."""
    mx_ls = guard_duck.execute(
        "SELECT max(c) FROM (SELECT lang, source, count(*) c "
        "FROM documents GROUP BY 1, 2)"
    ).fetchone()[0]
    assert mx_ls > REFINE_OVER, "ngram_jaccard sub-blocking not activated"
    mx_fw = guard_duck.execute(
        "SELECT max(c) FROM (SELECT lang, "
        "list_filter(string_split_regex(lower(text), '\\s+'), "
        "w -> w <> '')[1] fw, count(*) c FROM documents GROUP BY 1, 2)"
    ).fetchone()[0]
    assert mx_fw > REFINE_OVER, "edit_distance sub-blocking not activated"
    n_emb = guard_duck.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert n_emb > ADAPTIVE_N, "adaptive LSH plane count not activated"
    assert n_emb > CODEBOOK_N, "semantic_dedup codebook scaling not activated"
    # round-7 caps: the tfidf discriminative-term cap (df <= 16) must have
    # terms to exclude on this frame — the x15 replication pushes ~40% of
    # the shingle vocabulary past it
    over_cap = guard_duck.execute(
        """WITH corpus AS (
             SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id + 10000000, text FROM documents
             WHERE doc_id % 31 = 0
           ), w AS (
             SELECT doc_id, list_filter(string_split_regex(lower(text),
               '\\s+'), x -> x <> '') AS ws FROM corpus
           ), s AS (
             SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
               THEN list_transform(range(1, len(ws) - 1),
                 i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))
               ELSE [''] END) AS sh FROM w
           )
           SELECT count(*) FROM (
             SELECT sh FROM s GROUP BY sh HAVING count(*) > 16)"""
    ).fetchone()[0]
    assert over_cap > 0, "tfidf df-cap not activated"


def _branch_checks(name: str, cols: list[str], rows: list[tuple]) -> None:
    """Assert the guard branch was TAKEN, from the output itself."""
    if name == "embedding_near_dups":
        # adaptive k: 2048 < n <= 4096 -> 9-bit buckets (legacy was 8)
        bi = cols.index("bucket")
        assert {len(r[bi]) for r in rows} == {9}
    elif name == "semantic_dedup":
        # scaled codebook: 2500 // 256 = 9 centroids (legacy was 8), so
        # centroid_id 8 must be live in the assignment
        ci = cols.index("centroid_id")
        assert max(r[ci] for r in rows) == 8
    elif name in ("edit_distance_linkage", "ngram_jaccard_block"):
        # sub-blocking: with x15 replication every original doc yields 15
        # exact copies sharing (block, prefix) -> >= C(15,2) * n_docs true
        # pairs survive the refinement
        assert len(rows) >= 105 * 400
    elif name == "simhash_hamming_pairs":
        # every replicated/seeded exact-copy pair must report distance 0
        hi = cols.index("hamming")
        assert any(r[hi] == 0 for r in rows)
    elif name == "tfidf_cosine_pairs":
        # exact copies pair at cosine 1.0 THROUGH the active df-cap (their
        # below-cap discriminative terms still align perfectly)
        ci = cols.index("cosine")
        assert any(r[ci] == 1.0 for r in rows)
    # winnowing_fingerprints: non-empty suffices — the hot-fingerprint cap
    # and the shared-fp counts are both value-checked by the oracle compare


@pytest.mark.parametrize(
    "name",
    [
        "embedding_near_dups",
        "semantic_dedup",
        "edit_distance_linkage",
        "ngram_jaccard_block",
        "simhash_hamming_pairs",
        "winnowing_fingerprints",
        "tfidf_cosine_pairs",
    ],
)
def test_guard_active_parity(name, spark, guard_dir, guard_duck):
    spec = load_all()[name]
    sdf = spec.builder(spark, guard_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    assert len(spark_rows) > 0, f"{name}: guard-active output is empty"
    _branch_checks(name, spark_cols, spark_rows)

    rel = guard_duck.execute(spec.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = [tuple(r) for r in rel.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols)
    idx = [duck_cols.index(c) for c in spark_cols]
    duck_rows = [tuple(r[i] for i in idx) for r in duck_rows]
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: guard-active row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ms_s = sorted("|".join(_canon(v) for v in r) for r in spark_rows)
    ms_d = sorted("|".join(_canon(v) for v in r) for r in duck_rows)
    if ms_s != ms_d:
        only_s = [r for r in ms_s if r not in set(ms_d)][:5]
        only_d = [r for r in ms_d if r not in set(ms_s)][:5]
        raise AssertionError(
            f"{name}: guard-active value mismatch\n spark-only: {only_s}\n"
            f" duck-only: {only_d}"
        )
