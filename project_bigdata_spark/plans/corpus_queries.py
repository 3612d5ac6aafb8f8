"""Corpus-lifecycle catalog entries over ``documents``: unigram-LM quality
scoring, quantile-threshold curation, and snapshot diffing.

These extend the M7 training-data pipeline past per-document heuristics to
the corpus-relative passes a refresh cycle needs: "score against the corpus
LM", "drop the bottom quartile per language", "what changed since the last
dump" (the reference re-ingests full dumps with no delta accounting —
``spark/batch_processor.py`` overwrites in place).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.operators import snapshot as SN
from project_bigdata_spark.operators import text as TX
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.plans.text_queries import (
    PUNCT_RE_SQL,
    WORDS_SQL,
    _profile_score_sql,
)
from project_bigdata_spark.sources import load_table

VOCAB_SIZE = 4096

# The quality formula of quality_scores, rounded to the shared 4-decimal
# grid BEFORE any threshold math (see quality_quantile_filter).
QUALITY_SQL = f"""round(
  least(CAST(length(text) AS DOUBLE) / 5.0e2, 1.0e0) * 4.0e-1
  + least(({_profile_score_sql(TX.LANG_PROFILES['en'])}) / 3.0e-1, 1.0e0) * 3.0e-1
  + (1.0e0 - least(CASE WHEN length(text) = 0 THEN 0.0e0
                   ELSE CAST(len(regexp_extract_all(text, {PUNCT_RE_SQL})) AS DOUBLE)
                   / length(text) * 5 END, 1.0e0)) * 3.0e-1,
4)"""


@query(
    "unigram_logprob",
    oracle=f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents
), counts AS MATERIALIZED (
  SELECT w, count(*) AS c FROM toks GROUP BY w
), total AS (
  SELECT CAST(sum(c) AS DOUBLE) AS t FROM counts
), vocab AS (
  SELECT w, c FROM counts ORDER BY c DESC, w LIMIT {VOCAB_SIZE}
)
SELECT CAST(toks.doc_id AS BIGINT) AS doc_id,
       round(avg(ln(coalesce(CAST(v.c AS DOUBLE), 5.0e-1)))
             - ln(min(total.t)), 4) AS lm_logprob
FROM toks LEFT JOIN vocab v ON toks.w = v.w CROSS JOIN total
GROUP BY toks.doc_id""",
    doc="CCNet-style LM quality proxy: mean unigram log-probability per "
    "document under the corpus top-4096 unigram model (OOV mass 0.5). "
    "Vocab builds with one token shuffle + TakeOrdered, packs into ONE "
    "broadcast map row; scoring is a zero-shuffle fold per document.",
    survey_ids=("M7-T10",),
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    vrow = TX.unigram_vocab_row(d, vocab_size=VOCAB_SIZE)
    scores = TX.unigram_logprob_scores(d, vrow)
    return scores.select(
        N.big("doc_id").alias("doc_id"),
        N.rnd("lm_logprob").alias("lm_logprob"),
    )


@query(
    "quality_quantile_filter",
    oracle=f"""
WITH q AS MATERIALIZED (
  SELECT doc_id, lang, {QUALITY_SQL} AS quality FROM documents
), thr AS (
  SELECT lang, quantile_cont(quality, 2.5e-1) AS thr FROM q GROUP BY lang
)
SELECT q.lang,
       CAST(count(*) AS BIGINT) AS n_kept,
       round(CAST(sum(CAST(q.quality AS DECIMAL(14,4))) AS DOUBLE)
             / count(*), 4) AS avg_quality,
       round(min(thr.thr), 4) AS threshold
FROM q JOIN thr ON q.lang = thr.lang
WHERE q.quality >= thr.thr - 1.0e-9
GROUP BY q.lang""",
    doc="Corpus-relative curation: drop the bottom quality quartile PER "
    "LANGUAGE (a fixed global threshold over-prunes low-resource "
    "languages). Two passes by construction: a one-row-per-language "
    "exact-percentile table (broadcast), then a narrow filter. Scores "
    "are pre-rounded to the 4-decimal grid and the comparison carries a "
    "1e-9 slack so interpolated-threshold ulp noise can never flip a "
    "row across engines (the grid spacing is 1e-4).",
    survey_ids=("M7-T11",),
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        N.rnd(TX.quality_score(F.col("text"))).alias("quality"),
    )
    kept = TX.quantile_threshold_filter(
        scored, "quality", q=0.25, group_col="lang", epsilon=1e-9
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        N.rnd(
            F.sum(F.col("quality").cast("decimal(14,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quality"),
        N.rnd(F.min("_thr")).alias("threshold"),
    )


@query(
    "snapshot_diff",
    oracle="""
WITH old AS (
  SELECT doc_id, md5(text) AS dg FROM documents WHERE doc_id % 11 <> 3
), new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END)
           AS dg
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.dg <> n.dg THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(count(*) AS BIGINT) AS n_docs
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
GROUP BY 1""",
    doc="Corpus refresh audit: diff two snapshot views of documents by "
    "content digest (full-outer join on doc_id) and roll up to "
    "added/removed/changed/unchanged counts. Only 16-byte digests "
    "shuffle, never payloads. Snapshots are simulated deterministically "
    "from the one documents table: doc_id%11==3 rows are 'late "
    "additions' (absent from old), doc_id%7==0 rows were 'removed', and "
    "doc_id%5==0 rows carry an edited payload in new.",
    survey_ids=("M7-L1",),
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 11 != 3).select(
        "doc_id", F.md5("text").alias("digest")
    )
    new = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.col("text"), F.lit(" [rev2]")),
            ).otherwise(F.col("text"))
        ).alias("digest"),
    )
    return SN.snapshot_diff_summary(old, new)


_NIBBLE = "strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), {pos}, 1)) - 1"


@query(
    "hash_split",
    oracle=f"""
WITH b AS (
  SELECT lang, n_chars,
         ({_NIBBLE.format(pos=1)}) * 16 + ({_NIBBLE.format(pos=2)}) AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 204 THEN 'train'
            WHEN bucket < 230 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1, 2""",
    doc="Deterministic hash-based train/val/test split (~80/10/10 by "
    "md5(doc_id) bucket): decorrelated from ingest order and stable "
    "across corpus refreshes — a doc keeps its split forever, so "
    "val/test never bleed into train between versions. Narrow map + "
    "one small aggregation; the per-language census is the leakage "
    "sanity check.",
    survey_ids=("W7", "M7-L2"),
)
def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators import features as FE

    d = load_table(spark, sf_dir, "documents")
    out = FE.hash_split_assign(d, "doc_id")
    return out.groupBy("split", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


def _norm_sql(col: str) -> str:
    out = col
    for pat, rep in TX.NORM_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return f"trim({out})"


@query(
    "text_normalize",
    oracle=f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_raw,
       CAST(length({_norm_sql("text")}) AS BIGINT) AS n_chars_norm,
       md5({_norm_sql("text")}) AS norm_digest
FROM documents""",
    doc="Unicode text normalization (zero-width/C0 strip, NBSP, "
    "whitespace collapse, trim) as a shared-pattern regexp_replace "
    "chain — the cleanup pass that runs before hashing/shingling so "
    "byte-level junk cannot defeat dedup. Output is the digest of the "
    "normalized text plus the length delta, never the payload.",
    survey_ids=("M7-T12",),
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    norm = TX.normalize_text(F.col("text"))
    return d.select(
        N.big("doc_id").alias("doc_id"),
        F.length("text").cast("bigint").alias("n_chars_raw"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
        F.md5(norm).alias("norm_digest"),
    )


TOP_NGRAMS_K = 20


@query(
    "top_ngrams",
    oracle=f"""
WITH g AS (
  SELECT lang,
         unnest(CASE WHEN len({WORDS_SQL}) >= 2
           THEN list_transform(range(1, len({WORDS_SQL})),
                  i -> concat_ws(' ', {WORDS_SQL}[i], {WORDS_SQL}[i+1]))
           ELSE [] END) AS gram
  FROM documents
), c AS (
  SELECT lang, gram, count(*) AS n FROM g GROUP BY lang, gram
)
SELECT lang, gram, CAST(n AS BIGINT) AS n,
       CAST(row_number() OVER (PARTITION BY lang
              ORDER BY n DESC, gram) AS BIGINT) AS rk
FROM c QUALIFY rk <= {TOP_NGRAMS_K}""",
    doc="Corpus n-gram census: top-20 word bigrams per language by "
    "frequency (deterministic (count, gram) order) — the corpus-stats "
    "pass before tokenizer/vocab training and a boilerplate detector "
    "(one bigram dominating a language flags template text). The "
    "ranking window runs over the aggregated (lang, gram) counts — "
    "vocab-sized, orders of magnitude smaller than the corpus scan "
    "that feeds it.",
    survey_ids=("M7-T13",),
)
def top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from project_bigdata_spark.operators.dedup import words_col

    d = load_table(spark, sf_dir, "documents")
    # materialize the word array BEFORE the transform: HOFs run
    # interpreted, so a lambda referencing the split() expression
    # re-tokenizes the document per element (O(len²) splits)
    ws = F.col("_ws")
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        d.select("lang", words_col(F.col("text")).alias("_ws"))
        .select("lang", F.explode(bigrams).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("gram"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_NGRAMS_K)
        .select(
            "lang",
            "gram",
            N.big("n").alias("n"),
            N.big("rk").alias("rk"),
        )
    )


_RNS_K = 5
_RNS_MIN_DOCS = 2
_RNS_MAX_GRAMS = 65536
_RNS_GRAM_SQL = "md5(concat_ws(' ', ws[pos], ws[pos+1], ws[pos+2], ws[pos+3], ws[pos+4]))"


@query(
    "repeated_ngram_spans",
    oracle=f"""
WITH base AS (
  SELECT doc_id, {WORDS_SQL} AS ws, len({WORDS_SQL}) AS n FROM documents
),
hits0 AS (
  SELECT doc_id, n, ws,
         unnest(range(1, n - {_RNS_K - 2})) AS pos
  FROM base
),
hits1 AS (
  SELECT doc_id, n, pos, {_RNS_GRAM_SQL} AS digest FROM hits0
),
freq AS (
  SELECT digest, count(*) AS n_docs
  FROM (SELECT DISTINCT doc_id, digest FROM hits1)
  GROUP BY digest
),
rep AS (
  SELECT digest FROM freq WHERE n_docs >= {_RNS_MIN_DOCS}
  ORDER BY n_docs DESC, digest LIMIT {_RNS_MAX_GRAMS}
),
hits AS (
  SELECT h.doc_id, h.n, h.pos FROM hits1 h JOIN rep USING (digest)
),
isl AS (
  SELECT doc_id, n, pos, pos + {_RNS_K - 1} AS e,
         CASE WHEN pos > coalesce(
                max(pos + {_RNS_K - 1}) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS ni
  FROM hits
),
isl2 AS (
  SELECT doc_id, n, pos, e,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM isl
),
spans AS (
  SELECT doc_id, n, island, min(pos) AS s, max(e) AS st
  FROM isl2 GROUP BY 1, 2, 3
),
prof AS (
  SELECT doc_id, count(*) AS n_spans, sum(st - s + 1) AS cw
  FROM spans GROUP BY doc_id
)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(b.n AS BIGINT) AS total_words,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.cw, 0) AS BIGINT) AS covered_words,
       round(coalesce(p.cw, 0) / greatest(b.n, 1), 4) AS coverage
FROM base b LEFT JOIN prof p USING (doc_id)""",
    doc="Cross-document repeated-span profile (exact-substring-dedup "
    f"core): word {_RNS_K}-grams occurring in >= {_RNS_MIN_DOCS} distinct "
    "docs, merged per doc into maximal spans via gaps-and-islands; emits "
    "span count / covered words / coverage per doc. Only 16-byte digests "
    "shuffle; the repeated-gram set is capped most-frequent-first.",
    survey_ids=("M7-D11",),
)
def repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return TX.repeated_ngram_spans(
        d, "doc_id", "text",
        k=_RNS_K, min_docs=_RNS_MIN_DOCS, max_grams=_RNS_MAX_GRAMS,
    )


BIGRAM_VOCAB = 8192


@query(
    "bigram_logprob",
    oracle=f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, {WORDS_SQL} AS ws FROM documents
), toks AS MATERIALIZED (
  SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS i
  FROM d WHERE len(ws) >= 1
), uni AS MATERIALIZED (
  SELECT w, count(*) AS c FROM toks GROUP BY w
), utotal AS (
  SELECT CAST(sum(c) AS DOUBLE) AS t FROM uni
), uvocab AS (
  SELECT w, c FROM uni ORDER BY c DESC, w LIMIT {VOCAB_SIZE}
), pairs AS MATERIALIZED (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
), bvocab AS (
  SELECT concat(w1, ' ', w2) AS bg, count(*) AS c
  FROM pairs GROUP BY 1 ORDER BY c DESC, bg LIMIT {BIGRAM_VOCAB}
)
SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
       round(avg(ln(
         CASE WHEN bv.c IS NOT NULL
              THEN CAST(bv.c AS DOUBLE)
                   / coalesce(CAST(u1.c AS DOUBLE), 5.0e-1)
              ELSE 4.0e-1 * coalesce(CAST(u2.c AS DOUBLE), 5.0e-1)
                   / (SELECT t FROM utotal)
         END)), 4) AS bigram_logprob
FROM pairs p
LEFT JOIN bvocab bv ON concat(p.w1, ' ', p.w2) = bv.bg
LEFT JOIN uvocab u1 ON p.w1 = u1.w
LEFT JOIN uvocab u2 ON p.w2 = u2.w
GROUP BY p.doc_id""",
    doc="Conditional bigram-LM quality proxy with stupid-backoff: mean "
    "ln P(w2|w1) per document — in-vocab bigrams score c12/c1, the rest "
    "back off to 0.4 x unigram mass. Catches shuffled/templated text the "
    "unigram proxy scores as fine. Both model tables are capped TakeOrdered "
    "builds packed into single broadcast map rows; scoring is a "
    "zero-shuffle fold.",
    survey_ids=("M7-T14",),
)
def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    brow = TX.bigram_vocab_row(d, vocab_size=BIGRAM_VOCAB)
    urow = TX.unigram_vocab_row(d, vocab_size=VOCAB_SIZE)
    scores = TX.bigram_logprob_scores(d, brow, urow)
    return scores.select(
        N.big("doc_id").alias("doc_id"),
        N.rnd("bigram_logprob").alias("bigram_logprob"),
    )


_BM25_TERMS = ("spark", "window", "join")
_BM25_TERMS_SQL = "('spark', 'window', 'join')"


@query(
    "inverted_index",
    oracle=f"""
WITH tf AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
  GROUP BY doc_id, w
)
SELECT term,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM tf GROUP BY term""",
    doc="Inverted-index posting stats per term: document frequency, "
    "total tf, doc-id span. Two partial-aggregating shuffles on tiny "
    "keys; payloads never move — the lexical-retrieval complement of "
    "the ANN path.",
    survey_ids=("M7-R1",),
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return TX.inverted_index_stats(d)


@query(
    "tfidf_top_terms",
    oracle=f"""
WITH tf AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
  GROUP BY doc_id, w
), dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term, CAST(tf AS BIGINT) AS tf,
       score, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6) AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6)
                    DESC, tf.term) AS rk
  FROM tf JOIN dfreq USING (term), n)
WHERE rk <= 3""",
    doc="Top-3 characteristic terms per document by smoothed TF-IDF, "
    "deterministic tie-break on the rounded score then term. The "
    "doc-frequency side is vocab-sized -> broadcast join; rank filter "
    "compiles to WindowGroupLimit.",
    survey_ids=("M7-R2",),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return TX.tfidf_top_terms(d, k=3, rnd=N.rnd)


@query(
    "bm25_retrieval",
    oracle=f"""
WITH lens AS (
  SELECT doc_id, len({WORDS_SQL}) AS dl FROM documents
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_len FROM lens
), tf AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
  GROUP BY doc_id, w
  HAVING w IN {_BM25_TERMS_SQL}
), dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT CAST(tf.doc_id AS BIGINT) AS doc_id,
       CAST(sum(CAST(round(
         ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75
             + 0.75 * lens.dl / (CAST(stats.total_len AS DOUBLE) / stats.n_docs))),
       6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25,
       CAST(count(*) AS BIGINT) AS n_terms_hit
FROM tf JOIN dfreq USING (term) JOIN lens ON tf.doc_id = lens.doc_id, stats
GROUP BY tf.doc_id
ORDER BY bm25 DESC, tf.doc_id LIMIT 10""",
    doc="BM25 top-10 documents for a 3-term keyword query (k1=1.2, "
    "b=0.75); per-term contributions rounded then DECIMAL-summed so the "
    "score is aggregation-order-free. The exploded frame collapses to "
    "|query|xdf rows before any wide shuffle; corpus stats are one "
    "broadcast row.",
    survey_ids=("M7-R3",),
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return TX.bm25_topk(d, list(_BM25_TERMS), k=10, rnd=N.rnd)


def _stub_e_sql(src: str, k: int) -> str:
    """One component of the stub encoder (multimodal.text_to_embedding)
    replayed in SQL: 4 md5 hex chars -> [-1, 1]."""
    return (
        f"(CAST(('0x' || substring(md5({src}), {1 + 4 * k}, 4)) AS INT)"
        f" / 3.27675e4 - 1.0)"
    )


_RRF_QTEXT = "'spark window join'"
_RRF_DOT = " + ".join(
    f"({_stub_e_sql('text', k)} * {_stub_e_sql(_RRF_QTEXT, k)})"
    for k in range(8)
)
_RRF_NA = "sqrt(" + " + ".join(
    f"({_stub_e_sql('text', k)} * {_stub_e_sql('text', k)})" for k in range(8)
) + ")"
_RRF_NB = "sqrt(" + " + ".join(
    f"({_stub_e_sql(_RRF_QTEXT, k)} * {_stub_e_sql(_RRF_QTEXT, k)})"
    for k in range(8)
) + ")"
_RRF_COS = f"(({_RRF_DOT}) / ({_RRF_NA} * {_RRF_NB}))"


@query(
    "hybrid_rrf_search",
    oracle=f"""
WITH lens AS (
  SELECT doc_id, len({WORDS_SQL}) AS dl FROM documents
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_len FROM lens
), tf AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
  GROUP BY doc_id, w
  HAVING w IN {_BM25_TERMS_SQL}
), dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
lex AS (
  SELECT tf.doc_id,
         CAST(sum(CAST(round(
           ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75
               + 0.75 * lens.dl / (CAST(stats.total_len AS DOUBLE) / stats.n_docs))),
         6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
  FROM tf JOIN dfreq USING (term) JOIN lens ON tf.doc_id = lens.doc_id, stats
  GROUP BY tf.doc_id
  ORDER BY bm25 DESC, tf.doc_id LIMIT 20
), lexr AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM lex
), dense AS (
  SELECT doc_id, round({_RRF_COS}, 6) AS c FROM documents
  ORDER BY c DESC, doc_id LIMIT 20
), denser AS (
  SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS r FROM dense
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(l.r AS BIGINT) AS lex_rank,
       CAST(d.r AS BIGINT) AS dense_rank,
       CAST(COALESCE(CAST(round(1.0 / (60 + l.r), 6) AS DECIMAL(18,6)),
                     CAST(0 AS DECIMAL(18,6)))
            + COALESCE(CAST(round(1.0 / (60 + d.r), 6) AS DECIMAL(18,6)),
                       CAST(0 AS DECIMAL(18,6))) AS DOUBLE) AS rrf
FROM lexr l FULL OUTER JOIN denser d USING (doc_id)
ORDER BY rrf DESC, doc_id LIMIT 10""",
    doc="Hybrid retrieval with Reciprocal Rank Fusion: BM25 top-20 and "
    "dense-cosine top-20 (stub encoder embeddings of the SAME 3-term "
    "query) fused as sum(1/(60+rank)) — the calibration-free lexical+"
    "semantic combiner RAG stacks standardize on. Both lists are tiny "
    "top-k frames, so the fusion join is a few-row full-outer, never a "
    "corpus shuffle; per-list terms are rounded then DECIMAL-summed so "
    "fusion replays bit-identically on both engines.",
    survey_ids=("M7-R4",),
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from project_bigdata_spark.operators import multimodal as MM
    from project_bigdata_spark.operators import similarity as SIM

    d = load_table(spark, sf_dir, "documents")
    lex = TX.bm25_topk(d, list(_BM25_TERMS), k=20, rnd=N.rnd)
    lexr = lex.select(
        "doc_id",
        F.row_number()
        # constant partition key: the frame is the top-20 cut, so the
        # single-partition rank is intentional (and the key quiets the
        # "no partition defined" warning)
        .over(Window.partitionBy(F.lit(1)).orderBy(F.desc("bm25"), "doc_id"))
        .alias("rank"),
    )
    emb = MM.text_to_embedding(d)
    qrow = MM.text_to_embedding(
        spark.createDataFrame([(-1, "spark window join")],
                              "doc_id long, text string")
    ).select(F.col("embedding").alias("_q"))
    dense = (
        emb.crossJoin(F.broadcast(qrow))
        .select(
            "doc_id",
            N.rnd(SIM.cosine(F.col("embedding"), F.col("_q")), 6).alias("c"),
        )
        .orderBy(F.desc("c"), "doc_id")
        .limit(20)
    )
    denser = dense.select(
        "doc_id",
        F.row_number()
        .over(Window.partitionBy(F.lit(1)).orderBy(F.desc("c"), "doc_id"))
        .alias("rank"),
    )
    fused = TX.rrf_fuse([lexr, denser], rnd=N.rnd)
    return (
        fused.select(
            N.big("doc_id").alias("doc_id"),
            N.big("_r0").alias("lex_rank"),
            N.big("_r1").alias("dense_rank"),
            F.col("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(10)
    )


@query(
    "prf_expanded_search",
    oracle=f"""
WITH lens AS (
  SELECT doc_id, len({WORDS_SQL}) AS dl FROM documents
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_len FROM lens
), tfall AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
  GROUP BY doc_id, w
), dfall AS (SELECT term, count(*) AS df FROM tfall GROUP BY term),
feedback AS (
  SELECT tfall.doc_id,
         CAST(sum(CAST(round(
           ln(1.0 + (stats.n_docs - dfall.df + 0.5) / (dfall.df + 0.5))
           * (tfall.tf * 2.2) / (tfall.tf + 1.2 * (1.0 - 0.75
               + 0.75 * lens.dl / (CAST(stats.total_len AS DOUBLE) / stats.n_docs))),
         6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
  FROM tfall JOIN dfall USING (term) JOIN lens ON tfall.doc_id = lens.doc_id, stats
  WHERE term IN {_BM25_TERMS_SQL}
  GROUP BY tfall.doc_id
  ORDER BY bm25 DESC, tfall.doc_id LIMIT 5
), expw AS (
  SELECT tfall.term,
         CAST(sum(CAST(round(
           tfall.tf * ln((stats.n_docs + 1.0) / (dfall.df + 1.0)),
         6) AS DECIMAL(18,6))) AS DOUBLE) AS w
  FROM tfall JOIN feedback USING (doc_id) JOIN dfall USING (term), stats
  WHERE len(term) >= 4 AND term NOT IN {_BM25_TERMS_SQL}
  GROUP BY tfall.term
), exp AS (
  SELECT term FROM expw
  QUALIFY row_number() OVER (ORDER BY w DESC, term) <= 2
), terms AS (
  SELECT unnest(['spark', 'window', 'join']) AS term
  UNION SELECT term FROM exp
), qterms AS (
  SELECT string_agg(term, ',' ORDER BY term) AS query_terms FROM terms
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(sum(CAST(round(
         ln(1.0 + (stats.n_docs - dfall.df + 0.5) / (dfall.df + 0.5))
         * (t.tf * 2.2) / (t.tf + 1.2 * (1.0 - 0.75
             + 0.75 * lens.dl / (CAST(stats.total_len AS DOUBLE) / stats.n_docs))),
       6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25,
       CAST(count(*) AS BIGINT) AS n_terms_hit,
       any_value(qterms.query_terms) AS query_terms
FROM tfall t
JOIN terms USING (term)
JOIN dfall USING (term)
JOIN lens ON t.doc_id = lens.doc_id, stats, qterms
GROUP BY t.doc_id
ORDER BY bm25 DESC, t.doc_id LIMIT 10""",
    doc="Pseudo-relevance-feedback retrieval (RM3-lite): the seed query's "
    "BM25 top-5 docs nominate the 2 highest-TF-IDF new terms (len >= 4), "
    "and the expanded term set re-ranks the corpus — the classic "
    "judgment-free recall booster. The expansion is a data-dependent "
    "term DataFrame flowing into BM25's broadcast-semi-join branch; "
    "every score is rounded-then-DECIMAL-summed so both passes replay "
    "bit-identically on the oracle.",
    survey_ids=("M7-R5",),
)
def prf_expanded_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    terms = TX.prf_expand_terms(
        d, list(_BM25_TERMS), n_feedback=5, n_expansion=2, min_len=4,
        rnd=N.rnd,
    )
    qterms = F.broadcast(
        terms.agg(
            F.concat_ws(",", F.array_sort(F.collect_list("term"))).alias(
                "query_terms"
            )
        )
    )
    out = TX.bm25_topk(d, terms, k=10, rnd=N.rnd)
    return out.crossJoin(qterms).select(
        N.big("doc_id").alias("doc_id"),
        F.col("bm25"),
        N.big("n_terms_hit").alias("n_terms_hit"),
        "query_terms",
    )


# ---------------------------------------------------------------------------
# anchor_substring_spans (round 8)
# ---------------------------------------------------------------------------

_ASS_WIN = 50          # duplicated-substring length threshold (Lee et al.)
_ASS_PROBE = 8         # content-defined anchor probe width
_ASS_RATE = 16         # expected 1-in-16 positions anchor
_ASS_MAX_DIGESTS = 65536
_ASS_SEED_BASE = 9_000_000
_ASS_SEED_STRIDE = 29


@query(
    "anchor_substring_spans",
    oracle=f"""
WITH corpus AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_ASS_SEED_BASE} AS doc_id,
         'dup-seed ' || substring(text, 17, 140) AS text
  FROM documents
  WHERE doc_id % {_ASS_SEED_STRIDE} = 0 AND length(text) >= 160
), base AS MATERIALIZED (
  SELECT doc_id, text, length(text) AS n FROM corpus
), anch AS MATERIALIZED (
  SELECT doc_id, n, i, md5(substring(text, i, {_ASS_WIN})) AS digest
  FROM (SELECT doc_id, n, text, unnest(range(1, n - {_ASS_WIN - 2})) AS i
        FROM base WHERE n >= {_ASS_WIN})
  WHERE ('0x' || substring(md5(substring(text, i, {_ASS_PROBE})), 1, 8))::BIGINT
        % {_ASS_RATE} = 0
), freq AS (
  SELECT digest, count(*) AS n_docs
  FROM (SELECT DISTINCT doc_id, digest FROM anch)
  GROUP BY digest
), rep AS (
  SELECT digest FROM freq WHERE n_docs >= 2
  ORDER BY n_docs DESC, digest LIMIT {_ASS_MAX_DIGESTS}
), hits AS (
  SELECT a.doc_id, a.i, a.i + {_ASS_WIN - 1} AS e
  FROM anch a JOIN rep USING (digest)
), isl AS (
  SELECT doc_id, i, e,
         CASE WHEN i > coalesce(
                max(e) OVER (PARTITION BY doc_id ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS ni
  FROM hits
), isl2 AS (
  SELECT doc_id, i, e,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM isl
), spans AS (
  SELECT doc_id, island, min(i) AS s, max(e) AS st
  FROM isl2 GROUP BY 1, 2
), prof AS (
  SELECT doc_id, count(*) AS n_spans, sum(st - s + 1) AS cc
  FROM spans GROUP BY doc_id
)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(b.n AS BIGINT) AS total_chars,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.cc, 0) AS BIGINT) AS covered_chars,
       round(coalesce(p.cc, 0) / greatest(b.n, 1), 4) AS coverage
FROM base b LEFT JOIN prof p USING (doc_id)""",
    doc="Exact-substring dedup at character level (Lee et al. 2022, "
    "'Deduplicating Training Data Makes Language Models Better' — the "
    f"suffix-array {_ASS_WIN}-char criterion), re-expressed for Spark as "
    "a two-level anchored scheme: level 1 picks content-defined anchor "
    f"positions (md5 of the {_ASS_PROBE}-char probe window ≡ 0 mod "
    f"{_ASS_RATE} — the rsync/CDC chunking trick, so the SAME content "
    "anchors at the SAME spots whatever its byte offset, which fixed-"
    "stride k-grams cannot guarantee); level 2 groups the md5 digest of "
    f"the {_ASS_WIN}-char window at each anchor, keeps digests seen in "
    ">= 2 distinct docs (most-frequent-first cap), and merges per-doc "
    "hits into maximal spans via gaps-and-islands — the character-level "
    "upgrade of repeated_ngram_spans' fixed word-5-gram islands. The "
    "fixture corpus has no 50-char cross-doc repeats, so the corpus is "
    "seeded in-query (embedding_near_dups discipline) with truncated "
    "copies under a 9-char header: the shared region sits at a SHIFTED "
    "offset in the seed, which attests exactly the alignment-robustness "
    "the anchors exist for. Explode + codegen'd md5 columns (the simhash "
    "lesson: never an interpreted HOF fold on the hot path); only "
    "(doc_id, pos, 16-byte digest) triples shuffle — the payload text "
    "never leaves the scan stage, at 100 TB as here.",
    survey_ids=("M7-D28",),
)
def anchor_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = d.filter(
        (F.col("doc_id") % _ASS_SEED_STRIDE == 0) & (F.length("text") >= 160)
    ).select(
        (F.col("doc_id") + F.lit(_ASS_SEED_BASE)).alias("doc_id"),
        F.concat(F.lit("dup-seed "), F.expr("substring(text, 17, 140)")).alias(
            "text"
        ),
    )
    base = fan_out(
        d.unionByName(seeds).withColumn("n", F.length("text"))
    ).localCheckpoint(eager=False)

    anch = (
        base.filter(F.col("n") >= _ASS_WIN)
        .select(
            "doc_id",
            "n",
            "text",
            F.explode(F.sequence(F.lit(1), F.col("n") - _ASS_WIN + 1)).alias("i"),
        )
        .filter(
            F.expr(
                f"CAST(conv(substring(md5(substring(text, i, {_ASS_PROBE})), 1, 8), "
                f"16, 10) AS BIGINT) % {_ASS_RATE} = 0"
            )
        )
        .select(
            "doc_id",
            "i",
            F.expr(f"md5(substring(text, i, {_ASS_WIN}))").alias("digest"),
        )
    )
    freq = (
        anch.select("doc_id", "digest")
        .distinct()
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    rep = (
        freq.filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "digest")
        .limit(_ASS_MAX_DIGESTS)
        .select("digest")
    )
    hits = anch.join(F.broadcast(rep), "digest").select(
        "doc_id", "i", (F.col("i") + F.lit(_ASS_WIN - 1)).alias("e")
    )
    from pyspark.sql import Window

    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcur = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = hits.withColumn(
        "ni",
        F.when(
            F.col("i")
            > F.coalesce(F.max("e").over(wprev), F.lit(-1)) + F.lit(1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("ni").over(wcur))
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("i").alias("s"), F.max("e").alias("st")
    )
    prof = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("st") - F.col("s") + 1).alias("cc"),
    )
    return (
        base.select("doc_id", "n")
        .join(prof, "doc_id", "left")
        .select(
            N.big("doc_id").alias("doc_id"),
            N.big("n").alias("total_chars"),
            N.big(F.coalesce("n_spans", F.lit(0))).alias("n_spans"),
            N.big(F.coalesce("cc", F.lit(0))).alias("covered_chars"),
            N.rnd(
                F.coalesce("cc", F.lit(0)) / F.greatest("n", F.lit(1)), 4
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# query_likelihood_retrieval (round 8, second window) — Dirichlet-smoothed
# query-likelihood language-model retrieval (Zhai & Lafferty 2001), the
# third classical lexical scorer next to tfidf_top_terms and bm25_retrieval
# ---------------------------------------------------------------------------

_QL_MU = 100.0


@query(
    "query_likelihood_retrieval",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, {WORDS_SQL} AS ws FROM documents
), lens AS (
  SELECT doc_id, len(ws) AS dl FROM base WHERE ws IS NOT NULL
), toks AS MATERIALIZED (
  SELECT doc_id, unnest(ws) AS w FROM base
), corpus AS (
  SELECT CAST(count(*) AS DOUBLE) AS t FROM toks
), q(term) AS (VALUES ('spark'), ('window'), ('join')),
cf AS (
  SELECT q.term, CAST(count(toks.w) AS DOUBLE) AS cf
  FROM q LEFT JOIN toks ON toks.w = q.term
  GROUP BY q.term
), tf AS (
  SELECT doc_id, w AS term, count(*) AS tf FROM toks
  GROUP BY doc_id, w HAVING w IN {_BM25_TERMS_SQL}
), contrib AS (
  SELECT lens.doc_id,
         {N.sql_cents(
             "ln((coalesce(tf.tf, 0) + " + repr(_QL_MU) + " * cf.cf / corpus.t)"
             " / (lens.dl + " + repr(_QL_MU) + "))", 10**9)} AS c9,
         CASE WHEN tf.tf IS NOT NULL THEN 1 ELSE 0 END AS hitc
  FROM lens CROSS JOIN cf CROSS JOIN corpus
  LEFT JOIN tf ON tf.doc_id = lens.doc_id AND tf.term = cf.term
), scored AS (
  SELECT doc_id, sum(c9) AS s9, CAST(sum(hitc) AS BIGINT) AS n_terms_hit
  FROM contrib GROUP BY doc_id
  ORDER BY s9 DESC, doc_id LIMIT 10
)
SELECT CAST(row_number() OVER (ORDER BY s9 DESC, doc_id) AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       round(CAST(s9 AS DOUBLE) / 1e9, 6) AS ql_score,
       n_terms_hit
FROM scored""",
    doc="Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty "
    "2001, mu = 100): top-10 documents by sum over the 3 query terms of "
    "ln((tf + mu * P(w|C)) / (dl + mu)) — the language-modeling scorer "
    "that completes the classical lexical trio (TF-IDF, BM25, QL LM). "
    "Every per-term contribution is snapped to the 1e-9 grid and "
    "integer-summed, and the top-10 cut orders by the exact integer "
    "sum (never the rendered double), so ranking and scores replay "
    "bit-identically. Plan: one explode feeding three tiny aggregates "
    "(corpus total = 1 row, collection frequencies = |q| rows "
    "broadcast, per-doc tf only for query terms); the doc-length frame "
    "is crossed with the 3-row term table (a constant |q|x explode) "
    "and left-joined to the sparse tf side; TakeOrderedAndProject "
    "top-10. At 100 TB: payload text never shuffles — only "
    "(doc_id, term, tf) triples for the query terms do.",
    survey_ids=("M7-R10",),
)
def query_likelihood_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    base = fan_out(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", words_col(F.col("text")).alias("_ws")
        )
    ).localCheckpoint()
    lens = base.filter(F.col("_ws").isNotNull()).select(
        "doc_id", F.size("_ws").alias("dl")
    )
    toks = base.select("doc_id", F.explode("_ws").alias("w"))
    corpus = toks.agg(F.count(F.lit(1)).cast("double").alias("t"))
    qterms = spark.createDataFrame([(t,) for t in _BM25_TERMS], "term string")
    cf = (
        F.broadcast(qterms)
        .join(toks, toks.w == qterms.term, "left")
        .groupBy("term")
        .agg(F.count("w").cast("double").alias("cf"))
    )
    tf = (
        toks.filter(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    mu = F.lit(_QL_MU)
    contrib = (
        lens.crossJoin(F.broadcast(cf.crossJoin(corpus)))
        .join(tf, ["doc_id", "term"], "left")
        .select(
            "doc_id",
            N.cents(
                F.log(
                    (F.coalesce(F.col("tf"), F.lit(0)) + mu * F.col("cf") / F.col("t"))
                    / (F.col("dl") + mu)
                ),
                10**9,
            ).alias("c9"),
            F.col("tf").isNotNull().cast("bigint").alias("hitc"),
        )
    )
    scored = (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("c9").alias("s9"),
            F.sum("hitc").cast("bigint").alias("n_terms_hit"),
        )
        .orderBy(F.desc("s9"), "doc_id")
        .limit(10)
    )
    w1 = Window.partitionBy(F.lit(1)).orderBy(F.desc("s9"), "doc_id")
    return scored.select(
        F.row_number().over(w1).cast("bigint").alias("rank"),
        N.big("doc_id").alias("doc_id"),
        N.rnd(F.col("s9").cast("double") / 1e9, 6).alias("ql_score"),
        "n_terms_hit",
    )


# ---------------------------------------------------------------------------
# word_burstiness (round 8, second window) — Church & Gale burstiness
# statistics per high-frequency term (the term-level dispersion companion
# of the doc-level repetition_scores / overdispersion_test)
# ---------------------------------------------------------------------------

_BURST_TOP = 50
# shared engine-neutral double algebra over the exact integer stats
# (stf = total tf, stf2 = sum tf^2, n = corpus doc count)
_BURST_VMR = (
    "((stf2 / (n * 1.0e0) - (stf / (n * 1.0e0)) * (stf / (n * 1.0e0)))"
    " / (stf / (n * 1.0e0)))"
)


@query(
    "word_burstiness",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents
), tf AS (
  SELECT w AS term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2
), stats AS (
  SELECT term,
         CAST(sum(tf) AS BIGINT) AS stf,
         CAST(count(*) AS BIGINT) AS df,
         CAST(sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
         CAST(sum(tf * tf) AS BIGINT) AS stf2
  FROM tf GROUP BY term
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
), top AS (
  SELECT * FROM stats ORDER BY stf DESC, term LIMIT {_BURST_TOP}
)
SELECT term, stf AS total_tf, df, df2,
       {N.sql_rnd('df2 / (df * 1.0e0)', 6)} AS burstiness,
       {N.sql_rnd('stf / (df * 1.0e0)', 6)} AS mean_tf_in_docs,
       {N.sql_rnd(_BURST_VMR, 6)} AS vmr
FROM top CROSS JOIN nd""",
    doc=f"Word burstiness profile (Church & Gale 1995): for the top-"
    f"{_BURST_TOP} corpus terms, P(tf >= 2 | tf >= 1) — the probability "
    "a word recurs once it appears, the contagion statistic that "
    "separates bursty content words from evenly-spread function words "
    "— plus mean within-doc tf and the variance-to-mean ratio over ALL "
    "documents (VMR > 1 = overdispersed vs Poisson). All sufficient "
    "statistics (tf totals, doc frequencies, tf^2 sums) are exact "
    "integers; the three rendered ratios are shared engine-neutral "
    "double strings. Plan: one explode -> (doc, term) tf aggregate -> "
    "term-level rollup (both map-side combined), TakeOrdered top-50, "
    "one broadcast corpus-count row. At 100 TB the payload never "
    "shuffles — only (doc_id, term, tf) triples do, and the second "
    "aggregate is vocabulary-bounded.",
    survey_ids=("M7-C26",),
)
def word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    d = fan_out(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", words_col(F.col("text")).alias("_ws")
        )
    )
    tf = (
        d.select("doc_id", F.explode("_ws").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.sum("tf").cast("bigint").alias("stf"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum((F.col("tf") >= 2).cast("bigint")).cast("bigint").alias("df2"),
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("stf2"),
    )
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    top = stats.orderBy(F.desc("stf"), "term").limit(_BURST_TOP)
    return top.crossJoin(F.broadcast(nd)).select(
        "term",
        F.col("stf").alias("total_tf"),
        "df",
        "df2",
        F.expr(N.sql_rnd("df2 / (df * 1.0e0)", 6)).alias("burstiness"),
        F.expr(N.sql_rnd("stf / (df * 1.0e0)", 6)).alias("mean_tf_in_docs"),
        F.expr(N.sql_rnd(_BURST_VMR, 6)).alias("vmr"),
    )


# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets (round 8, second window) — the CCNet
# head/middle/tail corpus split by per-language LM perplexity
# ---------------------------------------------------------------------------

_PPLB_NAMES = "CASE bkt WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END"


@query(
    "ccnet_perplexity_buckets",
    oracle=f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents
), counts AS MATERIALIZED (
  SELECT w, count(*) AS c FROM toks GROUP BY w
), total AS (
  SELECT CAST(sum(c) AS DOUBLE) AS t FROM counts
), vocab AS (
  SELECT w, c FROM counts ORDER BY c DESC, w LIMIT {VOCAB_SIZE}
), per_doc AS (
  SELECT toks.doc_id,
         CAST(sum({N.sql_cents(
             'ln(coalesce(CAST(v.c AS DOUBLE), 5.0e-1) / total.t)',
             10**9)}) AS BIGINT) AS s9,
         CAST(count(*) AS BIGINT) AS nw
  FROM toks LEFT JOIN vocab v ON toks.w = v.w CROSS JOIN total
  GROUP BY toks.doc_id
), scored AS (
  SELECT d.lang, p.doc_id, p.s9, p.nw,
         {N.sql_cents('exp(-(p.s9 / 1.0e9) / p.nw)', 10**4)} AS ppl4
  FROM per_doc p JOIN documents d USING (doc_id)
), ranked AS (
  SELECT lang, ppl4,
         row_number() OVER (PARTITION BY lang
                            ORDER BY s9 * 1.0e0 / nw DESC, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS cnt
  FROM scored
)
SELECT lang,
       {_PPLB_NAMES} AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(ppl4) AS DOUBLE) / count(*) / 1e4, 4) AS mean_ppl,
       round(CAST(min(ppl4) AS DOUBLE) / 1e4, 4) AS min_ppl,
       round(CAST(max(ppl4) AS DOUBLE) / 1e4, 4) AS max_ppl
FROM (
  SELECT lang, ppl4,
         CAST(floor((3.0e0 * (rk - 1)) / cnt) AS BIGINT) AS bkt
  FROM ranked
) GROUP BY lang, bkt""",
    doc="The CCNet corpus split (Wenzek et al. 2020): bucket every "
    "document into head/middle/tail perplexity terciles PER LANGUAGE "
    "under the corpus top-4096 unigram LM (OOV mass 0.5) — the "
    "standard quality stratification LLM pretraining pipelines sample "
    "from (head = fluent, tail = noisy). Per-token log-probabilities "
    "snap to the 1e-9 grid and integer-sum per document "
    "(snap-then-sum), documents rank on the exact (s9/nw, doc_id) "
    "order, and tercile boundaries are the shared integer formula "
    "floor(3(rk-1)/cnt) — never an engine ntile. Perplexities render "
    "from the 1e-4 grid. Plan: one explode + broadcast vocab join + "
    "per-doc aggregate; the tercile window partitions by language. At "
    "100 TB the exact per-language rank would become per-language "
    "approx-quantile thresholds (the quality_quantile_filter shape) — "
    "the bucket semantics are identical, the rank form is the "
    "oracle-exact choice at test scale.",
    survey_ids=("M7-T26",),
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    d = load_table(spark, sf_dir, "documents")
    toks = fan_out(
        d.select("doc_id", words_col(F.col("text")).alias("_ws"))
    ).select("doc_id", F.explode("_ws").alias("w"))
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").cast("double").alias("t"))
    vocab = counts.orderBy(F.desc("c"), "w").limit(VOCAB_SIZE)
    per_doc = (
        toks.join(F.broadcast(vocab), "w", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum(
                N.cents(
                    F.log(
                        F.coalesce(F.col("c").cast("double"), F.lit(0.5))
                        / F.col("t")
                    ),
                    10**9,
                )
            )
            .cast("bigint")
            .alias("s9"),
            F.count(F.lit(1)).cast("bigint").alias("nw"),
        )
    )
    scored = per_doc.join(d.select("doc_id", "lang"), "doc_id").select(
        "lang",
        "doc_id",
        "s9",
        "nw",
        N.cents(
            F.exp(-(F.col("s9") / F.lit(1.0e9)) / F.col("nw")), 10**4
        ).alias("ppl4"),
    )
    wlang = Window.partitionBy("lang")
    ranked = scored.select(
        "lang",
        "ppl4",
        F.row_number()
        .over(wlang.orderBy(F.expr("s9 * 1.0e0 / nw").desc(), "doc_id"))
        .alias("rk"),
        F.count(F.lit(1)).over(wlang).alias("cnt"),
    )
    bucketed = ranked.select(
        "lang",
        "ppl4",
        F.floor((F.lit(3.0) * (F.col("rk") - 1)) / F.col("cnt"))
        .cast("bigint")
        .alias("bkt"),
    )
    return bucketed.groupBy("lang", "bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        N.rnd(F.sum("ppl4").cast("double") / F.count(F.lit(1)) / 1e4, 4).alias(
            "mean_ppl"
        ),
        N.rnd(F.min("ppl4").cast("double") / 1e4, 4).alias("min_ppl"),
        N.rnd(F.max("ppl4").cast("double") / 1e4, 4).alias("max_ppl"),
    ).select(
        "lang",
        F.expr(_PPLB_NAMES).alias("bucket"),
        "n_docs",
        "mean_ppl",
        "min_ppl",
        "max_ppl",
    )


# ---------------------------------------------------------------------------
# corpus_self_bleu (round 8, fourth wave) — corpus diversity audit: each
# document's clipped n-gram precision against the REST of the corpus
# (self-BLEU, Zhu et al. 2018)
# ---------------------------------------------------------------------------

_SB_SCORE = (
    "CASE WHEN p1num = 0 OR p2num = 0 THEN 0.0e0 "
    "ELSE exp(5.0e-1 * (ln(p1num / (p1den * 1.0e0))"
    " + ln(p2num / (p2den * 1.0e0)))) END"
)


@query(
    "corpus_self_bleu",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, {WORDS_SQL} AS ws FROM documents WHERE len({WORDS_SQL}) >= 2
), u AS MATERIALIZED (
  SELECT doc_id, w AS g, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(ws) AS w FROM base) GROUP BY 1, 2
), b AS MATERIALIZED (
  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, concat(ws[i], ' ', ws[i + 1]) AS g
    FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM base)
  ) GROUP BY 1, 2
), uc AS (SELECT g, CAST(sum(tf) AS BIGINT) AS ctf FROM u GROUP BY g),
bc AS (SELECT g, CAST(sum(tf) AS BIGINT) AS ctf FROM b GROUP BY g),
p1 AS (
  SELECT u.doc_id,
         CAST(sum(least(u.tf, uc.ctf - u.tf)) AS BIGINT) AS p1num,
         CAST(sum(u.tf) AS BIGINT) AS p1den
  FROM u JOIN uc USING (g) GROUP BY u.doc_id
), p2 AS (
  SELECT b.doc_id,
         CAST(sum(least(b.tf, bc.ctf - b.tf)) AS BIGINT) AS p2num,
         CAST(sum(b.tf) AS BIGINT) AS p2den
  FROM b JOIN bc USING (g) GROUP BY b.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       p1den AS n_unigrams,
       {N.sql_rnd('p1num / (p1den * 1.0e0)', 6)} AS p1_clipped,
       {N.sql_rnd('p2num / (p2den * 1.0e0)', 6)} AS p2_clipped,
       {N.sql_rnd(_SB_SCORE, 6)} AS self_bleu
FROM p1 JOIN p2 USING (doc_id)""",
    doc="Self-BLEU corpus diversity audit (Zhu et al. 2018 Texygen): for "
    "each document, the clipped 1- and 2-gram precision against the "
    "REST of the corpus (clip = min(tf, corpus_tf - tf), i.e. the "
    "document is excluded from its own reference) and their geometric "
    "mean — high self-BLEU = the corpus repeats itself = low "
    "diversity; the distribution of this score is the standard "
    "mode-collapse probe for synthetic/generated training data. All "
    "numerators and denominators are exact integers; the geometric "
    "mean is ONE shared double expression with an integer zero-guard. "
    "Plan: two gram-explode aggregates (per-doc tf and corpus tf), "
    "two gram-keyed joins — only (doc_id, gram-digest, tf) triples "
    "shuffle, and the corpus gram tables are vocabulary-bounded.",
    survey_ids=("M7-C27",),
)
def corpus_self_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    base = fan_out(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", words_col(F.col("text")).alias("ws"))
        .filter(F.size("ws") >= 2)
    ).localCheckpoint()
    u = (
        base.select("doc_id", F.explode("ws").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    b = (
        base.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> concat(ws[i - 1], ' ', ws[i]))"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    uc = u.groupBy("g").agg(F.sum("tf").cast("bigint").alias("ctf"))
    bc = b.groupBy("g").agg(F.sum("tf").cast("bigint").alias("ctf"))
    p1 = (
        u.join(uc, "g")
        .groupBy("doc_id")
        .agg(
            F.sum(F.least(F.col("tf"), F.col("ctf") - F.col("tf")))
            .cast("bigint")
            .alias("p1num"),
            F.sum("tf").cast("bigint").alias("p1den"),
        )
    )
    p2 = (
        b.join(bc, "g")
        .groupBy("doc_id")
        .agg(
            F.sum(F.least(F.col("tf"), F.col("ctf") - F.col("tf")))
            .cast("bigint")
            .alias("p2num"),
            F.sum("tf").cast("bigint").alias("p2den"),
        )
    )
    return p1.join(p2, "doc_id").select(
        N.big("doc_id").alias("doc_id"),
        F.col("p1den").alias("n_unigrams"),
        F.expr(N.sql_rnd("p1num / (p1den * 1.0e0)", 6)).alias("p1_clipped"),
        F.expr(N.sql_rnd("p2num / (p2den * 1.0e0)", 6)).alias("p2_clipped"),
        F.expr(N.sql_rnd(_SB_SCORE, 6)).alias("self_bleu"),
    )


# ---------------------------------------------------------------------------
# kneser_ney_bigram (round 8, fifth wave) — interpolated Kneser-Ney
# bigram LM per-document scoring (Kneser & Ney 1995; Chen & Goodman 1999
# empirically the strongest n-gram smoother — the LM behind KenLM-style
# quality filtering at CCNet/RefinedWeb scale)
# ---------------------------------------------------------------------------

_KN_D = 0.75  # absolute discount, the Chen-Goodman fixed-D variant

# P_KN(w|v) = max(c(v,w) - D, 0)/c(v) + (D * N1+(v,·)/c(v)) * P_cont(w)
# with P_cont(w) = N1+(·,w)/N1+(·,·) — continuation probability, the
# Kneser-Ney insight: the backoff weight of w is how many CONTEXTS it
# completes, not how often it occurs. Dialect-neutral over the count
# columns (all exact integers from two group passes).
_KN_LOGP = (
    f"ln(greatest(c_vw - {_KN_D!r}, 0.0e0) / c_v"
    f" + ({_KN_D!r} * n1p_fwd / c_v) * (n1p_bwd / (1.0e0 * n1p_all)))"
)


@query(
    "kneser_ney_bigram",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, {WORDS_SQL} AS ws FROM documents
  WHERE len({WORDS_SQL}) >= 2
), db AS MATERIALIZED (
  SELECT doc_id, ws[i] AS v, ws[i + 1] AS w,
         CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM base)
  GROUP BY 1, 2, 3
), bg AS MATERIALIZED (
  SELECT v, w, CAST(sum(tf) AS BIGINT) AS c_vw FROM db GROUP BY 1, 2
), ctx AS (
  SELECT v, CAST(sum(c_vw) AS BIGINT) AS c_v,
         CAST(count(*) AS BIGINT) AS n1p_fwd
  FROM bg GROUP BY v
), cont AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n1p_bwd FROM bg GROUP BY w
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n1p_all FROM bg
)
SELECT db.doc_id,
       CAST(sum(db.tf) AS BIGINT) AS n_bigrams,
       round(sum(db.tf * {N.sql_cents(_KN_LOGP, 10**9)}) / 1e9
             / sum(db.tf), 4) AS kn_logprob,
       round(exp(-(sum(db.tf * {N.sql_cents(_KN_LOGP, 10**9)}) / 1e9
                   / sum(db.tf))), 4) AS kn_ppl
FROM db
JOIN bg ON db.v = bg.v AND db.w = bg.w
JOIN ctx ON db.v = ctx.v
JOIN cont ON db.w = cont.w
CROSS JOIN tot
GROUP BY db.doc_id""",
    doc="Interpolated Kneser-Ney bigram language model scored per "
    "document against the corpus it was estimated on (the KenLM-style "
    "perplexity filter face next to the unigram unigram_logprob / "
    "ccnet_perplexity_buckets): absolute discount D=0.75, backoff mass "
    "D·N1+(v,·)/c(v), and the continuation probability "
    "N1+(·,w)/N1+(·,·) — distinct-context counts, the KN signature. "
    "Every count is an exact integer from two vocabulary-bounded group "
    "passes; the per-bigram log-probability is snapped to the 1e-9 "
    "grid and integer-weighted by term frequency so both engines sum "
    "identical integers in any order. Plan: one token shuffle to build "
    "the bigram table; the model tables (bigram, context, continuation "
    "counts) are vocabulary-bounded and join back onto the per-doc "
    "bigram frame — at 100 TB the model state is broadcast-sized and "
    "document text shuffles zero times.",
    survey_ids=("M7-T28",),
)
def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    base = fan_out(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", words_col(F.col("text")).alias("ws"))
        .filter(F.size("ws") >= 2)
    )
    db = (
        base.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(ws[i - 1] AS v, ws[i] AS w))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.v", "bg.w")
        .groupBy("doc_id", "v", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    bg = db.groupBy("v", "w").agg(F.sum("tf").cast("bigint").alias("c_vw"))
    ctx = bg.groupBy("v").agg(
        F.sum("c_vw").cast("bigint").alias("c_v"),
        F.count(F.lit(1)).cast("bigint").alias("n1p_fwd"),
    )
    cont = bg.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1p_bwd")
    )
    tot = bg.agg(F.count(F.lit(1)).cast("bigint").alias("n1p_all"))
    scored = (
        db.join(F.broadcast(bg), ["v", "w"])
        .join(F.broadcast(ctx), "v")
        .join(F.broadcast(cont), "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "tf",
            F.expr(N.sql_cents(_KN_LOGP, 10**9)).alias("lp9"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        F.expr(
            N.sql_rnd("sum(tf * lp9) / 1e9 / sum(tf)", 4)
        ).alias("kn_logprob"),
        F.expr(
            N.sql_rnd("exp(-(sum(tf * lp9) / 1e9 / sum(tf)))", 4)
        ).alias("kn_ppl"),
    )


# ---------------------------------------------------------------------------
# rbo_rankings (round 8, sixth wave) — Rank-Biased Overlap (Webber et
# al. 2010) between the BM25 and query-likelihood top-10 rankings for
# the same query: the ranking-similarity meta-eval that tells you how
# interchangeable two retrieval scorers actually are
# ---------------------------------------------------------------------------

_RBO_P = 0.9
_RBO_DEPTH = 10
# (1-p)*p^(d-1) weights as shared literals (exact same doubles in both
# engines — no pow() at runtime).
_RBO_W = "CASE " + " ".join(
    f"WHEN d = {dd} THEN {(1.0 - _RBO_P) * _RBO_P ** (dd - 1)!r}"
    for dd in range(1, _RBO_DEPTH + 1)
) + " END"


def _rbo_oracle() -> str:
    from project_bigdata_spark.plans.catalog import QUERIES

    bm25 = QUERIES["bm25_retrieval"].oracle
    ql = QUERIES["query_likelihood_retrieval"].oracle
    return f"""
WITH a0 AS ({bm25}),
a AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rka
  FROM a0
), b0 AS ({ql}),
b AS (SELECT doc_id, rank AS rkb FROM b0),
ab AS (
  SELECT greatest(a.rka, b.rkb) AS m FROM a JOIN b USING (doc_id)
), depths AS (
  SELECT CAST(unnest(range(1, {_RBO_DEPTH} + 1)) AS BIGINT) AS d
), ov AS (
  SELECT d,
         CAST(coalesce(sum(CASE WHEN ab.m <= d THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS overlap
  FROM depths LEFT JOIN ab ON true GROUP BY d
), terms AS (
  SELECT d, overlap,
         {N.sql_cents(f"({_RBO_W}) * overlap / (1.0e0 * d)", 10**6)}
           AS t6
  FROM ov
)
SELECT d AS depth, overlap,
       {N.sql_rnd("overlap / (1.0e0 * d)", 6)} AS agreement,
       {N.sql_rnd(
           "sum(t6) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING"
           " AND CURRENT ROW) / 1e6", 6)} AS rbo_cum
FROM terms"""


@query(
    "rbo_rankings",
    oracle=_rbo_oracle(),
    doc="Rank-Biased Overlap (Webber et al. 2010, p = 0.9, truncated at "
    f"depth {_RBO_DEPTH}) between the BM25 and the Dirichlet "
    "query-likelihood top-10 rankings for the SAME 3-term query — both "
    "rankings reuse the attested retrieval plans verbatim. Per depth "
    "d: overlap |A_1..d ∩ B_1..d| (an exact integer from the joined "
    "rank pairs' max-rank), agreement overlap/d, and the cumulative "
    "RBO partial sum Σ (1−p)p^(d−1)·agreement with the geometric "
    "weights inlined as shared literals and each term snapped DIRECTLY "
    "to the rendered 1e-6 grid before the cumulative window — so the "
    "6-decimal render is an exact integer over 1e6 and can never sit "
    "on a rounding tie (the tie-mode-flip invariant). The final row is the "
    "truncated RBO — the number that says whether swapping scorers "
    "would change what users actually see (top-weighted, unlike "
    "Kendall). Plan: two TakeOrdered top-10 frames, a 10-row join, a "
    "10-row window — everything after the retrieval passes is "
    "constant-size at any corpus scale.",
    survey_ids=("M7-R12",),
)
def rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.plans.catalog import QUERIES

    a0 = QUERIES["bm25_retrieval"].builder(spark, sf_dir)
    a = a0.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), "doc_id"))
        .alias("rka"),
    )
    b = QUERIES["query_likelihood_retrieval"].builder(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("rkb")
    )
    ab = a.join(b, "doc_id").select(
        F.greatest("rka", "rkb").alias("m")
    )
    depths = spark.range(1, _RBO_DEPTH + 1).select(
        F.col("id").cast("bigint").alias("d")
    )
    ov = (
        depths.crossJoin(F.broadcast(ab))
        .groupBy("d")
        .agg(
            F.coalesce(
                F.sum((F.col("m") <= F.col("d")).cast("int")), F.lit(0)
            )
            .cast("bigint")
            .alias("overlap")
        )
    )
    terms = ov.select(
        "d",
        "overlap",
        F.expr(
            N.sql_cents(f"({_RBO_W}) * overlap / (1.0e0 * d)", 10**6)
        ).alias("t6"),
    )
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return terms.select(
        F.col("d").alias("depth"),
        "overlap",
        F.expr(N.sql_rnd("overlap / (1.0e0 * d)", 6)).alias("agreement"),
        N.rnd(F.sum("t6").over(wcum) / 1e6, 6).alias("rbo_cum"),
    )


# ---------------------------------------------------------------------------
# yule_k_richness (round 8, eighth wave) — Yule's characteristic K and
# the lexical repeat rate per language (Yule 1944): the length-robust
# vocabulary-richness constant that completes the estimator trio with
# Chao1 (unseen species) and Heaps (growth law)
# ---------------------------------------------------------------------------

# K = 1e4 * (sum_m m^2 * V_m - N) / N^2 over the count-of-counts frame
# (V_m = #distinct words occurring m times, N = total tokens) — EXACT
# integers, one double render. The repeat rate sum(tf*(tf-1))/(N*(N-1))
# (Simpson/Herdan) shares the same sufficient statistics since
# sum m^2 V_m = sum tf^2.
_YK_K = "(1.0e4 * (1.0e0 * s2 - n) / (1.0e0 * n * n))"
_YK_RR = "((1.0e0 * s2 - n) / (1.0e0 * n * (n - 1)))"


@query(
    "yule_k_richness",
    oracle=f"""
WITH tf AS MATERIALIZED (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT lang, unnest({WORDS_SQL}) AS w FROM documents)
  GROUP BY 1, 2
), m AS (
  SELECT lang,
         CAST(sum(tf) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(tf * tf) AS BIGINT) AS s2
  FROM tf GROUP BY lang
)
SELECT lang, n AS n_tokens, vocab,
       {N.sql_rnd(_YK_K, 4)} AS yule_k,
       {N.sql_rnd(_YK_RR, 8)} AS repeat_rate
FROM m WHERE n > 1""",
    doc="Yule's characteristic K per language (Yule 1944, the "
    "length-robust lexical-richness constant: K = 10⁴(Σm²V_m − N)/N² "
    "over the word count-of-counts; higher K = more repetitive "
    "vocabulary) plus the Simpson/Herdan repeat rate Σtf(tf−1)/N(N−1) "
    "— the probability two random tokens are the same word — from the "
    "SAME exact integer sufficient statistics (N, V, Σtf²). Completes "
    "the corpus-estimator trio with chao1_vocab_richness (unseen "
    "mass) and the Heaps-law fit (growth): Chao1 asks how much is "
    "missing, Heaps how fast it grows, Yule how concentrated what "
    "exists is. Plan: one token shuffle to the vocabulary-bounded tf "
    "frame, one languages-cardinality reduce — the count-of-counts "
    "idiom, never a second pass over facts.",
    survey_ids=("M7-C28",),
)
def yule_k_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    d = fan_out(
        load_table(spark, sf_dir, "documents").select(
            "lang", words_col(F.col("text")).alias("_ws")
        )
    )
    tf = (
        d.select("lang", F.explode("_ws").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    m = tf.groupBy("lang").agg(
        F.sum("tf").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("s2"),
    )
    return m.filter(F.col("n") > 1).select(
        "lang",
        F.col("n").alias("n_tokens"),
        "vocab",
        F.expr(N.sql_rnd(_YK_K, 4)).alias("yule_k"),
        F.expr(N.sql_rnd(_YK_RR, 8)).alias("repeat_rate"),
    )
