"""Text-analysis + multimodal catalog entries over ``documents`` (M7).

The multimodal entry runs the REAL mapInPandas plumbing with the
deterministic fake decoder, so even the Python-worker path is covered by
the DuckDB differential gate (md5-derived features are SQL-replayable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_spark.operators import multimodal as MM
from project_bigdata_spark.operators import text as TX
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.plans.relational_queries4 import _PR_ITER_SQL
from project_bigdata_spark.sources import load_table

WORDS_SQL = r"list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')"
TOKEN_RE_SQL = r"'[A-Za-z0-9_]+|[^A-Za-z0-9_\s]'"
PUNCT_RE_SQL = r"'[^A-Za-z0-9_\s]'"


def _profile_score_sql(stopwords: list[str]) -> str:
    # zero-word documents score 0.0 by definition — the exact integer
    # len() predicate decides BEFORE the division (mirrors
    # operators/text.py stopword_ratio; DuckDB would render NULL,
    # ANSI Spark would throw)
    inlist = ", ".join(f"'{w}'" for w in stopwords)
    return (
        f"(CASE WHEN len({WORDS_SQL}) = 0 THEN 0.0e0 ELSE "
        f"CAST(len(list_filter({WORDS_SQL}, w -> w IN ({inlist}))) AS DOUBLE)"
        f" / len({WORDS_SQL}) END)"
    )


@query(
    "token_stats",
    oracle=f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len({WORDS_SQL}) AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, {TOKEN_RE_SQL})) AS BIGINT) AS n_tokens_bpe,
       CAST(length(text) AS BIGINT) AS n_chars,
       round(CAST(len(list_distinct({WORDS_SQL})) AS DOUBLE) / len({WORDS_SQL}), 4)
         AS type_token_ratio
FROM documents""",
    doc="Token counting: whitespace + BPE-ish regex tokenizers, char count, "
    "type-token ratio — all regexp/array built-ins inside codegen.",
    survey_ids=("M7-T1",),
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        N.big("doc_id").alias("doc_id"),
        TX.token_count_ws(t).alias("n_tokens_ws"),
        TX.token_count_bpe(t).alias("n_tokens_bpe"),
        F.length(t).cast("bigint").alias("n_chars"),
        N.rnd(TX.type_token_ratio(t)).alias("type_token_ratio"),
    )


@query(
    "quality_scores",
    oracle=f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       round(
         least(CAST(length(text) AS DOUBLE) / 5.0e2, 1.0e0) * 4.0e-1
         + least(({_profile_score_sql(TX.LANG_PROFILES['en'])}) / 3.0e-1, 1.0e0) * 3.0e-1
         + (1.0e0 - least(CASE WHEN length(text) = 0 THEN 0.0e0
                          ELSE CAST(len(regexp_extract_all(text, {PUNCT_RE_SQL})) AS DOUBLE)
                          / length(text) * 5 END, 1.0e0)) * 3.0e-1,
       4) AS quality
FROM documents""",
    doc="Quality scoring: length saturation + stopword density + "
    "punctuation penalty, explicit constants replayed by the oracle.",
    survey_ids=("M7-T2",),
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        N.big("doc_id").alias("doc_id"),
        N.rnd(TX.quality_score(F.col("text"))).alias("quality"),
    )


_LANG_SCORE_COLS = ",\n       ".join(
    f"{_profile_score_sql(sw)} AS s_{lang}"
    for lang, sw in sorted(TX.LANG_PROFILES.items())
)
_BEST = "greatest(" + ", ".join(f"s_{lang}" for lang in sorted(TX.LANG_PROFILES)) + ")"
_PRED_CASES = "\n         ".join(
    f"WHEN s_{lang} = {_BEST} THEN '{lang}'" for lang in sorted(TX.LANG_PROFILES)
)


@query(
    "lang_id_confusion",
    oracle=f"""
WITH scores AS (
  SELECT doc_id, lang,
       {_LANG_SCORE_COLS}
  FROM documents
), pred AS (
  SELECT doc_id, lang,
         CASE WHEN {_BEST} < 2.0e-2 THEN 'unknown'
         {_PRED_CASES}
         ELSE 'unknown' END AS predicted
  FROM scores
)
SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY lang, predicted""",
    doc="Language-ID heuristic (stopword-profile argmax with lexicographic "
    "tiebreak) and its confusion matrix against the labeled lang column.",
    survey_ids=("M7-T3",),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pred = d.select(
        "lang", TX.predict_lang(F.col("text")).alias("predicted")
    )
    return pred.groupBy("lang", "predicted").agg(F.count(F.lit(1)).alias("n"))


@query(
    "doc_fingerprints",
    oracle=f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(substring(lower(text), 1, 64), ''),
                          c -> CAST(ascii(c) AS BIGINT))),
         (acc, x) -> (acc * {TX.HASH_BASE} + x) % {TX.HASH_MOD}) AS prefix_hash,
       md5(substring(lower(text), 1, 128)) AS prefix_md5
FROM documents""",
    doc="Document fingerprinting: polynomial rolling hash (left-fold over "
    "char codes, mod 1e9+7) + md5 prefix digest.",
    survey_ids=("M7-T4",),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        N.big("doc_id").alias("doc_id"),
        TX.rolling_hash(F.col("text"), 64).alias("prefix_hash"),
        F.md5(F.substring(F.lower("text"), 1, 128)).alias("prefix_md5"),
    )


@query(
    "multimodal_decode",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       'image' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(64 + CAST(('0x' || substring(md5(text), 1, 2)) AS INT) % 192 AS BIGINT)
         AS width,
       CAST(64 + CAST(('0x' || substring(md5(text), 3, 2)) AS INT) % 192 AS BIGINT)
         AS height,
       round(CAST(('0x' || substring(md5(text), 5, 4)) AS INT) / 6.5535e4, 6)
         AS mean_luma
FROM documents""",
    doc="Multimodal plumbing end-to-end: binary payload table -> Arrow-"
    "batched mapInPandas feature extraction (STUBBED decoder: md5-derived "
    "deterministic fake; real decode seam documented in "
    "operators/multimodal.py). The Python-worker path itself is what this "
    "query verifies.",
    survey_ids=("M7-M1",),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = MM.to_media_table(d, "doc_id", "text", "image")
    feats = MM.decode_features(media)
    return feats.select(
        N.big("media_id").alias("media_id"),
        "media_type",
        N.big("byte_len").alias("byte_len"),
        N.big("width").alias("width"),
        N.big("height").alias("height"),
        N.rnd("mean_luma", 6).alias("mean_luma"),
    )


_QUALITY_SQL = f"""
         least(CAST(length(text) AS DOUBLE) / 5.0e2, 1.0e0) * 4.0e-1
         + least(({_profile_score_sql(TX.LANG_PROFILES['en'])}) / 3.0e-1, 1.0e0) * 3.0e-1
         + (1.0e0 - least(CASE WHEN length(text) = 0 THEN 0.0e0
                          ELSE CAST(len(regexp_extract_all(text, {PUNCT_RE_SQL})) AS DOUBLE)
                          / length(text) * 5 END, 1.0e0)) * 3.0e-1"""


@query(
    "curation_pipeline",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang, text,
         ({_QUALITY_SQL}) AS quality,
         md5(array_to_string(list_sort(list_distinct({WORDS_SQL})), ' ')) AS bow,
         len({WORDS_SQL}) AS n_tokens
  FROM documents
), survivors AS (
  SELECT * FROM scored
  WHERE quality >= 0.5
  QUALIFY row_number() OVER (PARTITION BY bow ORDER BY doc_id) = 1
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 4) AS avg_tokens
FROM survivors GROUP BY lang""",
    doc="The training-data curation capstone: quality-score filter (>=0.5) "
    "-> bag-of-words dedup (first-id survivor per fingerprint) -> "
    "per-language document and token budget. One narrow scoring pass + "
    "one dedup window + one rollup — the composition an LLM-corpus "
    "pipeline runs per snapshot.",
    headline=True,
    survey_ids=("M7-P1",),
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from project_bigdata_spark.operators import dedup as DDp

    # (measured r11: fan_out HURTS here — one regex split per doc is too
    # light to repay shuffling the full text column; see OPTIMIZATION_r11)
    d = load_table(spark, sf_dir, "documents")
    # tokenize ONCE: words_col is the most expensive expression of the
    # scoring pass (regex split per doc) and three components consume it
    # (stopword density, bow digest, token count). A multiply-referenced
    # projection stays materialized (CollapseProject keeps it), so the
    # split runs once per doc instead of three times (guide §4.2 spirit:
    # do the heavy lifting once; see operators/dedup.py shingles note).
    pre = d.select(
        "doc_id",
        "lang",
        "text",
        DDp.words_col(F.col("text")).alias("_ws"),
    )
    scored = pre.select(
        "doc_id",
        "lang",
        TX.quality_score(F.col("text"), ws=F.col("_ws")).alias("quality"),
        DDp.bow_fingerprint(F.col("text"), ws=F.col("_ws")).alias("bow"),
        TX.token_count_ws(F.col("text"), ws=F.col("_ws")).alias("n_tokens"),
    )
    w = Window.partitionBy("bow").orderBy("doc_id")
    survivors = (
        scored.filter(F.col("quality") >= 0.5)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        N.rnd(F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
            "avg_tokens"
        ),
    )


@query(
    "text_to_embedding",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       round(CAST(('0x' || substring(md5(text), 1, 4)) AS INT) / 3.27675e4 - 1.0, 6)
         AS e0,
       round(CAST(('0x' || substring(md5(text), 5, 4)) AS INT) / 3.27675e4 - 1.0, 6)
         AS e1,
       round(CAST(('0x' || substring(md5(text), 29, 4)) AS INT) / 3.27675e4 - 1.0, 6)
         AS e7
FROM documents""",
    doc="Embedding-generation plumbing: text -> vector through Arrow-"
    "batched mapInPandas (the encoder-model stage; stubbed md5-derived "
    "deterministic floats). Output feeds the similarity operators; the "
    "oracle replays components 0, 1, and 7 of every vector.",
    survey_ids=("M7-M2",),
)
def text_to_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    emb = MM.text_to_embedding(d)
    return emb.select(
        N.big("doc_id").alias("doc_id"),
        N.rnd(F.col("embedding")[0], 6).alias("e0"),
        N.rnd(F.col("embedding")[1], 6).alias("e1"),
        N.rnd(F.col("embedding")[7], 6).alias("e7"),
    )


_STRIDE = TX.CHUNK_TOKENS - TX.CHUNK_OVERLAP


@query(
    "doc_chunks",
    oracle=f"""
WITH w AS (
  SELECT doc_id, {WORDS_SQL} AS toks, len({WORDS_SQL}) AS n FROM documents
), s AS (
  SELECT doc_id, n, toks,
         unnest(range(1, greatest(n - {TX.CHUNK_OVERLAP}, 1) + 1, {_STRIDE}))
           AS start_token
  FROM w
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST((start_token - 1) // {_STRIDE} AS BIGINT) AS chunk_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(start_token AS BIGINT) AS start_token,
       CAST(len(toks[start_token : start_token + {TX.CHUNK_TOKENS - 1}])
            AS BIGINT) AS chunk_len,
       array_to_string(toks[start_token : start_token + {TX.CHUNK_TOKENS - 1}],
                       ' ') AS chunk_text
FROM s""",
    doc=f"Document chunking for embedding pipelines: overlapping "
    f"{TX.CHUNK_TOKENS}-token windows (stride {_STRIDE}) via "
    "sequence + posexplode + slice — all JVM-side, a narrow fan-out of "
    "~1/stride rows per token ready for mapInPandas encoding; every "
    "token lands in at least one chunk.",
    survey_ids=("M7-T5",),
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = TX.chunk_documents_with_text(d)
    return out.select(
        N.big("doc_id").alias("doc_id"),
        "chunk_id",
        "n_tokens",
        "start_token",
        "chunk_len",
        "chunk_text",
    )


_EMB_COMP_SQL = (
    "list_transform(range(0, 8), i -> "
    "CAST(('0x' || substring(md5(chunk_text), 4*i + 1, 4)) AS INT)"
    " / 3.27675e4 - 1.0)"
)

from project_bigdata_spark.plans.similarity_queries import _cos_sql  # noqa: E402


@query(
    "chunk_embed_search",
    oracle=f"""
WITH w AS (
  SELECT doc_id, {WORDS_SQL} AS toks, len({WORDS_SQL}) AS n FROM documents
), s AS (
  SELECT doc_id, n, toks,
         unnest(range(1, greatest(n - {TX.CHUNK_OVERLAP}, 1) + 1, {_STRIDE}))
           AS start_token
  FROM w
), ch AS (
  SELECT doc_id, (start_token - 1) // {_STRIDE} AS chunk_id,
         array_to_string(toks[start_token : start_token + {TX.CHUNK_TOKENS - 1}],
                         ' ') AS chunk_text
  FROM s
), emb AS (
  SELECT doc_id, chunk_id, doc_id * 10000 + chunk_id AS cid,
         {_EMB_COMP_SQL} AS v
  FROM ch
), q AS (
  SELECT cid AS qcid, v AS qv FROM emb ORDER BY cid LIMIT 1
)
SELECT CAST(e.doc_id AS BIGINT) AS doc_id,
       CAST(e.chunk_id AS BIGINT) AS chunk_id,
       round({{COS}}, 6) AS cosine
FROM emb e, q
WHERE e.cid <> q.qcid
ORDER BY cosine DESC, e.cid
LIMIT 5""".replace("{COS}", _cos_sql("e.v", "q.qv")),
    doc="Capstone retrieval pipeline: chunk -> Arrow-batched embed "
    "(mapInPandas encoder stage, stubbed deterministic) -> exact cosine "
    "top-5 against the first chunk as query. The full chunk/embed/index/"
    "search flow a training-data pipeline runs, end-to-end under the "
    "differential gate; every stage is the scale path (narrow chunk "
    "fan-out, one Python pass, broadcast query, TakeOrderedAndProject).",
    headline=True,
    survey_ids=("M7-M3",),
)
def chunk_embed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators import similarity as SIM

    # (measured r11: fan_out does NOT pay here — the stub encoder is too
    # light to repay shuffling the text; see OPTIMIZATION_r11)
    d = load_table(spark, sf_dir, "documents")
    ch = TX.chunk_documents_with_text(d).select(
        (F.col("doc_id") * 10000 + F.col("chunk_id")).alias("cid"),
        "chunk_text",
    )
    # one Python encoder pass feeding both the query row and the corpus
    emb = (
        MM.text_to_embedding(ch, id_col="cid", text_col="chunk_text")
        .select(F.col("doc_id").alias("cid"), "embedding")
        .persist()
    )
    q = (
        emb.orderBy("cid")
        .limit(1)
        .select(F.col("cid").alias("qcid"), F.col("embedding").alias("qv"))
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col("qcid"))
        .select(
            "cid",
            N.rnd(SIM.cosine(F.col("embedding"), F.col("qv")), 6).alias(
                "cosine"
            ),
        )
    )
    return (
        scored.orderBy(F.desc("cosine"), "cid")
        .limit(5)
        .select(
            F.floor(F.col("cid") / 10000).cast("bigint").alias("doc_id"),
            (F.col("cid") % 10000).cast("bigint").alias("chunk_id"),
            "cosine",
        )
    )


# Deterministic PII augmentation shared by the Spark query and the oracle:
# the synthetic corpus contains no PII, so each doc gets one email, one
# phone, and one IPv4 derived from doc_id — making redaction observable
# and parity-checkable.
_PII_AUG_SPARK = (
    "concat(text, ' contact user', doc_id, '@example.com or 555-123-4567 "
    "at 192.168.1.', doc_id % 256)"
)
_PII_EMAIL_SQL = "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'"
_PII_PHONE_SQL = r"'\b\d{3}[-.]\d{3}[-.]\d{4}\b'"
_PII_IPV4_SQL = r"'\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'"


@query(
    "pii_redact",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         concat(text, ' contact user', doc_id, '@example.com or '
                || '555-123-4567 at 192.168.1.', doc_id % 256) AS t
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(t, {_PII_EMAIL_SQL})) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, {_PII_PHONE_SQL})) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t, {_PII_IPV4_SQL})) AS BIGINT) AS n_ipv4,
       regexp_replace(
         regexp_replace(
           regexp_replace(t, {_PII_EMAIL_SQL}, '[EMAIL]', 'g'),
           {_PII_PHONE_SQL}, '[PHONE]', 'g'),
         {_PII_IPV4_SQL}, '[IPV4]', 'g') AS redacted
FROM aug""",
    doc="PII scrub for training corpora: count + redact emails / phones / "
    "IPv4s with a fixed regexp_replace chain — pure codegen'd column "
    "expressions; patterns chosen to agree between Java regex and RE2.",
    survey_ids=("M7-T6",),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "t", F.expr(_PII_AUG_SPARK)
    )
    counts = TX.pii_counts(F.col("t"))
    return d.select(
        N.big("doc_id").alias("doc_id"),
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
        TX.pii_redact(F.col("t")).alias("redacted"),
    )


@query(
    "repetition_scores",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents
), pw AS (
  SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(sum(c) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_distinct_words,
       round(1.0 - CAST(count(*) AS DOUBLE) / sum(c), 4) AS dup_word_ratio,
       round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_word_share
FROM pw GROUP BY doc_id""",
    doc="Within-document repetition (boilerplate / keyword-stuffing "
    "signal): explode -> two-level aggregate, partial agg shrinks both "
    "levels — never an O(n^2) per-row array scan.",
    survey_ids=("M7-T7",),
)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    rep = TX.repetition_metrics(d)
    return rep.select(
        N.big("doc_id").alias("doc_id"),
        "n_words",
        "n_distinct_words",
        N.rnd("dup_word_ratio").alias("dup_word_ratio"),
        N.rnd("top_word_share").alias("top_word_share"),
    )


@query(
    "token_packing",
    oracle=f"""
WITH t AS (
  SELECT doc_id, doc_id % 64 AS shard,
         CAST(len({WORDS_SQL}) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(shard AS BIGINT) AS shard,
       n_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                  / 512.0) AS BIGINT) AS bin_id
FROM t""",
    doc="Sequence packing: assign docs to 512-token training bins with a "
    "per-shard (doc_id % 64) windowed running sum — packing parallelizes "
    "across shards instead of serializing on a global order "
    "(operators/text.py:pack_documents).",
    survey_ids=("M7-T8",),
)
def token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = TX.pack_documents(d, budget=512, shards=64)
    return out.select(
        N.big("doc_id").alias("doc_id"),
        N.big("shard").alias("shard"),
        "n_tokens",
        "bin_id",
    )


@query(
    "corpus_mix",
    oracle="""
WITH c AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
), m AS (
  SELECT min(n) AS mn FROM c
), r AS (
  SELECT lang, CAST(floor(1000.0 * mn / n) AS BIGINT) AS rate_millis
  FROM c, m
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
FROM documents d JOIN r ON d.lang = r.lang
WHERE d.doc_id % 1000 < r.rate_millis""",
    doc="Corpus mixing: rebalance languages by downsampling every lang to "
    "the smallest lang's count — per-lang rates (quantized to 1/1000) from "
    "a broadcast 2-row-per-lang rate table, rows kept by deterministic "
    "id-hash so the sample is reproducible and oracle-checkable.",
    survey_ids=("P12", "M7-T9"),
)
def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mn = counts.agg(F.min("n").alias("mn"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        "lang",
        F.floor(F.lit(1000.0) * F.col("mn") / F.col("n"))
        .cast("bigint")
        .alias("rate_millis"),
    )
    return (
        d.join(F.broadcast(rates), on="lang")
        .filter(F.col("doc_id") % 1000 < F.col("rate_millis"))
        .select(N.big("doc_id").alias("doc_id"), "lang")
    )


@query(
    "frame_sample",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(unnest(range(0,
              greatest(CAST(floor(octet_length(encode(text)) / 1000) AS INT), 1),
              10)) AS BIGINT) AS frame_idx
FROM documents""",
    doc="Video frame-sampling plumbing: every-Nth-frame (media_id, "
    "frame_idx) pairs generated executor-side with sequence+explode "
    "(frame count proxied from byte_len until a real demuxer exists — "
    "the sampled frames then feed decode_features). The blob itself is "
    "projected away before the explode: payloads never shuffle.",
    survey_ids=("M7-M4",),
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = MM.to_media_table(d, "doc_id", "text", "video")
    plan = MM.frame_sample_plan(media, every_n=10)
    return plan.select(
        N.big("media_id").alias("media_id"),
        N.big("frame_idx").alias("frame_idx"),
    )


@query(
    "image_resize_grid",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(64 + CAST(('0x' || substring(md5(text), 1, 2)) AS INT) % 192 AS BIGINT)
         AS width,
       CAST(64 + CAST(('0x' || substring(md5(text), 3, 2)) AS INT) % 192 AS BIGINT)
         AS height,
       array_to_string(list_transform(range(0, 16), k ->
         printf('%.6f', round(CAST(('0x' || substring(
           md5(text || '-' || CAST(k // 4 AS VARCHAR)
                     || '-' || CAST(k % 4 AS VARCHAR)), 1, 4)) AS INT)
           / 6.5535e4, 6))), ',') AS grid
FROM documents""",
    doc="Multimodal resize plumbing: Arrow-batched mapInPandas emits a "
    "fixed 4x4 box-average grid per image — the thumbnail/patch step "
    "before a vision encoder. Decode is the documented md5 fake here "
    "(real path = stdlib PNG box-average, tested in test_multimodal); "
    "what this entry attests differentially is the full worker path and "
    "that only 16 doubles per image cross the Arrow boundary — the blob "
    "never leaves the scan.",
    survey_ids=("M7-M6",),
)
def image_resize_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = MM.to_media_table(d, "doc_id", "text", "image")
    out = MM.resize_features(media, grid_h=4, grid_w=4, use_real=False)
    return out.select(
        N.big("media_id").alias("media_id"),
        N.big("width").alias("width"),
        N.big("height").alias("height"),
        F.concat_ws(
            ",",
            F.transform(
                F.col("grid"),
                lambda v: F.format_string("%.6f", N.rnd(v, 6)),
            ),
        ).alias("grid"),
    )


# Static subword vocabulary for the tokenizer-apply entry: frequent
# English character n-grams + the single-letter fallback. Greedy
# longest-match tokenization falls out of regex alternation order
# (longest pieces first), which Java regex and RE2 both honor
# leftmost-first — verified identical across engines.
_WP_PIECES = sorted(
    [
        "the", "and", "ing", "ion", "tion", "ent", "ati", "for", "her",
        "ter", "hat", "tha", "ere", "ate", "his", "con", "res", "ver",
        "all", "ons", "nce", "men", "ith", "ted", "ers", "pro", "thi",
        "wit", "are", "ess", "not", "ive", "was", "ect", "rea", "com",
        "eve", "per", "int", "est", "sta", "sch", "que", "de", "le",
        "re", "un", "in", "er", "on", "at", "es", "en",
    ]
    + [chr(c) for c in range(ord("a"), ord("z") + 1)],
    key=lambda p: (-len(p), p),
)
_WP_PATTERN = "(" + "|".join(_WP_PIECES) + ")"


@query(
    "wordpiece_apply",
    oracle=f"""
WITH toks AS (
  SELECT lang,
         regexp_extract_all(lower(text), '{_WP_PATTERN}') AS pieces
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(pieces)) AS BIGINT) AS total_pieces,
       CAST(sum(length(array_to_string(pieces, ''))) AS BIGINT)
         AS covered_chars,
       round(CAST(sum(length(array_to_string(pieces, ''))) AS DOUBLE)
             / sum(len(pieces)), 4) AS chars_per_piece
FROM toks GROUP BY 1""",
    doc="Subword tokenizer APPLICATION (the inference-side sibling of "
    "bpe_pair_counts' trainer side): greedy longest-match against a "
    "fixed subword vocabulary, expressed as ONE regex alternation "
    "ordered longest-first — the greedy semantics fall out of "
    "leftmost-first alternation, which Java regex and RE2 execute "
    "identically (verified). Zero UDFs, zero shuffles before the "
    "per-language rollup; per-language piece counts and chars-per-"
    "piece measure vocabulary compression efficiency — the metric a "
    "tokenizer-training loop optimizes.",
    survey_ids=("M7-T18",),
)
def wordpiece_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out

    # the longest-first alternation regex is the heaviest per-row scan in
    # the text family — fan out or it runs on the input's single split
    d = fan_out(load_table(spark, sf_dir, "documents").select("lang", "text"))
    toks = d.select(
        "lang",
        F.expr(
            f"regexp_extract_all(lower(text), '{_WP_PATTERN}', 1)"
        ).alias("pieces"),
    )
    covered = F.length(F.concat_ws("", F.col("pieces")))
    agg = toks.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size("pieces")).cast("bigint").alias("total_pieces"),
        F.sum(covered).cast("bigint").alias("covered_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_pieces",
        "covered_chars",
        N.rnd(
            F.col("covered_chars").cast("double") / F.col("total_pieces")
        ).alias("chars_per_piece"),
    )


# ---------------------------------------------------------------------------
# quality_auc
# ---------------------------------------------------------------------------

_QUALITY_SQL = f"""
least(CAST(length(text) AS DOUBLE) / 5.0e2, 1.0e0) * 4.0e-1
  + least(({_profile_score_sql(TX.LANG_PROFILES['en'])}) / 3.0e-1, 1.0e0)
    * 3.0e-1
  + (1.0e0 - least(CASE WHEN length(text) = 0 THEN 0.0e0
                        ELSE CAST(len(regexp_extract_all(text, {PUNCT_RE_SQL}))
                        AS DOUBLE) / length(text) * 5 END, 1.0e0)) * 3.0e-1
"""


@query(
    "quality_auc",
    oracle=f"""
WITH scored AS (
  SELECT lang, {N.sql_cents(_QUALITY_SQL, 1000000)} AS s6 FROM documents
), bins AS (
  SELECT s6, CAST(count(*) AS BIGINT) AS m,
         coalesce(sum(count(*)) OVER (ORDER BY s6
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cb
  FROM scored GROUP BY s6
), per_lang AS (
  SELECT s6, lang, CAST(count(*) AS BIGINT) AS ml
  FROM scored GROUP BY s6, lang
), sums AS (
  SELECT p.lang,
         CAST(sum(p.ml) AS BIGINT) AS n_pos,
         CAST(sum(CAST(p.ml AS HUGEINT) * (2 * b.cb + b.m + 1))
              AS HUGEINT) AS su
  FROM per_lang p JOIN bins b USING (s6)
  GROUP BY p.lang
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM scored
)
SELECT s.lang,
       s.n_pos,
       t.n - s.n_pos AS n_neg,
       round(CAST(s.su - CAST(s.n_pos AS HUGEINT) * (s.n_pos + 1)
                  AS DOUBLE)
             / (2.0 * s.n_pos * (t.n - s.n_pos)), 6) AS auc
FROM sums s CROSS JOIN tot t
WHERE s.n_pos > 0 AND s.n_pos < t.n""",
    doc="One-vs-rest ROC-AUC of the composite quality score per "
    "language, computed EXACTLY as the tie-corrected Mann-Whitney "
    "rank-sum — but from the score HISTOGRAM, not a global row sort: "
    "scores live on the 1e-6 integer grid, so the doubled midrank of "
    "every doc in a bin is 2*cum_before + bin_count + 1, and "
    "AUC = (sum_pos(u) - nP(nP+1)) / (2*nP*nN) is pure integer "
    "arithmetic with one double division at render. AUC ~ 0.5 means "
    "the quality filter is language-neutral; a skewed AUC means the "
    "filter systematically down-ranks a language — the fairness "
    "audit a multilingual curation pipeline owes its corpus. Plan: "
    "the corpus is scanned and scored EXACTLY ONCE — one fanned-out "
    "scoring pass (pre-projected word array, so the interpreted "
    "higher-order stopword filter tokenizes once) aggregates straight "
    "onto the (s6, lang) grid and is checkpointed; the volume bins, "
    "the cumulative window (grid-bounded at 1e6+1 rows by "
    "construction, never by corpus size), the per-language rank sums "
    "and the global total are all derived from that bounded grid — "
    "the classic sort-free distributed AUC.",
    survey_ids=("M7-ML11",),
)
def quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from project_bigdata_spark.operators.dedup import fan_out, words_col

    d = fan_out(load_table(spark, sf_dir, "documents").select("lang", "text"))
    ws = d.select("lang", "text", words_col(F.col("text")).alias("_ws"))
    scored = ws.select(
        "lang",
        N.cents(
            TX.quality_score(F.col("text"), ws=F.col("_ws")),
            scale=1_000_000,
        ).alias("s6"),
    )
    # the ONLY corpus-wide pass: volume per (score-bin, lang); everything
    # below operates on this grid-bounded frame (pinned so the three
    # derivations don't re-scan the corpus)
    per_lang = (
        scored.groupBy("s6", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ml"))
        .localCheckpoint()
    )
    bins = (
        per_lang.groupBy("s6")
        .agg(F.sum("ml").cast("bigint").alias("m"))
        .withColumn(
            "cb",
            F.coalesce(
                F.sum("m").over(
                    Window.partitionBy()
                    .orderBy("s6")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    sums = (
        per_lang.join(F.broadcast(bins), "s6")
        .groupBy("lang")
        .agg(
            F.sum("ml").cast("bigint").alias("n_pos"),
            F.sum(
                F.col("ml").cast("decimal(38,0)")
                * (2 * F.col("cb") + F.col("m") + 1)
            ).alias("su"),
        )
    )
    tot = per_lang.agg(F.sum("ml").cast("bigint").alias("n"))
    return (
        sums.crossJoin(F.broadcast(tot))
        .filter((F.col("n_pos") > 0) & (F.col("n_pos") < F.col("n")))
        .select(
            "lang",
            "n_pos",
            (F.col("n") - F.col("n_pos")).alias("n_neg"),
            N.rnd(
                (
                    F.col("su")
                    - F.col("n_pos").cast("decimal(38,0)")
                    * (F.col("n_pos") + 1)
                ).cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n_pos")
                    * (F.col("n") - F.col("n_pos"))
                ),
                6,
            ).alias("auc"),
        )
    )


# ---------------------------------------------------------------------------
# readability_scores / luhn_pii_audit (round 7)
# ---------------------------------------------------------------------------

_SYL_RE = "[aeiouy]+"
_SENT_RE = "[.!?]+"


@query(
    "readability_scores",
    oracle=f"""
WITH per AS (
  SELECT lang,
         greatest(1, len({WORDS_SQL})) AS wn,
         greatest(1, len(regexp_extract_all(text, '{_SENT_RE}'))) AS sn,
         len(regexp_extract_all(lower(text), '{_SYL_RE}')) AS yn
  FROM documents
), sc AS (
  SELECT lang,
         {N.sql_cents("206.835 - 1.015 * (CAST(wn AS DOUBLE) / sn)"
                      " - 84.6 * (CAST(yn AS DOUBLE) / wn)", 10**6)} AS fl6,
         {N.sql_cents("0.39 * (CAST(wn AS DOUBLE) / sn)"
                      " + 11.8 * (CAST(yn AS DOUBLE) / wn) - 15.59",
                      10**6)} AS fk6
  FROM per
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(CAST(fl6 AS HUGEINT)) AS DOUBLE) / count(*) / 1e6, 4)
         AS avg_flesch,
       round(CAST(sum(CAST(fk6 AS HUGEINT)) AS DOUBLE) / count(*) / 1e6, 4)
         AS avg_fk_grade,
       round(CAST(min(fl6) AS DOUBLE) / 1e6, 6) AS min_flesch,
       round(CAST(max(fl6) AS DOUBLE) / 1e6, 6) AS max_flesch
FROM sc GROUP BY lang""",
    doc="Flesch reading-ease + Flesch-Kincaid grade per language — the "
    "classic text-quality curation features (syllables via the "
    "vowel-group heuristic len(regexp('[aeiouy]+')), sentences via "
    "terminal-punctuation runs, both denominators floored at 1). "
    "Per-doc scores snap to the 1e-6 grid before the per-language "
    "mean, so the cross-row sum is an exact integer (snap-then-sum) "
    "and the averages render identically cross-engine. Plan: one "
    "narrow regex pass over the corpus, one #langs-row aggregate; "
    "zero UDFs.",
    survey_ids=("M7-T20",),
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    d = fan_out(load_table(spark, sf_dir, "documents").select("lang", "text"))
    wn = F.greatest(F.lit(1), F.size(words_col(F.col("text"))))
    sn = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_SENT_RE), F.lit(0))),
    )
    yn = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(_SYL_RE), F.lit(0))
    )
    wps = wn.cast("double") / sn
    ypw = yn.cast("double") / wn
    fl6 = N.cents(
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * ypw, 10**6
    )
    fk6 = N.cents(
        F.lit(0.39) * wps + F.lit(11.8) * ypw - F.lit(15.59), 10**6
    )
    sc = d.select("lang", fl6.alias("fl6"), fk6.alias("fk6"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return sc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        N.rnd(
            F.sum(dec(F.col("fl6"))).cast("double")
            / F.count(F.lit(1))
            / F.lit(1e6),
            4,
        ).alias("avg_flesch"),
        N.rnd(
            F.sum(dec(F.col("fk6"))).cast("double")
            / F.count(F.lit(1))
            / F.lit(1e6),
            4,
        ).alias("avg_fk_grade"),
        N.rnd(F.min("fl6").cast("double") / F.lit(1e6), 6).alias("min_flesch"),
        N.rnd(F.max("fl6").cast("double") / F.lit(1e6), 6).alias("max_flesch"),
    )


_PAN_RE = "[0-9]{13,16}"
# Luhn double-with-cap term over a reversed digit list; ``odd`` picks which
# 0-based reversed index doubles (pan-without-check: even; full PAN: odd)
_LUHN_SQL = (
    "list_sum(list_transform(list_reverse(regexp_extract_all({s}, '[0-9]')),"
    " (x, i) -> CASE WHEN (i - 1) % 2 = {dbl}"
    " THEN CASE WHEN CAST(x AS INT) * 2 > 9 THEN CAST(x AS INT) * 2 - 9"
    " ELSE CAST(x AS INT) * 2 END"
    " ELSE CAST(x AS INT) END))"
)


@query(
    "luhn_pii_audit",
    oracle=f"""
WITH seeded AS (
  SELECT lang,
         text || ' card ' || pan15 ||
         CAST(CASE WHEN doc_id % 2 = 0 THEN chk
                   ELSE (chk + 1) % 10 END AS VARCHAR) AS t
  FROM (
    SELECT doc_id, lang, text, pan15,
           (10 - ({_LUHN_SQL.format(s="pan15", dbl=0)} % 10)) % 10 AS chk
    FROM (SELECT doc_id, lang, text,
                 lpad(CAST((doc_id * 7919) % 100000000000000 AS VARCHAR),
                      15, '0') AS pan15
          FROM documents)
  )
), per AS (
  SELECT lang,
         len(regexp_extract_all(t, '{_PAN_RE}')) AS n_cand,
         list_sum(list_transform(regexp_extract_all(t, '{_PAN_RE}'),
           c -> CASE WHEN {_LUHN_SQL.format(s="c", dbl=1)} % 10 = 0
                     THEN 1 ELSE 0 END)) AS n_valid,
         len(regexp_extract_all(
               regexp_replace(t, '{_PAN_RE}', '[PAN]', 'g'),
               '{_PAN_RE}')) AS n_resid
  FROM seeded
)
SELECT lang,
       CAST(sum(n_cand) AS BIGINT) AS n_candidates,
       CAST(sum(n_valid) AS BIGINT) AS n_luhn_valid,
       CAST(sum(n_cand - n_valid) AS BIGINT) AS n_luhn_invalid,
       CAST(sum(n_resid) AS BIGINT) AS n_residual_after_scrub
FROM per GROUP BY lang""",
    doc="Luhn-checksum payment-card PII audit — the checksum-validated "
    "tier above pii_redact's pattern tier (a 13-16 digit run is only "
    "reportable PII if its Luhn check passes; raw digit-run counts "
    "over-report). The fixture has no card numbers, so each doc is "
    "seeded in-query with a deterministic 16-digit PAN whose check "
    "digit is made VALID for even doc_ids and broken for odd ones "
    "(the csv_malformed_audit discipline) — the audit must recover "
    "exactly that split per language, plus prove the scrub regex "
    "leaves zero residual candidates. The Luhn fold is a "
    "higher-order-function reduce over the reversed digit list "
    "(double-and-cap at odd reversed positions) on BOTH engines — "
    "zero UDFs, zero explodes; counts per doc stay in-array via "
    "nested lambdas. Plan: one regex+fold pass, one #langs-row "
    "aggregate.",
    survey_ids=("M7-T19",),
)
def luhn_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out

    d = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )

    def luhn_sum(s: F.Column, dbl: int) -> F.Column:
        rev = F.reverse(F.regexp_extract_all(s, F.lit("[0-9]"), F.lit(0)))
        terms = F.transform(
            rev,
            lambda x, i: F.when(
                i % 2 == F.lit(dbl),
                F.when(
                    x.cast("int") * 2 > 9, x.cast("int") * 2 - 9
                ).otherwise(x.cast("int") * 2),
            ).otherwise(x.cast("int")),
        )
        return F.aggregate(terms, F.lit(0), lambda a, b: a + b)

    pan15 = F.lpad(
        ((F.col("doc_id") * 7919) % F.lit(10**14)).cast("string"), 15, "0"
    )
    chk = (F.lit(10) - (luhn_sum(pan15, 0) % 10)) % 10
    digit = F.when(F.col("doc_id") % 2 == 0, chk).otherwise((chk + 1) % 10)
    seeded = F.concat(
        F.col("text"), F.lit(" card "), pan15, digit.cast("string")
    )
    cands = F.regexp_extract_all(seeded, F.lit(_PAN_RE), F.lit(0))
    n_valid = F.aggregate(
        F.transform(
            cands,
            lambda c: F.when(luhn_sum(c, 1) % 10 == 0, F.lit(1)).otherwise(
                F.lit(0)
            ),
        ),
        F.lit(0),
        lambda a, b: a + b,
    )
    n_resid = F.size(
        F.regexp_extract_all(
            F.regexp_replace(seeded, _PAN_RE, "[PAN]"),
            F.lit(_PAN_RE),
            F.lit(0),
        )
    )
    per = d.select(
        "lang",
        F.size(cands).alias("n_cand"),
        n_valid.alias("n_valid"),
        n_resid.alias("n_resid"),
    )
    return per.groupBy("lang").agg(
        F.sum("n_cand").cast("bigint").alias("n_candidates"),
        F.sum("n_valid").cast("bigint").alias("n_luhn_valid"),
        F.sum(F.col("n_cand") - F.col("n_valid"))
        .cast("bigint")
        .alias("n_luhn_invalid"),
        F.sum("n_resid").cast("bigint").alias("n_residual_after_scrub"),
    )


# ---------------------------------------------------------------------------
# gopher_quality_gates (round 8)
# ---------------------------------------------------------------------------

# Gopher's 8 required stopwords plus "a" (the Dolma/RedPajama-style
# variant of the same gate) — with the paper's exact list this corpus
# contains only one member ("the"), so the >=2-distinct rule would be
# vacuously false everywhere; the widened list keeps it a real gate.
_GOPHER_STOP = ["the", "a", "be", "to", "of", "and", "that", "have", "with"]
_GOPHER_STOP_SQL = ", ".join(f"'{w}'" for w in _GOPHER_STOP)


@query(
    "gopher_quality_gates",
    oracle=f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, text, {WORDS_SQL} AS ws FROM documents
), w AS (
  SELECT doc_id,
         count(*) AS n_words,
         sum(length(w)) AS sum_len,
         count(*) FILTER (regexp_matches(w, '[a-z]')) AS n_alpha,
         count(DISTINCT CASE WHEN w IN ({_GOPHER_STOP_SQL}) THEN w END)
           AS n_stop
  FROM (SELECT doc_id, unnest(ws) AS w FROM d)
  GROUP BY doc_id
), t AS (
  SELECT doc_id,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) // 3 AS n_ellip,
         string_split(text, chr(10)) AS lines
  FROM d
), l AS (
  SELECT doc_id,
         len(lines) AS n_lines,
         len(list_filter(lines, x -> x LIKE '-%' OR x LIKE '*%'))
           AS n_bullet,
         len(list_filter(lines, x -> x LIKE '%...')) AS n_ellip_end
  FROM t
), bits AS (
  SELECT w.doc_id,
         CASE WHEN w.n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
           AS r_word_count,
         CASE WHEN 3 * w.n_words <= w.sum_len
                   AND w.sum_len <= 10 * w.n_words THEN 1 ELSE 0 END
           AS r_mean_word_len,
         CASE WHEN 10 * (t.n_hash + t.n_ellip) < w.n_words THEN 1 ELSE 0 END
           AS r_symbol_ratio,
         CASE WHEN 10 * l.n_bullet <= 9 * l.n_lines THEN 1 ELSE 0 END
           AS r_bullet_lines,
         CASE WHEN 10 * l.n_ellip_end < 3 * l.n_lines THEN 1 ELSE 0 END
           AS r_ellipsis_lines,
         CASE WHEN 5 * w.n_alpha >= 4 * w.n_words THEN 1 ELSE 0 END
           AS r_alpha_words,
         CASE WHEN w.n_stop >= 2 THEN 1 ELSE 0 END AS r_stopwords
  FROM w JOIN t USING (doc_id) JOIN l USING (doc_id)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(r_word_count AS BIGINT) AS r_word_count,
       CAST(r_mean_word_len AS BIGINT) AS r_mean_word_len,
       CAST(r_symbol_ratio AS BIGINT) AS r_symbol_ratio,
       CAST(r_bullet_lines AS BIGINT) AS r_bullet_lines,
       CAST(r_ellipsis_lines AS BIGINT) AS r_ellipsis_lines,
       CAST(r_alpha_words AS BIGINT) AS r_alpha_words,
       CAST(r_stopwords AS BIGINT) AS r_stopwords,
       CAST(r_word_count + r_mean_word_len + r_symbol_ratio + r_bullet_lines
            + r_ellipsis_lines + r_alpha_words + r_stopwords AS BIGINT)
         AS n_rules_passed,
       CAST(CASE WHEN r_word_count + r_mean_word_len + r_symbol_ratio
                      + r_bullet_lines + r_ellipsis_lines + r_alpha_words
                      + r_stopwords = 7 THEN 1 ELSE 0 END AS BIGINT)
         AS pass_all
FROM bits""",
    doc="The Gopher quality gates (Rae et al. 2021 §A1.1, public — the "
    "hard pass/fail filter bundle most later corpora reuse), per doc: "
    "word count in [50, 1e5]; mean word length in [3, 10]; symbol-to-"
    "word ratio (# / ellipsis) < 0.1; <= 90% bullet-start lines; < 30% "
    "ellipsis-end lines; >= 80% words containing an alphabetic char; "
    ">= 2 distinct required stopwords. The hard-gate complement of the "
    "composite quality_scores ranker — the paper applies these as "
    "binary REMOVE decisions before any scoring. Every threshold is an "
    "exact integer cross-multiplication (3n <= sumlen <= 10n, "
    "5*alpha >= 4*n, ...) — no float ratio ever materializes, so the "
    "bits are engine-identical by construction. One explode + one "
    "map-side-combining groupBy for the word stats; doc-level string "
    "census stays in the scan projection; the join back is "
    "doc_id-keyed. At 100 TB: two narrow passes, zero UDFs, zero "
    "floats.",
    survey_ids=("M7-T22",),
)
def gopher_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    d = fan_out(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", words_col(F.col("text")).alias("_ws")
        )
    )
    w = (
        d.select("doc_id", F.explode("_ws").alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("sum_len"),
            F.count(F.when(F.col("w").rlike("[a-z]"), 1)).alias("n_alpha"),
            F.count_distinct(
                F.when(F.col("w").isin(_GOPHER_STOP), F.col("w"))
            ).alias("n_stop"),
        )
    )
    t = d.select(
        "doc_id",
        (F.length("text") - F.length(F.replace("text", F.lit("#"), F.lit("")))).alias(
            "n_hash"
        ),
        (
            (F.length("text") - F.length(F.replace("text", F.lit("..."), F.lit(""))))
            / 3
        )
        .cast("bigint")
        .alias("n_ellip"),
        F.split("text", "\n", -1).alias("lines"),
    ).select(
        "doc_id",
        "n_hash",
        "n_ellip",
        F.size("lines").alias("n_lines"),
        F.size(
            F.filter(
                F.col("lines"),
                lambda x: x.startswith("-") | x.startswith("*"),
            )
        ).alias("n_bullet"),
        F.size(F.filter(F.col("lines"), lambda x: x.endswith("..."))).alias(
            "n_ellip_end"
        ),
    )
    bits = w.join(t, "doc_id").select(
        "doc_id",
        F.when(F.col("n_words").between(50, 100000), 1).otherwise(0).alias(
            "r_word_count"
        ),
        F.when(
            (3 * F.col("n_words") <= F.col("sum_len"))
            & (F.col("sum_len") <= 10 * F.col("n_words")),
            1,
        )
        .otherwise(0)
        .alias("r_mean_word_len"),
        F.when(10 * (F.col("n_hash") + F.col("n_ellip")) < F.col("n_words"), 1)
        .otherwise(0)
        .alias("r_symbol_ratio"),
        F.when(10 * F.col("n_bullet") <= 9 * F.col("n_lines"), 1)
        .otherwise(0)
        .alias("r_bullet_lines"),
        F.when(10 * F.col("n_ellip_end") < 3 * F.col("n_lines"), 1)
        .otherwise(0)
        .alias("r_ellipsis_lines"),
        F.when(5 * F.col("n_alpha") >= 4 * F.col("n_words"), 1)
        .otherwise(0)
        .alias("r_alpha_words"),
        F.when(F.col("n_stop") >= 2, 1).otherwise(0).alias("r_stopwords"),
    )
    total = (
        F.col("r_word_count")
        + F.col("r_mean_word_len")
        + F.col("r_symbol_ratio")
        + F.col("r_bullet_lines")
        + F.col("r_ellipsis_lines")
        + F.col("r_alpha_words")
        + F.col("r_stopwords")
    )
    return bits.select(
        N.big("doc_id").alias("doc_id"),
        *[
            N.big(c).alias(c)
            for c in [
                "r_word_count",
                "r_mean_word_len",
                "r_symbol_ratio",
                "r_bullet_lines",
                "r_ellipsis_lines",
                "r_alpha_words",
                "r_stopwords",
            ]
        ],
        N.big(total).alias("n_rules_passed"),
        N.big(F.when(total == 7, 1).otherwise(0)).alias("pass_all"),
    )


# ---------------------------------------------------------------------------
# char_entropy_compression (round 8, fourth wave) — order-0 character
# entropy as the SQL-expressible analog of the zlib compression-ratio
# quality filter (MassiveText/RefinedWeb practice)
# ---------------------------------------------------------------------------

_CEC_TERM = "-(c / (n * 1.0e0)) * log2(c / (n * 1.0e0))"


@query(
    "char_entropy_compression",
    oracle=f"""
WITH chars AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, ''),
                                    x -> x <> '')) AS ch
  FROM documents
), cc AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
  FROM chars GROUP BY 1, 2
), per AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM cc GROUP BY doc_id
), h AS (
  SELECT cc.doc_id,
         CAST(sum({N.sql_cents(_CEC_TERM, 10**9)}) AS BIGINT) AS h9
  FROM cc JOIN per USING (doc_id)
  GROUP BY cc.doc_id
)
SELECT CAST(per.doc_id AS BIGINT) AS doc_id,
       per.n AS n_chars_total,
       per.n_distinct,
       {N.sql_rnd('h.h9 / 1.0e9', 6)} AS entropy_bits,
       {N.sql_rnd('h.h9 / 8.0e9', 6)} AS compression_bound,
       CAST(CASE WHEN h.h9 < 3000000000 THEN 1 ELSE 0 END AS BIGINT)
         AS low_entropy
FROM per JOIN h USING (doc_id)""",
    doc="Order-0 character entropy per document (bits/char) and the "
    "implied best-case compression bound H/8 — the SQL-expressible "
    "analog of the zlib compression-ratio filter MassiveText/"
    "RefinedWeb-style pipelines use to drop repetitive or templated "
    "text (a doc that compresses too well is usually boilerplate; one "
    "that doesn't compress at all is usually binary junk). Each "
    "entropy term -(p)log2(p) is computed from exact integer char "
    "counts, snapped to the 1e-9 grid and integer-summed "
    "(snap-then-sum), and the low-entropy flag is an integer "
    "comparison on the grid (H < 3 bits). Plan: one char explode -> "
    "(doc, char) counts -> per-doc rollup, all map-side combined; the "
    "alphabet bounds the per-doc state (<= |charset| rows), so at "
    "100 TB this is two narrow passes with no payload shuffle beyond "
    "the (doc_id, char, count) triples.",
    survey_ids=("M7-T27",),
)
def char_entropy_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out

    d = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    chars = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", ""), lambda x: x != F.lit(""))
        ).alias("ch"),
    )
    cc = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per = cc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    h = (
        cc.join(per, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr(N.sql_cents(_CEC_TERM, 10**9)))
            .cast("bigint")
            .alias("h9")
        )
    )
    return per.join(h, "doc_id").select(
        N.big("doc_id").alias("doc_id"),
        F.col("n").alias("n_chars_total"),
        "n_distinct",
        F.expr(N.sql_rnd("h9 / 1.0e9", 6)).alias("entropy_bits"),
        F.expr(N.sql_rnd("h9 / 8.0e9", 6)).alias("compression_bound"),
        (F.col("h9") < 3000000000).cast("bigint").alias("low_entropy"),
    )


# ---------------------------------------------------------------------------
# textrank_keywords (round 9) — TextRank keyword extraction: the
# integer-PageRank discipline applied to the word co-occurrence graph
# ---------------------------------------------------------------------------


@query(
    "textrank_keywords",
    oracle=f"""
WITH w AS MATERIALIZED (
  SELECT doc_id, {WORDS_SQL} AS ws FROM documents
), adj AS (
  SELECT least(ws[i], ws[i + 1]) AS a, greatest(ws[i], ws[i + 1]) AS b
  FROM w, unnest(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
), pairs AS (
  SELECT a, b FROM adj WHERE a <> b GROUP BY a, b HAVING count(*) >= 2
), edges AS (
  SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs
), deg AS (
  SELECT src AS n, CAST(count(*) AS BIGINT) AS outdeg
  FROM edges GROUP BY 1
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
pr0d AS (
  SELECT d.n, CAST(1000000000000 // n.n_nodes AS BIGINT) AS units,
         d.outdeg
  FROM deg d CROSS JOIN nn n
),
{_PR_ITER_SQL.format(i=1, j="0d")},
{_PR_ITER_SQL.format(i=2, j="1d")},
{_PR_ITER_SQL.format(i=3, j="2d")}
SELECT n AS keyword, CAST(units AS BIGINT) AS pr_units
FROM pr3d
QUALIFY row_number() OVER (ORDER BY units DESC, n) <= 20""",
    doc="TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank "
    "over the word co-occurrence graph — nodes are corpus words, "
    "undirected edges link ADJACENT word pairs seen at least twice "
    "(the window-2 TextRank graph), 3 power iterations, top-20 words "
    "by rank. Reuses pagerank_parts' exact-integer discipline "
    "verbatim (oracle shares its iteration CTE template): ranks live "
    "in integer micro-units, every update is BIGINT `div`, so the "
    "fixpoint is order-free and bit-identical cross-engine. The "
    "graph is VOCABULARY-bounded — at 100 TB the corpus pass emits "
    "(word, word) pairs that collapse to ≤|V|² edge counts in one "
    "map-side-combined aggregate, and the iterations never touch the "
    "corpus again; the adjacent-pair projection is one narrow pass.",
    survey_ids=("M7-T24",),
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import words_col

    d = load_table(spark, sf_dir, "documents")
    ws = d.select(words_col(F.col("text")).alias("_ws")).filter(
        F.size("_ws") >= 2
    )
    adj = ws.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(_ws) - 2),"
                " i -> struct(least(_ws[i], _ws[i + 1]) AS a,"
                "             greatest(_ws[i], _ws[i + 1]) AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    pairs = (
        adj.filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("a", "b")
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint(eager=True)
    deg = edges.groupBy(F.col("src").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    nn = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    base_col = F.expr("(15 * 1000000000000) div (100 * n_nodes)")
    init_col = F.expr("1000000000000 div n_nodes")
    pr = deg.crossJoin(F.broadcast(nn)).select(
        "n", init_col.cast("bigint").alias("units"), "outdeg"
    )
    for _ in range(3):
        contrib = (
            edges.join(
                pr.select(F.col("n").alias("src"), "units", "outdeg"),
                "src",
            )
            .select(
                F.col("dst").alias("n"),
                F.expr("units div outdeg").alias("c"),
            )
            .groupBy("n")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            deg.join(contrib, "n", "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "n",
                (base_col + F.expr("(85 * coalesce(s, 0)) div 100"))
                .cast("bigint")
                .alias("units"),
                "outdeg",
            )
        )
    return (
        pr.orderBy(F.col("units").desc(), "n")
        .limit(20)
        .select(
            F.col("n").alias("keyword"), N.big("units").alias("pr_units")
        )
    )


# ---------------------------------------------------------------------------
# udtf_trigram_spans (round 10) — the PySpark-4 Python UDTF extension
# surface, next to the attested DataSource connector (sources/pysource.py)
# ---------------------------------------------------------------------------

try:  # pyspark >= 3.5 only; the catalog stays importable without it
    from pyspark.sql.functions import udtf as _udtf

    @_udtf(
        returnType="span_idx bigint, start_char bigint, span string",
        useArrow=True,
    )
    class _TrigramSpansUDTF:
        """Word-trigram span extractor: one input doc → one output row
        per trigram with its 1-based index and 0-based char offset.
        Arrow-optimized (compiles to ArrowEvalPythonUDTF, never the
        pickled row-at-a-time BatchEvalPython node)."""

        def eval(self, text):  # noqa: ANN001 — signature fixed by the API
            if text is None:  # mirror the oracle: a NULL doc emits no rows
                return
            words = text.split(" ")
            pos = 0
            for i in range(len(words) - 2):
                yield i + 1, pos, " ".join(words[i : i + 3])
                pos += len(words[i]) + 1

except ImportError:  # pragma: no cover
    _TrigramSpansUDTF = None


@query(
    "udtf_trigram_spans",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), tok AS (
  SELECT doc_id, unnest(ws) AS wd, generate_subscripts(ws, 1) AS i,
         len(ws) AS n
  FROM w
), off AS (
  SELECT doc_id, wd, i, n,
         CAST(coalesce(sum(length(wd) + 1) OVER (
            PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start_char
  FROM tok
), tri AS (
  SELECT doc_id, i AS span_idx, start_char, n,
         wd || ' ' || lead(wd, 1) OVER win || ' ' || lead(wd, 2) OVER win
           AS span
  FROM off WINDOW win AS (PARTITION BY doc_id ORDER BY i)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CAST(('0x' || substring(md5(span || ':' ||
            CAST(start_char AS VARCHAR)), 1, 8)) AS BIGINT)) AS BIGINT)
         AS span_sig,
       CAST(max(start_char) AS BIGINT) AS last_start
FROM tri WHERE span_idx <= n - 2
GROUP BY 1""",
    doc="Python UDTF seam (PySpark-4 @udtf, arrow-optimized): a "
    "word-trigram span extractor emitting MULTIPLE rows per document "
    "(span index, 0-based char offset, span text) via a LATERAL table "
    "function — the one PySpark-4 Python extension surface the catalog "
    "lacked next to the DataSource connector (python_source_stats "
    "discipline: the oracle regenerates every span in SQL; the 32-bit "
    "md5 span signature summed per doc pins every span's exact text "
    "AND offset without shipping 30k span rows to the compare). WHEN "
    "a UDTF earns its place: the per-row expansion needs imperative "
    "Python state or an external library per emitted row — here the "
    "running char offset threads through the yield loop naturally. "
    "When it does NOT: this exact op is also expressible as "
    "posexplode(split(text,' ')) + window leads (the oracle proves "
    "it), and the built-in stays fully inside codegen — so prefer "
    "explode/HOF whenever the expansion is a pure function of array "
    "slots; reach for @udtf(useArrow=True) only past that line, and "
    "never the default pickled UDTF (ArrowEvalPythonUDTF batches via "
    "Arrow like mapInPandas; BatchEvalPythonUDTF would pay per-row "
    "pickling). Scale: the UDTF maps partition-parallel with no "
    "shuffle before it; the per-doc aggregate shuffles doc_id keys "
    "once — emitted spans never cross documents.",
    survey_ids=("M7-X1",),
)
def udtf_trigram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    if _TrigramSpansUDTF is None:  # pragma: no cover
        raise RuntimeError("pyspark.sql.functions.udtf unavailable")
    spark.udtf.register("trigram_spans", _TrigramSpansUDTF)
    d = load_table(spark, sf_dir, "documents")
    d.select("doc_id", "text").createOrReplaceTempView("udtf_spans_docs")
    spans = spark.sql(
        "SELECT d.doc_id, s.span_idx, s.start_char, s.span "
        "FROM udtf_spans_docs d, LATERAL trigram_spans(d.text) s"
    )
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", "span", "start_char")), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("span_sig"),
        F.max("start_char").cast("bigint").alias("last_start"),
    )
