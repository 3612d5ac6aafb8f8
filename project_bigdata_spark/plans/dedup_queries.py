"""Dedup catalog entries over the ``documents`` table (north-star M7).

Every query here is deterministic (md5-based hashing) and carries a full
DuckDB oracle: the shingle -> minhash -> band -> bucket-join pipeline is
replayed in SQL, so the driver's differential gate covers the whole LSH
construction, not just the final counts. Shared constants come from
:mod:`project_bigdata_spark.operators.dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_spark.operators import dedup as DD
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table

# ---- shared SQL fragments (mirror operators/dedup.py exactly) ----

WORDS_SQL = r"list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')"

SHINGLES_SQL = f"""
CASE WHEN len({WORDS_SQL}) >= {DD.SHINGLE_WORDS}
     THEN list_transform(range(1, len({WORDS_SQL}) - 1),
            i -> concat_ws(' ', {WORDS_SQL}[i], {WORDS_SQL}[i+1], {WORDS_SQL}[i+2]))
     ELSE [lower(text)] END"""


# Sliced wide hashes, mirroring minhash_signatures: md5 once per
# (shingle, group), four 8-hex (32-bit) signature components per digest.
_H_COLS = ",\n         ".join(
    f"list_transform(shingles, s -> md5(concat('{g}:', s))) AS h_{g}"
    for g in range(DD.HASH_GROUPS)
)


def _sig_sql(i: int) -> str:
    g, j = divmod(i, DD.SLICES_PER_MD5)
    start = 1 + DD.SIG_PREFIX * j
    return (
        f"list_aggregate(list_transform(h_{g}, "
        f"x -> substring(x, {start}, {DD.SIG_PREFIX})), 'min')"
    )


_SIG_COLS = ",\n         ".join(f"{_sig_sql(i)} AS sig_{i}" for i in range(DD.NUM_HASHES))

_BAND_KEYS = ", ".join(
    f"concat_ws('|', '{b}', sig_{b * DD.BAND_ROWS}, sig_{b * DD.BAND_ROWS + 1})"
    for b in range(DD.NUM_HASHES // DD.BAND_ROWS)
)

# MATERIALIZED: each CTE is referenced 2-3 times downstream; without the
# hint DuckDB re-inlines (re-evaluating the md5 x shingles work per
# reference), tripling oracle wall-clock in the driver's gate.
MINHASH_BASE_CTES = f"""
sh AS MATERIALIZED (
  SELECT doc_id, {SHINGLES_SQL} AS shingles FROM documents
),
hs AS MATERIALIZED (
  SELECT doc_id, shingles,
         {_H_COLS}
  FROM sh
),
sigs AS MATERIALIZED (
  SELECT doc_id, shingles,
         {_SIG_COLS}
  FROM hs
),
bands AS (
  SELECT doc_id, unnest([{_BAND_KEYS}]) AS band_key FROM sigs
)"""

MINHASH_CTES = (
    MINHASH_BASE_CTES
    + """,
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band_key)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""
)

# Exact-Jaccard between two shingle arrays (mirrors jaccard_verify).
_JACCARD_SQL = """CAST(len(list_intersect(list_distinct(sa.shingles),
                              list_distinct(sb.shingles))) AS DOUBLE)
      / len(list_distinct(list_concat(sa.shingles, sb.shingles)))"""


@query(
    "dedup_exact",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(min(doc_id) OVER (PARTITION BY md5(text)) AS BIGINT) AS canonical_id,
       CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS dup_group_size
FROM documents""",
    doc="Exact dedup: md5-digest groups, min-id canonical survivor. Only "
    "the 16-byte digest shuffles, never the text.",
    survey_ids=("M7-D1",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = DD.exact_dedup_groups(d, "doc_id", "text")
    return out.select(
        N.big("doc_id").alias("doc_id"),
        N.big("canonical_id").alias("canonical_id"),
        N.big("dup_group_size").alias("dup_group_size"),
    )


@query(
    "dedup_bow_fingerprint",
    oracle=f"""
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct({WORDS_SQL})), ' ')) AS bow
  FROM documents
)
SELECT bow, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS canonical_id
FROM fp GROUP BY bow""",
    doc="Bag-of-words fingerprint dedup: order/whitespace-insensitive "
    "digest groups (catches word-permuted copies).",
    survey_ids=("M7-D2",),
)
def dedup_bow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", DD.bow_fingerprint(F.col("text")).alias("bow"))
    return fp.groupBy("bow").agg(
        F.count(F.lit(1)).alias("n_docs"),
        N.big(F.min("doc_id")).alias("canonical_id"),
    )


@query(
    "minhash_signatures",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {SHINGLES_SQL} AS shingles FROM documents
),
hs AS (
  SELECT doc_id, shingles,
         {_H_COLS}
  FROM sh
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(shingles) AS BIGINT) AS n_shingles,
       concat_ws(',', {", ".join(_sig_sql(i) for i in range(DD.NUM_HASHES))}) AS sig
FROM hs""",
    doc="MinHash signatures: 8 components per doc from SLICED md5s — two "
    "md5 calls per 3-word shingle, each digest split into four 32-bit "
    "slices — one narrow pass, no shuffle.",
    survey_ids=("M7-D3",),
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(d, "doc_id", "text")
    return sigs.select(
        N.big("doc_id").alias("doc_id"),
        F.size("shingles").cast("bigint").alias("n_shingles"),
        F.concat_ws(",", "sig").alias("sig"),
    )


@query(
    "minhash_near_dups",
    oracle="WITH"
    + MINHASH_CTES
    + """
SELECT CAST(p.id_a AS BIGINT) AS id_a, CAST(p.id_b AS BIGINT) AS id_b,
       round(CAST(len(list_intersect(list_distinct(sa.shingles),
                                     list_distinct(sb.shingles))) AS DOUBLE)
             / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4)
         AS jaccard
FROM pairs p
JOIN sh sa ON p.id_a = sa.doc_id
JOIN sh sb ON p.id_b = sb.doc_id
WHERE CAST(len(list_intersect(list_distinct(sa.shingles),
                              list_distinct(sb.shingles))) AS DOUBLE)
      / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.2""",
    doc="MinHash LSH near-dup pipeline end-to-end: shingle -> minhash -> "
    "band -> bucket self-join -> exact-Jaccard verification at 0.2. Only "
    "candidate pairs (not n²) reach verification.",
    headline=True,
    survey_ids=("M7-D4",),
)
def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the md5/shingle signature pass is CPU-bound and the corpus
    # arrives as one parquet split — without it the whole pass runs on one
    # task (no-op when the input already has enough splits)
    d = DD.fan_out(load_table(spark, sf_dir, "documents"))
    # the signature frame feeds three plan branches (banding + both sides
    # of the verification join): persist it so the md5/shingle work — the
    # dominant cost — runs once, not three times
    sigs = DD.minhash_signatures(d, "doc_id", "text").persist()
    pairs = DD.minhash_candidate_pairs(sigs, "doc_id")
    verified = DD.jaccard_verify(pairs, sigs, "doc_id", threshold=0.2)
    return verified.select(
        N.big("id_a").alias("id_a"),
        N.big("id_b").alias("id_b"),
        N.rnd("jaccard").alias("jaccard"),
    )


@query(
    "simhash_fingerprints",
    oracle=rf"""
WITH w AS (
  SELECT doc_id, unnest({WORDS_SQL}) AS word FROM documents
), bits AS (
  SELECT doc_id,
         {", ".join(
            f"sum(((strpos('0123456789abcdef', substring(md5(word), {1 + b // 4}, 1)) - 1) >> {3 - b % 4} & 1) * 2 - 1) AS v{b}"
            for b in range(16)
         )}
  FROM w GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST({" + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << (15 - b)} ELSE 0 END)" for b in range(16))}
            AS BIGINT) AS simhash
FROM bits""",
    doc="16-bit SimHash from per-word md5 bit votes, composed with "
    "F.aggregate over the word array (no explode, no UDF).",
    survey_ids=("M7-D5",),
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = DD.fan_out(load_table(spark, sf_dir, "documents"))
    return d.select(
        N.big("doc_id").alias("doc_id"),
        DD.simhash16(F.col("text")).alias("simhash"),
    )


@query(
    "ngram_jaccard_block",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, source, lower(text) AS lt,
         CASE WHEN count(*) OVER (PARTITION BY lang, source) > 128
              THEN coalesce(substring(list_min(list_transform(
                     CASE WHEN len({WORDS_SQL}) >= 2
                       THEN list_transform(range(1, len({WORDS_SQL})),
                              i -> concat_ws(' ', {WORDS_SQL}[i],
                                             {WORDS_SQL}[i+1]))
                       ELSE [lower(text)] END,
                     g -> md5(g))), 1, 16), '')
              ELSE '' END AS sfx
  FROM documents
), g0 AS (
  SELECT doc_id, lang, source, sfx,
         list_distinct(CASE WHEN len({WORDS_SQL}) >= 2
           THEN list_transform(range(1, len({WORDS_SQL})),
                  i -> concat_ws(' ', {WORDS_SQL}[i], {WORDS_SQL}[i+1]))
           ELSE [lower(text)] END) AS grams
  FROM (SELECT keyed.*, lt AS text FROM keyed)
  QUALIFY count(*) OVER (PARTITION BY lang, source, sfx) <= 1000
)
SELECT a.lang, a.source,
       CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
       round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
FROM g0 a JOIN g0 b
  ON a.lang = b.lang AND a.source = b.source AND a.sfx = b.sfx
WHERE a.doc_id < b.doc_id
  AND CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.2""",
    doc="Blocked word-bigram Jaccard: compare only within (lang, source) "
    "blocks — the sub-quadratic blocking pattern for n-gram dedup. "
    "Round-6 re-plan (the edit_distance_linkage discipline): the "
    "metadata key's block count is a vocabulary constant, so blocks "
    "denser than 128 members sub-block on a MinHash band over the "
    "SAME bigram shingles the operator measures — min(md5(gram)), the "
    "exact LSH family for the measured Jaccard (round-8 re-plan: "
    "order-insensitive where it matters — a reordered near-dup shares "
    "almost its whole gram set, hence w.h.p. the same minimum and the "
    "same sub-block, where the earlier 8-char-prefix key "
    "deterministically separated every reordering touching the text "
    "head; in-block recall for a pair is now exactly its gram-Jaccard "
    "j instead of 0/1 on an uncorrelated axis; mirrored in the "
    "oracle; a no-op at every attested SF — the max (lang, source) "
    "block holds 112 docs at sf0.1 — active on the synthetic sf1's "
    "~1120-doc blocks, and guard-active parity incl. a "
    "reordered-duplicate fixture the old prefix key provably missed "
    "is attested by tests/test_guard_active.py on x15-replicated "
    "blocks of 240), and the gram sets materialize AFTER the "
    "size filter so dropped blocks never pay the shingle cost. "
    "Synthetic-decade soak: 26.3s -> 3.7s while emitting the 225k "
    "true copy pairs the stress data contains.",
    survey_ids=("M7-D6",),
)
def ngram_jaccard_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", block_cols=["lang", "source"], threshold=0.2, n=2
    )
    return pairs.select(
        "lang",
        "source",
        N.big("id_a").alias("id_a"),
        N.big("id_b").alias("id_b"),
        N.rnd("jaccard").alias("jaccard"),
    )


def _cluster_rounds_sql(rounds: int) -> str:
    """Unrolled min-label propagation rounds (mirrors
    operators/dedup.py:min_label_clusters exactly — same round count)."""
    ctes = []
    for k in range(1, rounds + 1):
        prev = f"l{k - 1}"
        ctes.append(
            f"""l{k} AS MATERIALIZED (
  SELECT l.id, least(l.label, coalesce(m.nm, l.label)) AS label
  FROM {prev} l LEFT JOIN (
    SELECT e.src AS id, min(x.label) AS nm
    FROM edges e JOIN {prev} x ON e.dst = x.id
    GROUP BY e.src) m USING (id)
)"""
        )
    return ",\n".join(ctes)


@query(
    "dedup_clusters",
    oracle="WITH"
    + MINHASH_CTES
    + f""",
vp AS MATERIALIZED (
  SELECT p.id_a, p.id_b
  FROM pairs p
  JOIN sh sa ON p.id_a = sa.doc_id
  JOIN sh sb ON p.id_b = sb.doc_id
  WHERE CAST(len(list_intersect(list_distinct(sa.shingles),
                                list_distinct(sb.shingles))) AS DOUBLE)
        / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.2
),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM vp
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM vp
),
l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM edges),
{_cluster_rounds_sql(DD.CLUSTER_ROUNDS)}
SELECT CAST(id AS BIGINT) AS doc_id,
       CAST(label AS BIGINT) AS cluster_id
FROM l{DD.CLUSTER_ROUNDS}""",
    doc="Duplicate clustering: verified MinHash near-dup pairs -> "
    f"connected components via {DD.CLUSTER_ROUNDS} rounds of bounded "
    "min-label propagation (one deterministic DAG, no driver loop; "
    "cluster_id = min doc_id within reach, i.e. the canonical survivor). "
    "The pairs->clusters step every curation dedup pipeline needs before "
    "it can drop duplicates transitively.",
    survey_ids=("M7-D7",),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(d, "doc_id", "text").persist()
    pairs = DD.minhash_candidate_pairs(sigs, "doc_id")
    verified = DD.jaccard_verify(pairs, sigs, "doc_id", threshold=0.2)
    labels = DD.min_label_clusters(verified.select("id_a", "id_b"))
    return labels.select(
        N.big("id").alias("doc_id"),
        N.big("cluster_id").alias("cluster_id"),
    )


@query(
    "contamination_check",
    oracle=f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct({SHINGLES_SQL})) AS sh FROM documents
), bench AS (
  SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0
), corpus AS (
  SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0
)
SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(b.sh) AS BIGINT) AS n_contaminated,
       round(CAST(count(b.sh) AS DOUBLE) / count(*), 4) AS containment
FROM corpus c LEFT JOIN bench b ON c.sh = b.sh
GROUP BY c.doc_id""",
    doc="Eval-set decontamination: per-document fraction of distinct "
    "3-word shingles found anywhere in the benchmark set (docs with "
    "doc_id %% 97 = 0 stand in for an eval suite). The benchmark shingle "
    "set is broadcast — the corpus side stays a narrow explode + "
    "two-level aggregate (operators/dedup.py:shingle_containment).",
    survey_ids=("M7-D9",),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    out = DD.shingle_containment(corpus, bench)
    return out.select(
        N.big("doc_id").alias("doc_id"),
        "n_shingles",
        "n_contaminated",
        N.rnd("containment").alias("containment"),
    )


@query(
    "incremental_dedup",
    oracle="WITH"
    + MINHASH_BASE_CTES
    + f""",
ipairs AS (
  SELECT n.doc_id AS id_a, c.doc_id AS id_b
  FROM bands n JOIN bands c USING (band_key)
  WHERE n.doc_id % 3 = 0 AND c.doc_id % 3 <> 0
  GROUP BY 1, 2
),
ver AS (
  SELECT p.id_a, count(*) AS n_matches, max({_JACCARD_SQL}) AS best_j
  FROM ipairs p
  JOIN sh sa ON p.id_a = sa.doc_id
  JOIN sh sb ON p.id_b = sb.doc_id
  WHERE {_JACCARD_SQL} >= 0.2
  GROUP BY p.id_a
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(v.n_matches, 0) AS BIGINT) AS n_corpus_matches,
       CAST(CASE WHEN v.id_a IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_novel,
       round(coalesce(v.best_j, 0.0e0), 4) AS best_jaccard
FROM documents d LEFT JOIN ver v ON d.doc_id = v.id_a
WHERE d.doc_id % 3 = 0""",
    doc="Incremental dedup — the corpus-refresh cycle: screen a NEW batch "
    "(doc_id%3==0) against the EXISTING deduped corpus via two-sided LSH "
    "banding (new x corpus only, never corpus x corpus), verify "
    "candidates with exact Jaccard at 0.2, and flag each new doc novel "
    "or duplicate-of-corpus. At 100 TB the corpus side is a persisted "
    "signature table, so cost scales with the batch, not the corpus.",
    survey_ids=("M7-D10",),
)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # one signature pass over ALL docs (signatures depend only on text),
    # persisted: banding reads it twice and verification twice more
    sigs = DD.minhash_signatures(d, "doc_id", "text").persist()
    new_s = sigs.filter(F.col("doc_id") % 3 == 0)
    corp_s = sigs.filter(F.col("doc_id") % 3 != 0)
    pairs = DD.minhash_incremental_pairs(new_s, corp_s, "doc_id")
    ver = DD.jaccard_verify(pairs, sigs, "doc_id", threshold=0.2)
    m = ver.groupBy("id_a").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.max("jaccard").alias("best_j"),
    )
    return (
        d.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
        .join(m.withColumnRenamed("id_a", "doc_id"), on="doc_id", how="left")
        .select(
            N.big("doc_id").alias("doc_id"),
            F.coalesce(F.col("n_matches"), F.lit(0))
            .cast("bigint")
            .alias("n_corpus_matches"),
            F.when(F.col("n_matches").isNull(), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_novel"),
            N.rnd(F.coalesce(F.col("best_j"), F.lit(0.0))).alias(
                "best_jaccard"
            ),
        )
    )


@query(
    "dedup_apply",
    oracle="WITH"
    + MINHASH_CTES
    + f""",
vp AS MATERIALIZED (
  SELECT p.id_a, p.id_b
  FROM pairs p
  JOIN sh sa ON p.id_a = sa.doc_id
  JOIN sh sb ON p.id_b = sb.doc_id
  WHERE {_JACCARD_SQL} >= 0.2
),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM vp
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM vp
),
l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM edges),
{_cluster_rounds_sql(DD.CLUSTER_ROUNDS)}
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN l.label IS NULL OR l.label = d.doc_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
       CAST(sum(CASE WHEN l.label IS NOT NULL AND l.label <> d.doc_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM documents d LEFT JOIN l{DD.CLUSTER_ROUNDS} l ON d.doc_id = l.id
GROUP BY d.lang""",
    doc="The dedup ACTION: near-dup pairs -> clusters -> materialized "
    "canonical corpus (min-id survivor per component, all unmatched docs "
    "kept), reported as a per-language census. The labels table covers "
    "only docs in verified pairs, so the final join broadcasts under "
    "AQE; the corpus moves at most once.",
    survey_ids=("M7-D20",),
)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(d, "doc_id", "text").persist()
    pairs = DD.minhash_candidate_pairs(sigs, "doc_id")
    verified = DD.jaccard_verify(pairs, sigs, "doc_id", threshold=0.2)
    labels = DD.min_label_clusters(verified.select("id_a", "id_b"))
    kept = DD.apply_dedup(d, labels, "doc_id")
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    surv = kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_survivors")
    )
    return (
        per_lang.join(surv, on="lang", how="left")
        .select(
            "lang",
            "n_docs",
            F.coalesce("n_survivors", F.lit(0))
            .cast("bigint")
            .alias("n_survivors"),
            (F.col("n_docs") - F.coalesce("n_survivors", F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )


@query(
    "bloom_dedup_prefilter",
    oracle="""
WITH corpus AS (
  SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 3 <> 0
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN c.digest IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS is_corpus_dup
FROM documents d
LEFT JOIN corpus c ON md5(d.text) = c.digest
WHERE d.doc_id % 3 = 0""",
    doc="Bloom-filter membership prefilter for incremental exact dedup: "
    "the corpus side (doc_id%3<>0) builds a broadcast bitmap over its "
    "text digests; the NEW batch (doc_id%3==0) probes it with "
    "zero-shuffle bit tests, and only bloom candidates reach the exact "
    "digest join. Output is EXACT (bloom false positives are resolved by "
    "the join, false negatives are impossible), so the oracle is plain "
    "SQL while the Spark plan shows the prefilter.",
    survey_ids=("M7-D13",),
)
def bloom_dedup_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    digest = F.md5(F.col("text"))
    corpus = (
        d.filter(F.col("doc_id") % 3 != 0)
        .select(digest.alias("digest"))
        .distinct()
    )
    bloom = DD.bloom_build(corpus, "digest")
    new = d.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", digest.alias("digest")
    )
    probed = DD.bloom_probe(new, bloom, F.col("digest"))
    # exact confirm: only bloom candidates shuffle into the digest join
    confirmed = (
        probed.filter(F.col("bloom_hit"))
        .join(corpus, on="digest", how="left_semi")
        .select("doc_id", F.lit(1).alias("is_corpus_dup"))
    )
    return (
        new.select("doc_id")
        .join(confirmed, on="doc_id", how="left")
        .select(
            N.big("doc_id").alias("doc_id"),
            F.coalesce("is_corpus_dup", F.lit(0))
            .cast("bigint")
            .alias("is_corpus_dup"),
        )
    )


_EST_MATCH_SQL = "(" + " + ".join(
    f"CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END"
    for i in range(DD.NUM_HASHES)
) + f") / {DD.NUM_HASHES}.0"

_PAIR_JACCARD_SQL = """CAST(len(list_intersect(list_distinct(a.shingles),
                              list_distinct(b.shingles))) AS DOUBLE)
      / len(list_distinct(list_concat(a.shingles, b.shingles)))"""


@query(
    "minhash_error_eval",
    oracle="WITH"
    + MINHASH_CTES
    + f"""
SELECT CAST(p.id_a AS BIGINT) AS id_a, CAST(p.id_b AS BIGINT) AS id_b,
       round({_EST_MATCH_SQL}, 4) AS est_jaccard,
       round({_PAIR_JACCARD_SQL}, 4) AS exact_jaccard,
       round(abs({_EST_MATCH_SQL} - ({_PAIR_JACCARD_SQL})), 4) AS abs_err
FROM pairs p
JOIN sigs a ON p.id_a = a.doc_id
JOIN sigs b ON p.id_b = b.doc_id""",
    doc="MinHash estimator audit: per candidate pair, the signature-match "
    "estimate vs the exact shingle Jaccard and their absolute error — "
    "the measured readout for choosing NUM_HASHES and band geometry. "
    "Candidates only (banded + capped), never all pairs.",
    survey_ids=("M7-D21",),
)
def minhash_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(d, "doc_id", "text").persist()
    pairs = DD.minhash_candidate_pairs(sigs, "doc_id")
    out = DD.minhash_eval_pairs(pairs, sigs, "doc_id")
    return out.select(
        N.big("id_a").alias("id_a"),
        N.big("id_b").alias("id_b"),
        N.rnd("est_jaccard").alias("est_jaccard"),
        N.rnd("exact_jaccard").alias("exact_jaccard"),
        N.rnd("abs_err").alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# shingle_granularity_curve (round 6)
# ---------------------------------------------------------------------------

_CURVE_KS = (1, 2, 3, 5, 8)


def _kgram_sql(k: int) -> str:
    """k-word shingle array in SQL (generalizes SHINGLES_SQL beyond k=3);
    a doc shorter than k words is its own single shingle."""
    if k == 1:
        return WORDS_SQL
    parts = ", ".join(f"{WORDS_SQL}[i+{j}]" for j in range(k))
    return f"""
CASE WHEN len({WORDS_SQL}) >= {k}
     THEN list_transform(range(1, len({WORDS_SQL}) - {k - 2}),
            i -> concat_ws(' ', {parts}))
     ELSE [lower(text)] END"""


_CURVE_ARMS_SQL = "\nUNION ALL\n".join(
    f"""
SELECT CAST({k} AS BIGINT) AS k_words,
       CAST(count(*) AS BIGINT) AS total_shingles,
       CAST(count(DISTINCT s) AS BIGINT) AS distinct_shingles,
       round(CAST(count(*) - count(DISTINCT s) AS DOUBLE) / count(*), 6)
         AS dup_occurrence_share
FROM (SELECT md5(unnest({_kgram_sql(k)})) AS s FROM documents)"""
    for k in _CURVE_KS
)


@query(
    "shingle_granularity_curve",
    oracle=_CURVE_ARMS_SQL,
    doc="Dedup-aggressiveness curve: for each shingle width k in "
    f"{_CURVE_KS}, the corpus's total k-gram occurrences, distinct "
    "k-grams, and the duplicated-occurrence share (total - distinct) / "
    "total — the knob-tuning diagnostic for exact-substring and "
    "MinHash dedup (k=1 is vocabulary reuse, always high; the k where "
    "the share collapses is the smallest width that stops punishing "
    "natural phrase reuse and starts measuring real duplication — the "
    "width segment_dedup / minhash should run at). Shingles shuffle as "
    "md5 digests only (payload text never moves); each arm is one "
    "map-side-combinable aggregate; the word array is projected once "
    "per arm so the interpreted slice lambda never re-tokenizes. "
    "Exact integer counts; one division at render.",
    survey_ids=("M7-D22",),
)
def shingle_granularity_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = DD.fan_out(load_table(spark, sf_dir, "documents").select("text"))
    ws = d.select(
        DD.words_col(F.col("text")).alias("_ws"),
        F.lower(F.col("text")).alias("_low"),
    )
    arms = []
    for k in _CURVE_KS:
        if k == 1:
            sh = F.col("_ws")
        else:
            sh = DD.shingles_from_words(F.col("_ws"), F.col("_low"), k=k)
        digests = ws.select(
            F.explode(sh).alias("_s")
        ).select(F.md5("_s").alias("s"))
        arms.append(
            digests.agg(
                F.lit(k).cast("bigint").alias("k_words"),
                F.count(F.lit(1)).cast("bigint").alias("total_shingles"),
                F.countDistinct("s").cast("bigint").alias(
                    "distinct_shingles"
                ),
                N.rnd(
                    (F.count(F.lit(1)) - F.countDistinct("s")).cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("dup_occurrence_share"),
            )
        )
    res = arms[0]
    for a in arms[1:]:
        res = res.unionByName(a)
    return res


# ---------------------------------------------------------------------------
# simhash_hamming_pairs (round 7)
# ---------------------------------------------------------------------------

_SH60_VOTES = ", ".join(
    f"sum(((strpos('0123456789abcdef', substring(md5(word), {1 + b // 4}, 1))"
    f" - 1) >> {3 - b % 4} & 1) * 2 - 1) AS v{b}"
    for b in range(60)
)
_SH60_PACK = " + ".join(
    f"(CASE WHEN v{b} > 0 THEN {1 << (59 - b)} ELSE 0 END)" for b in range(60)
)


@query(
    "simhash_hamming_pairs",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents
  WHERE doc_id % 31 = 0
), w AS (
  SELECT doc_id, unnest({WORDS_SQL}) AS word FROM corpus
), votes AS (
  SELECT doc_id, {_SH60_VOTES} FROM w GROUP BY doc_id
), sh AS (
  SELECT doc_id, CAST({_SH60_PACK} AS BIGINT) AS sh FROM votes
), banded AS (
  SELECT doc_id, sh, b.band, (sh >> (15 * b.band)) & 32767 AS bv
  FROM sh, (SELECT unnest([0, 1, 2, 3]) AS band) b
), capped AS (
  SELECT * FROM (
    SELECT banded.*, count(*) OVER (PARTITION BY band, bv) AS c FROM banded
  ) WHERE c <= 1000
), p AS (
  SELECT DISTINCT a.doc_id AS ida, a.sh AS sha, x.doc_id AS idb, x.sh AS shb
  FROM capped a JOIN capped x ON a.band = x.band AND a.bv = x.bv
   AND a.doc_id < x.doc_id
)
SELECT CAST(ida AS BIGINT) AS id_a, CAST(idb AS BIGINT) AS id_b,
       CAST(bit_count(xor(sha, shb)) AS BIGINT) AS hamming
FROM p WHERE bit_count(xor(sha, shb)) <= 3""",
    doc="SimHash near-dup pairs by pigeonhole banding (the Charikar/"
    "Manku web-dedup construction): a 60-bit fingerprint split into 4 "
    "x 15-bit bands — any pair within Hamming distance 3 agrees exactly "
    "on >= 1 band — candidates from per-band equi-joins (never n^2), "
    "hot band-buckets dropped whole at 1000 (the LSH degenerate-bucket "
    "guard), then bit_count(xor) verification. 60 bits (not 64) keeps "
    "the packed fingerprint positive in a signed BIGINT on both "
    "engines, so band shiftright never sign-extends. The fixture's "
    "random docs sit ~30 bits apart, so the corpus is seeded in-query "
    "with exact copies of every 31st doc (the embedding_near_dups "
    "discipline) — attested output non-empty at every SF, distance-0 "
    "pairs by construction.",
    survey_ids=("M7-D23",),
)
def simhash_hamming_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = d.filter(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    corpus = DD.fan_out(d.unionByName(seeds))
    pairs = DD.simhash_hamming_pairs(corpus)
    return pairs.select(
        N.big("id_a").alias("id_a"),
        N.big("id_b").alias("id_b"),
        N.big("hamming").alias("hamming"),
    )


# ---------------------------------------------------------------------------
# winnowing_fingerprints (round 7)
# ---------------------------------------------------------------------------

_WIN_W = 4          # winnowing window (consecutive shingle hashes)
_WIN_HOT_FP = 64    # boilerplate fingerprint guard


@query(
    "winnowing_fingerprints",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents
  WHERE doc_id % 31 = 0
), hs AS (
  SELECT doc_id,
         list_transform({SHINGLES_SQL},
           s -> CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT)) AS h
  FROM corpus
), fps AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(h) >= {_WIN_W}
           THEN list_transform(range(0, len(h) - {_WIN_W} + 1),
                  i -> list_min(h[i + 1 : i + {_WIN_W}]))
           ELSE [list_min(h)] END) AS fp
  FROM hs
), e AS (
  SELECT doc_id, unnest(fp) AS f FROM fps
), capped AS (
  SELECT * FROM (
    SELECT e.*, count(*) OVER (PARTITION BY f) AS c FROM e
  ) WHERE c <= {_WIN_HOT_FP}
)
SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM capped a JOIN capped b ON a.f = b.f AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 2""",
    doc="Winnowing document fingerprints (Schleimer/Wilkerson/Aiken — "
    "the MOSS local fingerprinting scheme): per doc, the minimum "
    "shingle hash of every 4-hash sliding window is selected, which "
    "GUARANTEES any shared run of >= w+k-1 words produces a shared "
    "fingerprint (the coverage property MinHash sampling cannot "
    "give), then docs are paired by shared fingerprints (>= 2) "
    "through the inverted fingerprint index. Hot fingerprints "
    "(boilerplate shingles winnowed to the same min) are dropped "
    "whole at 64 — the standard hot-postings guard. Corpus seeded "
    "in-query with exact copies of every 31st doc (the "
    "simhash_hamming_pairs discipline) so the attested output is "
    "non-empty at every SF. Plan: hashes and window minima are "
    "per-row array work (no explode until the fingerprint set, "
    "already deduplicated and ~|doc|/w sized); only (doc_id, "
    "fingerprint) pairs shuffle.",
    survey_ids=("M7-D24",),
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from project_bigdata_spark.operators.dedup import fan_out, shingles_col

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = d.filter(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    corpus = fan_out(d.unionByName(seeds))
    h = F.transform(
        shingles_col(F.col("text")),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
    )
    hs = corpus.select("doc_id", h.alias("h"))
    wins = F.when(
        F.size("h") >= _WIN_W,
        F.transform(
            F.sequence(F.lit(0), F.size("h") - _WIN_W),
            lambda i: F.array_min(F.slice(F.col("h"), i + 1, _WIN_W)),
        ),
    ).otherwise(F.array(F.array_min("h")))
    fps = hs.select("doc_id", F.explode(F.array_distinct(wins)).alias("f"))
    wcap = Window.partitionBy("f")
    capped = fps.withColumn("c", F.count(F.lit(1)).over(wcap)).filter(
        F.col("c") <= _WIN_HOT_FP
    )
    a = capped.select(F.col("doc_id").alias("id_a"), "f")
    b = capped.select(F.col("doc_id").alias("id_b"), "f")
    return (
        a.join(b, "f")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select(N.big("id_a").alias("id_a"), N.big("id_b").alias("id_b"), "n_shared")
    )


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs (round 7)
# ---------------------------------------------------------------------------

_TFIDF_DF_CAP = 16      # discriminative-term cap: bounds per-term fanout
_TFIDF_T = 0.3


@query(
    "tfidf_cosine_pairs",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents
  WHERE doc_id % 31 = 0
), tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({SHINGLES_SQL}) AS w FROM corpus)
  GROUP BY doc_id, w
), df AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w
), nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM corpus),
wt AS (
  SELECT tf.doc_id, tf.w,
         tf.tf * {N.sql_cents("ln(CAST(n AS DOUBLE) / df)", 10**9)} AS wgt
  FROM tf JOIN df USING (w), nd
  WHERE df.df <= {_TFIDF_DF_CAP}
), nrm AS (
  SELECT doc_id,
         sqrt(CAST(sum(CAST(wgt AS HUGEINT) * wgt) AS DOUBLE)) AS nrm
  FROM wt GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb,
         sum(CAST(a.wgt AS HUGEINT) * b.wgt) AS dot
  FROM wt a JOIN wt b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT CAST(ida AS BIGINT) AS id_a, CAST(idb AS BIGINT) AS id_b,
       round(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm), 6) AS cosine
FROM dots JOIN nrm na ON ida = na.doc_id
          JOIN nrm nb ON idb = nb.doc_id
WHERE round(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm), 6) >= {_TFIDF_T}""",
    doc="Sparse lexical near-dup via a TF-IDF cosine SIMILARITY JOIN "
    "over the inverted index — the sparse complement of "
    "embedding_near_dups (no dense encoder needed, catches lexical "
    "overlap embeddings can miss). Terms are 3-word SHINGLES, not "
    "words: the fixture's (and any template corpus's) word "
    "vocabulary is tiny and universally common — no word is "
    "discriminative — while the shingle vocabulary is combinatorial "
    "(16k+ types, max df 7 at sf0.01), which is exactly why "
    "production sparse dedup blocks on rare n-grams. Vectors are "
    f"restricted to discriminative terms (df <= {_TFIDF_DF_CAP} — common terms carry "
    "~zero idf weight and quadratic postings, so the cap is both the "
    "semantic and the scale dial: per-term candidate fanout is "
    "bounded by cap^2 and total work is linear in vocabulary), "
    "weights tf*snap(ln(N/df)) kept as EXACT integers so partial dot "
    "products sum order-free in HUGEINT/DECIMAL(38,0); only the "
    "final cosine division is floating point. Term-partitioned "
    "partial products ARE the distributed sparse dot product — the "
    "corpus is never self-joined. Seeded with exact copies of every "
    "31st doc for non-vacuous attestation.",
    survey_ids=("M7-D25",),
)
def tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out, shingles_col

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = d.filter(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    corpus = fan_out(d.unionByName(seeds))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tf = (
        corpus.select(
            "doc_id", F.explode(shingles_col(F.col("text"))).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    nd = corpus.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    idf9 = N.cents(
        F.log(F.col("n").cast("double") / F.col("df")), 10**9
    )
    wt = (
        tf.join(df, "w")
        .filter(F.col("df") <= _TFIDF_DF_CAP)
        .crossJoin(F.broadcast(nd))
        .select("doc_id", "w", (F.col("tf") * idf9).alias("wgt"))
    )
    nrm = wt.groupBy("doc_id").agg(
        F.sqrt(F.sum(dec(F.col("wgt")) * F.col("wgt")).cast("double")).alias(
            "nrm"
        )
    )
    a = wt.select(F.col("doc_id").alias("ida"), "w", F.col("wgt").alias("wa"))
    b = wt.select(F.col("doc_id").alias("idb"), "w", F.col("wgt").alias("wb"))
    dots = (
        a.join(b, "w")
        .filter(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.sum(dec(F.col("wa")) * F.col("wb")).alias("dot"))
    )
    cos = F.col("dot").cast("double") / (F.col("na") * F.col("nb"))
    return (
        dots.join(nrm.select(F.col("doc_id").alias("ida"), F.col("nrm").alias("na")), "ida")
        .join(nrm.select(F.col("doc_id").alias("idb"), F.col("nrm").alias("nb")), "idb")
        .select(
            N.big("ida").alias("id_a"),
            N.big("idb").alias("id_b"),
            N.rnd(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= _TFIDF_T)
    )


# ---------------------------------------------------------------------------
# blocking_quality_audit (round 7)
# ---------------------------------------------------------------------------

# seed text variants: exact copy / prefix edit / truncation — the three
# edit classes blocking schemes differ on
_BQ_SEED_SQL = """CASE doc_id % 3
  WHEN 0 THEN text
  WHEN 1 THEN 'zz ' || text
  ELSE substring(text, 1, greatest(20, (length(text) * 3) // 5)) END"""

_BQ_KEYS_SQL = f"""
  SELECT doc_id,
         concat_ws('|', lang, {WORDS_SQL}[1]) AS k_lang_fw,
         concat_ws('|', lang, source) AS k_lang_source,
         substring(lower(text), 1, 8) AS k_prefix8,
         concat_ws('|', lang, CAST(length(text) // 50 AS VARCHAR))
           AS k_lenbucket"""

_BQ_SCHEMES = ["lang_fw", "lang_source", "prefix8", "lenbucket"]


def _bq_scheme_sql(s: str) -> str:
    return f"""
SELECT '{s}' AS scheme,
       (SELECT CAST(count(DISTINCT k_{s}) AS BIGINT) FROM keyed) AS n_blocks,
       (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT)
        FROM (SELECT count(*) AS c FROM keyed GROUP BY k_{s}))
         AS candidate_pairs,
       round(1.0e0 - (SELECT sum(c * (c - 1) / 2.0)
                      FROM (SELECT count(*) AS c FROM keyed GROUP BY k_{s}))
             / (SELECT count(*) * (count(*) - 1) / 2.0 FROM keyed), 6)
         AS reduction_ratio,
       (SELECT CAST(count(*) AS BIGINT) FROM truth) AS truth_pairs,
       (SELECT CAST(sum(CASE WHEN o.k_{s} = se.k_{s} THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM truth t JOIN keyed o ON t.oid = o.doc_id
                     JOIN keyed se ON t.sid = se.doc_id) AS truth_found,
       round((SELECT sum(CASE WHEN o.k_{s} = se.k_{s} THEN 1.0 ELSE 0 END)
              FROM truth t JOIN keyed o ON t.oid = o.doc_id
                           JOIN keyed se ON t.sid = se.doc_id)
             / (SELECT count(*) FROM truth), 6) AS pairs_completeness"""


@query(
    "blocking_quality_audit",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, lang, source, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, lang, source,
         {_BQ_SEED_SQL} AS text
  FROM documents WHERE doc_id % 31 = 0
), keyed AS ({_BQ_KEYS_SQL} FROM corpus),
truth AS (
  SELECT doc_id AS oid, doc_id + 10000000 AS sid
  FROM documents WHERE doc_id % 31 = 0
)
{" UNION ALL ".join(_bq_scheme_sql(s) for s in _BQ_SCHEMES)}""",
    doc="Blocking-strategy quality audit — the two numbers every "
    "record-linkage/dedup blocking decision runs on (Christen's "
    "textbook metrics): REDUCTION RATIO (share of the n^2 pair space "
    "a scheme prunes, from per-block counts c*(c-1)/2 — no pair is "
    "ever materialized) and PAIRS COMPLETENESS (share of true "
    "duplicate pairs the scheme keeps co-blocked), measured for four "
    "schemes — (lang, first word), (lang, source), 8-char text "
    "prefix, (lang, 50-char length bucket) — against an in-query "
    "seeded truth set whose copies rotate through the three edit "
    "classes blocking differs on: exact copy, prefix edit ('zz ' "
    "prepend — kills first-word and prefix blocking), truncation "
    "(kills length blocking). This is the measurement that justifies "
    "the catalog's own (lang, source)/prefix choices. Plan: one "
    "keyed projection, per-scheme count aggregates (block-cardinality "
    "frames), and a |truth|-row key-equality join — no blocking "
    "scheme is ever executed as a pair join.",
    survey_ids=("M7-D27",),
)
def blocking_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import words_col

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    seed_text = (
        F.when(F.col("doc_id") % 3 == 0, F.col("text"))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("zz "), F.col("text")))
        .otherwise(
            F.substring(
                F.col("text"),
                1,
                F.greatest(
                    F.lit(20),
                    F.expr("(length(text) * 3) div 5").cast("int"),
                ),
            )
        )
    )
    seeds = d.filter(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        "lang",
        "source",
        seed_text.alias("text"),
    )
    corpus = d.unionByName(seeds)
    keyed = corpus.select(
        "doc_id",
        F.concat_ws(
            "|", F.col("lang"), F.element_at(words_col(F.col("text")), 1)
        ).alias("k_lang_fw"),
        F.concat_ws("|", "lang", "source").alias("k_lang_source"),
        F.substring(F.lower(F.col("text")), 1, 8).alias("k_prefix8"),
        F.concat_ws(
            "|",
            F.col("lang"),
            F.expr("length(text) div 50").cast("string"),
        ).alias("k_lenbucket"),
    )
    truth = d.filter(F.col("doc_id") % 31 == 0).select(
        F.col("doc_id").alias("oid"),
        (F.col("doc_id") + F.lit(10_000_000)).alias("sid"),
    )
    o = keyed.select(
        F.col("doc_id").alias("oid"),
        *[F.col(f"k_{s}").alias(f"o_{s}") for s in _BQ_SCHEMES],
    )
    se = keyed.select(
        F.col("doc_id").alias("sid"),
        *[F.col(f"k_{s}").alias(f"s_{s}") for s in _BQ_SCHEMES],
    )
    tk = truth.join(o, "oid").join(se, "sid")
    # corpus size as a ONE-ROW in-plan aggregate (the oracle's scalar
    # subquery shape) rather than a driver-side .count(): an eager count
    # here would execute a full Spark job merely to CONSTRUCT the plan
    # (plan doctor, explain, dry runs), unlike every other lazy entry.
    tot = corpus.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    arms = []
    for s in _BQ_SCHEMES:
        blocks = keyed.groupBy(f"k_{s}").agg(F.count(F.lit(1)).alias("c"))
        cand = blocks.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum(F.expr("c * (c - 1) div 2")).cast("bigint").alias(
                "candidate_pairs"
            ),
        )
        tr = tk.agg(
            F.count(F.lit(1)).cast("bigint").alias("truth_pairs"),
            F.sum((F.col(f"o_{s}") == F.col(f"s_{s}")).cast("int"))
            .cast("bigint")
            .alias("truth_found"),
        )
        arms.append(
            cand.crossJoin(F.broadcast(tr))
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(s).alias("scheme"),
                "n_blocks",
                "candidate_pairs",
                N.rnd(
                    F.lit(1.0)
                    - F.col("candidate_pairs")
                    / (F.col("_n") * (F.col("_n") - F.lit(1)) / F.lit(2.0)),
                    6,
                ).alias("reduction_ratio"),
                "truth_pairs",
                "truth_found",
                N.rnd(
                    F.col("truth_found") / F.col("truth_pairs"), 6
                ).alias("pairs_completeness"),
            )
        )
    res = arms[0]
    for a in arms[1:]:
        res = res.unionByName(a)
    return res


# ---------------------------------------------------------------------------
# soft_dedup_weights (round 8, second window) — duplication-aware sampling
# weights: down-weight duplicates instead of dropping them (the soft
# companion of dedup_apply's hard canonical-keep)
# ---------------------------------------------------------------------------


@query(
    "soft_dedup_weights",
    oracle=f"""
WITH seeded AS MATERIALIZED (
  SELECT doc_id, text, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 10000000, text, 'dup_mirror', n_chars
  FROM documents WHERE doc_id % 17 = 3
  UNION ALL
  SELECT doc_id + 20000000, text, 'dup_mirror', n_chars
  FROM documents WHERE doc_id % 34 = 3
), digests AS MATERIALIZED (
  SELECT doc_id, source, n_chars, md5(text) AS dg FROM seeded
), ksize AS (
  SELECT dg, CAST(count(*) AS BIGINT) AS k FROM digests GROUP BY dg
), weighted AS (
  SELECT d.source, d.n_chars, ks.k,
         {N.sql_cents('1.0e0 / ks.k', 10**6)} AS w6
  FROM digests d JOIN ksize ks USING (dg)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       round(CAST(sum(w6) AS DOUBLE) / 1e6, 6) AS effective_docs,
       round(CAST(sum(n_chars * w6) AS DOUBLE) / 1e6, 2) AS effective_chars,
       {N.sql_rnd('count(*) / (sum(w6) / 1.0e6)', 6)} AS redundancy
FROM weighted GROUP BY source""",
    doc="Soft deduplication: instead of dropping duplicates, give every "
    "document the sampling weight 1/k where k is its exact-content "
    "cluster size (He et al. 2024 'SoftDedup' — reweighting preserves "
    "high-frequency content signal that hard dedup destroys, while "
    "equalizing each distinct content's total mass). Per source: raw "
    "vs effective (weighted) document and char counts and the "
    "redundancy factor. The corpus carries no exact duplicates, so the "
    "query seeds deterministic cross-source mirror copies in-plan "
    "(doc_id%17==3 twice, doc_id%34==3 thrice — the anchor_substring_"
    "spans seeding idiom), making clusters span sources and the "
    "per-source weights genuinely fractional. Weights snap to the 1e-6 "
    "grid and integer-sum (snap-then-sum). Plan: one digest aggregate "
    "+ one digest-keyed join — 16-byte digests shuffle, payload text "
    "never does; at 100 TB this is the same two-pass shape as "
    "dedup_exact with a broadcast-sized weight table per cluster key.",
    survey_ids=("M7-D31",),
)
def soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "text", "source", "n_chars")
    m1 = (
        d.filter(F.col("doc_id") % 17 == 3)
        .select(
            (F.col("doc_id") + 10000000).alias("doc_id"),
            "text",
            F.lit("dup_mirror").alias("source"),
            "n_chars",
        )
    )
    m2 = (
        d.filter(F.col("doc_id") % 34 == 3)
        .select(
            (F.col("doc_id") + 20000000).alias("doc_id"),
            "text",
            F.lit("dup_mirror").alias("source"),
            "n_chars",
        )
    )
    digests = (
        base.unionAll(m1)
        .unionAll(m2)
        .select("source", "n_chars", F.md5("text").alias("dg"))
    )
    ksize = digests.groupBy("dg").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    weighted = digests.join(ksize, "dg").select(
        "source",
        "n_chars",
        "k",
        N.cents(F.lit(1.0) / F.col("k"), 10**6).alias("w6"),
    )
    return weighted.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("k") >= 2).cast("bigint")).cast("bigint").alias(
            "n_dup_docs"
        ),
        N.rnd(F.sum("w6").cast("double") / 1e6, 6).alias("effective_docs"),
        N.rnd(
            F.sum(F.col("n_chars") * F.col("w6")).cast("double") / 1e6, 2
        ).alias("effective_chars"),
        F.expr(N.sql_rnd("count(*) / (sum(w6) / 1.0e6)", 6)).alias(
            "redundancy"
        ),
    )
