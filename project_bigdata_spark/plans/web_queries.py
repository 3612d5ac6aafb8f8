"""Web-corpus curation entries (round 9): URL canonicalization,
per-domain share stats, domain-blocklist filtering, and URL-exact
dedup — the C4 / RefinedWeb-style pre-text curation tier every public
web-scale pipeline runs BEFORE any text-level operator (Raffel et al.
2020 §2.2; Penedo et al. 2023 §3.1).

The documents table carries no URL column, so each entry derives a
DETERMINISTIC synthetic URL per document from (doc_id, source) — the
same construction, inlined as a shared dialect-neutral SQL string, on
both engines. The construction deliberately sprays the variants
canonicalization must collapse: scheme/host case, a ``www.`` prefix,
the default ``:443`` port, ``utm_*`` tracking parameters, and
fragments.

Dialect notes (the reason every regex here is single-occurrence):
DuckDB's ``regexp_replace`` replaces only the FIRST match unless the
'g' flag is passed, Spark's replaces ALL — so each pattern below is
anchored or at-most-once by construction, where the two behaviours
coincide. Backreferences also differ ($1 vs \\1), so the chain never
uses them: port and www stripping are LITERAL ``replace()`` calls
(all-occurrence in both engines, single-occurrence by construction).

Scale: every entry is one narrow projection pass over the corpus —
the URL chain is whole-stage-codegen string ops, no UDF, no shuffle
until the (domain- or url-keyed) aggregation; the blocklist is a
broadcast anti-join (the blocklist side is always tiny in production:
thousands of domains vs billions of pages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_spark.operators import text as TX
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.plans.text_queries import WORDS_SQL
from project_bigdata_spark.sources import load_table

# ---------------------------------------------------------------------------
# shared URL construction + canonicalization chain (dialect-neutral)
# ---------------------------------------------------------------------------

# Rich-variant construction for the canonicalize/domain entries: mixed
# scheme+host case, www prefix, default :443 vs non-default :8080 port
# (the latter must be KEPT), utm-only / id-only / id+utm query strings,
# and a fragment. `|| CAST(.. AS BIGINT)` renders identically on both
# engines.
URL_RAW_SQL = (
    "(CASE doc_id % 3 WHEN 0 THEN 'HTTPS://' WHEN 1 THEN 'http://'"
    " ELSE 'https://' END"
    " || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN upper(source) ELSE source END"
    " || CASE doc_id % 5 WHEN 0 THEN '.Example.COM:443'"
    " WHEN 1 THEN '.example.com:8080' ELSE '.example.com' END"
    " || '/docs/' || CAST(doc_id AS BIGINT)"
    " || CASE doc_id % 7 WHEN 0 THEN '?utm_source=feed'"
    " WHEN 1 THEN '?id=' || CAST(doc_id % 97 AS BIGINT)"
    " WHEN 2 THEN '?id=' || CAST(doc_id % 97 AS BIGINT)"
    " || '&utm_campaign=x' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END)"
)

# Convergent construction for the dedup entry: every canonicalizable
# variant varies with doc_id, but the canonical residue is coarse —
# scheme always https (case-sprayed), query always utm-only (one or
# two params, both stripped), path keyed on doc_id % 50 — so distinct
# raw URLs collapse into shared canonical URLs (the duplicate-fetch
# regime URL-exact dedup exists for).
URL_RAW_DUP_SQL = (
    "(CASE doc_id % 3 WHEN 0 THEN 'HTTPS://' WHEN 1 THEN 'HtTpS://'"
    " ELSE 'https://' END"
    " || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN upper(source) ELSE source END"
    " || CASE WHEN doc_id % 5 = 0 THEN '.Example.COM:443'"
    " ELSE '.example.com' END"
    " || '/docs/' || CAST(doc_id % 50 AS BIGINT)"
    " || CASE doc_id % 7 WHEN 0 THEN '?utm_source=feed'"
    " WHEN 2 THEN '?utm_campaign=x&utm_source=feed' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END)"
)


def url_canon_sql(u: str) -> str:
    """Canonicalization chain over a URL expression ``u`` — shared
    verbatim by ``F.expr`` and the DuckDB oracles.

    Steps (each regex matches at most once, see module docstring):
    fragment strip → leading-utm strip (another param follows) →
    trailing/only-utm strip → lowercase the scheme://host[:port]
    prefix ONLY (path/query case is semantic) → default-:443 strip
    (always pre-path in this construction) → www strip.
    """
    c1 = f"regexp_replace({u}, '#.*$', '')"
    c2 = f"regexp_replace({c1}, '[?]utm_[a-z]+=[^&#]*&', '?')"
    c3 = f"regexp_replace({c2}, '[?&]utm_[a-z]+=[^&#]*$', '')"
    c4 = (
        f"(lower(regexp_extract({c3}, '^([^/]*//[^/]*)', 1))"
        f" || regexp_replace({c3}, '^[^/]*//[^/]*', ''))"
    )
    c5 = f"replace({c4}, ':443/', '/')"
    return f"replace({c5}, '://www.', '://')"


# Registrable domain of a CANONICAL url (scheme/host already lowered).
DOMAIN_SQL = "regexp_extract({u}, '^[a-z]+://([^/:]+)', 1)"

_CANON = url_canon_sql(URL_RAW_SQL)
_CANON_DUP = url_canon_sql(URL_RAW_DUP_SQL)
_DOMAIN = DOMAIN_SQL.format(u=_CANON)

# Blocklisted registrable domains (the RefinedWeb/C4 pattern: a small
# curated list joined against billions of pages — broadcast side).
BLOCKLIST = ("src1.example.com", "src4.example.com", "src17.example.com")
_BLOCK_SQL = "(" + ", ".join(f"'{d}'" for d in BLOCKLIST) + ")"


@query(
    "url_canonicalize",
    oracle=f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {URL_RAW_SQL} AS url_raw,
       {_CANON} AS url_canon,
       {_DOMAIN} AS domain
FROM documents""",
    doc="C4/RefinedWeb-style URL canonicalization as a pure "
    "whole-stage-codegen string chain (zero UDFs): lowercase "
    "scheme+host (path/query case preserved), strip www., the "
    "default :443 port (non-default ports kept), utm_* tracking "
    "params (other params kept), and fragments. The raw URL is a "
    "deterministic per-document construction spraying exactly those "
    "variants; the chain is a shared dialect-neutral SQL string — "
    "every regex anchored/at-most-once so DuckDB's first-match and "
    "Spark's all-match regexp_replace semantics coincide, and no "
    "backreferences ($1 vs \\1 divergence). Plan: one narrow "
    "projection pass, no shuffle, no UDF — at 100 TB this runs at "
    "scan speed inside the same stage as the parquet read.",
    survey_ids=("M7-WEB1",),
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        N.big("doc_id").alias("doc_id"),
        F.expr(URL_RAW_SQL).alias("url_raw"),
        F.expr(_CANON).alias("url_canon"),
        F.expr(_DOMAIN).alias("domain"),
    )


@query(
    "domain_share_stats",
    oracle=f"""
WITH per_doc AS (
  SELECT {_DOMAIN} AS domain,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
             w -> w <> '')) AS n_tok
  FROM documents
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS td, CAST(sum(n_tok) AS BIGINT) AS tt
  FROM per_doc
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       {N.sql_rnd("count(*) * 1.0e0 / any_value(tot.td)", 6)} AS doc_share,
       {N.sql_rnd("sum(n_tok) * 1.0e0 / any_value(tot.tt)", 6)} AS token_share
FROM per_doc, tot
GROUP BY domain""",
    doc="Per-domain document and token share table — the first audit "
    "any web-corpus curation runs (C4 §2.2 kept per-domain counts; "
    "RefinedWeb reports domain concentration before filtering). "
    "Domain comes from the shared canonicalization chain; token "
    "counts are the whitespace tokenizer both engines share. Shares "
    "are doubles of exact integer sufficient statistics (identical "
    "IEEE division on both engines, C-rounded via the _norm "
    "floor-form). Plan: one narrow pass → one domain-keyed "
    "hash-aggregate exchange (domains ≪ docs), the one-row totals "
    "crossed in as a broadcast — at 100 TB the domain table is "
    "O(millions), trivially shuffle-able.",
    survey_ids=("M7-WEB2",),
)
def domain_share_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        F.expr(_DOMAIN).alias("domain"),
        TX.token_count_ws(F.col("text")).alias("n_tok"),
    )
    tot = per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("td"),
        F.sum("n_tok").cast("bigint").alias("tt"),
    )
    agg = per_doc.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "n_tokens",
        N.rnd(F.col("n_docs") * 1.0 / F.col("td"), 6).alias("doc_share"),
        N.rnd(F.col("n_tokens") * 1.0 / F.col("tt"), 6).alias(
            "token_share"
        ),
    )


@query(
    "domain_blocklist_filter",
    oracle=f"""
WITH tagged AS (
  SELECT lang, {_DOMAIN} AS domain,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
             w -> w <> '')) AS n_tok
  FROM documents
)
SELECT lang,
       CAST(coalesce(sum(CASE WHEN domain NOT IN {_BLOCK_SQL}
                          THEN 1 END), 0) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(CASE WHEN domain IN {_BLOCK_SQL}
                          THEN 1 END), 0) AS BIGINT) AS n_blocked,
       CAST(coalesce(sum(CASE WHEN domain NOT IN {_BLOCK_SQL}
                          THEN n_tok END), 0) AS BIGINT) AS kept_tokens
FROM tagged GROUP BY lang""",
    doc="Domain-blocklist filter audit (the C4 'bad domains' / "
    "RefinedWeb blocklist stage): documents whose canonical domain "
    "appears in a curated blocklist are dropped; per-language "
    "kept/blocked doc counts and surviving token mass are reported "
    "so the filter's selection bias is visible before it is applied. "
    "Implemented as a broadcast LEFT ANTI join against the blocklist "
    "frame (kept side) + a broadcast LEFT SEMI join (blocked side) — "
    "the 100 TB shape: the blocklist is thousands of rows against "
    "billions of pages, so it ships to every executor and the corpus "
    "never shuffles for the membership test; the only exchange is "
    "the |langs|-row final rollup.",
    survey_ids=("M7-WEB3",),
)
def domain_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tagged = d.select(
        "lang",
        F.expr(_DOMAIN).alias("domain"),
        TX.token_count_ws(F.col("text")).alias("n_tok"),
    )
    block = spark.createDataFrame(
        [(b,) for b in BLOCKLIST], "domain string"
    )
    kept = tagged.join(F.broadcast(block), "domain", "left_anti")
    blocked = tagged.join(F.broadcast(block), "domain", "left_semi")
    k = kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("n_tok").cast("bigint").alias("kept_tokens"),
    )
    b = blocked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocked")
    )
    return (
        k.join(b, "lang", "full_outer")
        .select(
            "lang",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("n_blocked", F.lit(0))
            .cast("bigint")
            .alias("n_blocked"),
            F.coalesce("kept_tokens", F.lit(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
    )


@query(
    "url_exact_dedup",
    oracle=f"""
WITH canon AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {_CANON_DUP} AS url_canon
  FROM documents
)
SELECT url_canon,
       CAST(min(doc_id) AS BIGINT) AS survivor_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM canon GROUP BY url_canon""",
    doc="URL-exact deduplication with the dedup_exact survivor "
    "discipline: documents are keyed by their CANONICAL url (the "
    "convergent construction — scheme case, www, :443, utm params "
    "and fragments all vary per doc but collapse under the shared "
    "canonicalization chain, path keyed coarse so duplicate fetches "
    "exist by construction), the lowest doc_id per url survives, and "
    "each group reports its multiplicity. This is the FIRST dedup "
    "any web pipeline runs — cheaper than any text-level method "
    "because the key is bytes-short and needs no tokenization. "
    "Plan: narrow projection → one url-keyed hash-aggregate "
    "(map-side partial min/count combine), no window, no self-join; "
    "at 100 TB the aggregate is the standard exact-dedup shuffle "
    "with ~bytes(url) per row.",
    survey_ids=("M7-WEB4",),
)
def url_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    canon = d.select(
        N.big("doc_id").alias("doc_id"),
        F.expr(_CANON_DUP).alias("url_canon"),
    )
    return canon.groupBy("url_canon").agg(
        F.min("doc_id").cast("bigint").alias("survivor_doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# FineWeb / RefinedWeb LINE-LEVEL quality tier (round 10): the
# line-granular filters every public web pipeline runs after the
# URL tier and before document-level gates (Penedo et al. 2024 §3.3,
# the C4 line rules of Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

# "Line" on this newline-free corpus = the non-overlapping 3-word
# segmentation (the paragraph_dedup_apply convention one width up from
# repetition_dedup_apply's 2; production corpora pass the real line
# splitter through the same parameter). 3 is the smallest width at
# which line lengths spread enough to make the short-line share
# non-degenerate (1..24 chars, median 15 at sf0.01) while within-doc
# duplicate lines still EXIST (3 dropped lines across 3 docs).
_LINE_SEG = 3
_LINE_SHORT_CHARS = 14  # "short line" threshold (chars), ~1st quartile

# Terminal-punctuation seeding (round 11, verdict ask #4): the alnum-only
# corpus has NO terminal punctuation, so the C4 `[.!?]$` signal was
# attested only as agreement-on-zero. Seed it CONTENT-KEYED — the line's
# last character picks the punctuation mark — so identical lines stay
# identical (the within-page dup structure of line_dedup_apply is
# preserved) and the seed is the same pure expression on both engines
# (the simhash_hamming_pairs exact-copy-seeding discipline). 'e'/'r'/'n'
# are the three most common word endings (~40% of lines combined), so
# every char of the [.!?] class attests a NON-ZERO count cross-engine.
_SEED_PUNCT_SQL = (
    "CASE WHEN seg LIKE '%e' THEN seg || '.'"
    " WHEN seg LIKE '%r' THEN seg || '!'"
    " WHEN seg LIKE '%n' THEN seg || '?'"
    " ELSE seg END"
)

# Shared DuckDB segs CTE: one row per (doc, line), punctuation-seeded.
_LINE_SEGS_SQL = f"""w AS MATERIALIZED (
  SELECT doc_id, lang, {{words}} AS ws FROM documents
), segs0 AS MATERIALIZED (
  SELECT doc_id, lang,
         unnest(range(0, CAST(ceil(len(ws) / {_LINE_SEG}.0) AS BIGINT)))
           AS seg_idx,
         unnest(list_transform(
           range(0, CAST(ceil(len(ws) / {_LINE_SEG}.0) AS BIGINT)),
           i -> array_to_string(
             ws[i * {_LINE_SEG} + 1 : i * {_LINE_SEG} + {_LINE_SEG}], ' ')
         )) AS seg
  FROM w
), segs AS MATERIALIZED (
  SELECT doc_id, lang, seg_idx, {_SEED_PUNCT_SQL} AS seg FROM segs0
)"""


def _line_segs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the segs CTE: (doc_id, lang, seg_idx, seg) with the
    content-keyed terminal-punctuation seed applied."""
    from project_bigdata_spark.operators.corpus import segments_col
    from project_bigdata_spark.operators.dedup import words_col

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            N.big("doc_id").alias("doc_id"),
            "lang",
            words_col(F.col("text")).alias("_ws"),
        )
        .select(
            "doc_id",
            "lang",
            F.posexplode(segments_col(F.col("_ws"), _LINE_SEG)).alias(
                "seg_idx", "seg"
            ),
        )
        .withColumn("seg", F.expr(_SEED_PUNCT_SQL))
    )


@query(
    "line_quality_stats",
    oracle=f"""
WITH {_LINE_SEGS_SQL.format(words=WORDS_SQL)}
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN length(seg) < {_LINE_SHORT_CHARS} THEN 1
                ELSE 0 END) AS BIGINT) AS n_short,
       round(CAST(sum(CASE WHEN length(seg) < {_LINE_SHORT_CHARS} THEN 1
                ELSE 0 END) AS DOUBLE) / count(*), 6) AS short_line_share,
       round(CAST(sum(CASE WHEN regexp_matches(seg, '[.!?]$') THEN 1
                ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS terminal_punct_line_share,
       round(CAST(sum(length(seg)) AS DOUBLE) / count(*), 6)
         AS avg_line_chars,
       CAST(max(length(seg)) AS BIGINT) AS max_line_chars
FROM segs GROUP BY doc_id""",
    doc="FineWeb/RefinedWeb line-level quality measurements per page "
    "(Penedo et al. 2024 §3.3; C4's line rules, Raffel et al. 2020 "
    "§2.2): line count, SHORT-line count/share (< "
    f"{_LINE_SHORT_CHARS} chars — the signal C4 uses at 3 words / "
    "FineWeb at 30 chars), terminal-punctuation line share (the C4 "
    "'retain only lines ending in terminal punctuation' signal — the "
    "alnum-only corpus carries none, so the shared seg frame seeds "
    "punctuation content-keyed (_SEED_PUNCT_SQL) and the [.!?]$ regex "
    "attests a NON-ZERO share cross-engine, ~40% at sf0.01), "
    "and line-length moments. Lines are the 3-word segmentation (see "
    "_LINE_SEG note). Shares are single IEEE divisions of exact "
    "integer counts rounded 6dp. Plan: one projection + posexplode + "
    "one doc-keyed hash aggregate — segments never cross documents, "
    "so at 100 TB this is one map-side-combining shuffle of counters "
    "keyed by doc_id, embarrassingly parallel per page.",
    survey_ids=("M7-WEB5",),
)
def line_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = _line_segs(spark, sf_dir)
    ln = F.length("seg")
    return segs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(ln < _LINE_SHORT_CHARS, 1).otherwise(0))
        .cast("bigint")
        .alias("n_short"),
        N.rnd(
            F.sum(F.when(ln < _LINE_SHORT_CHARS, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("short_line_share"),
        N.rnd(
            F.sum(
                F.when(F.col("seg").rlike("[.!?]$"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("terminal_punct_line_share"),
        N.rnd(F.sum(ln).cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_line_chars"
        ),
        F.max(ln).cast("bigint").alias("max_line_chars"),
    )


@query(
    "line_dedup_apply",
    oracle=f"""
WITH {_LINE_SEGS_SQL.format(words=WORDS_SQL)},
r AS (
  SELECT doc_id, seg_idx, seg,
         row_number() OVER (PARTITION BY doc_id, md5(seg)
                            ORDER BY seg_idx) AS rn
  FROM segs
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(coalesce(sum(CASE WHEN rn = 1 THEN 1 END), 0) AS BIGINT)
         AS n_kept,
       round(CAST(coalesce(sum(CASE WHEN rn > 1 THEN length(seg) END), 0)
             AS DOUBLE) / sum(length(seg)), 6) AS removed_char_share,
       md5(coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
                    FILTER (WHERE rn = 1), '')) AS dedup_md5
FROM r GROUP BY doc_id""",
    doc="WITHIN-page line deduplication apply — the FineWeb/RefinedWeb "
    "'remove duplicated lines within the page' transform with its "
    "duplicated-LINE-CHARACTER share readout (the dup_line_char_frac "
    "signal of Rae et al. 2021 Table A1, applied not just measured): "
    "first occurrence of each line wins, later copies drop, and the "
    "kept page is reassembled in position order and md5-attested — "
    "repetition_dedup_apply's discipline one granularity up "
    "(paragraph=2-word there, line=3-word here; guard-active: 3 "
    "dropped lines at sf0.01). The rank window partitions by (doc, "
    "line-digest) and the reassembly by doc — both exchanges keyed "
    "by doc_id, co-partitionable, NO cross-document text shuffle; at "
    "100 TB this is embarrassingly parallel per page.",
    survey_ids=("M7-WEB6",),
)
def line_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    segs = _line_segs(spark, sf_dir)
    first = Window.partitionBy("doc_id", F.md5("seg")).orderBy("seg_idx")
    r = segs.withColumn("rn", F.row_number().over(first))
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.coalesce(F.sum(F.when(F.col("rn") == 1, 1)), F.lit(0))
        .cast("bigint")
        .alias("n_kept"),
        N.rnd(
            F.coalesce(
                F.sum(F.when(F.col("rn") > 1, F.length("seg"))), F.lit(0)
            ).cast("double")
            / F.sum(F.length("seg")),
            6,
        ).alias("removed_char_share"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1,
                                F.struct("seg_idx", "seg"),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            )
        ).alias("dedup_md5"),
    )


# Exact integer gate predicates (cross-multiplied, float never enters
# the keep/drop decision): short-line share <= 1/4, duplicated-line
# char share <= 1/20, at least 8 lines.
_LG_FAIL_SHORT = f"(4 * n_short > n_lines)"
_LG_FAIL_DUP = "(20 * dup_chars > tot_chars)"
_LG_FAIL_FEW = "(n_lines < 8)"


@query(
    "line_gate_filter",
    oracle=f"""
WITH {_LINE_SEGS_SQL.format(words=WORDS_SQL)},
r AS (
  SELECT doc_id, lang, seg_idx, seg,
         row_number() OVER (PARTITION BY doc_id, md5(seg)
                            ORDER BY seg_idx) AS rn
  FROM segs
), m0 AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN length(seg) < {_LINE_SHORT_CHARS} THEN 1
                  ELSE 0 END) AS BIGINT) AS n_short,
         CAST(coalesce(sum(CASE WHEN rn > 1 THEN length(seg) END), 0)
              AS BIGINT) AS dup_chars,
         CAST(sum(length(seg)) AS BIGINT) AS tot_chars
  FROM r GROUP BY doc_id
), m AS (
  SELECT d.lang,
         coalesce(m0.n_lines, 0) AS n_lines,
         coalesce(m0.n_short, 0) AS n_short,
         coalesce(m0.dup_chars, 0) AS dup_chars,
         coalesce(m0.tot_chars, 0) AS tot_chars
  FROM documents d LEFT JOIN m0 ON d.doc_id = m0.doc_id
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN NOT ({_LG_FAIL_SHORT} OR {_LG_FAIL_DUP} OR
                {_LG_FAIL_FEW}) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN {_LG_FAIL_SHORT} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fail_short,
       CAST(sum(CASE WHEN {_LG_FAIL_DUP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fail_dup,
       CAST(sum(CASE WHEN {_LG_FAIL_FEW} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fail_few
FROM m GROUP BY lang""",
    doc="FineWeb line-level page GATE: drop pages whose short-line "
    "share exceeds 1/4, whose duplicated-line character share exceeds "
    "1/20, or with fewer than 8 lines — the page-level keep/drop the "
    "line measurements exist to feed (Penedo et al. 2024 §3.3 drop "
    "rules), reported per language with per-gate failure counts (a "
    "page can fail several gates; kept = passes ALL). All three "
    "predicates are EXACT integer cross-multiplications — float never "
    "enters the keep/drop decision (the gopher_quality_gates "
    "discipline; every gate active at sf0.01). Zero-line (empty-text) "
    "pages are left-joined back from documents so they count in n_docs "
    "and fail the few-lines gate instead of vanishing from the census. "
    "Plan: the line frame aggregates to one row per page (doc-keyed, "
    "map-side combined), then the gate is a |langs|-row census — at "
    "100 TB the text is read once and nothing but per-page counters "
    "ever shuffles.",
    survey_ids=("M7-WEB7",),
)
def line_gate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    segs = _line_segs(spark, sf_dir)
    first = Window.partitionBy("doc_id", F.md5("seg")).orderBy("seg_idx")
    r = segs.withColumn("rn", F.row_number().over(first))
    m0 = r.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(F.length("seg") < _LINE_SHORT_CHARS, 1).otherwise(0))
        .cast("bigint")
        .alias("n_short"),
        F.coalesce(
            F.sum(F.when(F.col("rn") > 1, F.length("seg"))), F.lit(0)
        )
        .cast("bigint")
        .alias("dup_chars"),
        F.sum(F.length("seg")).cast("bigint").alias("tot_chars"),
    )
    # zero-line (empty-text) pages never reach the seg frame, but they
    # ARE pages: left-join the stats back onto documents so they count
    # in n_docs and fail the n_lines < 8 gate instead of vanishing
    docs = load_table(spark, sf_dir, "documents").select(
        N.big("doc_id").alias("doc_id"), "lang"
    )
    m = docs.join(m0, "doc_id", "left").select(
        "lang",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
            for c in ("n_lines", "n_short", "dup_chars", "tot_chars")
        ],
    )
    keep = F.expr(
        f"NOT ({_LG_FAIL_SHORT} OR {_LG_FAIL_DUP} OR {_LG_FAIL_FEW})"
    )
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(F.expr(_LG_FAIL_SHORT), 1).otherwise(0))
        .cast("bigint")
        .alias("n_fail_short"),
        F.sum(F.when(F.expr(_LG_FAIL_DUP), 1).otherwise(0))
        .cast("bigint")
        .alias("n_fail_dup"),
        F.sum(F.when(F.expr(_LG_FAIL_FEW), 1).otherwise(0))
        .cast("bigint")
        .alias("n_fail_few"),
    )


# ---------------------------------------------------------------------------
# pii_redaction_apply (round 10) — the redaction APPLY next to the
# luhn_pii_audit measurement (M7-T19): every public pipeline's
# pre-release step (C4 strips lines with bad words; FineWeb/RefinedWeb
# anonymize emails + IPs before publishing — Penedo et al. 2024 §5)
# ---------------------------------------------------------------------------

# The corpus carries no PII, so the entry uses the URL family's
# deterministic-construction discipline: exactly ONE email and ONE
# phone-shaped span injected per document from (doc_id, source) — the
# same expression on both engines. Single-occurrence matching is
# REQUIRED for dialect parity (DuckDB's regexp_replace replaces only
# the first match, Spark's replaces all), so the patterns are ANCHORED
# to the injected prefixes (' contact user…', ' call 555-…'): even if
# corpus text ever contained a bare '@' or '555-NNNN' token, both
# engines would still rewrite exactly the constructed span and nothing
# else. Literal dots are written [.] — a backslash escape would be
# eaten by Spark SQL's string literal but kept by DuckDB's, silently
# changing the pattern on one engine only.
_PII_TEXT = (
    "(text || ' contact user' || CAST(doc_id AS BIGINT) || '@' || source"
    " || '.example.com or call 555-'"
    " || lpad(CAST(doc_id % 10000 AS BIGINT) || '', 4, '0'))"
)
_PII_EMAIL_RE = "' contact user[0-9]+@[a-z0-9.]+'"
_PII_PHONE_RE = "' call 555-[0-9]{4}'"
_PII_REDACT = (
    f"regexp_replace(regexp_replace({_PII_TEXT}, {_PII_EMAIL_RE},"
    " ' contact <EMAIL>'), "
    f"{_PII_PHONE_RE}, ' call <PHONE>')"
)


@query(
    "pii_redaction_apply",
    oracle=f"""
WITH r AS (
  SELECT doc_id,
         {_PII_TEXT} AS raw,
         {_PII_REDACT} AS redacted
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN redacted LIKE '%<EMAIL>%' THEN 1 ELSE 0 END
            AS BIGINT) AS n_email_redactions,
       CAST(CASE WHEN redacted LIKE '%<PHONE>%' THEN 1 ELSE 0 END
            AS BIGINT) AS n_phone_redactions,
       CAST(length(raw) - length(redacted) AS BIGINT) AS chars_removed,
       CAST(CASE WHEN redacted NOT LIKE '%@%'
                  AND redacted NOT LIKE '%555-%' THEN 1 ELSE 0 END
            AS BIGINT) AS clean,
       md5(redacted) AS redacted_md5
FROM r""",
    doc="PII redaction APPLY — the rewrite twin of the luhn_pii_audit "
    "measurement and the step every public corpus runs before release "
    "(FineWeb anonymizes emails before publishing, Penedo et al. 2024 "
    "§5): email and phone-shaped spans are replaced with <EMAIL>/"
    "<PHONE> placeholders, and the rewrite is attested three ways — "
    "per-pattern redaction counts, a chars-removed delta, a residual "
    "scan proving no '@' or '555-' survives, and the md5 of the full "
    "redacted text (both engines hash their own rewrite; a single "
    "diverging byte anywhere in any document flips the value hash). "
    "The corpus carries no PII, so exactly one email + one phone are "
    "injected deterministically per doc from (doc_id, source), and the "
    "patterns are ANCHORED to the injected prefixes so both engines "
    "match only the constructed span regardless of corpus content "
    "(DuckDB regexp_replace rewrites the FIRST match, Spark ALL of "
    "them — anchoring makes the two agree); literal dots are [.]-classed "
    "because Spark SQL string literals eat backslash escapes that "
    "DuckDB keeps. Plan: one narrow projection pass, two codegen "
    "regexp_replace calls, zero shuffles, zero UDFs — at 100 TB "
    "redaction is scan-speed and embarrassingly parallel per page.",
    survey_ids=("M7-WEB8",),
)
def pii_redaction_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    r = d.select(
        N.big("doc_id").alias("doc_id"),
        F.expr(_PII_TEXT).alias("raw"),
        F.expr(_PII_REDACT).alias("redacted"),
    )
    return r.select(
        "doc_id",
        F.expr(
            "CAST(CASE WHEN redacted LIKE '%<EMAIL>%' THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("n_email_redactions"),
        F.expr(
            "CAST(CASE WHEN redacted LIKE '%<PHONE>%' THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("n_phone_redactions"),
        (F.length("raw") - F.length("redacted"))
        .cast("bigint")
        .alias("chars_removed"),
        F.expr(
            "CAST(CASE WHEN redacted NOT LIKE '%@%'"
            " AND redacted NOT LIKE '%555-%' THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("clean"),
        F.md5("redacted").alias("redacted_md5"),
    )
