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
