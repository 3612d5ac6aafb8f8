"""Round-6 evaluation-metric catalog entries (staged BEHIND the round-6
attestation window — driver rows land in round 7).

The measurement layer every retrieval / curation stack owes its users:

- ``ndcg_eval``             — NDCG@10 of the dense (stub-encoder cosine)
  ranking against lexical graded relevance (#query terms present, 0-3);
  the semantic-vs-lexical agreement audit of the hybrid stack.
- ``precision_recall_at_k`` — P@k / R@k (k in {5, 10, 20}) of the same
  ranking against binary relevance (>= 2 query terms).
- ``roc_curve_points``      — exact ROC points of the composite quality
  score as a detector of English documents, at the nine 0.1-grid
  thresholds (the operating-point table behind quality_auc's scalar).
- ``calibration_bins``      — 10-bin reliability diagram of the quality
  score vs the empirical P(lang = 'en') per bin (is the score a
  calibrated probability or just a ranker?).

Cross-engine determinism: cosines and quality scores live on integer
grids (1e-6 cents), relevance grades and confusion counts are exact
integers, and every DCG term is rel * W_i with W_i = 1/log2(i+1) a
shared Python literal — each term snapped to the 1e-9 grid and summed
as integers (snap-then-sum, the kaplan_meier recipe), so rank order,
every count, and every rendered double replay bit-identically.

Reference parity: the reference has no evaluation layer; these are the
standard IR-metric completions (Järvelin & Kekäläinen 2002 for NDCG) of
the retrieval surface built in rounds 3-4.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.plans.corpus_queries import _stub_e_sql
from project_bigdata_spark.plans.text_queries import WORDS_SQL
from project_bigdata_spark.sources import load_table

_QTEXT = "spark window join"
_QTERMS = ("spark", "window", "join")

# stub-encoder cosine of every document against the fixed query text,
# replayed in SQL (the hybrid_rrf_search construction)
_Q_SQL = f"'{_QTEXT}'"
_DOT = " + ".join(
    f"({_stub_e_sql('text', k)} * {_stub_e_sql(_Q_SQL, k)})" for k in range(8)
)
_NA = "sqrt(" + " + ".join(
    f"({_stub_e_sql('text', k)} * {_stub_e_sql('text', k)})" for k in range(8)
) + ")"
_NB = "sqrt(" + " + ".join(
    f"({_stub_e_sql(_Q_SQL, k)} * {_stub_e_sql(_Q_SQL, k)})" for k in range(8)
) + ")"
_COS_SQL = f"(({_DOT}) / ({_NA} * {_NB}))"

_REL_SQL = " + ".join(
    f"(CASE WHEN list_contains({WORDS_SQL}, '{t}') THEN 1 ELSE 0 END)"
    for t in _QTERMS
)

# W_i = 1/log2(i+1) for ranks 1..20 — shared literals on both engines
_INV_LOG2 = {i: 1.0 / math.log2(i + 1) for i in range(1, 21)}
_W_CASES_SQL = " ".join(f"WHEN {i} THEN {w!r}" for i, w in _INV_LOG2.items())

# the scored CTE both document-eval entries share (SQL side)
_SCORED_SQL = f"""
scored AS (
  SELECT doc_id,
         {N.sql_cents(_COS_SQL, 10**6)} AS c6,
         CAST({_REL_SQL} AS BIGINT) AS rel
  FROM documents
)"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, c6 = 1e-6-grid stub cosine vs the query, rel = 0..3)."""
    from project_bigdata_spark.operators import multimodal as MM
    from project_bigdata_spark.operators import similarity as SIM
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    d = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    emb = MM.text_to_embedding(d)
    qrow = MM.text_to_embedding(
        spark.createDataFrame([(-1, _QTEXT)], "doc_id long, text string")
    ).select(F.col("embedding").alias("_q"))
    ws = words_col(F.col("text"))
    # coalesce per term: array_contains over a NULL text yields NULL in
    # Spark while the oracle's CASE WHEN yields 0 — grade NULL text as
    # rel=0 on both engines (round-6 advice).
    rel = sum(
        F.coalesce(F.array_contains(ws, t).cast("bigint"), F.lit(0))
        for t in _QTERMS
    )
    return (
        d.join(emb.select("doc_id", "embedding"), "doc_id")
        .crossJoin(F.broadcast(qrow))
        .select(
            "doc_id",
            N.cents(SIM.cosine(F.col("embedding"), F.col("_q")), 10**6)
            .alias("c6"),
            rel.alias("rel"),
        )
    )


def _w_col(rank_col) -> F.Column:
    """1/log2(rank+1) as the shared literal CASE (identical both engines)."""
    crit = F.lit(None).cast("double")
    for i, w in sorted(_INV_LOG2.items(), reverse=True):
        crit = F.when(rank_col == i, F.lit(w)).otherwise(crit)
    return crit


@query(
    "ndcg_eval",
    oracle=f"""
WITH {_SCORED_SQL},
topd AS (
  SELECT rel, row_number() OVER (ORDER BY c6 DESC, doc_id) AS rk
  FROM scored QUALIFY rk <= 10
), topi AS (
  SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rk
  FROM scored QUALIFY rk <= 10
), dcg AS (
  SELECT sum({N.sql_cents("rel * (CASE rk " + _W_CASES_SQL + " END)", 10**9)})
           AS d9
  FROM topd
), idcg AS (
  SELECT sum({N.sql_cents("rel * (CASE rk " + _W_CASES_SQL + " END)", 10**9)})
           AS i9
  FROM topi
)
SELECT CAST(10 AS BIGINT) AS k,
       round(CAST(d9 AS DOUBLE) / 1e9, 6) AS dcg,
       round(CAST(i9 AS DOUBLE) / 1e9, 6) AS idcg,
       CASE WHEN i9 = 0 THEN NULL
            ELSE round(CAST(d9 AS DOUBLE) / CAST(i9 AS DOUBLE), 6)
       END AS ndcg
FROM dcg, idcg""",
    doc="NDCG@10 of the dense stub-encoder ranking against lexical graded "
    "relevance (how many of the query's 3 terms a document contains, "
    "0-3) — the agreement audit between the semantic and lexical faces "
    "of the hybrid retrieval stack (Järvelin & Kekäläinen 2002). Every "
    "DCG term is rel * W_rank with W = 1/log2(rank+1) a shared literal, "
    "snapped to the 1e-9 grid and integer-summed (snap-then-sum), so "
    "DCG, ideal DCG and their ratio replay bit-identically. Plan: one "
    "fanned-out scoring pass; two TakeOrdered top-10 cuts (ranked by "
    "(1e-6-grid cosine, doc_id) and (rel, doc_id) — fully tie-broken); "
    "two 10-row reduces.",
    survey_ids=("M7-R7",),
)
def ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored(spark, sf_dir).localCheckpoint()
    w1 = Window.partitionBy(F.lit(1))

    def top10(order):
        return (
            scored.orderBy(*order)
            .limit(10)
            .select(
                "rel",
                F.row_number().over(w1.orderBy(*order)).alias("rk"),
            )
        )

    topd = top10([F.desc("c6"), F.col("doc_id")])
    topi = top10([F.desc("rel"), F.col("doc_id")])

    def dcg9(df):
        return df.agg(
            F.sum(N.cents(F.col("rel") * _w_col(F.col("rk")), 10**9)).alias(
                "x9"
            )
        )

    d9 = dcg9(topd).withColumnRenamed("x9", "d9")
    i9 = dcg9(topi).withColumnRenamed("x9", "i9")
    return d9.crossJoin(i9).select(
        F.lit(10).cast("bigint").alias("k"),
        N.rnd(F.col("d9").cast("double") / 1e9, 6).alias("dcg"),
        N.rnd(F.col("i9").cast("double") / 1e9, 6).alias("idcg"),
        F.when(F.col("i9") == 0, F.lit(None).cast("double"))
        .otherwise(
            N.rnd(
                F.col("d9").cast("double") / F.col("i9").cast("double"), 6
            )
        )
        .alias("ndcg"),
    )


@query(
    "precision_recall_at_k",
    oracle=f"""
WITH {_SCORED_SQL},
ranked AS (
  SELECT CASE WHEN rel >= 2 THEN 1 ELSE 0 END AS hit,
         row_number() OVER (ORDER BY c6 DESC, doc_id) AS rk
  FROM scored
), tot AS (
  SELECT CAST(sum(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rel
  FROM scored
), ks(k) AS (VALUES (5), (10), (20))
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(sum(r.hit) AS BIGINT) AS hits,
       tot.n_rel,
       round(CAST(sum(r.hit) AS DOUBLE) / ks.k, 6) AS precision_at_k,
       CASE WHEN tot.n_rel = 0 THEN NULL
            ELSE round(CAST(sum(r.hit) AS DOUBLE) / tot.n_rel, 6)
       END AS recall_at_k
FROM ranked r CROSS JOIN ks CROSS JOIN tot
WHERE r.rk <= ks.k
GROUP BY ks.k, tot.n_rel""",
    doc="Precision@k and Recall@k (k in {5, 10, 20}) of the dense "
    "stub-encoder ranking against binary lexical relevance (>= 2 of "
    "the 3 query terms present) — the operating-point companions of "
    "ndcg_eval's graded summary. All hits and totals are exact "
    "integer counts over the fully tie-broken (1e-6-grid cosine, "
    "doc_id) rank; the two divisions render at the end. Plan: one "
    "fanned-out scoring pass, one TakeOrdered top-20 cut crossed with "
    "the 3-row k table, one scalar relevant-total reduce.",
    survey_ids=("M7-R8",),
)
def precision_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored(spark, sf_dir).localCheckpoint()
    hit = (F.col("rel") >= 2).cast("bigint")
    top = (
        scored.orderBy(F.desc("c6"), "doc_id")
        .limit(20)
        .select(
            hit.alias("hit"),
            F.row_number()
            .over(Window.partitionBy(F.lit(1)).orderBy(F.desc("c6"), "doc_id"))
            .alias("rk"),
        )
    )
    tot = scored.agg(F.sum(hit).cast("bigint").alias("n_rel"))
    ks = spark.createDataFrame([(5,), (10,), (20,)], "k int")
    return (
        top.crossJoin(F.broadcast(ks))
        .filter(F.col("rk") <= F.col("k"))
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("k").cast("bigint").alias("k"), F.col("n_rel"))
        .agg(F.sum("hit").cast("bigint").alias("hits"))
        .select(
            "k",
            "hits",
            "n_rel",
            N.rnd(F.col("hits").cast("double") / F.col("k"), 6).alias(
                "precision_at_k"
            ),
            F.when(F.col("n_rel") == 0, F.lit(None).cast("double"))
            .otherwise(
                N.rnd(F.col("hits").cast("double") / F.col("n_rel"), 6)
            )
            .alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# roc_curve_points / calibration_bins — the quality score as an English
# detector (the operating-point and calibration views behind
# quality_auc's scalar summary)
# ---------------------------------------------------------------------------

# the composite quality score on the 1e-6 integer grid (the quality_auc
# construction), replayed from text_queries' shared SQL fragment
def _qscored_sql() -> str:
    from project_bigdata_spark.plans.text_queries import _QUALITY_SQL

    return f"""
qscored AS (
  SELECT {N.sql_cents(_QUALITY_SQL, 10**6)} AS s6,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
)"""


def _qscored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators import text as TX
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    d = fan_out(load_table(spark, sf_dir, "documents").select("lang", "text"))
    ws = d.select("lang", "text", words_col(F.col("text")).alias("_ws"))
    return ws.select(
        N.cents(
            TX.quality_score(F.col("text"), ws=F.col("_ws")), 10**6
        ).alias("s6"),
        (F.col("lang") == "en").cast("bigint").alias("pos"),
    )


@query(
    "roc_curve_points",
    oracle=f"""
WITH {{qscored}},
thr(t6) AS (VALUES (100000), (200000), (300000), (400000), (500000),
                   (600000), (700000), (800000), (900000)),
tot AS (
  SELECT CAST(sum(pos) AS BIGINT) AS p,
         CAST(count(*) - sum(pos) AS BIGINT) AS n
  FROM qscored
)
SELECT round(thr.t6 / 1e6, 1) AS threshold,
       CAST(sum(CASE WHEN q.s6 >= thr.t6 THEN q.pos ELSE 0 END) AS BIGINT)
         AS tp,
       CAST(sum(CASE WHEN q.s6 >= thr.t6 THEN 1 - q.pos ELSE 0 END)
            AS BIGINT) AS fp,
       tot.p AS n_pos, tot.n AS n_neg,
       CASE WHEN tot.p = 0 THEN 0.0e0 ELSE
         round(CAST(sum(CASE WHEN q.s6 >= thr.t6 THEN q.pos ELSE 0 END)
                    AS DOUBLE) / tot.p, 6) END AS tpr,
       CASE WHEN tot.n = 0 THEN 0.0e0 ELSE
         round(CAST(sum(CASE WHEN q.s6 >= thr.t6 THEN 1 - q.pos ELSE 0 END)
                    AS DOUBLE) / tot.n, 6) END AS fpr
FROM qscored q CROSS JOIN thr CROSS JOIN tot
GROUP BY thr.t6, tot.p, tot.n""".format(qscored=_qscored_sql()),
    doc="Exact ROC operating points of the composite quality score as a "
    "detector of English documents, at the nine 0.1-grid thresholds — "
    "the per-threshold table behind quality_auc's scalar (a fairness "
    "audit needs to know WHERE on the curve a cutoff sits, not just "
    "the area). Scores live on the 1e-6 integer grid so every "
    "threshold compare is an integer inequality; TP/FP/position "
    "totals are exact counts and TPR/FPR render as one division. "
    "Plan: one fanned-out scoring pass crossed with the 9-row literal "
    "threshold table (a constant 9x explode), one aggregate, one "
    "broadcast totals row.",
    survey_ids=("M7-ML17",),
)
def roc_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _qscored(spark, sf_dir).localCheckpoint()
    thr = spark.createDataFrame(
        [(i * 100000,) for i in range(1, 10)], "t6 int"
    )
    tot = q.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("bigint").alias("n_neg"),
    )
    hit = (F.col("s6") >= F.col("t6")).cast("bigint")
    return (
        q.crossJoin(F.broadcast(thr))
        .groupBy("t6")
        .agg(
            F.sum(hit * F.col("pos")).cast("bigint").alias("tp"),
            F.sum(hit * (1 - F.col("pos"))).cast("bigint").alias("fp"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            N.rnd(F.col("t6") / 1e6, 1).alias("threshold"),
            "tp",
            "fp",
            "n_pos",
            "n_neg",
            # an empty class makes the rate a 0/0 — decide on the exact
            # integer total BEFORE the division (ANSI throws, DuckDB NULLs)
            F.when(
                F.col("n_pos") > 0,
                N.rnd(F.col("tp").cast("double") / F.col("n_pos"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("tpr"),
            F.when(
                F.col("n_neg") > 0,
                N.rnd(F.col("fp").cast("double") / F.col("n_neg"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("fpr"),
        )
    )


@query(
    "calibration_bins",
    oracle=f"""
WITH {{qscored}}
SELECT CAST(least(s6 // 100000, 9) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(s6) AS DOUBLE) / count(*) / 1e6, 6) AS mean_score,
       round(CAST(sum(pos) AS DOUBLE) / count(*), 6) AS en_rate,
       round(abs(CAST(sum(s6) AS DOUBLE) / count(*) / 1e6
                 - CAST(sum(pos) AS DOUBLE) / count(*)), 6) AS gap
FROM qscored GROUP BY 1""".format(qscored=_qscored_sql()),
    doc="Reliability diagram of the quality score vs the empirical "
    "P(lang = 'en') in 10 fixed-width score bins — is the score a "
    "calibrated probability or only a ranker? (The Brier/ECE-style "
    "readout a filter needs before its threshold is treated as a "
    "confidence.) Bin ids are integer divisions on the 1e-6 score "
    "grid; per-bin sums are exact integers; the three rendered "
    "doubles are fixed expressions over them. Plan: one fanned-out "
    "scoring pass, one 10-group aggregate.",
    survey_ids=("M7-ML18",),
)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _qscored(spark, sf_dir)
    return (
        q.groupBy(
            F.least(F.floor(F.col("s6") / 100000), F.lit(9))
            .cast("bigint")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("s6").alias("_s"),
            F.sum("pos").alias("_p"),
        )
        .select(
            "bin",
            "n_docs",
            N.rnd(
                F.col("_s").cast("double") / F.col("n_docs") / 1e6, 6
            ).alias("mean_score"),
            N.rnd(F.col("_p").cast("double") / F.col("n_docs"), 6).alias(
                "en_rate"
            ),
            N.rnd(
                F.abs(
                    F.col("_s").cast("double") / F.col("n_docs") / 1e6
                    - F.col("_p").cast("double") / F.col("n_docs")
                ),
                6,
            ).alias("gap"),
        )
    )


# ---------------------------------------------------------------------------
# mrr_map_eval (round 8, second window) — MRR + MAP@100 of the dense
# ranking: the rank-position companions of precision_recall_at_k
# ---------------------------------------------------------------------------


@query(
    "mrr_map_eval",
    oracle=f"""
WITH {_SCORED_SQL},
top AS (
  SELECT CASE WHEN rel >= 2 THEN 1 ELSE 0 END AS hit,
         row_number() OVER (ORDER BY c6 DESC, doc_id) AS rk
  FROM scored QUALIFY rk <= 100
), tot AS (
  SELECT CAST(sum(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
  FROM scored
), cum AS (
  SELECT rk, hit,
         sum(hit) OVER (ORDER BY rk
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS h
  FROM top
), ap AS (
  SELECT sum(CASE WHEN hit = 1
                  THEN {N.sql_cents('CAST(h AS DOUBLE) / rk', 10**9)}
                  ELSE 0 END) AS ap9,
         min(CASE WHEN hit = 1 THEN rk END) AS first_rk
  FROM cum
)
SELECT CAST(100 AS BIGINT) AS k,
       tot.n_rel,
       CAST(ap.first_rk AS BIGINT) AS first_hit_rank,
       CASE WHEN ap.first_rk IS NULL THEN NULL
            ELSE round(1.0 / ap.first_rk, 6) END AS mrr,
       CASE WHEN tot.n_rel = 0 THEN NULL
            ELSE round(CAST(ap.ap9 AS DOUBLE) / 1e9
                       / least(tot.n_rel, 100), 6)
       END AS map_at_k
FROM ap, tot""",
    doc="Reciprocal rank of the first relevant document and average "
    "precision at k=100 (MAP@100) of the dense stub-encoder ranking "
    "against binary lexical relevance (>= 2 of the 3 query terms) — "
    "the single-number rank-position summaries that complete the IR "
    "evaluation tier (ndcg_eval grades the top profile, "
    "precision_recall_at_k the operating points; MRR/MAP are the "
    "leaderboard standards, Voorhees TREC-8). Every AP term is "
    "hits_so_far/rank over the fully tie-broken (1e-6-grid cosine, "
    "doc_id) rank, snapped to the 1e-9 grid and integer-summed "
    "(snap-then-sum), so both metrics replay bit-identically. Plan: "
    "one fanned-out scoring pass; one TakeOrdered top-100 cut (the "
    "windows after it run on 100 rows — bounded by construction, not "
    "by data); one scalar relevant-total reduce.",
    survey_ids=("M7-R9",),
)
def mrr_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored(spark, sf_dir).localCheckpoint()
    hit = (F.col("rel") >= 2).cast("bigint")
    order = [F.desc("c6"), F.col("doc_id")]
    w1 = Window.partitionBy(F.lit(1)).orderBy(*order)
    top = (
        scored.orderBy(*order)
        .limit(100)
        .select(hit.alias("hit"), F.row_number().over(w1).alias("rk"))
    )
    wcum = (
        Window.partitionBy(F.lit(1))
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = top.select("rk", "hit", F.sum("hit").over(wcum).alias("h"))
    ap = cum.agg(
        F.sum(
            F.when(
                F.col("hit") == 1,
                N.cents(F.col("h").cast("double") / F.col("rk"), 10**9),
            ).otherwise(F.lit(0))
        ).alias("ap9"),
        F.min(F.when(F.col("hit") == 1, F.col("rk"))).alias("first_rk"),
    )
    tot = scored.agg(F.sum(hit).cast("bigint").alias("n_rel"))
    return ap.crossJoin(F.broadcast(tot)).select(
        F.lit(100).cast("bigint").alias("k"),
        "n_rel",
        F.col("first_rk").cast("bigint").alias("first_hit_rank"),
        F.when(F.col("first_rk").isNull(), F.lit(None).cast("double"))
        .otherwise(N.rnd(F.lit(1.0) / F.col("first_rk"), 6))
        .alias("mrr"),
        F.when(F.col("n_rel") == 0, F.lit(None).cast("double"))
        .otherwise(
            N.rnd(
                F.col("ap9").cast("double")
                / 1e9
                / F.least(F.col("n_rel"), F.lit(100)),
                6,
            )
        )
        .alias("map_at_k"),
    )


# ---------------------------------------------------------------------------
# brier_decomposition (round 8, sixth wave) — Murphy (1973) decomposition
# of the Brier score into reliability / resolution / uncertainty over
# the 10 calibration bins (the additive view behind calibration_bins'
# per-bin gaps: WHY is the score what it is?)
# ---------------------------------------------------------------------------


@query(
    "brier_decomposition",
    oracle=f"""
WITH {{qscored}},
facts AS (
  SELECT CAST(count(*) AS BIGINT) AS nn,
         CAST(sum(pos) AS BIGINT) AS pp,
         sum({N.sql_cents("(s6 / 1e6 - pos) * (s6 / 1e6 - pos)", 10**9)})
           AS br9
  FROM qscored
), bins AS (
  SELECT least(CAST(floor(s6 / 100000) AS BIGINT), 9) AS bin,
         CAST(count(*) AS BIGINT) AS nk,
         CAST(sum(s6) AS BIGINT) AS ss,
         CAST(sum(pos) AS BIGINT) AS pk
  FROM qscored GROUP BY 1
), comp AS (
  SELECT
    sum({N.sql_cents(
        "nk * ((ss / (1.0e0 * nk) / 1e6) - (pk / (1.0e0 * nk)))"
        " * ((ss / (1.0e0 * nk) / 1e6) - (pk / (1.0e0 * nk)))",
        10**9)}) AS rel9,
    sum({N.sql_cents(
        "nk * ((pk / (1.0e0 * nk)) - (facts.pp / (1.0e0 * facts.nn)))"
        " * ((pk / (1.0e0 * nk)) - (facts.pp / (1.0e0 * facts.nn)))",
        10**9)}) AS res9
  FROM bins CROSS JOIN facts
)
SELECT facts.nn AS n_docs,
       {N.sql_rnd("CAST(br9 AS DOUBLE) / 1e9 / nn", 6)} AS brier,
       {N.sql_rnd("CAST(rel9 AS DOUBLE) / 1e9 / nn", 6)} AS reliability,
       {N.sql_rnd("CAST(res9 AS DOUBLE) / 1e9 / nn", 6)} AS resolution,
       {N.sql_rnd("(pp / (1.0e0 * nn)) * (1.0e0 - pp / (1.0e0 * nn))",
                  6)} AS uncertainty,
       {N.sql_rnd(
           "CAST(br9 AS DOUBLE) / 1e9 / nn"
           " - (CAST(rel9 AS DOUBLE) / 1e9 / nn"
           "    - CAST(res9 AS DOUBLE) / 1e9 / nn"
           "    + (pp / (1.0e0 * nn)) * (1.0e0 - pp / (1.0e0 * nn)))",
           6)} AS within_bin
FROM facts CROSS JOIN comp""".format(qscored=_qscored_sql()),
    doc="Murphy (1973) decomposition of the Brier score of the "
    "composite quality score as an English-document forecaster, over "
    "the same 10 probability bins as calibration_bins: BS ≈ REL − RES "
    "+ UNC, with REL = Σ n_k(f̄_k−ō_k)²/N (calibration error — "
    "punishes miscalibrated bins), RES = Σ n_k(ō_k−ō)²/N (how much "
    "the forecast separates outcomes), UNC = ō(1−ō) (irreducible base-"
    "rate variance), and the residual reported as within_bin — "
    "Stephenson et al. 2008's generalized within-bin variance MINUS "
    "covariance terms, which the binned identity absorbs (it can be "
    "negative), so the row is self-auditing: "
    "brier − (rel − res + unc) = within_bin exactly. "
    "Raw Brier terms and each bin's contribution are snapped to the "
    "1e-9 grid and integer-summed from exact integer inputs. Plan: "
    "two aggregates over the scoring pass (scalar + 10 bins); the "
    "component reduce runs over 10 rows — scale-invariant.",
    survey_ids=("M7-R11",),
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _qscored(spark, sf_dir).localCheckpoint()
    facts = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        F.sum("pos").cast("bigint").alias("pp"),
        F.sum(
            F.expr(
                N.sql_cents(
                    "(s6 / 1e6 - pos) * (s6 / 1e6 - pos)", 10**9
                )
            )
        ).alias("br9"),
    )
    bins = q.groupBy(
        F.least(F.floor(F.col("s6") / 100000).cast("bigint"), F.lit(9))
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        F.sum("s6").cast("bigint").alias("ss"),
        F.sum("pos").cast("bigint").alias("pk"),
    )
    comp = bins.crossJoin(F.broadcast(facts)).agg(
        F.sum(
            F.expr(
                N.sql_cents(
                    "nk * ((ss / (1.0e0 * nk) / 1e6) - (pk / (1.0e0 * nk)))"
                    " * ((ss / (1.0e0 * nk) / 1e6) - (pk / (1.0e0 * nk)))",
                    10**9,
                )
            )
        ).alias("rel9"),
        F.sum(
            F.expr(
                N.sql_cents(
                    "nk * ((pk / (1.0e0 * nk)) - (pp / (1.0e0 * nn)))"
                    " * ((pk / (1.0e0 * nk)) - (pp / (1.0e0 * nn)))",
                    10**9,
                )
            )
        ).alias("res9"),
    )
    return facts.crossJoin(F.broadcast(comp)).select(
        F.col("nn").alias("n_docs"),
        F.expr(N.sql_rnd("CAST(br9 AS DOUBLE) / 1e9 / nn", 6)).alias(
            "brier"
        ),
        F.expr(N.sql_rnd("CAST(rel9 AS DOUBLE) / 1e9 / nn", 6)).alias(
            "reliability"
        ),
        F.expr(N.sql_rnd("CAST(res9 AS DOUBLE) / 1e9 / nn", 6)).alias(
            "resolution"
        ),
        F.expr(
            N.sql_rnd(
                "(pp / (1.0e0 * nn)) * (1.0e0 - pp / (1.0e0 * nn))", 6
            )
        ).alias("uncertainty"),
        F.expr(
            N.sql_rnd(
                "CAST(br9 AS DOUBLE) / 1e9 / nn"
                " - (CAST(rel9 AS DOUBLE) / 1e9 / nn"
                "    - CAST(res9 AS DOUBLE) / 1e9 / nn"
                "    + (pp / (1.0e0 * nn)) * (1.0e0 - pp / (1.0e0 * nn)))",
                6,
            )
        ).alias("within_bin"),
    )


# ---------------------------------------------------------------------------
# err_eval (round 8, eighth wave) — Expected Reciprocal Rank (Chapelle
# et al. 2009), the cascade-model graded metric next to NDCG/MRR: the
# user scans down and stops at the first satisfying result
# ---------------------------------------------------------------------------

_ERR_DEPTH = 10

# Satisfaction probability R_r = (2^rel - 1) / 8 for rel in 0..3 — a
# dyadic rational, carried as the integer NUMERATOR over denominator 8.
_ERR_RNUM = "(CASE rel WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END)"
# The cascade continuation product over preceding ranks is
# prod(1 - R_i) = 8^n0 * 7^n1 * 5^n2 * 1^n3 / 8^(rk-1), where n_g
# counts preceding rows with rel = g. Powers of 7 and 5 come from
# literal lookup ladders (exponent <= 9), 8^n0 from a shift — the whole
# numerator is an EXACT BIGINT, so the per-rank ERR term is one double
# division of exact integers on both engines (no pow(), no exp/ln).
_ERR_P7 = "(CASE n1 " + " ".join(
    f"WHEN {i} THEN {7**i}" for i in range(10)
) + " ELSE 0 END)"
_ERR_P5 = "(CASE n2 " + " ".join(
    f"WHEN {i} THEN {5**i}" for i in range(10)
) + " ELSE 0 END)"
_ERR_P8 = "(CASE n0 " + " ".join(
    f"WHEN {i} THEN {8**i}" for i in range(10)
) + " ELSE 0 END)"
_ERR_D8 = "(CASE rk " + " ".join(
    f"WHEN {i} THEN {8**i}" for i in range(1, 11)
) + " ELSE 0 END)"
_ERR_TERM = (
    f"((rnum * {_ERR_P8} * {_ERR_P7} * {_ERR_P5})"
    f" / (1.0e0 * {_ERR_D8} * rk))"
)


@query(
    "err_eval",
    oracle=f"""
WITH {_SCORED_SQL},
top AS (
  SELECT doc_id, rel, {_ERR_RNUM} AS rnum,
         row_number() OVER (ORDER BY c6 DESC, doc_id) AS rk
  FROM scored ORDER BY c6 DESC, doc_id LIMIT {_ERR_DEPTH}
), w AS (
  SELECT doc_id, rel, rnum, rk,
         CAST(coalesce(sum(CASE WHEN rel = 0 THEN 1 END)
           OVER (ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS INT) AS n0,
         CAST(coalesce(sum(CASE WHEN rel = 1 THEN 1 END)
           OVER (ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS INT) AS n1,
         CAST(coalesce(sum(CASE WHEN rel = 2 THEN 1 END)
           OVER (ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS INT) AS n2
  FROM top
), terms AS (
  SELECT doc_id, rel, rk,
         {N.sql_rnd("rnum / 8.0e0", 6)} AS r_prob,
         {N.sql_cents(_ERR_TERM, 10**6)} AS t6
  FROM w
)
SELECT CAST(rk AS BIGINT) AS rk,
       CAST(doc_id AS BIGINT) AS doc_id,
       rel, r_prob,
       {N.sql_rnd("t6 / 1e6", 6)} AS err_term,
       {N.sql_rnd(
           "sum(t6) OVER (ORDER BY rk ROWS BETWEEN UNBOUNDED"
           " PRECEDING AND CURRENT ROW) / 1e6", 6)} AS err_cum
FROM terms""",
    doc="Expected Reciprocal Rank (Chapelle et al. 2009) of the dense "
    "ranking under the cascade user model: the user inspects ranks in "
    "order and stops at rank r with probability R_r = (2^rel − 1)/2^3; "
    "ERR = Σ (1/r)·R_r·Π_{i<r}(1−R_i). The continuation product is "
    "computed EXACTLY: (1−R) values are dyadic rationals 8/8, 7/8, "
    "5/8, 1/8, so the product is 8^n0·7^n1·5^n2 / 8^(r−1) with the "
    "exponents read off three windowed counts of preceding relevance "
    "grades and the powers from literal lookup ladders (8^n too — "
    "dialect-neutral, no shift operator) — an exact BIGINT numerator, "
    "one double division per rank, no pow()/exp() anywhere; terms "
    "snap DIRECTLY to the rendered 1e-6 grid so the 6-decimal render "
    "is an exact integer over 1e6, never a rounding tie. Reports "
    "per-rank stopping terms and the cumulative ERR "
    "(final row = ERR@10). Plan: the scoring pass + TakeOrdered "
    "top-10; every window runs on the 10-row cut.",
    survey_ids=("M7-R13",),
)
def err_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    top = (
        _scored(spark, sf_dir)
        .orderBy(F.desc("c6"), "doc_id")
        .limit(_ERR_DEPTH)
        .select(
            "doc_id",
            "rel",
            F.expr(_ERR_RNUM).alias("rnum"),
            F.row_number()
            .over(Window.orderBy(F.desc("c6"), "doc_id"))
            .alias("rk"),
        )
    )
    wprev = Window.orderBy("rk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w = top.select(
        "doc_id",
        "rel",
        "rnum",
        "rk",
        F.coalesce(
            F.sum(F.when(F.col("rel") == 0, 1)).over(wprev), F.lit(0)
        ).cast("int").alias("n0"),
        F.coalesce(
            F.sum(F.when(F.col("rel") == 1, 1)).over(wprev), F.lit(0)
        ).cast("int").alias("n1"),
        F.coalesce(
            F.sum(F.when(F.col("rel") == 2, 1)).over(wprev), F.lit(0)
        ).cast("int").alias("n2"),
    )
    terms = w.select(
        "doc_id",
        "rel",
        "rk",
        F.expr(N.sql_rnd("rnum / 8.0e0", 6)).alias("r_prob"),
        F.expr(N.sql_cents(_ERR_TERM, 10**6)).alias("t6"),
    )
    wcum = Window.orderBy("rk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return terms.select(
        F.col("rk").cast("bigint").alias("rk"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "rel",
        "r_prob",
        F.expr(N.sql_rnd("t6 / 1e6", 6)).alias("err_term"),
        N.rnd(F.sum("t6").over(wcum) / 1e6, 6).alias("err_cum"),
    )


# ---------------------------------------------------------------------------
# isotonic_calibration (round 9) — PAVA isotonic regression over the
# calibration_bins reliability diagram via the exact minimax identity
# ---------------------------------------------------------------------------


@query(
    "isotonic_calibration",
    oracle=f"""
WITH {{qscored}},
b AS (
  SELECT CAST(least(s6 // 100000, 9) AS BIGINT) AS bin,
         CAST(sum(pos) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS n
  FROM qscored GROUP BY 1
), p AS (
  SELECT bin, y, n,
         CAST(sum(y) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cy,
         CAST(sum(n) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cn
  FROM b
), iv AS (
  SELECT i.bin AS bi, j.bin AS bj,
         (j.cy - (i.cy - i.y)) AS sy,
         (j.cn - (i.cn - i.n)) AS sn
  FROM p i JOIN p j ON i.bin <= j.bin
), mk AS (
  SELECT k.bin AS bin, iv.bi,
         min((1.0e0 * iv.sy) / iv.sn) AS mn
  FROM p k JOIN iv ON iv.bi <= k.bin AND iv.bj >= k.bin
  GROUP BY 1, 2
), iso AS (
  SELECT bin, max(mn) AS iso FROM mk GROUP BY 1
)
SELECT p.bin, p.n AS n_docs,
       {N.sql_rnd("(1.0e0 * p.y) / p.n", 6)} AS raw_rate,
       {N.sql_rnd("iso.iso", 6)} AS iso_rate
FROM p JOIN iso USING (bin)""".format(qscored=_qscored_sql()),
    doc="Isotonic (PAVA) calibration of the quality score against the "
    "empirical P(lang='en'), fitted over the calibration_bins "
    "reliability diagram via the EXACT minimax identity: the "
    "pool-adjacent-violators solution at bin k equals "
    "max_{{i<=k}} min_{{j>=k}} mean(y_i..y_j) (Robertson-Wright-"
    "Dykstra 1988 Thm 1.4.4) — so the inherently-sequential PAVA "
    "sweep becomes three B-bounded relational steps: interval sums "
    "from exclusive/inclusive prefix pairs (B(B+1)/2 rows), a "
    "(k,i)-grouped min over j, a k-grouped max over i. Interval "
    "means are IEEE divisions of exact BIGINT prefix sums — "
    "deterministic cross-engine, no libm anywhere. The fitted curve "
    "is monotone by construction where the raw reliability diagram "
    "need not be. Plan: ONE corpus aggregate (the 10-bin census); "
    "everything after is <=B^3/6 rows of scalar algebra — the only "
    "isotonic regression that exists at 100 TB (per-example PAVA "
    "would need a global sort and a sequential sweep).",
    survey_ids=("M7-ML29",),
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _qscored(spark, sf_dir)
    b = q.groupBy(
        F.least(F.floor(F.col("s6") / 100000), F.lit(9))
        .cast("bigint")
        .alias("bin")
    ).agg(
        F.sum("pos").cast("bigint").alias("y"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = b.select(
        "bin",
        "y",
        "n",
        F.sum("y").over(wcum).cast("bigint").alias("cy"),
        F.sum("n").over(wcum).cast("bigint").alias("cn"),
    ).localCheckpoint(eager=True)
    pi = p.select(
        F.col("bin").alias("bi"),
        (F.col("cy") - F.col("y")).alias("ey"),
        (F.col("cn") - F.col("n")).alias("en"),
    )
    pj = p.select(
        F.col("bin").alias("bj"),
        F.col("cy").alias("jcy"),
        F.col("cn").alias("jcn"),
    )
    iv = pi.join(pj, F.col("bi") <= F.col("bj")).select(
        "bi",
        "bj",
        (F.col("jcy") - F.col("ey")).alias("sy"),
        (F.col("jcn") - F.col("en")).alias("sn"),
    )
    pk = p.select(F.col("bin").alias("k"))
    mk = (
        pk.join(
            iv, (F.col("bi") <= F.col("k")) & (F.col("bj") >= F.col("k"))
        )
        .groupBy("k", "bi")
        .agg(F.min(F.col("sy") * 1.0 / F.col("sn")).alias("mn"))
    )
    iso = mk.groupBy(F.col("k").alias("bin")).agg(
        F.max("mn").alias("iso")
    )
    return p.join(iso, "bin").select(
        "bin",
        F.col("n").alias("n_docs"),
        N.rnd(F.col("y") * 1.0 / F.col("n"), 6).alias("raw_rate"),
        N.rnd(F.col("iso"), 6).alias("iso_rate"),
    )
