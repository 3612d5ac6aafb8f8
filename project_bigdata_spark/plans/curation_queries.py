"""Round-5 curation/monitoring catalog entries (staged for the round-6
attestation window — registered BEHIND the round-5 priority list).

Sixteen operators a large-scale training-data pipeline adds on top of
the dedup/retrieval/warehouse families already in the catalog:

- ``benford_audit``        — first-significant-digit distribution vs
  Benford's law: the classic generated/tampered-numeric-column detector.
- ``cusum_drift``          — CUSUM changepoint detection over the hourly
  value series, computed with the prefix-sum/prefix-min identity
  (``S_t = P_t - min(0, min_{j<=t} P_j)``) so the sequential recursion
  becomes two plain window functions — fully distributed, no recursion,
  no driver loop.
- ``domain_kl_divergence`` — per-source unigram KL divergence against
  the corpus distribution over the global top-256 vocabulary: the
  domain-mix drift monitor (which sources stopped looking like the
  corpus they feed).
- ``minhash_containment``  — asymmetric containment over the LSH
  candidate pairs: catches near-SUBSET relations (quote/expansion,
  boilerplate wrapper) that symmetric Jaccard structurally misses on
  length-skewed pairs.
- ``margin_bitext_mining`` — mutual-top-1 margin pair mining over the
  embedding table (the CCMatrix/LASER batched-alignment shape): a
  bounded query shard is broadcast, scored against the corpus in one
  narrow pass, and the mutual check reuses the same scored frame.
- ``kmeans_lloyd``         — distributed Lloyd k-means (unrolled
  rounds, exact-grid mean updates), the iterative-clustering primitive.
- ``hilbert_layout``       — Hilbert curve clustering key (canonical
  xy2d unrolled to integer stages), the better-locality Z-order sibling.
- ``pca_power_iteration``  — top axis of the class-centroid spread by
  exact-arithmetic power iteration (discriminant / common-component
  direction).
- ``golden_record_survivorship`` — MDM golden-record election + field
  merge over the near-dup clusters (deterministic total-order rules).
- ``holt_forecast``        — Holt double-exponential smoothing + linear
  forecasts as ONE ordered fold per series (oracle: recursive CTE).
- ``theil_sen_trend``      — median-of-pairwise-slopes robust trend
  (pair join bounded by series LENGTH, not event count).
- ``mann_kendall_test``    — the paired nonparametric significance test
  (integer S / tie-corrected variance; exact-integer 5% decision).
- ``ngram_novelty``        — share of globally-unique trigram
  occurrences per (lang, source): the template-spam / scraper-loop
  signal dedup cannot see (repeats straddle documents).
- ``sequential_patterns``  — exists-before (A ... then B) support /
  confidence / lift over 30-minute sessions: the ORDERED complement
  of assoc_rules and the Markov transition matrix.
- ``word_pmi``             — document-level word-pair PMI / lift
  collocation mining (the word2phrase seed), exact integer counts.
- ``entropy_rate``         — conditional next-event entropy of the
  per-user Markov process vs its ln(k) maximum (how predictable is
  behavior; the complement of markov_steady_state).

Cross-engine determinism strategy (the catalog's exact-grid idiom,
``_norm.cents``): every float that participates in an aggregate or a
threshold is first snapped to an integer grid — cents for money, 1e-6
for cosines, 1e-9 for per-token KL terms — so sums are order-free
integer arithmetic and comparisons are integer inequalities
(``40*c*nA*nB > 21*(sA*nB + sB*nA)`` instead of ``margin > 1.05``).
Transcendentals (``ln``) are evaluated per row on identical doubles and
absorbed by the grid snap; no cross-row float summation anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.operators import dedup as DD
from project_bigdata_spark.operators import similarity as SIM
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.plans.dedup_queries import MINHASH_CTES, WORDS_SQL
from project_bigdata_spark.plans.similarity_queries import _dot_sql
from project_bigdata_spark.sources import load_table

# ---------------------------------------------------------------------------
# benford_audit
# ---------------------------------------------------------------------------

# Shared literal table (AQI-breakpoint pattern): both engines consume the
# SAME Python double for log10(1 + 1/d), so the chi-square arithmetic is
# bit-identical — no cross-engine log10 evaluation at query time.
BENFORD_P = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]
_BENFORD_SQL_ARR = "[" + ", ".join(f"{p!r}e0" for p in BENFORD_P) + "]"


@query(
    "benford_audit",
    oracle=f"""
WITH d AS (
  SELECT CAST(substring(CAST({N.sql_cents("l_extendedprice")} AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM lineitem
), obs AS (
  SELECT digit, count(*) AS n_obs FROM d GROUP BY digit
), tot AS (
  SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM obs
)
SELECT CAST(digit AS BIGINT) AS digit,
       CAST(n_obs AS BIGINT) AS n_obs,
       round(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE), 4)
         AS observed_share,
       round({_BENFORD_SQL_ARR}[digit], 4) AS expected_share,
       round((CAST(n_obs AS DOUBLE)
                - CAST(n_total AS DOUBLE) * {_BENFORD_SQL_ARR}[digit])
             * (CAST(n_obs AS DOUBLE)
                - CAST(n_total AS DOUBLE) * {_BENFORD_SQL_ARR}[digit])
             / (CAST(n_total AS DOUBLE) * {_BENFORD_SQL_ARR}[digit]), 4)
         AS chi2_term
FROM obs CROSS JOIN tot""",
    doc="Benford first-digit audit on l_extendedprice: the standard "
    "generated-data / tampered-ledger detector. The first significant "
    "digit is read off the EXACT integer-cents string (prices >= 0.01, "
    "so first cents digit == first price digit) — no float log10 per "
    "row. Expected shares are one shared literal table; the chi-square "
    "terms are identical double expressions over exact counts on both "
    "engines. One map + one 9-group aggregate + a broadcast scalar "
    "total: linear scan, nothing else, at any scale. (TPC-H prices are "
    "range-truncated synthetics, so the audit FIRES — that is the "
    "point of running it on a pipeline's numeric columns.)",
    survey_ids=("M7-A42",),
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    digits = li.select(
        F.substring(N.cents("l_extendedprice").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").cast("bigint").alias("n_total"))
    p_arr = F.array(*[F.lit(p) for p in BENFORD_P])
    p = F.element_at(p_arr, F.col("digit"))
    n_obs_d = F.col("n_obs").cast("double")
    n_tot_d = F.col("n_total").cast("double")
    return obs.crossJoin(F.broadcast(tot)).select(
        N.big("digit").alias("digit"),
        N.big("n_obs").alias("n_obs"),
        N.rnd(n_obs_d / n_tot_d).alias("observed_share"),
        N.rnd(p).alias("expected_share"),
        N.rnd(
            (n_obs_d - n_tot_d * p) * (n_obs_d - n_tot_d * p) / (n_tot_d * p)
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# cusum_drift
# ---------------------------------------------------------------------------

@query(
    "cusum_drift",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         CAST(sum({N.sql_cents("value")}) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, hour_ts, cents,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS t_hours,
         CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT) AS tot
  FROM hourly
), dev AS (
  SELECT *, 4 * t_hours * cents - 5 * tot AS sdev FROM stats
), pref AS (
  SELECT *, sum(sdev) OVER (PARTITION BY event_type ORDER BY hour_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM dev
), cus AS (
  SELECT *, p - least(0, min(p) OVER (PARTITION BY event_type ORDER BY hour_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
  FROM pref
)
SELECT event_type,
       strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       round(CAST(cents AS DOUBLE) / 100, 4) AS hourly_value,
       round(CAST(s AS DOUBLE) / CAST(400 * t_hours AS DOUBLE), 4) AS cusum,
       CAST(CASE WHEN s > 8 * tot THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM cus""",
    doc="One-sided CUSUM changepoint detector over the per-type hourly "
    "value series (target = series mean, allowance k = mean/4, alarm at "
    "2x mean): S_t = max(0, S_t-1 + x_t - mu - k). The sequential "
    "recursion is rewritten with the prefix identity S_t = P_t - "
    "min(0, min_j<=t P_j) (P = running sum of deviations), so the whole "
    "detector is a running SUM plus a running MIN — two window "
    "functions per type partition, embarrassingly parallel across "
    "series. Deviations are scaled to integers (4*T*x - 5*tot in exact "
    "cents) so every intermediate is order-free integer arithmetic; the "
    "one double division happens at render time.",
    survey_ids=("M7-A43",),
)
def cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.sum(N.cents("value")).cast("bigint").alias("cents"))
    w_all = Window.partitionBy("event_type")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stats = hourly.select(
        "event_type",
        "hour_ts",
        "cents",
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("t_hours"),
        F.sum("cents").over(w_all).cast("bigint").alias("tot"),
    )
    dev = stats.withColumn(
        "sdev", F.lit(4) * F.col("t_hours") * F.col("cents") - F.lit(5) * F.col("tot")
    )
    pref = dev.withColumn("p", F.sum("sdev").over(w_run))
    cus = pref.withColumn(
        "s", F.col("p") - F.least(F.lit(0), F.min("p").over(w_run))
    )
    return cus.select(
        "event_type",
        N.ts_str("hour_ts").alias("hour_ts"),
        N.rnd(F.col("cents").cast("double") / F.lit(100)).alias("hourly_value"),
        N.rnd(
            F.col("s").cast("double")
            / (F.lit(400) * F.col("t_hours")).cast("double")
        ).alias("cusum"),
        F.when(F.col("s") > F.lit(8) * F.col("tot"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("alarm"),
    )


# ---------------------------------------------------------------------------
# domain_kl_divergence
# ---------------------------------------------------------------------------

_KL_VOCAB = 256  # global top-V support cap; smoothing mass 0.5 per token

# p_source and p_corpus are PROPER distributions over the shared support:
# (c_w + 0.5) / (n + 0.5 * |support|) sums to exactly 1, so KL >= 0 holds
# by Gibbs. |support| is the REALIZED vocabulary size (min(cap, distinct
# words)) carried from the vocab CTE — hard-coding the cap would break
# properness (and non-negativity) whenever the corpus has fewer distinct
# tokens than the cap.
_PS_SQL = (
    "((CAST(cs AS DOUBLE) + 0.5)"
    " / (CAST(ns AS DOUBLE) + 0.5 * CAST(vsz AS DOUBLE)))"
)
_PC_SQL = (
    "((CAST(cg AS DOUBLE) + 0.5)"
    " / (CAST(nv AS DOUBLE) + 0.5 * CAST(vsz AS DOUBLE)))"
)


@query(
    "domain_kl_divergence",
    oracle=f"""
WITH toks AS MATERIALIZED (
  SELECT source, unnest({WORDS_SQL}) AS w FROM documents
), cnt AS MATERIALIZED (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
), gcnt AS MATERIALIZED (
  SELECT w, CAST(sum(c) AS BIGINT) AS c FROM cnt GROUP BY w
), vocab AS MATERIALIZED (
  SELECT w, c FROM gcnt ORDER BY c DESC, w LIMIT {_KL_VOCAB}
), vtot AS (
  SELECT CAST(sum(c) AS BIGINT) AS nv, CAST(count(*) AS BIGINT) AS vsz
  FROM vocab
), stot AS (
  SELECT source, CAST(sum(c.c) AS BIGINT) AS ns
  FROM cnt c JOIN vocab v USING (w) GROUP BY source
), grid AS (
  SELECT s.source, v.c AS cg, coalesce(sc.c, 0) AS cs, st.ns, vt.nv, vt.vsz
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN vocab v
  LEFT JOIN cnt sc ON sc.source = s.source AND sc.w = v.w
  JOIN stot st ON st.source = s.source
  CROSS JOIN vtot vt
), terms AS (
  SELECT source, ns,
         {N.sql_cents(f"{_PS_SQL} * ln({_PS_SQL} / {_PC_SQL})", 1_000_000_000)}
           AS t9
  FROM grid
)
SELECT source,
       CAST(ns AS BIGINT) AS n_vocab_tokens,
       round(CAST(sum(t9) AS DOUBLE) / 1e9, 6) AS kl_top{_KL_VOCAB}
FROM terms GROUP BY source, ns""",
    doc=f"Domain-mix drift monitor: KL(source || corpus) over the global "
    f"top-{_KL_VOCAB} unigram support with add-0.5 smoothing normalized "
    "by the REALIZED support size (both sides are proper distributions "
    "over the shared support, so KL >= 0 by Gibbs). The vocabulary "
    "builds with one token shuffle + TakeOrdered "
    f"and broadcasts ({_KL_VOCAB} rows); the per-(source, token) grid is "
    f"|sources| x {_KL_VOCAB} rows — bounded regardless of corpus size. "
    "Each per-token term p_s*ln(p_s/p_c) is evaluated on identical "
    "doubles and snapped to an exact 1e-9 integer grid BEFORE summation, "
    "so the aggregate is order-free integer arithmetic (cross-row float "
    "summation order can never flip the hash).",
    survey_ids=("M7-C6",),
)
def domain_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(DD.words_col(F.col("text"))).alias("w")
    )
    cnt = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    gcnt = cnt.groupBy("w").agg(F.sum("c").cast("bigint").alias("c"))
    vocab = gcnt.orderBy(F.desc("c"), "w").limit(_KL_VOCAB)
    vtot = vocab.agg(
        F.sum("c").cast("bigint").alias("nv"),
        F.count(F.lit(1)).cast("bigint").alias("vsz"),
    )
    stot = (
        cnt.join(F.broadcast(vocab.select("w")), "w")
        .groupBy("source")
        .agg(F.sum("c").cast("bigint").alias("ns"))
    )
    grid = (
        d.select("source")
        .distinct()
        .crossJoin(F.broadcast(vocab.select("w", F.col("c").alias("cg"))))
        .join(
            cnt.select("source", "w", F.col("c").alias("cs")),
            ["source", "w"],
            "left",
        )
        .withColumn("cs", F.coalesce(F.col("cs"), F.lit(0)))
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(vtot))
    )
    half_v = 0.5 * F.col("vsz").cast("double")
    ps = (F.col("cs").cast("double") + 0.5) / (
        F.col("ns").cast("double") + half_v
    )
    pc = (F.col("cg").cast("double") + 0.5) / (
        F.col("nv").cast("double") + half_v
    )
    terms = grid.withColumn(
        "t9", N.cents(ps * F.log(ps / pc), scale=1_000_000_000)
    )
    return terms.groupBy("source", "ns").agg(
        F.sum("t9").alias("t9_sum")
    ).select(
        "source",
        N.big("ns").alias("n_vocab_tokens"),
        N.rnd(F.col("t9_sum").cast("double") / F.lit(1e9), 6).alias(
            f"kl_top{_KL_VOCAB}"
        ),
    )


# ---------------------------------------------------------------------------
# minhash_containment
# ---------------------------------------------------------------------------

@query(
    "minhash_containment",
    oracle="WITH"
    + MINHASH_CTES
    + """
SELECT CAST(p.id_a AS BIGINT) AS id_a,
       CAST(p.id_b AS BIGINT) AS id_b,
       round(CAST(len(list_intersect(list_distinct(sa.shingles),
                                     list_distinct(sb.shingles))) AS DOUBLE)
             / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4)
         AS jaccard,
       round(CAST(len(list_intersect(list_distinct(sa.shingles),
                                     list_distinct(sb.shingles))) AS DOUBLE)
             / len(list_distinct(sa.shingles)), 4) AS containment_a,
       round(CAST(len(list_intersect(list_distinct(sa.shingles),
                                     list_distinct(sb.shingles))) AS DOUBLE)
             / len(list_distinct(sb.shingles)), 4) AS containment_b,
       CASE
         WHEN 5 * len(list_intersect(list_distinct(sa.shingles),
                                     list_distinct(sb.shingles)))
              >= 4 * len(list_distinct(list_concat(sa.shingles, sb.shingles)))
           THEN 'duplicate'
         WHEN 10 * len(list_intersect(list_distinct(sa.shingles),
                                      list_distinct(sb.shingles)))
              >= 9 * len(list_distinct(sb.shingles))
           THEN 'a_contains_b'
         WHEN 10 * len(list_intersect(list_distinct(sa.shingles),
                                      list_distinct(sb.shingles)))
              >= 9 * len(list_distinct(sa.shingles))
           THEN 'b_contains_a'
         ELSE 'overlap'
       END AS relation
FROM pairs p
JOIN sh sa ON p.id_a = sa.doc_id
JOIN sh sb ON p.id_b = sb.doc_id""",
    doc="Asymmetric containment over the LSH candidate pairs: "
    "C(A,B) = |A n B| / |A| alongside Jaccard, classifying each pair as "
    "duplicate / a_contains_b / b_contains_a / overlap. Near-SUBSET "
    "relations (a doc quoting or wrapping another) score low on Jaccard "
    "when lengths are skewed but ~1.0 on one-sided containment — the "
    "dedup literature's standard fix. Thresholds are integer-scaled "
    "inequalities (10*inter >= 9*|B|) on exact set sizes, so no float "
    "boundary can flip a class cross-engine. Same banded-LSH candidate "
    "generation as minhash_near_dups: digests shuffle, payloads don't, "
    "never all-pairs.",
    survey_ids=("M7-D18",),
)
def minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(d, "doc_id", "text").persist()
    pairs = DD.minhash_candidate_pairs(sigs, "doc_id")
    sa = sigs.select(
        F.col("doc_id").alias("id_a"),
        F.array_distinct("shingles").alias("set_a"),
    )
    sb = sigs.select(
        F.col("doc_id").alias("id_b"),
        F.array_distinct("shingles").alias("set_b"),
    )
    j = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("set_a", "set_b")).alias("inter"),
            F.size("set_a").alias("na"),
            F.size("set_b").alias("nb"),
            F.size(F.array_union("set_a", "set_b")).alias("uni"),
        )
    )
    inter, na, nb, uni = (F.col(c) for c in ("inter", "na", "nb", "uni"))
    relation = (
        F.when(5 * inter >= 4 * uni, "duplicate")
        .when(10 * inter >= 9 * nb, "a_contains_b")
        .when(10 * inter >= 9 * na, "b_contains_a")
        .otherwise("overlap")
    )
    return j.select(
        N.big("id_a").alias("id_a"),
        N.big("id_b").alias("id_b"),
        N.rnd(inter.cast("double") / uni).alias("jaccard"),
        N.rnd(inter.cast("double") / na).alias("containment_a"),
        N.rnd(inter.cast("double") / nb).alias("containment_b"),
        relation.alias("relation"),
    )


# ---------------------------------------------------------------------------
# margin_bitext_mining
# ---------------------------------------------------------------------------

_MICRO = 1_000_000  # cosine snap grid (1e-6, the catalog's cosine scale)
# Fixed shard cap: the decade probe measured a 10.4x slope on the 10x
# step when BOTH sides grow (shard x corpus = 100x work). Production
# batch mining aligns a bounded shard per job, so the shard is capped at
# the first 64 eligible ids — at the attested SFs (<= 2000 vectors,
# ids < 1280) every shard member is below the cap, so results are
# unchanged; past it, cost is linear in the corpus.
_BITEXT_SHARD_CAP_ID = 64 * 20


@query(
    "margin_bitext_mining",
    oracle=f"""
WITH a AS MATERIALIZED (
  SELECT vec_id AS a_id, embedding AS avec,
         sqrt({_dot_sql("embedding", "embedding")}) AS an
  FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < {_BITEXT_SHARD_CAP_ID}
), b AS MATERIALIZED (
  SELECT vec_id AS b_id, embedding AS bvec,
         sqrt({_dot_sql("embedding", "embedding")}) AS bn
  FROM embeddings WHERE vec_id % 20 <> 0
), cand AS MATERIALIZED (
  SELECT a_id, b_id,
         {N.sql_cents(_dot_sql("bvec", "avec") + " / (bn * an)", _MICRO)} AS cm
  FROM b CROSS JOIN a
), ranked AS MATERIALIZED (
  SELECT a_id, b_id, cm,
         row_number() OVER (PARTITION BY a_id ORDER BY cm DESC, b_id) AS rn_a,
         row_number() OVER (PARTITION BY b_id ORDER BY cm DESC, a_id) AS rn_b
  FROM cand
), scored AS (
  SELECT *,
         sum(CASE WHEN rn_a <= 4 THEN cm ELSE 0 END)
           OVER (PARTITION BY a_id) AS s_a,
         sum(CASE WHEN rn_a <= 4 THEN 1 ELSE 0 END)
           OVER (PARTITION BY a_id) AS n_a,
         sum(CASE WHEN rn_b <= 4 THEN cm ELSE 0 END)
           OVER (PARTITION BY b_id) AS s_b,
         sum(CASE WHEN rn_b <= 4 THEN 1 ELSE 0 END)
           OVER (PARTITION BY b_id) AS n_b
  FROM ranked
)
SELECT CAST(a_id AS BIGINT) AS a_id,
       CAST(b_id AS BIGINT) AS b_id,
       round(CAST(cm AS DOUBLE) / 1e6, 6) AS cosine,
       round(CAST(2 * cm * n_a * n_b AS DOUBLE)
             / CAST(s_a * n_b + s_b * n_a AS DOUBLE), 6) AS margin
FROM scored
WHERE rn_a = 1 AND rn_b = 1
  AND s_a * n_b + s_b * n_a > 0
  AND 40 * cm * n_a * n_b > 21 * (s_a * n_b + s_b * n_a)""",
    doc="Margin-based mutual-top-1 pair mining (the CCMatrix/LASER "
    "bitext-alignment shape): a bounded query shard (vec_id%20==0, "
    "capped at 64 vectors so the decade slope stays linear in the "
    "corpus — measured 10.4x vs 1.7x on the synthetic-sf1 probe) is "
    "broadcast and scored against the corpus in ONE narrow pass; "
    "margin(a,b) = cos(a,b) / mean(top-4 cos from a, top-4 cos to b); a "
    "pair is mined when each side is the other's argmax AND margin > "
    "1.05. Cosines snap to the exact 1e-6 integer grid first, so "
    "ranking, top-4 sums, and the threshold (40*c*nA*nB > 21*(sA*nB + "
    "sB*nA)) are all order-free integer arithmetic — the two double "
    "divisions happen at render time. The mutual direction reuses the "
    "SAME scored frame (one window per side), so the corpus is touched "
    "once; at scale the b_id window shuffles |shard| x k candidate "
    "rows, never the corpus.",
    survey_ids=("M7-S14",),
)
def margin_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # Precompute each side's L2 norm ONCE (|A| + |B| folds) instead of
    # re-folding both norms inside every pair's cosine (3x fewer
    # higher-order-function folds on the |A| x |B| candidate frame —
    # measured 8.0s -> ~3s at sf0.1). Same arithmetic order as
    # SIM.cosine: dot / (norm_left * norm_right).
    ed = e.select("vec_id", SIM.as_double(F.col("embedding")).alias("vec"))
    a = ed.filter(
        (F.col("vec_id") % 20 == 0)
        & (F.col("vec_id") < _BITEXT_SHARD_CAP_ID)
    ).select(
        F.col("vec_id").alias("a_id"),
        F.col("vec").alias("avec"),
        SIM.norm(F.col("vec")).alias("an"),
    )
    b = ed.filter(F.col("vec_id") % 20 != 0).select(
        F.col("vec_id").alias("b_id"),
        F.col("vec").alias("bvec"),
        SIM.norm(F.col("vec")).alias("bn"),
    )
    cand = b.crossJoin(F.broadcast(a)).select(
        "a_id",
        "b_id",
        N.cents(
            SIM.dot(F.col("bvec"), F.col("avec"))
            / (F.col("bn") * F.col("an")),
            scale=_MICRO,
        ).alias("cm"),
    )
    wa = Window.partitionBy("a_id").orderBy(F.desc("cm"), "b_id")
    wb = Window.partitionBy("b_id").orderBy(F.desc("cm"), "a_id")
    ranked = cand.select(
        "a_id",
        "b_id",
        "cm",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wb).alias("rn_b"),
    )
    pa, pb = Window.partitionBy("a_id"), Window.partitionBy("b_id")
    top4 = lambda rn, col: F.sum(  # noqa: E731
        F.when(F.col(rn) <= 4, col).otherwise(F.lit(0))
    )
    scored = ranked.select(
        "*",
        top4("rn_a", F.col("cm")).over(pa).alias("s_a"),
        top4("rn_a", F.lit(1)).over(pa).alias("n_a"),
        top4("rn_b", F.col("cm")).over(pb).alias("s_b"),
        top4("rn_b", F.lit(1)).over(pb).alias("n_b"),
    )
    den = F.col("s_a") * F.col("n_b") + F.col("s_b") * F.col("n_a")
    num = F.col("cm") * F.col("n_a") * F.col("n_b")
    return scored.filter(
        (F.col("rn_a") == 1)
        & (F.col("rn_b") == 1)
        & (den > 0)
        & (40 * num > 21 * den)
    ).select(
        N.big("a_id").alias("a_id"),
        N.big("b_id").alias("b_id"),
        N.rnd(F.col("cm").cast("double") / F.lit(1e6), 6).alias("cosine"),
        N.rnd((2 * num).cast("double") / den.cast("double"), 6).alias(
            "margin"
        ),
    )


# ---------------------------------------------------------------------------
# kmeans_lloyd
# ---------------------------------------------------------------------------

_KM_K = 8       # centroids = vec_id < 8 (deterministic init)
_KM_ITERS = 2   # unrolled Lloyd update rounds (assign -> mean -> ...)
_KM_DIM = 64

# Squared L2 between two DOUBLE[] lists. NOTE: list_reduce, not
# list_sum — list_sum is not a plain sequential fold (its 64-term sums
# can differ from Spark's zip_with/aggregate left fold in the last ulp,
# measured here as a 1e-9-grid snap flip), while list_reduce((a,b)->a+b)
# is exactly the left fold Spark computes.
_SQDIST_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, x) -> acc + x)"
)


def _km_assign_ctes(tag: str, centroids: str) -> str:
    """One assignment round: score every vector against the (k-row)
    centroid table, snap the distance to the exact 1e-9 grid, argmin
    with (d9, cid) tie-break."""
    d9 = N.sql_cents(_SQDIST_SQL.format(a="v.v", b="c.c"), 1_000_000_000)
    return f"""
x{tag} AS (
  SELECT v.vec_id, c.cid, {d9} AS d9
  FROM vd v CROSS JOIN {centroids} c
), a{tag} AS (
  SELECT vec_id, cid, d9 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d9, cid) AS rn
    FROM x{tag}) WHERE rn = 1
)"""


def _km_update_ctes(tag: str, assign: str) -> str:
    """One Lloyd mean update on the EXACT integer grid: per-(cluster,
    dim) BIGINT sums, one double division at the end."""
    return f"""
s{tag} AS (
  SELECT a.cid, t.i,
         CAST(sum(v.vi[t.i]) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM {assign} a JOIN vd v USING (vec_id)
  CROSS JOIN generate_series(1, {_KM_DIM}) t(i)
  GROUP BY 1, 2
), c{tag} AS (
  SELECT cid,
         list((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 1e6 ORDER BY i) AS c
  FROM s{tag} GROUP BY cid
)"""


_KM_SNAP_INT = N.sql_cents("x", 1_000_000)
_KM_ORACLE = (
    f"""
WITH vd AS MATERIALIZED (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST({_KM_SNAP_INT} AS DOUBLE) / 1e6) AS v,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> {_KM_SNAP_INT}) AS vi
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS c FROM vd WHERE vec_id < {_KM_K}),"""
    + _km_assign_ctes("0", "c0")
    + ","
    + _km_update_ctes("1", "a0")
    + ","
    + _km_assign_ctes("1", "c1")
    + ","
    + _km_update_ctes("2", "a1")
    + ","
    + _km_assign_ctes("2", "c2")
    + """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(cid AS BIGINT) AS cluster,
       round(CAST(d9 AS DOUBLE) / 1e9, 6) AS dist_sq
FROM a2"""
)


@query(
    "kmeans_lloyd",
    oracle=_KM_ORACLE,
    doc=f"Distributed Lloyd k-means (k={_KM_K}, {_KM_ITERS} unrolled "
    "update rounds, deterministic init = first k vectors): the iterative "
    "clustering primitive next to pagerank in the catalog's iterative "
    "family. Components snap to the exact 1e-6 grid at load, so every "
    "mean update is BIGINT sums + ONE double division (order-free, "
    "engine-free); assignment distances snap to a 1e-9 grid before the "
    "(dist, cid) argmin so no float-noise flip can move a vector across "
    "clusters. Scale shape: centroids are a k-row broadcast, assignment "
    "never shuffles the corpus; each update shuffles k x dim partial "
    "sums (map-side combined) — the canonical Spark k-means plan.",
    survey_ids=("M7-ML6",),
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    snap_i = lambda x: N.cents(x, scale=1_000_000)  # noqa: E731
    vd = e.select(
        "vec_id",
        F.transform(
            SIM.as_double(F.col("embedding")),
            lambda x: snap_i(x).cast("double") / F.lit(1e6),
        ).alias("v"),
        F.transform(SIM.as_double(F.col("embedding")), snap_i).alias("vi"),
    ).persist()

    def sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def assign(cents_df):
        cand = vd.crossJoin(F.broadcast(cents_df)).select(
            "vec_id",
            "cid",
            N.cents(sqdist(F.col("v"), F.col("c")), scale=1_000_000_000).alias(
                "d9"
            ),
        )
        w = Window.partitionBy("vec_id").orderBy("d9", "cid")
        return (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid", "d9")
        )

    def update(assign_df):
        s = (
            assign_df.join(vd, "vec_id")
            .select("cid", F.posexplode("vi").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.sum("val").cast("bigint").alias("s"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
            )
        )
        return s.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
                lambda x: (x.s.cast("double") / x.n.cast("double")) / F.lit(1e6),
            ).alias("c")
        )

    cents_df = vd.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    a = assign(cents_df)
    for _ in range(_KM_ITERS):
        cents_df = update(a)
        a = assign(cents_df)
    return a.select(
        N.big("vec_id").alias("vec_id"),
        N.big("cid").alias("cluster"),
        N.rnd(F.col("d9").cast("double") / F.lit(1e9), 6).alias("dist_sq"),
    )


# ---------------------------------------------------------------------------
# hilbert_layout
# ---------------------------------------------------------------------------

_HB_BITS = 8
_HB_N = 1 << _HB_BITS  # 256 x 256 grid


def _hilbert_level_sql(i: int, s: int) -> str:
    """One xy2d level (Wikipedia's canonical algorithm, unrolled): vote
    the quadrant into d, then reflect+transpose (x, y) for the next
    level. rx/ry are recomputed inline — pure integer CASE arithmetic."""
    rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
    return f"""l{i} AS (
  SELECT user_id, x0, y0,
         d + {s * s} * xor(3 * {rx}, {ry}) AS d,
         CASE WHEN (y & {s}) > 0 THEN x
              WHEN (x & {s}) > 0 THEN {_HB_N - 1} - y
              ELSE y END AS x,
         CASE WHEN (y & {s}) > 0 THEN y
              WHEN (x & {s}) > 0 THEN {_HB_N - 1} - x
              ELSE x END AS y
  FROM l{i - 1}
)"""


_HB_LEVELS = ",\n".join(
    _hilbert_level_sql(i + 1, _HB_N >> (i + 1)) for i in range(_HB_BITS)
)

_HB_ORACLE = f"""
WITH l0 AS (
  SELECT user_id,
         user_id % {_HB_N} AS x,
         (epoch_us(date_trunc('hour', ts)) // 3600000000) % {_HB_N} AS y,
         user_id % {_HB_N} AS x0,
         (epoch_us(date_trunc('hour', ts)) // 3600000000) % {_HB_N} AS y0,
         0 AS d
  FROM events
),
{_HB_LEVELS}
SELECT CAST(d // {_HB_N} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(max(x0) - min(x0) AS BIGINT) AS x_span,
       CAST(max(y0) - min(y0) AS BIGINT) AS y_span
FROM l{_HB_BITS}
GROUP BY 1"""


def hilbert_chain(df: DataFrame, carry: list[str]) -> DataFrame:
    """Unroll the xy2d bit loop over integer columns ``x``/``y``/``d``
    (d must start at 0), preserving ``carry`` columns. Exhaustively
    verified bijective with unit-step adjacency on the full
    256x256 grid in tests/test_round5_ops.py."""
    for i in range(_HB_BITS):
        s = _HB_N >> (i + 1)
        rx = F.when(F.col("x").bitwiseAND(s) > 0, 1).otherwise(0)
        ry = F.when(F.col("y").bitwiseAND(s) > 0, 1).otherwise(0)
        df = df.select(
            *carry,
            (F.col("d") + F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry)).alias(
                "d"
            ),
            F.when(F.col("y").bitwiseAND(s) > 0, F.col("x"))
            .when(F.col("x").bitwiseAND(s) > 0, F.lit(_HB_N - 1) - F.col("y"))
            .otherwise(F.col("y"))
            .alias("x"),
            F.when(F.col("y").bitwiseAND(s) > 0, F.col("y"))
            .when(F.col("x").bitwiseAND(s) > 0, F.lit(_HB_N - 1) - F.col("x"))
            .otherwise(F.col("x"))
            .alias("y"),
        )
    return df



@query(
    "hilbert_layout",
    oracle=_HB_ORACLE,
    doc=f"Hilbert space-filling-curve clustering key over (user_id % "
    f"{_HB_N}, epoch-hour % {_HB_N}) — the better-locality alternative "
    "to zorder_events (a Hilbert bucket is one contiguous curve segment; "
    "Z-order buckets jump at quadrant seams, which is why "
    "Delta/Iceberg offer Hilbert for multi-dim file clustering). The "
    f"canonical xy2d bit loop is unrolled into {_HB_BITS} stages of "
    "pure integer CASE/XOR arithmetic — exact on any engine, no UDF, "
    "zero shuffles before the final bucket aggregate. Output: per-"
    "bucket row/user counts and per-dimension spans (the locality "
    "evidence a layout optimizer reads before rewriting files).",
    survey_ids=("M7-L5",),
)
def hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hour_idx = F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600")
    df = hilbert_chain(
        e.select(
            "user_id",
            (F.col("user_id") % _HB_N).alias("x"),
            (hour_idx % _HB_N).alias("y"),
            (F.col("user_id") % _HB_N).alias("x0"),
            (hour_idx % _HB_N).alias("y0"),
            F.lit(0).alias("d"),
        ),
        carry=["user_id", "x0", "y0"],
    )
    return (
        df.groupBy((F.col("d") / F.lit(_HB_N)).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            (F.max("x0") - F.min("x0")).cast("bigint").alias("x_span"),
            (F.max("y0") - F.min("y0")).cast("bigint").alias("y_span"),
        )
    )


# ---------------------------------------------------------------------------
# pca_power_iteration
# ---------------------------------------------------------------------------

_PCA_ITERS = 8
_PCA_DIM = 64
# w0 = all-ones / sqrt(64) = 0.125 exactly -> 1e-9 grid int 125_000_000
_PCA_W0 = 125_000_000


def _pca_matvec_ctes(tag: str, w: str) -> str:
    """One power round: x = B w in EXACT arithmetic (HUGEINT products of
    integer scatter entries and 1e-9-grid weight ints), then normalize
    in doubles with an ordered 64-element left fold and re-snap."""
    return f"""
x{tag} AS (
  SELECT c.j, CAST(sum(c.c * w.w9) AS DOUBLE) AS xd
  FROM cov c JOIN {w} w ON c.i = w.i
  GROUP BY c.j
), n{tag} AS (
  SELECT sqrt(list_reduce(list(xd * xd ORDER BY j), (a, b) -> a + b)) AS nrm
  FROM x{tag}
), w{tag} AS (
  -- a zero matvec (single-class scatter B = 0) makes nrm exactly 0:
  -- keep the weight at 0 instead of 0/0 (ANSI Spark throws, DuckDB
  -- NULLs; both sides carry this CASE)
  SELECT x.j AS i,
         CASE WHEN n.nrm = 0.0e0 THEN CAST(0 AS BIGINT)
              ELSE {N.sql_cents("x.xd / n.nrm", 1_000_000_000)} END AS w9
  FROM x{tag} x CROSS JOIN n{tag} n
)"""


_PCA_ORACLE = (
    f"""
WITH vint AS MATERIALIZED (
  SELECT label,
         list_transform(CAST(embedding AS DOUBLE[]), x -> {_KM_SNAP_INT}) AS vi
  FROM embeddings
), sums AS MATERIALIZED (
  SELECT label, t.i AS i,
         CAST(sum(v.vi[t.i]) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM vint v CROSS JOIN generate_series(1, {_PCA_DIM}) t(i)
  GROUP BY label, t.i
), mc AS MATERIALIZED (
  SELECT label, i,
         {N.sql_cents("CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6",
                      1_000_000_000)} AS m9
  FROM sums
), mbar AS (
  SELECT i, CAST(sum(m9) AS BIGINT) AS sm, CAST(count(*) AS BIGINT) AS nc
  FROM mc GROUP BY i
), dvec AS MATERIALIZED (
  SELECT mc.label, mc.i, mc.m9 * b.nc - b.sm AS d
  FROM mc JOIN mbar b USING (i)
), cov AS MATERIALIZED (
  SELECT x.i AS i, y.i AS j, CAST(sum(CAST(x.d AS HUGEINT) * y.d) AS HUGEINT) AS c
  FROM dvec x JOIN dvec y USING (label)
  GROUP BY 1, 2
), trace AS (
  SELECT CAST(sum(c) AS DOUBLE) AS tr FROM cov WHERE i = j
), w_init AS (
  SELECT t.i AS i, CAST({_PCA_W0} AS BIGINT) AS w9
  FROM generate_series(1, {_PCA_DIM}) t(i)
),"""
    + ",".join(
        _pca_matvec_ctes(str(k), "w_init" if k == 1 else f"w{k - 1}")
        for k in range(1, _PCA_ITERS + 1)
    )
    + f"""
SELECT CAST(w.i AS BIGINT) AS dim,
       round(CAST(w.w9 AS DOUBLE) / 1e9, 6) AS loading,
       CASE WHEN t.tr = 0.0e0 THEN 0.0e0
            ELSE round(n.nrm / (t.tr * 1e9), 6) END AS ev_ratio
FROM w{_PCA_ITERS} w
CROSS JOIN n{_PCA_ITERS} n CROSS JOIN trace t"""
)


@query(
    "pca_power_iteration",
    oracle=_PCA_ORACLE,
    doc=f"Top principal axis of the class-centroid spread (macro "
    "between-class scatter B = sum_c d_c d_c^T over the {C} label "
    f"centroids) by {_PCA_ITERS} unrolled power-iteration rounds — the "
    "discriminant direction along which classes separate most, the "
    "primitive behind hard-negative axes and common-component removal. "
    "(Raw PCA needs no iteration here: these embeddings are measured "
    "near-isotropic, lambda1/lambda2 ~ 1.07, so the class-mean matrix "
    "is the axis with a real spectral gap.) Everything until the final "
    "render is EXACT: components snap to the 1e-6 grid; class means "
    "snap to 1e-9; the centering d_c = C*m_c - sum(m) and every scatter "
    "entry are integer arithmetic (HUGEINT / DECIMAL(38,0)); each "
    "matvec multiplies integer scatter entries by 1e-9-grid weight "
    "ints. Only the per-round normalization divides in doubles (an "
    "ordered 64-element left fold), then re-snaps. Scale shape: ONE "
    "corpus pass builds labels x dim integer sums (map-side combined); "
    "the scatter is (labels x dim)^2-bounded; all "
    f"{_PCA_ITERS} iterations run on dim^2-row broadcast-joined frames "
    "— corpus-free. ev_ratio = ||Bw|| / trace(B), the top axis's share "
    "of the between-class variance.",
    survey_ids=("M7-ML7",),
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    snap_i = lambda x: N.cents(x, scale=1_000_000)  # noqa: E731
    vint = e.select(
        "label",
        F.transform(SIM.as_double(F.col("embedding")), snap_i).alias("vi"),
    )
    sums = (
        vint.select("label", F.posexplode("vi").alias("i0", "a"))
        .groupBy("label", (F.col("i0") + 1).alias("i"))
        .agg(
            F.sum("a").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    mc = sums.select(
        "label",
        "i",
        N.cents(
            F.col("s").cast("double") / F.col("n").cast("double") / F.lit(1e6),
            scale=1_000_000_000,
        ).alias("m9"),
    )
    mbar = mc.groupBy("i").agg(
        F.sum("m9").cast("bigint").alias("sm"),
        F.count(F.lit(1)).cast("bigint").alias("nc"),
    )
    dvec = mc.join(F.broadcast(mbar), "i").select(
        "label", "i", (F.col("m9") * F.col("nc") - F.col("sm")).alias("d")
    )
    x_, y_ = dvec.alias("x"), dvec.alias("y")
    cov = (
        x_.join(y_, F.col("x.label") == F.col("y.label"))
        .groupBy(F.col("x.i").alias("i"), F.col("y.i").alias("j"))
        .agg(
            F.sum(F.col("x.d").cast("decimal(38,0)") * F.col("y.d"))
            .cast("decimal(38,0)")
            .alias("c")
        )
        # ONE corpus-derived build; every iteration below re-reads this
        # (labels*dim)^2-bounded frame. localCheckpoint (the
        # mmr_rerank/pagerank precedent) pins it AND keeps each round's
        # lineage constant-size — without it the 8 unrolled rounds
        # compound into a multi-MiB task binary.
        .localCheckpoint(eager=True)
    )
    trace = cov.filter(F.col("i") == F.col("j")).agg(
        F.sum("c").cast("double").alias("tr")
    )
    w = spark.range(1, _PCA_DIM + 1).select(
        F.col("id").alias("i"), F.lit(_PCA_W0).cast("bigint").alias("w9")
    )
    for _ in range(_PCA_ITERS):
        x = (
            cov.join(F.broadcast(w), "i")
            .groupBy("j")
            .agg((F.sum(F.col("c") * F.col("w9"))).cast("double").alias("xd"))
        )
        nrm = x.agg(
            F.sqrt(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("j", "xd"))),
                        lambda s: s.xd * s.xd,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ).alias("nrm")
        )
        w = (
            x.crossJoin(F.broadcast(nrm))
            .select(
                F.col("j").alias("i"),
                # nrm is exactly 0 iff the matvec is all zeros (single
                # class -> B = 0); keep weights at 0 instead of 0/0
                F.when(
                    F.col("nrm") == 0.0, F.lit(0).cast("bigint")
                )
                .otherwise(
                    N.cents(
                        F.col("xd") / F.col("nrm"), scale=1_000_000_000
                    )
                )
                .alias("w9"),
            )
            # 64 rows; resets round lineage. r12 MEASURED AND KEPT: a
            # window-normalized single-reference variant (norm via
            # whole-frame window, no per-round pin — the mmr_rerank r12
            # trick) ran SLOWER (alternated fresh-process best-of-4:
            # pinned 4.50/6.08 s vs unpinned 5.23/6.97 s at sf0.1/32).
            # Stage count per round is invariant (~3: agg, norm,
            # broadcast), so unpinning saves no stage round-trips, while
            # the pin keeps each round's plan constant-size for AQE's
            # per-stage re-optimization. Receipt: commit 9a7d034 carries
            # the rejected variant.
            .localCheckpoint(eager=True)
        )
    return (
        w.crossJoin(F.broadcast(nrm))
        .crossJoin(F.broadcast(trace))
        .select(
            N.big("i").alias("dim"),
            N.rnd(F.col("w9").cast("double") / F.lit(1e9), 6).alias("loading"),
            # nrm carries the 1e-9 weight grid's 1e9 factor (x = B * w9);
            # divide it back out so the ratio is ||Bw|| / trace(B)
            F.when(
                F.col("tr") == 0.0,
                F.lit(0.0),
            )
            .otherwise(
                N.rnd(F.col("nrm") / (F.col("tr") * F.lit(1e9)), 6)
            )
            .alias("ev_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# golden_record_survivorship
# ---------------------------------------------------------------------------

from project_bigdata_spark.plans.dedup_queries import (  # noqa: E402
    _cluster_rounds_sql,
)

# Same verified-pair -> edges -> bounded min-label CTE block as
# dedup_clusters (plans/dedup_queries.py:296) — survivorship is the MDM
# step AFTER clustering, so the construction must be byte-identical.
_GR_CLUSTER_BLOCK = f""",
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
{_cluster_rounds_sql(DD.CLUSTER_ROUNDS)}"""


@query(
    "golden_record_survivorship",
    oracle="WITH"
    + MINHASH_CTES
    + _GR_CLUSTER_BLOCK
    + f""",
mem AS MATERIALIZED (
  SELECT l.label AS cluster_id, d.doc_id, d.n_chars, d.lang, d.source
  FROM l{DD.CLUSTER_ROUNDS} l JOIN documents d ON l.id = d.doc_id
), canon AS (
  SELECT cluster_id, doc_id AS canonical_doc_id,
         n_chars AS canonical_chars
  FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                    ORDER BY n_chars DESC, doc_id) AS rn FROM mem)
  WHERE rn = 1
), lv AS (
  SELECT cluster_id, lang AS lang_vote
  FROM (SELECT cluster_id, lang, count(*) AS c,
               row_number() OVER (PARTITION BY cluster_id
                 ORDER BY count(*) DESC, lang) AS rn
        FROM mem GROUP BY cluster_id, lang)
  WHERE rn = 1
), stats AS (
  SELECT cluster_id,
         CAST(count(*) AS BIGINT) AS n_members,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM mem GROUP BY cluster_id
)
SELECT CAST(s.cluster_id AS BIGINT) AS cluster_id,
       s.n_members,
       CAST(c.canonical_doc_id AS BIGINT) AS canonical_doc_id,
       CAST(c.canonical_chars AS BIGINT) AS canonical_chars,
       v.lang_vote,
       s.n_sources
FROM stats s JOIN canon c USING (cluster_id) JOIN lv v USING (cluster_id)""",
    doc="Golden-record survivorship — the MDM step after duplicate "
    "clustering: per near-dup cluster, elect the canonical record "
    "(longest text, doc_id tie-break) and merge attributes by "
    "deterministic field rules (majority lang with lexicographic "
    "tie-break, distinct source census). Reuses dedup_clusters' exact "
    "pair->cluster construction, then every merge rule is a rank-1 "
    "window or aggregate over the cluster membership frame — clusters "
    "are tiny relative to the corpus, so all three rule frames "
    "broadcast-join back under AQE. Tie-breaks are total orders "
    "(count DESC, lang ASC), never engine-dependent argmax.",
    survey_ids=("M7-D19",),
)
def golden_record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(d, "doc_id", "text").persist()
    pairs = DD.minhash_candidate_pairs(sigs, "doc_id")
    verified = DD.jaccard_verify(pairs, sigs, "doc_id", threshold=0.2)
    labels = DD.min_label_clusters(verified.select("id_a", "id_b"))
    mem = labels.join(d, labels["id"] == d["doc_id"]).select(
        "cluster_id", "doc_id", "n_chars", "lang", "source"
    )
    w_canon = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), "doc_id"
    )
    canon = (
        mem.withColumn("rn", F.row_number().over(w_canon))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc_id"),
            F.col("n_chars").alias("canonical_chars"),
        )
    )
    w_lang = Window.partitionBy("cluster_id").orderBy(F.desc("c"), "lang")
    lv = (
        mem.groupBy("cluster_id", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w_lang))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("lang").alias("lang_vote"))
    )
    stats = mem.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    return stats.join(canon, "cluster_id").join(lv, "cluster_id").select(
        N.big("cluster_id").alias("cluster_id"),
        "n_members",
        N.big("canonical_doc_id").alias("canonical_doc_id"),
        N.big("canonical_chars").alias("canonical_chars"),
        "lang_vote",
        "n_sources",
    )


# ---------------------------------------------------------------------------
# holt_forecast
# ---------------------------------------------------------------------------

_HOLT_LP = "(0.3e0 * h.x + 0.7e0 * (r.l + r.b))"

# NOTE the oracle is a RECURSIVE CTE, not list_reduce: DuckDB 1.0's
# list_reduce mis-evaluates struct lambdas whose fields depend on OTHER
# accumulator fields (measured: (a,e) -> {l: a.l+e.x, b: a.b+a.l} gives
# b=125 where the left fold gives 116), so only the recursive CTE
# replays Spark's aggregate fold faithfully. Arithmetic below is
# textually identical to the Spark lambda.
@query(
    "holt_forecast",
    oracle=f"""
WITH RECURSIVE hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         CAST(CAST(sum({N.sql_cents("value")}) AS BIGINT) AS DOUBLE) / 100
           AS x
  FROM events GROUP BY 1, 2
), idx AS MATERIALIZED (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY hour_ts) AS rn
  FROM hourly
), nn AS (
  SELECT event_type, CAST(max(rn) AS BIGINT) AS n FROM idx GROUP BY 1
), rec AS (
  SELECT h1.event_type, CAST(2 AS BIGINT) AS rn,
         h2.x AS l, h2.x - h1.x AS b, 2e0 AS k, 0e0 AS sse
  FROM idx h1 JOIN idx h2
    ON h1.event_type = h2.event_type AND h1.rn = 1 AND h2.rn = 2
  UNION ALL
  SELECT r.event_type, r.rn + 1,
         {_HOLT_LP},
         0.1e0 * ({_HOLT_LP} - r.l) + 0.9e0 * r.b,
         r.k + 1e0,
         r.sse + (h.x - (r.l + r.b)) * (h.x - (r.l + r.b))
  FROM rec r JOIN idx h
    ON h.event_type = r.event_type AND h.rn = r.rn + 1
), fin AS (
  SELECT r.event_type, nn.n, r.l, r.b, r.k, r.sse
  FROM rec r JOIN nn ON r.event_type = nn.event_type AND r.rn = nn.n
)
SELECT event_type,
       n AS n_hours,
       round(l, 4) AS level,
       round(b, 4) AS trend,
       round(l + b, 4) AS forecast_1h,
       round(l + 24 * b, 4) AS forecast_24h,
       CASE WHEN k > 2e0 THEN round(sqrt(sse / (k - 2e0)), 4) END
         AS rmse_1step
FROM fin""",
    doc="Holt double-exponential smoothing (alpha=0.3, beta=0.1) over "
    "each type's hourly value series, with 1h/24h linear forecasts and "
    "the one-step-ahead RMSE — the telemetry forecasting primitive the "
    "reference's ML layer approximates with batch regression. On Spark "
    "the recursion is a SINGLE ordered left fold per series (aggregate "
    "over the sorted hourly list), so the sequential smoothing state "
    "never leaves the executor and series parallelize perfectly; the "
    "oracle replays the identical arithmetic as a recursive CTE "
    "(DuckDB 1.0's list_reduce mis-folds multi-field struct state — "
    "see the module comment). Inputs come off the exact cents grid; "
    "the fold is deterministic because both engines execute the same "
    "IEEE op sequence on the same doubles. Per-series state is one "
    "5-field struct; the list frame is bounded by the series length "
    "(one row per hour), not the event count.",
    survey_ids=("M7-A44",),
)
def holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        (F.sum(N.cents("value")).cast("bigint").cast("double") / F.lit(100))
        .alias("x")
    )
    ser = hourly.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("hour_ts", "x"))),
            lambda s: s.x,
        ).alias("xs"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    alpha, beta = 0.3, 0.1

    def lam(a, xv):
        lp = F.lit(alpha) * xv + F.lit(0.7) * (a["l"] + a["b"])
        return F.when(
            a["k"] == 0.0,
            F.struct(
                xv.alias("x"),
                xv.alias("l"),
                (xv - a["x"]).alias("b"),
                F.lit(2.0).alias("k"),
                F.lit(0.0).alias("sse"),
            ),
        ).otherwise(
            F.struct(
                xv.alias("x"),
                lp.alias("l"),
                (F.lit(beta) * (lp - a["l"]) + F.lit(0.9) * a["b"]).alias("b"),
                (a["k"] + F.lit(1.0)).alias("k"),
                (
                    a["sse"]
                    + (xv - (a["l"] + a["b"])) * (xv - (a["l"] + a["b"]))
                ).alias("sse"),
            )
        )

    zero = F.lit(0.0)
    acc0 = F.struct(
        F.element_at("xs", 1).alias("x"),
        zero.alias("l"),
        zero.alias("b"),
        zero.alias("k"),
        zero.alias("sse"),
    )
    folded = ser.withColumn(
        "f",
        F.aggregate(
            F.slice(F.col("xs"), F.lit(2), F.size("xs") - F.lit(1)),
            acc0,
            lam,
        ),
    )
    f = F.col("f")
    return folded.select(
        "event_type",
        F.col("n").alias("n_hours"),
        N.rnd(f["l"]).alias("level"),
        N.rnd(f["b"]).alias("trend"),
        N.rnd(f["l"] + f["b"]).alias("forecast_1h"),
        N.rnd(f["l"] + F.lit(24) * f["b"]).alias("forecast_24h"),
        F.when(
            f["k"] > 2.0, N.rnd(F.sqrt(f["sse"] / (f["k"] - F.lit(2.0))))
        ).alias("rmse_1step"),
    )


# ---------------------------------------------------------------------------
# theil_sen_trend
# ---------------------------------------------------------------------------

@query(
    "theil_sen_trend",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS th,
         CAST(sum({N.sql_cents("value")}) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), idx AS MATERIALIZED (
  SELECT event_type, th - min(th) OVER (PARTITION BY event_type) AS t, c
  FROM hourly
), slopes AS MATERIALIZED (
  SELECT a.event_type,
         b.c - a.c AS dc, b.t - a.t AS dt,
         CAST(b.c - a.c AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s,
         a.t AS ti, b.t AS tj
  FROM idx a JOIN idx b
    ON a.event_type = b.event_type AND a.t < b.t
), med_s AS (
  SELECT event_type, s AS slope_c, n_pairs FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                ORDER BY s, dc, dt, ti, tj) AS rn,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs
    FROM slopes)
  WHERE rn = (n_pairs + 1) // 2
), resid AS (
  SELECT i.event_type, CAST(i.c AS DOUBLE) - m.slope_c * i.t AS r, i.t
  FROM idx i JOIN med_s m USING (event_type)
), med_r AS (
  SELECT event_type, r AS icept_c FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY r, t) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM resid)
  WHERE rn = (n + 1) // 2
)
SELECT s.event_type,
       s.n_pairs,
       round(s.slope_c / 100, 6) AS sen_slope_per_hour,
       round(r.icept_c / 100, 4) AS sen_intercept
FROM med_s s JOIN med_r r USING (event_type)""",
    doc="Theil-Sen robust trend per hourly series: the median of all "
    "pairwise slopes (and the median-residual intercept) — the "
    "outlier-proof alternative to trend_fit's OLS (one wild hour can "
    "drag a least-squares slope arbitrarily; the slope median has a "
    "29.3% breakdown point). Slopes are exact-int ratios dc/dt over "
    "integer hour offsets; the lower median is selected by rank with a "
    "full deterministic tie-break (s, dc, dt, ti, tj), never averaged. "
    "Scale shape: the pair self-join is O(series_length^2) per series — "
    "bounded by the TIME RANGE (720 hours -> ~260k pairs), completely "
    "independent of the event count, so the decade slope is ~flat; "
    "series partition the work perfectly.",
    survey_ids=("M7-A45",),
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias("th"),
    ).agg(F.sum(N.cents("value")).cast("bigint").alias("c"))
    idx = hourly.select(
        "event_type",
        (
            F.col("th") - F.min("th").over(Window.partitionBy("event_type"))
        ).alias("t"),
        "c",
    )
    a, b = idx.alias("a"), idx.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            (F.col("b.c") - F.col("a.c")).alias("dc"),
            (F.col("b.t") - F.col("a.t")).alias("dt"),
            (
                (F.col("b.c") - F.col("a.c")).cast("double")
                / (F.col("b.t") - F.col("a.t")).cast("double")
            ).alias("s"),
            F.col("a.t").alias("ti"),
            F.col("b.t").alias("tj"),
        )
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        "s", "dc", "dt", "ti", "tj"
    )
    w_all = Window.partitionBy("event_type")
    med_s = (
        slopes.select(
            "event_type",
            "s",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_all).cast("bigint").alias("n_pairs"),
        )
        .filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select("event_type", F.col("s").alias("slope_c"), "n_pairs")
    )
    resid = idx.join(F.broadcast(med_s), "event_type").select(
        "event_type",
        (F.col("c").cast("double") - F.col("slope_c") * F.col("t")).alias(
            "r"
        ),
        "t",
        "slope_c",
        "n_pairs",
    )
    w_r = Window.partitionBy("event_type").orderBy("r", "t")
    med_r = (
        resid.select(
            "event_type",
            "r",
            "slope_c",
            "n_pairs",
            F.row_number().over(w_r).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
    )
    return med_r.select(
        "event_type",
        N.big("n_pairs").alias("n_pairs"),
        N.rnd(F.col("slope_c") / F.lit(100), 6).alias("sen_slope_per_hour"),
        N.rnd(F.col("r") / F.lit(100)).alias("sen_intercept"),
    )


# ---------------------------------------------------------------------------
# mann_kendall_test
# ---------------------------------------------------------------------------

@query(
    "mann_kendall_test",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS t,
         CAST(sum({N.sql_cents("value")}) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), s AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.t < b.t
  GROUP BY a.event_type
), nn AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM hourly GROUP BY 1
), ties AS (
  SELECT event_type,
         CAST(coalesce(sum(tg * (tg - 1) * (2 * tg + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS tg
        FROM hourly GROUP BY event_type, c)
  WHERE tg > 1 GROUP BY event_type
), stat AS (
  SELECT s.event_type, nn.n, s.s_stat,
         nn.n * (nn.n - 1) * (2 * nn.n + 5)
           - coalesce(t.tie_term, 0) AS varnum
  FROM s JOIN nn USING (event_type)
  LEFT JOIN ties t ON s.event_type = t.event_type
)
SELECT event_type,
       n AS n_hours,
       s_stat,
       round(CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                  WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                  ELSE 0e0 END
             / sqrt(CAST(varnum AS DOUBLE) / 18), 4) AS z_stat,
       CASE WHEN s_stat > 0
                 AND 180000 * (s_stat - 1) * (s_stat - 1) > 38416 * varnum
              THEN 'increasing'
            WHEN s_stat < 0
                 AND 180000 * (s_stat + 1) * (s_stat + 1) > 38416 * varnum
              THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM stat""",
    doc="Mann-Kendall trend significance test per hourly series — the "
    "nonparametric test conventionally paired with the Theil-Sen slope: "
    "S = sum of sign(x_j - x_i) over ordered pairs, tie-corrected "
    "variance n(n-1)(2n+5)/18 - sum t_g(t_g-1)(2t_g+5)/18, "
    "continuity-corrected Z, two-sided 5% decision. S, the tie term, "
    "and the trend CLASSIFICATION are pure integer arithmetic "
    "(180000*(S-1)^2 > 38416*varnum encodes |Z| > 1.96 exactly, since "
    "1.96^2 = 38416/10000) — no float can flip the label cross-engine; "
    "the one double division renders Z. Same series-length-bounded "
    "pair join as theil_sen_trend: O(hours^2) per series, independent "
    "of event count.",
    survey_ids=("M7-A46",),
)
def mann_kendall_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias("t"),
    ).agg(F.sum(N.cents("value")).cast("bigint").alias("c")).persist()
    a, b = hourly.alias("a"), hourly.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    nn = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ties = (
        hourly.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tg"))
        .filter(F.col("tg") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tg") * (F.col("tg") - 1) * (2 * F.col("tg") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    stat = (
        s.join(nn, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n",
            "s_stat",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0))
            ).alias("varnum"),
        )
    )
    sgn = F.col("s_stat")
    num = (
        F.when(sgn > 0, (sgn - 1).cast("double"))
        .when(sgn < 0, (sgn + 1).cast("double"))
        .otherwise(F.lit(0.0))
    )
    up = F.lit(180000) * (sgn - 1) * (sgn - 1) > F.lit(38416) * F.col("varnum")
    dn = F.lit(180000) * (sgn + 1) * (sgn + 1) > F.lit(38416) * F.col("varnum")
    return stat.select(
        "event_type",
        F.col("n").alias("n_hours"),
        "s_stat",
        N.rnd(num / F.sqrt(F.col("varnum").cast("double") / F.lit(18))).alias(
            "z_stat"
        ),
        F.when((sgn > 0) & up, "increasing")
        .when((sgn < 0) & dn, "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    )


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------

_TRI_SQL = f"""
CASE WHEN len({WORDS_SQL}) >= 3
     THEN list_transform(range(1, len({WORDS_SQL}) - 1),
            i -> concat_ws(' ', {WORDS_SQL}[i], {WORDS_SQL}[i+1],
                           {WORDS_SQL}[i+2]))
     ELSE [] END"""


@query(
    "ngram_novelty",
    oracle=f"""
WITH tri AS (
  SELECT lang, source, unnest({_TRI_SQL}) AS tri FROM documents
), per_ls AS (
  SELECT tri, lang, source, CAST(count(*) AS BIGINT) AS cnt_ls
  FROM tri GROUP BY 1, 2, 3
), tot AS (
  SELECT *, sum(cnt_ls) OVER (PARTITION BY tri) AS cnt_all FROM per_ls
), grp AS (
  SELECT lang, source,
         CAST(sum(cnt_ls) AS BIGINT) AS n_trigrams,
         CAST(sum(CASE WHEN cnt_all = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
  FROM tot GROUP BY lang, source
), docs AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang, source
)
SELECT d.lang, d.source, d.n_docs,
       coalesce(g.n_trigrams, 0) AS n_trigrams,
       coalesce(g.n_novel, 0) AS n_novel,
       CASE WHEN coalesce(g.n_trigrams, 0) = 0 THEN NULL
            ELSE round(CAST(g.n_novel AS DOUBLE) / g.n_trigrams, 6)
       END AS novelty_rate
FROM docs d LEFT JOIN grp g USING (lang, source)""",
    doc="Corpus novelty audit: the share of word-trigram OCCURRENCES in "
    "each (lang, source) slice that are globally unique (corpus count "
    "== 1) — the inverse of boilerplate_ngrams (which surfaces the "
    "most-repeated n-grams, this scores how much of a slice is "
    "unrepeated text). A collapsing novelty rate on an incoming "
    "source is the classic template-spam / scraper-loop signal; "
    "dedup cannot see it because the repeats straddle documents. "
    "Docs under 3 words contribute zero trigrams (no whole-text "
    "fallback — novelty of a 2-word doc is undefined, not 1.0). "
    "Exactness: pure integer counts; one double division at render. "
    "Plan: explode trigrams once, aggregate per (trigram, lang, "
    "source), one window over the trigram hash partitioning for the "
    "global count, one group aggregate — payload text never shuffles "
    "twice, only (trigram, count) pairs move.",
    survey_ids=("M7-C20",),
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan out + PROJECT the word array before the higher-order slice:
    # the interpreted lambda re-evaluates its input tree per element, so
    # binding the split() expression directly re-tokenized every doc per
    # trigram — O(len^2) per doc on the input's single split (round-6
    # re-plan: 5.3s -> ~1.3s at sf0.1)
    d = DD.fan_out(
        load_table(spark, sf_dir, "documents").select(
            "lang", "source", "text"
        )
    )
    wsd = d.select(
        "lang", "source", DD.words_col(F.col("text")).alias("_ws")
    )
    ws = F.col("_ws")
    tri_arr = F.when(
        F.size(ws) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 2),
            lambda i: F.concat_ws(" ", F.slice(ws, i, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tri = wsd.select(
        "lang", "source", F.explode(tri_arr).alias("tri")
    )
    per_ls = tri.groupBy("tri", "lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_ls")
    )
    # a globally-unique trigram has exactly ONE (tri, lang, source) row
    # with cnt_ls = 1, so min(lang)/min(source) identify its slice — a
    # hash-aggregate chain instead of a sort-based window over the
    # trigram partitioning. (The decade slope ~5x is the trigram
    # OCCURRENCE volume itself — explode + one string shuffle — i.e.
    # the honest linear cost, not a plan defect.)
    novel = (
        per_ls.groupBy("tri")
        .agg(
            F.sum("cnt_ls").alias("cnt_all"),
            F.min("lang").alias("lang"),
            F.min("source").alias("source"),
        )
        .filter(F.col("cnt_all") == 1)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    )
    occ = per_ls.groupBy("lang", "source").agg(
        F.sum("cnt_ls").cast("bigint").alias("n_trigrams")
    )
    grp = occ.join(novel, ["lang", "source"], "left").select(
        "lang",
        "source",
        "n_trigrams",
        F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint").alias(
            "n_novel"
        ),
    )
    docs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    j = docs.join(grp, ["lang", "source"], "left")
    n_tri = F.coalesce(F.col("n_trigrams"), F.lit(0))
    return j.select(
        "lang",
        "source",
        "n_docs",
        n_tri.alias("n_trigrams"),
        F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
        F.when(n_tri == 0, F.lit(None).cast("double"))
        .otherwise(
            N.rnd(F.col("n_novel").cast("double") / F.col("n_trigrams"), 6)
        )
        .alias("novelty_rate"),
    )


# ---------------------------------------------------------------------------
# sequential_patterns
# ---------------------------------------------------------------------------

@query(
    "sequential_patterns",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), spans AS (
  SELECT user_id, sid, event_type,
         min(epoch_us(ts)) AS first_us,
         max(epoch_us(ts)) AS last_us
  FROM sess GROUP BY 1, 2, 3
), typ AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_sessions
  FROM spans GROUP BY event_type
), tot AS (
  SELECT CAST(count(DISTINCT (user_id, sid)) AS BIGINT) AS n_total FROM spans
), pairs AS (
  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         CAST(count(*) AS BIGINT) AS support_sessions
  FROM spans a JOIN spans b
    ON a.user_id = b.user_id AND a.sid = b.sid
   AND a.event_type <> b.event_type
   AND a.first_us < b.last_us
  GROUP BY 1, 2
)
SELECT p.antecedent, p.consequent, p.support_sessions,
       ta.n_sessions AS sessions_with_a,
       tb.n_sessions AS sessions_with_b,
       round(CAST(p.support_sessions AS DOUBLE) / ta.n_sessions, 6)
         AS confidence,
       round(CAST(p.support_sessions AS DOUBLE) * t.n_total
             / (CAST(ta.n_sessions AS DOUBLE) * tb.n_sessions), 6) AS lift
FROM pairs p
JOIN typ ta ON p.antecedent = ta.event_type
JOIN typ tb ON p.consequent = tb.event_type
CROSS JOIN tot t""",
    doc="Sequential pattern mining over 30-minute-gap sessions: for "
    "every ordered pair of event types (A, B), the number of sessions "
    "where some A event strictly precedes some B event (first(A) < "
    "last(B) — the exists-before predicate), with confidence "
    "support/sessions(A) and lift support*total/(sessions(A)* "
    "sessions(B)). The ORDERED complement of assoc_rules (co-presence) "
    "and markov_steady_state (adjacent transitions): it sees A ...-> B "
    "even across interleaved noise events. Exactness: epoch-microsecond "
    "integer comparisons and integer counts; two double divisions at "
    "render. Plan: one sessionization window per user, per-(session, "
    "type) min/max aggregate, then a WITHIN-SESSION self-join whose "
    "fanout is bounded by the type vocabulary squared per session — "
    "never by event volume; totals are a broadcast type-cardinality "
    "frame and one scalar row.",
    survey_ids=("M7-B20",),
)
def sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_s = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = e.select(
        "user_id",
        "event_type",
        us.alias("us"),
        F.sum(new_s)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    spans = sess.groupBy("user_id", "sid", "event_type").agg(
        F.min("us").alias("first_us"), F.max("us").alias("last_us")
    )
    typ = spans.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    tot = (
        spans.select("user_id", "sid")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    )
    a, b = spans.alias("a"), spans.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.sid") == F.col("b.sid"))
            & (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.first_us") < F.col("b.last_us")),
        )
        .groupBy(
            F.col("a.event_type").alias("antecedent"),
            F.col("b.event_type").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("support_sessions"))
    )
    ta = typ.select(
        F.col("event_type").alias("antecedent"),
        F.col("n_sessions").alias("sessions_with_a"),
    )
    tb = typ.select(
        F.col("event_type").alias("consequent"),
        F.col("n_sessions").alias("sessions_with_b"),
    )
    return (
        pairs.join(F.broadcast(ta), "antecedent")
        .join(F.broadcast(tb), "consequent")
        .crossJoin(F.broadcast(tot))
        .select(
            "antecedent",
            "consequent",
            "support_sessions",
            "sessions_with_a",
            "sessions_with_b",
            N.rnd(
                F.col("support_sessions").cast("double")
                / F.col("sessions_with_a"),
                6,
            ).alias("confidence"),
            N.rnd(
                F.col("support_sessions").cast("double")
                * F.col("n_total")
                / (
                    F.col("sessions_with_a").cast("double")
                    * F.col("sessions_with_b")
                ),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# word_pmi
# ---------------------------------------------------------------------------

PMI_MIN_DOCS = 5
PMI_TOP_K = 20


@query(
    "word_pmi",
    oracle=f"""
WITH pres AS (
  SELECT DISTINCT doc_id, unnest({WORDS_SQL}) AS w FROM documents
), df AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM pres GROUP BY w
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), pairs AS (
  SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS c_both
  FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY 1, 2
), scored AS (
  SELECT p.w1, p.w2, p.c_both,
         CAST(p.c_both AS DOUBLE) * n.n_docs
           / (CAST(d1.c AS DOUBLE) * d2.c) AS lift
  FROM pairs p
  JOIN df d1 ON p.w1 = d1.w
  JOIN df d2 ON p.w2 = d2.w
  CROSS JOIN n
  WHERE p.c_both >= {PMI_MIN_DOCS}
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY lift DESC, w1, w2) AS rk
  FROM scored
)
SELECT w1, w2, c_both AS n_docs_both,
       round(lift, 4) AS lift,
       round(ln(lift), 4) AS pmi
FROM ranked WHERE rk <= {PMI_TOP_K}""",
    doc="Pointwise mutual information over word co-occurrence at the "
    "DOCUMENT level: for every word pair present together in >= "
    f"{PMI_MIN_DOCS} documents, lift = N*c_xy/(c_x*c_y) and PMI = "
    "ln(lift); top "
    f"{PMI_TOP_K} pairs — the collocation / topic-pair detector that "
    "feeds phrase induction (word2phrase) and taxonomy seeding in a "
    "corpus pipeline. Determinism: presence counts are exact integers; "
    "lift is ONE double expression over three exact integers (identical "
    "cross-engine), the ranking orders by that identical double with a "
    "full (w1, w2) tie-break, and ln renders once. Plan: distinct "
    "(doc, word) presence frame, a per-document self-join whose fanout "
    "is vocabulary-bounded per doc, two broadcast doc-frequency joins, "
    "one scalar N row; WindowGroupLimit caps the rank at "
    f"{PMI_TOP_K}.",
    survey_ids=("M7-C21",),
)
def word_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    pres = d.select(
        "doc_id", F.explode(DD.words_col(F.col("text"))).alias("w")
    ).distinct()
    df_ = pres.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    a, b = pres.alias("a"), pres.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_both"))
        .filter(F.col("c_both") >= PMI_MIN_DOCS)
    )
    d1 = df_.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    d2 = df_.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        pairs.join(F.broadcast(d1), "w1")
        .join(F.broadcast(d2), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c_both",
            (
                F.col("c_both").cast("double")
                * F.col("n_docs")
                / (F.col("c1").cast("double") * F.col("c2"))
            ).alias("lift"),
        )
    )
    ranked = scored.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy().orderBy(
                F.col("lift").desc(), "w1", "w2"
            )
        ),
    ).filter(F.col("rk") <= PMI_TOP_K)
    return ranked.select(
        "w1",
        "w2",
        F.col("c_both").alias("n_docs_both"),
        N.rnd(F.col("lift")).alias("lift"),
        N.rnd(F.log(F.col("lift"))).alias("pmi"),
    )


# ---------------------------------------------------------------------------
# entropy_rate
# ---------------------------------------------------------------------------

@query(
    "entropy_rate",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), trans AS (
  SELECT prev, event_type AS nxt, CAST(count(*) AS BIGINT) AS c_ij
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
), rowm AS (
  SELECT prev, CAST(sum(c_ij) AS BIGINT) AS c_i FROM trans GROUP BY prev
), terms AS (
  SELECT t.c_ij,
         CASE WHEN ln(CAST(r.c_i AS DOUBLE) / t.c_ij) >= 0
              THEN floor(ln(CAST(r.c_i AS DOUBLE) / t.c_ij)
                         * 1000000000 + 0.5)
              ELSE -floor(-ln(CAST(r.c_i AS DOUBLE) / t.c_ij)
                          * 1000000000 + 0.5) END AS l9
  FROM trans t JOIN rowm r USING (prev)
), agg AS (
  SELECT CAST(sum(c_ij) AS BIGINT) AS c_total,
         CAST(sum(CAST(c_ij AS HUGEINT) * l9) AS HUGEINT) AS num,
         CAST(count(*) AS BIGINT) AS n_edges
  FROM terms
), states AS (
  SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_states FROM events
)
SELECT a.c_total AS n_transitions,
       s.n_states,
       a.n_edges AS n_observed_edges,
       round(CAST(a.num AS DOUBLE) / a.c_total / 1e9, 6)
         AS entropy_rate_nats,
       round(ln(CAST(s.n_states AS DOUBLE)), 6) AS max_entropy_nats,
       -- one observed state makes ln(k) exactly 0: decide on the
       -- exact integer state count BEFORE the division
       CASE WHEN s.n_states < 2 THEN 0.0e0 ELSE
         round(CAST(a.num AS DOUBLE) / a.c_total / 1e9
               / ln(CAST(s.n_states AS DOUBLE)), 6) END
         AS predictability_gap
FROM agg a CROSS JOIN states s""",
    doc="Entropy rate of the per-user event-type Markov process: H = "
    "sum_ij (c_ij/C) * ln(c_i/c_ij) over the empirical transition "
    "counts (the conditional next-event entropy in nats), reported "
    "against the ln(k) maximum — the single number that says how "
    "predictable user behavior is (the complement of "
    "markov_steady_state, which reports WHERE the chain spends time, "
    "not how random its moves are). Exactness: transition counts are "
    "integers; each ln(c_i/c_ij) is a per-edge double over two exact "
    "integers snapped to the 1e-9 grid, multiplied by the integer "
    "c_ij, and summed exactly — snap-then-sum, no cross-row float. "
    "Plan: one per-user lag window, one (prev, next) aggregate "
    "(states^2 rows), scalar algebra — the window is the only "
    "event-volume pass.",
    survey_ids=("M7-B23",),
)
def entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy("prev", F.col("event_type").alias("nxt")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ij")
    )
    rowm = trans.groupBy("prev").agg(
        F.sum("c_ij").cast("bigint").alias("c_i")
    )
    terms = trans.join(F.broadcast(rowm), "prev").select(
        "c_ij",
        N.cents(
            F.log(F.col("c_i").cast("double") / F.col("c_ij")),
            scale=1_000_000_000,
        ).alias("l9"),
    )
    agg = terms.agg(
        F.sum("c_ij").cast("bigint").alias("c_total"),
        F.sum(F.col("c_ij").cast("decimal(38,0)") * F.col("l9")).alias(
            "num"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
    )
    states = e.agg(
        F.countDistinct("event_type").cast("bigint").alias("n_states")
    )
    h = F.col("num").cast("double") / F.col("c_total") / 1e9
    return agg.crossJoin(F.broadcast(states)).select(
        F.col("c_total").alias("n_transitions"),
        "n_states",
        F.col("n_edges").alias("n_observed_edges"),
        N.rnd(h, 6).alias("entropy_rate_nats"),
        N.rnd(F.log(F.col("n_states").cast("double")), 6).alias(
            "max_entropy_nats"
        ),
        F.when(
            F.col("n_states") >= 2,
            N.rnd(h / F.log(F.col("n_states").cast("double")), 6),
        )
        .otherwise(F.lit(0.0))
        .alias(
            "predictability_gap"
        ),
    )


# ---------------------------------------------------------------------------
# temperature_mix_allocation (round 7)
# ---------------------------------------------------------------------------

_MIX_BUDGET = 1000


@query(
    "temperature_mix_allocation",
    oracle=f"""
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
), tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
w AS (
  SELECT lang, n,
         {N.sql_cents("sqrt(sqrt(CAST(n AS DOUBLE) / nt))", 10**9)} AS w9
  FROM c, tot
), sw AS (SELECT CAST(sum(CAST(w9 AS HUGEINT)) AS HUGEINT) AS s FROM w),
q AS (
  SELECT lang, n, w9,
         ({_MIX_BUDGET} * CAST(w9 AS HUGEINT)) // s AS base,
         ({_MIX_BUDGET} * CAST(w9 AS HUGEINT)) % s AS rem
  FROM w, sw
), fl AS (SELECT CAST(sum(base) AS BIGINT) AS fsum FROM q),
r AS (
  SELECT q.*, fl.fsum,
         row_number() OVER (ORDER BY rem DESC, lang) AS rk
  FROM q, fl
)
SELECT lang, n AS n_docs,
       round(CAST(w9 AS DOUBLE) / 1e9, 6) AS weight,
       CAST(base + CASE WHEN rk <= {_MIX_BUDGET} - fsum THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM r""",
    doc="Temperature-scaled sampling allocation (the multilingual "
    "data-mixing primitive: share_l ~ p_l^alpha flattens the head so "
    "low-resource languages survive, mT5/XLM-R style): alpha = 1/4 "
    "computed as sqrt(sqrt(p)) — two correctly-rounded IEEE sqrts, "
    "bit-identical cross-engine, where a pow(p, 0.3) would be "
    "libm-dependent — weights snapped to the 1e-9 integer grid, and "
    "the 1000-doc budget apportioned by exact-integer largest-"
    "remainder (Hamilton) rounding: base = floor(B*w/S), the B - "
    "sum(base) leftover units go to the largest remainders with full "
    "(rem DESC, lang) tie-break, so sum(alloc) == B exactly. Plan: "
    "one #langs-row aggregate plus three broadcast scalar rows — the "
    "corpus is touched once.",
    survey_ids=("M7-C25",),
)
def temperature_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = c.agg(F.sum("n").cast("bigint").alias("nt"))
    w = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        N.cents(
            F.sqrt(F.sqrt(F.col("n").cast("double") / F.col("nt"))), 10**9
        ).alias("w9"),
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    sw = w.agg(F.sum(dec(F.col("w9"))).alias("s"))
    q = w.crossJoin(F.broadcast(sw)).select(
        "lang",
        "n",
        "w9",
        F.expr(
            f"CAST({_MIX_BUDGET} AS DECIMAL(38,0)) * w9 div s"
        ).alias("base"),
        F.expr(f"CAST({_MIX_BUDGET} AS DECIMAL(38,0)) * w9 % s").alias("rem"),
    )
    fl = q.agg(F.sum("base").cast("bigint").alias("fsum"))
    r = q.crossJoin(F.broadcast(fl)).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy(F.lit(1)).orderBy(F.desc("rem"), "lang")
        ),
    )
    return r.select(
        "lang",
        F.col("n").alias("n_docs"),
        N.rnd(F.col("w9").cast("double") / F.lit(1e9), 6).alias("weight"),
        (
            F.col("base")
            + F.when(
                F.col("rk") <= F.lit(_MIX_BUDGET) - F.col("fsum"), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("alloc"),
    )


# ---------------------------------------------------------------------------
# gumbel_topk_sample (round 7)
# ---------------------------------------------------------------------------

_GUMBEL_K = 100


@query(
    "gumbel_topk_sample",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) + 0.5) / 4294967296.0 AS u
  FROM documents
  WHERE n_chars > 0
), scored AS (
  SELECT doc_id, lang, n_chars,
         {N.sql_cents("ln(CAST(n_chars AS DOUBLE))", 10**9)}
         + {N.sql_cents("-ln(-ln(u))", 10**9)} AS key9
  FROM keyed
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(n_chars AS BIGINT) AS n_chars,
       round(CAST(key9 AS DOUBLE) / 1e9, 6) AS gumbel_key
FROM scored
ORDER BY key9 DESC, doc_id LIMIT {_GUMBEL_K}""",
    doc="Weighted sampling WITHOUT replacement via the Gumbel-top-k "
    "trick (the exact distributed form of weight-proportional "
    "sampling: key = ln(w) + Gumbel noise, take the global top-k — "
    "equivalent in distribution to sequential draws, but "
    "embarrassingly parallel): per-doc weight = n_chars "
    "(token-budget-proportional corpus sampling), noise from the "
    "md5 uniform (u32 + 0.5)/2^32 — an exact dyadic double, "
    "identical cross-engine — through -ln(-ln(u)), both log terms "
    "snapped to the 1e-9 integer grid before the sum so the ranking "
    "key is an exact integer. Fully deterministic and "
    "oracle-replayable, like every sampler in this catalog. Plan: "
    "one narrow scan, TakeOrderedAndProject distributed partial "
    "top-k — no global sort, no shuffle of the corpus.",
    survey_ids=("M7-P5",),
)
def gumbel_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # zero-weight (empty) documents are unsampleable by definition
    # (ln(0) diverges; Gumbel key would be -inf) — exclude them on the
    # exact integer weight BEFORE the log, mirrored in the oracle
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    u = (u32 + F.lit(0.5)) / F.lit(4294967296.0)
    key9 = N.cents(F.log(F.col("n_chars").cast("double")), 10**9) + N.cents(
        -F.log(-F.log(u)), 10**9
    )
    scored = d.select(
        "doc_id", "lang", "n_chars", key9.alias("key9")
    )
    return (
        scored.orderBy(F.desc("key9"), "doc_id")
        .limit(_GUMBEL_K)
        .select(
            N.big("doc_id").alias("doc_id"),
            "lang",
            N.big("n_chars").alias("n_chars"),
            N.rnd(F.col("key9").cast("double") / F.lit(1e9), 6).alias(
                "gumbel_key"
            ),
        )
    )


# ---------------------------------------------------------------------------
# dsir_resample (round 8)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 1024
_DSIR_K = 100
# unigrams + adjacent word bigrams, the DSIR paper's feature set
_DSIR_GRAMS_SQL = (
    "list_concat({WS}, CASE WHEN len({WS}) >= 2 THEN "
    "list_transform(range(1, len({WS})), i -> {WS}[i] || ' ' || {WS}[i+1]) "
    "ELSE CAST([] AS VARCHAR[]) END)"
)


@query(
    "dsir_resample",
    oracle=f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, lang, {WORDS_SQL} AS ws FROM documents
), grams AS MATERIALIZED (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5(g), 1, 8))::BIGINT
              % {_DSIR_BUCKETS} AS BIGINT) AS bucket
  FROM (SELECT doc_id, lang, unnest({_DSIR_GRAMS_SQL.replace("{WS}", "ws")}) AS g
        FROM d)
), docb AS MATERIALIZED (
  SELECT doc_id, lang, bucket, count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3
), rb AS MATERIALIZED (
  SELECT bucket, sum(cnt) AS cr,
         sum(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS ct
  FROM docb GROUP BY bucket
), tot AS (
  SELECT CAST(sum(cr) AS DOUBLE) AS tr, CAST(sum(ct) AS DOUBLE) AS tt FROM rb
), rt AS MATERIALIZED (
  SELECT bucket,
         {N.sql_cents(f"ln((ct + 1) / ((SELECT tt FROM tot) + {_DSIR_BUCKETS}))", 10**9)}
         - {N.sql_cents(f"ln((cr + 1) / ((SELECT tr FROM tot) + {_DSIR_BUCKETS}))", 10**9)}
           AS lr9
  FROM rb
), doclog AS (
  SELECT b.doc_id, b.lang, sum(b.cnt * rt.lr9) AS logw9
  FROM docb b JOIN rt USING (bucket)
  GROUP BY 1, 2
), keyed AS (
  SELECT doc_id, lang, logw9,
         logw9 + {N.sql_cents(
             "-ln(-ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0))",
             10**9)} AS key9
  FROM doclog
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       round(CAST(logw9 AS DOUBLE) / 1e9, 6) AS log_weight,
       round(CAST(key9 AS DOUBLE) / 1e9, 6) AS gumbel_key
FROM keyed
ORDER BY key9 DESC, doc_id LIMIT {_DSIR_K}""",
    doc="DSIR-style data selection (Xie et al. 2023, 'Data Selection for "
    "Language Models via Importance Resampling', public): hashed-n-gram "
    "importance weights target-vs-raw, then sampling WITHOUT replacement "
    "via the catalog's Gumbel-top-k machinery. Features = unigrams + "
    f"adjacent word bigrams hashed into {_DSIR_BUCKETS} fixed buckets "
    "(the feature_hashing trick — the model width is independent of "
    "vocabulary, so the two 'LM' distributions are 1024-row tables "
    "however large the corpus). Target distribution = the lang='en' "
    "slice; raw = the whole corpus; per-bucket Laplace-smoothed "
    "log-likelihood ratios are snapped to the 1e-9 grid (ONE ln per "
    "bucket per side, absorbed by the snap), so the per-doc importance "
    "log-weight sum(cnt * lr9) is exact integer arithmetic — order-free "
    "and engine-identical. Selection key = log-weight + the md5-dyadic "
    "Gumbel term from gumbel_topk_sample; global top-100 is a "
    "TakeOrderedAndProject partial top-k. Plan: the ratio table is a "
    "1024-row broadcast join onto integer (doc_id, bucket, cnt) triples; "
    "the corpus text never shuffles — at 100 TB only hashed-gram counts "
    "and one 1024-row model move.",
    survey_ids=("M7-P6",),
)
def dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = DD.fan_out(
        d.select("doc_id", "lang", DD.words_col(F.col("text")).alias("_ws"))
    )
    grams = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.concat(
                F.col("_ws"),
                F.expr(
                    "CASE WHEN size(_ws) >= 2 THEN "
                    "transform(sequence(1, size(_ws) - 1), "
                    "i -> concat(element_at(_ws, i), ' ', element_at(_ws, i + 1))) "
                    "ELSE CAST(array() AS ARRAY<STRING>) END"
                ),
            )
        ).alias("g"),
    )
    bucket = (
        F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("bigint")
        % _DSIR_BUCKETS
    )
    docb = (
        grams.withColumn("bucket", bucket)
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rb = docb.groupBy("bucket").agg(
        F.sum("cnt").alias("cr"),
        F.sum(F.when(F.col("lang") == "en", F.col("cnt")).otherwise(F.lit(0))).alias("ct"),
    )
    tot = rb.agg(
        F.sum("cr").cast("double").alias("tr"),
        F.sum("ct").cast("double").alias("tt"),
    )
    rt = rb.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            N.cents(
                F.log((F.col("ct") + 1) / (F.col("tt") + F.lit(float(_DSIR_BUCKETS)))),
                10**9,
            )
            - N.cents(
                F.log((F.col("cr") + 1) / (F.col("tr") + F.lit(float(_DSIR_BUCKETS)))),
                10**9,
            )
        ).alias("lr9"),
    )
    doclog = (
        docb.join(F.broadcast(rt), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("cnt") * F.col("lr9")).alias("logw9"))
    )
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    u = (u32 + F.lit(0.5)) / F.lit(4294967296.0)
    keyed = doclog.withColumn(
        "key9", F.col("logw9") + N.cents(-F.log(-F.log(u)), 10**9)
    )
    return (
        keyed.orderBy(F.desc("key9"), "doc_id")
        .limit(_DSIR_K)
        .select(
            N.big("doc_id").alias("doc_id"),
            "lang",
            N.rnd(F.col("logw9").cast("double") / F.lit(1e9), 6).alias("log_weight"),
            N.rnd(F.col("key9").cast("double") / F.lit(1e9), 6).alias("gumbel_key"),
        )
    )


# ---------------------------------------------------------------------------
# contamination_audit (round 8)
# ---------------------------------------------------------------------------

_CONTAM_K = 13       # the GPT-3 appendix-C decontamination gram width
_CONTAM_STRIDE = 41  # every 41st doc contributes its grams as "benchmark"


@query(
    "contamination_audit",
    oracle=f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, {WORDS_SQL} AS ws FROM documents
), grams AS MATERIALIZED (
  SELECT doc_id,
         md5(list_aggregate(ws[i:i+{_CONTAM_K - 1}], 'string_agg', ' '))
           AS g
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - {_CONTAM_K - 2})) AS i
        FROM d WHERE len(ws) >= {_CONTAM_K})
), bench AS MATERIALIZED (
  SELECT DISTINCT g FROM grams WHERE doc_id % {_CONTAM_STRIDE} = 0
), hits AS (
  SELECT doc_id, count(DISTINCT g.g) AS n_hits
  FROM grams g JOIN bench USING (g)
  GROUP BY doc_id
), per_doc AS (
  SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
)
SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
       CAST(p.n_grams AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_bench_hits,
       CAST(CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
FROM per_doc p LEFT JOIN hits h USING (doc_id)""",
    doc="Benchmark-contamination audit (the GPT-3 appendix-C / PaLM "
    f"decontamination rule, public): a training document is contaminated "
    f"if it shares any word {_CONTAM_K}-gram with the evaluation set. "
    "The 'benchmark' is drawn deterministically in-query (the grams of "
    f"every {_CONTAM_STRIDE}st doc — the realistic worst case, since "
    "leaked benchmarks ARE corpus members); per-doc output = total "
    f"{_CONTAM_K}-grams, distinct benchmark grams hit, and the "
    "contaminated flag that a decontamination filter would act on. "
    "Plan shape is the one that matters at 100 TB: benchmark digests "
    "are a bounded broadcast set (real eval suites are ~1e4-1e6 items), "
    "so the corpus side never shuffles its grams — md5 digests stream "
    "through a broadcast-hash semi-join and collapse map-side into "
    "per-doc counts. Only (doc_id, count) pairs reach the exchange; "
    "the text never leaves the scan.",
    survey_ids=("M7-D29",),
)
def contamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = DD.fan_out(
        d.select("doc_id", DD.words_col(F.col("text")).alias("_ws"))
    ).filter(F.size("_ws") >= _CONTAM_K)
    grams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(_ws) - {_CONTAM_K - 1}), "
                f"i -> md5(array_join(slice(_ws, i, {_CONTAM_K}), ' ')))"
            )
        ).alias("g"),
    )
    bench = (
        grams.filter(F.col("doc_id") % _CONTAM_STRIDE == 0)
        .select("g")
        .distinct()
    )
    hits = (
        grams.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )
    per_doc = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return per_doc.join(hits, "doc_id", "left").select(
        N.big("doc_id").alias("doc_id"),
        N.big("n_grams").alias("n_grams"),
        N.big(F.coalesce("n_hits", F.lit(0))).alias("n_bench_hits"),
        N.big(
            F.when(F.coalesce("n_hits", F.lit(0)) > 0, 1).otherwise(0)
        ).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# leakage_safe_split (round 8)
# ---------------------------------------------------------------------------

_LSS_SEED_BASE = 8_000_000
_LSS_SEED_STRIDE = 37
_LSS_U32 = "('0x' || substring(md5({X}), 1, 8))::BIGINT"


@query(
    "leakage_safe_split",
    oracle=f"""
WITH corpus AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_LSS_SEED_BASE} AS doc_id, text
  FROM documents WHERE doc_id % {_LSS_SEED_STRIDE} = 0
), keyed AS MATERIALIZED (
  SELECT doc_id, md5(lower(text)) AS ckey FROM corpus
), schemes AS MATERIALIZED (
  SELECT doc_id, ckey, 'doc_hash' AS scheme,
         {_LSS_U32.format(X="CAST(doc_id AS VARCHAR)")} % 10 AS bucket
  FROM keyed
  UNION ALL
  SELECT doc_id, ckey, 'cluster_hash' AS scheme,
         {_LSS_U32.format(X="ckey")} % 10 AS bucket
  FROM keyed
), assigned AS (
  SELECT scheme, ckey,
         CASE WHEN bucket <= 7 THEN 'train'
              WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
  FROM schemes
), cluster_audit AS (
  SELECT scheme, ckey, count(DISTINCT split) AS n_splits
  FROM assigned GROUP BY 1, 2
)
SELECT a.scheme,
       CAST(count(*) FILTER (a.split = 'train') AS BIGINT) AS n_train,
       CAST(count(*) FILTER (a.split = 'val') AS BIGINT) AS n_val,
       CAST(count(*) FILTER (a.split = 'test') AS BIGINT) AS n_test,
       CAST(count(DISTINCT a.ckey) AS BIGINT) AS n_clusters,
       CAST(count(DISTINCT CASE WHEN c.n_splits > 1 THEN a.ckey END)
            AS BIGINT) AS n_leaky_clusters
FROM assigned a JOIN cluster_audit c USING (scheme, ckey)
GROUP BY a.scheme""",
    doc="Leakage-safe train/val/test splitting, audited: the eval-split "
    "hygiene rule every dedup paper ends on — if near-identical docs "
    "land in different splits, val/test scores are memorization, not "
    "generalization. Two schemes assigned side by side on the same "
    "corpus (seeded in-query with verbatim copies under fresh ids, the "
    "embedding_near_dups discipline): naive doc_id-hash (the default "
    "everyone writes first) vs cluster-hash (bucket by the duplicate-"
    "cluster key — here the exact-dup md5 of normalized text; the "
    "minhash cluster id slots in identically via dedup_apply). Output "
    "per scheme: split sizes, cluster count, and the number of LEAKY "
    "clusters (members straddling >1 split) — 0 by construction for "
    "cluster-hash, provably nonzero for doc-hash on the seeded corpus. "
    "All aggregates are (scheme, ckey)-grained digests; 80/10/10 comes "
    "from bucket = md5-u32 %% 10, deterministic and engine-identical.",
    survey_ids=("M7-P7",),
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = d.filter(F.col("doc_id") % _LSS_SEED_STRIDE == 0).select(
        (F.col("doc_id") + F.lit(_LSS_SEED_BASE)).alias("doc_id"), "text"
    )
    keyed = d.unionByName(seeds).select(
        "doc_id", F.md5(F.lower("text")).alias("ckey")
    )

    def u32(col):
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")

    schemes = keyed.select(
        "doc_id", "ckey", F.lit("doc_hash").alias("scheme"),
        (u32(F.col("doc_id").cast("string")) % 10).alias("bucket"),
    ).unionByName(
        keyed.select(
            "doc_id", "ckey", F.lit("cluster_hash").alias("scheme"),
            (u32(F.col("ckey")) % 10).alias("bucket"),
        )
    )
    assigned = schemes.select(
        "scheme",
        "ckey",
        F.when(F.col("bucket") <= 7, "train")
        .when(F.col("bucket") == 8, "val")
        .otherwise("test")
        .alias("split"),
    )
    cluster_audit = assigned.groupBy("scheme", "ckey").agg(
        F.count_distinct("split").alias("n_splits")
    )
    return (
        assigned.join(cluster_audit, ["scheme", "ckey"])
        .groupBy("scheme")
        .agg(
            F.count(F.when(F.col("split") == "train", 1)).cast("bigint").alias("n_train"),
            F.count(F.when(F.col("split") == "val", 1)).cast("bigint").alias("n_val"),
            F.count(F.when(F.col("split") == "test", 1)).cast("bigint").alias("n_test"),
            F.count_distinct("ckey").cast("bigint").alias("n_clusters"),
            F.count_distinct(
                F.when(F.col("n_splits") > 1, F.col("ckey"))
            ).cast("bigint").alias("n_leaky_clusters"),
        )
    )


# ---------------------------------------------------------------------------
# clustering_ari_eval (round 8, third wave) — external clustering quality:
# (Adjusted) Rand Index of the kmeans_lloyd assignment against the true
# embedding labels (Hubert & Arabie 1985)
# ---------------------------------------------------------------------------

# pair-counting ARI algebra as a shared engine-neutral double string over
# the exact integer pair sums (sij, sa, sb) and C(n,2) = cn2
_ARI_EXP = "((sa * 1.0e0) * sb / cn2)"
_ARI_STR = (
    f"((sij - {_ARI_EXP}) / (((sa + sb) / 2.0e0) - {_ARI_EXP}))"
)
_RI_STR = "(1.0e0 + (2.0e0 * sij - sa - sb) / cn2)"


@query(
    "clustering_ari_eval",
    oracle=f"""
WITH km AS MATERIALIZED (SELECT * FROM ({_KM_ORACLE})),
ct AS (
  SELECT km.cluster, e.label, CAST(count(*) AS BIGINT) AS nij
  FROM km JOIN embeddings e USING (vec_id) GROUP BY 1, 2
), pa AS (
  SELECT CAST(sum((ai * (ai - 1)) // 2) AS BIGINT) AS sa FROM (
    SELECT sum(nij) AS ai FROM ct GROUP BY cluster)
), pb AS (
  SELECT CAST(sum((bj * (bj - 1)) // 2) AS BIGINT) AS sb FROM (
    SELECT sum(nij) AS bj FROM ct GROUP BY label)
), ps AS (
  SELECT CAST(sum((nij * (nij - 1)) // 2) AS BIGINT) AS sij,
         CAST(sum(nij) AS BIGINT) AS n
  FROM ct
), s AS (
  SELECT ps.n, ps.sij, pa.sa, pb.sb,
         CAST((ps.n * (ps.n - 1)) // 2 AS BIGINT) AS cn2
  FROM ps, pa, pb
)
SELECT n, sij AS pairs_same_both, sa AS pairs_same_cluster,
       sb AS pairs_same_label,
       {N.sql_rnd(_RI_STR, 6)} AS rand_index,
       {N.sql_rnd(_ARI_STR, 6)} AS adjusted_rand_index
FROM s""",
    doc="External clustering evaluation: Rand Index and Adjusted Rand "
    "Index (Hubert & Arabie 1985) of the kmeans_lloyd assignment "
    "against the true embedding labels — the chance-corrected "
    "agreement score that completes the trainer tier with its "
    "evaluation face (a clustering catalog without ARI is a trainer "
    "without a scoreboard). Reuses the attested kmeans_lloyd plan verb"
    "atim on both engines; all pair counts C(nij,2)/C(ai,2)/C(bj,2) "
    "are exact integers from the k x labels contingency table "
    "(integer division by 2 is exact: n(n-1) is even), and the two "
    "indices render from one shared double expression. Plan: the "
    "kmeans assignment plus ONE contingency aggregate (k x 10 rows) "
    "and three scalar reduces — evaluation adds no corpus-scale work.",
    survey_ids=("M7-ML24",),
)
def clustering_ari_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    km = kmeans_lloyd(spark, sf_dir)
    ct = (
        km.join(e.select("vec_id", "label"), "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
        .localCheckpoint()
    )
    pa = (
        ct.groupBy("cluster")
        .agg(F.sum("nij").alias("ai"))
        .agg(
            F.sum(F.expr("(ai * (ai - 1)) div 2")).cast("bigint").alias("sa")
        )
    )
    pb = (
        ct.groupBy("label")
        .agg(F.sum("nij").alias("bj"))
        .agg(
            F.sum(F.expr("(bj * (bj - 1)) div 2")).cast("bigint").alias("sb")
        )
    )
    ps = ct.agg(
        F.sum(F.expr("(nij * (nij - 1)) div 2")).cast("bigint").alias("sij"),
        F.sum("nij").cast("bigint").alias("n"),
    )
    s = (
        ps.crossJoin(F.broadcast(pa))
        .crossJoin(F.broadcast(pb))
        .withColumn("cn2", F.expr("CAST((n * (n - 1)) div 2 AS BIGINT)"))
    )
    return s.select(
        "n",
        F.col("sij").alias("pairs_same_both"),
        F.col("sa").alias("pairs_same_cluster"),
        F.col("sb").alias("pairs_same_label"),
        F.expr(N.sql_rnd(_RI_STR, 6)).alias("rand_index"),
        F.expr(N.sql_rnd(_ARI_STR, 6)).alias("adjusted_rand_index"),
    )


# ---------------------------------------------------------------------------
# doremi_domain_weights (round 8, fourth wave) — one DoReMi
# exponentiated-gradient step of domain (source) mixture reweighting
# from per-domain excess loss (Xie et al. 2023)
# ---------------------------------------------------------------------------

_DRM_UNI_VOCAB = 4096
_DRM_BI_VOCAB = 8192
_DRM_ETA = "1.0e0"
# per-doc excess loss: nll(proxy = unigram LM) - nll(reference = bigram
# LM) = mean bigram logprob - mean unigram logprob, floored at 0
_DRM_EXCESS = (
    "greatest(0.0e0, (s9b / (nb * 1.0e0) - s9u / (nu * 1.0e0)) / 1.0e9)"
)
_DRM_EXP = f"exp({_DRM_ETA} * (se9 / (n * 1.0e0)) / 1.0e9)"


@query(
    "doremi_domain_weights",
    oracle=f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS i
  FROM (SELECT doc_id, {WORDS_SQL} AS ws FROM documents)
  WHERE len(ws) >= 1
), counts AS MATERIALIZED (
  SELECT w, count(*) AS c FROM toks GROUP BY w
), total AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM counts),
uvocab AS (
  SELECT w, c FROM counts ORDER BY c DESC, w LIMIT {_DRM_UNI_VOCAB}
), pairs AS MATERIALIZED (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
), bvocab AS (
  SELECT concat(w1, ' ', w2) AS bg, count(*) AS c
  FROM pairs GROUP BY 1 ORDER BY c DESC, bg LIMIT {_DRM_BI_VOCAB}
), uni AS (
  SELECT toks.doc_id,
         CAST(sum({N.sql_cents(
             'ln(coalesce(CAST(v.c AS DOUBLE), 5.0e-1) / total.t)',
             10**9)}) AS BIGINT) AS s9u,
         CAST(count(*) AS BIGINT) AS nu
  FROM toks LEFT JOIN uvocab v ON toks.w = v.w CROSS JOIN total
  GROUP BY toks.doc_id
), bi AS (
  SELECT p.doc_id,
         CAST(sum({N.sql_cents(
             "ln(CASE WHEN bv.c IS NOT NULL THEN CAST(bv.c AS DOUBLE)"
             " / coalesce(CAST(u1.c AS DOUBLE), 5.0e-1)"
             " ELSE 4.0e-1 * coalesce(CAST(u2.c AS DOUBLE), 5.0e-1)"
             " / total.t END)", 10**9)}) AS BIGINT) AS s9b,
         CAST(count(*) AS BIGINT) AS nb
  FROM pairs p
  LEFT JOIN bvocab bv ON concat(p.w1, ' ', p.w2) = bv.bg
  LEFT JOIN uvocab u1 ON p.w1 = u1.w
  LEFT JOIN uvocab u2 ON p.w2 = u2.w
  CROSS JOIN total
  GROUP BY p.doc_id
), excess AS (
  SELECT d.source, {N.sql_cents(_DRM_EXCESS, 10**9)} AS e9
  FROM uni JOIN bi USING (doc_id) JOIN documents d USING (doc_id)
), dom AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(e9) AS BIGINT) AS se9
  FROM excess GROUP BY source
), expd AS (
  SELECT source, n, se9, {N.sql_cents(_DRM_EXP, 10**9)} AS t9 FROM dom
), z AS (SELECT CAST(sum(t9) AS BIGINT) AS zt FROM expd)
SELECT source, n AS n_docs,
       {N.sql_rnd('(se9 / (n * 1.0e0)) / 1.0e9', 6)} AS mean_excess_loss,
       {N.sql_rnd('(t9 * 1.0e0) / zt', 6)} AS domain_weight
FROM expd CROSS JOIN z""",
    doc="One DoReMi step of pretraining-mixture domain reweighting (Xie "
    "et al. 2023): per-source excess loss = mean(nll_proxy - nll_ref), "
    "floored at 0, with the catalog's unigram LM standing in as the "
    "weak proxy and the bigram stupid-backoff LM as the stronger "
    "reference (the published method's proxy/reference pair, "
    "instantiated on the two in-catalog LMs); new domain weights are "
    "the exponentiated-gradient update w_i = exp(eta * excess_i) / Z "
    "from the uniform prior (eta = 1). Per-token/pair logprobs snap to "
    "the 1e-9 grid and integer-sum per doc; the per-domain exp terms "
    "snap before the normalizing sum so Z is an exact integer "
    "(snap-then-sum at every reduction). Plan: one token explode "
    "feeding both capped vocab TakeOrdereds, the pair self-join on "
    "(doc_id, position), two per-doc aggregates, one |sources|-row "
    "reduce — model tables broadcast, payload text never shuffles.",
    survey_ids=("M7-P8",),
)
def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    d = load_table(spark, sf_dir, "documents")
    ws = fan_out(
        d.select("doc_id", words_col(F.col("text")).alias("_ws")).filter(
            F.size("_ws") >= 1
        )
    )
    toks = ws.select(
        "doc_id", F.posexplode("_ws").alias("i0", "w")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "w").localCheckpoint()
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").cast("double").alias("t"))
    uvocab = counts.orderBy(F.desc("c"), "w").limit(_DRM_UNI_VOCAB)
    a = toks.select("doc_id", "i", F.col("w").alias("w1"))
    b = toks.select(
        "doc_id", (F.col("i") - 1).alias("i"), F.col("w").alias("w2")
    )
    pairs = a.join(b, ["doc_id", "i"]).select("doc_id", "w1", "w2")
    pairs = pairs.localCheckpoint()
    bvocab = (
        pairs.groupBy(
            F.concat_ws(" ", "w1", "w2").alias("bg")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "bg")
        .limit(_DRM_BI_VOCAB)
    )
    uni = (
        toks.join(F.broadcast(uvocab.withColumnRenamed("c", "vc")), "w", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum(
                N.cents(
                    F.log(
                        F.coalesce(F.col("vc").cast("double"), F.lit(0.5))
                        / F.col("t")
                    ),
                    10**9,
                )
            )
            .cast("bigint")
            .alias("s9u"),
            F.count(F.lit(1)).cast("bigint").alias("nu"),
        )
    )
    u1 = uvocab.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uvocab.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    bv = bvocab.select("bg", F.col("c").alias("cb"))
    lp_bi = F.log(
        F.when(
            F.col("cb").isNotNull(),
            F.col("cb").cast("double")
            / F.coalesce(F.col("c1").cast("double"), F.lit(0.5)),
        ).otherwise(
            F.lit(0.4)
            * F.coalesce(F.col("c2").cast("double"), F.lit(0.5))
            / F.col("t")
        )
    )
    bi = (
        pairs.withColumn("bg", F.concat_ws(" ", "w1", "w2"))
        .join(F.broadcast(bv), "bg", "left")
        .join(F.broadcast(u1), "w1", "left")
        .join(F.broadcast(u2), "w2", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum(N.cents(lp_bi, 10**9)).cast("bigint").alias("s9b"),
            F.count(F.lit(1)).cast("bigint").alias("nb"),
        )
    )
    excess = (
        uni.join(bi, "doc_id")
        .join(d.select("doc_id", "source"), "doc_id")
        .select(
            "source", F.expr(N.sql_cents(_DRM_EXCESS, 10**9)).alias("e9")
        )
    )
    dom = excess.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("e9").cast("bigint").alias("se9"),
    )
    expd = dom.select(
        "source",
        "n",
        "se9",
        F.expr(N.sql_cents(_DRM_EXP, 10**9)).alias("t9"),
    )
    z = expd.agg(F.sum("t9").cast("bigint").alias("zt"))
    return expd.crossJoin(F.broadcast(z)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.expr(N.sql_rnd("(se9 / (n * 1.0e0)) / 1.0e9", 6)).alias(
            "mean_excess_loss"
        ),
        F.expr(N.sql_rnd("(t9 * 1.0e0) / zt", 6)).alias("domain_weight"),
    )


# ---------------------------------------------------------------------------
# mcnemar_filter_agreement (round 8, sixth wave) — paired-decision audit
# of two quality filters on the SAME documents: agreement census,
# Cohen's kappa, McNemar's test (the filter-governance meta-audit: do
# two gates disagree more than chance, and asymmetrically?)
# ---------------------------------------------------------------------------

_MCN_MIN_WORDS = 30   # gate A: document length
_MCN_TTR_PCT = 55     # gate B: type-token ratio >= 0.55, as the exact
#                       integer cross-multiplication 100*distinct >= 55*total

# Cohen's kappa from the exact 2x2 integers: (N*agree - X) / (N*N - X)
# with X = (n11+n10)(n11+n01) + (n01+n00)(n10+n00) — one double render.
# Degenerate-marginals guard (round-8 ADVICE #3): when every document
# lands in one cell (nn*nn == X) the kappa denominator is exactly zero
# and the raw x/0 double renders engine-dependently — emit 0.0e0
# explicitly, matching _MCN_CHI2's discipline.
_MCN_KAPPA = (
    "CASE WHEN ((nn * nn) - ((n11 + n10) * (n11 + n01)"
    " + (n01 + n00) * (n10 + n00))) = 0 THEN 0.0e0"
    " ELSE ((1.0e0 * nn * (n11 + n00)) - ((n11 + n10) * (n11 + n01)"
    " + (n01 + n00) * (n10 + n00)))"
    " / ((1.0e0 * nn * nn) - ((n11 + n10) * (n11 + n01)"
    " + (n01 + n00) * (n10 + n00))) END"
)
_MCN_CHI2 = (
    "CASE WHEN (n10 + n01) = 0 THEN 0.0e0"
    " ELSE ((n10 - n01) * (n10 - n01)) / (1.0e0 * (n10 + n01)) END"
)


@query(
    "mcnemar_filter_agreement",
    oracle=f"""
WITH flags AS (
  SELECT CASE WHEN len({WORDS_SQL}) >= {_MCN_MIN_WORDS}
              THEN 1 ELSE 0 END AS a,
         CASE WHEN 100 * len(list_distinct({WORDS_SQL}))
                   >= {_MCN_TTR_PCT} * len({WORDS_SQL})
              THEN 1 ELSE 0 END AS b
  FROM documents
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS nn,
         CAST(sum(a * b) AS BIGINT) AS n11,
         CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         CAST(sum((1 - a) * b) AS BIGINT) AS n01,
         CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM flags
)
SELECT nn AS n_docs, n11 AS both_keep, n10 AS a_only, n01 AS b_only,
       n00 AS both_drop,
       {N.sql_rnd("(n11 + n00) / (1.0e0 * nn)", 6)} AS agreement,
       {N.sql_rnd(_MCN_KAPPA, 6)} AS kappa,
       {N.sql_rnd(_MCN_CHI2, 6)} AS mcnemar_chi2
FROM m""",
    doc="Paired-decision audit of two document quality gates evaluated "
    f"on the same corpus — A: word count ≥ {_MCN_MIN_WORDS}; B: "
    f"type-token ratio ≥ 0.{_MCN_TTR_PCT} as the exact integer "
    "cross-multiplication 100·distinct ≥ 55·total (no float "
    "thresholds anywhere). Reports the 2×2 agreement census, Cohen's "
    "kappa (chance-corrected agreement, computed as one double render "
    "of exact integer cross-products), and McNemar's chi² "
    "(n10−n01)²/(n10+n01) on the discordant cells — the test that "
    "detects ASYMMETRIC disagreement between filters, which raw "
    "agreement hides. This is the governance meta-audit you run "
    "before swapping one curation gate for another. Plan: one "
    "scan-side flag computation, one scalar reduce — no joins, no "
    "shuffle of payloads; identical cost at 100 TB per pass.",
    survey_ids=("M7-P9",),
)
def mcnemar_filter_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = DD.fan_out(
        load_table(spark, sf_dir, "documents").select(
            DD.words_col(F.col("text")).alias("_ws")
        )
    )
    flags = d.select(
        (F.size("_ws") >= _MCN_MIN_WORDS).cast("int").alias("a"),
        (
            F.lit(100) * F.size(F.array_distinct("_ws"))
            >= F.lit(_MCN_TTR_PCT) * F.size("_ws")
        )
        .cast("int")
        .alias("b"),
    )
    m = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("bigint")
        .alias("n00"),
    )
    return m.select(
        F.col("nn").alias("n_docs"),
        F.col("n11").alias("both_keep"),
        F.col("n10").alias("a_only"),
        F.col("n01").alias("b_only"),
        F.col("n00").alias("both_drop"),
        F.expr(N.sql_rnd("(n11 + n00) / (1.0e0 * nn)", 6)).alias(
            "agreement"
        ),
        F.expr(N.sql_rnd(_MCN_KAPPA, 6)).alias("kappa"),
        F.expr(N.sql_rnd(_MCN_CHI2, 6)).alias("mcnemar_chi2"),
    )


# ---------------------------------------------------------------------------
# cluster_quality_indices (round 8, eighth wave) — INTERNAL clustering
# evaluation of the kmeans_lloyd partition: simplified silhouette
# (centroid-based, Rousseeuw 1987 / the linear-time variant) and the
# Davies-Bouldin components — the no-labels scoreboard next to
# clustering_ari_eval's label-based one
# ---------------------------------------------------------------------------

# silhouette from the snapped integer centroid distances a9 (own) and
# b9 (nearest other): (b-a)/max(a,b), zero-guarded.
_CQI_SIL = (
    "(CASE WHEN greatest(a9, b9) = 0 THEN 0.0e0"
    " ELSE (b9 - a9) / (1.0e0 * greatest(a9, b9)) END)"
)
# Davies-Bouldin pair term over integer sums: (S_k + S_j) / M_kj with
# S = mean member->centroid distance (1e-9 units cancel against m9).
_CQI_DB = (
    "((sa9 / (1.0e0 * na)) + (sb9 / (1.0e0 * nb))) / (1.0e0 * m9)"
)


@query(
    "cluster_quality_indices",
    oracle=f"""
WITH km AS MATERIALIZED (SELECT * FROM ({_KM_ORACLE})),
vd2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST({_KM_SNAP_INT} AS DOUBLE) / 1e6) AS v,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> {_KM_SNAP_INT}) AS vi
  FROM embeddings
), cent AS MATERIALIZED (
  SELECT cluster AS cid,
         list((CAST(s AS DOUBLE) / n) / 1e6 ORDER BY i) AS c
  FROM (
    SELECT km.cluster, t.i,
           CAST(sum(v2.vi[t.i]) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n
    FROM km JOIN vd2 v2 USING (vec_id)
    CROSS JOIN generate_series(1, {_KM_DIM}) t(i)
    GROUP BY 1, 2)
  GROUP BY cluster
), xd AS MATERIALIZED (
  SELECT v.vec_id, km.cluster AS own, cent.cid,
         {N.sql_cents(
             "sqrt(" + _SQDIST_SQL.format(a="v.v", b="cent.c") + ")",
             10**9)} AS e9
  FROM vd2 v JOIN km USING (vec_id) CROSS JOIN cent
), sil AS (
  SELECT vec_id, own,
         min(CASE WHEN cid = own THEN e9 END) AS a9,
         min(CASE WHEN cid <> own THEN e9 END) AS b9
  FROM xd GROUP BY 1, 2
), percl AS (
  SELECT own AS cluster,
         CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(sum({N.sql_cents(_CQI_SIL, 10**9)}) AS BIGINT) AS ssil9,
         CAST(sum(a9) AS BIGINT) AS sa9
  FROM sil GROUP BY own
), mkj AS (
  SELECT a.cid AS ka, b.cid AS kb,
         {N.sql_cents(
             "sqrt(" + _SQDIST_SQL.format(a="a.c", b="b.c") + ")",
             10**9)} AS m9
  FROM cent a JOIN cent b ON a.cid <> b.cid
), db AS (
  SELECT ka AS cluster,
         max({_CQI_DB.replace("sa9 / (1.0e0 * na)",
                              "pa.sa9 / (1.0e0 * pa.n_vecs)")
                     .replace("sb9 / (1.0e0 * nb)",
                              "pb.sa9 / (1.0e0 * pb.n_vecs)")}) AS dbc
  FROM mkj
  JOIN percl pa ON pa.cluster = mkj.ka
  JOIN percl pb ON pb.cluster = mkj.kb
  GROUP BY ka
)
SELECT CAST(percl.cluster AS BIGINT) AS cluster, percl.n_vecs,
       {N.sql_rnd("sa9 / 1e9 / n_vecs", 6)} AS s_intra,
       {N.sql_rnd("ssil9 / 1e9 / n_vecs", 6)} AS mean_silhouette,
       {N.sql_rnd("dbc", 6)} AS db_component
FROM percl JOIN db ON db.cluster = percl.cluster""",
    doc="Internal clustering quality of the kmeans_lloyd partition, no "
    "labels needed (the scoreboard pair to clustering_ari_eval's "
    "external ARI): per cluster, the simplified (centroid-based, "
    "linear-time) silhouette mean — a = distance to own centroid, b = "
    "distance to nearest other centroid, s = (b−a)/max(a,b) — the "
    "mean member→centroid distance S_k, and the Davies-Bouldin "
    "component max_j (S_k+S_j)/M_kj (its mean over clusters is the DB "
    "index). Centroids are REBUILT from the final assignment on the "
    "exact 1e-6 integer grid (BIGINT dim sums, one division), "
    "distances snap to 1e-9 before any argmin/mean, silhouettes snap "
    "before summing — both engines replay identical integers. Plan: "
    "the kmeans passes + one k-row-broadcast distance scan (corpus "
    "never shuffles) + k²-bounded centroid algebra; the full O(n²) "
    "silhouette is deliberately NOT computed — the simplified variant "
    "is the one that exists at 100 TB.",
    survey_ids=("M7-ML28",),
)
def cluster_quality_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # Persist the final assignment: it feeds BOTH the centroid rebuild
    # and the distance scan — without this the 5-round unrolled k-means
    # lineage executes twice (round-8 verdict flagged this entry as the
    # slowest parity round-trip; the assignment is 2 narrow columns).
    km = kmeans_lloyd(spark, sf_dir).select("vec_id", "cluster").persist()
    snap_i = lambda x: N.cents(x, scale=1_000_000)  # noqa: E731
    vd = e.select(
        "vec_id",
        F.transform(
            SIM.as_double(F.col("embedding")),
            lambda x: snap_i(x).cast("double") / F.lit(1e6),
        ).alias("v"),
        F.transform(SIM.as_double(F.col("embedding")), snap_i).alias("vi"),
    )

    def sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cent = (
        km.join(vd, "vec_id")
        .select("cluster", F.posexplode("vi").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(
            F.sum("val").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .groupBy(F.col("cluster").alias("cid"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
                lambda x: (x.s.cast("double") / x.n.cast("double"))
                / F.lit(1e6),
            ).alias("c")
        )
        # k rows; referenced by xd + both M_kj sides — persist or the
        # corpus-wide centroid rebuild runs three times
        .persist()
    )
    xd = (
        vd.join(km, "vec_id")
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            F.col("cluster").alias("own"),
            "cid",
            N.cents(
                F.sqrt(sqdist(F.col("v"), F.col("c"))), 10**9
            ).alias("e9"),
        )
    )
    sil = xd.groupBy("vec_id", "own").agg(
        F.min(F.when(F.col("cid") == F.col("own"), F.col("e9"))).alias(
            "a9"
        ),
        F.min(F.when(F.col("cid") != F.col("own"), F.col("e9"))).alias(
            "b9"
        ),
    )
    percl = sil.groupBy(F.col("own").alias("cluster")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(F.expr(N.sql_cents(_CQI_SIL, 10**9)))
        .cast("bigint")
        .alias("ssil9"),
        F.sum("a9").cast("bigint").alias("sa9"),
        # k rows; feeds both DB-pair sides + the final readout — persist
        # or the n×k distance scan above executes three times
    ).persist()
    ca = cent.select(F.col("cid").alias("ka"), F.col("c").alias("_ca"))
    cb = cent.select(F.col("cid").alias("kb"), F.col("c").alias("_cb"))
    mkj = (
        ca.crossJoin(F.broadcast(cb))
        .filter(F.col("ka") != F.col("kb"))
        .select(
            "ka",
            "kb",
            N.cents(
                F.sqrt(sqdist(F.col("_ca"), F.col("_cb"))), 10**9
            ).alias("m9"),
        )
    )
    pa = percl.select(
        F.col("cluster").alias("ka"),
        F.col("sa9").alias("_sa9"),
        F.col("n_vecs").alias("_na"),
    )
    pb = percl.select(
        F.col("cluster").alias("kb"),
        F.col("sa9").alias("_sb9"),
        F.col("n_vecs").alias("_nb"),
    )
    db = (
        mkj.join(F.broadcast(pa), "ka")
        .join(F.broadcast(pb), "kb")
        .groupBy(F.col("ka").alias("cluster"))
        .agg(
            F.max(
                F.expr(
                    "((_sa9 / (1.0e0 * _na)) + (_sb9 / (1.0e0 * _nb)))"
                    " / (1.0e0 * m9)"
                )
            ).alias("dbc")
        )
    )
    return percl.join(F.broadcast(db), "cluster").select(
        F.col("cluster").cast("bigint").alias("cluster"),
        "n_vecs",
        F.expr(N.sql_rnd("sa9 / 1e9 / n_vecs", 6)).alias("s_intra"),
        F.expr(N.sql_rnd("ssil9 / 1e9 / n_vecs", 6)).alias(
            "mean_silhouette"
        ),
        F.expr(N.sql_rnd("dbc", 6)).alias("db_component"),
    )


# ---------------------------------------------------------------------------
# cochran_q_gates (round 8, eighth wave) — Cochran's Q test across THREE
# quality gates on the same documents (the k-gate generalization of
# mcnemar_filter_agreement's 2-gate McNemar: do the gates differ at all?)
# ---------------------------------------------------------------------------

_CQ_CRIT_95 = 5.991464547107979  # chi2.ppf(0.95, df=2), shared literal
_CQ_STOPWORDS = ("the", "a", "of")
_CQ_STOP_SQL = "('the', 'a', 'of')"

# Q = (k-1) * (k * sum(C_j^2) - T^2) / (k*T - sum(R_i^2)) with k = 3,
# column totals C_j, per-doc row totals R_i, T = sum R_i — EXACT
# integers, one double render.
# Degenerate guard (round-8 ADVICE #3): when every doc's three gate
# flags agree (all R_i in {0,3}), 3T - sum(R_i^2) is exactly zero and
# the raw division is 0/0 or x/0 — emit 0.0e0 explicitly so both
# engines render identically on degenerate corpora.
_CQ_Q = (
    "(CASE WHEN (3 * t - r2) = 0 THEN 0.0e0"
    " ELSE (3 - 1)"
    " * (3.0e0 * (ca * ca + cb * cb + cc * cc) - 1.0e0 * t * t)"
    " / (3.0e0 * t - r2) END)"
)


@query(
    "cochran_q_gates",
    oracle=f"""
WITH flags AS (
  SELECT CASE WHEN len({WORDS_SQL}) >= 30 THEN 1 ELSE 0 END AS a,
         CASE WHEN 100 * len(list_distinct({WORDS_SQL}))
                   >= 55 * len({WORDS_SQL}) THEN 1 ELSE 0 END AS b,
         CASE WHEN len(list_intersect({WORDS_SQL},
                   {_CQ_STOP_SQL.replace('(', '[').replace(')', ']')}))
                   > 0 THEN 1 ELSE 0 END AS c
  FROM documents
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(a) AS BIGINT) AS ca,
         CAST(sum(b) AS BIGINT) AS cb,
         CAST(sum(c) AS BIGINT) AS cc,
         CAST(sum(a + b + c) AS BIGINT) AS t,
         CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS r2
  FROM flags
)
SELECT n_docs, ca AS keep_length, cb AS keep_ttr, cc AS keep_stopword,
       {N.sql_rnd(_CQ_Q, 6)} AS q_statistic,
       CAST(CASE WHEN {_CQ_Q} > {_CQ_CRIT_95!r} THEN 1 ELSE 0 END
            AS BIGINT) AS gates_differ_95
FROM m""",
    doc="Cochran's Q test (1950) across three binary quality gates "
    "evaluated on the same documents — length (≥30 words), type-token "
    "ratio (integer cross-multiplication), and required-stopword "
    "presence (list intersection with {'the','a','of'}, the Gopher "
    "C4-style gate). Q = (k−1)(kΣC_j² − T²)/(kT − ΣR_i²) from exact "
    "integer column/row totals, compared to the fixed-df=2 95% "
    "critical literal. McNemar (the 2-gate pairwise audit) tells you "
    "WHERE gates disagree; Cochran's Q is the omnibus that tells you "
    "IF the gate battery is heterogeneous at all — run it first. "
    "Plan: one scan-side flag pass, one scalar reduce, no joins.",
    survey_ids=("M7-P10",),
)
def cochran_q_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = DD.fan_out(
        load_table(spark, sf_dir, "documents").select(
            DD.words_col(F.col("text")).alias("_ws")
        )
    )
    stop_arr = F.array(*[F.lit(w) for w in _CQ_STOPWORDS])
    flags = d.select(
        (F.size("_ws") >= 30).cast("int").alias("a"),
        (
            F.lit(100) * F.size(F.array_distinct("_ws"))
            >= F.lit(55) * F.size("_ws")
        ).cast("int").alias("b"),
        (F.size(F.array_intersect("_ws", stop_arr)) > 0)
        .cast("int")
        .alias("c"),
    )
    m = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("a").cast("bigint").alias("ca"),
        F.sum("b").cast("bigint").alias("cb"),
        F.sum("c").cast("bigint").alias("cc"),
        F.sum(F.col("a") + F.col("b") + F.col("c"))
        .cast("bigint")
        .alias("t"),
        F.sum(
            (F.col("a") + F.col("b") + F.col("c"))
            * (F.col("a") + F.col("b") + F.col("c"))
        )
        .cast("bigint")
        .alias("r2"),
    )
    return m.select(
        "n_docs",
        F.col("ca").alias("keep_length"),
        F.col("cb").alias("keep_ttr"),
        F.col("cc").alias("keep_stopword"),
        F.expr(N.sql_rnd(_CQ_Q, 6)).alias("q_statistic"),
        F.expr(
            f"CAST(CASE WHEN {_CQ_Q} > {_CQ_CRIT_95!r} THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("gates_differ_95"),
    )


# ---------------------------------------------------------------------------
# neyman_allocation (round 9) — optimal stratified-sampling design:
# how many samples each stratum gets under a fixed label/audit budget
# ---------------------------------------------------------------------------

_NEY_BUDGET = 1000

# Per-stratum weight N_h * S_h with S_h = sample stddev of value cents:
# exact integer sufficient statistics, hardware sqrt, IEEE division —
# shared verbatim by both engines. A singleton stratum (nj = 1) has no
# sample variance: without the guard the (nj - 1) denominator renders
# 0/0 as NULL on Spark but NaN on DuckDB, and the NaN would poison the
# cross-join total — decide on the exact integer predicate instead and
# emit 0.0e0 from birth (round-9 degenerate-denominator discipline).
_NEY_W = (
    "(CASE WHEN nj < 2 THEN 0.0e0"
    " ELSE nj * sqrt(greatest(0.0e0,"
    " ((1.0e0 * nj) * qj - (1.0e0 * sj) * sj)"
    " / ((1.0e0 * nj) * (nj - 1)))) END)"
)


@query(
    "neyman_allocation",
    oracle=f"""
WITH c AS (
  SELECT event_type, {N.sql_cents('value')} AS c FROM events
), per AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS nj,
         CAST(sum(c) AS BIGINT) AS sj,
         CAST(sum(c * c) AS BIGINT) AS qj
  FROM c GROUP BY 1
), w AS (
  SELECT event_type, nj, {_NEY_W} AS wh FROM per
), tw AS (
  SELECT sum(wh) AS tot FROM w
), q AS (
  SELECT w.event_type, w.nj, w.wh,
         {_NEY_BUDGET} * w.wh / tw.tot AS quota,
         CAST(floor({_NEY_BUDGET} * w.wh / tw.tot) AS BIGINT) AS base
  FROM w CROSS JOIN tw
), r AS (
  SELECT *,
         row_number() OVER (ORDER BY quota - base DESC, event_type)
           AS frac_rank,
         {_NEY_BUDGET} - sum(base) OVER () AS leftover
  FROM q
)
SELECT event_type, nj AS n_stratum,
       {N.sql_rnd("wh / nj / 1.0e2", 4)} AS stddev,
       {N.sql_rnd("quota", 4)} AS quota,
       CAST(base + CASE WHEN frac_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS n_alloc
FROM r""",
    doc="Neyman-optimal stratified sampling allocation (Neyman 1934): "
    "under a fixed audit/labeling budget of 1000 samples, each "
    "event-type stratum gets n_h ∝ N_h·S_h — large AND variable "
    "strata get sampled more, the design that minimizes the variance "
    "of the stratified mean (the 100 TB question: which partitions "
    "deserve the human-review budget). Integer quotas come from "
    "LARGEST-REMAINDER apportionment (floor every quota, hand the "
    "leftover to the largest fractional parts, ties broken by type "
    "name) so allocations sum EXACTLY to the budget — deterministic "
    "on both engines because quotas are IEEE doubles of exact BIGINT "
    "sufficient statistics (hardware sqrt only) and the remainder "
    "rank is a total order. Plan: one cents aggregate per type, then "
    "|types|-row scalar algebra + one |types|-row window.",
    survey_ids=("M7-P11",),
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_type", N.cents("value").alias("c"))
    per = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("c").cast("bigint").alias("sj"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("qj"),
    )
    w = per.select("event_type", "nj", F.expr(_NEY_W).alias("wh"))
    tw = w.agg(F.sum("wh").alias("tot"))
    q = w.crossJoin(F.broadcast(tw)).select(
        "event_type",
        "nj",
        "wh",
        (F.lit(_NEY_BUDGET) * F.col("wh") / F.col("tot")).alias("quota"),
        F.floor(F.lit(_NEY_BUDGET) * F.col("wh") / F.col("tot"))
        .cast("bigint")
        .alias("base"),
    )
    wrank = Window.orderBy(
        (F.col("quota") - F.col("base")).desc(), "event_type"
    )
    wall = Window.partitionBy()
    r = q.select(
        "*",
        F.row_number().over(wrank).alias("frac_rank"),
        (F.lit(_NEY_BUDGET) - F.sum("base").over(wall)).alias("leftover"),
    )
    return r.select(
        "event_type",
        F.col("nj").alias("n_stratum"),
        F.expr(N.sql_rnd("wh / nj / 1.0e2", 4)).alias("stddev"),
        F.expr(N.sql_rnd("quota", 4)).alias("quota"),
        (
            F.col("base")
            + F.when(F.col("frac_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_alloc"),
    )


# ---------------------------------------------------------------------------
# fleiss_kappa_gates (round 9) — multi-rater chance-corrected agreement
# across the three binary quality gates: the effect-size companion to
# cochran_q_gates' significance test
# ---------------------------------------------------------------------------

# kappa = (Pbar - Pe) / (1 - Pe) from exact integers: per-doc agreement
# numerator R(R-1) + (3-R)(2-R) over k(k-1) = 6; chance agreement
# Pe = (T^2 + (3n - T)^2) / (9 n^2). Degenerate (every vote in one
# category => Pe = 1) emits 0.0e0 on both engines.
_FK_KAPPA = (
    "(CASE WHEN ((1.0e0 * t) * t + (1.0e0 * (3 * n - t)) * (3 * n - t))"
    " >= (9.0e0 * n) * n THEN 0.0e0"
    " ELSE (pnum / (6.0e0 * n)"
    " - ((1.0e0 * t) * t + (1.0e0 * (3 * n - t)) * (3 * n - t))"
    " / ((9.0e0 * n) * n))"
    " / (1.0e0 - ((1.0e0 * t) * t + (1.0e0 * (3 * n - t)) * (3 * n - t))"
    " / ((9.0e0 * n) * n)) END)"
)


@query(
    "fleiss_kappa_gates",
    oracle=f"""
WITH flags AS (
  SELECT CASE WHEN len({WORDS_SQL}) >= 30 THEN 1 ELSE 0 END
         + CASE WHEN 100 * len(list_distinct({WORDS_SQL}))
                     >= 55 * len({WORDS_SQL}) THEN 1 ELSE 0 END
         + CASE WHEN len(list_intersect({WORDS_SQL},
                     ['the', 'a', 'of'])) > 0 THEN 1 ELSE 0 END AS r
  FROM documents
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r) AS BIGINT) AS t,
         CAST(sum(r * (r - 1) + (3 - r) * (2 - r)) AS BIGINT) AS pnum
  FROM flags
)
SELECT n AS n_docs, t AS total_keep_votes,
       {N.sql_rnd("pnum / (6.0e0 * n)", 6)} AS p_observed,
       {N.sql_rnd(
           "((1.0e0 * t) * t + (1.0e0 * (3 * n - t)) * (3 * n - t))"
           " / ((9.0e0 * n) * n)", 6)} AS p_chance,
       {N.sql_rnd(_FK_KAPPA, 6)} AS fleiss_kappa
FROM m""",
    doc="Fleiss' kappa (Fleiss 1971) across the SAME three binary "
    "quality gates cochran_q_gates tests — length, type-token ratio, "
    "required-stopword — treated as three raters voting keep/drop "
    "per document: the chance-corrected agreement EFFECT SIZE next "
    "to Cochran's Q significance (Q answers 'do the gates differ at "
    "all', kappa answers 'how far from chance is their agreement'). "
    "Every quantity is exact-integer: per-doc agreement pairs "
    "R(R−1)+(3−R)(2−R) summed as BIGINT, chance agreement from the "
    "vote totals, one shared double render with the all-one-category "
    "degenerate case emitting 0.0e0 (the round-8 ADVICE #3 "
    "discipline, applied from birth). Plan: one corpus pass to the "
    "three-flag sum, one scalar row out — gates are integer "
    "cross-multiplications inside the scan stage.",
    survey_ids=("M7-P12",),
)
def fleiss_kappa_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import words_col

    d = load_table(spark, sf_dir, "documents")
    ws = d.select(words_col(F.col("text")).alias("w"))
    r = (
        F.when(F.size("w") >= 30, 1).otherwise(0)
        + F.when(
            100 * F.size(F.array_distinct("w")) >= 55 * F.size("w"), 1
        ).otherwise(0)
        + F.when(
            F.size(
                F.array_intersect(
                    "w", F.array(F.lit("the"), F.lit("a"), F.lit("of"))
                )
            )
            > 0,
            1,
        ).otherwise(0)
    )
    m = ws.select(r.alias("r")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("t"),
        F.sum(
            F.col("r") * (F.col("r") - 1)
            + (3 - F.col("r")) * (2 - F.col("r"))
        )
        .cast("bigint")
        .alias("pnum"),
    )
    return m.select(
        F.col("n").alias("n_docs"),
        F.col("t").alias("total_keep_votes"),
        F.expr(N.sql_rnd("pnum / (6.0e0 * n)", 6)).alias("p_observed"),
        F.expr(
            N.sql_rnd(
                "((1.0e0 * t) * t + (1.0e0 * (3 * n - t)) * (3 * n - t))"
                " / ((9.0e0 * n) * n)",
                6,
            )
        ).alias("p_chance"),
        F.expr(N.sql_rnd(_FK_KAPPA, 6)).alias("fleiss_kappa"),
    )


# ---------------------------------------------------------------------------
# kfold_assignment (round 9) — deterministic stratified k-fold split
# audit: the cross-validation assignment primitive
# ---------------------------------------------------------------------------

_KFOLD_K = 5


@query(
    "kfold_assignment",
    oracle=f"""
WITH r AS (
  SELECT lang,
         (row_number() OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1)
           % {_KFOLD_K} AS fold
  FROM documents
)
SELECT lang, CAST(fold AS BIGINT) AS fold,
       CAST(count(*) AS BIGINT) AS n_docs
FROM r GROUP BY 1, 2""",
    doc="Deterministic STRATIFIED k-fold assignment (k=5): within each "
    "language stratum, documents are ordered by md5(doc_id) — a "
    "pseudo-random but seed-free, engine-identical shuffle — and "
    "dealt round-robin into folds, so per-stratum fold sizes differ "
    "by AT MOST ONE (the property sklearn's StratifiedKFold gives "
    "and a naive hash-mod split does not: hash-mod folds fluctuate "
    "binomially and small strata can land entirely in one fold). "
    "Md5 tie-broken by doc_id so the order is total. The readout is "
    "the (lang, fold) census the balance property is checked on. "
    "Plan: one rank window partitioned BY STRATUM (each partition "
    "bounded by the stratum's rows — parallel across strata at "
    "100 TB) + one small aggregate; for corpus-scale folds the "
    "hash_split entry remains the O(1)-state alternative.",
    survey_ids=("M7-P13",),
)
def kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    r = d.select(
        "lang",
        ((F.row_number().over(w) - 1) % _KFOLD_K).alias("fold"),
    )
    return r.groupBy("lang", F.col("fold").cast("bigint").alias("fold")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# jensen_shannon_sources (round 9) — symmetric bounded divergence per
# source vs the corpus: the dashboard metric next to the KL monitor
# ---------------------------------------------------------------------------

_JSD_LN2 = 0.6931471805599453  # ln(2), fixed literal on both engines

# Per-token JSD term with m = (p+q)/2:
# (p*ln(p/m) + q*ln(q/m)) / 2 — smoothed p,q are strictly positive.
_JSD_TERM = (
    f"(({_PS_SQL} * ln({_PS_SQL} / (({_PS_SQL} + {_PC_SQL}) / 2.0e0))"
    f" + {_PC_SQL} * ln({_PC_SQL} / (({_PS_SQL} + {_PC_SQL}) / 2.0e0)))"
    " / 2.0e0)"
)


@query(
    "jensen_shannon_sources",
    oracle=f"""
WITH toks AS MATERIALIZED (
  SELECT source, unnest({WORDS_SQL}) AS w FROM documents
), cnt AS MATERIALIZED (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
), gcnt AS MATERIALIZED (
  SELECT w, CAST(sum(c) AS BIGINT) AS c FROM cnt GROUP BY w
), vocab AS MATERIALIZED (
  SELECT w, c FROM gcnt ORDER BY c DESC, w LIMIT {_KL_VOCAB}
), vtot AS (
  SELECT CAST(sum(c) AS BIGINT) AS nv, CAST(count(*) AS BIGINT) AS vsz
  FROM vocab
), stot AS (
  SELECT source, CAST(sum(c.c) AS BIGINT) AS ns
  FROM cnt c JOIN vocab v USING (w) GROUP BY source
), grid AS (
  SELECT s.source, v.c AS cg, coalesce(sc.c, 0) AS cs, st.ns, vt.nv, vt.vsz
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN vocab v
  LEFT JOIN cnt sc ON sc.source = s.source AND sc.w = v.w
  JOIN stot st ON st.source = s.source
  CROSS JOIN vtot vt
), terms AS (
  SELECT source, ns,
         {N.sql_cents(_JSD_TERM, 1_000_000_000)} AS t9
  FROM grid
)
SELECT source,
       CAST(ns AS BIGINT) AS n_vocab_tokens,
       round(CAST(sum(t9) AS DOUBLE) / 1e9, 6) AS jsd,
       round(CAST(sum(t9) AS DOUBLE) / 1e9 / {_JSD_LN2!r}, 6)
         AS jsd_normalized
FROM terms GROUP BY source, ns""",
    doc="Jensen-Shannon divergence of each source's unigram "
    "distribution vs the corpus over the shared top-256 support — "
    "the SYMMETRIC, [0, ln 2]-BOUNDED companion to "
    "domain_kl_divergence (KL explodes when a source misses corpus "
    "mass; JSD is what mixture dashboards actually plot, and "
    "jsd_normalized/ln2 is comparable across vocab choices). Same "
    "exact discipline as the KL entry, shared smoothing strings "
    "verbatim: the per-token term (p·ln(p/m)+q·ln(q/m))/2 with "
    "m=(p+q)/2 evaluates on identical doubles and snaps to the 1e-9 "
    "integer grid BEFORE summation — order-free aggregate, ln only "
    "inside the snapped term. Plan: identical to the KL entry — one "
    "token shuffle + broadcast vocab, |sources|×256 bounded grid.",
    survey_ids=("M7-C16",),
)
def jensen_shannon_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(DD.words_col(F.col("text"))).alias("w")
    )
    cnt = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=True)
    gcnt = cnt.groupBy("w").agg(F.sum("c").cast("bigint").alias("c"))
    vocab = (
        gcnt.orderBy(F.col("c").desc(), "w")
        .limit(_KL_VOCAB)
        .localCheckpoint(eager=True)
    )
    vtot = vocab.agg(
        F.sum("c").cast("bigint").alias("nv"),
        F.count(F.lit(1)).cast("bigint").alias("vsz"),
    )
    stot = (
        cnt.join(F.broadcast(vocab.select("w")), "w")
        .groupBy("source")
        .agg(F.sum("c").cast("bigint").alias("ns"))
    )
    srcs = d.select("source").distinct()
    grid = (
        srcs.crossJoin(
            F.broadcast(
                vocab.select(F.col("w"), F.col("c").alias("cg"))
            )
        )
        .join(
            cnt.select("source", "w", F.col("c").alias("cs")),
            ["source", "w"],
            "left",
        )
        .withColumn("cs", F.coalesce("cs", F.lit(0)))
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(vtot))
    )
    terms = grid.select(
        "source",
        "ns",
        F.expr(N.sql_cents(_JSD_TERM, 1_000_000_000)).alias("t9"),
    )
    return terms.groupBy("source", "ns").agg(
        F.sum("t9").alias("_s")
    ).select(
        "source",
        F.col("ns").alias("n_vocab_tokens"),
        N.rnd(F.col("_s").cast("double") / 1e9, 6).alias("jsd"),
        N.rnd(
            F.col("_s").cast("double") / 1e9 / F.lit(_JSD_LN2), 6
        ).alias("jsd_normalized"),
    )
