"""Data-profiling catalog entries: Count-Min-Sketch accuracy audit and
equal-depth histograms.

Completes the mergeable-sketch family (HLL distinct counts and GK
quantiles already carry audits — ``approx_distinct_audit``,
``approx_quantile_audit``): Count-Min is the sketch for per-key
frequency under memory bounds, and like the others it is audited
DIFFERENTIALLY — the oracle rebuilds the identical sketch from the same
md5-derived hash rows AND the exact answer, so the driver attests both
the sketch construction and its one-sided error (CMS never
underestimates).

Scale notes: the CMS collapses facts to d×w counter cells (4×256 here —
a few KB regardless of corpus size) in ONE group pass; probes join the
counter table via broadcast. The equal-depth histogram rides the
count-of-counts idiom (cumulative sums over DISTINCT values, bounded by
value cardinality, never a global sort of facts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table

_D = 4      # hash rows
_W = 256    # counters per row

# Row-r hash of a key: two hex nibbles of md5(r || ':' || key) -> 0..255.
# Same derivation in both engines; md5 of identical strings is identical.
_NIB = (
    "strpos('0123456789abcdef', substring("
    "md5(CAST({r} AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),"
    " {pos}, 1)) - 1"
)
_H_SQL = f"({_NIB.format(r='{r}', pos=1)}) * 16 + ({_NIB.format(r='{r}', pos=2)})"


def _h_spark(r: int) -> F.Column:
    h = F.md5(
        F.concat(
            F.lit(str(r)), F.lit(":"), F.col("user_id").cast("string")
        )
    )
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


@query(
    "countmin_audit",
    oracle=f"""
WITH rows_ AS (
  SELECT r FROM (VALUES (0), (1), (2), (3)) v(r)
), cells AS (
  SELECT v.r, {_H_SQL.format(r='v.r')} AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM events CROSS JOIN rows_ v
  GROUP BY 1, 2
), exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
), probes AS (
  SELECT e.user_id, e.n, v.r,
         {_H_SQL.format(r='v.r')} AS bucket
  FROM exact e CROSS JOIN rows_ v
), est AS (
  SELECT p.user_id, p.n, min(c.c) AS cms
  FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
  GROUP BY 1, 2
)
SELECT CAST(user_id AS BIGINT) AS user_id, n,
       CAST(cms AS BIGINT) AS cms_estimate,
       CAST(cms - n AS BIGINT) AS overestimate,
       CAST((cms >= n) AS BIGINT) AS never_underestimates
FROM est""",
    doc="Count-Min-Sketch frequency audit — the third mergeable-sketch "
    "family next to HLL (approx_distinct_audit) and GK quantiles "
    "(approx_quantile_audit): a 4x256 counter table built in ONE group "
    "pass over md5-derived row hashes (a few KB regardless of corpus "
    "size, and counters merge by plain addition across partitions / "
    "days), then every key's estimate = min over rows of its counter. "
    "The oracle rebuilds the identical sketch AND the exact counts, so "
    "the driver attests construction and the one-sided error contract "
    "(never_underestimates must be 1 for every key).",
    survey_ids=("A3", "M7-A27b"),
)
def countmin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # one pass, d hashes per row via a small explode
    hashed = e.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _h_spark(r).alias("bucket")
                    )
                    for r in range(_D)
                ]
            )
        ).alias("h"),
    ).select("user_id", F.col("h.r").alias("r"), F.col("h.bucket").alias("bucket"))
    cells = hashed.groupBy("r", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    exact = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    probes = exact.select(
        "user_id",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _h_spark(r).alias("bucket")
                    )
                    for r in range(_D)
                ]
            )
        ).alias("h"),
    ).select("user_id", "n", F.col("h.r").alias("r"), F.col("h.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("user_id", "n")
        .agg(F.min("c").alias("cms"))
    )
    return est.select(
        N.big("user_id").alias("user_id"),
        "n",
        F.col("cms").cast("bigint").alias("cms_estimate"),
        (F.col("cms") - F.col("n")).cast("bigint").alias("overestimate"),
        (F.col("cms") >= F.col("n")).cast("bigint").alias(
            "never_underestimates"
        ),
    )


@query(
    "equi_depth_histogram",
    oracle="""
WITH freq AS (
  SELECT value, CAST(count(*) AS BIGINT) AS f FROM events GROUP BY 1
), cum AS (
  SELECT value, f,
         sum(f) OVER (ORDER BY value
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c,
         sum(f) OVER () AS n
  FROM freq
)
SELECT CAST(ceil(10.0 * c / n) AS BIGINT) AS bucket,
       round(min(value), 4) AS lo,
       round(max(value), 4) AS hi,
       CAST(sum(f) AS BIGINT) AS n_rows
FROM cum GROUP BY 1""",
    doc="Equal-depth (decile) histogram of the value column — the "
    "profiling shape optimizers build range statistics from, and the "
    "equal-width sibling of length_bucket_stats: every distinct value "
    "lands in bucket ceil(10*cum/n) from a cumulative sum over "
    "DISTINCT values (the count-of-counts idiom: the global window "
    "ranks value cardinality, never fact rows — same scale argument as "
    "key_skew_profile). Indivisible heavy values make depths unequal; "
    "that imbalance is exactly what the profile is for.",
    survey_ids=("A3", "A10", "M7-A28b"),
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    freq = e.groupBy("value").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    wcum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = freq.select(
        "value",
        "f",
        F.sum("f").over(wcum).alias("c"),
        F.sum("f").over(wall).alias("n"),
    )
    bucket = F.ceil(F.lit(10.0) * F.col("c") / F.col("n")).cast("bigint")
    return cum.groupBy(bucket.alias("bucket")).agg(
        N.rnd(F.min("value")).alias("lo"),
        N.rnd(F.max("value")).alias("hi"),
        F.sum("f").cast("bigint").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# hll_distinct_audit (round 7)
# ---------------------------------------------------------------------------

_HLL_M = 16
_HLL_ALPHA_M2_SCALE = 0.673 * 256.0 * 2.0**33  # alpha_16 * m^2 * 2^33
# rank of a 32-bit word = leading zeros + 1, as an integer comparison
# ladder (identical literals both engines, no float logs)
_RHO_CASES = " ".join(
    f"WHEN w >= {1 << (31 - j)} THEN {j + 1}" for j in range(32)
)


@query(
    "hll_distinct_audit",
    oracle=f"""
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 1))
              AS INT) AS reg,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 2, 8))
              AS BIGINT) AS w
  FROM events
), r AS (
  SELECT event_type, reg, max(CASE {_RHO_CASES} ELSE 33 END) AS m
  FROM h GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, g.reg
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(range(16)) AS reg) g
), filled AS (
  SELECT grid.event_type, coalesce(r.m, 0) AS m
  FROM grid LEFT JOIN r ON grid.event_type = r.event_type
                       AND grid.reg = r.reg
), s AS (
  SELECT event_type,
         sum(CAST(1 AS BIGINT) << (33 - m)) AS t,
         sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v
  FROM filled GROUP BY event_type
), est AS (
  SELECT event_type,
         CASE WHEN CAST({_HLL_ALPHA_M2_SCALE!r} AS DOUBLE)
                   / CAST(t AS DOUBLE) <= 40.0 AND v > 0
              THEN 16.0 * (CAST({N.sql_cents("ln(16.0 / v)", 10**9)}
                                AS DOUBLE) / 1e9)
              ELSE CAST({_HLL_ALPHA_M2_SCALE!r} AS DOUBLE)
                   / CAST(t AS DOUBLE) END AS e
  FROM s
), ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
           AS exact_distinct
  FROM events GROUP BY 1
)
SELECT ex.event_type, ex.exact_distinct,
       round(e, 4) AS hll_estimate,
       round((e - exact_distinct) / exact_distinct, 4) AS rel_err
FROM ex JOIN est USING (event_type)""",
    doc="Explicit HyperLogLog register construction attested "
    "DIFFERENTIALLY (the Count-Min discipline, completing the "
    "mergeable-sketch family with a sketch whose registers the oracle "
    "rebuilds bit-for-bit — approx_distinct_audit only flag-checks "
    "Spark's native sketch): per event_type, 16 registers keyed by the "
    "first md5 nibble of user_id, register value = max leading-zero "
    "rank of the next 32 hash bits via a 32-case integer ladder (no "
    "float logs), harmonic estimate alpha_16*m^2/sum(2^-M_j) with the "
    "dyadic sum carried as the exact integer sum(2^(33-M_j)), and the "
    "linear-counting small-range correction m*ln(m/V) on the 1e-9 "
    "snap grid. Reports estimate vs exact distinct and relative error. "
    "Scale: facts collapse to types x 16 register rows in one group "
    "pass — the estimator state is bytes per key at any corpus size, "
    "and registers MERGE by max (the shuffle-free sketch property).",
    survey_ids=("M7-A66",),
)
def hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    md5c = F.md5(F.col("user_id").cast("string"))
    reg = F.conv(F.substring(md5c, 1, 1), 16, 10).cast("int").alias("reg")
    wc = F.conv(F.substring(md5c, 2, 8), 16, 10).cast("bigint")
    rho = F.when(wc >= F.lit(1 << 31), F.lit(1))
    for j in range(1, 32):
        rho = rho.when(wc >= F.lit(1 << (31 - j)), F.lit(j + 1))
    rho = rho.otherwise(F.lit(33)).alias("rho")
    r = (
        e.select("event_type", reg, rho)
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("m"))
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(16).select(F.col("id").cast("int").alias("reg"))
            )
        )
    )
    filled = grid.join(r, ["event_type", "reg"], "left").select(
        "event_type", F.coalesce("m", F.lit(0)).alias("m")
    )
    s = filled.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 33 - m)")).alias("t"),
        F.sum((F.col("m") == 0).cast("int")).alias("v"),
    )
    raw = F.lit(_HLL_ALPHA_M2_SCALE) / F.col("t").cast("double")
    small = F.lit(16.0) * (
        N.cents(F.log(F.lit(16.0) / F.col("v")), 10**9).cast("double") / F.lit(1e9)
    )
    est = s.select(
        "event_type",
        F.when((raw <= F.lit(40.0)) & (F.col("v") > 0), small)
        .otherwise(raw)
        .alias("e"),
    )
    ex = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return ex.join(est, "event_type").select(
        "event_type",
        "exact_distinct",
        N.rnd("e", 4).alias("hll_estimate"),
        N.rnd(
            (F.col("e") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# hll_intersection (round 8, fifth wave) — inclusion-exclusion set-overlap
# estimation from MERGED HyperLogLog registers (the audience-overlap /
# cross-dataset-user-overlap primitive; Flajolet et al. 2007 merge
# property + |A∩B| = |A| + |B| − |A∪B|)
# ---------------------------------------------------------------------------

# Estimator from the dyadic register sum t = Σ 2^(33-M_j) and the
# zero-register count v — the IDENTICAL kernel hll_distinct_audit uses,
# dialect-neutral over columns (t, v).
_HLL_EST = (
    f"CASE WHEN CAST({_HLL_ALPHA_M2_SCALE!r} AS DOUBLE) / CAST(t AS DOUBLE)"
    " <= 40.0 AND v > 0"
    f" THEN 16.0 * (CAST({N.sql_cents('ln(16.0 / v)', 10**9)} AS DOUBLE) / 1e9)"
    f" ELSE CAST({_HLL_ALPHA_M2_SCALE!r} AS DOUBLE) / CAST(t AS DOUBLE) END"
)


@query(
    "hll_intersection",
    oracle=f"""
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 1))
              AS INT) AS reg,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 2, 8))
              AS BIGINT) AS w
  FROM events
), r AS (
  SELECT event_type, reg, max(CASE {_RHO_CASES} ELSE 33 END) AS m
  FROM h GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, g.reg
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(range(16)) AS reg) g
), filled AS (
  SELECT grid.event_type, grid.reg, coalesce(r.m, 0) AS m
  FROM grid LEFT JOIN r ON grid.event_type = r.event_type
                       AND grid.reg = r.reg
), s1 AS (
  SELECT event_type,
         sum(CAST(1 AS BIGINT) << (33 - m)) AS t,
         sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v
  FROM filled GROUP BY event_type
), e1 AS (
  SELECT event_type, {_HLL_EST} AS e FROM s1
), su AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         sum(CAST(1 AS BIGINT) << (33 - greatest(a.m, b.m))) AS t,
         sum(CASE WHEN greatest(a.m, b.m) = 0 THEN 1 ELSE 0 END) AS v
  FROM filled a JOIN filled b
    ON a.reg = b.reg AND a.event_type < b.event_type
  GROUP BY 1, 2
), eu AS (
  SELECT type_a, type_b, {_HLL_EST} AS e_ab FROM su
), ex AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS exact_overlap
  FROM (SELECT DISTINCT event_type, user_id FROM events) a
  JOIN (SELECT DISTINCT event_type, user_id FROM events) b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ex.type_a, ex.type_b, ex.exact_overlap,
       {N.sql_rnd("ea.e + eb.e - eu.e_ab", 4)} AS hll_intersect,
       {N.sql_rnd("(ea.e + eb.e - eu.e_ab - ex.exact_overlap)"
                  " / ex.exact_overlap", 4)} AS rel_err
FROM ex
JOIN eu ON eu.type_a = ex.type_a AND eu.type_b = ex.type_b
JOIN e1 ea ON ea.event_type = ex.type_a
JOIN e1 eb ON eb.event_type = ex.type_b""",
    doc="Set-overlap estimation between every event-type pair's user "
    "audience from MERGED HyperLogLog registers: per-type 16-register "
    "sketches (identical construction to hll_distinct_audit), the "
    "union sketch by the HLL merge property (register-wise max — the "
    "reason HLL states are mergeable across partitions and days), and "
    "|A∩B| = |A| + |B| − |A∪B| by inclusion-exclusion, attested "
    "against the exact distinct-user overlap. Scale: the fact table "
    "collapses to types × 16 register rows in ONE group pass; all "
    "pairing happens on that byte-sized state, so estimating overlap "
    "between two 100 TB datasets' key sets costs two register scans — "
    "the exact join the oracle runs is precisely what the sketch makes "
    "unnecessary at scale.",
    survey_ids=("M7-A71",),
)
def hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    md5c = F.md5(F.col("user_id").cast("string"))
    reg = F.conv(F.substring(md5c, 1, 1), 16, 10).cast("int").alias("reg")
    wc = F.conv(F.substring(md5c, 2, 8), 16, 10).cast("bigint")
    rho = F.when(wc >= F.lit(1 << 31), F.lit(1))
    for j in range(1, 32):
        rho = rho.when(wc >= F.lit(1 << (31 - j)), F.lit(j + 1))
    rho = rho.otherwise(F.lit(33)).alias("rho")
    r = (
        e.select("event_type", reg, rho)
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("m"))
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(16).select(F.col("id").cast("int").alias("reg"))
            )
        )
    )
    filled = grid.join(r, ["event_type", "reg"], "left").select(
        "event_type", "reg", F.coalesce("m", F.lit(0)).alias("m")
    )
    t_of = lambda m: F.sum(  # noqa: E731
        F.expr(f"shiftleft(CAST(1 AS BIGINT), 33 - {m})")
    ).alias("t")
    v_of = lambda m: F.sum(  # noqa: E731
        F.expr(f"CASE WHEN {m} = 0 THEN 1 ELSE 0 END")
    ).alias("v")
    e1 = (
        filled.groupBy("event_type")
        .agg(t_of("m"), v_of("m"))
        .select("event_type", F.expr(_HLL_EST).alias("e"))
    )
    fa = filled.select(
        F.col("event_type").alias("type_a"), "reg", F.col("m").alias("ma")
    )
    fb = filled.select(
        F.col("event_type").alias("type_b"), "reg", F.col("m").alias("mb")
    )
    eu = (
        fa.join(F.broadcast(fb), "reg")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(t_of("greatest(ma, mb)"), v_of("greatest(ma, mb)"))
        .select("type_a", "type_b", F.expr(_HLL_EST).alias("e_ab"))
    )
    du = e.select("event_type", "user_id").distinct()
    ex = (
        du.select(F.col("event_type").alias("type_a"), "user_id")
        .join(
            F.broadcast(
                du.select(F.col("event_type").alias("type_b"), "user_id")
            ),
            "user_id",
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_overlap"))
    )
    return (
        ex.join(F.broadcast(eu), ["type_a", "type_b"])
        .join(
            F.broadcast(e1.select(F.col("event_type").alias("type_a"),
                                  F.col("e").alias("_ea"))),
            "type_a",
        )
        .join(
            F.broadcast(e1.select(F.col("event_type").alias("type_b"),
                                  F.col("e").alias("_eb"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "exact_overlap",
            F.expr(N.sql_rnd("_ea + _eb - e_ab", 4)).alias("hll_intersect"),
            F.expr(
                N.sql_rnd("(_ea + _eb - e_ab - exact_overlap)"
                          " / exact_overlap", 4)
            ).alias("rel_err"),
        )
    )
