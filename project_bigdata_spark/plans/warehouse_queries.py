"""Warehouse-lifecycle and analytics-depth catalog entries: EWMA decay
features, SCD Type-2 dimension versioning, CDC latest-wins compaction,
MAD robust outlier profiling, quantile-sketch accuracy audit,
differential attestation of the salted skew-guard aggregation, per-entity
OLS trend fitting, dataset shard manifest + per-epoch shuffle order, PSI
distribution drift, engine-exact higher moments, chi-square/WOE-IV
feature screening, and RFM segmentation.

The reference overwrites serving tables wholesale and keeps no dimension
history (``spark/batch_processor.py:125-129``); these queries cover the
mutation mechanics — versioned dims, change streams, decayed features,
robust telemetry screens — that the same pipeline needs in production.
Every entry carries a DuckDB oracle for exact driver attestation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_spark.operators import warehouse as WH
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table

_VAL_C = N.sql_cents("value")
_OTP_C = N.sql_cents("o_totalprice")
_SUM_CENTS_OTP = N.sql_sum_cents2("o.o_totalprice")
_BAL4 = N.sql_cents("v.bal", scale=10_000)

_TSF = "%Y-%m-%d %H:%M:%S"


@query(
    "ewma_features",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, value,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS vals
  FROM events
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       round(value, 4) AS value,
       round(
         list_reduce(list_transform(vals, (x, i) -> x * pow(0.9, len(vals) - i)),
                     (a, b) -> a + b)
         / list_reduce(list_transform(vals, (x, i) -> pow(0.9, len(vals) - i)),
                       (a, b) -> a + b), 4) AS value_ewma_24
FROM e""",
    doc="Exponentially-weighted moving average (alpha=0.9, last 24 rows) "
    "per entity — the decayed-recency feature pandas ewm() computes "
    "driver-side in the reference's feature loader family "
    "(ml_training/data_loader.py:121-194). One window pass on the entity "
    "partitioning; the weighted sum is a JVM higher-order LEFT fold, "
    "bit-identical to the oracle's list_reduce.",
    survey_ids=("W3", "W4", "M7-W2"),
)
def ewma_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    e = WH.ewma_col(
        e, "value", entity_col="user_id", order_by=["ts", "event_id"],
        rows=24, alpha=0.9,
    )
    return e.select(
        N.big("event_id").alias("event_id"),
        N.big("user_id").alias("user_id"),
        N.rnd("value").alias("value"),
        N.rnd("value_ewma_24").alias("value_ewma_24"),
    )


@query(
    "scd2_customer",
    oracle=f"""
WITH upd AS (
  SELECT o_custkey AS c_custkey,
         CAST(sum({_OTP_C}) AS DOUBLE) / 1e2 / 100.0
           AS delta,
         max(o_orderdate) AS eff_ts
  FROM orders GROUP BY o_custkey
), chg AS (
  SELECT c.c_custkey, c.c_acctbal AS old_bal,
         c.c_acctbal + u.delta AS new_bal, u.eff_ts
  FROM customer c JOIN upd u USING (c_custkey)
  WHERE (c.c_acctbal + u.delta) IS DISTINCT FROM c.c_acctbal
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       round(old_bal, 4) AS c_acctbal,
       CAST(1 AS BIGINT) AS version,
       CAST(NULL AS VARCHAR) AS valid_from,
       strftime(eff_ts, '{_TSF}') AS valid_to,
       CAST(0 AS BIGINT) AS is_current
FROM chg
UNION ALL
SELECT CAST(c_custkey AS BIGINT), round(new_bal, 4),
       CAST(2 AS BIGINT), strftime(eff_ts, '{_TSF}'),
       CAST(NULL AS VARCHAR), CAST(1 AS BIGINT)
FROM chg
UNION ALL
SELECT CAST(c.c_custkey AS BIGINT), round(c.c_acctbal, 4),
       CAST(1 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(1 AS BIGINT)
FROM customer c ANTI JOIN chg ch ON c.c_custkey = ch.c_custkey""",
    doc="SCD Type-2 dimension merge: an update batch (per-customer balance "
    "delta from their order history, effective at their latest order) "
    "versions the customer dim — closed prior version + open new version "
    "per changed key, single open version for untouched keys. Update "
    "batch broadcasts; the dim scans once and never shuffles. Replaces "
    "the reference's overwrite-the-world dim refresh "
    "(spark/batch_processor.py:125-129) with history-preserving merge.",
    survey_ids=("M7-L6",),
)
def scd2_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders")
    upd = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            (
                F.sum(N.cents("o_totalprice")).cast("double")
                / F.lit(100.0)
                / F.lit(100.0)
            ).alias("_delta"),
            F.max("o_orderdate").alias("eff_ts"),
        )
        .join(dim, "c_custkey")
        .select(
            "c_custkey",
            (F.col("c_acctbal") + F.col("_delta")).alias("c_acctbal"),
            "eff_ts",
        )
    )
    out = WH.scd2_apply(dim, upd, key="c_custkey", attrs=["c_acctbal"])
    return out.select(
        N.big("c_custkey").alias("c_custkey"),
        N.rnd("c_acctbal").alias("c_acctbal"),
        N.big("version").alias("version"),
        N.ts_str("valid_from").alias("valid_from"),
        N.ts_str("valid_to").alias("valid_to"),
        N.big(F.col("is_current").cast("int")).alias("is_current"),
    )


@query(
    "cdc_state",
    oracle=f"""
WITH r AS (
  SELECT user_id, ts, value, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(ts, '{_TSF}') AS last_ts,
       round(value, 4) AS value
FROM r WHERE rn = 1 AND event_type <> 'error'""",
    doc="CDC latest-wins compaction: treat the event stream as a "
    "changelog ('error' = tombstone, anything else = upsert) and reduce "
    "it to final per-key state — one shuffle on the key, window "
    "head-pick (WindowGroupLimit), tombstone filter AFTER the pick so a "
    "trailing delete erases earlier upserts. The mechanism a Debezium/"
    "Delta MERGE applies at the lakehouse boundary.",
    survey_ids=("M7-L7",),
)
def cdc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "op",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")),
    )
    out = WH.cdc_latest(e, key="user_id", order_by=["ts", "event_id"])
    return out.select(
        N.big("user_id").alias("user_id"),
        N.ts_str("ts").alias("last_ts"),
        N.rnd("value").alias("value"),
    )


@query(
    "mad_outliers",
    oracle="""
WITH m AS (
  SELECT event_type, median(value) AS med, count(*) AS n
  FROM events GROUP BY event_type
), d AS (
  SELECT e.event_type, abs(e.value - m.med) AS absdev
  FROM events e JOIN m USING (event_type)
), s AS (
  SELECT event_type, median(absdev) AS mad FROM d GROUP BY event_type
)
SELECT m.event_type,
       CAST(m.n AS BIGINT) AS n,
       round(m.med, 4) AS med,
       round(s.mad, 4) AS mad,
       CAST(coalesce(o.n_outliers, 0) AS BIGINT) AS n_outliers
FROM m JOIN s USING (event_type)
LEFT JOIN (
  SELECT d.event_type, count(*) AS n_outliers
  FROM d JOIN s USING (event_type)
  WHERE d.absdev > 3.0 * 1.4826 * s.mad
  GROUP BY d.event_type
) o USING (event_type)""",
    doc="Robust outlier profile per event type: exact median, MAD (median "
    "absolute deviation), and the count beyond 3 sigma-equivalents "
    "(1.4826 * MAD). Complements the stddev z-score screen "
    "(value_outliers) with a breakdown-point-0.5 estimator extreme "
    "points cannot drag. Two group passes + broadcast stats join; the "
    "fact table is never re-shuffled wide.",
    survey_ids=("A3", "M7-A5"),
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    out = WH.mad_outlier_stats(e, "event_type", "value", k=3.0)
    return out.select(
        "event_type",
        N.big("n").alias("n"),
        N.rnd("med").alias("med"),
        N.rnd("mad").alias("mad"),
        N.big("n_outliers").alias("n_outliers"),
    )


@query(
    "approx_quantile_audit",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99,
       CAST(1 AS BIGINT) AS rank_ok
FROM events GROUP BY event_type""",
    doc="Quantile-sketch accuracy audit, attested differentially (the "
    "quantile companion to approx_distinct_audit): per event type, exact "
    "interpolated p50/p90/p99 next to percentile_approx estimates "
    "(accuracy=10000 — a mergeable Greenwald-Khanna summary, so partial "
    "sketches ship between executors instead of raw values). The audit "
    "flag checks the estimator's ACTUAL contract — rank error <= "
    "eps*n + 2 (eps = 1/accuracy, +2 for rank discretization + "
    "interpolation slack), measured by counting values <= each estimate "
    "in a second pass — not value-relative error, which a sparse p99 "
    "tail inflates even when the sketch is within guarantee (an "
    "off-by-one order stat can be a 25% value jump). The oracle pins "
    "the flag true, so the value hash matches only if every estimate "
    "really lands within its rank bound.",
    survey_ids=("A3", "M7-A6"),
)
def approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    probs = [0.5, 0.9, 0.99]
    agg = e.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("_ex"),
        F.percentile_approx(
            "value",
            F.array(*[F.lit(p) for p in probs]),
            F.lit(10000),
        ).alias("_ap"),
    ).localCheckpoint()
    ranks = (
        e.join(F.broadcast(agg), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.sum(
                    (F.col("value") <= F.col("_ap")[i]).cast("bigint")
                ).alias(f"_r{i}")
                for i in range(len(probs))
            ],
        )
    )
    eps = 1.0 / 10000
    ok = F.lit(True)
    for i, p in enumerate(probs):
        ok = ok & (
            F.abs(F.col(f"_r{i}") - F.lit(p) * F.col("_n"))
            <= F.lit(eps) * F.col("_n") + F.lit(2.0)
        )
    return agg.join(ranks, "event_type").select(
        "event_type",
        N.rnd(F.col("_ex")[0]).alias("p50"),
        N.rnd(F.col("_ex")[1]).alias("p90"),
        N.rnd(F.col("_ex")[2]).alias("p99"),
        ok.cast("bigint").alias("rank_ok"),
    )


@query(
    "salted_hourly_agg",
    oracle="""
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
       round(max(value), 4) AS max_value,
       CAST(count(*) AS BIGINT) AS n_events,
       array_to_string(list(event_type ORDER BY event_type, value), ',')
         AS event_types,
       array_to_string(list_transform(
         list(value ORDER BY event_type, value),
         v -> CAST(round(v, 2) AS VARCHAR)), ',') AS values
FROM events GROUP BY user_id, date_trunc('hour', ts)""",
    doc="Differential attestation of the skew guard: the two-stage salted "
    "aggregation (operators/skew.py — hot (entity, hour) keys fan out "
    "over 16 salt buckets, partials merge per key) must be value-"
    "identical to the plain one-shuffle groupBy the oracle runs, "
    "including the deterministic sorted parallel arrays. The soak in "
    "BENCH_SCALING.md shows the unsalted variant dying on a hot key; "
    "this entry proves the surviving variant computes the same answer.",
    survey_ids=("A1", "M7-K1"),
)
def salted_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators import skew as SK

    e = load_table(spark, sf_dir, "events")
    g = SK.salted_hourly_gold(e, buckets=16)
    return g.select(
        N.big("user_id").alias("user_id"),
        N.ts_str("hour_ts").alias("hour_ts"),
        N.rnd("max_value").alias("max_value"),
        N.big("n_events").alias("n_events"),
        F.concat_ws(",", "event_types").alias("event_types"),
        F.concat_ws(
            ",",
            F.transform(F.col("values"), lambda v: F.round(v, 2).cast("string")),
        ).alias("values"),
    )


@query(
    "trend_fit",
    oracle=f"""
WITH s AS (
  SELECT user_id,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(date_diff('hour', TIMESTAMP '2024-01-01', ts)
                       AS DECIMAL(18,0))) AS DOUBLE) AS sx,
         CAST(sum({_VAL_C}) AS DOUBLE) / 1e2 AS sy,
         CAST(sum(CAST(date_diff('hour', TIMESTAMP '2024-01-01', ts)
                       AS DECIMAL(18,0))
                  * {_VAL_C}) AS DOUBLE) / 1e2 AS sxy,
         CAST(sum(CAST(date_diff('hour', TIMESTAMP '2024-01-01', ts)
                       AS DECIMAL(18,0))
                  * CAST(date_diff('hour', TIMESTAMP '2024-01-01', ts)
                         AS DECIMAL(18,0))) AS DOUBLE) AS sxx
  FROM events GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
       END AS slope,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                       / n, 4)
       END AS intercept
FROM s""",
    doc="Per-entity OLS trend (value vs hours-since-epoch-start): slope "
    "and intercept from the five classic moments, summed exactly in "
    "DECIMAL (order-free across partials — a 1000-executor partial agg "
    "gives the same bits) and only then combined in DOUBLE through an "
    "identical expression tree on both engines, so the closed form is "
    "bit-reproducible without trusting native regr_slope "
    "implementations. One aggregation exchange; degenerate single-hour "
    "entities yield NULL, not a division error.",
    survey_ids=("A4", "M7-A7"),
)
def trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    x = (
        F.floor(F.unix_timestamp("ts") / 3600) - F.lit(473352)
    ).cast("decimal(18,0)")
    y = N.cents("value")
    s = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        (F.sum(y.cast("decimal(38,0)")).cast("double") / F.lit(100.0)).alias("sy"),
        (F.sum(x * y).cast("double") / F.lit(100.0)).alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select(
        N.big("user_id").alias("user_id"),
        N.big("n").alias("n"),
        F.when(den != 0, N.rnd(slope, 6)).alias("slope"),
        F.when(den != 0, N.rnd(intercept, 4)).alias("intercept"),
    )


_SHARD_NIBBLE = (
    "strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), {p}, 1)) - 1"
)


@query(
    "shard_manifest",
    oracle=f"""
WITH s AS (
  SELECT (({_SHARD_NIBBLE.format(p=1)}) * 16 + ({_SHARD_NIBBLE.format(p=2)})) % 16
           AS shard_id,
         length(text) AS n_chars,
         len(list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> ''))
           AS n_tokens
  FROM documents
)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM s GROUP BY shard_id""",
    doc="Dataset-publishing manifest: the per-shard doc/char/token counts "
    "a training loader validates before a run burns accelerator time. "
    "Shard = md5 bucket of the doc id (hash_split's idiom), so documents "
    "keep their shard across corpus refreshes and the oracle replays "
    "identical buckets; the aggregation is one exchange of n_shards "
    "rows. publish_shards (operators/publish.py) writes the Hive-"
    "partitioned shards plus this manifest as _manifest.json.",
    survey_ids=("M7-S10",),
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators import publish as PB

    d = load_table(spark, sf_dir, "documents")
    m = PB.shard_manifest_frame(d, id_col="doc_id", text_col="text", n_shards=16)
    return m.select(
        N.big("shard_id").alias("shard_id"),
        N.big("n_docs").alias("n_docs"),
        N.big("n_chars").alias("n_chars"),
        N.big("n_tokens").alias("n_tokens"),
    )


@query(
    "epoch_shuffle",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         (({_SHARD_NIBBLE.format(p=1)}) * 16 + ({_SHARD_NIBBLE.format(p=2)})) % 16
           AS shard_id
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(shard_id AS BIGINT) AS shard_id,
       CAST(row_number() OVER (
         PARTITION BY shard_id
         ORDER BY md5(CAST(doc_id AS VARCHAR) || '-e0'), doc_id
       ) AS BIGINT) AS pos_e0,
       CAST(row_number() OVER (
         PARTITION BY shard_id
         ORDER BY md5(CAST(doc_id AS VARCHAR) || '-e1'), doc_id
       ) AS BIGINT) AS pos_e1
FROM s""",
    doc="Per-epoch training shuffle order: within each shard, position = "
    "rank of md5(id || epoch) — reproducible (resume = seek), "
    "decorrelated across epochs (same data, new order, zero data "
    "movement), and shard-local by design: a global row_number would "
    "serialize the corpus through one partition, while loaders consume "
    "shards independently. Both epochs' ranks ride ONE shard exchange "
    "(same window partitioning, different sort keys).",
    survey_ids=("M7-S11",),
)
def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators import publish as PB

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    e0 = PB.epoch_order(d, epoch=0, n_shards=16, out_col="pos_e0")
    out = PB.epoch_order(e0.drop("shard_id"), epoch=1, n_shards=16,
                         out_col="pos_e1")
    return out.select(
        N.big("doc_id").alias("doc_id"),
        N.big("shard_id").alias("shard_id"),
        N.big("pos_e0").alias("pos_e0"),
        N.big("pos_e1").alias("pos_e1"),
    )


@query(
    "drift_psi",
    oracle="""
WITH b AS (
  SELECT event_type,
         CAST(floor(value / 25.0) AS BIGINT) AS bin,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS a
  FROM events
), counts AS (
  SELECT event_type, bin, sum(a) AS n_a, sum(1 - a) AS n_b
  FROM b GROUP BY event_type, bin
), totals AS (
  SELECT event_type, sum(n_a) AS t_a, sum(n_b) AS t_b,
         count(*) AS n_bins
  FROM counts GROUP BY event_type
)
SELECT c.event_type,
       CAST(t.t_a AS BIGINT) AS n_baseline,
       CAST(t.t_b AS BIGINT) AS n_current,
       CAST(sum(CAST(round(
         ((c.n_a + 0.5) / (t.t_a + 0.5 * t.n_bins)
          - (c.n_b + 0.5) / (t.t_b + 0.5 * t.n_bins))
         * ln(((c.n_a + 0.5) / (t.t_a + 0.5 * t.n_bins))
              / ((c.n_b + 0.5) / (t.t_b + 0.5 * t.n_bins))),
       6) AS DECIMAL(18,6))) AS DOUBLE) AS psi
FROM counts c JOIN totals t USING (event_type)
GROUP BY c.event_type, t.t_a, t.t_b""",
    doc="Distribution-drift monitor: Population Stability Index of the "
    "value distribution per event type between the first and second half "
    "of the month (25-wide bins, Laplace-smoothed shares; < 0.1 stable, "
    "> 0.25 shifted) — the screen a training pipeline runs between "
    "corpus snapshots before retraining. Both sides are counted in ONE "
    "pass via conditional partial aggregation (no self-join, no second "
    "scan); per-bin terms are rounded then DECIMAL-summed.",
    survey_ids=("A3", "M7-A8b"),
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators import quality as Q

    e = load_table(spark, sf_dir, "events")
    out = Q.psi_drift(
        e,
        value_col="value",
        group_col="event_type",
        split_pred=F.col("ts") < F.lit("2024-01-16").cast("timestamp"),
        bin_width=25.0,
        rnd=N.rnd,
    )
    return out.select(
        "event_type",
        N.big("n_baseline").alias("n_baseline"),
        N.big("n_current").alias("n_current"),
        F.col("psi"),
    )


# raw integer cents; skewness/kurtosis are scale-invariant, only the
# mean divides back to natural units. HUGEINT/DECIMAL(38,0) hold c^4
# exactly (cents <= ~1e5 -> c^4 <= 1e20 < 1e38).
_VD = N.sql_cents("value")
_V2 = f"(CAST({_VD} AS HUGEINT) * {_VD})"


@query(
    "higher_moments",
    oracle=f"""
WITH s AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum({_VD}) AS DOUBLE) AS s1,
         CAST(sum({_V2}) AS DOUBLE) AS s2,
         CAST(sum({_V2} * {_VD}) AS DOUBLE) AS s3,
         CAST(sum({_V2} * {_V2}) AS DOUBLE) AS s4
  FROM events GROUP BY event_type
), m AS (
  SELECT event_type, n, s1 / n AS mu,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3.0 * (s1 / n) * (s2 / n)
           + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4.0 * (s1 / n) * (s3 / n)
           + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM s
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       round(mu / 1e2, 6) AS mean,
       round(m3 / pow(m2, 1.5), 6) AS skewness,
       round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis
FROM m""",
    doc="Engine-exact skewness and excess kurtosis per event type from "
    "the four raw moments, summed in explicitly-widened DECIMAL (v^2 "
    "re-scaled to DECIMAL(16,4) before squaring so no product exceeds "
    "precision 38) — order-free across 1000 executors' partials — then "
    "combined in DOUBLE through an identical expression tree on both "
    "engines. Native skewness()/kurtosis() differ across engines in the "
    "last bits; the five-sum formulation replays bit-identically, the "
    "same discipline as value_hour_correlation.",
    survey_ids=("A3", "M7-A9b"),
)
def higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    vd = N.cents("value")
    v2 = vd.cast("decimal(38,0)") * vd
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(vd.cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum(v2).cast("double").alias("s2"),
        F.sum(v2 * vd).cast("double").alias("s3"),
        F.sum(v2 * v2).cast("double").alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = (
        F.col("s3") / F.col("n")
        - F.lit(3.0) * mu * (F.col("s2") / F.col("n"))
        + F.lit(2.0) * mu * mu * mu
    )
    m4 = (
        F.col("s4") / F.col("n")
        - F.lit(4.0) * mu * (F.col("s3") / F.col("n"))
        + F.lit(6.0) * mu * mu * (F.col("s2") / F.col("n"))
        - F.lit(3.0) * mu * mu * mu * mu
    )
    return s.select(
        "event_type",
        N.big("n").alias("n"),
        N.rnd(mu / F.lit(100.0), 6).alias("mean"),
        N.rnd(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skewness"),
        N.rnd(m4 / (m2 * m2) - F.lit(3.0), 6).alias("kurtosis"),
    )


@query(
    "chi_square_independence",
    oracle="""
WITH o AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, count(*) AS obs
  FROM events GROUP BY event_type, hour(ts)
), rowm AS (SELECT event_type, sum(obs) AS r FROM o GROUP BY event_type),
colm AS (SELECT hr, sum(obs) AS c FROM o GROUP BY hr),
tot AS (SELECT sum(obs) AS t FROM o)
SELECT CAST(count(DISTINCT o.event_type) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o.hr) AS BIGINT) AS n_cols,
       CAST((count(DISTINCT o.event_type) - 1)
            * (count(DISTINCT o.hr) - 1) AS BIGINT) AS dof,
       CAST(sum(CAST(round(
         (o.obs - CAST(rowm.r AS DOUBLE) * colm.c / tot.t)
         * (o.obs - CAST(rowm.r AS DOUBLE) * colm.c / tot.t)
         / (CAST(rowm.r AS DOUBLE) * colm.c / tot.t),
       6) AS DECIMAL(18,6))) AS DOUBLE) AS chi2
FROM o JOIN rowm USING (event_type) JOIN colm USING (hr), tot""",
    doc="Chi-square independence test between event type and hour of "
    "day — the categorical-feature relevance screen before training "
    "(large chi2 vs dof = the feature carries signal). Observed cell "
    "counts in one pass; row/column margins are tiny broadcast frames; "
    "cell terms (O-E)^2/E from exact integer counts are rounded then "
    "DECIMAL-summed. Only the margins shuffle, never raw rows twice.",
    survey_ids=("A3", "M7-A10b"),
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    o = e.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hr")
    ).agg(F.count(F.lit(1)).alias("obs"))
    rowm = o.groupBy("event_type").agg(F.sum("obs").alias("r"))
    colm = o.groupBy("hr").agg(F.sum("obs").alias("c"))
    tot = o.agg(F.sum("obs").alias("t"))
    exp = F.col("r").cast("double") * F.col("c") / F.col("t")
    term = N.rnd(
        (F.col("obs") - exp) * (F.col("obs") - exp) / exp, 6
    ).cast("decimal(18,6)")
    return (
        o.join(F.broadcast(rowm), "event_type")
        .join(F.broadcast(colm), "hr")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count_distinct("event_type").cast("bigint").alias("n_rows"),
            F.count_distinct("hr").cast("bigint").alias("n_cols"),
            (
                (F.count_distinct("event_type") - 1)
                * (F.count_distinct("hr") - 1)
            ).cast("bigint").alias("dof"),
            F.sum(term).cast("double").alias("chi2"),
        )
    )


@query(
    "woe_iv_encoding",
    oracle="""
WITH lab AS (
  SELECT event_type, CASE WHEN value > 68.0 THEN 1 ELSE 0 END AS pos
  FROM events
), cat AS (
  SELECT event_type, sum(pos) AS n_pos, sum(1 - pos) AS n_neg
  FROM lab GROUP BY event_type
), tot AS (SELECT sum(n_pos) AS t_pos, sum(n_neg) AS t_neg FROM cat)
SELECT cat.event_type,
       CAST(cat.n_pos AS BIGINT) AS n_pos,
       CAST(cat.n_neg AS BIGINT) AS n_neg,
       round(ln(((cat.n_pos + 0.5) / (tot.t_pos + 0.5))
                / ((cat.n_neg + 0.5) / (tot.t_neg + 0.5))), 6) AS woe,
       round(((cat.n_pos + 0.5) / (tot.t_pos + 0.5)
              - (cat.n_neg + 0.5) / (tot.t_neg + 0.5))
             * ln(((cat.n_pos + 0.5) / (tot.t_pos + 0.5))
                  / ((cat.n_neg + 0.5) / (tot.t_neg + 0.5))), 6) AS iv_term
FROM cat, tot""",
    doc="Weight-of-Evidence encoding + Information-Value terms per "
    "category against a binary target (value above its global median-ish "
    "threshold 68) — the standard supervised categorical encoding where "
    "a learned embedding is overkill; sum(iv_term) ranks the feature. "
    "Laplace-smoothed so zero cells stay finite; one pass for the "
    "per-category counts, one broadcast total row.",
    survey_ids=("F7", "M7-F3b"),
)
def woe_iv_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    lab = e.select(
        "event_type",
        (F.col("value") > 68.0).cast("bigint").alias("pos"),
    )
    cat = lab.groupBy("event_type").agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.lit(1) - F.col("pos")).alias("n_neg"),
    )
    tot = cat.agg(
        F.sum("n_pos").alias("t_pos"), F.sum("n_neg").alias("t_neg")
    )
    p = (F.col("n_pos") + 0.5) / (F.col("t_pos") + 0.5)
    q = (F.col("n_neg") + 0.5) / (F.col("t_neg") + 0.5)
    return cat.crossJoin(F.broadcast(tot)).select(
        "event_type",
        N.big("n_pos").alias("n_pos"),
        N.big("n_neg").alias("n_neg"),
        N.rnd(F.log(p / q), 6).alias("woe"),
        N.rnd((p - q) * F.log(p / q), 6).alias("iv_term"),
    )


@query(
    "rfm_segments",
    oracle=f"""
WITH agg AS (
  SELECT user_id,
         max(ts) AS last_ts,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum({_VAL_C}) AS DOUBLE) / 1e2 AS monetary
  FROM events GROUP BY user_id
), anchor AS (SELECT max(ts) AS now FROM events),
rfm AS (
  SELECT user_id,
         (epoch_us(anchor.now) - epoch_us(last_ts)) / 8.64e10
           AS recency_days,
         frequency, monetary
  FROM agg, anchor
), th AS (
  SELECT quantile_cont(recency_days, 0.25) AS r1,
         quantile_cont(recency_days, 0.5) AS r2,
         quantile_cont(recency_days, 0.75) AS r3,
         quantile_cont(CAST(frequency AS DOUBLE), 0.25) AS f1,
         quantile_cont(CAST(frequency AS DOUBLE), 0.5) AS f2,
         quantile_cont(CAST(frequency AS DOUBLE), 0.75) AS f3,
         quantile_cont(monetary, 0.25) AS m1,
         quantile_cont(monetary, 0.5) AS m2,
         quantile_cont(monetary, 0.75) AS m3
  FROM rfm
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       round(recency_days, 4) AS recency_days,
       frequency,
       round(monetary, 4) AS monetary,
       CAST(4 - ((recency_days > r1)::INT + (recency_days > r2)::INT
                 + (recency_days > r3)::INT) AS BIGINT) AS r_score,
       CAST(1 + (frequency > f1)::INT + (frequency > f2)::INT
              + (frequency > f3)::INT AS BIGINT) AS f_score,
       CAST(1 + (monetary > m1)::INT + (monetary > m2)::INT
              + (monetary > m3)::INT AS BIGINT) AS m_score
FROM rfm, th""",
    doc="RFM customer segmentation, scale-safe: per-entity recency/"
    "frequency/monetary in one pass (DECIMAL-exact monetary; recency in "
    "days vs the corpus max timestamp), quartile scores 1-4 from THREE "
    "broadcast exact-percentile thresholds per metric — not a global "
    "ntile, whose single-partition window would serialize millions of "
    "customers through one task. Strict-greater threshold comparisons "
    "make boundary ties engine-deterministic.",
    survey_ids=("A4", "M7-A11b"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        (F.sum(N.cents("value")).cast("double") / F.lit(100.0)).alias(
            "monetary"
        ),
    )
    anchor = e.agg(F.max("ts").alias("now"))
    rfm = agg.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (
            (F.unix_micros("now") - F.unix_micros("last_ts"))
            / F.lit(8.64e10)
        ).alias("recency_days"),
        "frequency",
        "monetary",
    )
    th = F.broadcast(
        rfm.agg(
            *[
                F.expr(f"percentile(recency_days, {p})").alias(f"r{i}")
                for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
            ],
            *[
                F.expr(f"percentile(CAST(frequency AS DOUBLE), {p})").alias(
                    f"f{i}"
                )
                for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
            ],
            *[
                F.expr(f"percentile(monetary, {p})").alias(f"m{i}")
                for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
            ],
        )
    )

    def score(col: str, pfx: str, invert: bool = False):
        s = sum(
            (F.col(col) > F.col(f"{pfx}{i}")).cast("int") for i in (1, 2, 3)
        )
        return (4 - s if invert else 1 + s).cast("bigint")

    return rfm.crossJoin(th).select(
        N.big("user_id").alias("user_id"),
        N.rnd("recency_days").alias("recency_days"),
        "frequency",
        N.rnd("monetary").alias("monetary"),
        score("recency_days", "r", invert=True).alias("r_score"),
        score("frequency", "f").alias("f_score"),
        score("monetary", "m").alias("m_score"),
    )


@query(
    "global_ids",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         (({_SHARD_NIBBLE.format(p=1)}) * 16 + ({_SHARD_NIBBLE.format(p=2)})) % 16
           AS shard_id
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(shard_id AS BIGINT) AS shard_id,
       CAST(shard_id * {1 << 40}
            + row_number() OVER (PARTITION BY shard_id ORDER BY doc_id)
            AS BIGINT) AS global_id
FROM s""",
    doc="Deterministic global int64 ids without global coordination: "
    "shard_id << 40 | shard-local rank — the scale-safe replacement for "
    "monotonically_increasing_id(), whose values depend on partition "
    "count and scheduling and therefore change across runs and cluster "
    "sizes. These are a pure function of the data; the only window is "
    "shard-local.",
    survey_ids=("M7-S13",),
)
def global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators import publish as PB

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    out = PB.assign_global_ids(d, n_shards=16)
    return out.select(
        N.big("doc_id").alias("doc_id"),
        N.big("shard_id").alias("shard_id"),
        N.big("global_id").alias("global_id"),
    )


@query(
    "session_paths",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM gaps
), paths AS (
  SELECT user_id, session_idx,
         array_to_string(
           list(event_type ORDER BY ts, event_id)[1:8], '>') AS path
  FROM sess GROUP BY user_id, session_idx
)
SELECT path,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 10""",
    doc="Top user journeys: per 30-minute-gap session, the ordered "
    "event-type path (first 8 steps — the cap bounds the key width a "
    "pathological session could otherwise explode), counted corpus-wide, "
    "top-10. Composes the sessionize idiom with a sorted-collect per "
    "session; the path aggregation shuffles short strings, never events "
    "twice.",
    survey_ids=("A7", "M7-A12b"),
)
def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.withColumn(
        "_new",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            > 1800,
            1,
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    sess = gaps.withColumn(
        "_sid",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = (
        sess.groupBy("user_id", "_sid")
        .agg(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts").alias("t"),
                                F.col("event_id").alias("e"),
                                F.col("event_type").alias("y"),
                            )
                        )
                    ),
                    lambda s: s["y"],
                ),
                1,
                8,
            ).alias("_steps")
        )
        .select(F.concat_ws(">", "_steps").alias("path"))
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )


_MK_STATES = ["click", "error", "purchase", "signup", "view"]
_MK_ITERS = 8


def _mk_matrix_sql() -> str:
    cols = []
    for i, si in enumerate(_MK_STATES):
        for j, sj in enumerate(_MK_STATES):
            cols.append(
                f"(sum(CASE WHEN prev = '{si}' AND next = '{sj}' "
                f"THEN 1 ELSE 0 END) + 0.5) / "
                f"(sum(CASE WHEN prev = '{si}' THEN 1 ELSE 0 END) + 2.5) "
                f"AS p_{i}_{j}"
            )
    return ",\n         ".join(cols)


def _mk_iter_sql() -> str:
    ctes = ["it0 AS (SELECT " + ", ".join(
        f"0.2 AS v{j}" for j in range(5)) + ")"]
    for t in range(1, _MK_ITERS + 1):
        cols = []
        for j in range(5):
            expr = "0.0"
            for i in range(5):
                expr = f"({expr} + it{t-1}.v{i} * m.p_{i}_{j})"
            cols.append(f"{expr} AS v{j}")
        ctes.append(
            f"it{t} AS (SELECT " + ", ".join(cols) + f" FROM it{t-1}, m)"
        )
    return ",\n".join(ctes)


@query(
    "markov_steady_state",
    oracle=f"""
WITH pairs AS (
  SELECT prev, next FROM (
    SELECT event_type AS next,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events)
  WHERE prev IS NOT NULL
), m AS (
  SELECT {_mk_matrix_sql()}
  FROM pairs
),
{_mk_iter_sql()},
n AS (SELECT CAST(count(*) AS BIGINT) AS n_transitions FROM pairs)
SELECT state, pi, n_transitions FROM (
  {" UNION ALL ".join(
    f"SELECT '{s}' AS state, round(it{_MK_ITERS}.v{j}, 6) AS pi "
    f"FROM it{_MK_ITERS}"
    for j, s in enumerate(_MK_STATES))}
), n""",
    doc="Markov steady-state of the event-type transition chain: the "
    "Laplace-smoothed 5x5 row-stochastic matrix aggregates in one pass "
    "and collapses to ONE broadcast row; 8 power-iteration steps of "
    "pi <- pi P then run as a single nested higher-order-function fold "
    "inside codegen — a bounded iterative numeric algorithm with ZERO "
    "extra jobs, shuffles, or driver round-trips (contrast "
    "dedup_clusters, whose unbounded-size state genuinely needs one job "
    "per round). The oracle unrolls the identical left-associated "
    "arithmetic, so all 8 iterations replay bit-exactly.",
    survey_ids=("A8", "M7-A13b"),
)
def markov_steady_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.lag("event_type").over(w).alias("prev"),
            F.col("event_type").alias("next"),
        )
        .where(F.col("prev").isNotNull())
    )
    aggs = []
    for i, si in enumerate(_MK_STATES):
        for j, sj in enumerate(_MK_STATES):
            aggs.append(
                F.sum(
                    ((F.col("prev") == si) & (F.col("next") == sj)).cast("int")
                ).alias(f"c_{i}_{j}")
            )
        aggs.append(
            F.sum((F.col("prev") == si).cast("int")).alias(f"r_{i}")
        )
    aggs.append(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    mrow = pairs.agg(*aggs)
    p_entries = [
        (F.col(f"c_{i}_{j}") + 0.5) / (F.col(f"r_{i}") + 2.5)
        for i in range(5)
        for j in range(5)
    ]
    mrow = mrow.select(
        F.array(*p_entries).alias("P"), "n_transitions"
    )
    pi0 = F.array(*[F.lit(0.2) for _ in range(5)])
    pi = F.aggregate(
        F.sequence(F.lit(1), F.lit(_MK_ITERS)),
        pi0,
        lambda acc, _t: F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda j: F.aggregate(
                F.sequence(F.lit(0), F.lit(4)),
                F.lit(0.0),
                lambda s, i: s
                + F.element_at(acc, i + 1)
                * F.element_at(F.col("P"), i * 5 + j + 1),
            ),
        ),
    )
    states = F.array(*[F.lit(s) for s in _MK_STATES])
    return (
        mrow.select(
            F.posexplode(F.arrays_zip(states.alias("s"), pi.alias("p")))
            .alias("_i", "_z"),
            "n_transitions",
        )
        .select(
            F.col("_z")["s"].alias("state"),
            N.rnd(F.col("_z")["p"], 6).alias("pi"),
            "n_transitions",
        )
    )


@query(
    "gini_concentration",
    oracle="""
WITH per AS (
  SELECT user_id, CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY user_id
), ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, user_id) AS i,
         count(*) OVER () AS n, sum(x) OVER () AS t
  FROM per
)
SELECT CAST(any_value(n) AS BIGINT) AS n_entities,
       CAST(any_value(t) AS BIGINT) AS n_events,
       round(2.0 * sum(i * x) / (any_value(n) * any_value(t))
             - (any_value(n) + 1.0) / any_value(n), 6) AS gini
FROM ranked""",
    doc="Gini coefficient of per-entity event concentration — the "
    "is-my-corpus-dominated-by-few-sources diagnostic next to "
    "corpus_composition (0 = uniform, 1 = one entity owns everything). "
    "Facts collapse to one row per entity FIRST; only that small "
    "aggregate is globally ranked (the same cardinality label encoding "
    "already sorts), and the closed form needs one pass over the ranked "
    "rows. Deterministic rank ties via entity id.",
    survey_ids=("A10", "M7-A14b"),
)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    w = Window.orderBy("x", "user_id")
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).alias("t"),
    )
    return ranked.agg(
        F.first("n").cast("bigint").alias("n_entities"),
        F.first("t").cast("bigint").alias("n_events"),
        N.rnd(
            F.lit(2.0) * F.sum(F.col("i") * F.col("x"))
            / (F.first("n") * F.first("t"))
            - (F.first("n") + F.lit(1.0)) / F.first("n"),
            6,
        ).alias("gini"),
    )


@query(
    "scd2_point_in_time_join",
    oracle=f"""
WITH upd AS (
  SELECT o_custkey AS c_custkey,
         CAST(sum({_OTP_C}) AS DOUBLE) / 1e2 / 100.0
           AS delta,
         max(o_orderdate) AS eff_ts
  FROM orders GROUP BY o_custkey
), chg AS (
  SELECT c.c_custkey, c.c_acctbal AS old_bal,
         c.c_acctbal + u.delta AS new_bal, u.eff_ts
  FROM customer c JOIN upd u USING (c_custkey)
  WHERE (c.c_acctbal + u.delta) IS DISTINCT FROM c.c_acctbal
), vers AS (
  SELECT c_custkey, old_bal AS bal, 1 AS version,
         CAST(NULL AS DATE) AS vfrom, eff_ts AS vto
  FROM chg
  UNION ALL
  SELECT c_custkey, new_bal, 2, eff_ts, NULL FROM chg
  UNION ALL
  SELECT c.c_custkey, c.c_acctbal, 1, NULL, NULL
  FROM customer c ANTI JOIN chg ch ON c.c_custkey = ch.c_custkey
)
SELECT o.o_orderpriority,
       CAST(v.version AS BIGINT) AS version,
       CAST(count(*) AS BIGINT) AS n_orders,
       {_SUM_CENTS_OTP} AS total_price,
       (CAST(sum({_BAL4}) AS DOUBLE) / 1e4) AS bal_sum
FROM orders o JOIN vers v ON v.c_custkey = o.o_custkey
WHERE (v.vfrom IS NULL OR o.o_orderdate >= v.vfrom)
  AND (v.vto   IS NULL OR o.o_orderdate <  v.vto)
GROUP BY 1, 2""",
    doc="Point-in-time (AS OF) join against the SCD2 dimension "
    "scd2_apply builds: every order joins the customer version that "
    "was valid ON ITS ORDER DATE (valid_from <= d < valid_to, NULL = "
    "open) — the temporal-correctness join that makes dimension "
    "history usable, and the one a latest-version join silently gets "
    "wrong for backdated facts. Implementation: facts equi-join the "
    "versioned dim on the key (fanout bounded by versions-per-key, "
    "here <= 2) and filter the validity interval — the standard PIT "
    "shape while version counts are small; a high-churn dim would "
    "switch to the as-of sort-merge (operators/asof.py) on the same "
    "semantics. Balances pin to a 1e-4 DECIMAL grid before the "
    "order-free sum.",
    survey_ids=("M4", "W7", "M7-W5b"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders")
    upd = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            (
                F.sum(N.cents("o_totalprice")).cast("double")
                / F.lit(100.0)
                / F.lit(100.0)
            ).alias("_delta"),
            F.max("o_orderdate").alias("eff_ts"),
        )
        .join(dim, "c_custkey")
        .select(
            "c_custkey",
            (F.col("c_acctbal") + F.col("_delta")).alias("c_acctbal"),
            "eff_ts",
        )
    )
    scd2 = WH.scd2_apply(dim, upd, key="c_custkey", attrs=["c_acctbal"]).select(
        F.col("c_custkey").alias("v_custkey"),
        F.col("c_acctbal").alias("bal"),
        "version",
        "valid_from",
        "valid_to",
    )
    o = orders.select("o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    pit = o.join(scd2, o.o_custkey == scd2.v_custkey).filter(
        (
            F.col("valid_from").isNull()
            | (F.col("o_orderdate").cast("timestamp") >= F.col("valid_from"))
        )
        & (
            F.col("valid_to").isNull()
            | (F.col("o_orderdate").cast("timestamp") < F.col("valid_to"))
        )
    )
    return pit.groupBy("o_orderpriority", N.big("version").alias("version")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        N.sum_cents2(F.col("o_totalprice")).alias("total_price"),
        (
            F.sum(N.cents("bal", scale=10_000).cast("decimal(38,0)"))
            .cast("double")
            / F.lit(1.0e4)
        ).alias("bal_sum"),
    )


# ---------------------------------------------------------------------------
# cramers_v_effect (round 9) — effect sizes over chi_square_independence's
# exact contingency: the "is it LARGE" companion to "is it significant"
# ---------------------------------------------------------------------------

# All four effect sizes from (chi2, n, r, c); sqrt is hardware-IEEE
# (not libm), so the shared strings render identically cross-engine.
_CV_PHI2 = "(chi2 / (1.0e0 * n))"
_CV_V = f"sqrt({_CV_PHI2} / least(r - 1, c - 1))"
_CV_T = f"sqrt({_CV_PHI2} / sqrt(1.0e0 * (r - 1) * (c - 1)))"
_CV_C = "sqrt(chi2 / (chi2 + 1.0e0 * n))"
# Bergsma (2013) bias correction: phi2+ = max(0, phi2 - (r-1)(c-1)/(n-1)),
# r+ = r - (r-1)^2/(n-1), c+ analogous.
_CV_VCORR = (
    f"sqrt(greatest(0.0e0, {_CV_PHI2}"
    " - (1.0e0 * (r - 1) * (c - 1)) / (n - 1))"
    " / least((r - (1.0e0 * (r - 1) * (r - 1)) / (n - 1)) - 1,"
    "         (c - (1.0e0 * (c - 1) * (c - 1)) / (n - 1)) - 1))"
)


@query(
    "cramers_v_effect",
    oracle=f"""
WITH o AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, count(*) AS obs
  FROM events GROUP BY event_type, hour(ts)
), rowm AS (SELECT event_type, sum(obs) AS r FROM o GROUP BY event_type),
colm AS (SELECT hr, sum(obs) AS c FROM o GROUP BY hr),
tot AS (SELECT sum(obs) AS t FROM o),
x AS (
  SELECT CAST(count(DISTINCT o.event_type) AS BIGINT) AS r,
         CAST(count(DISTINCT o.hr) AS BIGINT) AS c,
         CAST(sum(o.obs) AS BIGINT) AS n,
         CAST(sum(CAST(round(
           (o.obs - CAST(rowm.r AS DOUBLE) * colm.c / tot.t)
           * (o.obs - CAST(rowm.r AS DOUBLE) * colm.c / tot.t)
           / (CAST(rowm.r AS DOUBLE) * colm.c / tot.t),
         6) AS DECIMAL(18,6))) AS DOUBLE) AS chi2
  FROM o JOIN rowm USING (event_type) JOIN colm USING (hr), tot
)
SELECT n, r AS n_rows, c AS n_cols,
       {N.sql_rnd("chi2", 4)} AS chi2,
       {N.sql_rnd(_CV_V, 6)} AS cramers_v,
       {N.sql_rnd(_CV_VCORR, 6)} AS cramers_v_corrected,
       {N.sql_rnd(_CV_T, 6)} AS tschuprow_t,
       {N.sql_rnd(_CV_C, 6)} AS contingency_c
FROM x""",
    doc="Effect sizes over the event-type × hour-of-day contingency: "
    "Cramér's V = sqrt(φ²/min(r−1,c−1)), the Bergsma (2013) "
    "bias-corrected V (the one to report: raw V inflates on large "
    "sparse tables), Tschuprow's T, and Pearson's contingency "
    "coefficient — the 'how LARGE is the association' companion to "
    "chi_square_independence's 'is it significant'. chi2 is the same "
    "snapped-DECIMAL cell sum as the test entry; the four effect "
    "sizes are shared double strings over (chi2, n, r, c) with only "
    "hardware sqrt (no libm). Plan: identical to the test — one cell "
    "census, broadcast margins, one scalar row out.",
    survey_ids=("M7-A76",),
)
def cramers_v_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    o = e.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hr")
    ).agg(F.count(F.lit(1)).alias("obs"))
    rowm = o.groupBy("event_type").agg(F.sum("obs").alias("r"))
    colm = o.groupBy("hr").agg(F.sum("obs").alias("c"))
    tot = o.agg(F.sum("obs").alias("t"))
    exp = F.col("r").cast("double") * F.col("c") / F.col("t")
    term = N.rnd(
        (F.col("obs") - exp) * (F.col("obs") - exp) / exp, 6
    ).cast("decimal(18,6)")
    x = (
        o.join(F.broadcast(rowm), "event_type")
        .join(F.broadcast(colm), "hr")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count_distinct("event_type").cast("bigint").alias("r"),
            F.count_distinct("hr").cast("bigint").alias("c"),
            F.sum("obs").cast("bigint").alias("n"),
            F.sum(term).cast("double").alias("chi2"),
        )
    )
    return x.select(
        "n",
        F.col("r").alias("n_rows"),
        F.col("c").alias("n_cols"),
        F.expr(N.sql_rnd("chi2", 4)).alias("chi2"),
        F.expr(N.sql_rnd(_CV_V, 6)).alias("cramers_v"),
        F.expr(N.sql_rnd(_CV_VCORR, 6)).alias("cramers_v_corrected"),
        F.expr(N.sql_rnd(_CV_T, 6)).alias("tschuprow_t"),
        F.expr(N.sql_rnd(_CV_C, 6)).alias("contingency_c"),
    )
