"""Behavioral-analytics catalog entries: seasonal anomaly screening,
session concurrency curves, hash-variant A/B testing (Welch's t), last-
touch conversion attribution, time-to-conversion, and a mergeable
partial-aggregate state audit.

The reference's serving layer stops at static hourly rollups
(``spark/batch_processor.py:95-123``); these queries cover the next
analytical layer the same event stream feeds in production — behavioral
baselines, experiment readouts, and attribution — expressed as
single-exchange Spark plans with exact-DECIMAL statistics so every entry
carries a bit-reproducible DuckDB oracle.

Scale notes (100 TB): every query scans the fact table once. Baseline /
threshold statistics collapse to a few-hundred-row aggregate that joins
back via broadcast; per-entity work rides ONE hash exchange on the
entity key; nothing collects to the driver and no window runs over a
global (unpartitioned) ordering except on post-aggregate frames that are
already small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table

# Exact-DECIMAL moment fragments shared by the oracles below (the
# catalog-wide idiom: 2-decimal value domain sums exactly in DECIMAL,
# the closed form then evaluates in double bit-identically everywhere).
_SUM_DEC = "CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)"
_SUMSQ_DEC = (
    "CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))"
    " AS DECIMAL(28,4))) AS DOUBLE)"
)


def _moments(df: DataFrame, *keys: str) -> DataFrame:
    """Group ``df`` by ``keys`` -> exact count / Σx / Σx² (double)."""
    dec = F.col("value").cast("decimal(12,2)")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum((dec * dec).cast("decimal(28,4)")).cast("double").alias("sq"),
    )


def _mean_var(n: F.Column, s: F.Column, sq: F.Column) -> tuple[F.Column, F.Column]:
    """Sample mean/variance from exact moments (double closed form)."""
    mean = s / n
    var = F.greatest((sq - s * s / n) / (n - F.lit(1.0)), F.lit(0.0))
    return mean, var


@query(
    "seasonal_anomaly",
    oracle=f"""
WITH base AS (
  SELECT event_type, dayofweek(ts) AS dow,
         CAST(count(*) AS DOUBLE) AS n, {_SUM_DEC} AS s, {_SUMSQ_DEC} AS sq
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, dow, n, s / n AS mean,
         CASE WHEN n <= 1 THEN NULL
              ELSE sqrt(greatest((sq - s * s / n) / (n - 1.0), 0.0)) END AS std
  FROM base
)
SELECT s.event_type, CAST(s.dow AS BIGINT) AS dow,
       CAST(s.n AS BIGINT) AS n_events,
       round(s.mean, 4) AS mean_value,
       round(s.std, 4) AS std_value,
       CAST(coalesce(sum(CASE WHEN s.std IS NOT NULL AND s.std > 0
                  AND abs(e.value - s.mean) > 2.0 * s.std THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_anomalies
FROM stats s
JOIN events e ON e.event_type = s.event_type AND dayofweek(e.ts) = s.dow
GROUP BY 1, 2, 3, 4, 5""",
    doc="Seasonal anomaly screen: per (event_type, day-of-week) baseline "
    "mean/std from exact DECIMAL moments, then a second fact pass counts "
    "events beyond 2 sigma of their own bucket's baseline. The baseline "
    "is a ~35-row aggregate broadcast back onto the facts — two scans, "
    "one tiny broadcast, no window; the monitoring shape for the "
    "reference's hourly telemetry (spark/batch_processor.py:95-123) "
    "that a static threshold cannot express.",
    survey_ids=("A3", "A10", "M7"),
)
def seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # Spark dayofweek is 1-based Sunday; the oracle's DuckDB dayofweek is
    # 0-based Sunday — align here so the grouping key is engine-neutral.
    e = e.withColumn("dow", (F.dayofweek("ts") - F.lit(1)).cast("int"))
    base = _moments(e, "event_type", "dow")
    mean, var = _mean_var(F.col("n"), F.col("s"), F.col("sq"))
    stats = base.select(
        "event_type",
        "dow",
        "n",
        mean.alias("mean"),
        F.when(F.col("n") <= 1, F.lit(None).cast("double"))
        .otherwise(F.sqrt(var))
        .alias("std"),
    )
    flagged = e.join(F.broadcast(stats), ["event_type", "dow"])
    anomaly = (
        F.col("std").isNotNull()
        & (F.col("std") > 0)
        & (F.abs(F.col("value") - F.col("mean")) > 2.0 * F.col("std"))
    )
    return flagged.groupBy(
        "event_type",
        F.col("dow").cast("bigint").alias("dow"),
        F.col("n").cast("bigint").alias("n_events"),
        N.rnd("mean").alias("mean_value"),
        N.rnd("std").alias("std_value"),
    ).agg(
        F.coalesce(
            F.sum(anomaly.cast("int")), F.lit(0)
        ).cast("bigint").alias("n_anomalies")
    )


@query(
    "concurrency_curve",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx,
         ts
  FROM gaps
), spans AS (
  SELECT user_id, session_idx, min(ts) AS s, max(ts) AS e
  FROM sess GROUP BY 1, 2
), hours AS (
  SELECT user_id, session_idx,
         unnest(generate_series(date_trunc('hour', s),
                                date_trunc('hour', e),
                                INTERVAL 1 HOUR)) AS hour
  FROM spans
)
SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(count(*) AS BIGINT) AS n_active_sessions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
FROM hours GROUP BY 1""",
    doc="Session concurrency curve: 30-min-gap sessions -> [start,end] "
    "spans -> each span explodes to the hour grid it touches "
    "(F.sequence, bounded by session length) -> active sessions + "
    "distinct users per hour. The explode replaces the textbook "
    "sweep-line prefix sum, which needs a GLOBAL time ordering — a "
    "single-partition window at 100 TB; here concurrency is recovered "
    "with one entity-key exchange plus a linear, bounded explode.",
    survey_ids=("W3", "A7", "M7"),
)
def concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts"))
    ).over(w)
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = e.withColumn(
        "session_idx",
        F.sum(new_session).over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = sess.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    hours = spans.select(
        "user_id",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s"),
                F.date_trunc("hour", "e"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour"),
    )
    return hours.groupBy(N.ts_str("hour").alias("hour")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_sessions"),
        F.count_distinct("user_id").cast("bigint").alias("n_active_users"),
    )


_NIBBLE = (
    "strpos('0123456789abcdef',"
    " substring(md5(CAST(user_id AS VARCHAR)), {pos}, 1)) - 1"
)


@query(
    "welch_ttest",
    oracle=f"""
WITH assign AS (
  SELECT CASE WHEN ({_NIBBLE.format(pos=1)}) * 16
                   + ({_NIBBLE.format(pos=2)}) < 128
              THEN 'A' ELSE 'B' END AS variant,
         value
  FROM events
), m AS (
  SELECT variant, CAST(count(*) AS DOUBLE) AS n,
         {_SUM_DEC} AS s, {_SUMSQ_DEC} AS sq
  FROM assign GROUP BY 1
), v AS (
  SELECT variant, n, s / n AS mean,
         greatest((sq - s * s / n) / (n - 1.0), 0.0) AS var
  FROM m
), w AS (
  SELECT max(CASE WHEN variant = 'A' THEN n END) AS na,
         max(CASE WHEN variant = 'B' THEN n END) AS nb,
         max(CASE WHEN variant = 'A' THEN mean END) AS ma,
         max(CASE WHEN variant = 'B' THEN mean END) AS mb,
         max(CASE WHEN variant = 'A' THEN var END) AS va,
         max(CASE WHEN variant = 'B' THEN var END) AS vb
  FROM v
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
       round((ma - mb) / sqrt(va / na + vb / nb), 4) AS t_stat,
       round(pow(va / na + vb / nb, 2)
             / (pow(va / na, 2) / (na - 1.0)
                + pow(vb / nb, 2) / (nb - 1.0)), 4) AS welch_df
FROM w""",
    doc="A/B experiment readout: users hash-assigned to two variants by "
    "the md5-bucket idiom (deterministic, ingest-order-free — the same "
    "assignment every engine derives), then Welch's unequal-variance t "
    "and Welch-Satterthwaite df from exact DECIMAL moments. One fact "
    "scan, a 2-row aggregate, closed form in double — the experiment "
    "analysis the chi-square screen (chi_square_independence) covers "
    "for categorical outcomes, here for the continuous metric.",
    survey_ids=("A4", "M7"),
)
def welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    assign = e.withColumn(
        "variant", F.when(bucket < 128, F.lit("A")).otherwise(F.lit("B"))
    )
    m = _moments(assign, "variant")
    mean, var = _mean_var(F.col("n"), F.col("s"), F.col("sq"))
    v = m.select("variant", "n", mean.alias("mean"), var.alias("var"))

    def pick(col: str, variant: str) -> F.Column:
        return F.max(F.when(F.col("variant") == variant, F.col(col)))

    w = v.agg(
        pick("n", "A").alias("na"),
        pick("n", "B").alias("nb"),
        pick("mean", "A").alias("ma"),
        pick("mean", "B").alias("mb"),
        pick("var", "A").alias("va"),
        pick("var", "B").alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    t = (F.col("ma") - F.col("mb")) / F.sqrt(se2)
    df = F.pow(se2, 2) / (
        F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1.0)
        + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1.0)
    )
    return w.select(
        N.big("na").alias("n_a"),
        N.big("nb").alias("n_b"),
        N.rnd("ma").alias("mean_a"),
        N.rnd("mb").alias("mean_b"),
        N.rnd(t).alias("t_stat"),
        N.rnd(df).alias("welch_df"),
    )


@query(
    "touch_attribution",
    oracle="""
WITH touched AS (
  SELECT event_type, value, ts,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER w AS touch_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                    IGNORE NULLS)
           OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), conv AS (
  SELECT CASE WHEN touch_ts IS NULL
                   OR ts - touch_ts > INTERVAL 7 DAY THEN 'none'
              ELSE touch_type END AS touch_type,
         value
  FROM touched WHERE event_type = 'purchase'
)
SELECT touch_type,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2))
         AS total_value
FROM conv GROUP BY 1""",
    doc="Last-touch conversion attribution: each purchase credits the "
    "user's most recent non-purchase event within a 7-day lookback "
    "(IGNORE-NULLS last_value over the entity ordering), else 'none'. "
    "One exchange on user_id shared by the window; the rollup is a "
    "5-row aggregate. DECIMAL revenue sum keeps the credit ledger "
    "order-free and exact.",
    survey_ids=("W1", "A5", "M7"),
)
def touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    touched = e.select(
        "event_type",
        "value",
        "ts",
        F.last(F.when(non_purchase, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(non_purchase, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    seven_days_us = 7 * 24 * 3600 * 1_000_000
    conv = touched.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_ts").isNull()
            | (
                F.unix_micros("ts") - F.unix_micros("touch_ts")
                > seven_days_us
            ),
            F.lit("none"),
        )
        .otherwise(F.col("touch_type"))
        .alias("touch_type"),
        "value",
    )
    return conv.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.sum(F.col("value").cast("decimal(12,2)"))
        .cast("decimal(38,2)")
        .alias("total_value"),
    )


@query(
    "time_to_conversion",
    oracle="""
WITH signup AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY 1
), conv AS (
  SELECT s.user_id, s.signup_ts, min(e.ts) AS first_purchase_ts
  FROM signup s
  JOIN events e ON e.user_id = s.user_id
               AND e.event_type = 'purchase' AND e.ts > s.signup_ts
  GROUP BY 1, 2
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
       strftime(first_purchase_ts, '%Y-%m-%d %H:%M:%S')
         AS first_purchase_ts,
       CAST(date_sub('minute', signup_ts, first_purchase_ts) AS BIGINT)
         AS minutes_to_convert
FROM conv""",
    doc="Time-to-conversion funnel metric: first signup per user joined "
    "to the first strictly-later purchase; whole-minute latency from "
    "the µs difference (integer div — float division would round "
    "differently across engines). The signup side collapses to one row "
    "per converting user and broadcasts; the fact table is scanned "
    "once per side with the event_type filter pushed to parquet.",
    survey_ids=("A11", "F9", "M7"),
)
def time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(signup), "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    minutes = (
        F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts")
    ) / F.lit(60_000_000)
    return conv.select(
        N.big("user_id").alias("user_id"),
        N.ts_str("signup_ts").alias("signup_ts"),
        N.ts_str("first_purchase_ts").alias("first_purchase_ts"),
        F.floor(minutes).cast("bigint").alias("minutes_to_convert"),
    )


@query(
    "state_merge_audit",
    oracle="""
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2))
         AS total_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value
FROM events GROUP BY 1""",
    doc="Mergeable partial-aggregate state audit — the incremental-view-"
    "maintenance shape: facts first collapse to per-(user, day) partial "
    "states (count / DECIMAL sum / min / max), which then MERGE to the "
    "per-user total. The oracle aggregates the raw facts directly, so "
    "driver attestation proves merge(partials) == direct — the property "
    "that lets a 100 TB pipeline maintain daily states and re-aggregate "
    "only merged state instead of re-scanning history on every refresh.",
    survey_ids=("A1", "A9", "M7"),
)
def state_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    partial = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("p_count"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("p_sum"),
        F.min("value").alias("p_min"),
        F.max("value").alias("p_max"),
    )
    merged = partial.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("p_count").cast("bigint").alias("n_events"),
        F.sum("p_sum").cast("decimal(38,2)").alias("total_value"),
        F.min("p_min").alias("min_value"),
        F.max("p_max").alias("max_value"),
    )
    return merged.select(
        N.big("user_id").alias("user_id"),
        "n_days",
        "n_events",
        "total_value",
        N.rnd("min_value").alias("min_value"),
        N.rnd("max_value").alias("max_value"),
    )
