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

# Exact-cents moment fragments shared by the oracles below (the
# catalog-wide idiom, hardened round 5: 2-decimal value domain sums
# exactly on an integer-cents grid — floor(x*100+0.5), no engine-
# delegated double->DECIMAL tie rounding; see _norm.cents — the closed
# form then evaluates in double bit-identically everywhere).
_CENTS = N.sql_cents("value")
_SUM_DEC = N.sql_sum_cents2("value")
_SUMSQ_DEC = f"(CAST(sum({_CENTS} * {_CENTS}) AS DOUBLE) / 1e4)"


def _moments(df: DataFrame, *keys: str) -> DataFrame:
    """Group ``df`` by ``keys`` -> exact count / Σx / Σx² (double)."""
    c = N.cents("value")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum(c.cast("decimal(38,0)")).cast("double") / F.lit(100.0)).alias("s"),
        (F.sum((c * c).cast("decimal(38,0)")).cast("double") / F.lit(1.0e4)).alias(
            "sq"
        ),
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
    survey_ids=("A3", "A10", "M7-A15b"),
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
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
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
    survey_ids=("W3", "A7", "M7-A16b"),
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
            .orderBy("ts", "event_id")  # event_id tiebreak: keeps the
            # running-sum assignment deterministic under (user_id, ts)
            # ties, matching the gap window and the oracle's sess CTE
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
    survey_ids=("A4", "M7-A17b"),
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
    oracle=f"""
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
       {_SUM_DEC} AS total_value
FROM conv GROUP BY 1""",
    doc="Last-touch conversion attribution: each purchase credits the "
    "user's most recent non-purchase event within a 7-day lookback "
    "(IGNORE-NULLS last_value over the entity ordering), else 'none'. "
    "One exchange on user_id shared by the window; the rollup is a "
    "5-row aggregate. DECIMAL revenue sum keeps the credit ledger "
    "order-free and exact.",
    survey_ids=("W1", "A5", "M7-A18b"),
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
        N.sum_cents2("value").alias("total_value"),
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
    survey_ids=("A11", "F9", "M7-A19b"),
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
    oracle=f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(count(*) AS BIGINT) AS n_events,
       {_SUM_DEC} AS total_value,
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
    survey_ids=("A1", "A9", "M7-L4"),
)
def state_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    partial = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("p_count"),
        F.sum(N.cents("value").cast("decimal(38,0)")).alias("p_sum"),
        F.min("value").alias("p_min"),
        F.max("value").alias("p_max"),
    )
    merged = partial.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("p_count").cast("bigint").alias("n_events"),
        (F.sum("p_sum").cast("double") / F.lit(100.0)).alias("total_value"),
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


_SESS_ITEMS_SQL = """
WITH gaps AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM gaps
), items AS (
  SELECT DISTINCT user_id, session_idx, event_type FROM sess
)"""


@query(
    "assoc_rules",
    oracle=_SESS_ITEMS_SQL
    + """,
tot AS (
  SELECT CAST(count(DISTINCT (user_id, session_idx)) AS DOUBLE) AS n
  FROM items
), singles AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n_one FROM items GROUP BY 1
), pairs AS (
  SELECT a.event_type AS ante, b.event_type AS cons,
         CAST(count(*) AS DOUBLE) AS n_both
  FROM items a
  JOIN items b ON a.user_id = b.user_id AND a.session_idx = b.session_idx
              AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.ante, p.cons,
       CAST(p.n_both AS BIGINT) AS n_sessions_both,
       round(p.n_both / t.n, 4) AS support,
       round(p.n_both / sa.n_one, 4) AS confidence,
       round(p.n_both * t.n / (sa.n_one * sc.n_one), 4) AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.ante
JOIN singles sc ON sc.event_type = p.cons
CROSS JOIN tot t""",
    doc="Association rules over session itemsets (market-basket on the "
    "event stream): 30-min-gap sessions -> distinct event types per "
    "session -> pair support/confidence/lift from exact counts. The "
    "pair self-join keys on the session, so its width is bounded by "
    "the type vocabulary (itemset <= |event types|), never by session "
    "length; singles and the total collapse to broadcast rows.",
    survey_ids=("A5", "A11", "M7-A20b"),
)
def assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts"))
    ).over(w)
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    items = (
        e.withColumn(
            "session_idx",
            F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select("user_id", "session_idx", "event_type")
        .distinct()
    )
    tot = items.select("user_id", "session_idx").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    singles = items.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_one")
    )
    b = items.select(
        "user_id", "session_idx", F.col("event_type").alias("cons")
    )
    pairs = (
        items.withColumnRenamed("event_type", "ante")
        .join(b, ["user_id", "session_idx"])
        .filter(F.col("ante") < F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).cast("double").alias("n_both"))
    )
    sa = F.broadcast(singles.select(F.col("event_type").alias("ante"),
                                    F.col("n_one").alias("n_ante")))
    sc = F.broadcast(singles.select(F.col("event_type").alias("cons"),
                                    F.col("n_one").alias("n_cons")))
    out = pairs.join(sa, "ante").join(sc, "cons").crossJoin(F.broadcast(tot))
    return out.select(
        "ante",
        "cons",
        F.col("n_both").cast("bigint").alias("n_sessions_both"),
        N.rnd(F.col("n_both") / F.col("n")).alias("support"),
        N.rnd(F.col("n_both") / F.col("n_ante")).alias("confidence"),
        N.rnd(
            F.col("n_both") * F.col("n") / (F.col("n_ante") * F.col("n_cons"))
        ).alias("lift"),
    )


_FUNNEL_ORACLE = """
WITH u AS (
  SELECT DISTINCT user_id FROM events
), s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY 1
), s4 AS (
  SELECT e.user_id, min(e.ts) AS t4
  FROM events e JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY 1
), depth AS (
  SELECT u.user_id,
         CASE WHEN t4 IS NOT NULL AND t4 <= t1 + INTERVAL 7 DAY THEN 4
              WHEN t3 IS NOT NULL AND t3 <= t1 + INTERVAL 7 DAY THEN 3
              WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL 7 DAY THEN 2
              WHEN t1 IS NOT NULL THEN 1
              ELSE 0 END AS depth
  FROM u
  LEFT JOIN s1 ON u.user_id = s1.user_id
  LEFT JOIN s2 ON u.user_id = s2.user_id
  LEFT JOIN s3 ON u.user_id = s3.user_id
  LEFT JOIN s4 ON u.user_id = s4.user_id
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_users
FROM depth GROUP BY 1"""


def funnel_user_depths(e: DataFrame) -> DataFrame:
    """Per-user greedy funnel depth over an events-shaped frame (the
    reusable core of ``funnel_depth``; property-tested against a pure-
    Python greedy reference in ``test_property_differential``)."""
    stages = e.filter(
        F.col("event_type").isin("signup", "view", "click", "purchase")
    )
    per_user = stages.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("ts_us"),
                    F.col("event_id").alias("eid"),
                    F.col("event_type").alias("tpe"),
                )
            )
        ).alias("evs")
    )
    zero = F.struct(
        F.lit(None).cast("bigint").alias("t1"),
        F.lit(None).cast("bigint").alias("t2"),
        F.lit(None).cast("bigint").alias("t3"),
        F.lit(None).cast("bigint").alias("t4"),
    )

    def step(acc, x):
        t1 = F.when(
            acc.t1.isNull() & (x.tpe == "signup"), x.ts_us
        ).otherwise(acc.t1)
        t2 = F.when(
            acc.t2.isNull()
            & acc.t1.isNotNull()
            & (x.tpe == "view")
            & (x.ts_us > acc.t1),
            x.ts_us,
        ).otherwise(acc.t2)
        t3 = F.when(
            acc.t3.isNull()
            & acc.t2.isNotNull()
            & (x.tpe == "click")
            & (x.ts_us > acc.t2),
            x.ts_us,
        ).otherwise(acc.t3)
        t4 = F.when(
            acc.t4.isNull()
            & acc.t3.isNotNull()
            & (x.tpe == "purchase")
            & (x.ts_us > acc.t3),
            x.ts_us,
        ).otherwise(acc.t4)
        return F.struct(
            t1.alias("t1"), t2.alias("t2"), t3.alias("t3"), t4.alias("t4")
        )

    chain = per_user.select(
        "user_id", F.aggregate("evs", zero, step).alias("c")
    )
    week_us = 7 * 24 * 3600 * 1_000_000
    within = lambda t: t.isNotNull() & (t <= F.col("c.t1") + week_us)  # noqa: E731
    depth = (
        F.when(within(F.col("c.t4")), 4)
        .when(within(F.col("c.t3")), 3)
        .when(within(F.col("c.t2")), 2)
        .when(F.col("c.t1").isNotNull(), 1)
        .otherwise(0)
    )
    users = e.select("user_id").distinct()
    return users.join(chain, "user_id", "left").select(
        "user_id", F.coalesce(depth, F.lit(0)).alias("depth")
    )


@query(
    "funnel_depth",
    oracle=_FUNNEL_ORACLE,
    doc="Window-funnel depth (the ClickHouse windowFunnel shape the "
    "reference's serving store exposes natively): earliest "
    "signup->view->click->purchase chain per user, each stage strictly "
    "after the previous, depth counted only while within 7 days of the "
    "chain start. Spark side runs the greedy chain as ONE in-plan "
    "aggregate fold over each user's time-sorted stage events — one "
    "exchange, no per-stage re-scans; the oracle unrolls the identical "
    "greedy semantics as cascaded min-after-previous joins. Per-user "
    "state is 4 timestamps; the folded array holds only funnel-stage "
    "events for that user (the same per-entity bound windowFunnel "
    "itself carries).",
    survey_ids=("A11", "W6", "M7-A21b"),
)
def funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return funnel_user_depths(e).groupBy(
        F.col("depth").cast("bigint").alias("depth")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))


@query(
    "distinct_rollup_two_level",
    oracle="""
SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1""",
    doc="Two-level exact distinct rollup: facts first collapse to "
    "(week, user) partial rows, the second level counts rows per week "
    "— attested equal to the oracle's direct count(DISTINCT). The "
    "pattern that makes exact distinct re-aggregable at 100 TB: the "
    "wide exchange carries one row per (week, user), and partial "
    "map-side aggregation dedups within every input partition before "
    "anything shuffles (a direct countDistinct shuffles raw fact rows).",
    survey_ids=("A6", "A7", "M7-A22b"),
)
def distinct_rollup_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    level1 = e.groupBy(
        F.date_trunc("week", "ts").alias("week"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    return level1.groupBy(
        F.date_format("week", "yyyy-MM-dd").alias("week")
    ).agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )


@query(
    "exact_percentile_bands",
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_events,
       round(max(CASE WHEN rn = ceil(0.5 * n) THEN value END), 4) AS p50,
       round(max(CASE WHEN rn = ceil(0.9 * n) THEN value END), 4) AS p90,
       round(max(CASE WHEN rn = ceil(0.99 * n) THEN value END), 4) AS p99
FROM ranked GROUP BY 1""",
    doc="Exact percentile bands by order statistics: row_number over the "
    "(value, event_id) ordering within each event_type picks the "
    "ceil(q*n)-th element — discrete selection, no interpolation, so "
    "the answer is an actual data value and both engines agree "
    "bit-for-bit (percentile_approx's GK sketch is the scale "
    "alternative, audited separately in approx_quantile_audit). One "
    "exchange on the group key; at 100 TB the per-group sort is the "
    "cost, which is exactly what the sketch path trades away.",
    survey_ids=("A3", "A10", "M7-A23b"),
)
def exact_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def band(q: float) -> F.Column:
        return N.rnd(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(q) * F.col("n")),
                    F.col("value"),
                )
            )
        )

    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        band(0.5).alias("p50"),
        band(0.9).alias("p90"),
        band(0.99).alias("p99"),
    )


@query(
    "hopping_window_counts",
    oracle=f"""
WITH hopped AS (
  SELECT user_id, value,
         unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start
  FROM events
)
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       {_SUM_DEC} AS total_value
FROM hopped GROUP BY 1""",
    doc="Hopping-window aggregation in batch (2 h window, 1 h hop — the "
    "batch counterpart of the sliding-window stream in "
    "streaming/pipeline.py, T2 family): F.window(ts, '2 hours', "
    "'1 hour') explodes each event into exactly the windows containing "
    "it (window/hop = 2 copies, a bounded Generate), then one hash "
    "aggregation on the window start. The oracle derives the same two "
    "epoch-aligned starts per event. Overlap factor is fixed at plan "
    "time, so the pre-aggregation blowup is a constant, not data-"
    "dependent.",
    survey_ids=("T2", "A7", "M7-A24b"),
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hopped = e.select(
        "user_id",
        "value",
        F.window("ts", "2 hours", "1 hour").alias("win"),
    )
    return hopped.groupBy(
        N.ts_str(F.col("win.start")).alias("window_start")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        N.sum_cents2("value").alias("total_value"),
    )


@query(
    "period_over_period",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n,
         {_SUM_DEC} AS total
  FROM events GROUP BY 1, 2
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n, total,
       lag(n, 7) OVER w AS n_prev_week,
       CASE WHEN lag(n, 7) OVER w IS NULL OR lag(n, 7) OVER w = 0 THEN NULL
            ELSE round((CAST(n AS DOUBLE) - lag(n, 7) OVER w)
                       / lag(n, 7) OVER w * 100, 4) END AS wow_pct
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day)""",
    doc="Period-over-period comparison (the warehouse WoW readout): "
    "daily counts and DECIMAL revenue per event_type, then a 7-row lag "
    "on the per-type daily aggregate gives week-over-week deltas. The "
    "window runs over the POST-aggregate frame (days x types, tiny at "
    "any corpus size), so the only fact-scale work is one group pass — "
    "the lag never touches raw events. NOTE: a 7-ROW lag equals a "
    "7-DAY lag only on gap-free daily series; the events table is "
    "dense at every SF, and gap_fill_hourly covers the sparse case.",
    survey_ids=("W1", "A7", "F9", "M7-A25b"),
)
def period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        N.sum_cents2("value").alias("total"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("n", 7).over(w)
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        "total",
        prev.alias("n_prev_week"),
        F.when(
            prev.isNull() | (prev == 0), F.lit(None).cast("double")
        )
        .otherwise(
            N.rnd((F.col("n").cast("double") - prev) / prev * 100)
        )
        .alias("wow_pct"),
    )


@query(
    "rolling_distinct_24h",
    oracle="""
WITH uh AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
), contrib AS (
  SELECT user_id,
         unnest(generate_series(h, h + INTERVAL 23 HOUR, INTERVAL 1 HOUR))
           AS win_hour
  FROM uh
), windows AS (
  SELECT win_hour, user_id FROM contrib GROUP BY 1, 2
), active AS (
  SELECT DISTINCT date_trunc('hour', ts) AS h FROM events
)
SELECT strftime(a.h, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(count(*) AS BIGINT) AS users_24h
FROM active a JOIN windows w ON w.win_hour = a.h
GROUP BY 1""",
    doc="Rolling 24-hour distinct users per hour (the DAU-style trailing "
    "uniques curve): distinct (user, hour) pairs each contribute to the "
    "24 window-hours they cover (bounded sequence explode), dedup per "
    "(window-hour, user), count — reported only for hours that exist in "
    "the data. Exact distinct with NO global ordering and NO 24-hour "
    "window state: the explode factor is a constant 24, the dedup is "
    "map-side-combinable, and everything shuffles pre-deduped (user, "
    "hour) pairs, never raw facts. The sketch alternative (HLL merge "
    "over hourly registers) is the approx_distinct_audit family.",
    survey_ids=("A6", "W3", "M7-A26b"),
)
def rolling_distinct_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uh = e.select(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    contrib = uh.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("h"),
                F.col("h") + F.expr("INTERVAL 23 HOURS"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("win_hour"),
    ).distinct()
    active = e.select(F.date_trunc("hour", "ts").alias("h")).distinct()
    return (
        contrib.join(active, contrib.win_hour == active.h)
        .groupBy(N.ts_str("h").alias("hour"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("users_24h"))
    )


@query(
    "key_skew_profile",
    oracle="""
WITH per_key AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
), freq AS (
  SELECT n, CAST(count(*) AS BIGINT) AS keys_at FROM per_key GROUP BY 1
), cum AS (
  SELECT n, keys_at,
         sum(keys_at) OVER (ORDER BY n
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_keys,
         sum(keys_at) OVER () AS k,
         sum(n * keys_at) OVER () AS total_rows
  FROM freq
)
SELECT CAST(max(k) AS BIGINT) AS n_keys,
       CAST(max(total_rows) AS BIGINT) AS n_rows,
       CAST(max(n) AS BIGINT) AS max_rows,
       CAST(min(CASE WHEN cum_keys >= ceil(0.99 * k) THEN n END) AS BIGINT)
         AS p99_rows,
       round(CAST(max(total_rows) AS DOUBLE) / max(k), 4) AS mean_rows,
       round(CAST(max(n) AS DOUBLE)
             / (CAST(max(total_rows) AS DOUBLE) / max(k)), 4) AS skew_ratio
FROM cum""",
    doc="Shuffle-key skew profiler — the diagnostic that DECIDES when the "
    "salted-aggregation guard (salted_hourly_agg, operators/skew.py) is "
    "worth its extra exchange: per-key row counts (one group pass over "
    "facts) collapse further to a count-of-counts frequency table, and "
    "the exact p99 comes from a cumulative sum over DISTINCT count "
    "values — a global window, but over value cardinality (thousands "
    "even at 10^9 keys), never over the keys themselves (ranking every "
    "key would single-partition-sort the key universe). A skew_ratio "
    "near 1 means hash partitions balance; >> 1 flags the hot keys "
    "AQE's skew-join thresholds and manual salting are sized against.",
    survey_ids=("A3", "A10", "M7-K2"),
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    freq = per_key.groupBy("n").agg(
        F.count(F.lit(1)).cast("bigint").alias("keys_at")
    )
    wcum = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = freq.select(
        "n",
        "keys_at",
        F.sum("keys_at").over(wcum).alias("cum_keys"),
        F.sum("keys_at").over(wall).alias("k"),
        F.sum(F.col("n") * F.col("keys_at")).over(wall).alias("total_rows"),
    )
    return cum.agg(
        F.max("k").cast("bigint").alias("n_keys"),
        F.max("total_rows").cast("bigint").alias("n_rows"),
        F.max("n").cast("bigint").alias("max_rows"),
        F.min(
            F.when(
                F.col("cum_keys") >= F.ceil(F.lit(0.99) * F.col("k")),
                F.col("n"),
            )
        )
        .cast("bigint")
        .alias("p99_rows"),
        N.rnd(
            F.max("total_rows").cast("double") / F.max("k")
        ).alias("mean_rows"),
        N.rnd(
            F.max("n").cast("double")
            / (F.max("total_rows").cast("double") / F.max("k"))
        ).alias("skew_ratio"),
    )


@query(
    "salted_join_attested",
    oracle=f"""
WITH dim AS (
  SELECT user_id, sum({_CENTS}) AS user_cents
  FROM events GROUP BY 1
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       (CAST(sum(d.user_cents) AS DOUBLE) / 100) AS joined_value
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY 1""",
    doc="Differential attestation of the salted JOIN (the sibling of "
    "salted_hourly_agg's aggregation guard, operators/joins.py): the "
    "skew-resistant join — fact side salted by a deterministic row "
    "hash, dim side replicated over the 16-bucket salt space via a "
    "broadcast range — must be value-for-value equal to the oracle's "
    "plain join. Proves the manual skew fallback changes the shuffle "
    "layout and nothing else; the rollup keys on event_type so any "
    "lost or duplicated row flips a count or a DECIMAL sum.",
    survey_ids=("M4", "M7-K3"),
)
def salted_join_attested(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.joins import salted_join

    e = load_table(spark, sf_dir, "events")
    dim = e.groupBy("user_id").agg(
        F.sum(N.cents("value").cast("decimal(38,0)")).alias("user_cents")
    )
    joined = salted_join(
        e.select("user_id", "event_type"), dim, key="user_id"
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.sum("user_cents").cast("double") / F.lit(100.0)).alias(
            "joined_value"
        ),
    )


@query(
    "conversion_ci",
    oracle=f"""
WITH assign AS (
  SELECT user_id,
         CASE WHEN ({_NIBBLE.format(pos=1)}) * 16
                   + ({_NIBBLE.format(pos=2)}) < 128
              THEN 'A' ELSE 'B' END AS variant,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT variant,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(converted) AS DOUBLE) AS k
  FROM assign GROUP BY 1
)
SELECT variant,
       CAST(n AS BIGINT) AS n_users,
       CAST(k AS BIGINT) AS n_converted,
       round(k / n, 6) AS rate,
       round((k / n + pow(1.96, 2) / (2 * n)
              - 1.96 * sqrt((k / n) * (1.0 - k / n) / n
                            + pow(1.96, 2) / (4 * n * n)))
             / (1.0 + pow(1.96, 2) / n), 6) AS wilson_lo,
       round((k / n + pow(1.96, 2) / (2 * n)
              + 1.96 * sqrt((k / n) * (1.0 - k / n) / n
                            + pow(1.96, 2) / (4 * n * n)))
             / (1.0 + pow(1.96, 2) / n), 6) AS wilson_hi
FROM agg""",
    doc="Per-variant conversion rate with the Wilson 95% score interval "
    "— the binomial experiment readout next to welch_ttest's continuous "
    "one: users hash-assigned by the shared md5 idiom, converted = any "
    "purchase, then the closed-form Wilson bounds (robust at small n "
    "and extreme rates where the normal approximation lies) evaluate "
    "identically in double on both engines (the center term z^2/(2n) "
    "and radius are spelled with the same operation order on both "
    "sides, so the IEEE arithmetic matches exactly). One entity group "
    "pass, a 2-row aggregate.",
    survey_ids=("A4", "A11", "M7-A29b"),
)
def conversion_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    assign = e.groupBy(
        "user_id",
        F.when(bucket < 128, F.lit("A")).otherwise(F.lit("B")).alias(
            "variant"
        ),
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    agg = assign.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("converted").cast("double").alias("k"),
    )
    z = F.lit(1.96)
    n, k = F.col("n"), F.col("k")
    p = k / n
    center_adj = F.pow(z, 2) / (2 * n)
    rad = z * F.sqrt(p * (F.lit(1.0) - p) / n + F.pow(z, 2) / (4 * n * n))
    denom = F.lit(1.0) + F.pow(z, 2) / n
    return agg.select(
        "variant",
        n.cast("bigint").alias("n_users"),
        k.cast("bigint").alias("n_converted"),
        N.rnd(p, 6).alias("rate"),
        N.rnd((p + center_adj - rad) / denom, 6).alias("wilson_lo"),
        N.rnd((p + center_adj + rad) / denom, 6).alias("wilson_hi"),
    )


@query(
    "ks_drift_by_type",
    oracle="""
WITH tagged AS (
  SELECT event_type, value,
         CASE WHEN date_part('day', ts) <= 15 THEN 1 ELSE 0 END AS early
  FROM events
), per_value AS (
  SELECT event_type, value,
         CAST(sum(early) AS BIGINT) AS n1,
         CAST(sum(1 - early) AS BIGINT) AS n2
  FROM tagged GROUP BY 1, 2
), cum AS (
  SELECT event_type, value,
         sum(n1) OVER (PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
         sum(n2) OVER (PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
         sum(n1) OVER (PARTITION BY event_type) AS t1,
         sum(n2) OVER (PARTITION BY event_type) AS t2
  FROM per_value
)
SELECT event_type,
       CAST(max(t1) AS BIGINT) AS n_early,
       CAST(max(t2) AS BIGINT) AS n_late,
       round(max(abs(CAST(c1 AS DOUBLE) / t1 - CAST(c2 AS DOUBLE) / t2)), 6)
         AS ks_stat,
       round(1.358 * sqrt((CAST(max(t1) AS DOUBLE) + max(t2))
                          / (CAST(max(t1) AS DOUBLE) * max(t2))), 6)
         AS crit_05
FROM cum GROUP BY 1""",
    doc="Exact two-sample Kolmogorov-Smirnov drift test per event type: "
    "first half of the month vs second half. Counts collapse to one "
    "row per (type, DISTINCT value) first, so the ECDF windows run "
    "over the distinct-value frame, partitioned BY TYPE — a per-key "
    "sort, never the global ordering the textbook single-sample "
    "formulation needs. The statistic is max |F1 - F2| over exact "
    "BIGINT cumulative counts; the only float ops are two divisions "
    "and a subtraction of identical integers — bit-identical on every "
    "IEEE engine. drift_psi's binned sibling; this one is exact and "
    "binning-free. crit_05 is the α=0.05 two-sample critical value.",
    survey_ids=("A3", "W3", "M7-A35b"),
)
def ks_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    tagged = e.select(
        "event_type",
        "value",
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("early"),
    )
    per_value = tagged.groupBy("event_type", "value").agg(
        F.sum("early").cast("bigint").alias("n1"),
        F.sum(1 - F.col("early")).cast("bigint").alias("n2"),
    )
    wp = Window.partitionBy("event_type")
    run = wp.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    full = wp.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_value.select(
        "event_type",
        F.sum("n1").over(run).alias("c1"),
        F.sum("n2").over(run).alias("c2"),
        F.sum("n1").over(full).alias("t1"),
        F.sum("n2").over(full).alias("t2"),
    )
    t1d = F.max("t1").cast("double")
    t2d = F.max("t2").cast("double")
    return cum.groupBy("event_type").agg(
        F.max("t1").cast("bigint").alias("n_early"),
        F.max("t2").cast("bigint").alias("n_late"),
        N.rnd(
            F.max(
                F.abs(
                    F.col("c1").cast("double") / F.col("t1")
                    - F.col("c2").cast("double") / F.col("t2")
                )
            ),
            6,
        ).alias("ks_stat"),
        N.rnd(F.lit(1.358) * F.sqrt((t1d + t2d) / (t1d * t2d)), 6).alias(
            "crit_05"
        ),
    )


@query(
    "audience_overlap",
    oracle="""
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), sizes AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       sa.n AS n_a, sb.n AS n_b, p.n_both,
       round(CAST(p.n_both AS DOUBLE) / (sa.n + sb.n - p.n_both), 6)
         AS jaccard
FROM pairs p
JOIN sizes sa ON sa.event_type = p.type_a
JOIN sizes sb ON sb.event_type = p.type_b""",
    doc="Audience-overlap matrix: for every event-type pair, the count "
    "of users doing BOTH and the Jaccard of the two audiences. The "
    "self-join is keyed on user_id, so pair fanout is bounded by each "
    "user's distinct types (≤ the type vocabulary), never by audience "
    "size — the same basket-bounded shape as copurchase_affinity. "
    "Audience sizes come back via broadcast joins (|types| rows). At "
    "10⁹ users this is one user-key exchange over the deduped "
    "(user, type) pairs; the alternative bitmap intersection needs "
    "the same shuffle to build its bitmaps.",
    survey_ids=("A6", "M4", "M7-A36b"),
)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        ut.withColumnRenamed("event_type", "type_a")
        .join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    sa = F.broadcast(
        sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    )
    sb = F.broadcast(
        sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    )
    return (
        pairs.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            N.rnd(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# event_order_inversions (round 7)
# ---------------------------------------------------------------------------

@query(
    "event_order_inversions",
    oracle="""
WITH arr AS (
  SELECT event_type, user_id,
         epoch_us(ts) AS ts_us,
         epoch_us(ts) + 3600000000 * (CAST(('0x' ||
           substring(md5(CAST(event_id AS VARCHAR)), 1, 2)) AS INT) % 8)
           AS arr_us,
         event_id
  FROM events
), lagged AS (
  SELECT event_type, ts_us,
         lag(ts_us) OVER (PARTITION BY user_id
                          ORDER BY arr_us, event_id) AS prev_ts_us
  FROM arr
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN prev_ts_us > ts_us THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       round(CAST(sum(CASE WHEN prev_ts_us > ts_us THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS late_share,
       CAST(coalesce(max(CASE WHEN prev_ts_us > ts_us
                              THEN prev_ts_us - ts_us END), 0) AS BIGINT)
         AS max_lateness_us,
       round(CAST(sum(CASE WHEN prev_ts_us > ts_us
                           THEN prev_ts_us - ts_us ELSE 0 END) AS DOUBLE)
             / greatest(1, sum(CASE WHEN prev_ts_us > ts_us
                                    THEN 1 ELSE 0 END)), 4)
         AS avg_lateness_us
FROM lagged GROUP BY event_type""",
    doc="Event-time out-of-orderness profile — the measurement that "
    "SIZES a streaming watermark (T1's delay threshold is exactly "
    "'max tolerated lateness'; picking it without this profile is "
    "guessing). The fixture arrives perfectly ordered, so a "
    "deterministic md5-derived delivery delay of 0-7 HOURS is added "
    "in-query to form the ARRIVAL order — hour-scale, matching the fixture's hour-scale inter-event gaps, so real inversions exist at every SF (the csv_malformed_audit "
    "seeding discipline — oracle-replayable, non-vacuous at every "
    "SF); events are then walked per user in (arrival, event_id) "
    "order and every event-time regression against the previous "
    "arrival is counted, with max and mean lateness in exact integer "
    "microseconds. Plan: one per-user window over the facts, one "
    "#types-row aggregate; lateness stays integer so the shares are "
    "identical doubles cross-engine.",
    survey_ids=("M7-A67",),
)
def event_order_inversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    jit = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 2), 16, 10)
        .cast("int")
        % 8
    )
    arr = e.select(
        "event_type",
        "user_id",
        ts_us.alias("ts_us"),
        (ts_us + F.lit(3_600_000_000) * jit).alias("arr_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("arr_us", "event_id")
    lagged = arr.select(
        "event_type",
        "ts_us",
        F.lag("ts_us").over(w).alias("prev_ts_us"),
    )
    late = F.col("prev_ts_us") > F.col("ts_us")
    lateness = F.col("prev_ts_us") - F.col("ts_us")
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(late.cast("int")).cast("bigint").alias("n_late"),
        N.rnd(
            F.sum(late.cast("int")).cast("double") / F.count(F.lit(1)), 6
        ).alias("late_share"),
        F.coalesce(F.max(F.when(late, lateness)), F.lit(0))
        .cast("bigint")
        .alias("max_lateness_us"),
        N.rnd(
            F.sum(F.when(late, lateness).otherwise(F.lit(0))).cast("double")
            / F.greatest(F.lit(1), F.sum(late.cast("int"))),
            4,
        ).alias("avg_lateness_us"),
    )


# ---------------------------------------------------------------------------
# item_cooccurrence_recs (round 8, fifth wave) — item-item collaborative
# filtering from user co-occurrence (Sarwar et al. 2001 / Linden et al.
# 2003 "people who touched X also touched Y"), cosine-normalized
# ---------------------------------------------------------------------------

_CO_MAX_BASKET = 50  # hyper-user degree cap: a user interacting with
# everything carries no signal and costs O(degree²) pairs (the DIMSUM /
# Linden engineering guard); mirrored in the oracle so the cap is part
# of the attested semantics.
_CO_TOPK = 3


@query(
    "item_cooccurrence_recs",
    oracle=f"""
WITH items AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events WHERE props IS NOT NULL
), deg AS (
  SELECT user_id FROM items GROUP BY user_id
  HAVING count(*) <= {_CO_MAX_BASKET}
), kept AS MATERIALIZED (
  SELECT items.user_id, items.k FROM items JOIN deg USING (user_id)
), cnt AS (
  SELECT k, CAST(count(*) AS BIGINT) AS nu FROM kept GROUP BY k
), cooc AS (
  SELECT a.k AS ka, b.k AS kb, CAST(count(*) AS BIGINT) AS c
  FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.k < b.k
  GROUP BY 1, 2
), sym AS (
  SELECT ka AS item, kb AS rec_item, c FROM cooc
  UNION ALL
  SELECT kb AS item, ka AS rec_item, c FROM cooc
), scored AS (
  SELECT sym.item, sym.rec_item, sym.c,
         {N.sql_cents("sym.c / sqrt((1.0e0 * ca.nu) * cb.nu)", 10**6)}
           AS cos6
  FROM sym
  JOIN cnt ca ON ca.k = sym.item
  JOIN cnt cb ON cb.k = sym.rec_item
), ranked AS (
  SELECT item, rec_item, c, cos6,
         row_number() OVER (PARTITION BY item
                            ORDER BY cos6 DESC, c DESC, rec_item)
           AS rk
  FROM scored
)
SELECT CAST(item AS BIGINT) AS item,
       CAST(rec_item AS BIGINT) AS rec_item,
       c AS cooc,
       round(cos6 / 1e6, 6) AS cosine,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_CO_TOPK}""",
    doc="Item-item collaborative-filtering recommendations from the "
    "events stream: items are the props.k product ids, a user's basket "
    "is their DISTINCT item set, co-occurrence counts come from the "
    "per-user pair expansion (k_a < k_b once, mirrored symmetric "
    f"after), cosine = c/√(n_a·n_b), top-{_CO_TOPK} per item by the "
    "1e-6-snapped cosine with count/id tie-breaks so ranks are exact "
    f"integer comparisons. Hyper-users (> {_CO_MAX_BASKET} distinct "
    "items) are dropped BEFORE pairing — the degree cap that keeps the "
    "pair expansion O(n·cap²) instead of quadratic in the hottest "
    "user (the DIMSUM/Amazon guard), mirrored in the oracle. Scale: "
    "facts collapse to distinct (user, item) once; the co-occurrence "
    "matrix is item-vocabulary-bounded and the top-k window runs on "
    "it, never on facts — the 100 TB cost is one distinct pass plus "
    "a capped self-join.",
    survey_ids=("M7-B24",),
)
def item_cooccurrence_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    items = (
        e.filter(F.col("props").isNotNull())
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .distinct()
    )
    deg = items.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("_deg")
    ).filter(F.col("_deg") <= _CO_MAX_BASKET).select("user_id")
    kept = items.join(deg, "user_id")
    cnt = kept.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("nu"))
    a = kept.select("user_id", F.col("k").alias("ka"))
    b = kept.select("user_id", F.col("k").alias("kb"))
    cooc = (
        a.join(b, "user_id")
        .filter(F.col("ka") < F.col("kb"))
        .groupBy("ka", "kb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    sym = cooc.select(
        F.col("ka").alias("item"), F.col("kb").alias("rec_item"), "c"
    ).unionAll(
        cooc.select(
            F.col("kb").alias("item"), F.col("ka").alias("rec_item"), "c"
        )
    )
    scored = (
        sym.join(
            F.broadcast(cnt.select(F.col("k").alias("item"),
                                   F.col("nu").alias("_na"))),
            "item",
        )
        .join(
            F.broadcast(cnt.select(F.col("k").alias("rec_item"),
                                   F.col("nu").alias("_nb"))),
            "rec_item",
        )
        .select(
            "item",
            "rec_item",
            "c",
            F.expr(
                N.sql_cents("c / sqrt((1.0e0 * _na) * _nb)", 10**6)
            ).alias("cos6"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("cos6"), F.desc("c"), F.asc("rec_item")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CO_TOPK)
        .select(
            F.col("item").cast("bigint").alias("item"),
            F.col("rec_item").cast("bigint").alias("rec_item"),
            F.col("c").alias("cooc"),
            N.rnd(F.col("cos6") / 1e6, 6).alias("cosine"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# user_sequence_anomaly (round 8, sixth wave) — per-user behavioral
# anomaly score: mean negative log-likelihood of the user's event-type
# transitions under the corpus Markov chain (the sequence-model lens on
# "which users behave unlike everyone else")
# ---------------------------------------------------------------------------

_SEQ_TOPK = 20

# Laplace-smoothed transition probability over the exact integer counts
# (c_ab, c_a) and the type-cardinality scalar tt.
_SEQ_NLL = "(-ln((c_ab + 1) / (1.0e0 * (c_a + tt))))"


@query(
    "user_sequence_anomaly",
    oracle=f"""
WITH tr AS MATERIALIZED (
  SELECT user_id, prev, event_type AS cur FROM (
    SELECT user_id, event_type,
           lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events)
  WHERE prev IS NOT NULL
), cab AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_ab
  FROM tr GROUP BY 1, 2
), ca AS (
  SELECT prev, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY prev
), tcnt AS (
  SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS tt FROM events
), peru AS (
  SELECT tr.user_id,
         CAST(count(*) AS BIGINT) AS n_transitions,
         sum({N.sql_cents(_SEQ_NLL, 10**9)}) AS s9
  FROM tr
  JOIN cab ON tr.prev = cab.prev AND tr.cur = cab.cur
  JOIN ca ON tr.prev = ca.prev
  CROSS JOIN tcnt
  GROUP BY tr.user_id
), ranked AS (
  SELECT user_id, n_transitions, s9,
         row_number() OVER (
           ORDER BY s9 * 1.0e0 / n_transitions DESC, user_id) AS rk
  FROM peru
)
SELECT CAST(rk AS BIGINT) AS rk,
       CAST(user_id AS BIGINT) AS user_id,
       n_transitions,
       {N.sql_rnd("CAST(s9 AS DOUBLE) / 1e9 / n_transitions", 6)}
         AS mean_nll
FROM ranked WHERE rk <= {_SEQ_TOPK}""",
    doc="Per-user sequence-anomaly scoring: each user's event stream is "
    "reduced to (prev → cur) type transitions (lag window per user, "
    "deterministic ts/event_id order), the corpus-level Markov chain "
    "is estimated with Laplace smoothing P(b|a) = (c_ab+1)/(c_a+T), "
    "and the user's anomaly score is the mean NLL of their own "
    f"transitions under it; top-{_SEQ_TOPK} most anomalous users "
    "reported. Per-transition NLL is snapped to the 1e-9 grid and "
    "integer-summed; the ranking compares the exact integer sum over "
    "the integer count. Plan: one user-partitioned lag window, then "
    "everything joins against the types²-bounded broadcast transition "
    "matrix; the top-k cut is a TakeOrdered over users — facts "
    "shuffle once, at 100 TB unchanged.",
    survey_ids=("M7-B25",),
)
def user_sequence_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.select(
            "user_id",
            F.col("event_type").alias("cur"),
            F.lag("event_type").over(wlag).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
    )
    cab = tr.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ab")
    )
    ca = cab.groupBy("prev").agg(F.sum("c_ab").cast("bigint").alias("c_a"))
    tcnt = e.agg(
        F.countDistinct("event_type").cast("bigint").alias("tt")
    )
    peru = (
        tr.join(F.broadcast(cab), ["prev", "cur"])
        .join(F.broadcast(ca), "prev")
        .crossJoin(F.broadcast(tcnt))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.sum(F.expr(N.sql_cents(_SEQ_NLL, 10**9))).alias("s9"),
        )
    )
    ranked = peru.select(
        "user_id",
        "n_transitions",
        "s9",
        F.row_number()
        .over(
            Window.orderBy(
                F.expr("s9 * 1.0e0 / n_transitions").desc(), "user_id"
            )
        )
        .cast("bigint")
        .alias("rk"),
    )
    return ranked.filter(F.col("rk") <= _SEQ_TOPK).select(
        "rk",
        F.col("user_id").cast("bigint").alias("user_id"),
        "n_transitions",
        F.expr(
            N.sql_rnd("CAST(s9 AS DOUBLE) / 1e9 / n_transitions", 6)
        ).alias("mean_nll"),
    )


# ---------------------------------------------------------------------------
# markov_backtest (round 8, sixth wave) — temporal backtest of the
# Markov next-event predictor: train the transition matrix on the first
# weeks, measure top-1 next-type accuracy on the held-out tail (the
# time-split evaluation discipline applied to the sequence model)
# ---------------------------------------------------------------------------

_MB_SPLIT = "2024-01-24 00:00:00"


@query(
    "markov_backtest",
    oracle=f"""
WITH tr AS MATERIALIZED (
  SELECT user_id, prev, event_type AS cur, ts FROM (
    SELECT user_id, event_type, ts,
           lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events)
  WHERE prev IS NOT NULL
), train AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c
  FROM tr WHERE ts < TIMESTAMP '{_MB_SPLIT}' GROUP BY 1, 2
), pred AS (
  SELECT prev, cur AS pred_next FROM (
    SELECT prev, cur,
           row_number() OVER (
             PARTITION BY prev ORDER BY c DESC, cur) AS rk
    FROM train) WHERE rk = 1
), gmaj AS (
  SELECT cur AS maj FROM (
    SELECT cur, sum(c) AS s FROM train GROUP BY cur
    ORDER BY s DESC, cur LIMIT 1)
), test AS (
  SELECT prev, cur FROM tr WHERE ts >= TIMESTAMP '{_MB_SPLIT}'
), scored AS (
  SELECT test.prev, test.cur,
         CASE WHEN test.cur = coalesce(pred.pred_next, gmaj.maj)
              THEN 1 ELSE 0 END AS hit,
         CASE WHEN test.cur = gmaj.maj THEN 1 ELSE 0 END AS bhit
  FROM test LEFT JOIN pred ON test.prev = pred.prev CROSS JOIN gmaj
), per AS (
  SELECT prev AS scope,
         CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(hit) AS BIGINT) AS n_correct,
         CAST(sum(bhit) AS BIGINT) AS n_baseline
  FROM scored GROUP BY prev
  UNION ALL
  SELECT 'ALL', CAST(count(*) AS BIGINT), CAST(sum(hit) AS BIGINT),
         CAST(sum(bhit) AS BIGINT)
  FROM scored
)
SELECT scope, n_test, n_correct,
       {N.sql_rnd("CAST(n_correct AS DOUBLE) / n_test", 6)} AS top1_acc,
       {N.sql_rnd("CAST(n_baseline AS DOUBLE) / n_test", 6)}
         AS baseline_acc
FROM per""",
    doc="Temporal backtest of the Markov next-event predictor: the "
    f"transition matrix trains on transitions before {_MB_SPLIT} and "
    "predicts argmax_b c(a,b) (count-desc, type-asc tie-break — an "
    "exact integer decision) for each held-out transition after it; "
    "unseen contexts fall back to the global majority next type. "
    "Reports per-context and overall top-1 accuracy against the "
    "always-predict-majority baseline — the lift readout that tells "
    "you whether sequence context carries signal at all. Plan: one "
    "user-partitioned lag window; train/test split is a predicate on "
    "the same frame; the model is a types²-bounded broadcast and the "
    "readout one aggregate — facts shuffle once at any scale.",
    survey_ids=("M7-B26",),
)
def markov_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.select(
            "user_id",
            F.col("event_type").alias("cur"),
            "ts",
            F.lag("event_type").over(wlag).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
    )
    split = F.lit(_MB_SPLIT).cast("timestamp")
    train = (
        tr.filter(F.col("ts") < split)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pred = (
        train.select(
            "prev",
            F.col("cur").alias("pred_next"),
            F.row_number()
            .over(
                Window.partitionBy("prev").orderBy(F.desc("c"), "cur")
            )
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    gmaj = (
        train.groupBy("cur")
        .agg(F.sum("c").alias("s"))
        .orderBy(F.desc("s"), "cur")
        .limit(1)
        .select(F.col("cur").alias("maj"))
    )
    test = tr.filter(F.col("ts") >= split).select("prev", "cur")
    scored = (
        test.join(F.broadcast(pred), "prev", "left")
        .crossJoin(F.broadcast(gmaj))
        .select(
            "prev",
            (
                F.col("cur")
                == F.coalesce("pred_next", "maj")
            ).cast("int").alias("hit"),
            (F.col("cur") == F.col("maj")).cast("int").alias("bhit"),
        )
    )
    per = scored.groupBy(F.col("prev").alias("scope")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum("hit").cast("bigint").alias("n_correct"),
        F.sum("bhit").cast("bigint").alias("n_baseline"),
    ).unionAll(
        scored.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum("hit").cast("bigint").alias("n_correct"),
            F.sum("bhit").cast("bigint").alias("n_baseline"),
        ).select(
            F.lit("ALL").alias("scope"), "n_test", "n_correct", "n_baseline"
        )
    )
    return per.select(
        "scope",
        "n_test",
        "n_correct",
        F.expr(N.sql_rnd("CAST(n_correct AS DOUBLE) / n_test", 6)).alias(
            "top1_acc"
        ),
        F.expr(
            N.sql_rnd("CAST(n_baseline AS DOUBLE) / n_test", 6)
        ).alias("baseline_acc"),
    )


# ---------------------------------------------------------------------------
# rec_coverage_audit (round 8, eighth wave) — catalog coverage and
# exposure concentration of the item_cooccurrence_recs output (the
# RecSys aggregate-diversity audit: a recommender that only ever shows
# 10 popular items has high accuracy and no catalog value)
# ---------------------------------------------------------------------------

# Gini over the per-item exposure counts (rank-weighted exact integer
# form on the ascending-sorted counts): (2*sum(i*c_i))/(n*T) - (n+1)/n
_RCA_GINI = (
    "((2.0e0 * swc) / (1.0e0 * nrec * t) - (nrec + 1.0e0) / nrec)"
)


def _rca_oracle() -> str:
    from project_bigdata_spark.plans.catalog import QUERIES

    recs = QUERIES["item_cooccurrence_recs"].oracle
    return f"""
WITH recs AS MATERIALIZED (
  SELECT * FROM ({recs})
), catalog AS (
  SELECT CAST(count(DISTINCT CAST(json_extract_string(props, '$.k')
              AS INT)) AS BIGINT) AS n_catalog
  FROM events WHERE props IS NOT NULL
), expo AS (
  SELECT rec_item, CAST(count(*) AS BIGINT) AS c FROM recs GROUP BY 1
), ranked AS (
  SELECT c, CAST(row_number() OVER (ORDER BY c, rec_item) AS BIGINT)
           AS i
  FROM expo
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS nrec,
         CAST(sum(c) AS BIGINT) AS t,
         CAST(sum(i * c) AS BIGINT) AS swc,
         CAST(max(c) AS BIGINT) AS max_expo
  FROM ranked
)
SELECT catalog.n_catalog AS catalog_items,
       g.nrec AS recommended_items,
       g.t AS n_rec_rows,
       {N.sql_rnd("(1.0e0 * nrec) / n_catalog", 6)} AS coverage,
       {N.sql_rnd(_RCA_GINI, 6)} AS exposure_gini,
       g.max_expo AS max_exposure
FROM g CROSS JOIN catalog"""


@query(
    "rec_coverage_audit",
    oracle=_rca_oracle(),
    doc="Aggregate-diversity audit of the co-occurrence recommender "
    "(Adomavicius & Kwon 2012's coverage lens): catalog coverage = "
    "distinct items that appear in anyone's top-3 over the full item "
    "catalog, and the exposure Gini over per-item recommendation "
    "counts (0 = every recommended item shown equally, →1 = exposure "
    "concentrated on a few popular items — the popularity-bias "
    "failure accuracy metrics can't see). Reuses the attested "
    "item_cooccurrence_recs plan verbatim; the Gini uses the exact "
    "integer rank-weighted form on the deterministically tie-broken "
    "ascending counts. Plan: the recs plan + one vocabulary-bounded "
    "exposure aggregate + a rank window over ≤|items| rows — audit "
    "cost is catalog-sized, never fact-sized.",
    survey_ids=("M7-B27",),
)
def rec_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.plans.catalog import QUERIES

    recs = QUERIES["item_cooccurrence_recs"].builder(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    catalog = (
        e.filter(F.col("props").isNotNull())
        .agg(
            F.countDistinct(
                F.get_json_object("props", "$.k").cast("int")
            ).cast("bigint").alias("n_catalog")
        )
    )
    expo = recs.groupBy("rec_item").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ranked = expo.select(
        "c",
        F.row_number()
        .over(Window.orderBy("c", "rec_item"))
        .cast("bigint")
        .alias("i"),
    )
    g = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("nrec"),
        F.sum("c").cast("bigint").alias("t"),
        F.sum(F.col("i") * F.col("c")).cast("bigint").alias("swc"),
        F.max("c").cast("bigint").alias("max_expo"),
    )
    return g.crossJoin(F.broadcast(catalog)).select(
        F.col("n_catalog").alias("catalog_items"),
        F.col("nrec").alias("recommended_items"),
        F.col("t").alias("n_rec_rows"),
        F.expr(N.sql_rnd("(1.0e0 * nrec) / n_catalog", 6)).alias(
            "coverage"
        ),
        F.expr(N.sql_rnd(_RCA_GINI, 6)).alias("exposure_gini"),
        F.col("max_expo").alias("max_exposure"),
    )
