"""Feature-engine catalog entries (SURVEY.md §2.5, §2.7 F4/F7; build-plan M5).

The reference's 22-feature pandas frame (ML_TRAINING.md:57-199) re-expressed
as Spark Window ops over ``events``, each differentially tested against
DuckDB window SQL. Ordering inside every window is made total with an
``event_id`` tiebreak so both engines see identical frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.operators import asof as ASOF
from project_bigdata_spark.operators import features as FE
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table


@query(
    "time_features",
    oracle="""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(isodow(ts) - 1 AS BIGINT) AS day_of_week,
       CAST(month(ts) AS BIGINT) AS month,
       CAST(dayofyear(ts) AS BIGINT) AS day_of_year,
       CAST(CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END AS BIGINT) AS is_weekend
FROM events""",
    doc="F4: the 5 time features with pandas day-of-week semantics "
    "(Mon=0; Spark dayofweek is Sun=1 — data_loader.py:134-138).",
    survey_ids=("F4",),
)
def time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = FE.add_time_features(load_table(spark, sf_dir, "events"))
    return e.select(
        N.big("event_id").alias("event_id"),
        N.big("hour").alias("hour"),
        N.big("day_of_week").alias("day_of_week"),
        N.big("month").alias("month"),
        N.big("day_of_year").alias("day_of_year"),
        F.col("is_weekend").cast("int").cast("bigint").alias("is_weekend"),
    )


@query(
    "lag_lead_features",
    oracle="""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       round(value, 4) AS value,
       round(lag(value, 1)  OVER w, 4) AS value_lag_1,
       round(lag(value, 24) OVER w, 4) AS value_lag_24,
       round(lead(value, 1) OVER w, 4) AS value_next
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    doc="W1+W2: row-offset lags 1/24 and the next-step target lead per "
    "entity (pandas shift(k)/shift(-1), data_loader.py:141-143, "
    "train_lightgbm.py:169).",
    survey_ids=("W1", "W2"),
)
def lag_lead_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    e = FE.add_lag_features(
        e, "value", order_by=["ts", "event_id"], lags=(1, 24)
    )
    e = FE.add_target_lead(
        e, "value", order_by=["ts", "event_id"], target_name="value_next"
    )
    return e.select(
        N.big("event_id").alias("event_id"),
        N.big("user_id").alias("user_id"),
        N.rnd("value").alias("value"),
        N.rnd("value_lag_1").alias("value_lag_1"),
        N.rnd("value_lag_24").alias("value_lag_24"),
        N.rnd("value_next").alias("value_next"),
    )


_ROLL_DEC = N.sql_cents("value")
_ROLL_SQL = f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       round(CAST(sum({_ROLL_DEC}) OVER w7 AS DOUBLE) / 1e2
             / count(*) OVER w7, 4) AS value_mean_7,
       CASE WHEN count(*) OVER w7 <= 1 THEN NULL ELSE
         round(sqrt(greatest(
           (CAST(sum({_ROLL_DEC} * {_ROLL_DEC}) OVER w7 AS DOUBLE) / 1e4
            - (CAST(sum({_ROLL_DEC}) OVER w7 AS DOUBLE) / 1e2)
              * (CAST(sum({_ROLL_DEC}) OVER w7 AS DOUBLE) / 1e2)
              / CAST(count(*) OVER w7 AS DOUBLE))
           / (CAST(count(*) OVER w7 AS DOUBLE) - 1.0), 0.0)), 4) END AS value_std_7,
       round(max(value) OVER w7, 4) AS value_max_7,
       round(min(value) OVER w7, 4) AS value_min_7,
       round(CAST(sum({_ROLL_DEC}) OVER w30 AS DOUBLE) / 1e2
             / count(*) OVER w30, 4) AS value_mean_30
FROM events
WINDOW
  w7  AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
  w30 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)"""


@query(
    "rolling_features",
    oracle=_ROLL_SQL,
    doc="W3+W4: rolling mean/std/max/min (7-row) and long mean (30-row) per "
    "entity — pandas rolling(k, min_periods=1) with ddof=1 std "
    "(data_loader.py:146-160). Exact-decimal window sums keep it "
    "engine-neutral; single-row windows yield NULL std like pandas NaN.",
    headline=True,
    survey_ids=("W3", "W4"),
)
def rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out_by_key

    # entity-keyed fan-out: replaces the window's own exchange and keeps
    # the five rolling aggregates wide under AQE (no-op at scale)
    e = fan_out_by_key(load_table(spark, sf_dir, "events"), "user_id")
    e = FE.add_rolling_features(
        e,
        "value",
        order_by=["ts", "event_id"],
        window_rows=7,
        long_window_rows=30,
    )
    return e.select(
        N.big("event_id").alias("event_id"),
        N.big("user_id").alias("user_id"),
        N.rnd("value_mean_7").alias("value_mean_7"),
        N.rnd("value_std_7").alias("value_std_7"),
        N.rnd("value_max_7").alias("value_max_7"),
        N.rnd("value_min_7").alias("value_min_7"),
        N.rnd("value_mean_30").alias("value_mean_30"),
    )


@query(
    "label_encode",
    oracle="""
SELECT n_name, CAST(dense_rank() OVER (ORDER BY n_name) - 1 AS BIGINT) AS n_name_encoded
FROM (SELECT DISTINCT n_name FROM nation)""",
    doc="F7: lexicographic dense integer codes == sklearn LabelEncoder "
    "(data_loader.py:163), computed distributed via dense_rank.",
    survey_ids=("F7",),
)
def label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return (
        FE.label_encode(n, "n_name")
        .select("n_name", N.big("n_name_encoded").alias("n_name_encoded"))
        .distinct()
    )


@query(
    "time_split_counts",
    oracle="""
SELECT split, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT CASE
    WHEN ts <= TIMESTAMP '2024-01-10 23:59:59' THEN 'train'
    WHEN ts <= TIMESTAMP '2024-01-20 23:59:59' THEN 'val'
    ELSE 'test' END AS split
  FROM events
) GROUP BY split""",
    doc="W7: time-based train/val/test split (data_loader.py:196-225), "
    "verified by bucket counts.",
    survey_ids=("W7",),
)
def time_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    train, val, test = FE.time_split(
        e, "ts", train_end="2024-01-10 23:59:59", val_end="2024-01-20 23:59:59"
    )
    parts = [
        train.select(F.lit("train").alias("split")),
        val.select(F.lit("val").alias("split")),
        test.select(F.lit("test").alias("split")),
    ]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return u.groupBy("split").agg(F.count(F.lit(1)).alias("n"))


@query(
    "gap_fill_hourly",
    oracle="""
WITH gold AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_ts, max(value) AS max_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT user_id, min(hour_ts) AS h0, max(hour_ts) AS h1 FROM gold GROUP BY user_id
), spine AS (
  SELECT b.user_id, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds b
)
SELECT CAST(s.user_id AS BIGINT) AS user_id,
       strftime(s.hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       round(g.max_value, 4) AS max_value,
       CAST(CASE WHEN g.user_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
FROM spine s LEFT JOIN gold g ON s.user_id = g.user_id AND s.hour_ts = g.hour_ts""",
    doc="Gap-fill densification: executor-side hour spine via sequence()+"
    "explode, prerequisite for time-correct lags (SURVEY.md §4.3-5).",
    survey_ids=("W1",),
)
def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    gold = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.max("value").alias("max_value"))
    filled = FE.gap_fill_hourly(gold, "user_id", "hour_ts")
    return filled.select(
        N.big("user_id").alias("user_id"),
        N.ts_str("hour_ts").alias("hour_ts"),
        N.rnd("max_value").alias("max_value"),
        F.when(F.col("max_value").isNull(), 1).otherwise(0).cast("bigint").alias(
            "filled"
        ),
    )


@query(
    "asof_join_events",
    oracle="""
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, event_id AS click_id, value AS click_value
  FROM events WHERE event_type = 'click'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       round(p.value, 4) AS value,
       round(c.click_value, 4) AS click_value_asof
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts""",
    doc="As-of join (operator Spark lacks): latest click value at or before "
    "each purchase, via the union+carry-forward window construction — one "
    "shuffle on the key, no range-join blowup. Oracle: DuckDB ASOF JOIN.",
    headline=True,
    survey_ids=("M4", "W1"),
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_seq"),
        F.col("value").alias("click_value"),
    )
    joined = ASOF.asof_join(
        purchases,
        clicks,
        key="user_id",
        ts_col="ts",
        right_seq="click_seq",
        carry_cols=["click_value"],
    )
    return joined.select(
        N.big("event_id").alias("event_id"),
        N.big("user_id").alias("user_id"),
        N.rnd("value").alias("value"),
        N.rnd("click_value_asof").alias("click_value_asof"),
    )


# ---------------------------------------------------------------------------
# The full ML feature frame (reference ML_TRAINING.md:57-199), M5 deliverable
# ---------------------------------------------------------------------------

from project_bigdata_spark.plans.medallion_queries import GOLD_CTE  # noqa: E402

# Event types whose per-hour "first value" feeds the v_<type> features —
# first element of the (type, value)-sorted pairs array == min(value) of
# that type within the hour (see feature_frame doc).
_PTYPE_TYPES = ("click", "view", "purchase", "signup", "error")

_GD = N.sql_cents("max_value")
_WO = "PARTITION BY user_id ORDER BY hour_ts"
_W7 = f"{_WO} ROWS BETWEEN 167 PRECEDING AND CURRENT ROW"
_W30 = f"{_WO} ROWS BETWEEN 719 PRECEDING AND CURRENT ROW"


def _ptype_sql(t: str) -> str:
    pos = f"list_position(event_types, '{t}')"
    return (
        f"CASE WHEN coalesce({pos}, 0) = 0 THEN 0.0e0 "
        f"ELSE round(values[{pos}], 4) END"
    )


_FEATURE_SQL = (
    "WITH"
    + GOLD_CTE
    + f""",
feat AS (
  SELECT user_id, hour_ts, n_events, event_types, values,
         lag(max_value, 1)   OVER ({_WO}) AS lag_1,
         lag(max_value, 24)  OVER ({_WO}) AS lag_24,
         lag(max_value, 168) OVER ({_WO}) AS lag_168,
         lead(max_value, 1)  OVER ({_WO}) AS target_next,
         CAST(sum({_GD}) OVER ({_W7}) AS DOUBLE) / 1e2
           / count(*) OVER ({_W7}) AS mean_168,
         CASE WHEN count(*) OVER ({_W7}) <= 1 THEN NULL ELSE
           sqrt(greatest(
             (CAST(sum({_GD} * {_GD}) OVER ({_W7}) AS DOUBLE) / 1e4
              - (CAST(sum({_GD}) OVER ({_W7}) AS DOUBLE) / 1e2)
                * (CAST(sum({_GD}) OVER ({_W7}) AS DOUBLE) / 1e2)
                / CAST(count(*) OVER ({_W7}) AS DOUBLE))
             / (CAST(count(*) OVER ({_W7}) AS DOUBLE) - 1.0), 0.0)) END AS std_168,
         max(max_value) OVER ({_W7}) AS max_168,
         min(max_value) OVER ({_W7}) AS min_168,
         CAST(sum({_GD}) OVER ({_W30}) AS DOUBLE) / 1e2
           / count(*) OVER ({_W30}) AS mean_720,
         max_value
  FROM gold
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       CAST(hour(hour_ts) AS BIGINT) AS hour,
       CAST(isodow(hour_ts) - 1 AS BIGINT) AS day_of_week,
       CAST(month(hour_ts) AS BIGINT) AS month,
       CAST(dayofyear(hour_ts) AS BIGINT) AS day_of_year,
       CAST(CASE WHEN isodow(hour_ts) - 1 >= 5 THEN 1 ELSE 0 END AS BIGINT)
         AS is_weekend,
       round(lag_1, 4) AS value_lag_1h,
       round(lag_24, 4) AS value_lag_24h,
       round(lag_168, 4) AS value_lag_168h,
       round(mean_168, 4) AS value_mean_7d,
       round(std_168, 4) AS value_std_7d,
       round(max_168, 4) AS value_max_7d,
       round(min_168, 4) AS value_min_7d,
       round(mean_720, 4) AS value_mean_30d,
       CAST(dense_rank() OVER (ORDER BY user_id) - 1 AS BIGINT) AS user_encoded,
       CAST(n_events AS BIGINT) AS n_events,
       {_ptype_sql('click')} AS v_click,
       {_ptype_sql('view')} AS v_view,
       {_ptype_sql('purchase')} AS v_purchase,
       {_ptype_sql('signup')} AS v_signup,
       {_ptype_sql('error')} AS v_error,
       round(max_value, 4) AS value,
       round(target_next, 4) AS target_next
FROM feat"""
)


@query(
    "feature_frame",
    oracle=_FEATURE_SQL,
    doc="The reference's full 22-feature ML frame (ML_TRAINING.md:57-199, "
    "data_loader.py:121-194) computed at Spark scale over the hourly Gold "
    "aggregate: 5 time features, 3 row-lags, 5 rolling stats "
    "(min_periods=1, ddof=1), entity label-encode (two-phase distributed "
    "rank — no global window), per-type first-value unnest with fill-0 (F6), "
    "and the shifted(-1) target. One shuffle for gold + one for the "
    "entity windows. r11 re-plan: the per-type 'first value of the "
    "(type, value)-sorted pairs array' is exactly min(value) FILTER "
    "(event_type = t), so the slim gold aggregate computes five "
    "conditional mins instead of gold_hourly's sorted collect_list — a "
    "codegen'd HashAggregate whose shuffle carries 7 numeric aggregates "
    "per partial group, not every (type, value) pair (ObjectHashAggregate "
    "and the whole-pair exchange both gone; oracle unchanged).",
    headline=True,
    survey_ids=("W1", "W2", "W3", "W4", "F4", "F6", "F7"),
)
def feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators import medallion as M

    from project_bigdata_spark.operators.dedup import fan_out_by_key

    # entity-keyed fan-out: ONE explicit user_id exchange (exempt from AQE
    # coalescing) satisfies the gold aggregate, all four entity windows,
    # AND the label-encode dictionary's distinct — ReuseExchange collapses
    # the two plan branches onto the same shuffle (no-op at scale)
    e = fan_out_by_key(load_table(spark, sf_dir, "events"), "user_id")
    silver = M.silver(M.bronze(e))
    # Slim gold at the same (user, hour) grain as M.gold_hourly (year/
    # month/day are functions of hour_ts, so the groups are identical):
    # only the aggregates this frame consumes. pairs[first occurrence of
    # t] in the struct-sorted array == min(value) over type t (silver
    # admits no NULL/NaN values), so the parallel arrays never need to
    # be materialized here.
    gold = silver.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        F.max("value").alias("max_value"),
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.min(F.when(F.col("event_type") == t, F.col("value"))).alias(
                f"_first_{t}"
            )
            for t in _PTYPE_TYPES
        ],
    )
    g = FE.add_time_features(gold, "hour_ts")
    g = FE.add_lag_features(
        g, "max_value", order_by=["hour_ts"], lags=(1, 24, 168)
    )
    g = FE.add_target_lead(
        g, "max_value", order_by=["hour_ts"], target_name="target_next"
    )
    g = FE.add_rolling_features(
        g, "max_value", order_by=["hour_ts"], window_rows=168, long_window_rows=720
    )
    # dictionary from SILVER, not the windowed gold frame: gold only
    # groups by user_id so the distinct user sets are identical, but the
    # silver branch is a pruned scan+filter — no second pass through the
    # gold aggregation and window chain just to list users
    g = FE.label_encode(
        g, "user_id", "user_encoded", dictionary=silver.select("user_id")
    )

    def ptype(t: str) -> F.Column:
        m = F.col(f"_first_{t}")
        return F.when(m.isNull(), F.lit(0.0)).otherwise(F.round(m, 4))

    return g.select(
        N.big("user_id").alias("user_id"),
        N.ts_str("hour_ts").alias("hour_ts"),
        N.big("hour").alias("hour"),
        N.big("day_of_week").alias("day_of_week"),
        N.big("month").alias("month"),
        N.big("day_of_year").alias("day_of_year"),
        F.col("is_weekend").cast("int").cast("bigint").alias("is_weekend"),
        N.rnd("max_value_lag_1").alias("value_lag_1h"),
        N.rnd("max_value_lag_24").alias("value_lag_24h"),
        N.rnd("max_value_lag_168").alias("value_lag_168h"),
        N.rnd("max_value_mean_168").alias("value_mean_7d"),
        N.rnd("max_value_std_168").alias("value_std_7d"),
        N.rnd("max_value_max_168").alias("value_max_7d"),
        N.rnd("max_value_min_168").alias("value_min_7d"),
        N.rnd("max_value_mean_720").alias("value_mean_30d"),
        N.big("user_encoded").alias("user_encoded"),
        N.big("n_events").alias("n_events"),
        ptype("click").alias("v_click"),
        ptype("view").alias("v_view"),
        ptype("purchase").alias("v_purchase"),
        ptype("signup").alias("v_signup"),
        ptype("error").alias("v_error"),
        N.rnd("max_value").alias("value"),
        N.rnd("target_next").alias("target_next"),
    )


@query(
    "gap_fill_ffill",
    oracle="""
WITH gold AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_ts, max(value) AS max_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT user_id, min(hour_ts) AS h0, max(hour_ts) AS h1 FROM gold GROUP BY user_id
), spine AS (
  SELECT b.user_id, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds b
), filled AS (
  SELECT s.user_id, s.hour_ts, g.max_value
  FROM spine s LEFT JOIN gold g ON s.user_id = g.user_id AND s.hour_ts = g.hour_ts
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       round(last_value(max_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hour_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value_ffill
FROM filled""",
    doc="Gap-fill + forward-fill: densify the hourly series then carry the "
    "last observation forward (last_value IGNORE NULLS over the cumulative "
    "frame) — the standard time-series imputation before time-correct "
    "lags/rolling stats.",
    survey_ids=("W1", "W3"),
)
def gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    gold = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.max("value").alias("max_value"))
    filled = FE.gap_fill_hourly(gold, "user_id", "hour_ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        N.big("user_id").alias("user_id"),
        N.ts_str("hour_ts").alias("hour_ts"),
        N.rnd(F.last("max_value", ignorenulls=True).over(w)).alias("value_ffill"),
    )


@query(
    "time_range_rolling",
    oracle=f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       round(CAST(sum({N.sql_cents('value')}) OVER w AS DOUBLE) / 1e2
             / count(*) OVER w, 4) AS avg_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",
    doc="Time-RANGE window frame: trailing 1-hour average per entity — the "
    "range-frame surface the reference lacks (SURVEY §2.5 'no rangeBetween"
    " frames'). Spark side uses rangeBetween over unix seconds (RANGE "
    "frames take numeric ORDER BY), giving identical [-3600s, now] "
    "semantics; exact-decimal sums keep it engine-neutral.",
    survey_ids=("W3", "W4"),
)
def time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # RANGE frames need a numeric sort key; µs-exact seconds-as-double
    # would lose precision, so use microseconds as long
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    cnt = F.count(F.lit(1)).over(w)
    avg = F.sum(N.cents("value")).over(w).cast("double") / F.lit(100.0) / cnt
    return e.select(
        N.big("event_id").alias("event_id"),
        N.big("user_id").alias("user_id"),
        cnt.cast("bigint").alias("n_1h"),
        N.rnd(avg).alias("avg_1h"),
    )
