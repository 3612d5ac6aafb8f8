"""Fourth relational batch: weighted quantiles, OHLC time-series bars,
and an interval-overlap join.

These are operator families the first three batches did not cover:

- ``weighted_median_delay`` — weighted percentiles via cumulative-weight
  windows (the exact, order-free construction; ``percentile_approx`` has
  no weighted form and a sketch would not oracle-match anyway);
- ``ohlc_bars`` — first/last-in-window conditional aggregation (the
  open/high/low/close rollup every time-series store ships);
- ``interval_overlap_join`` — interval × interval overlap, implemented
  as a bounded grid-explode + broadcast join instead of the textbook
  inequality join (which Spark would execute as BroadcastNestedLoopJoin
  over every session × every window — quadratic at scale). The DuckDB
  oracle USES the naive inequality join, so the differential gate
  attests the two formulations are equivalent.

Scale notes (100 TB): each query scans its fact table once and rides
one hash exchange (join key or group key). The window steps run over
post-aggregate frames (distinct delay values, hour grid) that are
orders of magnitude smaller than the input; the hot-hour set is
bounded by calendar hours and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.operators.joins import order_items
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table

# Exact-cents fragments (round-5 hardening; see _norm.cents): integer
# grids replace every double->DECIMAL cast in this module's oracles.
_VAL_C = N.sql_cents("value")
_SUM_CENTS_VALUE = N.sql_sum_cents2("value")
_EP_C = N.sql_cents("l_extendedprice")
_DISC_C = N.sql_cents("l_discount")
_TAX_C = N.sql_cents("l_tax")
_QTY_C = N.sql_cents("l_quantity")
_LQTY_C = N.sql_cents("l.l_quantity")
_REV4 = f"({_EP_C} * (100 - {_DISC_C}))"
_LEP_REV4 = (
    f"({N.sql_cents('l.l_extendedprice')}"
    f" * (100 - {N.sql_cents('l.l_discount')}))"
)


@query(
    "weighted_median_delay",
    oracle=f"""
WITH delays AS (
  SELECT o.o_orderpriority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days,
         {_LQTY_C} AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), grouped AS (
  SELECT o_orderpriority, delay_days,
         sum(w) AS wsum
  FROM delays GROUP BY 1, 2
), cum AS (
  SELECT o_orderpriority, delay_days, wsum,
         sum(wsum) OVER (PARTITION BY o_orderpriority ORDER BY delay_days
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c,
         sum(wsum) OVER (PARTITION BY o_orderpriority) AS tot
  FROM grouped
)
SELECT o_orderpriority,
       CAST(max(tot) / 100 AS BIGINT) AS total_weight,
       CAST(min(CASE WHEN c * 4  >= tot     THEN delay_days END) AS BIGINT)
         AS wp25_days,
       CAST(min(CASE WHEN c * 2  >= tot     THEN delay_days END) AS BIGINT)
         AS wp50_days,
       CAST(min(CASE WHEN c * 4  >= tot * 3 THEN delay_days END) AS BIGINT)
         AS wp75_days,
       CAST(min(CASE WHEN c * 10 >= tot * 9 THEN delay_days END) AS BIGINT)
         AS wp90_days
FROM cum GROUP BY 1""",
    doc="Quantity-weighted ship-delay percentiles per order priority — "
    "the weighted-quantile operator (ship_delay_sla's unweighted "
    "sibling): weights sum exactly in DECIMAL per (priority, delay), a "
    "per-priority cumulative-weight window finds the smallest delay "
    "whose cumulative weight crosses q·total, and every threshold is "
    "an integer-scaled DECIMAL comparison (c·4 ≥ tot, not c ≥ 0.25·tot)"
    " so no float rounding can flip a bucket on either engine. The "
    "window runs over the DISTINCT-delay frame (a few hundred rows per "
    "priority), not the lineitems.",
    survey_ids=("W3", "A3", "M4", "M7-A32b"),
)
def weighted_median_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    delays = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("delay_days"),
        N.cents("l_quantity").alias("w"),
    )
    grouped = delays.groupBy("o_orderpriority", "delay_days").agg(
        F.sum(F.col("w").cast("decimal(38,0)")).alias("wsum")
    )
    wp = Window.partitionBy("o_orderpriority")
    cum = grouped.select(
        "o_orderpriority",
        "delay_days",
        F.sum("wsum")
        .over(wp.orderBy("delay_days").rowsBetween(Window.unboundedPreceding, 0))
        .alias("c"),
        F.sum("wsum")
        .over(
            wp.orderBy("delay_days").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("tot"),
    )

    def q_at(num: int, den: int, name: str) -> F.Column:
        return (
            F.min(
                F.when(F.col("c") * den >= F.col("tot") * num, F.col("delay_days"))
            )
            .cast("bigint")
            .alias(name)
        )

    return cum.groupBy("o_orderpriority").agg(
        (F.max("tot") / F.lit(100)).cast("bigint").alias("total_weight"),
        q_at(1, 4, "wp25_days"),
        q_at(1, 2, "wp50_days"),
        q_at(3, 4, "wp75_days"),
        q_at(9, 10, "wp90_days"),
    )


@query(
    "ohlc_bars",
    oracle=f"""
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type,
       strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
       CAST(count(*) AS BIGINT) AS n_events,
       {_SUM_CENTS_VALUE} AS total_value
FROM ranked GROUP BY 1, 2""",
    doc="Hourly OHLC bars per event type — the open/high/low/close "
    "rollup of a time-series store, expressed as first/last-in-window "
    "conditional aggregation: a (ts, event_id)-deterministic "
    "row_number pair marks each bar's opening and closing event, and "
    "one hash aggregation folds the bar. Open/close are raw column "
    "values (no arithmetic), so they hash-match bit-exactly across "
    "engines. The two window sorts ride the SAME (type, hour) hash "
    "partitioning — one exchange, two partition-local sorts, then the "
    "aggregation reuses the partitioning exchange-free.",
    survey_ids=("W6", "A7", "F4", "M7-A33b"),
)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", "ts")
    )
    wp = Window.partitionBy("event_type", "hour")
    ranked = e.select(
        "event_type",
        "hour",
        "value",
        F.row_number().over(wp.orderBy("ts", "event_id")).alias("rn_a"),
        F.row_number()
        .over(wp.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
    )
    return ranked.groupBy("event_type", N.ts_str("hour").alias("hour")).agg(
        N.rnd(F.max(F.when(F.col("rn_a") == 1, F.col("value")))).alias("open"),
        N.rnd(F.max("value")).alias("high"),
        N.rnd(F.min("value")).alias("low"),
        N.rnd(F.max(F.when(F.col("rn_d") == 1, F.col("value")))).alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        N.sum_cents2("value").alias("total_value"),
    )


@query(
    "interval_overlap_join",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM gaps
), spans AS (
  SELECT user_id, session_idx, min(ts) AS s, max(ts) AS e
  FROM sess GROUP BY 1, 2
), hourly AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS hcnt
  FROM hourly
), hot AS (
  SELECT h.hour FROM hourly h CROSS JOIN tot t
  WHERE 5 * h.n * t.hcnt >= 6 * t.total
), touched AS (
  SELECT p.user_id, p.session_idx, h.hour
  FROM spans p JOIN hot h
    ON h.hour >= date_trunc('hour', p.s)
   AND h.hour <= date_trunc('hour', p.e)
)
SELECT user_id,
       CAST(count(DISTINCT session_idx) AS BIGINT) AS n_sessions_in_hot,
       CAST(count(DISTINCT hour) AS BIGINT) AS n_hot_hours_touched
FROM touched GROUP BY 1""",
    doc="Interval × interval overlap join: 30-min-gap user sessions "
    "[start, end] against globally 'hot' hours (hourly volume ≥ 1.2× "
    "the mean — the threshold compares 5·n·hcnt ≥ 6·total in exact "
    "BIGINT arithmetic, no float). The oracle runs the textbook "
    "inequality join; the Spark side refuses it (range-predicate "
    "joins execute as BroadcastNestedLoopJoin — sessions × windows "
    "is quadratic at 100 TB) and instead explodes each session to "
    "its bounded hour grid (F.sequence; session length caps the "
    "fanout) and equi-joins the BROADCAST hot-hour set (≤ calendar "
    "hours rows). The differential gate attests the two formulations "
    "agree row-for-row.",
    survey_ids=("M4", "W3", "M7-A34b"),
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = e.select(
        "user_id",
        "ts",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_idx"),
    )
    spans = sess.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = hourly.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("hcnt"),
    )
    hot = (
        hourly.crossJoin(F.broadcast(tot))
        .filter(5 * F.col("n") * F.col("hcnt") >= 6 * F.col("total"))
        .select("hour")
    )
    # bounded grid-explode: a session spanning k hours yields k rows
    grid = spans.select(
        "user_id",
        "session_idx",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s"),
                F.date_trunc("hour", "e"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour"),
    )
    touched = grid.join(F.broadcast(hot), "hour")
    return touched.groupBy("user_id").agg(
        F.count_distinct("session_idx").cast("bigint").alias("n_sessions_in_hot"),
        F.count_distinct("hour").cast("bigint").alias("n_hot_hours_touched"),
    )


@query(
    "grouping_sets_profile",
    oracle=f"""
SELECT coalesce(event_type, 'ALL') AS event_type,
       CAST(coalesce(CAST(date_part('day', ts) AS BIGINT), -1) AS BIGINT)
         AS day,
       CAST(GROUPING(event_type) AS BIGINT) AS g_type,
       CAST(GROUPING(date_part('day', ts)) AS BIGINT) AS g_day,
       CAST(count(*) AS BIGINT) AS n_events,
       {_SUM_CENTS_VALUE} AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type), (date_part('day', ts)),
                        (event_type, date_part('day', ts)), ())""",
    doc="Explicit GROUPING SETS aggregation — the arbitrary-subset API "
    "that cube_lineitem_flags (full lattice) and rollup_order_stats "
    "(prefix lattice) cannot express: exactly the four requested "
    "groupings in ONE pass (Spark expands them inside a single "
    "Expand+HashAggregate — one scan, one exchange, NOT four union'd "
    "subqueries). GROUPING() markers disambiguate 'ALL' placeholder "
    "values from real ones, engine-neutrally (no grouping_id "
    "bit-order dependence).",
    survey_ids=("A7", "O3", "F10", "M7-A37b"),
)
def grouping_sets_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.dayofmonth("ts").alias("day"), "value"
    )
    gs = e.groupingSets(
        [["event_type"], ["day"], ["event_type", "day"], []],
        "event_type",
        "day",
    )
    return gs.agg(
        F.grouping("event_type").cast("bigint").alias("g_type"),
        F.grouping("day").cast("bigint").alias("g_day"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        N.sum_cents2("value").alias("total_value"),
    ).select(
        F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
        F.coalesce(F.col("day").cast("bigint"), F.lit(-1)).alias("day"),
        "g_type",
        "g_day",
        "n_events",
        "total_value",
    )


@query(
    "pareto_frontier_suppliers",
    oracle=f"""
WITH perf AS (
  SELECT s.s_nationkey, l.l_suppkey,
         sum({_LEP_REV4}) AS revenue,
         CAST(max(date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
           AS worst_delay
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
), vec AS (
  SELECT DISTINCT s_nationkey, revenue, worst_delay FROM perf
), frontier AS (
  SELECT v.s_nationkey, v.revenue, v.worst_delay
  FROM vec v
  WHERE NOT EXISTS (
    SELECT 1 FROM vec d
    WHERE d.s_nationkey = v.s_nationkey
      AND d.revenue >= v.revenue AND d.worst_delay <= v.worst_delay
      AND (d.revenue > v.revenue OR d.worst_delay < v.worst_delay)
  )
)
SELECT CAST(p.s_nationkey AS BIGINT) AS nationkey,
       CAST(p.l_suppkey AS BIGINT) AS suppkey,
       (CAST(p.revenue AS DOUBLE) / 1e4) AS revenue, p.worst_delay
FROM perf p
JOIN frontier f
  ON f.s_nationkey = p.s_nationkey AND f.revenue = p.revenue
 AND f.worst_delay = p.worst_delay""",
    doc="Per-nation Pareto frontier (skyline) of suppliers on (revenue "
    "max, worst ship-delay min). The oracle runs the textbook NOT "
    "EXISTS dominance test — O(n²) per nation; the Spark side computes "
    "the identical set with ONE per-nation sort: order distinct "
    "objective vectors by (revenue DESC, delay ASC) and keep a vector "
    "iff its delay beats the running MIN delay of every higher-revenue "
    "vector (strictly — equal-vector suppliers re-join the frontier "
    "afterwards, so ties keep ALL owners). Both objectives are exact "
    "(DECIMAL revenue, BIGINT delay): no float rounding can flip a "
    "dominance decision. At scale: skyline rides the same (nation) "
    "partitioning as the window — linear after one sort vs the "
    "quadratic join the oracle runs.",
    survey_ids=("W6", "O1", "M4", "M7-A38b"),
)
def pareto_frontier_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    perf = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                (
                    N.cents("l_extendedprice")
                    * (F.lit(100) - N.cents("l_discount"))
                ).cast("decimal(38,0)")
            ).alias("revenue"),
            F.max(F.datediff("l_shipdate", "o_orderdate"))
            .cast("bigint")
            .alias("worst_delay"),
        )
    )
    vec = perf.select("s_nationkey", "revenue", "worst_delay").distinct()
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy(F.col("revenue").desc(), F.col("worst_delay").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        vec.withColumn("min_prec_delay", F.min("worst_delay").over(w))
        .filter(
            F.col("min_prec_delay").isNull()
            | (F.col("worst_delay") < F.col("min_prec_delay"))
        )
        .select("s_nationkey", "revenue", "worst_delay")
    )
    return perf.join(
        frontier, ["s_nationkey", "revenue", "worst_delay"]
    ).select(
        N.big("s_nationkey").alias("nationkey"),
        N.big("l_suppkey").alias("suppkey"),
        (F.col("revenue").cast("double") / F.lit(1.0e4)).alias("revenue"),
        "worst_delay",
    )


_CM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

# Pearson r is scale-invariant, so the moments stay in raw integer
# cents (no unit division at all) — exact sums, double closed form.
_CM_SUMS_SQL = ", ".join(
    [
        "CAST(count(*) AS DOUBLE) AS n",
        *[
            f"CAST(sum({N.sql_cents(c)}) AS DOUBLE) AS s_{c}"
            for c in _CM_COLS
        ],
        *[
            f"CAST(sum({N.sql_cents(a)} * {N.sql_cents(b)}) AS DOUBLE)"
            f" AS p_{a}_{b}"
            for i, a in enumerate(_CM_COLS)
            for b in _CM_COLS[i:]
        ],
    ]
)

_CM_PAIR_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{a}' AS col_a, '{b}' AS col_b, CAST(n AS BIGINT) AS n,
       round((n * p_{a}_{b} - s_{a} * s_{b})
             / sqrt((n * p_{a}_{a} - s_{a} * s_{a})
                    * (n * p_{b}_{b} - s_{b} * s_{b})), 6) AS pearson_r
FROM sums"""
    for i, a in enumerate(_CM_COLS)
    for b in _CM_COLS[i + 1 :]
)


@query(
    "corr_matrix_lineitem",
    oracle=f"""
WITH sums AS (
  SELECT {_CM_SUMS_SQL} FROM lineitem
)
{_CM_PAIR_SQL}""",
    doc="Pearson correlation matrix over the lineitem measures "
    "(quantity, price, discount, tax — 6 pairs) from ONE aggregation "
    "pass: every Σx, Σx², Σxy folds exactly in DECIMAL (2-decimal "
    "inputs cross-multiply to a 4-decimal grid), then the closed-form "
    "r evaluates in double bit-identically on both engines — the "
    "order-free construction native `corr()` (a streaming double "
    "accumulator) cannot give. Scale: one scan, one partial/final "
    "aggregate exchange producing a single 15-column row; the 6 pair "
    "rows are exploded from that scalar row, not re-aggregated.",
    survey_ids=("A3", "A10", "F14", "M7-A39b"),
)
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [
        F.sum(N.cents(c).cast("decimal(38,0)")).cast("double").alias(f"s_{c}")
        for c in _CM_COLS
    ]
    aggs += [
        F.sum((N.cents(a) * N.cents(b)).cast("decimal(38,0)"))
        .cast("double")
        .alias(f"p_{a}_{b}")
        for i, a in enumerate(_CM_COLS)
        for b in _CM_COLS[i:]
    ]
    sums = li.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n").cast("bigint").alias("n"),
                N.rnd(
                    (F.col("n") * F.col(f"p_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}"))
                    / F.sqrt(
                        (F.col("n") * F.col(f"p_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                        * (F.col("n") * F.col(f"p_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
                    ),
                    6,
                ).alias("pearson_r"),
            )
            for i, a in enumerate(_CM_COLS)
            for b in _CM_COLS[i + 1 :]
        ]
    )
    return (
        sums.select(F.explode(pairs).alias("p"))
        .select("p.col_a", "p.col_b", "p.n", "p.pearson_r")
    )


@query(
    "time_weighted_avg",
    oracle=f"""
WITH seq AS (
  SELECT event_type, value, ts, user_id,
         date_trunc('day', ts) AS day,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id, date_trunc('day', ts)
                                  ORDER BY ts, event_id) - epoch_us(ts)
           AS w_us
  FROM events
), weighted AS (
  SELECT event_type,
         ({_VAL_C} * w_us) AS vw,
         w_us
  FROM seq WHERE w_us IS NOT NULL AND w_us > 0
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_weighted,
       CAST(sum(w_us) AS BIGINT) AS total_us,
       round(CAST(sum(vw) AS DOUBLE) / 100 / sum(w_us), 6) AS twap
FROM weighted GROUP BY 1""",
    doc="Time-weighted average (TWAP): each observation is weighted by "
    "how long it remained the latest one — the duration to the next "
    "event in its (user, day) sequence — so sparse-in-time readings "
    "stop being over/under-counted the way a row-weighted mean does. "
    "Weights are exact BIGINT microseconds from one per-entity window "
    "(lead on the same (user, day) exchange every other sequence "
    "feature rides); value×duration folds exactly in DECIMAL; the "
    "single double division happens once per group at the end.",
    survey_ids=("W1", "A3", "F9", "M7-A40b"),
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = e.withColumn("w_us", F.lead(us).over(w) - us)
    weighted = seq.filter(F.col("w_us").isNotNull() & (F.col("w_us") > 0)).select(
        "event_type",
        (N.cents("value") * F.col("w_us")).cast("decimal(38,0)").alias("vw"),
        "w_us",
    )
    return weighted.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_weighted"),
        F.sum("w_us").cast("bigint").alias("total_us"),
        N.rnd(
            F.sum("vw").cast("double") / F.lit(100.0) / F.sum("w_us"), 6
        ).alias("twap"),
    )


@query(
    "loo_target_encode",
    oracle=f"""
WITH stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum({_VAL_C}) AS s
  FROM events GROUP BY 1
)
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       e.event_type,
       round(e.value, 4) AS value,
       round(CAST(st.s - {N.sql_cents('e.value')} AS DOUBLE) / 100
             / nullif(st.n - 1, 0), 6) AS loo_enc
FROM events e JOIN stats st ON st.event_type = e.event_type
WHERE e.event_id % 101 = 0""",
    doc="Leave-one-out target encoding — the leakage-safe categorical "
    "encoder: each row's category is encoded by the target mean of "
    "every OTHER row in its category, (S_cat − x) / (n_cat − 1), so "
    "the row's own label never leaks into its feature. Category sums "
    "are exact DECIMAL (the subtraction is exact too), one double "
    "division per row; the per-category stats frame is |categories| "
    "rows and broadcasts back onto the facts. Output is an "
    "event_id%101 sample of the encoded rows.",
    survey_ids=("F7", "M7-F7b"),
)
def loo_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(N.cents("value").cast("decimal(38,0)")).alias("s"),
    )
    return (
        e.filter(F.col("event_id") % 101 == 0)
        .join(F.broadcast(stats), "event_type")
        .select(
            N.big("event_id").alias("event_id"),
            "event_type",
            N.rnd("value").alias("value"),
            N.rnd(
                (F.col("s") - N.cents("value")).cast("double")
                / F.lit(100.0)
                / F.nullif((F.col("n") - F.lit(1)).cast("double"), F.lit(0.0)),
                6,
            ).alias("loo_enc"),
        )
    )


@query(
    "json_pack_unpack",
    oracle=f"""
WITH ranked AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_recent,
       {_SUM_CENTS_VALUE} AS total_recent
FROM ranked WHERE rn <= 3 GROUP BY 1""",
    doc="to_json / from_json fidelity attested differentially: each "
    "user's 3 most-recent events are packed into ONE JSON document "
    "(to_json over an array of structs — the envelope shape the S6 "
    "Kafka sink emits), then parsed back with an explicit schema and "
    "exploded; the final aggregate must equal the oracle computed "
    "directly from the rows, so any value the JSON encode/parse cycle "
    "mangles (double shortest-repr roundtrip, string escaping, field "
    "order) breaks the hash. Spark-side only pays one (user) exchange "
    "for the pack; the JSON hop is columnar expression work.",
    survey_ids=("F13", "S6", "P1", "M7-F13b"),
)
def json_pack_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(
            F.to_json(
                F.sort_array(
                    F.collect_list(F.struct("rn", "event_type", "value"))
                )
            ).alias("doc")
        )
    )
    parsed = recent.select(
        F.from_json(
            "doc",
            "array<struct<rn:int,event_type:string,value:double>>",
        ).alias("arr")
    ).select(F.explode("arr").alias("x"))
    return parsed.groupBy(F.col("x.event_type").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_recent"),
        N.sum_cents2(F.col("x.value")).alias("total_recent"),
    )


# r12 (ADVICE): hoisted into operators/joins.py so relational_queries3's
# copurchase_affinity shares the exact same derivation instead of
# re-inlining the pattern.
_order_items = order_items


@query(
    "triangle_count",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), tri AS (
  SELECT count(*) AS t
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT CAST((SELECT count(*) FROM
             (SELECT u FROM edges UNION SELECT v FROM edges))
        AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles""",
    doc="Triangle counting on the co-purchase graph (edges = part pairs "
    "sharing ≥2 orders) via DEGREE-ORDERED edge orientation — the "
    "distributed-graph classic: orient every edge from its lower- to "
    "higher-(degree, id) endpoint, enumerate wedges only at each "
    "edge's LOW-degree endpoint, and close them with a semi-join "
    "against the oriented edges. Orientation bounds per-node wedge "
    "fanout by min(deg, √m)-ish instead of max-degree² — the "
    "difference between feasible and explosive on power-law graphs "
    "at 10⁹ edges. The oracle counts the same triangles with the "
    "textbook u<v<w triple self-join, attesting the oriented "
    "formulation is count-equivalent.",
    survey_ids=("M4", "A6", "M7-G1"),
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = _order_items(li)
    b = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("v")
    )
    # r11: pin the edge list — it feeds FIVE consumers (degree census ×2,
    # the keyed orientation, the edge count, and through `oriented` the
    # wedge/closing sides), so without the pin the items self-join was
    # replayed per consumer (measured 4.4 s warm; ~2 s pinned)
    edges = (
        items.withColumnRenamed("l_partkey", "u")
        .join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    ends = edges.select(F.col("u").alias("n")).unionAll(
        edges.select(F.col("v").alias("n"))
    )
    deg = ends.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("deg_v"))
    # total order = explicit (deg, id) STRUCT comparison — an injective
    # key at any id range, unlike a fixed-multiplier packed long (which
    # collides once ids exceed the multiplier, silently dropping
    # equal-key wedges and defeating the degree-ordering bound)
    keyed = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.struct(F.col("deg_u").alias("d"), F.col("u").alias("i")).alias("ku"),
            F.struct(F.col("deg_v").alias("d"), F.col("v").alias("i")).alias("kv"),
        )
    )
    # pinned for the same reason: three consumers (both wedge sides + the
    # closing semi-join) would otherwise each replay the degree joins
    oriented = keyed.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("kdst"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).select("src", "dst", "kdst").localCheckpoint(eager=True)
    o1 = oriented.select("src", F.col("dst").alias("b"), F.col("kdst").alias("kb"))
    o2 = oriented.select("src", F.col("dst").alias("c"), F.col("kdst").alias("kc"))
    wedges = o1.join(o2, "src").filter(F.col("kb") < F.col("kc"))
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"], "left_semi")
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    n_tri = tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)


_PR_EDGES_SQL = """
items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), edges AS (
  SELECT u AS src, v AS dst FROM pairs
  UNION ALL SELECT v, u FROM pairs
), deg AS (
  SELECT src AS n, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)"""

_PR_ITER_SQL = """pr{i} AS (
  SELECT d.n,
         (SELECT 15 * 1000000000000 // (100 * n_nodes) FROM nn)
         + 85 * coalesce(sum(p.units // p.outdeg), 0) // 100 AS units
  FROM deg d
  LEFT JOIN (SELECT e.dst, pr{j}.units, pr{j}.outdeg
             FROM edges e JOIN pr{j} ON pr{j}.n = e.src) p
    ON p.dst = d.n
  GROUP BY d.n
), pr{i}d AS (
  SELECT pr{i}.n, pr{i}.units, deg.outdeg
  FROM pr{i} JOIN deg ON deg.n = pr{i}.n
)"""


@query(
    "pagerank_parts",
    oracle=f"""
WITH {_PR_EDGES_SQL},
pr0d AS (
  SELECT d.n, CAST(1000000000000 // n.n_nodes AS BIGINT) AS units, d.outdeg
  FROM deg d CROSS JOIN nn n
),
{_PR_ITER_SQL.format(i=1, j="0d")},
{_PR_ITER_SQL.format(i=2, j="1d")},
{_PR_ITER_SQL.format(i=3, j="2d")}
SELECT CAST(n AS BIGINT) AS part, CAST(units AS BIGINT) AS pr_units
FROM pr3d
QUALIFY row_number() OVER (ORDER BY units DESC, n) <= 20""",
    doc="PageRank (3 iterations, d=0.85) over the co-purchase graph in "
    "EXACT INTEGER arithmetic: ranks live in integer 'micro-units' "
    "(10¹² total mass) and every update is BIGINT division — "
    "contribution = units/outdeg, new = (15·10¹²)/(100·N) + "
    "85·Σcontrib/100 — so the fixpoint iteration is order-free and "
    "bit-identical on every engine (float PageRank sums neighbor "
    "contributions in nondeterministic order; no rounding grid fully "
    "fixes that). Per iteration: one join edges⋈ranks + one "
    "aggregation on the destination key — the canonical distributed "
    "PageRank step, 3 unrolled rounds here, a loop with "
    "localCheckpoint at depth. Top-20 by rank, id tiebreak.",
    survey_ids=("M4", "W5", "M7-G2"),
)
def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = _order_items(li)
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("v"))
    pairs = (
        items.withColumnRenamed("l_partkey", "u")
        .join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("u", "v")
    )
    edges = pairs.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(pairs.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy(F.col("src").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    # graph size as a broadcast one-row frame (the catalog's standard
    # scalar pattern) — no driver-side count() action before the plan
    nn = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    base_col = F.expr("(15 * 1000000000000) div (100 * n_nodes)")
    init_col = F.expr("1000000000000 div n_nodes")
    pr = deg.crossJoin(F.broadcast(nn)).select(
        "n", init_col.cast("bigint").alias("units"), "outdeg"
    )
    for _ in range(3):
        contrib = (
            edges.join(
                pr.select(F.col("n").alias("src"), "units", "outdeg"), "src"
            )
            .select(
                F.col("dst").alias("n"),
                F.expr("units div outdeg").alias("c"),
            )
            .groupBy("n")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            deg.join(contrib, "n", "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "n",
                (
                    base_col
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                )
                .cast("bigint")
                .alias("units"),
                "outdeg",
            )
        )
    return (
        pr.orderBy(F.col("units").desc(), "n")
        .limit(20)
        .select(N.big("n").alias("part"), N.big("units").alias("pr_units"))
    )


@query(
    "variant_shred",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_min,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_max,
       CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_distinct
FROM events GROUP BY 1""",
    doc="VARIANT semi-structured shredding (Spark 4's open-format "
    "answer to a JSON column: parse_json builds the binary variant "
    "once, variant_get extracts typed paths without re-parsing — "
    "against DuckDB's JSON type as the oracle): props parses to "
    "VARIANT and the typed '$.k' extraction aggregates per event "
    "type. At scale variant beats per-expression get_json_object "
    "calls because the parse happens once per row, not once per "
    "extracted path; the shape here is the P1 bronze shred on the "
    "modern type.",
    survey_ids=("P1", "F13", "M7-F15"),
)
def variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json("props").alias("pv")
    ).select(
        "event_type",
        F.expr("variant_get(pv, '$.k', 'bigint')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.min("k").cast("bigint").alias("k_min"),
        F.max("k").cast("bigint").alias("k_max"),
        F.count_distinct("k").cast("bigint").alias("k_distinct"),
    )


# The recursive fragment — IDENTICAL text on both engines, over an
# ``edges`` relation (Spark: a localCheckpoint'ed temp view; DuckDB: a
# CTE). ``SELECT DISTINCT`` in the recursive step makes each iteration a
# node FRONTIER (<= |V| rows) instead of a path multiset — without it the
# step enumerates every path of length <= 3, a deg^3 blowup on a dense
# co-purchase graph.
_REACH_REC_SQL = """
WITH RECURSIVE reach(part, hop) AS (
  SELECT (SELECT min(u) FROM {edges}), 0
  UNION ALL
  SELECT DISTINCT e.v, r.hop + 1
  FROM reach r JOIN {edges} e ON e.u = r.part
  WHERE r.hop < 3
), first_reach AS (
  SELECT part, min(hop) AS hop FROM reach GROUP BY part
)
SELECT CAST(hop AS BIGINT) AS hop,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(min(part) AS BIGINT) AS min_part,
       CAST(max(part) AS BIGINT) AS max_part
FROM first_reach GROUP BY 1"""

_REACH_ORACLE_SQL = """
WITH RECURSIVE items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), edges AS (
  SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs
), reach(part, hop) AS (
  SELECT (SELECT min(u) FROM edges), 0
  UNION ALL
  SELECT DISTINCT e.v, r.hop + 1
  FROM reach r JOIN edges e ON e.u = r.part
  WHERE r.hop < 3
), first_reach AS (
  SELECT part, min(hop) AS hop FROM reach GROUP BY part
)
SELECT CAST(hop AS BIGINT) AS hop,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(min(part) AS BIGINT) AS min_part,
       CAST(max(part) AS BIGINT) AS max_part
FROM first_reach GROUP BY 1"""


@query(
    "recursive_reachability",
    oracle=_REACH_ORACLE_SQL,
    doc="RECURSIVE CTE (Spark 4 WITH RECURSIVE — the iterative-SQL "
    "surface): 3-hop BFS over the co-purchase graph from its smallest "
    "part; the recursive fragment is the identical SQL text on both "
    "engines. The step SELECTs DISTINCT, so each iteration carries a "
    "node frontier bounded by |V| — never the deg^3 path multiset — "
    "and first-reach hop per node is recovered by a min(hop) "
    "aggregate. The expensive co-purchase edge derivation runs ONCE "
    "as a localCheckpoint'ed DataFrame on the Spark side (round-6 "
    "re-plan: the recursion's loop framework re-evaluated the edges "
    "CTE every iteration — 4x the self-join, 11.1s at sf0.1; "
    "materialized-once it is ~3.4s cold / ~1s for the recursion "
    "itself). Each recursive step is one frontier⋈edges join — the "
    "shape the unrolled pagerank_parts loop hand-builds; the depth "
    "guard bounds state. dedup_clusters' bounded label propagation "
    "remains the DataFrame-side iteration idiom; this is its "
    "SQL-native face.",
    survey_ids=("M4", "O3", "M7-O5"),
)
def recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = _order_items(li)
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .count()
        .filter(F.col("count") >= 2)
        .select("u", "v")
    )
    edges = pairs.union(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    edges.createOrReplaceTempView("_reach_edges")
    return spark.sql(_REACH_REC_SQL.format(edges="_reach_edges"))


@query(
    "sql_udf_pipeline",
    oracle=f"""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_lines,
       (CAST(sum({_REV4}) AS DOUBLE) / 1e4) AS net_revenue,
       (CAST(sum({_REV4} * (100 + {_TAX_C})) AS DOUBLE) / 1e6) AS charged
FROM lineitem GROUP BY 1""",
    doc="SQL scalar UDFs (CREATE TEMPORARY FUNCTION ... RETURN expr — "
    "Spark 4's declarative UDF surface): net price and charged amount "
    "are declared ONCE as SQL functions and reused across aggregates; "
    "Catalyst inlines the function body into the plan, so unlike a "
    "Python UDF the result is whole-stage-codegen'd JVM arithmetic — "
    "the UDF surface with zero UDF cost. The oracle inlines the same "
    "expressions by hand; matching DECIMAL grids keep the fold exact.",
    survey_ids=("F2", "F14", "M7-F16"),
)
def sql_udf_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price("
        "p DOUBLE, d DOUBLE) RETURNS BIGINT RETURN "
        f"{N.sql_cents('p')} * (100 - {N.sql_cents('d')})"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS BIGINT RETURN "
        f"{N.sql_cents('p')} * (100 - {N.sql_cents('d')})"
        f" * (100 + {N.sql_cents('t')})"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "_udf_lineitem"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(net_price(l_extendedprice, l_discount)
                             AS DECIMAL(38,0))) AS DOUBLE) / 1e4
                 AS net_revenue,
               CAST(sum(CAST(charged(l_extendedprice, l_discount, l_tax)
                             AS DECIMAL(38,0))) AS DOUBLE) / 1e6
                 AS charged
        FROM _udf_lineitem GROUP BY 1
        """
    )


_LATERAL_SQL = """
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
       CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       o.o_totalprice AS o_totalprice
FROM {cust} c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM {ord}
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) o"""


@query(
    "lateral_topk_orders",
    oracle=_LATERAL_SQL.format(cust="customer", ord="orders"),
    doc="LATERAL correlated subquery (the SQL-standard per-row derived "
    "table): each customer's top-2 orders by price via a correlated "
    "ORDER BY ... LIMIT in the FROM clause — identical SQL text on "
    "both engines. Catalyst rewrites the lateral into the "
    "DomainJoin/window form, so the physical plan is the same "
    "WindowGroupLimit shape top3_per_group builds by hand with the "
    "DataFrame API; this entry attests the SQL surface maps onto it. "
    "Customers with no orders drop out (inner lateral).",
    survey_ids=("M4", "W5", "O2", "M7-O6"),
)
def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_cust")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_ord")
    return spark.sql(_LATERAL_SQL.format(cust="_lat_cust", ord="_lat_ord"))


@query(
    "xml_pack_unpack",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum({_VAL_C}) AS BIGINT)
         AS cents_sum
FROM events GROUP BY 1""",
    doc="from_xml parse fidelity attested differentially (the XML face "
    "of the semi-structured family, next to json_pack_unpack and "
    "variant_shred): each event renders to an XML fragment "
    "(<e><t>..</t><v>..</v></e>, integer cents so no float-to-string "
    "ambiguity), parses back under an explicit struct schema, and the "
    "re-aggregate must equal the oracle computed directly from the "
    "rows. The XML hop is columnar expression work inside Spark; the "
    "gate attests it is lossless.",
    survey_ids=("P1", "F13", "M7-F17"),
)
def xml_pack_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    xml = e.select(
        F.concat(
            F.lit("<e><t>"),
            F.col("event_type"),
            F.lit("</t><v>"),
            N.cents("value").cast("string"),
            F.lit("</v></e>"),
        ).alias("doc")
    )
    parsed = xml.select(
        F.from_xml("doc", "t STRING, v LONG").alias("x")
    )
    return parsed.groupBy(F.col("x.t").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("x.v").cast("bigint").alias("cents_sum"),
    )


@query(
    "listagg_profile",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
         AS statuses
FROM orders GROUP BY 1""",
    doc="Ordered LISTAGG / string_agg (the SQL:2016 ordered string "
    "aggregate Spark 4 added): distinct order statuses per priority, "
    "concatenated in explicit WITHIN GROUP order so the string is "
    "deterministic on every engine (an unordered listagg is "
    "partition-order-dependent and could never hash-match). The "
    "aggregated domain is the bounded status vocabulary — the only "
    "safe cardinality class for string aggregation at 100 TB.",
    survey_ids=("A8", "F11", "O4", "M7-A41b"),
)
def listagg_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_la_ord")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               listagg(DISTINCT o_orderstatus, ',')
                 WITHIN GROUP (ORDER BY o_orderstatus) AS statuses
        FROM _la_ord GROUP BY o_orderpriority
        """
    )


@query(
    "try_arithmetic_audit",
    oracle="""
WITH r AS (
  SELECT event_type,
         value / nullif(date_part('day', ts) - 15, 0) AS ratio
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN ratio IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_div_null,
       round(min(ratio), 6) AS min_ratio,
       round(max(ratio), 6) AS max_ratio
FROM r GROUP BY 1""",
    doc="try_* ANSI-safe arithmetic attested (the fault-tolerant "
    "expression family: errors become NULL instead of failing the "
    "job — at 10¹² rows ONE bad denominator must not kill the "
    "pipeline): try_divide by (day-of-month − 15) NULLs exactly the "
    "day-15 rows, which the oracle reproduces with nullif. NULL "
    "counts and rounded min/max are the deterministic readouts (a "
    "sum of arbitrary-double ratios would be summation-order-"
    "dependent).",
    survey_ids=("F8", "P2", "F14", "M7-F8c"),
)
def try_arithmetic_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ratio = F.try_divide(F.col("value"), F.dayofmonth("ts") - F.lit(15))
    r = e.select("event_type", ratio.alias("ratio"))
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("ratio").isNull().cast("int")).cast("bigint").alias("n_div_null"),
        N.rnd(F.min("ratio"), 6).alias("min_ratio"),
        N.rnd(F.max("ratio"), 6).alias("max_ratio"),
    )


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

_LPA_EDGES = """
items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), bi AS (
  SELECT u AS n, v AS m FROM edges
  UNION ALL
  SELECT v AS n, u AS m FROM edges
)"""

_LPA_ROUND = """
, votes{r} AS (
  SELECT bi.n, l.lab, count(*) AS c
  FROM bi JOIN lab{p} l ON bi.m = l.n
  GROUP BY bi.n, l.lab
), lab{r} AS (
  SELECT n, lab FROM (
    SELECT n, lab,
           row_number() OVER (PARTITION BY n
                              ORDER BY c DESC, lab) AS rk
    FROM votes{r})
  WHERE rk = 1
)"""


@query(
    "label_propagation",
    oracle=f"""
WITH {_LPA_EDGES}
, lab0 AS (
  SELECT DISTINCT n, n AS lab FROM bi
)
{_LPA_ROUND.format(r=1, p=0)}
{_LPA_ROUND.format(r=2, p=1)}
{_LPA_ROUND.format(r=3, p=2)}
SELECT CAST(lab AS BIGINT) AS community_id,
       CAST(count(*) AS BIGINT) AS n_members
FROM lab3 GROUP BY lab HAVING count(*) >= 2""",
    doc="Community detection by synchronous label propagation (LPA, "
    "Raghavan et al.) on the co-purchase graph (same edges as "
    "triangle_count: part pairs sharing >= 2 orders): every node "
    "starts as its own label, and each of 3 unrolled rounds "
    "reassigns every node the most frequent label among its "
    "neighbors — argmax by exact integer count with a full (count "
    "DESC, label ASC) tie-break, so the SYNCHRONOUS variant is fully "
    "deterministic cross-engine (the async variant is famously "
    "order-dependent; this formulation is the one a distributed "
    "engine can actually attest). Output: the community census "
    "(labels with >= 2 members). Plan: per round one edges-x-labels "
    "equi-join + one (node, label) aggregate + one rank window — "
    "labels frame localCheckpoint'ed between rounds (the catalog's "
    "unrolled-iteration discipline), edges shuffle once per round on "
    "the neighbor key, payload never widens.",
    survey_ids=("M4", "M7-G3"),
)
def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = _order_items(li)
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )
    bi = edges.select(
        F.col("u").alias("n"), F.col("v").alias("m")
    ).unionByName(edges.select(F.col("v").alias("n"), F.col("u").alias("m")))
    bi = bi.localCheckpoint(eager=True)
    lab = bi.select("n").distinct().select("n", F.col("n").alias("lab"))
    for _ in range(3):
        votes = (
            bi.join(
                lab.select(
                    F.col("n").alias("m"), F.col("lab").alias("nlab")
                ),
                "m",
            )
            .groupBy("n", "nlab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        lab = (
            votes.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("n").orderBy(
                        F.col("c").desc(), "nlab"
                    )
                ),
            )
            .filter(F.col("rk") == 1)
            .select("n", F.col("nlab").alias("lab"))
            .localCheckpoint(eager=True)
        )
    return (
        lab.groupBy(F.col("lab").cast("bigint").alias("community_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )


# ---------------------------------------------------------------------------
# adamic_adar_links
# ---------------------------------------------------------------------------

AA_HUB_CAP = 64
AA_TOP_K = 20


@query(
    "adamic_adar_links",
    oracle=f"""
WITH {_LPA_EDGES}
, deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM bi GROUP BY n
), contrib AS (
  SELECT bi.n AS w, bi.m,
         CASE WHEN ln(CAST(deg.d AS DOUBLE)) <= 0 THEN NULL
              ELSE floor(1e9 / ln(CAST(deg.d AS DOUBLE)) + 0.5) END AS t9
  FROM bi JOIN deg ON bi.n = deg.n
  WHERE deg.d BETWEEN 2 AND {AA_HUB_CAP}
), wedges AS (
  SELECT a.m AS u, b.m AS v,
         CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(a.t9) AS BIGINT) AS s9
  FROM contrib a JOIN contrib b
    ON a.w = b.w AND a.m < b.m
  GROUP BY 1, 2
), cand AS (
  SELECT w.* FROM wedges w
  ANTI JOIN edges e ON w.u = e.u AND w.v = e.v
)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       n_common,
       round(CAST(s9 AS DOUBLE) / 1e9, 4) AS aa_score
FROM cand
ORDER BY s9 DESC, u, v
LIMIT {AA_TOP_K}""",
    doc="Link prediction on the co-purchase graph by Adamic-Adar: for "
    "every non-edge pair (u, v), AA = sum over common neighbors w of "
    "1/ln(deg(w)) — rare shared neighbors are strong evidence, hub "
    "co-membership is weak — the classic common-neighbor predictor "
    "(the 'customers who bought these also bought' candidate "
    "generator). Each 1/ln(deg) term is snapped to the 1e-9 grid "
    f"(snap-then-sum); wedge centers are capped at degree {AA_HUB_CAP} "
    "— the standard production guard, since a hub's deg^2 wedge "
    "fanout is what explodes on densifying graphs while its "
    "per-neighbor evidence tends to 0 (the cap is measured a no-op "
    "at every attested SF, max degree 51, and is what bounds the "
    "synthetic-sf1 densification soak); degree-1 centers cannot form "
    "wedges and ln(1)=0 is excluded by construction. Existing edges "
    "are removed with an anti-join; the global top-20 is "
    "orderBy().limit() = TakeOrderedAndProject with full (score, u, "
    "v) tie-break. Plan: degree aggregate, capped wedge self-join, "
    "one anti-join, partial top-k — no uncapped quadratic anywhere.",
    survey_ids=("M4", "M7-G4"),
)
def adamic_adar_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, bi = _copurchase_edges(spark, sf_dir)
    deg = bi.groupBy("n").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    contrib = (
        bi.join(F.broadcast(deg), "n")
        .filter((F.col("d") >= 2) & (F.col("d") <= AA_HUB_CAP))
        .select(
            F.col("n").alias("w"),
            "m",
            F.floor(
                F.lit(1e9) / F.log(F.col("d").cast("double")) + 0.5
            )
            .cast("bigint")
            .alias("t9"),
        )
    )
    ca, cb = contrib.alias("ca"), contrib.alias("cb")
    wedges = (
        ca.join(
            cb,
            (F.col("ca.w") == F.col("cb.w"))
            & (F.col("ca.m") < F.col("cb.m")),
        )
        .groupBy(F.col("ca.m").alias("u"), F.col("cb.m").alias("v"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("ca.t9").cast("bigint").alias("s9"),
        )
    )
    cand = wedges.join(edges, ["u", "v"], "left_anti")
    return (
        cand.orderBy(F.col("s9").desc(), "u", "v")
        .limit(AA_TOP_K)
        .select(
            N.big("u").alias("u"),
            N.big("v").alias("v"),
            "n_common",
            N.rnd(F.col("s9").cast("double") / 1e9).alias("aa_score"),
        )
    )


# ---------------------------------------------------------------------------
# degree_assortativity
# ---------------------------------------------------------------------------

@query(
    "degree_assortativity",
    oracle=f"""
WITH {_LPA_EDGES}
, deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM bi GROUP BY n
), pairs AS (
  SELECT du.d AS x, dv.d AS y
  FROM bi JOIN deg du ON bi.n = du.n JOIN deg dv ON bi.m = dv.n
), s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM pairs
)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
       CASE WHEN (n * sxx - sx * sx) <= 0 OR (n * syy - sy * sy) <= 0
              THEN NULL
            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
       END AS assortativity
FROM s""",
    doc="Degree assortativity of the co-purchase graph: the Pearson "
    "correlation of endpoint degrees over every directed edge "
    "(Newman's r) — positive means hubs attach to hubs (social-like), "
    "negative means hub-and-spoke (technological/retail-like); it "
    "predicts how the graph fragments under node loss and how far "
    "LSH/partition locality can help. Exactness: the five sufficient "
    "statistics are exact HUGEINT/DECIMAL(38,0) sums of integer "
    "degrees, r is one double expression with sqrt per factor, and a "
    "degenerate (regular) graph renders NULL via integer guards. "
    "Plan: degree aggregate + two broadcast degree joins + one "
    "moment reduce — linear in edges.",
    survey_ids=("M4", "M7-G5"),
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, bi = _copurchase_edges(spark, sf_dir)
    deg = bi.groupBy("n").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pairs = (
        bi.join(F.broadcast(deg), "n")
        .select(F.col("d").alias("x"), "m")
        .join(
            F.broadcast(deg.select(F.col("n").alias("m"), F.col("d").alias("y"))),
            "m",
        )
        .select("x", "y")
    )
    s = pairs.agg(
        dec(F.count(F.lit(1))).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
        F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
    )
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        (F.col("n") / 2).cast("bigint").alias("n_edges"),
        F.when((dx <= 0) | (dy <= 0), F.lit(None).cast("double"))
        .otherwise(
            N.rnd(
                num.cast("double")
                / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
                6,
            )
        )
        .alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# modularity_lpa
# ---------------------------------------------------------------------------

@query(
    "modularity_lpa",
    oracle=f"""
WITH {_LPA_EDGES}
, lab0 AS (
  SELECT DISTINCT n, n AS lab FROM bi
)
{_LPA_ROUND.format(r=1, p=0)}
{_LPA_ROUND.format(r=2, p=1)}
{_LPA_ROUND.format(r=3, p=2)}
, m AS (
  SELECT CAST(count(*) AS HUGEINT) AS m FROM edges
), within AS (
  SELECT CAST(count(*) AS HUGEINT) AS e_in
  FROM edges e
  JOIN lab3 lu ON e.u = lu.n
  JOIN lab3 lv ON e.v = lv.n
  WHERE lu.lab = lv.lab
), dsum AS (
  SELECT CAST(sum(dc * dc) AS HUGEINT) AS sum_dc2,
         CAST(count(*) AS BIGINT) AS n_communities
  FROM (
    SELECT l.lab, CAST(count(*) AS HUGEINT) AS dc
    FROM bi JOIN lab3 l ON bi.n = l.n
    GROUP BY l.lab)
)
SELECT d.n_communities,
       CAST(w.e_in AS BIGINT) AS intra_edges,
       CAST(m.m AS BIGINT) AS n_edges,
       round(CAST(4 * m.m * w.e_in - d.sum_dc2 AS DOUBLE)
             / (4.0 * CAST(m.m AS DOUBLE) * CAST(m.m AS DOUBLE)), 6)
         AS modularity
FROM m CROSS JOIN within w CROSS JOIN dsum d""",
    doc="Newman modularity of the label-propagation partition: Q = "
    "sum_c [e_c/m - (d_c/2m)^2] evaluated as the EXACT integer "
    "expression (4m*sum(e_c) - sum(d_c^2)) / (4m^2) — the quality "
    "score that says whether label_propagation found real structure "
    "(Q near 0: none; Q > 0.3: strong communities). Reruns the same "
    "3 deterministic synchronous LPA rounds (same tie-breaks), then "
    "one labels join per edge endpoint and two integer aggregates; "
    "the single double division happens at render. Plan: the LPA "
    "rounds dominate (edges shuffle per round); modularity itself "
    "adds two broadcast-label joins and scalar reduces.",
    survey_ids=("M4", "M7-G6"),
)
def modularity_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # r11: _order_items fan-out MEASURED AND REJECTED here (4.66 s →
    # 5.21 s best-of-5): the wide checkpoint of `bi` makes the three
    # tiny LPA rounds and the three readout consumers pay ~10× the
    # task-scheduling overhead, which outweighs the faster edge build.
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    bi = edges.select(
        F.col("u").alias("n"), F.col("v").alias("m")
    ).unionByName(
        edges.select(F.col("v").alias("n"), F.col("u").alias("m"))
    ).localCheckpoint(eager=True)
    lab = bi.select("n").distinct().select("n", F.col("n").alias("lab"))
    for _ in range(3):
        votes = (
            bi.join(
                lab.select(
                    F.col("n").alias("m"), F.col("lab").alias("nlab")
                ),
                "m",
            )
            .groupBy("n", "nlab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        lab = (
            votes.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("n").orderBy(
                        F.col("c").desc(), "nlab"
                    )
                ),
            )
            .filter(F.col("rk") == 1)
            .select("n", F.col("nlab").alias("lab"))
            .localCheckpoint(eager=True)
        )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = edges.agg(dec(F.count(F.lit(1))).alias("m"))
    lu = lab.select(F.col("n").alias("u"), F.col("lab").alias("lu"))
    lv = lab.select(F.col("n").alias("v"), F.col("lab").alias("lv"))
    within = (
        edges.join(F.broadcast(lu), "u")
        .join(F.broadcast(lv), "v")
        .filter(F.col("lu") == F.col("lv"))
        .agg(dec(F.count(F.lit(1))).alias("e_in"))
    )
    dsum = (
        bi.join(F.broadcast(lab), "n")
        .groupBy("lab")
        .agg(dec(F.count(F.lit(1))).alias("dc"))
        .agg(
            F.sum(F.col("dc") * F.col("dc")).alias("sum_dc2"),
            F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        )
    )
    return (
        m.crossJoin(F.broadcast(within))
        .crossJoin(F.broadcast(dsum))
        .select(
            "n_communities",
            F.col("e_in").cast("bigint").alias("intra_edges"),
            F.col("m").cast("bigint").alias("n_edges"),
            N.rnd(
                (
                    F.lit(4) * F.col("m") * F.col("e_in")
                    - F.col("sum_dc2")
                ).cast("double")
                / (
                    F.lit(4.0)
                    * F.col("m").cast("double")
                    * F.col("m").cast("double")
                ),
                6,
            ).alias("modularity"),
        )
    )


# ---------------------------------------------------------------------------
# jaccard_link_prediction (round 6)
# ---------------------------------------------------------------------------

def _copurchase_edges(spark: SparkSession, sf_dir: str):
    """(edges(u<v), bi(n,m)) of the co-purchase graph — the shared
    derivation of the graph-mining family (same SQL: _LPA_EDGES)."""
    li = load_table(spark, sf_dir, "lineitem")
    items = _order_items(li)
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        # r11: pin once — every caller consumes edges/bi through several
        # plan branches (degree census, wedge sides, anti-join), and the
        # edge list is node²-bounded, never corpus-sized. Trade (r12
        # ADVICE): localCheckpoint truncates lineage, so on executor loss
        # the query FAILS and is resubmitted rather than recomputing; the
        # checkpointed edge list also occupies executor local storage for
        # the query's lifetime (bounded as above; see SCALE.md rule 7).
        .localCheckpoint(eager=True)
    )
    bi = edges.select(
        F.col("u").alias("n"), F.col("v").alias("m")
    ).unionByName(
        edges.select(F.col("v").alias("n"), F.col("u").alias("m"))
    )
    return edges, bi


@query(
    "jaccard_link_prediction",
    oracle=f"""
WITH {_LPA_EDGES}
, deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM bi GROUP BY n
), contrib AS (
  SELECT bi.n AS w, bi.m
  FROM bi JOIN deg ON bi.n = deg.n
  WHERE deg.d BETWEEN 2 AND {AA_HUB_CAP}
), wedges AS (
  SELECT a.m AS u, b.m AS v, CAST(count(*) AS BIGINT) AS n_common
  FROM contrib a JOIN contrib b
    ON a.w = b.w AND a.m < b.m
  GROUP BY 1, 2
), cand AS (
  SELECT w.* FROM wedges w
  ANTI JOIN edges e ON w.u = e.u AND w.v = e.v
), scored AS (
  SELECT c.u, c.v, c.n_common,
         du.d + dv.d - c.n_common AS n_union,
         floor(CAST(c.n_common AS DOUBLE) * 1e6
               / (du.d + dv.d - c.n_common) + 0.5) AS j6
  FROM cand c JOIN deg du ON c.u = du.n JOIN deg dv ON c.v = dv.n
)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       n_common, CAST(n_union AS BIGINT) AS n_union,
       round(j6 / 1e6, 4) AS jaccard
FROM scored
ORDER BY j6 DESC, u, v
LIMIT {AA_TOP_K}""",
    doc="Link prediction on the co-purchase graph by neighborhood "
    "Jaccard: for every candidate non-edge pair, |N(u) ∩ N(v)| / "
    "|N(u) ∪ N(v)| — the normalized common-neighbor predictor next "
    "to adamic_adar_links' rarity-weighted one (Jaccard punishes "
    "hub-heavy neighborhoods; AA discounts hub evidence smoothly — "
    "comparing the two top-20s is the standard link-prediction "
    "ablation). Candidates are generated through sub-hub wedges "
    f"(centers capped at degree {AA_HUB_CAP}, the AA production "
    "guard against deg^2 fanout on densifying graphs — cap shared "
    "with the oracle); union sizes come from the full exact degree "
    "table. The score is the exact integer ratio snapped to the "
    "1e-6 grid, so the TakeOrdered top-20 rank (j6 DESC, u, v) "
    "replays bit-identically. Plan: degree aggregate, capped wedge "
    "self-join, one anti-join, two broadcast degree joins, partial "
    "top-k — no uncapped quadratic anywhere.",
    survey_ids=("M4", "M7-G7"),
)
def jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, bi = _copurchase_edges(spark, sf_dir)
    deg = bi.groupBy("n").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    contrib = (
        bi.join(F.broadcast(deg), "n")
        .filter((F.col("d") >= 2) & (F.col("d") <= AA_HUB_CAP))
        .select(F.col("n").alias("w"), "m")
    )
    ca, cb = contrib.alias("ca"), contrib.alias("cb")
    wedges = (
        ca.join(
            cb,
            (F.col("ca.w") == F.col("cb.w"))
            & (F.col("ca.m") < F.col("cb.m")),
        )
        .groupBy(F.col("ca.m").alias("u"), F.col("cb.m").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    cand = wedges.join(edges, ["u", "v"], "left_anti")
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    n_union = F.col("du") + F.col("dv") - F.col("n_common")
    scored = (
        cand.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            "n_common",
            n_union.alias("n_union"),
            F.floor(
                F.col("n_common").cast("double") * 1e6 / n_union + 0.5
            ).alias("j6"),
        )
    )
    return (
        scored.orderBy(F.col("j6").desc(), "u", "v")
        .limit(AA_TOP_K)
        .select(
            N.big("u").alias("u"),
            N.big("v").alias("v"),
            "n_common",
            N.big("n_union").alias("n_union"),
            N.rnd(F.col("j6") / 1e6, 4).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# k_core_decomposition (round 6)
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 3

_KCORE_ROUND = """
, deg{r} AS (
  SELECT n, count(*) AS d FROM bi{p} GROUP BY n
), keep{r} AS (
  SELECT n FROM deg{r} WHERE d >= {k}
), bi{r} AS (
  SELECT b.n, b.m FROM bi{p} b
  SEMI JOIN keep{r} kn ON b.n = kn.n
  SEMI JOIN keep{r} km ON b.m = km.n
)"""


@query(
    "k_core_decomposition",
    oracle=f"""
WITH {_LPA_EDGES}
, bi0 AS (SELECT n, m FROM bi)
{_KCORE_ROUND.format(r=1, p=0, k=KCORE_K)}
{_KCORE_ROUND.format(r=2, p=1, k=KCORE_K)}
{_KCORE_ROUND.format(r=3, p=2, k=KCORE_K)}
SELECT r.round,
       CAST(r.n_nodes AS BIGINT) AS n_nodes,
       CAST(r.n_edges AS BIGINT) AS n_edges
FROM (
  SELECT CAST(1 AS BIGINT) AS round,
         (SELECT count(DISTINCT n) FROM bi1) AS n_nodes,
         (SELECT count(*) / 2 FROM bi1) AS n_edges
  UNION ALL
  SELECT 2, (SELECT count(DISTINCT n) FROM bi2),
         (SELECT count(*) / 2 FROM bi2)
  UNION ALL
  SELECT 3, (SELECT count(DISTINCT n) FROM bi3),
         (SELECT count(*) / 2 FROM bi3)
) r""",
    doc=f"k-core decomposition of the co-purchase graph (k = {KCORE_K}, "
    f"{KCORE_ROUNDS} unrolled peeling rounds): each round drops every "
    "node of degree < k and the edges touching it — the standard "
    "dense-subgraph extractor (graph-ML sampling, community seeding, "
    "spam-ring detection all start from the k-core). Output: the node "
    "and edge census after each peel; round 3 == round 2 means the "
    "peeling reached its fixpoint (the full decomposition iterates to "
    "convergence; bounded unrolling is the catalog's iteration "
    "discipline — dedup_clusters, pagerank_parts, label_propagation). "
    "Exact integer counts only; edges counted once (bi holds both "
    "directions, so count/2). Plan per round: one degree aggregate + "
    "two semi-joins, all on (node, neighbor) pairs — payload never "
    "widens, cost bounded by surviving-edge count which only shrinks.",
    survey_ids=("M4", "M7-G8"),
)
def k_core_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, bi = _copurchase_edges(spark, sf_dir)
    bi = bi.localCheckpoint(eager=True)
    out = []
    for r in range(1, KCORE_ROUNDS + 1):
        deg = bi.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= KCORE_K).select("n")
        bi = (
            bi.join(F.broadcast(keep), "n", "left_semi")
            .join(
                F.broadcast(keep.withColumnRenamed("n", "m")),
                "m",
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
        out.append(
            bi.agg(
                F.lit(r).cast("bigint").alias("round"),
                F.countDistinct("n").cast("bigint").alias("n_nodes"),
                (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


# ---------------------------------------------------------------------------
# hits_hubs_authorities (round 8, second window) — Kleinberg HITS on the
# directed customer -> supplier purchase graph, exact integer units
# (the two-sided eigenvector companion of the one-sided pagerank_parts)
# ---------------------------------------------------------------------------

_HITS_ROUNDS = 3
_HITS_UNITS = 1_000_000_000_000


def _hits_oracle() -> str:
    u = _HITS_UNITS
    ctes = [
        "edges AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS hub, "
        "l.l_suppkey AS auth FROM orders o "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey)",
        "hubs AS (SELECT hub FROM edges GROUP BY hub)",
        "nh AS (SELECT CAST(count(*) AS BIGINT) AS n_hubs FROM hubs)",
        f"h0 AS (SELECT hub, CAST({u} // n_hubs AS BIGINT) AS units "
        "FROM hubs CROSS JOIN nh)",
    ]
    for i in range(1, _HITS_ROUNDS + 1):
        ctes += [
            f"ar{i} AS (SELECT e.auth, CAST(sum(h.units) AS BIGINT) AS raw "
            f"FROM edges e JOIN h{i - 1} h USING (hub) GROUP BY e.auth)",
            f"at{i} AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM ar{i})",
            f"a{i} AS (SELECT auth, CAST(raw // greatest(tot // {u}, 1) "
            f"AS BIGINT) AS units FROM ar{i} CROSS JOIN at{i})",
            f"hr{i} AS (SELECT e.hub, CAST(sum(a.units) AS BIGINT) AS raw "
            f"FROM edges e JOIN a{i} a USING (auth) GROUP BY e.hub)",
            f"ht{i} AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM hr{i})",
            f"h{i} AS (SELECT hub, CAST(raw // greatest(tot // {u}, 1) "
            f"AS BIGINT) AS units FROM hr{i} CROSS JOIN ht{i})",
        ]
    r = _HITS_ROUNDS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT 'hub' AS role, CAST(hub AS BIGINT) AS node_id,
       units AS score_units, CAST(rk AS BIGINT) AS rank
FROM (SELECT hub, units,
             row_number() OVER (ORDER BY units DESC, hub) AS rk FROM h{r})
WHERE rk <= 10
UNION ALL
SELECT 'authority' AS role, CAST(auth AS BIGINT) AS node_id,
       units AS score_units, CAST(rk AS BIGINT) AS rank
FROM (SELECT auth, units,
             row_number() OVER (ORDER BY units DESC, auth) AS rk FROM a{r})
WHERE rk <= 10"""
    )


@query(
    "hits_hubs_authorities",
    oracle=_hits_oracle(),
    doc=f"HITS hubs & authorities (Kleinberg 1999), {_HITS_ROUNDS} "
    "mutual-reinforcement iterations unrolled over the directed "
    "customer -> supplier purchase graph (hubs = broad buyers, "
    "authorities = widely-bought-from suppliers) in EXACT INTEGER "
    "arithmetic: scores live in integer units (10^12 total mass per "
    "side) and each half-step is a BIGINT sum over in-edges followed "
    "by integer renormalization units = raw // max(total // 10^12, 1) "
    "— the pagerank_parts discipline, so the fixpoint replays "
    "bit-identically with no float summation-order hazard. Per "
    "half-iteration: one edges-to-scores join + one aggregation on "
    "the opposite key — the canonical distributed power-step. Output: "
    "top-10 of each side with deterministic (units, id) tie-break. At "
    "100 TB the edge list shuffles once per half-step on bounded "
    "integer keys; score tables are node-cardinality, never "
    "edge-cardinality.",
    survey_ids=("M7-G9",),
)
def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _HITS_UNITS
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("hub"), F.col("l_suppkey").alias("auth"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hubs = edges.select("hub").distinct()
    nh = hubs.agg(F.count(F.lit(1)).cast("bigint").alias("n_hubs"))
    h = hubs.crossJoin(F.broadcast(nh)).select(
        "hub", F.expr(f"CAST({u} div n_hubs AS BIGINT)").alias("units")
    )

    def half_step(scores: DataFrame, from_key: str, to_key: str) -> DataFrame:
        # r11: checkpoint the per-half-step aggregate — `raw` is consumed
        # TWICE (the `tot` renormalizer and the normalized projection), so
        # without the pin every half-step doubled the recompute of all
        # earlier rounds (2^6 replays of the edge join by the final plan;
        # measured 14.9 s warm at sf0.1, 2.0 s with the pins). The frame
        # is node-cardinality, never edge-cardinality, and the pinned
        # sizes also let AQE pick the broadcast side of the next join
        # from real statistics.
        raw = (
            edges.join(scores, from_key)
            .groupBy(to_key)
            .agg(F.sum("units").cast("bigint").alias("raw"))
            .localCheckpoint(eager=True)
        )
        tot = raw.agg(F.sum("raw").cast("bigint").alias("tot"))
        return raw.crossJoin(F.broadcast(tot)).select(
            to_key,
            F.expr(f"CAST(raw div greatest(tot div {u}, 1) AS BIGINT)").alias(
                "units"
            ),
        )

    a = None
    for _ in range(_HITS_ROUNDS):
        a = half_step(h, "hub", "auth")
        h = half_step(a, "auth", "hub")

    def topk(scores: DataFrame, key: str, role: str) -> DataFrame:
        w = Window.partitionBy(F.lit(1)).orderBy(F.desc("units"), key)
        return (
            scores.orderBy(F.desc("units"), key)
            .limit(10)
            .select(
                F.lit(role).alias("role"),
                F.col(key).cast("bigint").alias("node_id"),
                F.col("units").alias("score_units"),
                F.row_number().over(w).cast("bigint").alias("rank"),
            )
        )

    return topk(h, "hub", "hub").unionAll(topk(a, "auth", "authority"))


# ---------------------------------------------------------------------------
# connected_components_minlabel (round 9) — the canonical distributed
# graph primitive the tier was missing next to LPA/k-core/PageRank
# ---------------------------------------------------------------------------

# Each round references the previous label frame TWICE (self + via
# edges); AS MATERIALIZED pins every cc{{i}} to one evaluation — the
# oracle-side analog of the Spark plan's per-round localCheckpoint
# (without it DuckDB may inline the doubly-referenced CTE chain, an
# exponential replay that made this the slowest window entry at 26.9 s
# in the round-9 pre-flight; materialized it is ~0.1 s, same rows).
_CC_ROUND_SQL = """cc{i} AS MATERIALIZED (
  SELECT c.n, least(min(c.lbl), coalesce(min(cl.lbl), min(c.lbl))) AS lbl
  FROM cc{j} c
  LEFT JOIN edges e ON e.src = c.n
  LEFT JOIN cc{j} cl ON cl.n = e.dst
  GROUP BY c.n
)"""

# _PR_EDGES_SQL is shared with the PageRank family, so the MATERIALIZED
# pin on its edges CTE is applied locally here rather than upstream.
_CC_EDGES_SQL = _PR_EDGES_SQL.replace(
    "), edges AS (", "), edges AS MATERIALIZED ("
)


@query(
    "connected_components_minlabel",
    oracle=f"""
WITH {_CC_EDGES_SQL},
cc0 AS MATERIALIZED (SELECT n, n AS lbl FROM deg),
{_CC_ROUND_SQL.format(i=1, j=0)},
{_CC_ROUND_SQL.format(i=2, j=1)},
{_CC_ROUND_SQL.format(i=3, j=2)},
{_CC_ROUND_SQL.format(i=4, j=3)},
chg AS (
  SELECT CAST(coalesce(sum(CASE WHEN a.lbl <> b.lbl THEN 1 END), 0)
              AS BIGINT) AS n_changed
  FROM cc4 a JOIN cc3 b ON a.n = b.n
), sizes AS (
  SELECT lbl, CAST(count(*) AS BIGINT) AS sz FROM cc4 GROUP BY lbl
)
SELECT CAST(sz AS BIGINT) AS component_size,
       CAST(count(*) AS BIGINT) AS n_components,
       CAST(min(lbl) AS BIGINT) AS min_label,
       (SELECT n_changed FROM chg) AS n_changed_last_round
FROM sizes GROUP BY sz""",
    doc="Connected components by synchronous min-label propagation over "
    "the co-purchase graph (the canonical distributed CC: every node "
    "starts labeled with its own id; each round every node takes the "
    "min of its label and its neighbors' — the HashMin/'small-star' "
    "half of Kiveris et al. 2014). FOUR unrolled rounds, each one "
    "frontier⋈edges join + a dst-keyed min aggregate — integer labels "
    "only, so the fixpoint is order-free and bit-identical on both "
    "engines (no float propagation can flip a min). Convergence is "
    "attested honestly: n_changed_last_round counts round-3→4 label "
    "flips (0 = converged within the unroll; >0 means a component "
    "with diameter >4 remains split and BOTH engines report the same "
    "split). Readout = component-size census + min component label. "
    "Scale: per round the payload is one (node, label) pair per edge "
    "— each round is a single edges⋈labels join + grouped min over the "
    "self-loop-augmented pinned edge list (r12: single-reference "
    "rounds, pins only where a frame is consumed twice); at 100 TB "
    "this is the alternating-star pattern with labels shuffling once "
    "per round, never the corpus.",
    survey_ids=("M7-G10",),
)
def connected_components_minlabel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # r12 (round-11 verdict ask #4): the edge build is the shared
    # _copurchase_edges derivation (was re-inlined here); and each label
    # round used to reference the previous frame TWICE (own-label union +
    # neighbor join), which forced an eager localCheckpoint per round.
    # Adding explicit SELF-LOOPS to the pinned edge list makes a round a
    # single join + grouped min that references the label frame ONCE:
    #   min over {lbl(m) : m in N(n) ∪ {n}}  ==  least(own, min(neighbors))
    # — algebraically identical to the r11 union+grouped-min shape. Only
    # lbl3 and lbl4 keep pins — each is genuinely consumed twice (lbl3:
    # round 4 + the flip census; lbl4: flip census + size census).
    # Rounds 1-3 run as linear lineage inside one job.
    # Measured (alternated fresh-process best-of-4, sf0.1/32, both
    # orders): r11 shape 5.600/5.988/5.582/5.203 s vs this re-plan
    # 4.378/4.478/4.291 s.
    _, bi = _copurchase_edges(spark, sf_dir)
    nodes = bi.select(F.col("n").alias("src")).distinct()
    edges = (
        bi.select(F.col("n").alias("src"), F.col("m").alias("dst"))
        .unionByName(nodes.select("src", F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    lbl = edges.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("n"), F.col("src").alias("lbl")
    )
    prev = lbl
    for rnd in range(4):
        prev = lbl
        if rnd == 3:
            prev = prev.localCheckpoint(eager=True)
        lbl = (
            edges.join(
                prev.select(F.col("n").alias("dst"), F.col("lbl")), "dst"
            )
            .select(F.col("src").alias("n"), "lbl")
            .groupBy("n")
            .agg(F.min("lbl").alias("lbl"))
        )
    # lbl4 is consumed twice (flip census + size census) — pin once
    lbl = lbl.localCheckpoint(eager=True)
    chg = (
        lbl.alias("a")
        .join(prev.alias("b"), F.col("a.n") == F.col("b.n"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("a.lbl") != F.col("b.lbl"), 1)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_changed")
        )
    )
    sizes = lbl.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    return (
        sizes.groupBy("sz")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_components"),
            F.min("lbl").cast("bigint").alias("min_label"),
        )
        .crossJoin(F.broadcast(chg))
        .select(
            F.col("sz").cast("bigint").alias("component_size"),
            "n_components",
            "min_label",
            F.col("n_changed").alias("n_changed_last_round"),
        )
    )
