"""Second relational batch: scan-heavy filters, conditional join aggs,
grouping sets, top-k by group-total, and sessionization.

Same normalization rules as relational_queries.py (exact DECIMAL money
math, BIGINT integrals, rounded-double presentation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.plans.relational_queries import (
    REVENUE_SQL,
    _revenue,
    _sum_dbl,
)

_EP_C = N.sql_cents("l_extendedprice")
_DISC_C = N.sql_cents("l_discount")
_QTY_C = N.sql_cents("l_quantity")
_OTP_C = N.sql_cents("o_totalprice")
_BAL_C = N.sql_cents("c_acctbal")
_VAL_C = N.sql_cents("value")
from project_bigdata_spark.sources import load_table


@query(
    "q6_forecast_revenue",
    oracle=f"""
SELECT round(CAST(sum({_EP_C} * {_DISC_C}) AS DOUBLE) / 1e4, 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.09
  AND l_quantity < 24""",
    doc="TPC-H Q6 shape: pure scan + triple predicate + global agg — the "
    "predicate-pushdown/codegen throughput benchmark (no shuffle at all "
    "beyond the final single-row reduce).",
    headline=True,
    survey_ids=("P9", "A3"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                _sum_dbl(
                    N.cents("l_extendedprice") * N.cents("l_discount"), 1e4
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q12_shipmode_priority",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
            AS BIGINT) AS high_line_count,
       CAST(count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
            AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag""",
    doc="TPC-H Q12 shape: fact-fact join + conditional counts by priority "
    "class (countIf over a join).",
    survey_ids=("A5", "M4"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = l.join(o, l.l_orderkey == o.o_orderkey)
    return joined.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


@query(
    "q14_promo_share",
    oracle=f"""
SELECT round(
  1.0e2 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL}
               ELSE 0 END) AS DOUBLE)
        / CAST(sum({REVENUE_SQL}) AS DOUBLE), 4) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""",
    doc="TPC-H Q14 shape: promo revenue share — conditional ratio over a "
    "broadcast dim join with an equality predicate on the promo type.",
    survey_ids=("M4", "A5"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0))
    return joined.agg(
        N.rnd(
            F.lit(100.0)
            * F.sum(promo.cast("decimal(38,0)")).cast("double")
            / F.sum(_revenue().cast("decimal(38,0)")).cast("double"),
            4,
        ).alias("promo_share")
    )


@query(
    "q18_large_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum({_QTY_C}) > 15000
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(CAST((SELECT sum({_QTY_C}) FROM lineitem
                   WHERE l_orderkey = o_orderkey) AS DOUBLE) / 1e2, 2) AS total_qty
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)""",
    doc="TPC-H Q18 shape: large-volume orders — HAVING subquery as a "
    "semi-join against an aggregated fact, then dim enrich.",
    survey_ids=("M4", "A1"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    totals = l.groupBy("l_orderkey").agg(
        F.sum(N.cents("l_quantity").cast("decimal(38,0)")).alias("qty_exact")
    )
    big = totals.filter(F.col("qty_exact") > 15000)
    joined = (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    return joined.select(
        N.big("c_custkey").alias("c_custkey"),
        N.big("o_orderkey").alias("o_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        N.rnd("o_totalprice", 2).alias("o_totalprice"),
        F.round(F.col("qty_exact").cast("double") / F.lit(100.0), 2).alias(
            "total_qty"
        ),
    )


@query(
    "q19_bracketed_revenue",
    oracle=f"""
SELECT round(CAST(sum({REVENUE_SQL}) AS DOUBLE) / 1e4, 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""",
    doc="TPC-H Q19 shape: disjunctive bracketed predicates across a "
    "broadcast join — the OR-of-ANDs pushdown stress case.",
    survey_ids=("M4", "P9"),
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    return joined.filter(cond).agg(
        F.round(_sum_dbl(_revenue(), 1e4), 2).alias("revenue")
    )


@query(
    "rollup_order_stats",
    oracle=f"""
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum({_OTP_C}) AS DOUBLE) / 1e2, 2)
         AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    doc="ROLLUP hierarchy totals (status -> priority -> grand total) — "
    "grouping-sets surface beyond the reference (it has none), one shuffle.",
    survey_ids=("A4",),
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(_sum_dbl(N.cents("o_totalprice"), 1e2), 2).alias(
                "total_price"
            ),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "cube_lineitem_flags",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)""",
    doc="CUBE over the two lineitem flags — all 2^2 grouping sets in one "
    "pass (Spark expands to a single expand+aggregate).",
    survey_ids=("A4",),
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
        )
    )


@query(
    "sessionize_events",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM gaps
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(CAST(max(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS session_end
FROM sess GROUP BY user_id, session_idx""",
    doc="Sessionization: lag-gap detection + running-sum session index + "
    "per-session rollup — the batch form of session_window, one shuffle "
    "on the entity key reused by both windows and the aggregation.",
    headline=True,
    survey_ids=("W1", "W3", "A1"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out_by_key

    # entity-keyed fan-out: one explicit exchange feeds both windows AND
    # the session rollup (all keyed on user_id), wide under AQE; no-op at
    # scale where the scan has enough splits
    e = fan_out_by_key(load_table(spark, sf_dir, "events"), "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs precision: a cast-to-long gap is whole seconds and would disagree
    # with the oracle's exact INTERVAL comparison on fractional-second gaps
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = e.withColumn(
        "session_idx",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy(
        N.big("user_id").alias("user_id"),
        N.big("session_idx").alias("session_idx"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        N.ts_str(F.min("ts"), micros=True).alias("session_start"),
        N.ts_str(F.max("ts"), micros=True).alias("session_end"),
    )


@query(
    "range_join_events",
    oracle="""
WITH purchases AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
  WHERE event_type = 'purchase'
), clicks AS (
  SELECT event_id AS c_id, user_id, ts AS c_ts, value AS c_value FROM events
  WHERE event_type = 'click'
)
SELECT CAST(p.p_id AS BIGINT) AS p_id,
       CAST(c.c_id AS BIGINT) AS c_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       round(c.c_value, 4) AS c_value
FROM purchases p JOIN clicks c
  ON p.user_id = c.user_id
 AND c.c_ts >= p.p_ts
 AND c.c_ts <= p.p_ts + INTERVAL 1 HOUR""",
    doc="Range join (operator Spark lacks): clicks within 1h after each "
    "purchase, via time-bucketize + explode-to-2-buckets + equi-join + "
    "exact filter — one shuffle, no per-key cross product. Oracle: DuckDB "
    "IEJoin on the plain inequality form.",
    survey_ids=("M4",),
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.rangejoin import range_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", "ts",
        F.col("value").alias("c_value"),
    )
    joined = range_join(purchases, clicks, key="user_id",
                        lo_seconds=0, hi_seconds=3600)
    return joined.select(
        N.big("p_id").alias("p_id"),
        N.big("c_id").alias("c_id"),
        N.big("user_id").alias("user_id"),
        N.rnd("c_value").alias("c_value"),
    )


@query(
    "multi_granularity_rollup",
    oracle=f"""
SELECT granularity,
       strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum({_VAL_C}) AS DOUBLE) / 1e2, 2) AS total
FROM (
  SELECT 'hour' AS granularity, date_trunc('hour', ts) AS bucket, event_type, value
  FROM events
  UNION ALL
  SELECT 'day', date_trunc('day', ts), event_type, value FROM events
  UNION ALL
  SELECT 'week', date_trunc('week', ts), event_type, value FROM events
)
GROUP BY granularity, bucket, event_type""",
    doc="Hypertable-style continuous-aggregate rollup: hour/day/week "
    "buckets materialized in one job (union of truncations -> single "
    "grouped aggregate; at scale each granularity partition-overwrites "
    "its own output path).",
    survey_ids=("A7", "P7"),
)
def multi_granularity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def level(name: str) -> DataFrame:
        return e.select(
            F.lit(name).alias("granularity"),
            F.date_trunc(name, "ts").alias("bucket"),
            "event_type",
            "value",
        )

    u = level("hour").unionByName(level("day")).unionByName(level("week"))
    return u.groupBy(
        "granularity", N.ts_str("bucket").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            _sum_dbl(N.cents("value"), 1e2), 2
        ).alias("total"),
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH s_geo AS (
  SELECT s_suppkey, s_name, s_acctbal, r_regionkey
  FROM supplier, nation, region
  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
), min_bal AS (
  SELECT r_regionkey, min(s_acctbal) AS min_bal FROM s_geo GROUP BY r_regionkey
), cheapest AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal
  FROM s_geo s JOIN min_bal m
    ON s.r_regionkey = m.r_regionkey AND s.s_acctbal = m.min_bal
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
       CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       round(s_acctbal, 2) AS s_acctbal
FROM part, cheapest
WHERE p_size <= 10
QUALIFY row_number() OVER (PARTITION BY p_partkey ORDER BY s_suppkey) = 1""",
    doc="TPC-H Q2 shape: correlated-min subquery (cheapest supplier per "
    "region) decorrelated into an aggregate + join — the standard Catalyst "
    "decorrelation pattern, written explicitly.",
    survey_ids=("M4",),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s_geo = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    min_bal = s_geo.groupBy("r_regionkey").agg(
        F.min("s_acctbal").alias("min_bal")
    )
    cheapest = s_geo.join(F.broadcast(min_bal), on="r_regionkey").filter(
        F.col("s_acctbal") == F.col("min_bal")
    )
    # The per-part winner (min s_suppkey among all cheapest rows) is the
    # same single supplier for every part, so reduce cheapest to that ONE
    # row first and broadcast it — no |part|x|cheapest| inflation, no
    # per-part window shuffle. TakeOrdered over the tiny cheapest set.
    winner = cheapest.select("s_suppkey", "s_name", "s_acctbal").orderBy(
        "s_suppkey"
    ).limit(1)
    return p.crossJoin(F.broadcast(winner)).select(
        N.big("p_partkey").alias("p_partkey"),
        N.big("s_suppkey").alias("s_suppkey"),
        "s_name",
        N.rnd("s_acctbal", 2).alias("s_acctbal"),
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size BETWEEN 1 AND 15
GROUP BY p_brand, p_type""",
    doc="TPC-H Q16 shape: distinct-count by two dim attributes over a "
    "broadcast join (count(DISTINCT) expands to a two-phase aggregate).",
    survey_ids=("M4", "A6"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(1, 15)
    )
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return joined.groupBy("p_brand", "p_type").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


@query(
    "q7_nation_pair_revenue",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(CAST(sum({REVENUE_SQL}) AS DOUBLE) / 1e4, 2) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""",
    doc="TPC-H Q7 shape: the same dimension joined twice under two roles "
    "(supplier nation x customer nation) with a symmetric pair predicate.",
    survey_ids=("M4",),
)
def q7_nation_pair_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        joined.filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.round(_sum_dbl(_revenue(), 1e4), 2).alias("revenue"))
    )


@query(
    "q22_idle_customers",
    oracle=f"""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum({_BAL_C}) AS DOUBLE) / 1e2, 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey""",
    doc="TPC-H Q22 shape: scalar-subquery threshold (global avg as a "
    "broadcast single row) + anti join + group — the no-orders "
    "above-average-balance census.",
    survey_ids=("M4", "A5"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators import joins as J

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    idle = J.anti_join(rich, o, on="c_custkey")
    return idle.groupBy(N.big("c_nationkey").alias("c_nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(
            _sum_dbl(N.cents("c_acctbal"), 1e2), 2
        ).alias("totacctbal"),
    )


@query(
    "ranking_suite",
    oracle="""
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(row_number()   OVER w AS BIGINT) AS rn,
       CAST(rank()         OVER w AS BIGINT) AS rnk,
       CAST(dense_rank()   OVER w AS BIGINT) AS drnk,
       CAST(ntile(4)       OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""",
    doc="The full ranking-function surface (row_number/rank/dense_rank/"
    "ntile/percent_rank/cume_dist) per entity — absent from the reference "
    "(SURVEY.md §2.5 'no ranking functions'), required for engine "
    "completeness.",
    survey_ids=("W5", "W6"),
)
def ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return o.select(
        N.big("o_custkey").alias("o_custkey"),
        N.big("o_orderkey").alias("o_orderkey"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        N.rnd(F.percent_rank().over(w), 6).alias("pct_rank"),
        N.rnd(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "set_ops",
    oracle="""
SELECT 'both' AS which, CAST(k AS BIGINT) AS nationkey FROM (
  SELECT c_nationkey AS k FROM customer
  INTERSECT
  SELECT s_nationkey AS k FROM supplier
)
UNION ALL
SELECT 'customer_only', CAST(k AS BIGINT) FROM (
  SELECT c_nationkey AS k FROM customer
  EXCEPT
  SELECT s_nationkey AS k FROM supplier
)""",
    doc="INTERSECT / EXCEPT set operators (absent from the reference — "
    "SURVEY.md §2.6 'No INTERSECT/EXCEPT'), completing the set-op surface.",
    survey_ids=("O3", "O4"),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    both = c.intersect(s).select(
        F.lit("both").alias("which"), N.big("k").alias("nationkey")
    )
    only = c.subtract(s).select(
        F.lit("customer_only").alias("which"), N.big("k").alias("nationkey")
    )
    return both.unionByName(only)


@query(
    "session_window_native",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM gaps
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       strftime(CAST(min(ts) AS TIMESTAMP),
                '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP),
                '%Y-%m-%d %H:%M:%S.%f') AS window_end
FROM sess GROUP BY user_id, session_idx""",
    doc="Native session_window in BATCH mode: Spark's built-in dynamic-gap "
    "session operator (the same function session_stream uses with a "
    "watermark) attested against the gaps-and-islands SQL formulation. "
    "Boundary semantics differ from sessionize_events on purpose: "
    "session_window opens a NEW session at gap >= 30min (window end is "
    "exclusive), the lag idiom at gap > 30min — both are correct "
    "sessionizations, and the differential oracle pins which one the "
    "native operator implements. One exchange on the session key.",
    survey_ids=("T2", "W1", "M7-W1"),
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    sess = e.groupBy(
        F.col("user_id"), F.session_window(F.col("ts"), "30 minutes").alias("_s")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    # _s.start/_s.end are the NATIVE operator's session bounds (min ts,
    # max ts + gap) — surfacing them, rather than recomputing from
    # min/max(ts), is what makes this a differential test of the
    # operator's window math itself.
    return sess.select(
        N.big("user_id").alias("user_id"),
        F.col("n_events"),
        N.ts_str(F.col("_s.start"), micros=True).alias("session_start"),
        N.ts_str(F.col("_s.end"), micros=True).alias("window_end"),
    )
