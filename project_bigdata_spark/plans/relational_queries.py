"""Relational / join query catalog (SURVEY.md §2.4, build-plan M4).

TPC-H-shaped queries over the driver's star schema. These are additive
relative to the reference (which designs joins away — §2.4) and are the
bench headliners: they exercise broadcast vs shuffle join choice, partial
aggregation, and top-k pushdown at sf0.1 and beyond.

Money arithmetic is done in DECIMAL on both engines (exact, order-
independent) and only cast to rounded DOUBLE in the final projection, so
the driver's value-hash compare is immune to float summation order.

Scale notes: region/nation/part/supplier/customer are broadcast-size dims
even at 100 TB (they grow with SF far slower than facts); lineitem/orders
joins shuffle on the order key — co-partitioned once, reused across the
plan by Catalyst. Top-k uses sort+limit which Spark runs as per-partition
top-k then a k-row merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.operators import joins as J
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table


# Exact integer revenue term used across queries, in 1e-4 units:
# ep_cents * (100 - disc_cents). Integer arithmetic has no engine-
# delegated rounding (round-5 hardening; see _norm.cents) — sums render
# as DOUBLE with one /1e4 at the end.
_EP_C = N.sql_cents("l_extendedprice")
_DISC_C = N.sql_cents("l_discount")
_TAX_C = N.sql_cents("l_tax")
_QTY_C = N.sql_cents("l_quantity")
_OTP_C = N.sql_cents("o_totalprice")
_VAL_C = N.sql_cents("value")
REVENUE_SQL = f"({_EP_C} * (100 - {_DISC_C}))"


def _revenue() -> Column:
    """Integer revenue term in 1e-4 units (mirror of ``REVENUE_SQL``)."""
    return N.cents("l_extendedprice") * (F.lit(100) - N.cents("l_discount"))


def _sum_dbl(col: Column, unit: float) -> Column:
    """Exact DECIMAL(38,0) sum of an integer term, rendered as DOUBLE in
    natural units (``unit`` = 1e2 for cents, 1e4 for revenue, ...)."""
    return F.sum(col.cast("decimal(38,0)")).cast("double") / F.lit(unit)


@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       round(CAST(sum({_QTY_C}) AS DOUBLE) / 1e2, 2) AS sum_qty,
       round(CAST(sum({_EP_C}) AS DOUBLE) / 1e2, 2) AS sum_base_price,
       round(CAST(sum({REVENUE_SQL}) AS DOUBLE) / 1e4, 2) AS sum_disc_price,
       round(CAST(sum({REVENUE_SQL} * (100 + {_TAX_C})) AS DOUBLE) / 1e6, 2)
         AS sum_charge,
       round(CAST(sum({_QTY_C}) AS DOUBLE) / 1e2 / count(*), 4) AS avg_qty,
       round(CAST(sum({_EP_C}) AS DOUBLE) / 1e2 / count(*), 4) AS avg_price,
       round(CAST(sum({_DISC_C}) AS DOUBLE) / 1e2 / count(*), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
    doc="TPC-H Q1 shape: scan-heavy 2-key groupBy with 8 aggregates; the "
    "canonical partial/final hash-aggregation benchmark.",
    headline=True,
    survey_ids=("A1", "O1"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    revenue = _revenue()
    qty_c, ep_c, disc_c = (
        N.cents("l_quantity"),
        N.cents("l_extendedprice"),
        N.cents("l_discount"),
    )
    charge = revenue * (F.lit(100) + N.cents("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(_sum_dbl(qty_c, 1e2), 2).alias("sum_qty"),
            F.round(_sum_dbl(ep_c, 1e2), 2).alias("sum_base_price"),
            F.round(_sum_dbl(revenue, 1e4), 2).alias("sum_disc_price"),
            F.round(_sum_dbl(charge, 1e6), 2).alias("sum_charge"),
            F.round(_sum_dbl(qty_c, 1e2) / cnt, 4).alias("avg_qty"),
            F.round(_sum_dbl(ep_c, 1e2) / cnt, 4).alias("avg_price"),
            F.round(_sum_dbl(disc_c, 1e2) / cnt, 4).alias("avg_disc"),
            cnt.cast("bigint").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       round(CAST(sum({REVENUE_SQL}) AS DOUBLE) / 1e4, 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY sum({REVENUE_SQL}) DESC, l_orderkey
LIMIT 10""",
    doc="TPC-H Q3 shape: dim-filtered 3-way join + group + top-k. Customer "
    "broadcasts; orders/lineitem shuffle on the order key.",
    headline=True,
    survey_ids=("M4", "W5"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    joined = l.join(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
        l.l_orderkey == o.o_orderkey,
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_revenue().cast("decimal(38,0)")).alias("rev_exact")
    )
    return (
        agg.orderBy(F.desc("rev_exact"), "l_orderkey")
        .limit(10)
        .select(
            N.big("l_orderkey").alias("l_orderkey"),
            F.round(F.col("rev_exact").cast("double") / F.lit(1.0e4), 2).alias(
                "revenue"
            ),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
    )


@query(
    "q5_region_revenue",
    oracle=f"""
SELECT n_name,
       round(CAST(sum({REVENUE_SQL}) AS DOUBLE) / 1e4, 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name""",
    doc="TPC-H Q5 shape: 6-way star join (4 broadcast dims + fact-fact "
    "shuffle) with the local-supplier nation-match condition.",
    headline=True,
    survey_ids=("M4",),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(_sum_dbl(_revenue(), 1e4), 2).alias("revenue")
    )


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority""",
    doc="TPC-H Q4 shape: EXISTS as a left-semi join, then groupBy.",
    survey_ids=("M4",),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    hit = J.semi_join(o, l, on="o_orderkey")
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q10_top_customers",
    oracle=f"""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       round(CAST(sum({REVENUE_SQL}) AS DOUBLE) / 1e4, 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY sum({REVENUE_SQL}) DESC, c_custkey
LIMIT 20""",
    doc="TPC-H Q10 shape: returned-item revenue by customer, top 20.",
    survey_ids=("M4", "W5"),
)
def q10_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(_revenue().cast("decimal(38,0)")).alias("rev_exact")
    )
    return (
        agg.orderBy(F.desc("rev_exact"), "c_custkey")
        .limit(20)
        .select(
            N.big("c_custkey").alias("c_custkey"),
            "c_name",
            "n_name",
            F.round(F.col("rev_exact").cast("double") / F.lit(1.0e4), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "broadcast_dim_join",
    oracle=f"""
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(CAST(sum({_QTY_C}) AS DOUBLE) / 1e2, 2) AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand""",
    doc="The dim_enrich operator: broadcast hash join fact x part — the "
    "Spark-native form of the reference's ingest-time denormalization "
    "(collect_data.py:220-234). Fact side never shuffles for the join.",
    survey_ids=("M4",),
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    enriched = J.dim_enrich(l, p.select("l_partkey", "p_brand"), on="l_partkey")
    return enriched.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(_sum_dbl(N.cents("l_quantity"), 1e2), 2).alias("total_qty"),
    )


@query(
    "semi_join_customers",
    oracle="""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderstatus = 'O')""",
    doc="Left-semi join (EXISTS): customers with at least one open order.",
    survey_ids=("M4",),
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return J.semi_join(c, o, on="c_custkey").select(
        N.big("c_custkey").alias("c_custkey"), "c_name"
    )


@query(
    "anti_join_customers",
    oracle="""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    doc="Left-anti join (NOT EXISTS): customers who never ordered.",
    survey_ids=("M4",),
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return J.anti_join(c, o, on="c_custkey").select(
        N.big("c_custkey").alias("c_custkey"), "c_name"
    )


@query(
    "orders_running_total",
    oracle=f"""
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       round(CAST(sum({_OTP_C})
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS DOUBLE) / 1e2, 2) AS running_total
FROM orders""",
    doc="Window running sum per customer — cumulative frame, exact decimal.",
    survey_ids=("W3",),
)
def orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        N.big("o_custkey").alias("o_custkey"),
        N.big("o_orderkey").alias("o_orderkey"),
        F.round(
            F.sum(N.cents("o_totalprice")).over(w).cast("double") / F.lit(100.0),
            2,
        ).alias("running_total"),
    )


@query(
    "orders_lag_lead",
    oracle="""
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       round(o_totalprice, 2) AS o_totalprice,
       round(lag(o_totalprice)  OVER w, 2) AS prev_price,
       round(lead(o_totalprice) OVER w, 2) AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    doc="W1/W2 shape on orders: lag/lead per entity in event order — the "
    "feature-engine primitives (data_loader.py:141-143, train_lightgbm.py:169).",
    survey_ids=("W1", "W2"),
)
def orders_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        N.big("o_custkey").alias("o_custkey"),
        N.big("o_orderkey").alias("o_orderkey"),
        N.rnd("o_totalprice", 2).alias("o_totalprice"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
    )


@query(
    "pivot_type_avg",
    oracle=f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       round(CAST(sum({_VAL_C}) FILTER (WHERE event_type = 'click') AS DOUBLE) / 1e2
             / count(*) FILTER (WHERE event_type = 'click'), 4) AS click,
       round(CAST(sum({_VAL_C}) FILTER (WHERE event_type = 'view') AS DOUBLE) / 1e2
             / count(*) FILTER (WHERE event_type = 'view'), 4) AS "view",
       round(CAST(sum({_VAL_C}) FILTER (WHERE event_type = 'purchase') AS DOUBLE) / 1e2
             / count(*) FILTER (WHERE event_type = 'purchase'), 4) AS purchase,
       round(CAST(sum({_VAL_C}) FILTER (WHERE event_type = 'signup') AS DOUBLE) / 1e2
             / count(*) FILTER (WHERE event_type = 'signup'), 4) AS signup,
       round(CAST(sum({_VAL_C}) FILTER (WHERE event_type = 'error') AS DOUBLE) / 1e2
             / count(*) FILTER (WHERE event_type = 'error'), 4) AS error
FROM events GROUP BY user_id""",
    doc="Pivot: long->wide per-type averages — the engine's clean form of "
    "the reference's parallel-arrays Gold shape (SURVEY.md §1.2).",
    survey_ids=("A1", "F6"),
)
def pivot_type_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    pivoted = (
        e.groupBy(N.big("user_id").alias("user_id"))
        .pivot("event_type", types)
        .agg(N.avg_exact("value"))
    )
    return pivoted
