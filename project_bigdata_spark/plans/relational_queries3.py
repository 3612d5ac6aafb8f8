"""Third relational batch: profit rollups, scalar-max views, correlated
averages, and multi-exists shapes (TPC-H q9/q15/q17/q20/q21 adapted to the
driver's star schema — it has no partsupp table, so supply-cost terms use
``p_retailprice``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.operators import joins as J
from project_bigdata_spark.operators.joins import order_items
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.plans.relational_queries import (
    REVENUE_SQL,
    _revenue,
    _sum_dbl,
)

_EP_C = N.sql_cents("l_extendedprice")
_QTY_C = N.sql_cents("l_quantity")
_RP_C = N.sql_cents("p_retailprice")
from project_bigdata_spark.sources import load_table

# Integer profit term in 1e-6 units: revenue(1e-4)*100 minus
# 0.8*qty*retailprice expressed as qty_cents*retail_cents*80.
PROFIT_SQL = f"({REVENUE_SQL} * 100 - {_QTY_C} * {_RP_C} * 80)"



@query(
    "q9_nation_profit",
    oracle=f"""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum({PROFIT_SQL}) AS DOUBLE) / 1e6, 2) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%_1%'
GROUP BY n_name, year(o_orderdate)""",
    doc="TPC-H Q9 shape: profit (revenue - cost term) by supplier nation "
    "and order year across a 5-way join with a LIKE part filter.",
    survey_ids=("M4", "A7"),
)
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%_1%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = _revenue() * F.lit(100) - N.cents("l_quantity") * N.cents(
        "p_retailprice"
    ) * F.lit(80)
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return joined.groupBy(
        "n_name", F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(F.round(_sum_dbl(profit, 1e6), 2).alias("profit"))


@query(
    "q15_top_supplier",
    oracle=f"""
WITH revenue_view AS (
  SELECT l_suppkey AS supplier_no, sum({REVENUE_SQL}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       round(CAST(total_revenue AS DOUBLE) / 1e4, 2) AS total_revenue
FROM supplier JOIN revenue_view ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue_view)""",
    doc="TPC-H Q15 shape: revenue view + scalar-max subquery (broadcast "
    "single-row max joined back) — exact decimal makes the max tie-free "
    "across engines.",
    survey_ids=("M4",),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue().cast("decimal(38,0)")).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("mx")
    )
    return s.join(top, s.s_suppkey == top.supplier_no).select(
        N.big("s_suppkey").alias("s_suppkey"),
        "s_name",
        F.round(
            F.col("total_revenue").cast("double") / F.lit(1.0e4), 2
        ).alias("total_revenue"),
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
WITH part_avg AS (
  SELECT l_partkey, 0.5 * (CAST(sum({_QTY_C}) AS DOUBLE) / 1e2
                           / count(*)) AS threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum({_EP_C}) AS DOUBLE) / 1e2 / 7.0, 2)
         AS avg_yearly
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
JOIN part_avg a ON l.l_partkey = a.l_partkey
WHERE p_brand = 'Brand#1' AND l.l_quantity < a.threshold""",
    doc="TPC-H Q17 shape: correlated per-part average decorrelated into an "
    "aggregate + join; small-quantity revenue estimate.",
    survey_ids=("M4", "A4"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.5)
            * (_sum_dbl(N.cents("l_quantity"), 1e2) / F.count(F.lit(1)))
        ).alias("threshold")
    )
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg, l.l_partkey == avg.pk)
        .filter(F.col("l_quantity") < F.col("threshold"))
    )
    return joined.agg(
        F.round(
            _sum_dbl(N.cents("l_extendedprice"), 1e2) / F.lit(7.0), 2
        ).alias("avg_yearly")
    )


@query(
    "q20_bulk_suppliers",
    oracle=f"""
WITH bulk AS (
  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand IN ('Brand#1', 'Brand#2')
  GROUP BY l_suppkey
  HAVING sum({_QTY_C}) > 5000
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM bulk)""",
    doc="TPC-H Q20 shape: semi-join against a HAVING-filtered aggregate "
    "(suppliers who moved bulk volume of the named brands).",
    survey_ids=("M4",),
)
def q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    bulk = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.sum(N.cents("l_quantity").cast("decimal(38,0)")).alias("q"))
        .filter(F.col("q") > 5000)
        .select("s_suppkey")
    )
    hit = J.semi_join(s, bulk, on="s_suppkey")
    return hit.join(F.broadcast(n), hit.s_nationkey == n.n_nationkey).select(
        N.big("s_suppkey").alias("s_suppkey"), "s_name", "n_name"
    )


@query(
    "q21_sole_returner",
    oracle="""
WITH order_stats AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R') AS n_ret
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(l.l_suppkey AS BIGINT) AS s_suppkey,
       CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS numwait
FROM lineitem l
JOIN order_stats os ON l.l_orderkey = os.l_orderkey
WHERE l.l_returnflag = 'R' AND os.n_supps > 1 AND os.n_ret = 1
GROUP BY l.l_suppkey""",
    doc="TPC-H Q21 shape: the exists/not-exists pair (other suppliers on "
    "the order; none of them returned) decorrelated into per-order "
    "distinct-count stats + join — one aggregation instead of two "
    "correlated subqueries per row.",
    survey_ids=("M4", "A5"),
)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    stats = l.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret"),
    )
    joined = (
        l.filter(F.col("l_returnflag") == "R")
        .join(stats, l.l_orderkey == stats.ok)
        .filter((F.col("n_supps") > 1) & (F.col("n_ret") == 1))
    )
    return joined.groupBy(N.big("l_suppkey").alias("s_suppkey")).agg(
        F.countDistinct("l_orderkey").alias("numwait")
    )


@query(
    "q8_market_share",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum({REVENUE_SQL}
                      * CASE WHEN n2.n_name = 'NATION_3' THEN 1 ELSE 0 END)
                  AS DOUBLE)
             / CAST(sum({REVENUE_SQL}) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN part      ON l_partkey = p_partkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
GROUP BY year(o_orderdate)""",
    doc="TPC-H Q8 shape: national market share — one supplier nation's "
    "revenue fraction of a region's yearly volume; conditional numerator "
    "and total share one decimal-exact aggregation pass (no second scan).",
    survey_ids=("M4", "A7"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rkey") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
    )
    rev = _revenue()
    is_target = F.when(F.col("supp_nation") == "NATION_3", F.lit(1)).otherwise(
        F.lit(0)
    )
    return joined.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        N.rnd(
            F.sum((rev * is_target).cast("decimal(38,0)")).cast("double")
            / F.sum(rev.cast("decimal(38,0)")).cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q11_important_parts",
    oracle=f"""
WITH pv AS (
  SELECT l_partkey, sum({_EP_C}) AS val
  FROM lineitem GROUP BY l_partkey
), tot AS (
  SELECT sum({_EP_C}) AS t FROM lineitem
)
SELECT CAST(pv.l_partkey AS BIGINT) AS l_partkey,
       round(CAST(pv.val AS DOUBLE) / 1e2, 2) AS value
FROM pv, tot
WHERE pv.val * 10000 > tot.t * 8""",
    doc="TPC-H Q11 shape: per-key value with a global-fraction HAVING "
    "threshold — the scalar subquery decorrelated to a broadcast one-row "
    "total (no driver collect, no second shuffle; decimal-exact compare).",
    survey_ids=("M4", "A3"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    ep_c = N.cents("l_extendedprice").cast("decimal(38,0)")
    pv = l.groupBy("l_partkey").agg(F.sum(ep_c).alias("val"))
    tot = l.agg(F.sum(ep_c).alias("t"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("val") * F.lit(10000) > F.col("t") * F.lit(8))
        .select(
            N.big("l_partkey").alias("l_partkey"),
            F.round(F.col("val").cast("double") / F.lit(100.0), 2).alias("value"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count""",
    doc="TPC-H Q13 shape: order-count distribution over ALL customers — "
    "the predicate lives in the LEFT JOIN condition (a WHERE would drop "
    "zero-order customers), then a two-level aggregation; expressed as "
    "filter-before-left-join so the scan prunes.",
    survey_ids=("M4", "A4"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(N.big("c_count").alias("c_count")).agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@query(
    "copurchase_affinity",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), tot AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n FROM items
), singles AS (
  SELECT l_partkey, CAST(count(*) AS DOUBLE) AS n_one
  FROM items GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS DOUBLE) AS n_both
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), scored AS (
  -- lift is rounded HERE, before the QUALIFY, so the top-20 ranks on
  -- the same 4-decimal grid the Spark side orders by (an unrounded
  -- ORDER BY would pick a different row set whenever two pairs differ
  -- only past 4 decimals and straddle rank 20)
  SELECT p.part_a, p.part_b, p.n_both,
         round(p.n_both * t.n / (sa.n_one * sb.n_one), 4) AS lift
  FROM pairs p
  JOIN singles sa ON sa.l_partkey = p.part_a
  JOIN singles sb ON sb.l_partkey = p.part_b
  CROSS JOIN tot t
  WHERE p.n_both >= 2
)
SELECT CAST(part_a AS BIGINT) AS part_a,
       CAST(part_b AS BIGINT) AS part_b,
       CAST(n_both AS BIGINT) AS n_orders_both,
       lift
FROM scored
QUALIFY row_number() OVER (ORDER BY lift DESC, part_a, part_b) <= 20""",
    doc="Part co-purchase affinity over the order baskets (the "
    "relational-side market basket, sibling of assoc_rules' session "
    "itemsets): distinct (order, part) pairs self-join ON THE ORDER "
    "KEY, so pair width is bounded by basket size (TPC-H orders carry "
    "<= 7 lines), never by catalog size; support >= 2 prunes noise "
    "pairs BEFORE the lift join and the top-20 is a TakeOrdered. The "
    "lift denominator joins per-part counts back via broadcast.",
    survey_ids=("M4", "A5", "M7-A30b"),
)
def copurchase_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # r11: same keyed fan-out as the graph family — the order-local
    # self-join otherwise runs on a one-split scan's single task (no-op
    # once the scan has natural splits). r12 (ADVICE): shared helper.
    items = order_items(li)
    tot = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    singles = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("double").alias("n_one")
    )
    b = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        items.withColumnRenamed("l_partkey", "part_a")
        .join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("double").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    sa = F.broadcast(singles.select(F.col("l_partkey").alias("part_a"),
                                    F.col("n_one").alias("n_a")))
    sb = F.broadcast(singles.select(F.col("l_partkey").alias("part_b"),
                                    F.col("n_one").alias("n_b")))
    scored = (
        pairs.join(sa, "part_a").join(sb, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            N.big("part_a").alias("part_a"),
            N.big("part_b").alias("part_b"),
            F.col("n_both").cast("bigint").alias("n_orders_both"),
            N.rnd(
                F.col("n_both") * F.col("n") / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), "part_a", "part_b"
    ).limit(20)


@query(
    "ship_delay_sla",
    oracle="""
WITH delays AS (
  SELECT o.o_orderpriority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), freq AS (
  SELECT o_orderpriority, delay_days,
         CAST(count(*) AS BIGINT) AS f
  FROM delays GROUP BY 1, 2
), cum AS (
  SELECT o_orderpriority, delay_days, f,
         sum(f) OVER (PARTITION BY o_orderpriority ORDER BY delay_days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c,
         sum(f) OVER (PARTITION BY o_orderpriority) AS n
  FROM freq
)
SELECT o_orderpriority,
       CAST(max(n) AS BIGINT) AS n_lines,
       CAST(min(CASE WHEN c >= ceil(0.50 * n) THEN delay_days END)
            AS BIGINT) AS p50_days,
       CAST(min(CASE WHEN c >= ceil(0.95 * n) THEN delay_days END)
            AS BIGINT) AS p95_days,
       CAST(max(delay_days) AS BIGINT) AS max_days
FROM cum GROUP BY 1""",
    doc="Ship-delay SLA percentiles per order priority (order date -> "
    "line ship date): the operational latency readout a fulfilment "
    "pipeline watches. Exact p50/p95 via the count-of-counts idiom — "
    "delays collapse to whole-day frequencies per priority (bounded "
    "cardinality: ~hundreds of distinct day values), the cumulative "
    "pick runs over those values, and the fact-scale work is ONE "
    "join + group pass. The orders side joins broadcast-eligible "
    "after AQE sizes it.",
    survey_ids=("M4", "A3", "F9", "M7-A31b"),
)
def ship_delay_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    delays = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias(
            "delay_days"
        ),
    )
    freq = delays.groupBy("o_orderpriority", "delay_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    wcum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("delay_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("o_orderpriority")
    cum = freq.select(
        "o_orderpriority",
        "delay_days",
        F.sum("f").over(wcum).alias("c"),
        F.sum("f").over(wall).alias("n"),
    )

    def pick(q: float) -> F.Column:
        return F.min(
            F.when(
                F.col("c") >= F.ceil(F.lit(q) * F.col("n")),
                F.col("delay_days"),
            )
        ).cast("bigint")

    return cum.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n_lines"),
        pick(0.50).alias("p50_days"),
        pick(0.95).alias("p95_days"),
        F.max("delay_days").cast("bigint").alias("max_days"),
    )
