"""Semantic invariants for the round-4 operators — properties the
DuckDB differential cannot express (it proves engine agreement, not
that the SHARED semantics are the intended ones)."""

from __future__ import annotations

import pyspark.sql.functions as F

from project_bigdata_spark.plans.catalog import load_all


def _q(name):
    return load_all()[name].builder


def test_weighted_median_monotone(spark, sf_dir):
    rows = _q("weighted_median_delay")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.wp25_days <= r.wp50_days <= r.wp75_days <= r.wp90_days
        assert r.total_weight > 0


def test_ohlc_bounds(spark, sf_dir):
    df = _q("ohlc_bars")(spark, sf_dir)
    bad = df.filter(
        (F.col("low") > F.col("open"))
        | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open"))
        | (F.col("high") < F.col("close"))
    )
    assert bad.count() == 0


def test_pareto_frontier_is_nondominated(spark, sf_dir):
    out = _q("pareto_frontier_suppliers")(spark, sf_dir)
    a = out.alias("a")
    b = out.alias("b")
    # no frontier member strictly dominated by another member of the
    # same nation's frontier
    dominated = a.join(
        b,
        (F.col("a.nationkey") == F.col("b.nationkey"))
        & (F.col("b.revenue") >= F.col("a.revenue"))
        & (F.col("b.worst_delay") <= F.col("a.worst_delay"))
        & (
            (F.col("b.revenue") > F.col("a.revenue"))
            | (F.col("b.worst_delay") < F.col("a.worst_delay"))
        ),
    )
    assert dominated.count() == 0
    # frontier delays strictly decrease as revenue decreases per nation
    rows = out.orderBy("nationkey", F.col("revenue").desc()).collect()
    by_nation: dict[int, list] = {}
    for r in rows:
        by_nation.setdefault(r.nationkey, []).append(r)
    for rs in by_nation.values():
        seen_vecs = {(r.revenue, r.worst_delay) for r in rs}
        delays = [r.worst_delay for r in rs]
        # distinct vectors sorted by revenue desc must have strictly
        # decreasing delay (ties = same vector owned by several suppliers)
        distinct_delays = []
        for v in sorted(seen_vecs, key=lambda v: (-v[0], v[1])):
            distinct_delays.append(v[1])
        assert distinct_delays == sorted(set(distinct_delays), reverse=True)
        assert min(delays) == distinct_delays[-1]


def test_scd2_pit_join_preserves_orders(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    out = _q("scd2_point_in_time_join")(spark, sf_dir)
    n_orders = load_table(spark, sf_dir, "orders").count()
    # every order matched EXACTLY one dimension version
    assert out.agg(F.sum("n_orders")).first()[0] == n_orders
    # both versions are actually exercised (backdated facts hit v1)
    versions = {r.version for r in out.select("version").distinct().collect()}
    assert versions == {1, 2}


def test_mmr_rerank_shape(spark, sf_dir):
    rows = _q("mmr_rerank")(spark, sf_dir).orderBy("sel_rank").collect()
    assert [r.sel_rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5
    # greedy anchor = the most query-similar candidate
    assert rows[0].sim_to_query == max(r.sim_to_query for r in rows)


def test_ks_drift_bounds(spark, sf_dir):
    for r in _q("ks_drift_by_type")(spark, sf_dir).collect():
        assert 0.0 <= r.ks_stat <= 1.0
        assert r.n_early > 0 and r.n_late > 0


def test_grouping_sets_total_row(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    out = _q("grouping_sets_profile")(spark, sf_dir)
    total = out.filter((F.col("g_type") == 1) & (F.col("g_day") == 1)).collect()
    assert len(total) == 1
    assert total[0].n_events == load_table(spark, sf_dir, "events").count()


def test_quantile_normalize_monotone_in_rank(spark, sf_dir):
    rows = (
        _q("quantile_normalize")(spark, sf_dir)
        .orderBy("dim", "rnk")
        .collect()
    )
    assert rows
    by_dim: dict[int, list] = {}
    for r in rows:
        by_dim.setdefault(r.dim, []).append(r)
    for rs in by_dim.values():
        vals = [r.qn_val for r in sorted(rs, key=lambda r: r.rnk)]
        assert vals == sorted(vals)


def test_audience_overlap_bounds(spark, sf_dir):
    for r in _q("audience_overlap")(spark, sf_dir).collect():
        assert r.n_both <= min(r.n_a, r.n_b)
        assert 0.0 <= r.jaccard <= 1.0


def test_corr_matrix_bounds(spark, sf_dir):
    rows = _q("corr_matrix_lineitem")(spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 <= r.pearson_r <= 1.0


def test_time_weighted_avg_bounds(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    out = _q("time_weighted_avg")(spark, sf_dir).collect()
    assert out
    lo, hi = (
        load_table(spark, sf_dir, "events")
        .agg(F.min("value"), F.max("value"))
        .first()
    )
    for r in out:
        assert lo - 1e-6 <= r.twap <= hi + 1e-6
        assert r.total_us > 0


def test_loo_encode_excludes_self(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    stats = {
        r.event_type: (r.n, float(r.s))
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("s"),
        )
        .collect()
    }
    for r in _q("loo_target_encode")(spark, sf_dir).collect():
        n, s = stats[r.event_type]
        expect = (s - r.value) / (n - 1)
        assert abs(expect - r.loo_enc) < 1e-4  # value col is rounded to 4dp


def test_json_pack_unpack_row_budget(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    out = _q("json_pack_unpack")(spark, sf_dir)
    total = out.agg(F.sum("n_recent")).first()[0]
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .select(F.least(F.col("count"), F.lit(3)).alias("m"))
        .agg(F.sum("m"))
        .first()[0]
    )
    assert total == per_user


def test_custom_state_totals(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    out = _q("custom_state_stream_attested")(spark, sf_dir)
    assert (
        out.agg(F.sum("n_events")).first()[0]
        == load_table(spark, sf_dir, "events").count()
    )


def test_stream_stream_join_pairs_dominate_users(spark, sf_dir):
    for r in _q("stream_stream_join_attested")(spark, sf_dir).collect():
        assert r.n_pairs >= r.n_users > 0


def test_triangle_count_consistency(spark, sf_dir):
    r = _q("triangle_count")(spark, sf_dir).first()
    assert r.n_nodes > 0 and r.n_edges > 0
    # a simple undirected graph carries at most C(n,2) edges and
    # every triangle needs 3 distinct edges
    assert r.n_edges <= r.n_nodes * (r.n_nodes - 1) // 2
    assert r.n_triangles <= r.n_edges * (r.n_edges - 1) // 6 + 1


def test_pagerank_mass_and_order(spark, sf_dir):
    rows = _q("pagerank_parts")(spark, sf_dir).collect()
    assert len(rows) == 20
    units = [r.pr_units for r in rows]
    assert units == sorted(units, reverse=True)
    # integer mass: every rank positive and below total mass
    for u in units:
        assert 0 < u < 1_000_000_000_000


def test_variant_shred_totals(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    out = _q("variant_shred")(spark, sf_dir)
    assert (
        out.agg(F.sum("n_events")).first()[0]
        == load_table(spark, sf_dir, "events").count()
    )
    for r in out.collect():
        assert r.k_min <= r.k_max


def test_recursive_reachability_frontier(spark, sf_dir):
    rows = {r.hop: r for r in _q("recursive_reachability")(spark, sf_dir).collect()}
    # hop 0 is exactly the seed node
    assert rows[0].n_parts == 1
    assert set(rows) <= {0, 1, 2, 3}


def test_sql_udf_matches_inline(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    from project_bigdata_spark.plans import _norm as N

    out = _q("sql_udf_pipeline")(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    inline = li.groupBy("l_returnflag").agg(
        N.sum_rev2("l_extendedprice", "l_discount").alias("net_revenue")
    )
    got = {r.l_returnflag: r.net_revenue for r in out.collect()}
    want = {r.l_returnflag: r.net_revenue for r in inline.collect()}
    assert got == want
