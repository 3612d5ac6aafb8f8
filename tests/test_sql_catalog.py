"""The raw-SQL interface: every ClickHouse-side analytic shape from the
reference runs as spark.sql over the registered views."""

from __future__ import annotations

import pytest

from project_bigdata_spark.plans import sql_catalog as SC


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    return SC.register_views(spark, sf_dir)


def test_all_views_registered(spark, views):
    expected = {"region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings",
                "bronze", "silver", "gold", "latest_per_entity"}
    assert expected <= set(views)
    for v in expected:
        assert spark.catalog.tableExists(v), v


def test_layer_stats_sql(spark, views):
    # clickhouse_queries.sql:9-32 shape over the medallion views
    row = spark.sql("""
        SELECT count(*) AS n, count(DISTINCT user_id) AS entities
        FROM silver
    """).first()
    assert row.n > 0 and row.entities > 0


def test_latest_per_entity_view(spark, views):
    dup = spark.sql("""
        SELECT user_id, count(*) AS c FROM latest_per_entity
        GROUP BY user_id HAVING count(*) > 1
    """)
    assert dup.count() == 0
    # and it really is the max hour per entity
    row = spark.sql("""
        SELECT count(*) AS bad FROM latest_per_entity l
        JOIN (SELECT user_id, max(hour_ts) AS mh FROM gold GROUP BY user_id) m
          ON l.user_id = m.user_id AND l.hour_ts <> m.mh
    """).first()
    assert row.bad == 0


def test_gold_arrays_queryable_in_sql(spark, views):
    # F6 lookup via map form, pure SQL
    row = spark.sql("""
        SELECT count(*) AS with_click
        FROM gold WHERE type_values['click'] IS NOT NULL
    """).first()
    assert row.with_click > 0


def test_country_stats_shape_sql(spark, views):
    rows = spark.sql("""
        SELECT user_id % 10 AS cohort, count(*) AS n, avg(max_value) AS avg_v,
               max(max_value) AS max_v, min(max_value) AS min_v,
               stddev_pop(max_value) AS sd
        FROM gold GROUP BY user_id % 10 ORDER BY avg_v DESC
    """).collect()
    assert len(rows) == 10


def test_attestation_window_leads_with_priority_list():
    """Catalog order IS the driver's attestation schedule: the window
    must start with exactly the registered names of the priority list,
    in order — an accidental reorder silently burns attestation slots."""
    from project_bigdata_spark.plans.catalog import (
        _ATTESTATION_PRIORITY,
        QUERIES,
        load_all,
    )

    names = list(load_all())
    expected = [n for n in _ATTESTATION_PRIORITY if n in QUERIES]
    assert names[: len(expected)] == expected
    # and every priority name actually exists (no dead entries)
    missing = [n for n in _ATTESTATION_PRIORITY if n not in QUERIES]
    assert not missing, f"priority list references unknown queries: {missing}"


def test_attestation_window_is_fresh():
    """Window-freshness invariant (round-3 verdict ask #3, refined by
    round-4 ask #3): while any catalog entry lacks a GREEN driver
    CORRECTNESS row, the driver's 50-slot window (the first 50 of
    load_all()) must be spent on those names. "Green" = hash_match true,
    or a rows-only pass for the documented oracle-less entries — a RED
    row (hash mismatch) counts as NEEDING attestation, so re-attesting
    repaired entries satisfies the invariant rather than violating it.
    Parses the committed CORRECTNESS_r0*.json files, so the invariant
    tightens automatically every round."""
    import glob
    import json
    import os

    from project_bigdata_spark.plans.catalog import load_all

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") is True:
                    green.add(name)
                elif row.get("err") == "no_oracle" and row.get("spark_rows"):
                    green.add(name)  # rows-only check for oracle-less ops
    names = list(load_all())
    needing = [n for n in names if n not in green]
    if not needing:
        return  # every entry green-attested — any order is fine
    window = names[:50]
    fresh = [n for n in window if n not in green]
    want = min(len(needing), 50)
    # >=45 (not ==50) tolerates a handful of deliberate re-attestations,
    # never a stale list.
    assert len(fresh) >= min(want, 45), (
        f"attestation window wastes {len(window) - len(fresh)} of 50 slots "
        f"on already-green entries while {len(needing)} entries have no "
        f"green driver row; reorder _ATTESTATION_PRIORITY in plans/catalog.py"
    )
