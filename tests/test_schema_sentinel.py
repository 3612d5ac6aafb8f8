"""Schema-drift sentinel: pin the post-``load_table`` dtype of every
column of every registered table.

The driver regenerates ``/root/testdata`` between rounds, and round 2
went red when ``events.ts`` silently changed parquet encoding
(TIMESTAMP(NANOS) -> µs-no-tz) under a subset check. The encoding-matrix
test (test_sources_sinks.py) defends the ts path specifically; this test
is the broad tripwire — any dtype drift in ANY table fails here first,
naming the exact column, instead of surfacing as a cryptic
DATATYPE_MISMATCH deep inside a query.

A failure means: decide whether the new encoding needs a normalization
branch in ``sources/registry.py`` (like ``normalize_event_ts``), then
update the pin.
"""

from __future__ import annotations

import pytest

from project_bigdata_spark.sources import TABLES, load_table

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        # MUST load as plain timestamp whatever the parquet encoding —
        # normalize_event_ts + RUNTIME_CONFS own this contract
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", TABLES)
def test_post_load_schema_pinned(spark, sf_dir, table):
    actual = dict(load_table(spark, sf_dir, table).dtypes)
    expected = EXPECTED[table]
    drift = {
        c: (expected.get(c), actual.get(c))
        for c in set(expected) | set(actual)
        if expected.get(c) != actual.get(c)
    }
    assert not drift, (
        f"{table}: testdata schema drifted (expected, actual): {drift} — "
        "if the driver re-encoded the table, add a normalization branch "
        "in sources/registry.py, then update this pin"
    )


# Money-ish columns the oracles sum on the exact integer-cents grid
# (_norm.cents: floor(x*100+0.5), round-5 hardening). The grid function
# itself is deterministic for ANY double, but the catalog's SEMANTICS
# assume these columns are 2-decimal values — if a testdata regeneration
# ever widens the precision, quantizing to cents would silently change
# what the queries compute. This sentinel fails first, naming the column.
TWO_DECIMAL_COLS = {
    "events": ["value"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
}


@pytest.mark.parametrize(
    "table,col",
    [(t, c) for t, cols in TWO_DECIMAL_COLS.items() for c in cols],
    ids=lambda v: str(v),
)
def test_money_columns_are_two_decimal(spark, sf_dir, table, col):
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, table)
    off = df.where(
        F.col(col).isNotNull() & (F.round(F.col(col), 2) != F.col(col))
    ).count()
    assert off == 0, (
        f"{table}.{col}: {off} values are not exact 2-decimal — the "
        "integer-cents grid (_norm.cents) would quantize them; re-pin "
        "the grid scale in the affected oracles"
    )


def test_embedding_dim_pinned(spark, sf_dir):
    """similarity.DIM (LSH planes, IVF folds, PQ sub-spaces) is compiled
    into plans against this dimensionality; a regeneration that changes
    it must fail HERE, not as a wrong-length zip deep inside a fold."""
    from pyspark.sql import functions as F

    from project_bigdata_spark.operators.similarity import DIM

    df = load_table(spark, sf_dir, "embeddings")
    dims = [r[0] for r in df.select(F.size("embedding")).distinct().collect()]
    assert dims == [DIM], f"embedding dim drifted: {dims} != [{DIM}]"
