"""Degenerate-data fixture generator (round-11 verdict ask #2).

The NULL-vs-NaN 0/0 divergence class was patched entry-by-entry for
three rounds (kappa/Cochran-Q/crosscorr in r9, Neyman/Cohen's d in
r10). This module builds the fixture those fixes were approximating: a
tiny table set, schema-identical to the driver's testdata, whose SHAPE
is adversarial —

- ``events``: a singleton group (user 1: one event — sample variance
  ddof=1 hits 0/0), a zero-variance series (user 2: constant value —
  correlations/effect sizes hit sd=0), duplicate timestamps (rank
  ties), a value of exactly 0.0 (log/ratio edges), and a SINGLE
  event_type so every per-type stratum but one is empty.
- ``documents``: one language only (empty strata), an exact-duplicate
  pair, a single-word page (shorter than any n-gram window), and an
  EMPTY page (zero words — both engines' word frames drop empties, so
  downstream 0/0s are the entries' own responsibility).
- ``embeddings``: an exact-duplicate vector pair, an all-zero vector
  (zero norm — cosine 0/0), and a single label class.
- TPC-H tables: one row each (two lineitems, constant measures) with
  referential integrity preserved.

``tests/test_degenerate_sweep.py`` drives every stats/curation/ML/eval
catalog entry against its DuckDB oracle on this directory; the gate is
cross-engine AGREEMENT (NULL-vs-NaN included), not any particular
value.
"""

from __future__ import annotations

import duckdb

SRC = "/root/testdata/sf0.001"

_EVENTS = f"""
WITH src AS (
  SELECT props, row_number() OVER () AS rn
  FROM '{SRC}/events.parquet' LIMIT 9
)
SELECT CAST(rn AS BIGINT) AS event_id,
       CASE WHEN rn = 1 THEN TIMESTAMP '2024-01-01 00:30:00'
            WHEN rn <= 4 THEN TIMESTAMP '2024-01-01 10:15:00'
            WHEN rn <= 7 THEN TIMESTAMP '2024-01-02 10:15:00'
            ELSE TIMESTAMP '2024-01-03 23:59:59' END AS ts,
       CAST(CASE WHEN rn = 1 THEN 1 WHEN rn <= 7 THEN 2 ELSE 3 END
            AS BIGINT) AS user_id,
       'click' AS event_type,
       CAST(CASE WHEN rn = 1 THEN 5.0 WHEN rn <= 7 THEN 7.5
            ELSE 0.0 END AS DOUBLE) AS value,
       props
FROM src
"""

_DOCUMENTS = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'the quick brown fox jumps over the lazy dog',
   'en', 'web', CAST(43 AS BIGINT)),
  (CAST(2 AS BIGINT), 'the quick brown fox jumps over the lazy dog',
   'en', 'web', CAST(43 AS BIGINT)),
  (CAST(3 AS BIGINT), 'alpha', 'en', 'web', CAST(5 AS BIGINT)),
  (CAST(4 AS BIGINT), '', 'en', 'web', CAST(0 AS BIGINT))
) AS t(doc_id, text, lang, source, n_chars)
"""

_EMBEDDINGS = f"""
WITH one AS (
  SELECT embedding FROM '{SRC}/embeddings.parquet' LIMIT 1
)
SELECT CAST(1 AS BIGINT) AS vec_id, embedding,
       CAST(0 AS INTEGER) AS label FROM one
UNION ALL
SELECT CAST(2 AS BIGINT), embedding, CAST(0 AS INTEGER) FROM one
UNION ALL
SELECT CAST(3 AS BIGINT),
       CAST(list_transform(embedding, x -> CAST(0.0 AS FLOAT))
            AS FLOAT[]),
       CAST(0 AS INTEGER)
FROM one
"""

_TPCH = {
    "region": """SELECT CAST(0 AS INTEGER) AS r_regionkey,
                        'AFRICA' AS r_name""",
    "nation": """SELECT CAST(0 AS INTEGER) AS n_nationkey,
                        'ALGERIA' AS n_name,
                        CAST(0 AS INTEGER) AS n_regionkey""",
    "customer": """SELECT CAST(1 AS BIGINT) AS c_custkey,
                          'Customer#1' AS c_name,
                          CAST(0 AS INTEGER) AS c_nationkey,
                          CAST(0.0 AS DOUBLE) AS c_acctbal,
                          'BUILDING' AS c_mktsegment""",
    "supplier": """SELECT CAST(1 AS BIGINT) AS s_suppkey,
                          'Supplier#1' AS s_name,
                          CAST(0 AS INTEGER) AS s_nationkey,
                          CAST(0.0 AS DOUBLE) AS s_acctbal""",
    "part": """SELECT CAST(1 AS BIGINT) AS p_partkey,
                      'azure part' AS p_name, 'Brand#11' AS p_brand,
                      'ECONOMY BRASS' AS p_type,
                      CAST(1 AS INTEGER) AS p_size,
                      CAST(100.0 AS DOUBLE) AS p_retailprice""",
    "orders": """SELECT CAST(1 AS BIGINT) AS o_orderkey,
                        CAST(1 AS BIGINT) AS o_custkey,
                        'O' AS o_orderstatus, CAST(100.0 AS DOUBLE) AS o_totalprice,
                        TIMESTAMP '2024-01-01 00:00:00' AS o_orderdate,
                        '1-URGENT' AS o_orderpriority""",
    "lineitem": """SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
       CAST(1 AS INTEGER), CAST(1.0 AS DOUBLE), CAST(100.0 AS DOUBLE),
       CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), 'N', 'O',
       TIMESTAMP '2024-01-02 00:00:00'),
      (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
       CAST(2 AS INTEGER), CAST(1.0 AS DOUBLE), CAST(100.0 AS DOUBLE),
       CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), 'N', 'O',
       TIMESTAMP '2024-01-02 00:00:00')
    ) AS t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag,
           l_linestatus, l_shipdate)""",
}


def build_degenerate_dir(dst: str) -> None:
    """Write the degenerate parquet table set into ``dst``."""
    con = duckdb.connect()
    for name, sql in {
        "events": _EVENTS,
        "documents": _DOCUMENTS,
        "embeddings": _EMBEDDINGS,
        **_TPCH,
    }.items():
        con.execute(
            f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
    con.close()


if __name__ == "__main__":
    import sys

    build_degenerate_dir(sys.argv[1])
