"""MERGE-INTO emulation over partitioned parquet (no Delta/Iceberg jars).

The v1 image has no lakehouse table format, so upserts use the classic
anti-join + union + dynamic-partition-overwrite construction:

1. restrict the existing table to the partitions the updates touch
   (partition pruning — nothing else is read);
2. anti-join existing rows against update keys (drop superseded rows);
3. union with the updates;
4. overwrite — with ``partitionOverwriteMode=dynamic`` only the touched
   ``year/month/day`` leaves are rewritten.

This directly fixes the reference's overwrite-the-world writes
(``spark/batch_processor.py:125-129``, SURVEY.md §4.3-7): a daily
increment rewrites one day's directory, not the table. At 100 TB the cost
is O(touched partitions), and the read side is pruned by the same
predicate the write derives.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_spark.sources.registry import ensure_runtime_confs


def upsert_partitioned(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
) -> None:
    """Upsert ``updates`` into the parquet table at ``table_path``.

    Rows whose ``key_cols`` match an update are replaced; new keys are
    inserted. Only partitions present in ``updates`` are read or written.
    """
    # Dynamic partition overwrite is load-bearing here: in STATIC mode the
    # final overwrite would delete every partition not present in `merged`.
    # Assert it on the live session (runtime-scoped conf) rather than
    # trusting the caller to have used our session factory.
    ensure_runtime_confs(spark)
    if (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static").lower()
        != "dynamic"
    ):  # pragma: no cover - only reachable if the conf was made static
        raise RuntimeError(
            "upsert_partitioned requires "
            "spark.sql.sources.partitionOverwriteMode=dynamic; refusing to "
            "overwrite (STATIC mode would drop untouched partitions)"
        )

    touched = [tuple(r) for r in updates.select(*partition_cols).distinct().collect()]
    if not touched:
        return

    existing = spark.read.parquet(table_path)
    # partition-pruning predicate: OR over touched partition tuples —
    # small by construction (one increment touches few partitions)
    pred = reduce(
        lambda a, b: a | b,
        [
            reduce(
                lambda x, y: x & y,
                [F.col(c) == F.lit(v) for c, v in zip(partition_cols, combo)],
            )
            for combo in touched
        ],
    )
    scoped = existing.filter(pred)
    keep = scoped.join(
        updates.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    merged = keep.unionByName(updates.select(*keep.columns))
    # dynamic mode (session factory) rewrites only partitions in `merged`
    merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(table_path)
