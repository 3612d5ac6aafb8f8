"""I/O-roundtrip catalog entries: CSV, JSON-lines, and partitioned-
parquet sink+scan paths attested through the differential gate.

SURVEY §2.1's S7 (partitioned parquet sink) and S10 (CSV export) were
previously *local-only* evidence (sink tests in ``tests/``); these
entries run the full write→read→aggregate loop inside a catalog query,
so the driver's DuckDB compare attests that a frame SURVIVES each
format: the oracle aggregates the original parquet, so any value the
sink mangles (timestamp formatting, quoting, JSON escaping, partition
column peeling) breaks the hash match. Text fidelity is pinned by an
md5-sum over the payload column, not just row counts.

Each entry writes to a deterministic per-(process, query, sf_dir) dir
under the system temp root with ``mode("overwrite")`` — repeated
catalog sweeps within a process reuse ONE directory per query instead
of leaking a fresh ``mkdtemp`` copy per invocation, concurrent
PROCESSES are isolated (a shared path let a parallel sweep rewrite a
dir another process's streaming query was mid-read on), and trees left
by dead processes are garbage-collected on first use.

Scale notes: these are sink-path attestations, not perf paths — but the
shapes are the production ones: ``write_partitioned_parquet`` uses
dynamic partition overwrite (only touched partitions replaced), the
read-back filter prunes partitions (asserted in ``tests/test_plans``),
and CSV/JSONL writes shard per task with no coalesce-to-1.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table
from project_bigdata_spark.sources.registry import write_partitioned_parquet

_EVENTS_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)

_DOCS_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

# 32-bit md5 prefix per text, summed exactly — pins payload fidelity
# through a sink format without shipping the payloads to the compare.
_MD5_SUM_SQL = (
    "CAST(sum(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT))"
    " AS BIGINT)"
)


def _md5_sum(col: str) -> F.Column:
    return (
        F.sum(F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("bigint"))
        .cast("bigint")
    )


_IO_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_io")
_GC_DONE = False


def _gc_dead_process_dirs() -> None:
    """Remove sink trees left by processes that no longer exist. Keeps
    the per-process layout leak-free across rounds without reintroducing
    the cross-process race a fully shared path has (a concurrent sweep
    rewriting a dir another process's streaming query is reading)."""
    global _GC_DONE
    if _GC_DONE or not os.path.isdir(_IO_ROOT):
        _GC_DONE = True
        return
    import shutil

    for entry in os.listdir(_IO_ROOT):
        if not entry.startswith("pid_"):
            # pre-per-process layout residue — safe to clear
            shutil.rmtree(os.path.join(_IO_ROOT, entry), ignore_errors=True)
            continue
        try:
            pid = int(entry[4:])
        except ValueError:
            continue
        if pid != os.getpid() and not os.path.exists(f"/proc/{pid}"):
            shutil.rmtree(os.path.join(_IO_ROOT, entry), ignore_errors=True)
    _GC_DONE = True


def _sink_dir(name: str, sf_dir: str) -> str:
    """Deterministic per-(process, query, sf_dir) sink path: reused with
    mode("overwrite") across sweeps WITHIN a process (no per-invocation
    mkdtemp leak), isolated BETWEEN processes (no concurrent-sweep
    race), and dead processes' trees are garbage-collected on first
    use."""
    _gc_dead_process_dirs()
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    path = os.path.join(_IO_ROOT, f"pid_{os.getpid()}", f"{name}_{key}")
    os.makedirs(path, exist_ok=True)
    return path


@query(
    "csv_roundtrip",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {N.sql_sum_cents2('value')} AS total_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
       CAST(sum(CAST(('0x' || substring(md5(props), 1, 8)) AS BIGINT))
            AS BIGINT) AS props_md5_sum
FROM events GROUP BY 1""",
    doc="CSV export + scan attested end-to-end (S10, the reference's "
    "spark/batch_processor.py CSV handoff): events write to CSV with "
    "µs timestamp format and full quoting, read back under an explicit "
    "DDL schema, and aggregate — the oracle aggregates the ORIGINAL "
    "parquet, so quoting bugs (props holds JSON with quotes/commas), "
    "timestamp truncation, or float re-parse drift all break the hash. "
    "The md5-sum over props pins string fidelity exactly.",
    survey_ids=("S10", "M7-IO1"),
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    path = _sink_dir("csv_roundtrip", sf_dir)
    (
        e.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )
    back = (
        spark.read.schema(_EVENTS_DDL)
        .option("header", "true")
        .option("escape", '"')
        .option("multiLine", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        N.sum_cents2("value").alias("total_value"),
        N.ts_str(F.min("ts"), micros=True).alias("first_ts"),
        _md5_sum("props").alias("props_md5_sum"),
    )


@query(
    "jsonl_roundtrip",
    oracle=f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       {_MD5_SUM_SQL} AS text_md5_sum
FROM documents GROUP BY 1""",
    doc="JSON-lines export + scan attested end-to-end (the S6 envelope "
    "format family without a broker: one JSON object per line, the "
    "interchange format every corpus pipeline ships): documents write "
    "to JSONL, read back under an explicit schema, and aggregate. The "
    "md5-sum over text attests byte-exact payload survival through "
    "JSON escaping — multi-line, quoted, non-ASCII text included.",
    survey_ids=("S6", "F13", "M7-IO2"),
)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    path = _sink_dir("jsonl_roundtrip", sf_dir)
    d.write.mode("overwrite").json(path)
    back = spark.read.schema(_DOCS_DDL).json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        _md5_sum("text").alias("text_md5_sum"),
    )


@query(
    "partitioned_parquet_roundtrip",
    oracle=f"""
SELECT CAST(date_part('day', ts) AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       {N.sql_sum_cents2('value')} AS total_value
FROM events
WHERE date_part('day', ts) BETWEEN 8 AND 14
GROUP BY 1""",
    doc="Partitioned parquet sink + pruned scan attested end-to-end (S7; "
    "fixes the overwrite-the-world write at the reference's "
    "batch_processor.py:125-129 with dynamic partition overwrite): "
    "events write partitioned by day-of-month via "
    "write_partitioned_parquet, the read-back filters one week, and "
    "the filter prunes to 7 of 30 hive partitions (asserted in "
    "tests/test_plans.py). Values re-aggregate exactly against the "
    "unpartitioned original.",
    survey_ids=("S7", "P6", "M7-IO3"),
)
def partitioned_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.dayofmonth("ts")
    )
    path = _sink_dir("part_roundtrip", sf_dir)
    write_partitioned_parquet(e, path, ["day"])
    back = spark.read.parquet(path).filter(F.col("day").between(8, 14))
    return back.groupBy(N.big("day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        N.sum_cents2("value").alias("total_value"),
    )


@query(
    "bucketed_join_roundtrip",
    oracle=f"""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       {N.sql_sum_rev2('l_extendedprice', 'l_discount')} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1""",
    doc="Bucketed-table join attested end-to-end (S9, the OLAP-serving "
    "layout): lineitem and orders are written as 8-bucket managed "
    "tables bucketed+sorted on the order key, then joined bucket-to-"
    "bucket and aggregated; the oracle joins the ORIGINAL parquet, so "
    "any row the bucketing layout drops, duplicates, or mis-routes "
    "breaks the hash. The plan-level guarantee (no shuffle exchange "
    "on the bucketed join) is asserted separately in "
    "tests/test_olap_bucketing.py — this entry attests the LAYOUT "
    "preserves the data. At 100 TB bucketing is the storage-side "
    "answer to repeated big-big joins: pay the shuffle once at write.",
    survey_ids=("S9", "M4", "M7-IO4"),
)
def bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.sources.registry import write_bucketed_table

    import shutil

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    li_tbl, o_tbl = f"lineitem_bkt_{key}", f"orders_bkt_{key}"
    # A managed-table dir can outlive the catalog entry (fresh session,
    # same cwd) and then block CREATE with LOCATION_ALREADY_EXISTS —
    # drop both the entry and any orphaned location first.
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for tbl in (li_tbl, o_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        loc = os.path.join(wh.removeprefix("file:"), tbl.lower())
        shutil.rmtree(loc, ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed_table(li, li_tbl, "l_orderkey", n_buckets=8)
    write_bucketed_table(o, o_tbl, "o_orderkey", n_buckets=8)
    lb, ob = spark.table(li_tbl), spark.table(o_tbl)
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        N.sum_rev2("l_extendedprice", "l_discount").alias("revenue"),
    )


@query(
    "partition_upsert_roundtrip",
    oracle=f"""
WITH mod AS (
  SELECT CAST(date_part('day', ts) AS BIGINT) AS day,
         CASE WHEN date_part('day', ts) BETWEEN 10 AND 12
                AND event_type = 'click'
              THEN value + 1.0 ELSE value END AS v
  FROM events
), syn AS (
  SELECT CAST(10 AS BIGINT) AS day, value AS v
  FROM events
  WHERE date_part('day', ts) = 10 AND event_type = 'view'
), unioned AS (
  SELECT * FROM mod UNION ALL SELECT * FROM syn
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_events,
       {N.sql_sum_cents2('v')} AS total_value
FROM unioned GROUP BY 1""",
    doc="MERGE-INTO emulation attested end-to-end (operators/upsert.py's "
    "anti-join + union + dynamic-partition-overwrite construction, the "
    "fix for the reference's overwrite-the-world write at "
    "batch_processor.py:125-129): events land partitioned by day, an "
    "update batch REPLACES days 10-12's click rows (value + 1.0, same "
    "event_id keys) and INSERTS day-10 view copies under fresh keys "
    "(event_id + 10M), and the read-back per-day aggregate must equal "
    "the oracle's CASE-modified union over the ORIGINAL table. "
    "Partitions outside days 10-12 are neither read nor written by "
    "the upsert — O(touched partitions), attested by the untouched "
    "days hashing clean through the same result.",
    survey_ids=("S7", "P6", "M4", "M7-IO5"),
)
def partition_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.upsert import upsert_partitioned

    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.dayofmonth("ts")
    )
    path = _sink_dir("part_upsert", sf_dir)
    e.write.mode("overwrite").partitionBy("day").parquet(path)

    replaced = e.filter(
        F.col("day").between(10, 12) & (F.col("event_type") == "click")
    ).withColumn("value", F.col("value") + F.lit(1.0))
    inserted = (
        e.filter((F.col("day") == 10) & (F.col("event_type") == "view"))
        .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
    )
    updates = replaced.unionByName(inserted)
    upsert_partitioned(
        spark, path, updates, key_cols=["event_id"], partition_cols=["day"]
    )

    back = spark.read.parquet(path)
    return back.groupBy(F.col("day").cast("bigint").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        N.sum_cents2("value").alias("total_value"),
    )


@query(
    "schema_evolution_roundtrip",
    oracle=f"""
WITH unified AS (
  SELECT event_type,
         CASE WHEN date_part('day', ts) >= 16
              THEN 'ch' || CAST(user_id % 3 AS VARCHAR) END AS channel,
         value
  FROM events
)
SELECT event_type,
       coalesce(channel, 'none') AS channel,
       CAST(count(*) AS BIGINT) AS n_events,
       {N.sql_sum_cents2('value')} AS total_value
FROM unified GROUP BY 1, 2""",
    doc="Parquet schema evolution attested end-to-end: generation 1 "
    "(days 1-15) lands WITHOUT the channel column, generation 2 (days "
    "16-30) adds it; a mergeSchema scan reads both generations as one "
    "table, old rows surfacing NULL for the added column — the "
    "additive-column migration every long-lived dataset goes through, "
    "with no rewrite of existing files. The oracle synthesizes the "
    "same unified view with a CASE, so a scan that drops, misaligns, "
    "or backfills the evolved column wrongly breaks the hash. At "
    "scale: mergeSchema footer reconciliation is O(files) on the "
    "driver — production pins the merged schema in a catalog; the "
    "read semantics attested here are identical.",
    survey_ids=("S3", "P4", "M7-IO6"),
)
def schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.dayofmonth("ts")
    )
    root = _sink_dir("schema_evo", sf_dir)
    v1 = e.filter(F.col("day") <= 15).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    v2 = e.filter(F.col("day") >= 16).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.concat(F.lit("ch"), (F.col("user_id") % 3).cast("string")).alias(
            "channel"
        ),
    )
    v1.write.mode("overwrite").parquet(os.path.join(root, "gen=1"))
    v2.write.mode("overwrite").parquet(os.path.join(root, "gen=2"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "gen=1"), os.path.join(root, "gen=2")
    )
    return back.groupBy(
        "event_type", F.coalesce("channel", F.lit("none")).alias("channel")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        N.sum_cents2("value").alias("total_value"),
    )


@query(
    "orc_roundtrip",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {N.sql_sum_cents2('value')} AS total_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
       CAST(sum(CAST(('0x' || substring(md5(props), 1, 8)) AS BIGINT))
            AS BIGINT) AS props_md5_sum
FROM events GROUP BY 1""",
    doc="ORC sink+scan roundtrip attested end-to-end — the second "
    "columnar format Spark ships natively (the Hive-ecosystem "
    "counterpart to parquet, with its own writer/reader, stripe "
    "layout, and timestamp encoding): events write to ORC and "
    "re-aggregate against the parquet-derived oracle, so timestamp "
    "precision loss (ORC nanos vs µs), string mangling, or double "
    "re-encode drift all break the hash. Avro is NOT attestable in "
    "this image (spark-avro external module absent) — documented "
    "gate, same class as the Kafka broker.",
    survey_ids=("S3", "S10", "M7-IO7"),
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    path = _sink_dir("orc_roundtrip", sf_dir)
    e.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        N.sum_cents2("value").alias("total_value"),
        N.ts_str(F.min("ts"), micros=True).alias("first_ts"),
        _md5_sum("props").alias("props_md5_sum"),
    )


@query(
    "dynamic_partition_pruning_roundtrip",
    oracle=f"""
WITH busy AS (
  SELECT DISTINCT CAST(date_part('day', o_orderdate) AS INT) AS day
  FROM orders WHERE o_totalprice > 499500
)
SELECT CAST(date_part('day', e.ts) AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       {N.sql_sum_cents2('e.value')} AS total_value
FROM events e JOIN busy b ON date_part('day', e.ts) = b.day
GROUP BY 1""",
    doc="Dynamic partition pruning attested end-to-end: the events "
    "table lands partitioned by day, then joins the distinct days on "
    "which a near-ceiling order (> 499500) occurred — a day set NOT "
    "known until runtime, so the static planner cannot prune; Spark's "
    "DPP injects it as a subquery filter into the partitioned scan "
    "(the plan carries `dynamicpruning`, asserted in "
    "tests/test_plans.py). The filtering side must be a SELECTIVE "
    "base-column Filter for the heuristic to fire — a dim derived "
    "through an aggregate does not qualify (measured; the agg-derived "
    "variant plans without DPP). The oracle joins the unpartitioned "
    "original, so the pruned scan must still see every matching row. "
    "At 100 TB this is THE mechanism that makes star-schema joins "
    "against partitioned facts affordable.",
    survey_ids=("S7", "P9", "M4", "M7-IO8"),
)
def dynamic_partition_pruning_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.dayofmonth("ts")
    )
    path = _sink_dir("dpp_roundtrip", sf_dir)
    write_partitioned_parquet(e, path, ["day"])
    facts = spark.read.parquet(path)
    # selective base-column Filter below distinct — the shape DPP's
    # filtering-side heuristic requires (filter above an aggregate
    # does NOT trigger it)
    busy = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 499500)
        .select(F.dayofmonth("o_orderdate").alias("day"))
        .distinct()
    )
    joined = facts.join(F.broadcast(busy), "day")
    return joined.groupBy(N.big("day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        N.sum_cents2("value").alias("total_value"),
    )


@query(
    "python_sink_roundtrip",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {N.sql_sum_cents2('value')} AS total_value,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM events GROUP BY 1""",
    doc="Python DataSource WRITER attested end-to-end (the sink face of "
    "the PySpark-4 connector seam; python_source_stats attests the "
    "reader face): events write through the pyjsonl custom sink — "
    "per-task temp shards promoted atomically in commit(), the "
    "standard task-commit protocol so speculative retries never "
    "double-publish — then read back as JSONL and re-aggregated "
    "against the original. A custom CONNECTOR goes through the same "
    "differential gate as every query; double values survive the "
    "json.dumps shortest-repr roundtrip bit-exactly.",
    survey_ids=("S5", "S6", "F13", "M7-S5b"),
)
def python_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.sources import pysource

    pysource.register(spark)
    path = _sink_dir("python_sink", sf_dir)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    (
        e.write.format("pyjsonl")
        .option("path", path)
        .mode("overwrite")
        .save()
    )
    back = spark.read.schema(
        "event_id BIGINT, event_type STRING, value DOUBLE"
    ).json(os.path.join(path, "part-*.jsonl"))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        N.sum_cents2("value").alias("total_value"),
        F.sum("event_id").cast("bigint").alias("id_sum"),
    )


# ---------------------------------------------------------------------------
# csv_malformed_audit (round 6)
# ---------------------------------------------------------------------------

@query(
    "csv_malformed_audit",
    oracle=f"""
WITH flagged AS (
  SELECT event_type, value,
         CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 2))
              AS INT) % 16 = 0 AS corrupt
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corrupt,
       {N.sql_sum_cents2("CASE WHEN corrupt THEN NULL ELSE value END")}
         AS clean_value_sum
FROM flagged GROUP BY event_type""",
    doc="Bad-records handling audit — the PERMISSIVE-parse face a 10^12-"
    "row CSV ingest cannot ship without: 1-in-16 rows (md5(event_id) "
    "bucket, deterministic and oracle-replayable) are written with a "
    "non-numeric value field, the file is read back under an explicit "
    "schema with mode=PERMISSIVE + columnNameOfCorruptRecord, and the "
    "audit reports per type how many rows were quarantined and that "
    "the CLEAN rows' value sum survived bit-exactly (exact cents sum). "
    "The oracle recomputes the corruption rule over the original "
    "parquet — so this attests both the parser's row-preserving "
    "quarantine contract AND that corruption never leaks into clean "
    "aggregates. Plan: one tasks-sharded text write, one schema'd CSV "
    "scan, one aggregate; no coalesce-to-1 anywhere.",
    survey_ids=("S10", "M7-IO9"),
)
def csv_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    path = _sink_dir("csv_malformed_audit", sf_dir)
    corrupt = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 2),
            16,
            10,
        ).cast("int")
        % 16
        == 0
    )
    # value field: the shortest-repr double string parses back to the
    # identical double; corrupted rows get a non-numeric token.
    # Every field coalesces NULL to an explicit empty slot — concat_ws
    # SKIPS NULLs, so a NULL value would otherwise emit a 2-field line
    # that PERMISSIVE-parses as a clean row (round-6 advice). The empty
    # slot reads back as NULL under the CSV default nullValue, matching
    # the oracle's NULL semantics. event_type is additionally asserted
    # CSV-safe (no comma/quote/newline) rather than silently relying on
    # the fixture vocabulary: an unsafe token would shift fields.
    safe_type = F.col("event_type").isNull() | F.col("event_type").rlike(
        '^[^",\n\r]*$'
    )
    line = F.concat_ws(
        ",",
        F.coalesce(F.col("event_id").cast("string"), F.lit("")),
        F.when(safe_type, F.coalesce(F.col("event_type"), F.lit(""))).otherwise(
            F.raise_error(
                F.lit("csv_malformed_audit: event_type contains CSV "
                      "metacharacters; quote or re-block the vocabulary")
            )
        ),
        F.coalesce(
            F.when(corrupt, F.lit("NOT_A_NUMBER")).otherwise(
                F.col("value").cast("string")
            ),
            F.lit(""),
        ),
    )
    e.select(line.alias("value")).write.mode("overwrite").text(path)
    back = (
        spark.read.schema(
            "event_id BIGINT, event_type STRING, value DOUBLE, "
            "_malformed STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_malformed")
        .csv(path)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("_malformed").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_corrupt"),
        N.sum_cents2(
            F.when(F.col("_malformed").isNull(), F.col("value"))
        ).alias("clean_value_sum"),
    )


_CODECS = ("snappy", "zstd", "gzip")


@query(
    "compression_codec_roundtrip",
    oracle=f"""
WITH agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_events,
         {N.sql_sum_cents2('value')} AS total_value,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
         CAST(sum(CAST(('0x' || substring(md5(props), 1, 8)) AS BIGINT))
              AS BIGINT) AS props_md5_sum
  FROM events
)
SELECT c.codec, agg.n_events, agg.total_value, agg.first_ts,
       agg.props_md5_sum
FROM (VALUES ('snappy'), ('zstd'), ('gzip')) AS c(codec)
CROSS JOIN agg""",
    doc="Parquet compression-codec roundtrip audit: the events table is "
    "written THREE times — snappy (the default), zstd (the modern "
    "size/speed frontier), gzip (the legacy ratio choice) — and each "
    "codec's read-back must reproduce the identical fidelity "
    "aggregate (row count, exact-cents value sum, microsecond first "
    "timestamp, md5-prefix sum over the string payload). At 100 TB "
    "the codec choice is a first-order cost decision (zstd typically "
    "~30% smaller than snappy at similar scan speed) and this entry "
    "is the safety proof that switching codecs is value-lossless: "
    "any re-encode drift in doubles, timestamp precision, or string "
    "bytes breaks the hash for that codec's row. Byte-size ordering "
    "is asserted in tests (sizes are writer-dependent, not "
    "oracle-checkable). Plan: three sink+scan passes over the same "
    "frame + one aggregate each — pure IO attestation.",
    survey_ids=("M7-IO10",),
)
def compression_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    outs = []
    for codec in _CODECS:
        path = _sink_dir(f"codec_{codec}", sf_dir)
        e.write.mode("overwrite").option("compression", codec).parquet(
            path
        )
        back = spark.read.parquet(path)
        outs.append(
            back.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                N.sum_cents2("value").alias("total_value"),
                N.ts_str(F.min("ts"), micros=True).alias("first_ts"),
                _md5_sum("props").alias("props_md5_sum"),
            ).select(F.lit(codec).alias("codec"), "*")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
