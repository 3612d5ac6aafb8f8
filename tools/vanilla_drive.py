"""Driver simulation with a VANILLA SparkSession (no engine factory) —
exactly what the real driver does: a config-free session handed to
``__spark_entry__``'s callables against the CURRENT ``/root/testdata``.

Sweeps the ENTIRE catalog (not a hand-picked subset — round 2 went red
precisely because the testdata's parquet encoding changed under a subset
check). Run as the final pre-snapshot gate every round:

    python tools/vanilla_drive.py [sf_dir]

Exit 0 = every entry ran and returned a well-formed result.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[8]")
    .appName("vanilla-driver")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

rows = e.entry(spark).collect()
print(f"entry: {len(rows)} rows")

qs = e.queries()
failed = []
t0 = time.time()
for i, (name, fn) in enumerate(qs.items(), 1):
    try:
        n = len(fn(spark, SF_DIR).collect())
        print(f"[{i}/{len(qs)}] {name}: {n} rows OK", flush=True)
    except Exception as exc:  # keep sweeping; report all breakage at once
        failed.append(name)
        msg = str(exc).splitlines()[0] if str(exc) else type(exc).__name__
        print(f"[{i}/{len(qs)}] {name}: FAIL {msg}", flush=True)

print(f"swept {len(qs)} queries in {time.time() - t0:.1f}s at {SF_DIR}")
if failed:
    print(f"VANILLA FAIL ({len(failed)}): {failed}")
    sys.exit(1)
print("VANILLA OK")
