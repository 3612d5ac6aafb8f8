"""Driver simulation with a VANILLA SparkSession (no engine factory) —
exactly what the real driver does."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

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
print("entry:", len(rows), "rows")

qs = e.queries()
# the conf-sensitive paths: events nanos read, map policy, tz formatting,
# plus the mapInPandas python-worker path
for name in ["gold_hourly", "layer_stats", "multimodal_decode", "feature_frame",
             "sessionize_events", "knn_brute_force", "unigram_logprob",
             "incremental_dedup", "dedup_apply", "text_normalize", "hash_split"]:
    n = len(qs[name](spark, "/root/testdata/sf0.001").collect())
    print(f"{name}: {n} rows OK")
print("VANILLA OK")
