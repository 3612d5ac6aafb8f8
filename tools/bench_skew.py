"""Skew soak: what actually survives a pathological hot key.

Synthesizes a hot key from sf0.1 events — amplified x32 (~3.2M rows)
with 80% of rows remapped onto ONE (user_id, hour) group, all with the
SAME timestamp (an exact-duplicate burst: sensor replays, default
entity ids; at 100 TB, a dominant web domain) — then runs three
variants of the gold hourly aggregate, whose collect_list payload
partial aggregation cannot shrink:

- ``plain``        — plain groupBy; the whole hot group's pair list
                     materializes in one reducer task;
- ``plain_cap``    — plain groupBy + slice after collect_list; the full
                     list STILL materializes before the slice, so the
                     cap alone saves nothing;
- ``salted_cap``   — ``salted_hourly_gold(salt_col="event_id",
                     max_pairs=1000)``: per-bucket top-k BEFORE the
                     merge; per-task state is bounded by construction.

Each variant runs in its own JVM with a fixed 1g heap — a deliberately
bounded per-task budget standing in for a real executor's per-task
share — so a reducer blow-up is observable as OOM instead of borrowing
the whole 128 GiB box. Appends a section to BENCH_SCALING.md.

Usage: ``python tools/bench_skew.py`` (parent; one subprocess per
variant), or ``python tools/bench_skew.py <variant>``.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"
HOT_FRAC = 0.8
HOT_USER = 424242
AMPLIFY = 32
HEAP = "1g"
CAP = 1000
VARIANTS = ("plain", "plain_cap", "salted_cap")


def build_skewed(spark):
    from pyspark.sql import functions as F

    from project_bigdata_spark.sources import load_table

    e = (
        load_table(spark, SF_DIR, "events")
        .withColumn("_copy", F.explode(F.sequence(F.lit(1), F.lit(AMPLIFY))))
        .withColumn("event_id", F.col("event_id") * AMPLIFY + F.col("_copy"))
        .drop("_copy")
        .repartition(32)
    )
    hot = F.abs(F.xxhash64("event_id")) % 100 < int(HOT_FRAC * 100)
    return (
        e.withColumn(
            "user_id", F.when(hot, F.lit(HOT_USER)).otherwise(F.col("user_id"))
        )
        .withColumn(
            "ts",
            F.when(
                hot, F.to_timestamp(F.lit("2024-01-15 12:30:00"))
            ).otherwise(F.col("ts")),
        )
        .persist()
    )


def plain_hourly(df, cap=None):
    """The unsalted twin of salted_hourly_gold's aggregate."""
    from pyspark.sql import functions as F

    hour = F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    pairs = F.sort_array(
        F.collect_list(
            F.struct(F.col("event_type").alias("k"), F.col("value").alias("v"))
        )
    )
    if cap is not None:
        pairs = F.slice(pairs, 1, cap)
    return (
        df.groupBy(F.col("user_id"), hour)
        .agg(
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("n_events"),
            pairs.alias("pairs"),
        )
        .withColumn("event_types", F.transform("pairs", lambda p: p["k"]))
        .withColumn("values", F.transform("pairs", lambda p: p["v"]))
        .drop("pairs")
    )


def run_variant(which: str) -> None:
    from project_bigdata_spark.operators.skew import salted_hourly_gold
    from project_bigdata_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-skew-{which}",
        cpus=32,
        extra_conf={"spark.driver.memory": HEAP},
    )
    skewed = build_skewed(spark)
    n = skewed.count()
    fns = {
        "plain": lambda d: plain_hourly(d),
        "plain_cap": lambda d: plain_hourly(d, cap=CAP),
        "salted_cap": lambda d: salted_hourly_gold(
            d, buckets=16, salt_col="event_id", max_pairs=CAP
        ),
    }
    fn = fns[which]
    fn(skewed).write.format("noop").mode("overwrite").save()  # warm-up
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(skewed).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"SKEWRESULT {which} {n} {best:.2f}", flush=True)


def main() -> None:
    results: dict[str, str] = {}
    n_rows = 0
    for which in VARIANTS:
        try:
            proc = subprocess.run(
                [sys.executable, __file__, which],
                capture_output=True,
                text=True,
                timeout=600,
            )
            out = proc.stdout + proc.stderr
            line = next(
                (l for l in proc.stdout.splitlines()
                 if l.startswith("SKEWRESULT")),
                None,
            )
            if line:
                _, _, n, sec = line.split()
                n_rows = int(n)
                results[which] = f"{float(sec):.2f}s"
            elif "OutOfMemoryError" in out:
                results[which] = f"OOM @ {HEAP} heap"
            else:
                results[which] = f"FAILED (exit {proc.returncode})"
        except subprocess.TimeoutExpired:
            results[which] = "TIMEOUT (600s)"
        print(f"{which}: {results[which]}")

    rows = {
        "plain": "full hot-group pair list in one reducer task",
        "plain_cap": "cap AFTER collect_list — full list still materializes",
        "salted_cap": f"per-bucket top-{CAP} before the merge; bounded state",
    }
    labels = {
        "plain": "plain groupBy",
        "plain_cap": f"plain + slice({CAP})",
        "salted_cap": f"`salted_hourly_gold(salt_col, max_pairs={CAP})`",
    }
    section = [
        "",
        "## Skew soak (`tools/bench_skew.py`)",
        "",
        f"sf0.1 events amplified x{AMPLIFY} ({n_rows:,} rows), "
        f"{int(HOT_FRAC * 100)}% remapped onto ONE (user_id, hour) group "
        "with identical timestamps (exact-duplicate burst — which also "
        "defeats a ts-hashed salt; the operator salts on a row-unique "
        "column). The aggregate carries a collect_list payload, so partial "
        "aggregation cannot shrink the hot group. One JVM per variant, "
        f"{HEAP} task-heap budget, best of 3 after warm-up, local[32]:",
        "",
        "| variant | outcome | |",
        "|---|---|---|",
    ]
    for which in VARIANTS:
        section.append(f"| {labels[which]} | {results[which]} | {rows[which]} |")
    section += [
        "",
        "Salting distributes the build, and the per-bucket top-k cap bounds "
        "every task's state no matter how hot the key gets — exact top-k "
        "(each globally-smallest pair is among its bucket's smallest), "
        "exact max/count. An uncapped hot key fails at SOME scale "
        "regardless of salting; the cap is the part that survives 100 TB.",
    ]
    md = Path(__file__).resolve().parent.parent / "BENCH_SCALING.md"
    text = md.read_text()
    marker = "\n## Skew soak"
    if marker in text:
        text = text[: text.index(marker)]
    md.write_text(text.rstrip() + "\n" + "\n".join(section) + "\n")
    print("wrote skew section to BENCH_SCALING.md")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        main()
