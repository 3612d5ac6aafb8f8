"""Z-order layout: the clustering must actually translate into parquet
footer-stats pruning — measured, not asserted (SURVEY.md §2.10 M7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_spark.operators import layout as LO
from project_bigdata_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_zorder_key_interleaves(spark):
    """Known bit pattern: scaled x=0b11 (bits 0,1), y=0b01 (bit 0) over
    2 cols -> z = x0<<0 | y0<<1 | x1<<2 = 1 + 2 + 4 = 7."""
    df = spark.createDataFrame([(3, 1)], ["x", "y"]).select(
        F.col("x").alias("_scaled_x"), F.col("y").alias("_scaled_y")
    )
    z = df.select(LO.zorder_key(["x", "y"], bits=2).alias("z")).collect()
    assert z[0].z == 7


def test_zorder_write_prunes_files(spark, tmp_path):
    """A box predicate on BOTH columns touches far fewer z-ordered files
    than arrival-ordered files, per parquet footer min/max — the actual
    mechanism a 100 TB scan uses to skip data."""
    e = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    naive, zpath = str(tmp_path / "naive"), str(tmp_path / "zorder")
    # arrival order (the reference's writer), same file count
    e.repartition(16).write.mode("overwrite").parquet(naive)
    LO.zorder_write(e, zpath, ["user_id", "value"], num_files=16)

    # equal row counts — layout must not lose rows
    assert (
        spark.read.parquet(zpath).count() == spark.read.parquet(naive).count()
    )

    lo_u, hi_u = 10, 30  # narrow box in both dimensions
    lo_v, hi_v = 10.0, 30.0
    pred = {"user_id": (lo_u, hi_u), "value": (lo_v, hi_v)}
    n = LO.file_pruning_stats(naive, pred)
    z = LO.file_pruning_stats(zpath, pred)
    assert n["files"] == z["files"] == 16
    # arrival order interleaves users/values everywhere -> ~every file hit
    assert n["touched"] >= 14
    assert z["touched"] <= z["files"] // 2, (n, z)

    # and the z-layout answers the box identically
    box = (
        F.col("user_id").between(lo_u, hi_u)
        & F.col("value").between(lo_v, hi_v)
    )
    assert (
        spark.read.parquet(zpath).filter(box).count()
        == e.filter(box).count()
    )
