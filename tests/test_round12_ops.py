"""Round-12 re-plan equivalence tests.

The r12 optimization round re-planned two iterative entries so each step
references its state frame ONCE (linear lineage, no per-step pins). Both
re-plans rest on a small algebraic identity; these tests pin each identity
down on synthetic frames, independent of the testdata fixtures (the full
entries stay covered by tests/test_oracle_parity.py and the round-9
union-find replay test).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cc_selfloop_round_equals_union_min(spark):
    """connected_components r12: one label round over the SELF-LOOP
    augmented edge list (single join + grouped min) must equal the r11
    union+grouped-min shape: min over {lbl(m) : m in N(n) ∪ {n}}."""
    # path 1-2-3, plus isolated self-connected node 9
    sym = [(1, 2), (2, 1), (2, 3), (3, 2)]
    edges = spark.createDataFrame(sym, ["src", "dst"])
    nodes = edges.select(F.col("src").alias("n")).distinct().unionByName(
        spark.createDataFrame([(9,)], ["n"])
    )
    lbl = nodes.select("n", (F.col("n") * 10).alias("lbl"))  # distinct labels

    # r11 shape: union own labels with neighbor labels, grouped min
    nb = edges.join(
        lbl.select(F.col("n").alias("dst"), F.col("lbl").alias("nl")), "dst"
    ).select(F.col("src").alias("n"), F.col("nl").alias("lbl"))
    r11 = dict(
        lbl.unionByName(nb).groupBy("n").agg(F.min("lbl").alias("lbl")).collect()
    )

    # r12 shape: self-loops folded into the edge list, one join + min
    edges_plus = edges.unionByName(
        nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
    )
    r12 = dict(
        edges_plus.join(
            lbl.select(F.col("n").alias("dst"), F.col("lbl")), "dst"
        )
        .select(F.col("src").alias("n"), "lbl")
        .groupBy("n")
        .agg(F.min("lbl").alias("lbl"))
        .collect()
    )
    assert r11 == r12 == {1: 10, 2: 10, 3: 20, 9: 90}


def test_mmr_running_greatest_equals_set_max(spark):
    """mmr_rerank r12: the per-step running `greatest(maxdiv, s)` against
    only the NEWEST pick must equal max(s(c, p) for p in picked) — the
    r11 shape's aggregate over the whole picked set — including the
    null-start (no picks yet) and missing-pair (left join miss) cases."""
    pw = {("a", "p1"): 0.3, ("a", "p2"): 0.9, ("b", "p1"): 0.5}
    cands = ["a", "b"]
    picks = ["p1", "p2"]

    rows = [(c,) for c in cands]
    st = spark.createDataFrame(rows, ["vec_id"]).withColumn(
        "maxdiv", F.lit(None).cast("double")
    )
    pw_df = spark.createDataFrame(
        [(c, p, s) for (c, p), s in pw.items()], ["vec_id", "cb", "s"]
    )
    for p in picks:
        st = (
            st.withColumn("cb", F.lit(p))
            .join(pw_df, ["vec_id", "cb"], "left")
            .select(
                "vec_id", F.greatest(F.col("maxdiv"), F.col("s")).alias("maxdiv")
            )
        )
    got = {r["vec_id"]: r["maxdiv"] for r in st.collect()}
    want = {
        c: max((pw[(c, p)] for p in picks if (c, p) in pw), default=None)
        for c in cands
    }
    assert got == want == {"a": 0.9, "b": 0.5}
