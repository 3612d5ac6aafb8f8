"""Similarity search over embedding columns (north-star M7).

Brute-force cosine top-k as the correctness baseline, and two scale paths:
random-sign (Rademacher) hyperplane LSH bucketing, and an IVF-style
coarse-quantizer assignment. All pure column expressions over
``array<float>`` — ``zip_with`` + ``aggregate`` compute dot products
JVM-side; no UDF, no driver loop.

Determinism: LSH "random" planes are ±1 sign patterns derived from md5 at
PLAN-BUILD time (Python hashlib), inlined as literal arrays on both the
Spark side and the DuckDB oracle side — so the bucketing replays exactly.

Scale notes (100 TB / billions of vectors):

- brute-force top-k against ONE query is a narrow map + per-partition
  top-k merge: scales linearly, no shuffle of the corpus. It is the right
  tool for low-QPS exact search even at scale.
- LSH bucketing turns all-pairs near-dup (O(n²)) into per-bucket joins;
  the plane count is the recall/bucket-size dial. Bucket skew is bounded
  with the same cap guard as MinHash dedup.
- IVF: assign each vector to its nearest coarse centroid (broadcast), then
  search only the probe cell(s). Centroids would come from a sampled
  k-means at scale; the operator takes any centroid table.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8


def plane_signs(plane: int, dim: int = DIM) -> list[int]:
    """Deterministic ±1 signs for one hyperplane: parity of md5 nibbles.

    Computed at plan-build time; both the Spark plan and the SQL oracle
    inline the same literals.
    """
    signs: list[int] = []
    for d in range(dim):
        h = hashlib.md5(f"plane{plane}:{d}".encode()).hexdigest()
        signs.append(1 if int(h[0], 16) % 2 == 0 else -1)
    return signs


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product — element order fixed, so the result is the
    same IEEE double on any engine that folds left (DuckDB included)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with a zero-norm guard (NULL, not NaN/inf)."""
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(None).cast("double")).otherwise(
        dot(a, b) / (na * nb)
    )


def cosine_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k: broadcast the single query row, score the
    corpus in one narrow pass, take per-partition top-k + k-row merge."""
    q = F.broadcast(
        query.select(as_double(F.col(vec_col)).alias("_qvec"))
    )
    scored = corpus.crossJoin(q).select(
        F.col(id_col),
        cosine(as_double(F.col(vec_col)), F.col("_qvec")).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)


def lsh_bucket(vec: Column, n_planes: int = N_PLANES, dim: int = DIM) -> Column:
    """Random-sign hyperplane bucket id: one bit per plane (sign of the
    ±1-weighted sum), packed into a string like '10110010'."""
    v = as_double(vec)
    bits = []
    for p in range(n_planes):
        signs = F.array(*[F.lit(float(s)) for s in plane_signs(p, dim)])
        d = dot(v, signs)
        bits.append(F.when(d > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_bucket: int = 2000,
) -> DataFrame:
    """Embedding near-dup: exact cosine verification restricted to vectors
    sharing an LSH bucket — the sub-quadratic embedding-dedup pattern."""
    withb = df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_v"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    w = Window.partitionBy("bucket")
    bounded = withb.withColumn("_bsz", F.count(F.lit(1)).over(w)).filter(
        F.col("_bsz") <= max_bucket
    )
    a = bounded.select(
        "bucket", F.col(id_col).alias("id_a"), F.col("_v").alias("va")
    )
    b = bounded.select(
        "bucket", F.col(id_col).alias("id_b"), F.col("_v").alias("vb")
    )
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("bucket", "id_a", "id_b", "cosine")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """IVF coarse assignment: nearest centroid (max cosine) per vector.

    Centroids broadcast; the corpus is scored in one pass and reduced with
    a window argmax — the inverted-file partitioning step of IVF-Flat.
    """
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id), as_double(F.col(vec_col)).alias("_cvec")
        )
    )
    scored = df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_v")
    ).crossJoin(c).withColumn("cosine", cosine(F.col("_v"), F.col("_cvec")))
    w = Window.partitionBy(id_col).orderBy(F.desc("cosine"), centroid_id)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col(centroid_id), "cosine")
    )


def ivf_search(
    df: DataFrame,
    centroids: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    round_to: int = 6,
) -> DataFrame:
    """IVF-Flat search: score the query against the (broadcast) centroid
    table, keep the ``nprobe`` nearest inverted lists, and run exact cosine
    only inside those lists.

    Corpus assignment is a narrow broadcast pass (no shuffle); the probe
    filter prunes ~``nprobe/|centroids|`` of the corpus before the exact
    re-rank, which is what makes this the scale path over brute force.
    Cosines are rounded before every argmax/top-k so rankings are
    reproducible across engines.
    """
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id), as_double(F.col(vec_col)).alias("_cvec")
        )
    )
    q = F.broadcast(query_df.select(as_double(F.col(vec_col)).alias("_qvec")))
    probed = (
        c.crossJoin(q)
        .withColumn("_qcos", F.round(cosine(F.col("_cvec"), F.col("_qvec")), round_to))
        .orderBy(F.desc("_qcos"), centroid_id)
        .limit(nprobe)
        .select(centroid_id)
    )
    scored = (
        df.select(F.col(id_col), as_double(F.col(vec_col)).alias("_v"))
        .crossJoin(c)
        .withColumn("_acos", F.round(cosine(F.col("_v"), F.col("_cvec")), round_to))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_acos"), centroid_id)
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col(centroid_id), "_v")
    )
    return (
        assigned.join(F.broadcast(probed), centroid_id)
        .crossJoin(q)
        .withColumn("cosine", F.round(cosine(F.col("_v"), F.col("_qvec")), round_to))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
        .select(F.col(id_col), F.col(centroid_id), "cosine")
    )
