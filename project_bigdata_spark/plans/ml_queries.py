"""Closed-form ML evaluation catalog entries: nearest-centroid and kNN
classifier evaluations over the labeled embeddings table.

The reference delegates model *fitting* to an out-of-engine trainer
(``ml_training/train_lightgbm.py``; SURVEY §3.3 keeps that boundary), but
classifier EVALUATION — score a labeled holdout, produce the confusion
matrix — is a data-pipeline job, and both evaluators here are closed-form
(no iterative fit), so the entire train+classify+evaluate pass runs
in-plan and carries an exact DuckDB oracle like any other query.

Scale notes (100 TB): the train/test split is the md5-bucket idiom
(ingest-order-free, refresh-stable). Nearest-centroid packs the 10-row
centroid table into ONE broadcast row and classifies with a per-row fold
— corpus scan, zero shuffles. kNN evaluation broadcasts the (always
small) eval set against the train corpus, the same corpus-never-shuffles
shape as ``knn_batch``; distances fold left in fixed element order and
pin to a 1e-6 grid before any argmin, so rank decisions replay
bit-identically across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.operators import similarity as SIM
from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table

_NIBBLE = (
    "strpos('0123456789abcdef',"
    " substring(md5(CAST(vec_id AS VARCHAR)), {pos}, 1)) - 1"
)
_BUCKET = f"({_NIBBLE.format(pos=1)}) * 16 + ({_NIBBLE.format(pos=2)})"

# Full-vector left-ish fold squared L2 — mirrors operators/similarity.l2sq
# on the Spark side; distances are pinned to a 1e-6 grid before ranking.
_L2SQ_SQL = (
    "list_sum(list_transform(list_zip("
    "CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), "
    "p -> (p[1]-p[2])*(p[1]-p[2])))"
)


def _split(df: DataFrame) -> DataFrame:
    bucket = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    return df.withColumn("bucket", bucket)


@query(
    "centroid_classifier_eval",
    oracle=f"""
WITH b AS (
  SELECT vec_id, label, embedding, {_BUCKET} AS bucket FROM embeddings
), comp AS (
  SELECT label, u.pos, u.val
  FROM b, unnest(list_transform(embedding, (v, i) -> struct_pack(
         pos := i,
         val := CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(12,6))))) t(u)
  WHERE bucket < 204
), cent AS (
  SELECT label AS c_label,
         list(CAST(s AS DOUBLE) / n ORDER BY pos) AS cvec
  FROM (
    SELECT label, pos, sum(val) AS s, count(*) AS n
    FROM comp GROUP BY 1, 2
  ) GROUP BY 1
), scored AS (
  SELECT t.vec_id, t.label, c.c_label,
         round({_L2SQ_SQL.format(a='t.embedding', b='c.cvec')}, 6) AS dist
  FROM b t CROSS JOIN cent c WHERE t.bucket >= 204
), best AS (
  SELECT vec_id, label, c_label AS predicted
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, c_label) = 1
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(predicted AS BIGINT) AS predicted,
       CAST(count(*) AS BIGINT) AS n
FROM best GROUP BY 1, 2""",
    doc="Nearest-centroid classifier train+eval in one plan: md5-bucket "
    "80/20 split, per-label centroids from exact DECIMAL component sums "
    "(components pinned to 1e-6 before summing, so the mean is "
    "order-free), then the 10-row centroid table packs into ONE "
    "broadcast row and the holdout classifies with a per-row argmin "
    "fold — corpus scan, zero shuffles, distances on the 1e-6 grid "
    "with label-order tie-break. Output is the confusion matrix.",
    survey_ids=("A4", "M7-ML1"),
)
def centroid_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _split(load_table(spark, sf_dir, "embeddings"))
    train = e.filter(F.col("bucket") < 204)
    test = e.filter(F.col("bucket") >= 204)

    comp = train.select(
        "label",
        F.posexplode(SIM.as_double(F.col("embedding"))).alias("pos", "v"),
    ).select(
        "label", "pos", N.rnd("v", 6).cast("decimal(12,6)").alias("val")
    )
    cent = (
        comp.groupBy("label", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .groupBy(F.col("label").alias("c_label"))
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("pos").alias("pos"),
                            (F.col("s").cast("double") / F.col("n")).alias(
                                "c"
                            ),
                        )
                    )
                ),
                lambda x: x["c"],
            ).alias("cvec")
        )
    )
    crow = F.broadcast(
        cent.agg(
            F.sort_array(
                F.collect_list(F.struct("c_label", "cvec"))
            ).alias("_cents")
        )
    )
    x = SIM.as_double(F.col("embedding"))
    zero = F.struct(
        F.lit(float("inf")).alias("dist"),
        F.lit(-1).cast("int").alias("lab"),
    )
    best = F.aggregate(
        F.col("_cents"),
        zero,
        lambda acc, c: F.when(
            N.rnd(SIM.l2sq(x, c["cvec"]), 6) < acc["dist"],
            F.struct(
                N.rnd(SIM.l2sq(x, c["cvec"]), 6).alias("dist"),
                c["c_label"].cast("int").alias("lab"),
            ),
        ).otherwise(acc),
    )
    scored = test.crossJoin(crow).select(
        "label", best["lab"].alias("predicted")
    )
    return scored.groupBy(
        N.big("label").alias("label"),
        N.big("predicted").alias("predicted"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


@query(
    "knn_classifier_eval",
    oracle=f"""
WITH b AS (
  SELECT vec_id, label, embedding, {_BUCKET} AS bucket FROM embeddings
), ev AS (
  SELECT vec_id, label, embedding
  FROM b WHERE bucket >= 204
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= 256
), pairs AS (
  SELECT t.vec_id, t.label, tr.label AS n_label,
         round({_L2SQ_SQL.format(a='t.embedding', b='tr.embedding')}, 6)
           AS dist,
         tr.vec_id AS n_id
  FROM ev t JOIN b tr ON tr.bucket < 204
), top5 AS (
  SELECT vec_id, label, n_label
  FROM pairs
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, n_id) <= 5
), votes AS (
  SELECT vec_id, label, n_label, count(*) AS c
  FROM top5 GROUP BY 1, 2, 3
), winner AS (
  SELECT vec_id, label, n_label AS predicted
  FROM votes
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY c DESC, n_label) = 1
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(predicted AS BIGINT) AS predicted,
       CAST(count(*) AS BIGINT) AS n
FROM winner GROUP BY 1, 2""",
    doc="5-NN majority-vote classifier evaluation: the md5-bucket "
    "holdout is cut to a FIXED 256-vector eval set (deterministic md5 "
    "ordering, a TakeOrdered — a fraction-of-corpus holdout would make "
    "the distance pairs quadratic in corpus size; a fixed eval set "
    "keeps them linear), broadcast against the train corpus which "
    "scans once and never shuffles (the knn_batch shape). Neighbor "
    "ranks decide on (1e-6-grid distance, train id), votes break ties "
    "on (count desc, label), so every rank decision replays "
    "bit-identically in the oracle. Output is the confusion matrix.",
    survey_ids=("A4", "M7-ML2"),
)
def knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out

    e = _split(load_table(spark, sf_dir, "embeddings"))
    # the train×256 interpreted distance folds are the cost — fan the
    # train scan out first or they all run on the input's single split
    # (round-6 re-plan: 3.9s -> 1.2s at sf0.1, slope 3.5x -> 1.4x)
    train = fan_out(e.filter(F.col("bucket") < 204)).select(
        F.col("vec_id").alias("n_id"),
        F.col("label").alias("n_label"),
        SIM.as_double(F.col("embedding")).alias("n_vec"),
    )
    test = (
        e.filter(F.col("bucket") >= 204)
        .select(
            "vec_id",
            "label",
            SIM.as_double(F.col("embedding")).alias("vec"),
            F.md5(F.col("vec_id").cast("string")).alias("_ord"),
        )
        .orderBy("_ord")
        .limit(256)
        .drop("_ord")
    )
    pairs = train.join(F.broadcast(test)).select(
        "vec_id",
        "label",
        "n_label",
        "n_id",
        N.rnd(SIM.l2sq(F.col("vec"), F.col("n_vec")), 6).alias("dist"),
    )
    w5 = Window.partitionBy("vec_id").orderBy("dist", "n_id")
    top5 = pairs.withColumn("rn", F.row_number().over(w5)).filter(
        F.col("rn") <= 5
    )
    votes = top5.groupBy("vec_id", "label", "n_label").agg(
        F.count(F.lit(1)).alias("c")
    )
    ww = Window.partitionBy("vec_id").orderBy(
        F.col("c").desc(), F.col("n_label")
    )
    winner = votes.withColumn("rn", F.row_number().over(ww)).filter(
        F.col("rn") == 1
    )
    return winner.groupBy(
        N.big("label").alias("label"),
        N.big("n_label").alias("predicted"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


@query(
    "embedding_drift",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding,
         CASE WHEN {_BUCKET} < 128 THEN 'a' ELSE 'b' END AS half
  FROM embeddings
), comp AS (
  SELECT half, u.pos,
         CAST(count(*) AS BIGINT) AS n,
         sum(u.val) AS s
  FROM b, unnest(list_transform(embedding, (v, i) -> struct_pack(
         pos := i,
         val := CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(12,6))))) t(u)
  GROUP BY 1, 2
), means AS (
  SELECT pos,
         max(CASE WHEN half = 'a' THEN CAST(s AS DOUBLE) / n END) AS ma,
         max(CASE WHEN half = 'b' THEN CAST(s AS DOUBLE) / n END) AS mb,
         max(CASE WHEN half = 'a' THEN n END) AS na,
         max(CASE WHEN half = 'b' THEN n END) AS nb
  FROM comp GROUP BY 1
)
SELECT CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b,
       round(list_sum(list(ma * mb ORDER BY pos))
             / (sqrt(list_sum(list(ma * ma ORDER BY pos)))
                * sqrt(list_sum(list(mb * mb ORDER BY pos)))), 6)
         AS mean_cosine,
       round(sqrt(list_sum(list((ma - mb) * (ma - mb) ORDER BY pos))), 6)
         AS l2_shift,
       round(max(abs(ma - mb)), 6) AS max_dim_shift
FROM means""",
    doc="Embedding distribution drift between two corpus halves (the "
    "refresh-over-refresh check an embedding-based curation pipeline "
    "runs before trusting cached ANN indexes / cluster assignments): "
    "md5-bucket halves stand in for old/new snapshots; per-dimension "
    "means from exact DECIMAL component sums, then cosine of the mean "
    "vectors, L2 shift norm, and worst single-dimension shift. One "
    "component aggregation (rows x dims), a 64-row means frame, "
    "closed-form doubles — drift on 10^9 vectors costs one scan.",
    survey_ids=("A10", "M7-S10b"),
)
def embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _split(load_table(spark, sf_dir, "embeddings"))
    half = F.when(F.col("bucket") < 128, F.lit("a")).otherwise(F.lit("b"))
    comp = e.select(
        half.alias("half"),
        F.posexplode(SIM.as_double(F.col("embedding"))).alias("pos", "v"),
    ).select(
        "half", "pos", N.rnd("v", 6).cast("decimal(12,6)").alias("val")
    )
    per_dim = comp.groupBy("half", "pos").agg(
        F.count(F.lit(1)).alias("n"), F.sum("val").alias("s")
    )

    def pick(col, h):
        return F.max(F.when(F.col("half") == h, col))

    means = per_dim.groupBy("pos").agg(
        pick(F.col("s").cast("double") / F.col("n"), "a").alias("ma"),
        pick(F.col("s").cast("double") / F.col("n"), "b").alias("mb"),
        pick(F.col("n"), "a").alias("na"),
        pick(F.col("n"), "b").alias("nb"),
    )
    # pack the 64-row means frame into ordered arrays so the dot/norm
    # folds run in fixed dimension order (order-free would not be
    # bit-reproducible across engines)
    packed = means.agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.sort_array(
            F.collect_list(F.struct("pos", "ma", "mb"))
        ).alias("dims"),
    )
    va = F.transform(F.col("dims"), lambda d: d["ma"])
    vb = F.transform(F.col("dims"), lambda d: d["mb"])
    diff2 = F.aggregate(
        F.zip_with(va, vb, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    maxshift = F.array_max(
        F.zip_with(va, vb, lambda a, b: F.abs(a - b))
    )
    return packed.select(
        "n_a",
        "n_b",
        N.rnd(
            SIM.dot(va, vb) / (F.sqrt(SIM.dot(va, va)) * F.sqrt(SIM.dot(vb, vb))),
            6,
        ).alias("mean_cosine"),
        N.rnd(F.sqrt(diff2), 6).alias("l2_shift"),
        N.rnd(maxshift, 6).alias("max_dim_shift"),
    )


@query(
    "hard_negative_mining",
    oracle=f"""
WITH b AS (
  SELECT vec_id, label, embedding, {_BUCKET} AS bucket FROM embeddings
), anchors AS (
  SELECT vec_id, label, embedding
  FROM b
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= 128
), pairs AS (
  SELECT a.vec_id, a.label, c.vec_id AS neg_id,
         round({_L2SQ_SQL.format(a='a.embedding', b='c.embedding')}, 6)
           AS dist
  FROM anchors a JOIN b c ON c.label <> a.label
), top3 AS (
  SELECT vec_id, label, neg_id, dist
  FROM pairs
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, neg_id) <= 3
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(label AS BIGINT) AS label,
       array_to_string(list(neg_id ORDER BY dist, neg_id), ',')
         AS hard_negatives,
       round(min(dist), 6) AS nearest_neg_dist
FROM top3 GROUP BY 1, 2""",
    doc="Hard-negative mining for contrastive training (the data-prep "
    "pass an embedding-training pipeline runs per epoch): for each of "
    "128 md5-chosen anchors, the 3 nearest DIFFERENT-label vectors — "
    "the negatives that actually move the loss. Same corpus-never-"
    "shuffles shape as the kNN eval: anchors broadcast, distances on "
    "the 1e-6 grid, ranks tie-broken on candidate id so the mined set "
    "replays bit-identically in the oracle.",
    survey_ids=("S2", "M7-ML3"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _split(load_table(spark, sf_dir, "embeddings"))
    anchors = (
        e.select(
            F.col("vec_id"),
            F.col("label").alias("a_label"),
            SIM.as_double(F.col("embedding")).alias("avec"),
            F.md5(F.col("vec_id").cast("string")).alias("_ord"),
        )
        .orderBy("_ord")
        .limit(128)
        .drop("_ord")
    )
    cand = e.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("n_label"),
        SIM.as_double(F.col("embedding")).alias("nvec"),
    )
    pairs = cand.join(F.broadcast(anchors)).filter(
        F.col("n_label") != F.col("a_label")
    ).select(
        "vec_id",
        F.col("a_label").alias("label"),
        "neg_id",
        N.rnd(SIM.l2sq(F.col("avec"), F.col("nvec")), 6).alias("dist"),
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "neg_id")
    top3 = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 3
    )
    return top3.groupBy(
        N.big("vec_id").alias("vec_id"), N.big("label").alias("label")
    ).agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("dist", "neg_id"))
                ),
                lambda s: s["neg_id"].cast("string"),
            ),
        ).alias("hard_negatives"),
        N.rnd(F.min("dist"), 6).alias("nearest_neg_dist"),
    )


@query(
    "training_prep_audit",
    oracle=f"""
WITH b AS (
  SELECT label, ({_BUCKET}) % 5 AS fold FROM embeddings
), cells AS (
  SELECT fold, label, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2
), totals AS (
  SELECT CAST(sum(n) AS DOUBLE) AS total,
         CAST(count(DISTINCT label) AS DOUBLE) AS k
  FROM cells
), per_label AS (
  SELECT label, CAST(sum(n) AS DOUBLE) AS n_label FROM cells GROUP BY 1
)
SELECT CAST(c.fold AS BIGINT) AS fold,
       CAST(c.label AS BIGINT) AS label,
       c.n,
       round(t.total / (t.k * p.n_label), 6) AS class_weight
FROM cells c
JOIN per_label p ON p.label = c.label
CROSS JOIN totals t""",
    doc="Training-prep audit: deterministic 5-fold cross-validation "
    "assignment (md5 bucket mod 5 — stable across refreshes, "
    "decorrelated from ingest order) crossed with labels, plus inverse-"
    "frequency class weights (total / (k * n_label), the sklearn "
    "'balanced' formula). The fold x label census IS the stratification "
    "check: a skewed cell means a fold that over/under-represents a "
    "class. One group pass; weights derive from broadcast totals.",
    survey_ids=("P12", "M7-ML4"),
)
def training_prep_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _split(load_table(spark, sf_dir, "embeddings"))
    cells = e.groupBy(
        (F.col("bucket") % 5).cast("bigint").alias("fold"),
        F.col("label").cast("bigint").alias("label"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    totals = cells.agg(
        F.sum("n").cast("double").alias("total"),
        F.count_distinct("label").cast("double").alias("k"),
    )
    per_label = cells.groupBy(F.col("label").alias("p_label")).agg(
        F.sum("n").cast("double").alias("n_label")
    )
    out = (
        cells.join(
            F.broadcast(per_label),
            cells.label == per_label.p_label,
        )
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        "fold",
        "label",
        "n",
        N.rnd(
            F.col("total") / (F.col("k") * F.col("n_label")), 6
        ).alias("class_weight"),
    )


@query(
    "mahalanobis_outliers",
    oracle=f"""
WITH comp AS (
  SELECT u.pos,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(u.val) AS DOUBLE) AS s,
         CAST(sum(CAST(u.val * u.val AS DECIMAL(28,12))) AS DOUBLE) AS sq
  FROM embeddings, unnest(list_transform(embedding, (v, i) -> struct_pack(
         pos := i,
         val := CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(12,6))))) t(u)
  GROUP BY 1
), stats AS (
  SELECT pos, s / n AS mu,
         greatest((sq - s * s / n) / (n - 1.0), 1e-12) AS var
  FROM comp
), packed AS (
  SELECT list(mu ORDER BY pos) AS mus, list(var ORDER BY pos) AS vars
  FROM stats
), scored AS (
  SELECT e.vec_id, e.label,
         round(list_sum(list_transform(range(1, 65), i ->
           pow(round(CAST(e.embedding[i] AS DOUBLE), 6) - p.mus[i], 2)
             / p.vars[i])), 4) AS m2
  FROM embeddings e CROSS JOIN packed p
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(label AS BIGINT) AS label, m2
FROM scored
QUALIFY row_number() OVER (ORDER BY m2 DESC, vec_id) <= 20""",
    doc="Diagonal-Mahalanobis multivariate outlier screen over the "
    "embedding corpus (the vector-space sibling of mad_outliers): "
    "per-dimension mean/variance from exact DECIMAL component sums "
    "collapse to ONE broadcast row of 64 (mu, var) pairs; each "
    "vector's squared Mahalanobis distance is a fixed-order in-plan "
    "fold, and the top-20 is a TakeOrdered — corpus scanned once, "
    "zero shuffles on the scoring side. The curation use: vectors far "
    "from the distribution in ANY subset of dimensions are encoder "
    "failures or contamination, invisible to plain L2-norm screens.",
    survey_ids=("A5b", "M7-ML5"),
)
def mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        F.posexplode(SIM.as_double(F.col("embedding"))).alias("pos", "v")
    ).select("pos", N.rnd("v", 6).cast("decimal(12,6)").alias("val"))
    stats = comp.groupBy("pos").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("val").cast("double").alias("s"),
        F.sum((F.col("val") * F.col("val")).cast("decimal(28,12)"))
        .cast("double")
        .alias("sq"),
    ).select(
        "pos",
        (F.col("s") / F.col("n")).alias("mu"),
        F.greatest(
            (F.col("sq") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1.0),
            F.lit(1e-12),
        ).alias("var"),
    )
    packed = F.broadcast(
        stats.agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "mu", "var"))
            ).alias("dims")
        )
    )
    x = SIM.as_double(F.col("embedding"))
    m2 = F.aggregate(
        F.zip_with(
            F.col("dims"),
            x,
            lambda d, xv: (
                (N.rnd(xv, 6) - d["mu"]) * (N.rnd(xv, 6) - d["mu"])
            )
            / d["var"],
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = e.crossJoin(packed).select(
        N.big("vec_id").alias("vec_id"),
        N.big("label").alias("label"),
        N.rnd(m2).alias("m2"),
    )
    return scored.orderBy(F.col("m2").desc(), "vec_id").limit(20)


# ---------------------------------------------------------------------------
# uncertainty_sampling
# ---------------------------------------------------------------------------

UNCERTAIN_K = 20


@query(
    "uncertainty_sampling",
    oracle=f"""
WITH b AS (
  SELECT vec_id, label, embedding, {_BUCKET} AS bucket FROM embeddings
), comp AS (
  SELECT label, u.pos, u.val
  FROM b, unnest(list_transform(embedding, (v, i) -> struct_pack(
         pos := i,
         val := CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(12,6))))) t(u)
  WHERE bucket < 204
), cent AS (
  SELECT label AS c_label,
         list(CAST(s AS DOUBLE) / n ORDER BY pos) AS cvec
  FROM (
    SELECT label, pos, sum(val) AS s, count(*) AS n
    FROM comp GROUP BY 1, 2
  ) GROUP BY 1
), scored AS (
  SELECT t.vec_id, t.label, c.c_label,
         round({_L2SQ_SQL.format(a='t.embedding', b='c.cvec')}, 6) AS dist,
         row_number() OVER (PARTITION BY t.vec_id
                            ORDER BY round(
                              {_L2SQ_SQL.format(a='t.embedding',
                                                b='c.cvec')}, 6),
                              c.c_label) AS rk
  FROM b t CROSS JOIN cent c WHERE t.bucket >= 204
), margins AS (
  SELECT w.vec_id, w.label,
         w.c_label AS predicted,
         r.c_label AS runner_up,
         round(r.dist - w.dist, 6) AS margin
  FROM scored w JOIN scored r
    ON w.vec_id = r.vec_id AND w.rk = 1 AND r.rk = 2
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(label AS BIGINT) AS label,
       CAST(predicted AS BIGINT) AS predicted,
       CAST(runner_up AS BIGINT) AS runner_up,
       margin
FROM margins
ORDER BY margin, vec_id
LIMIT {UNCERTAIN_K}""",
    doc="Active-learning margin (uncertainty) sampling on the "
    "nearest-centroid classifier: for every holdout vector, the "
    "margin between its second-closest and closest centroid "
    f"distances; the {UNCERTAIN_K} smallest margins are the points "
    "a labeling budget should be spent on — the standard "
    "annotation-prioritization step of a training-data pipeline. "
    "Same scaffolding as centroid_classifier_eval (md5-bucket split, "
    "exact DECIMAL centroid means, distances pinned to the 1e-6 grid "
    "before any rank), so the margin is a difference of grid doubles "
    "— deterministic; selection orders by (margin, vec_id). Plan: "
    "the 10-row centroid table broadcasts, the holdout scans once "
    "(corpus never shuffles), the per-vector rank is a 10-row window "
    "per vec_id, and the global pick is orderBy().limit() = "
    "TakeOrderedAndProject partial top-k.",
    survey_ids=("M7-ML9",),
)
def uncertainty_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _split(load_table(spark, sf_dir, "embeddings"))
    train = e.filter(F.col("bucket") < 204)
    test = e.filter(F.col("bucket") >= 204)
    comp = train.select(
        "label",
        F.posexplode(SIM.as_double(F.col("embedding"))).alias("pos", "v"),
    ).select(
        "label", "pos", N.rnd("v", 6).cast("decimal(12,6)").alias("val")
    )
    cent = (
        comp.groupBy("label", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .groupBy(F.col("label").alias("c_label"))
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("pos").alias("pos"),
                            (F.col("s").cast("double") / F.col("n")).alias(
                                "c"
                            ),
                        )
                    )
                ),
                lambda x: x["c"],
            ).alias("cvec")
        )
    )
    scored = (
        test.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            "c_label",
            N.rnd(
                SIM.l2sq(SIM.as_double(F.col("embedding")), F.col("cvec")),
                6,
            ).alias("dist"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("dist", "c_label")
            ),
        )
    )
    w1 = scored.filter(F.col("rk") == 1).select(
        "vec_id",
        "label",
        F.col("c_label").alias("predicted"),
        F.col("dist").alias("d1"),
    )
    w2 = scored.filter(F.col("rk") == 2).select(
        "vec_id",
        F.col("c_label").alias("runner_up"),
        F.col("dist").alias("d2"),
    )
    return (
        w1.join(w2, "vec_id")
        .select(
            N.big("vec_id").alias("vec_id"),
            N.big("label").alias("label"),
            N.big("predicted").alias("predicted"),
            N.big("runner_up").alias("runner_up"),
            N.rnd(F.col("d2") - F.col("d1"), 6).alias("margin"),
        )
        .orderBy("margin", "vec_id")
        .limit(UNCERTAIN_K)
    )


# ---------------------------------------------------------------------------
# naive_bayes_eval (round 6)
# ---------------------------------------------------------------------------

_DOC_NIBBLE = (
    "strpos('0123456789abcdef',"
    " substring(md5(CAST(doc_id AS VARCHAR)), {pos}, 1)) - 1"
)
_DOC_BUCKET = f"({_DOC_NIBBLE.format(pos=1)}) * 16 + ({_DOC_NIBBLE.format(pos=2)})"

_NB_WORDS = r"list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')"


@query(
    "naive_bayes_eval",
    oracle=f"""
WITH b AS (
  SELECT doc_id, lang, text, {_DOC_BUCKET} AS bucket FROM documents
), trtf AS (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT lang, unnest({_NB_WORDS}) AS w FROM b WHERE bucket < 204)
  GROUP BY 1, 2
), lstats AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS nl FROM trtf GROUP BY lang
), ldocs AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS dl
  FROM b WHERE bucket < 204 GROUP BY lang
), v AS (
  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v,
         (SELECT CAST(count(*) AS BIGINT) FROM b WHERE bucket < 204) AS dt
  FROM trtf
), model AS (
  SELECT t.lang, t.w,
         {N.sql_cents(
             "ln(CAST(t.c + 1 AS DOUBLE) / (ls.nl + v.v))", 10**9)} AS t9
  FROM trtf t JOIN lstats ls USING (lang), v
), lconst AS (
  SELECT ls.lang,
         {N.sql_cents("ln(1.0 / (ls.nl + v.v))", 10**9)} AS u9,
         {N.sql_cents("ln(CAST(ld.dl AS DOUBLE) / v.dt)", 10**9)} AS p9
  FROM lstats ls JOIN ldocs ld USING (lang), v
), evtf AS (
  SELECT doc_id, lang AS lang_true, w, CAST(count(*) AS BIGINT) AS k
  FROM (SELECT doc_id, lang, unnest({_NB_WORDS}) AS w
        FROM b WHERE bucket >= 204)
  GROUP BY 1, 2, 3
), scored AS (
  SELECT e.doc_id, e.lang_true, lc.lang,
         max(lc.p9) + sum(e.k * coalesce(m.t9, lc.u9)) AS s9
  FROM evtf e CROSS JOIN lconst lc
  LEFT JOIN model m ON m.lang = lc.lang AND m.w = e.w
  GROUP BY 1, 2, 3
), pred AS (
  SELECT lang_true, lang AS predicted
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY s9 DESC, lang) = 1
)
SELECT lang_true, predicted, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2""",
    doc="Multinomial naive-Bayes language classifier, trained and "
    "evaluated in one plan: md5(doc_id)-bucket split (~80/20), "
    "Laplace-smoothed per-(lang, word) log-likelihoods ln((c+1)/"
    "(N_l+V)) and priors ln(d_l/D) — completing the classifier family "
    "(centroid, 5-NN, decision stump) with the text-native generative "
    "baseline every curation lang-id heuristic is benchmarked "
    "against. Exactness: every log term is snapped to the 1e-9 grid "
    "(snap-then-sum), per-doc scores are exact integer sums of "
    "(count x term), and the argmax breaks ties (score DESC, lang "
    "ASC) — the whole decision replays bit-identically. Unseen words "
    "fall back to the per-language smoothing constant via left-join "
    "coalesce. Output: the confusion matrix. Plan: one train "
    "aggregate (vocab x lang, the model — shuffles digests only), "
    "one eval explode joined against it, one rank window per doc; "
    "eval cost is eval-tokens x languages, linear in corpus size.",
    survey_ids=("M7-ML19",),
)
def naive_bayes_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from project_bigdata_spark.operators.dedup import fan_out, words_col

    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
        ).cast("int")
    )
    b = fan_out(d.select("doc_id", "lang", "text", bucket.alias("bucket")))
    tr = b.filter(F.col("bucket") < 204)
    te = b.filter(F.col("bucket") >= 204)
    trtf = (
        tr.select("lang", F.explode(words_col(F.col("text"))).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    lstats = trtf.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("nl")
    )
    ldocs = tr.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    )
    v = trtf.agg(
        F.countDistinct("w").cast("bigint").alias("v")
    ).crossJoin(
        F.broadcast(
            tr.agg(F.count(F.lit(1)).cast("bigint").alias("dt"))
        )
    )
    model = (
        trtf.join(F.broadcast(lstats), "lang")
        .crossJoin(F.broadcast(v))
        .select(
            "lang",
            "w",
            N.cents(
                F.log(
                    (F.col("c") + 1).cast("double")
                    / (F.col("nl") + F.col("v"))
                ),
                10**9,
            ).alias("t9"),
        )
    )
    lconst = (
        lstats.join(ldocs, "lang")
        .crossJoin(F.broadcast(v))
        .select(
            "lang",
            N.cents(
                F.log(F.lit(1.0) / (F.col("nl") + F.col("v"))), 10**9
            ).alias("u9"),
            N.cents(
                F.log(F.col("dl").cast("double") / F.col("dt")), 10**9
            ).alias("p9"),
        )
    )
    evtf = (
        te.select(
            "doc_id",
            F.col("lang").alias("lang_true"),
            F.explode(words_col(F.col("text"))).alias("w"),
        )
        .groupBy("doc_id", "lang_true", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    scored = (
        evtf.crossJoin(F.broadcast(lconst))
        .join(model, ["lang", "w"], "left")
        .groupBy("doc_id", "lang_true", "lang")
        .agg(
            (
                F.max("p9")
                + F.sum(
                    F.col("k") * F.coalesce(F.col("t9"), F.col("u9"))
                )
            ).alias("s9")
        )
    )
    pred = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("s9").desc(), "lang"
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("lang_true", F.col("lang").alias("predicted"))
    )
    return pred.groupBy("lang_true", "predicted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
