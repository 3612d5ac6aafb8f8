"""Round-5 statistical-test / time-series catalog entries (staged for the
round-6 attestation window — registered BEHIND the round-5 priority list).

The monitoring layer a production pipeline runs on its own hourly series:

- ``runs_test``       — Wald-Wolfowitz runs test for randomness of each
  hourly series around its median (exact-integer 5% decision).
- ``acf_lags``        — autocorrelation function at lags {1,2,3,6,12,24}
  per hourly series, as an exact integer ratio.
- ``spearman_hourly`` — Spearman rank correlation between hourly event
  COUNT and hourly total VALUE per series (tie-aware midranks doubled to
  stay integer; Pearson-on-ranks, the correct tied form).
- ``changepoint_best_split`` — single best changepoint per hourly series
  by maximum between-segment sum of squares (binary-segmentation step).
- ``anova_oneway``    — one-way ANOVA F statistic across event types on
  the exact cents grid.
- ``stl_profile``     — additive seasonal decomposition: centered-25h
  moving-average trend, hour-of-day seasonal profile of the detrended
  series, each float snapped to an integer grid before any cross-row sum.
- ``xcorr_lags``      — lagged cross-correlation between every ordered
  pair of hourly series (the lead-lag diagnostic ACF cannot answer).
- ``kaplan_meier``    — survival curve for signup→purchase conversion
  with right-censoring (snap-then-sum log-product, exact risk sets).
- ``retention_cohorts`` — the classic signup-week × week-offset
  retention matrix (exact integer user counts).
- ``harmonic_regression`` — closed-form weighted least-squares fit of
  a + b·cos(2πh/24) + c·sin(2πh/24) to the hour-of-day profile via
  3×3 normal equations (Cramer), with the trig design from ONE shared
  literal table and every cross-row sum on an integer grid.
- ``poisson_bootstrap_ci`` — the bootstrap that runs at 100 TB:
  hash-seeded Poisson(1) multiplicities (integer threshold compares),
  64 resamples, rank-based 95% CI per series.
- ``trimmed_stats``   — 5%-per-side trimmed and winsorized means
  (exact integer total order + conditional aggregates).
- ``hill_tail_index`` — Hill power-law tail estimator over the top-100
  order statistics (WindowGroupLimit partial top-k).
- ``decision_stump`` — best Gini split of value → event_type over
  decile candidates from a 1000-row deterministic hash sketch (the
  distributed-GBDT histogram trick; TakeOrderedAndProject sample).
- ``conformal_intervals`` — split-conformal 90% prediction interval
  per series (md5-parity folds, finite-sample-valid quantile, audited
  calibration coverage).
- ``median_polish``   — Tukey two-sweep median polish of the
  (type × hour-of-day) median matrix (dyadic-rational-exact medians;
  the robust two-way decomposition).
- ``forecast_backtest`` — rolling-origin one-step MAE/RMSE of the
  three M-competition baselines (naive / seasonal-naive / MA-24),
  exact integer errors on the common support.
- ``ljung_box_test``  — portmanteau Q over lags 1..6 vs the χ²₆ 95%
  literal (is there ANY autocorrelation — the i.i.d.-assumption gate).
- ``stratified_ate``  — direct-standardization treatment-effect
  estimator (props.k arm, hour-of-day strata) next to the unadjusted
  diff — the covariate-adjustment contrast.
- ``diff_in_diff``    — 2×2 difference-in-differences at the window
  midpoint (integer epoch split; parallel-trends contrast).
- ``cuped_adjustment`` — CUPED variance reduction (pre-period
  covariate, theta = cov/var; snapped per-user adjustments).
- ``raking_ipf``      — Deming-Stephan raking to uniform marginals
  (3 snapped IPF sweeps on the 20-cell grid).
- ``power_analysis``  — two-sample experiment sizing from observed
  effect and pooled within-arm variance (shared z literals).

Round-6 additions (staged behind the ROUND-6 window, attest in round 7):

- ``kendall_tau_hourly``   — Kendall tau-b between hourly count and
  value (exact integer sign sum + exact tie corrections).
- ``pacf_profile``         — partial autocorrelation at lags 1-3 via
  closed-form Durbin-Levinson determinant ratios.
- ``friedman_daily_types`` — Friedman rank test across types with days
  as complete blocks (doubled midranks; chi2(k-1) literal table).
- ``overdispersion_test``  — Poisson overdispersion / VMR per hourly
  count series (exact integer dispersion ratio; Wilson-Hilferty
  large-df critical value as the defined decision rule).

Cross-engine determinism strategy (same as the rest of the catalog —
see ``_norm.cents``): every aggregate runs on an exact integer grid
(cents; 1e-4-cent for detrended values); significance decisions are
integer inequalities (e.g. ``10000*A^2*(N-1) > 38416*varnum`` encodes
``|Z| > 1.96`` exactly); the only double arithmetic is a fixed per-row
expression over exact integers, identical on both engines, evaluated
once at render.

Reference parity: the reference pipeline's analytics layer computes
trend/seasonality diagnostics over its hourly AQI aggregates
(``/root/reference/spark/batch_processor.py`` hourly groupBy family);
these entries are the standard statistical completions of that surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_bigdata_spark.plans import _norm as N
from project_bigdata_spark.plans.catalog import query
from project_bigdata_spark.sources import load_table

# Shared CTE: the exact-integer-cents hourly series per event type.
HOURLY_SQL = f"""
hourly AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum({N.sql_cents("value")}) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)"""


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type",
        F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias("t"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(N.cents("value")).cast("bigint").alias("c"),
    )


# ---------------------------------------------------------------------------
# runs_test
# ---------------------------------------------------------------------------

@query(
    "runs_test",
    oracle=f"""
WITH {HOURLY_SQL},
med AS (
  SELECT event_type, c AS median_c FROM (
    SELECT event_type, c,
           row_number() OVER (PARTITION BY event_type ORDER BY c, t) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM hourly)
  WHERE rn = (n + 1) // 2
), signs AS (
  SELECT h.event_type,
         h.t,
         CASE WHEN h.c > m.median_c THEN 1 ELSE 0 END AS s
  FROM hourly h JOIN med m USING (event_type)
  WHERE h.c <> m.median_c
), runs AS (
  SELECT event_type,
         CAST(sum(s) AS BIGINT) AS n1,
         CAST(sum(1 - s) AS BIGINT) AS n2,
         CAST(1 + sum(CASE WHEN prev IS NOT NULL AND prev <> s
                           THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM (SELECT event_type, s,
               lag(s) OVER (PARTITION BY event_type ORDER BY t) AS prev
        FROM signs)
  GROUP BY event_type
), stat AS (
  SELECT event_type, n1, n2, r,
         n1 + n2 AS nn,
         CAST(r - 1 AS HUGEINT) * (n1 + n2) - 2 * CAST(n1 AS HUGEINT) * n2
           AS a,
         2 * CAST(n1 AS HUGEINT) * n2
           * (2 * CAST(n1 AS HUGEINT) * n2 - (n1 + n2)) AS varnum
  FROM runs
)
SELECT event_type,
       n1 AS n_above, n2 AS n_below, r AS n_runs,
       CASE WHEN varnum <= 0 THEN NULL
            ELSE round(CAST(a AS DOUBLE)
                       * sqrt(CAST(nn - 1 AS DOUBLE)
                              / CAST(varnum AS DOUBLE)), 4)
       END AS z_stat,
       CASE WHEN varnum <= 0 THEN 'degenerate'
            WHEN 10000 * a * a * (nn - 1) > 38416 * varnum
              THEN 'non_random'
            ELSE 'random' END AS verdict
FROM stat""",
    doc="Wald-Wolfowitz runs test per hourly series: dichotomize each "
    "hour as above/below the series median (lower median by exact "
    "integer rank; equal-to-median hours dropped, the standard "
    "convention), count runs R, and test R against its null "
    "distribution E[R] = 2*n1*n2/N + 1, Var[R] = 2*n1*n2*(2*n1*n2-N) / "
    "(N^2*(N-1)). The 5% two-sided decision is the exact integer "
    "inequality 10000*A^2*(N-1) > 38416*varnum with A = (R-1)*N - "
    "2*n1*n2 (1.96^2 = 38416/10000 exactly), evaluated in "
    "HUGEINT/DECIMAL(38,0) so no float can flip the verdict at any "
    "scale; the one double chain renders Z. Plan: one hourly exchange, "
    "a per-series median by rank, one lag window, one aggregate — "
    "series parallelize across the cluster, per-series state is the "
    "hour count, independent of event volume.",
    survey_ids=("M7-A47",),
)
def runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    w_rank = Window.partitionBy("event_type").orderBy("c", "t")
    w_all = Window.partitionBy("event_type")
    med = (
        hourly.select(
            "event_type",
            "c",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("c").alias("median_c"))
    )
    signs = (
        hourly.join(med, "event_type")
        .filter(F.col("c") != F.col("median_c"))
        .select(
            "event_type",
            "t",
            F.when(F.col("c") > F.col("median_c"), 1).otherwise(0).alias("s"),
        )
    )
    w_t = Window.partitionBy("event_type").orderBy("t")
    runs = (
        signs.withColumn("prev", F.lag("s").over(w_t))
        .groupBy("event_type")
        .agg(
            F.sum("s").cast("bigint").alias("n1"),
            F.sum(1 - F.col("s")).cast("bigint").alias("n2"),
            (
                F.lit(1)
                + F.sum(
                    F.when(
                        F.col("prev").isNotNull()
                        & (F.col("prev") != F.col("s")),
                        1,
                    ).otherwise(0)
                )
            )
            .cast("bigint")
            .alias("r"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    nn = F.col("n1") + F.col("n2")
    a = dec(F.col("r") - 1) * dec(nn) - F.lit(2) * dec(F.col("n1")) * dec(
        F.col("n2")
    )
    varnum = (
        F.lit(2)
        * dec(F.col("n1"))
        * dec(F.col("n2"))
        * (F.lit(2) * dec(F.col("n1")) * dec(F.col("n2")) - dec(nn))
    )
    stat = runs.select(
        "event_type",
        "n1",
        "n2",
        "r",
        nn.alias("nn"),
        a.alias("a"),
        varnum.alias("varnum"),
    )
    z = F.col("a").cast("double") * F.sqrt(
        (F.col("nn") - 1).cast("double") / F.col("varnum").cast("double")
    )
    sig = (
        F.lit(10000) * F.col("a") * F.col("a") * dec(F.col("nn") - 1)
        > F.lit(38416) * F.col("varnum")
    )
    return stat.select(
        "event_type",
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.when(F.col("varnum") <= 0, F.lit(None).cast("double"))
        .otherwise(N.rnd(z))
        .alias("z_stat"),
        F.when(F.col("varnum") <= 0, "degenerate")
        .when(sig, "non_random")
        .otherwise("random")
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# acf_lags
# ---------------------------------------------------------------------------

ACF_LAGS = (1, 2, 3, 6, 12, 24)
_LAGS_SQL = ", ".join(f"({k})" for k in ACF_LAGS)


@query(
    "acf_lags",
    oracle=f"""
WITH {HOURLY_SQL},
idx AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type) AS s
  FROM hourly
), dev AS (
  SELECT event_type, rn,
         CAST(n AS HUGEINT) * c - s AS d
  FROM idx
), den AS (
  SELECT event_type, sum(d * d) AS den FROM dev GROUP BY event_type
), lags(k) AS (VALUES {_LAGS_SQL}),
num AS (
  SELECT a.event_type, l.k,
         CAST(count(*) AS BIGINT) AS n_pairs,
         sum(a.d * b.d) AS num
  FROM dev a
  CROSS JOIN lags l
  JOIN dev b ON b.event_type = a.event_type AND b.rn = a.rn + l.k
  GROUP BY a.event_type, l.k
)
SELECT n.event_type,
       CAST(n.k AS BIGINT) AS lag_hours,
       n.n_pairs,
       round(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE), 6) AS acf
FROM num n JOIN den d USING (event_type)
WHERE d.den > 0""",
    doc="Autocorrelation function of each hourly series at lags "
    "{1,2,3,6,12,24}: r_k = sum_t (x_t - xbar)(x_t+k - xbar) / "
    "sum_t (x_t - xbar)^2 — the seasonality/persistence diagnostic "
    "behind every forecasting choice (the lag-24 spike is the daily "
    "cycle holt_forecast deliberately omits). Scale-free exactness "
    "trick: multiply deviations by n (d_t = n*x_t - S, an exact "
    "integer) — the n^2 factors cancel in the ratio, so numerator and "
    "denominator are exact HUGEINT/DECIMAL(38,0) sums and ACF is one "
    "double division at render. Plan: one hourly exchange, one "
    "windowed pass for (n, S), a 6-way lag self-join on the row index "
    "(pair count = 6*hours per series, bounded by the time range, "
    "independent of event volume), one aggregate.",
    survey_ids=("M7-A48",),
)
def acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    w_all = Window.partitionBy("event_type")
    w_t = Window.partitionBy("event_type").orderBy("t")
    dev = hourly.select(
        "event_type",
        F.row_number().over(w_t).alias("rn"),
        (
            F.count(F.lit(1)).over(w_all).cast("decimal(38,0)") * F.col("c")
            - F.sum("c").over(w_all).cast("decimal(38,0)")
        ).alias("d"),
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).alias("den")
    )
    lags = spark.createDataFrame([(k,) for k in ACF_LAGS], "k int")
    a, b = dev.alias("a"), dev.alias("b")
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.rn") == F.col("a.rn") + F.col("k")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("a.d") * F.col("b.d")).alias("num"),
        )
    )
    return (
        num.join(den, "event_type")
        .filter(F.col("den") > 0)
        .select(
            "event_type",
            F.col("k").cast("bigint").alias("lag_hours"),
            "n_pairs",
            N.rnd(F.col("num").cast("double") / F.col("den").cast("double"), 6)
            .alias("acf"),
        )
    )


# ---------------------------------------------------------------------------
# spearman_hourly
# ---------------------------------------------------------------------------

@query(
    "spearman_hourly",
    oracle=f"""
WITH {HOURLY_SQL},
ranked AS (
  SELECT event_type,
         2 * rank() OVER (PARTITION BY event_type ORDER BY n_events)
           + count(*) OVER (PARTITION BY event_type, n_events) - 1 AS u,
         2 * rank() OVER (PARTITION BY event_type ORDER BY c)
           + count(*) OVER (PARTITION BY event_type, c) - 1 AS v
  FROM hourly
), s AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(u AS HUGEINT)) AS su, sum(CAST(v AS HUGEINT)) AS sv,
         sum(CAST(u AS HUGEINT) * v) AS suv,
         sum(CAST(u AS HUGEINT) * u) AS suu,
         sum(CAST(v AS HUGEINT) * v) AS svv
  FROM ranked GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_hours,
       CASE WHEN (n * suu - su * su) <= 0 OR (n * svv - sv * sv) <= 0
              THEN NULL
            ELSE round(CAST(n * suv - su * sv AS DOUBLE)
                       / (sqrt(CAST(n * suu - su * su AS DOUBLE))
                          * sqrt(CAST(n * svv - sv * sv AS DOUBLE))), 6)
       END AS spearman_rho
FROM s""",
    doc="Spearman rank correlation between hourly event COUNT and hourly "
    "total VALUE per series — the monotone-association monitor (does "
    "more traffic mean more value?). Tie-correct form: Pearson on "
    "midranks, with midranks DOUBLED (2*minrank + ties - 1) so they "
    "stay exact integers; all five sufficient statistics are exact "
    "HUGEINT/DECIMAL(38,0) sums and rho is one double expression "
    "(num / (sqrt(den_u)*sqrt(den_v)) — sqrt applied to each factor "
    "separately so the integer path never exceeds 38 digits at any "
    "scale). Constant series render NULL via an integer guard. Plan: "
    "one hourly exchange + two rank windows over it + one aggregate; "
    "per-series cost is the hour count, independent of event volume.",
    survey_ids=("M7-A49",),
)
def spearman_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ranked = hourly.select(
        "event_type",
        (
            2 * F.rank().over(
                Window.partitionBy("event_type").orderBy("n_events")
            )
            + F.count(F.lit(1)).over(
                Window.partitionBy("event_type", "n_events")
            )
            - 1
        ).alias("u"),
        (
            2 * F.rank().over(Window.partitionBy("event_type").orderBy("c"))
            + F.count(F.lit(1)).over(Window.partitionBy("event_type", "c"))
            - 1
        ).alias("v"),
    )
    s = ranked.groupBy("event_type").agg(
        dec(F.count(F.lit(1))).alias("n"),
        F.sum(dec(F.col("u"))).alias("su"),
        F.sum(dec(F.col("v"))).alias("sv"),
        F.sum(dec(F.col("u")) * F.col("v")).alias("suv"),
        F.sum(dec(F.col("u")) * F.col("u")).alias("suu"),
        F.sum(dec(F.col("v")) * F.col("v")).alias("svv"),
    )
    den_u = F.col("n") * F.col("suu") - F.col("su") * F.col("su")
    den_v = F.col("n") * F.col("svv") - F.col("sv") * F.col("sv")
    num = F.col("n") * F.col("suv") - F.col("su") * F.col("sv")
    rho = num.cast("double") / (
        F.sqrt(den_u.cast("double")) * F.sqrt(den_v.cast("double"))
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_hours"),
        F.when((den_u <= 0) | (den_v <= 0), F.lit(None).cast("double"))
        .otherwise(N.rnd(rho, 6))
        .alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# changepoint_best_split
# ---------------------------------------------------------------------------

@query(
    "changepoint_best_split",
    oracle=f"""
WITH {HOURLY_SQL},
idx AS (
  SELECT event_type, t, c,
         row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn,
         count(*)    OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type ORDER BY t
                      ROWS UNBOUNDED PRECEDING) AS p,
         sum(c) OVER (PARTITION BY event_type) AS s
  FROM hourly
), gains AS (
  SELECT event_type, t, rn, n, p, s,
         CAST(p AS DOUBLE) * p / rn
           + CAST(s - p AS DOUBLE) * (s - p) / (n - rn)
           - CAST(s AS DOUBLE) * s / n AS gain
  FROM idx WHERE rn < n
), best AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY gain DESC, rn) AS pick
  FROM gains
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_hours,
       CAST(t AS BIGINT) AS split_hour,
       CAST(rn AS BIGINT) AS n_left,
       CAST(n - rn AS BIGINT) AS n_right,
       round(CAST(p AS DOUBLE) / rn / 100, 4) AS mean_left,
       round(CAST(s - p AS DOUBLE) / (n - rn) / 100, 4) AS mean_right,
       round(gain / 1e4, 4) AS gain
FROM best WHERE pick = 1""",
    doc="Single best changepoint per hourly series — the core step of "
    "binary segmentation (Scott-Knott / PELT family): the split k "
    "maximizing the between-segment sum of squares gain(k) = P_k^2/k + "
    "(S-P_k)^2/(n-k) - S^2/n, where P_k is the exact integer-cents "
    "prefix sum. gain is evaluated as the IDENTICAL double expression "
    "over exact integers on both engines (correctly-rounded IEEE ops "
    "on identical inputs -> identical doubles), so the argmax — "
    "row_number ordered by (gain DESC, k ASC), tie to the earliest "
    "split — picks the same row everywhere. Plan: one hourly exchange, "
    "one prefix-sum window, one rank window; per-series cost linear in "
    "hours, independent of event volume.",
    survey_ids=("M7-A50",),
)
def changepoint_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    w_all = Window.partitionBy("event_type")
    w_t = Window.partitionBy("event_type").orderBy("t")
    idx = hourly.select(
        "event_type",
        "t",
        F.row_number().over(w_t).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("c").over(w_t.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "p"
        ),
        F.sum("c").over(w_all).alias("s"),
    ).filter(F.col("rn") < F.col("n"))
    gain = (
        F.col("p").cast("double") * F.col("p") / F.col("rn")
        + (F.col("s") - F.col("p")).cast("double")
        * (F.col("s") - F.col("p"))
        / (F.col("n") - F.col("rn"))
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    )
    best = idx.withColumn("gain", gain).withColumn(
        "pick",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("gain").desc(), "rn"
            )
        ),
    )
    return best.filter(F.col("pick") == 1).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_hours"),
        F.col("t").cast("bigint").alias("split_hour"),
        F.col("rn").cast("bigint").alias("n_left"),
        (F.col("n") - F.col("rn")).cast("bigint").alias("n_right"),
        N.rnd(F.col("p").cast("double") / F.col("rn") / 100).alias(
            "mean_left"
        ),
        N.rnd(
            (F.col("s") - F.col("p")).cast("double")
            / (F.col("n") - F.col("rn"))
            / 100
        ).alias("mean_right"),
        N.rnd(F.col("gain") / 1e4).alias("gain"),
    )


# ---------------------------------------------------------------------------
# anova_oneway
# ---------------------------------------------------------------------------

@query(
    "anova_oneway",
    oracle=f"""
WITH cents AS (
  SELECT event_type, {N.sql_cents("value")} AS c FROM events
), grp AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS ng,
         sum(CAST(c AS HUGEINT)) AS sg,
         sum(CAST(c AS HUGEINT) * c) AS qg,
         min(c) AS ming, max(c) AS maxg
  FROM cents GROUP BY event_type
), tot AS (
  -- each group's S_g^2/n_g is snapped to the 1e-2 grid BEFORE the
  -- k-row sum, so the sum is order-free integer arithmetic
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(ng) AS HUGEINT) AS n,
         CAST(sum(sg) AS HUGEINT) AS s,
         CAST(sum(qg) AS HUGEINT) AS q,
         CAST(sum({N.sql_cents("CAST(sg AS DOUBLE) * sg / ng", 100)})
              AS DOUBLE) / 100 AS ssg,
         CAST(sum(maxg - ming) AS BIGINT) AS wspread,
         CAST(min(ming) AS BIGINT) AS cmin,
         CAST(max(maxg) AS BIGINT) AS cmax
  FROM grp
)
SELECT k AS k_groups,
       CAST(n AS BIGINT) AS n_events,
       round((ssg - CAST(s AS DOUBLE) * s / CAST(n AS DOUBLE)) / 1e4, 4)
         AS ss_between,
       round((CAST(q AS DOUBLE) - ssg) / 1e4, 4) AS ss_within,
       -- degenerate dfs decided on EXACT INTEGER predicates before the
       -- float division: k<2 (between df 0), n<=k (within df 0), or
       -- zero within-group spread (SSW exactly 0 on the cents grid)
       CASE WHEN k < 2 OR n <= k OR wspread = 0 THEN CAST(NULL AS DOUBLE)
            ELSE round(((ssg - CAST(s AS DOUBLE) * s / CAST(n AS DOUBLE))
                        / (k - 1))
                       / ((CAST(q AS DOUBLE) - ssg)
                          / (CAST(n AS DOUBLE) - k)), 4) END AS f_stat,
       CASE WHEN cmin = cmax THEN CAST(NULL AS DOUBLE)
            ELSE round((ssg - CAST(s AS DOUBLE) * s / CAST(n AS DOUBLE))
                       / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s
                                                / CAST(n AS DOUBLE)), 6)
            END AS eta_sq
FROM tot""",
    doc="One-way ANOVA across event types on the exact cents grid: "
    "SS_between = sum_g S_g^2/n_g - S^2/n, SS_within = sum c^2 - "
    "sum_g S_g^2/n_g, F = (SSB/(k-1))/(SSW/(n-k)), plus eta-squared "
    "effect size — completes the catalog's inference row (chi-square: "
    "categorical x categorical, Welch t: two groups, ANOVA: k groups). "
    "Group moments (n_g, S_g, sum c^2) are exact HUGEINT/DECIMAL(38,0) "
    "sums; each per-group S_g^2/n_g double is snapped to the 1e-2 "
    "grid BEFORE the k-row sum (snap-then-sum), so even that tiny "
    "cross-row sum is order-free integer arithmetic. Plan: one "
    "map-side-combined group aggregate (k rows) "
    "+ one k-row reduce — the k-row SinglePartition exchange is "
    "cardinality-bounded by the type vocabulary.",
    survey_ids=("M7-A51",),
)
def anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    c = N.cents("value")
    grp = e.select(F.col("event_type"), c.alias("c")).groupBy(
        "event_type"
    ).agg(
        dec(F.count(F.lit(1))).alias("ng"),
        F.sum(dec(F.col("c"))).alias("sg"),
        F.sum(dec(F.col("c")) * F.col("c")).alias("qg"),
        F.min("c").alias("ming"),
        F.max("c").alias("maxg"),
    )
    tot = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        (
            F.sum(
                N.cents(
                    F.col("sg").cast("double")
                    * F.col("sg")
                    / F.col("ng"),
                    scale=100,
                ).cast("decimal(38,0)")
            ).cast("double")
            / 100
        ).alias("ssg"),
        F.sum(F.col("maxg") - F.col("ming")).cast("bigint").alias(
            "wspread"
        ),
        F.min("ming").cast("bigint").alias("cmin"),
        F.max("maxg").cast("bigint").alias("cmax"),
    )
    ssb = F.col("ssg") - F.col("s").cast("double") * F.col("s") / F.col(
        "n"
    ).cast("double")
    ssw = F.col("q").cast("double") - F.col("ssg")
    sst = F.col("q").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ) / F.col("n").cast("double")
    # degenerate dfs decided on EXACT INTEGER predicates before the
    # float division (see the oracle's CASE twins)
    f_ok = (
        (F.col("k") >= 2)
        & (F.col("n") > F.col("k"))
        & (F.col("wspread") != 0)
    )
    return tot.select(
        F.col("k").alias("k_groups"),
        F.col("n").cast("bigint").alias("n_events"),
        N.rnd(ssb / 1e4).alias("ss_between"),
        N.rnd(ssw / 1e4).alias("ss_within"),
        F.when(
            f_ok,
            N.rnd(
                (ssb / (F.col("k") - 1))
                / (ssw / (F.col("n").cast("double") - F.col("k")))
            ),
        ).alias("f_stat"),
        F.when(F.col("cmin") != F.col("cmax"), N.rnd(ssb / sst, 6)).alias(
            "eta_sq"
        ),
    )


# ---------------------------------------------------------------------------
# stl_profile
# ---------------------------------------------------------------------------

@query(
    "stl_profile",
    oracle=f"""
WITH {HOURLY_SQL},
tr AS (
  SELECT event_type, t, c,
         sum(c)   OVER w25 AS s25,
         count(*) OVER w25 AS c25
  FROM hourly
  WINDOW w25 AS (PARTITION BY event_type ORDER BY t
                 ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), det AS (
  -- detrended value on the exact 1e-4 grid: (c - s25/25)*100
  --   = (25*c - s25)*4, an exact integer (no float anywhere)
  SELECT event_type, t % 24 AS hod,
         (25 * CAST(c AS HUGEINT) - s25) * 4 AS d
  FROM tr WHERE c25 = 25
), prof AS (
  SELECT event_type, hod, d,
         sum(d)   OVER (PARTITION BY event_type, hod) AS sd,
         count(*) OVER (PARTITION BY event_type, hod) AS cg
  FROM det
)
SELECT event_type,
       CAST(hod AS BIGINT) AS hour_of_day,
       CAST(cg AS BIGINT) AS n_obs,
       round(CAST(sd AS DOUBLE) / cg / 1e4, 4) AS seasonal,
       round(CAST(sum(abs(cg * d - sd)) AS DOUBLE)
             / (CAST(cg AS DOUBLE) * cg) / 1e4, 4) AS mean_abs_remainder
FROM prof
GROUP BY event_type, hod, cg, sd""",
    doc="Additive seasonal decomposition profile (the STL shape on an "
    "exact grid): trend = centered 25h moving average (complete "
    "windows only), seasonal = hour-of-day mean of the detrended "
    "series, remainder = detrended - seasonal. Exactness: the "
    "detrended value (c - s25/25)*100 equals (25c - s25)*4 — an exact "
    "integer on the 1e-4 value grid, so NO float ever crosses a row "
    "boundary; the remainder is the exact rational (cg*d - sd)/cg, so "
    "mean |remainder| is an exact integer sum divided once at render. "
    "Plan: one hourly exchange, one 25-row moving window, one "
    "(series, hour-of-day) window + aggregate — all linear in hours, "
    "independent of event volume.",
    survey_ids=("M7-A52",),
)
def stl_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    w25 = (
        Window.partitionBy("event_type").orderBy("t").rowsBetween(-12, 12)
    )
    tr = hourly.select(
        "event_type",
        "t",
        "c",
        F.sum("c").over(w25).alias("s25"),
        F.count(F.lit(1)).over(w25).alias("c25"),
    )
    det = tr.filter(F.col("c25") == 25).select(
        "event_type",
        (F.col("t") % 24).alias("hod"),
        ((F.lit(25) * dec(F.col("c")) - F.col("s25")) * 4).alias("d"),
    )
    w_g = Window.partitionBy("event_type", "hod")
    prof = det.select(
        "event_type",
        "hod",
        "d",
        F.sum("d").over(w_g).alias("sd"),
        F.count(F.lit(1)).over(w_g).alias("cg"),
    )
    return prof.groupBy("event_type", "hod", "cg", "sd").agg(
        F.sum(F.abs(dec(F.col("cg")) * F.col("d") - F.col("sd"))).alias(
            "sabs"
        )
    ).select(
        "event_type",
        F.col("hod").cast("bigint").alias("hour_of_day"),
        F.col("cg").cast("bigint").alias("n_obs"),
        N.rnd(F.col("sd").cast("double") / F.col("cg") / 1e4).alias(
            "seasonal"
        ),
        N.rnd(
            F.col("sabs").cast("double")
            / (F.col("cg").cast("double") * F.col("cg"))
            / 1e4
        ).alias("mean_abs_remainder"),
    )


# ---------------------------------------------------------------------------
# xcorr_lags
# ---------------------------------------------------------------------------

XCORR_LAGS = (0, 1, 3, 6, 12, 24)
_XLAGS_SQL = ", ".join(f"({k})" for k in XCORR_LAGS)


@query(
    "xcorr_lags",
    oracle=f"""
WITH {HOURLY_SQL},
lags(k) AS (VALUES {_XLAGS_SQL}),
pairs AS (
  SELECT a.event_type AS lead_type, b.event_type AS lag_type, l.k,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(a.c AS HUGEINT)) AS sx,
         sum(CAST(b.c AS HUGEINT)) AS sy,
         sum(CAST(a.c AS HUGEINT) * a.c) AS sxx,
         sum(CAST(b.c AS HUGEINT) * b.c) AS syy,
         sum(CAST(a.c AS HUGEINT) * b.c) AS sxy
  FROM hourly a
  CROSS JOIN lags l
  JOIN hourly b ON b.event_type <> a.event_type AND b.t = a.t + l.k
  GROUP BY 1, 2, 3
)
SELECT lead_type, lag_type, CAST(k AS BIGINT) AS lag_hours,
       CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN (n * sxx - sx * sx) <= 0 OR (n * syy - sy * sy) <= 0
              THEN NULL
            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
       END AS xcorr
FROM pairs WHERE n >= 2""",
    doc="Lagged cross-correlation between every ordered pair of hourly "
    "series at lags {0,1,3,6,12,24}: Pearson r over aligned pairs "
    "(x_t, y_t+k) — 'does purchase volume follow click volume k hours "
    "later' — the lead-lag diagnostic that acf_lags (self) cannot "
    "answer. Same exactness recipe as spearman_hourly: all six "
    "sufficient statistics are exact HUGEINT/DECIMAL(38,0) sums over "
    "integer cents, r is one double expression with sqrt applied per "
    "factor, degenerate overlaps render NULL via integer guards. "
    "Plan: one hourly exchange, a 6-lag shifted equi-join on (type, "
    "t+k) — pair count bounded by types^2 * 6 * hours, independent of "
    "event volume — one aggregate.",
    survey_ids=("M7-A53",),
)
def xcorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    lags = spark.createDataFrame([(k,) for k in XCORR_LAGS], "k int")
    a, b = hourly.alias("a"), hourly.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b.event_type") != F.col("a.event_type"))
            & (F.col("b.t") == F.col("a.t") + F.col("k")),
        )
        .groupBy(
            F.col("a.event_type").alias("lead_type"),
            F.col("b.event_type").alias("lag_type"),
            "k",
        )
        .agg(
            dec(F.count(F.lit(1))).alias("n"),
            F.sum(dec(F.col("a.c"))).alias("sx"),
            F.sum(dec(F.col("b.c"))).alias("sy"),
            F.sum(dec(F.col("a.c")) * F.col("a.c")).alias("sxx"),
            F.sum(dec(F.col("b.c")) * F.col("b.c")).alias("syy"),
            F.sum(dec(F.col("a.c")) * F.col("b.c")).alias("sxy"),
        )
        .filter(F.col("n") >= 2)
    )
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r = num.cast("double") / (
        F.sqrt(den_x.cast("double")) * F.sqrt(den_y.cast("double"))
    )
    return pairs.select(
        "lead_type",
        "lag_type",
        F.col("k").cast("bigint").alias("lag_hours"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.when((den_x <= 0) | (den_y <= 0), F.lit(None).cast("double"))
        .otherwise(N.rnd(r, 6))
        .alias("xcorr"),
    )


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------

@query(
    "kaplan_meier",
    oracle="""
WITH signup AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), lastobs AS (
  SELECT user_id, max(ts) AS l_ts FROM events GROUP BY user_id
), purch AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN signup s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.s_ts
  GROUP BY e.user_id
), subj AS (
  SELECT s.user_id,
         (epoch_us(coalesce(p.p_ts, l.l_ts)) - epoch_us(s.s_ts))
           // 3600000000 AS dur,
         CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM signup s
  JOIN lastobs l ON s.user_id = l.user_id
  LEFT JOIN purch p ON s.user_id = p.user_id
), byd AS (
  SELECT dur, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(ev) AS BIGINT) AS e
  FROM subj GROUP BY dur
), risk AS (
  SELECT dur, cnt, e,
         sum(cnt) OVER () -
           coalesce(sum(cnt) OVER (ORDER BY dur
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS n_risk
  FROM byd
), ev_rows AS (
  SELECT dur, cnt, e, n_risk,
         CASE WHEN n_risk > e THEN
           CASE WHEN ln(CAST(n_risk - e AS DOUBLE) / n_risk) >= 0
                THEN floor(ln(CAST(n_risk - e AS DOUBLE) / n_risk)
                           * 1000000000 + 0.5)
                ELSE -floor(-ln(CAST(n_risk - e AS DOUBLE) / n_risk)
                            * 1000000000 + 0.5) END
           ELSE 0 END AS l9,
         CASE WHEN e >= n_risk THEN 1 ELSE 0 END AS hit_zero
  FROM risk WHERE e > 0
), curve AS (
  SELECT dur, e, n_risk, cnt - e AS censored_at,
         sum(l9) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS cum_l9,
         max(hit_zero) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
           AS zeroed
  FROM ev_rows
)
SELECT CAST(dur AS BIGINT) AS duration_hours,
       CAST(n_risk AS BIGINT) AS n_at_risk,
       e AS n_events,
       CAST(censored_at AS BIGINT) AS n_censored_at,
       CASE WHEN zeroed = 1 THEN 0e0
            ELSE round(exp(CAST(cum_l9 AS DOUBLE) / 1e9), 6)
       END AS survival
FROM curve""",
    doc="Kaplan-Meier survival curve for signup-to-purchase conversion "
    "with right-censoring (users who never purchase are censored at "
    "their last observed event): S(t) = prod over event times d_i <= t "
    "of (1 - e_i/n_i), n_i = subjects still at risk. The product is "
    "computed with the catalog's snap-then-sum idiom: ln(1 - e/n) is "
    "a PER-ROW double over exact integers, snapped to the 1e-9 "
    "integer grid, prefix-summed as exact integers (order-free), and "
    "exponentiated once at render — no cross-row float accumulation, "
    "so both engines walk the identical integer path (same recipe as "
    "domain_kl_divergence's KL terms). A step where e = n sends the "
    "curve exactly to 0 via an integer flag, not a -inf. Durations on "
    "the whole-hour integer grid (epoch-us integer division). Plan: "
    "three per-user aggregates + one duration-grid frame (rows = "
    "distinct event durations, bounded by the observation window in "
    "hours, never by user count) — the prefix windows run on that "
    "tiny frame, whitelisted single-partition.",
    survey_ids=("M7-B21",),
)
def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    lastobs = e.groupBy("user_id").agg(F.max("ts").alias("l_ts"))
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(signup), "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    subj = (
        signup.join(lastobs, "user_id")
        .join(purch, "user_id", "left")
        .select(
            F.expr(
                "(unix_micros(coalesce(p_ts, l_ts)) - unix_micros(s_ts))"
                " div 3600000000"
            ).alias("dur"),
            F.when(F.col("p_ts").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    byd = subj.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("ev").cast("bigint").alias("e"),
    )
    w_all = Window.partitionBy()
    w_ex = (
        Window.partitionBy()
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = byd.select(
        "dur",
        "cnt",
        "e",
        (
            F.sum("cnt").over(w_all)
            - F.coalesce(F.sum("cnt").over(w_ex), F.lit(0))
        ).alias("n_risk"),
    )
    frac = (F.col("n_risk") - F.col("e")).cast("double") / F.col("n_risk")
    ev_rows = risk.filter(F.col("e") > 0).select(
        "dur",
        "cnt",
        "e",
        "n_risk",
        F.when(
            F.col("n_risk") > F.col("e"),
            N.cents(F.log(frac), scale=1_000_000_000),
        )
        .otherwise(F.lit(0))
        .alias("l9"),
        F.when(F.col("e") >= F.col("n_risk"), 1).otherwise(0).alias(
            "hit_zero"
        ),
    )
    w_in = (
        Window.partitionBy()
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = ev_rows.select(
        "dur",
        "e",
        "n_risk",
        (F.col("cnt") - F.col("e")).alias("censored_at"),
        F.sum("l9").over(w_in).alias("cum_l9"),
        F.max("hit_zero").over(w_in).alias("zeroed"),
    )
    return curve.select(
        F.col("dur").cast("bigint").alias("duration_hours"),
        F.col("n_risk").cast("bigint").alias("n_at_risk"),
        F.col("e").alias("n_events"),
        F.col("censored_at").cast("bigint").alias("n_censored_at"),
        F.when(F.col("zeroed") == 1, F.lit(0.0))
        .otherwise(N.rnd(F.exp(F.col("cum_l9").cast("double") / 1e9), 6))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# retention_cohorts
# ---------------------------------------------------------------------------

@query(
    "retention_cohorts",
    oracle="""
WITH signup AS (
  SELECT user_id,
         (epoch_us(min(ts)) // 86400000000) // 7 AS cw
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), cohort AS (
  SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size
  FROM signup GROUP BY cw
), act AS (
  SELECT DISTINCT e.user_id,
         (epoch_us(e.ts) // 86400000000) // 7 AS aw
  FROM events e
), ret AS (
  SELECT s.cw, a.aw - s.cw AS k,
         CAST(count(*) AS BIGINT) AS retained
  FROM signup s JOIN act a ON a.user_id = s.user_id
  WHERE a.aw - s.cw BETWEEN 0 AND 8
  GROUP BY 1, 2
)
SELECT strftime(DATE '1970-01-01' + to_days(CAST(r.cw * 7 AS INT)),
                '%Y-%m-%d') AS cohort_week,
       CAST(r.k AS BIGINT) AS week_offset,
       c.cohort_size,
       r.retained,
       round(CAST(r.retained AS DOUBLE) / c.cohort_size, 6)
         AS retention_rate
FROM ret r JOIN cohort c USING (cw)""",
    doc="Classic retention matrix: users cohorted by signup week "
    "(week = epoch-day // 7 — a pure integer grid, no locale week "
    "definitions), retained(cohort, k) = users of that cohort active "
    "in ANY event during week cohort+k, for offsets 0..8. Exact "
    "integer counts; one double division at render. Plan: per-user "
    "signup aggregate, a distinct (user, week) activity frame "
    "(volume-bounded at one row per user-week), one equi-join on "
    "user_id and one (cohort, offset) aggregate — the matrix is "
    "weeks x 9 rows. The activity distinct is the only event-volume "
    "shuffle and it is key-partitioned, never collected.",
    survey_ids=("M7-B22",),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day_us = 86_400_000_000
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(
            F.expr(f"(unix_micros(min(ts)) div {day_us}) div 7").alias("cw")
        )
    )
    cohort = signup.groupBy("cw").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    act = e.select(
        "user_id",
        F.expr(f"(unix_micros(ts) div {day_us}) div 7").alias("aw"),
    ).distinct()
    ret = (
        signup.join(act, "user_id")
        .withColumn("k", F.col("aw") - F.col("cw"))
        .filter((F.col("k") >= 0) & (F.col("k") <= 8))
        .groupBy("cw", "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("retained"))
    )
    return ret.join(F.broadcast(cohort), "cw").select(
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), (F.col("cw") * 7).cast("int")),
            "yyyy-MM-dd",
        ).alias("cohort_week"),
        F.col("k").cast("bigint").alias("week_offset"),
        "cohort_size",
        "retained",
        N.rnd(F.col("retained").cast("double") / F.col("cohort_size"), 6)
        .alias("retention_rate"),
    )


# ---------------------------------------------------------------------------
# harmonic_regression
# ---------------------------------------------------------------------------

# Shared literal design table (BENFORD pattern): both engines consume the
# SAME Python doubles for cos/sin(2*pi*h/24), so every moment term is the
# identical IEEE product before its grid snap.
import math as _math

COS24 = [_math.cos(2.0 * _math.pi * h / 24.0) for h in range(24)]
SIN24 = [_math.sin(2.0 * _math.pi * h / 24.0) for h in range(24)]
_COS_SQL = "[" + ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in COS24) + "]"
_SIN_SQL = "[" + ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in SIN24) + "]"


@query(
    "harmonic_regression",
    oracle=f"""
WITH hod AS (
  SELECT event_type,
         CAST(date_part('hour', ts) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS w,
         CAST(sum({N.sql_cents("value")}) AS BIGINT) AS s
  FROM events GROUP BY 1, 2
), terms AS (
  SELECT event_type, w, s,
         {_COS_SQL}[CAST(h + 1 AS INT)] AS ch,
         {_SIN_SQL}[CAST(h + 1 AS INT)] AS sh
  FROM hod
), mom AS (
  SELECT event_type,
         CAST(sum(w) AS HUGEINT) AS m00i,
         sum({N.sql_cents("CAST(w AS DOUBLE) * ch", 1000000)}) AS m01i,
         sum({N.sql_cents("CAST(w AS DOUBLE) * sh", 1000000)}) AS m02i,
         sum({N.sql_cents("CAST(w AS DOUBLE) * ch * ch", 1000000)}) AS m11i,
         sum({N.sql_cents("CAST(w AS DOUBLE) * ch * sh", 1000000)}) AS m12i,
         sum({N.sql_cents("CAST(w AS DOUBLE) * sh * sh", 1000000)}) AS m22i,
         CAST(sum(s) AS HUGEINT) AS v0i,
         sum({N.sql_cents("CAST(s AS DOUBLE) * ch", 1000000)}) AS v1i,
         sum({N.sql_cents("CAST(s AS DOUBLE) * sh", 1000000)}) AS v2i,
         sum({N.sql_cents("CAST(s AS DOUBLE) * s / w", 100)}) AS yyi
  FROM terms GROUP BY event_type
), solved AS (
  SELECT event_type,
         CAST(m00i AS DOUBLE) AS m00,
         CAST(m01i AS DOUBLE) / 1e6 AS m01,
         CAST(m02i AS DOUBLE) / 1e6 AS m02,
         CAST(m11i AS DOUBLE) / 1e6 AS m11,
         CAST(m12i AS DOUBLE) / 1e6 AS m12,
         CAST(m22i AS DOUBLE) / 1e6 AS m22,
         CAST(v0i AS DOUBLE) AS v0,
         CAST(v1i AS DOUBLE) / 1e6 AS v1,
         CAST(v2i AS DOUBLE) / 1e6 AS v2,
         CAST(yyi AS DOUBLE) / 1e2 AS yy
  FROM mom
), cramer AS (
  SELECT *,
         m00 * (m11 * m22 - m12 * m12)
           - m01 * (m01 * m22 - m12 * m02)
           + m02 * (m01 * m12 - m11 * m02) AS det,
         v0 * (m11 * m22 - m12 * m12)
           - m01 * (v1 * m22 - m12 * v2)
           + m02 * (v1 * m12 - m11 * v2) AS deta,
         m00 * (v1 * m22 - v2 * m12)
           - v0 * (m01 * m22 - m12 * m02)
           + m02 * (m01 * v2 - v1 * m02) AS detb,
         m00 * (m11 * v2 - m12 * v1)
           - m01 * (m01 * v2 - v1 * m02)
           + v0 * (m01 * m12 - m11 * m02) AS detc
  FROM solved
), coefs AS (
  SELECT event_type, m00, v0, v1, v2, yy, det,
         deta / det AS ac, detb / det AS bc, detc / det AS cc
  FROM cramer WHERE det <> 0
)
SELECT event_type,
       round(ac / 100, 4) AS mean_level,
       round(bc / 100, 4) AS cos_coef,
       round(cc / 100, 4) AS sin_coef,
       round(sqrt(bc * bc + cc * cc) / 100, 4) AS amplitude,
       round(CASE WHEN atan2(cc, bc) * 12 / pi() < 0
                  THEN atan2(cc, bc) * 12 / pi() + 24
                  ELSE atan2(cc, bc) * 12 / pi() END, 4) AS peak_hour,
       round(1 - (yy - (ac * v0 + bc * v1 + cc * v2))
                 / (yy - v0 * v0 / m00), 6) AS r2
FROM coefs""",
    doc="Closed-form harmonic (diurnal) regression per event type: "
    "weighted least-squares fit of value ~ a + b*cos(2*pi*h/24) + "
    "c*sin(2*pi*h/24) over the 24-row hour-of-day profile, weights = "
    "event counts — identical to the per-event fit because rows in an "
    "hour share the design vector. The trig design comes from ONE "
    "shared literal table (BENFORD pattern) so both engines form the "
    "identical IEEE products; every cross-row moment is snapped to an "
    "integer grid (1e-6; 1e-2 for the y^2 term) before summation, and "
    "the 3x3 normal equations are solved by Cramer's rule as a fixed "
    "double expression over those exact sums. Reports amplitude, peak "
    "hour (atan2 phase), and weighted R^2. This is the parametric "
    "counterpart of stl_profile's nonparametric seasonal means. Plan: "
    "one (type, hour-of-day) aggregate — 24 rows per type — then "
    "scalar algebra; the heavy work is one map-side-combined exchange "
    "of integer partials, nothing else at any scale.",
    survey_ids=("M7-A54",),
)
def harmonic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hod = e.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("h")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("w"),
        F.sum(N.cents("value")).cast("bigint").alias("s"),
    )
    ch = F.element_at(
        F.array(*[F.lit(v) for v in COS24]), F.col("h").cast("int") + 1
    )
    sh = F.element_at(
        F.array(*[F.lit(v) for v in SIN24]), F.col("h").cast("int") + 1
    )
    wd = F.col("w").cast("double")
    sd = F.col("s").cast("double")
    terms = hod.select(
        "event_type",
        "w",
        "s",
        ch.alias("ch"),
        sh.alias("sh"),
    )
    g = lambda c, sc=1_000_000: N.cents(c, sc).cast("decimal(38,0)")  # noqa: E731
    mom = terms.groupBy("event_type").agg(
        F.sum(F.col("w").cast("decimal(38,0)")).alias("m00i"),
        F.sum(g(wd * F.col("ch"))).alias("m01i"),
        F.sum(g(wd * F.col("sh"))).alias("m02i"),
        F.sum(g(wd * F.col("ch") * F.col("ch"))).alias("m11i"),
        F.sum(g(wd * F.col("ch") * F.col("sh"))).alias("m12i"),
        F.sum(g(wd * F.col("sh") * F.col("sh"))).alias("m22i"),
        F.sum(F.col("s").cast("decimal(38,0)")).alias("v0i"),
        F.sum(g(sd * F.col("ch"))).alias("v1i"),
        F.sum(g(sd * F.col("sh"))).alias("v2i"),
        F.sum(g(sd * F.col("s") / F.col("w"), 100)).alias("yyi"),
    )
    m00 = F.col("m00i").cast("double")
    m01 = F.col("m01i").cast("double") / 1e6
    m02 = F.col("m02i").cast("double") / 1e6
    m11 = F.col("m11i").cast("double") / 1e6
    m12 = F.col("m12i").cast("double") / 1e6
    m22 = F.col("m22i").cast("double") / 1e6
    v0 = F.col("v0i").cast("double")
    v1 = F.col("v1i").cast("double") / 1e6
    v2 = F.col("v2i").cast("double") / 1e6
    yy = F.col("yyi").cast("double") / 1e2
    det = (
        m00 * (m11 * m22 - m12 * m12)
        - m01 * (m01 * m22 - m12 * m02)
        + m02 * (m01 * m12 - m11 * m02)
    )
    deta = (
        v0 * (m11 * m22 - m12 * m12)
        - m01 * (v1 * m22 - m12 * v2)
        + m02 * (v1 * m12 - m11 * v2)
    )
    detb = (
        m00 * (v1 * m22 - v2 * m12)
        - v0 * (m01 * m22 - m12 * m02)
        + m02 * (m01 * v2 - v1 * m02)
    )
    detc = (
        m00 * (m11 * v2 - m12 * v1)
        - m01 * (m01 * v2 - v1 * m02)
        + v0 * (m01 * m12 - m11 * m02)
    )
    solved = mom.select(
        "event_type",
        m00.alias("m00"),
        v0.alias("v0"),
        v1.alias("v1"),
        v2.alias("v2"),
        yy.alias("yy"),
        det.alias("det"),
        (deta / det).alias("ac"),
        (detb / det).alias("bc"),
        (detc / det).alias("cc"),
    ).filter(F.col("det") != 0)
    phase = F.atan2(F.col("cc"), F.col("bc")) * 12.0 / _math.pi
    return solved.select(
        "event_type",
        N.rnd(F.col("ac") / 100).alias("mean_level"),
        N.rnd(F.col("bc") / 100).alias("cos_coef"),
        N.rnd(F.col("cc") / 100).alias("sin_coef"),
        N.rnd(
            F.sqrt(F.col("bc") * F.col("bc") + F.col("cc") * F.col("cc"))
            / 100
        ).alias("amplitude"),
        N.rnd(
            F.when(phase < 0, phase + 24).otherwise(phase)
        ).alias("peak_hour"),
        N.rnd(
            1
            - (
                F.col("yy")
                - (
                    F.col("ac") * F.col("v0")
                    + F.col("bc") * F.col("v1")
                    + F.col("cc") * F.col("v2")
                )
            )
            / (F.col("yy") - F.col("v0") * F.col("v0") / F.col("m00")),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# poisson_bootstrap_ci
# ---------------------------------------------------------------------------

# Poisson(1) inverse-CDF thresholds scaled by 2^32, as exact integers
# (floor(cdf_k * 2^32) for k = 0..7): multiplicity m = #{T_k <= u32}.
# P(X > 8) ~ 1.1e-6 is the documented truncation. Both engines compare
# the SAME md5-derived u32 against the SAME integer literals, so every
# resample weight is an exact integer decision — the bootstrap is fully
# deterministic and engine-free.
POISSON1_T = [
    1580030168, 3160060337, 3950075421, 4213413783,
    4279248373, 4292415291, 4294609777, 4294923276,
]
N_BOOT = 64
_T_SUM_SQL = " + ".join(
    f"CASE WHEN u32 >= {t} THEN 1 ELSE 0 END" for t in POISSON1_T
)


@query(
    "poisson_bootstrap_ci",
    oracle=f"""
WITH expanded AS (
  SELECT e.event_type, b.b,
         {N.sql_cents("e.value")} AS c,
         ('0x' || substring(md5(concat(CAST(e.event_id AS VARCHAR), ':',
                                       CAST(b.b AS VARCHAR))), 1, 8))::BIGINT
           AS u32
  FROM events e CROSS JOIN (SELECT unnest(range(0, {N_BOOT})) AS b) b
), weighted AS (
  SELECT event_type, b, c, {_T_SUM_SQL} AS m FROM expanded
), resample AS (
  SELECT event_type, b,
         sum(CAST(m AS HUGEINT) * c) AS smc,
         CAST(sum(m) AS BIGINT) AS sm
  FROM weighted GROUP BY event_type, b
), ranked AS (
  SELECT event_type, b,
         CAST(smc AS DOUBLE) / sm AS mean_b,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(smc AS DOUBLE) / sm, b) AS rk
  FROM resample WHERE sm > 0
), base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum({N.sql_cents("value")}) AS HUGEINT) AS sc
  FROM events GROUP BY event_type
)
SELECT base.event_type, base.n_events,
       round(CAST(base.sc AS DOUBLE) / base.n_events / 100, 4)
         AS mean_value,
       round(lo.mean_b / 100, 4) AS ci_lower,
       round(hi.mean_b / 100, 4) AS ci_upper
FROM base
JOIN ranked lo ON lo.event_type = base.event_type AND lo.rk = 2
JOIN ranked hi ON hi.event_type = base.event_type AND hi.rk = {N_BOOT - 1}""",
    doc="Poisson bootstrap 95% CI for the mean value per event type — "
    "the bootstrap that actually runs at 100 TB (Chamandy et al., "
    "Google): instead of drawing n-out-of-n resamples (which needs "
    "global coordination), each row enters resample b with an "
    "independent Poisson(1) multiplicity, derived here from "
    "md5(event_id:b) so it is exact-deterministic. The multiplicity "
    "is an INTEGER comparison of the 32-bit hash prefix against 8 "
    "shared literal CDF thresholds (floor(cdf*2^32)); resample sums "
    "are exact integer cents; the CI is rank-based (2nd / 63rd of 64 "
    "resample means, ranked on identical doubles with index "
    "tie-break). Truncation at m = 8 (P ~ 1.1e-6) documented. Plan: "
    "one 64-wide explode feeding a map-side-combined (type, b) "
    "aggregate — 64x map work, but the shuffle carries only "
    "types x 64 integer partials; no global resample state anywhere.",
    survey_ids=("M7-A55",),
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out

    # the 64x resample explode does 64 md5s per event — fan the scan out
    # first or the whole expansion runs on the input's single split
    # (round-6 re-plan: 7.4s -> ~1.3s at sf0.1; the 0.01->0.1 slope was
    # 5.5x while 0.1->synthetic-1 was 1.1x, the single-split signature)
    e = fan_out(
        load_table(spark, sf_dir, "events").select(
            "event_type", "event_id", "value"
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    expanded = e.select(
        "event_type",
        "event_id",
        N.cents("value").alias("c"),
        F.explode(F.sequence(F.lit(0), F.lit(N_BOOT - 1))).alias("b"),
    ).select(
        "event_type",
        "b",
        "c",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("u32"),
    )
    m = sum(
        F.when(F.col("u32") >= t, 1).otherwise(0) for t in POISSON1_T
    )
    resample = (
        expanded.withColumn("m", m)
        .groupBy("event_type", "b")
        .agg(
            F.sum(dec(F.col("m")) * F.col("c")).alias("smc"),
            F.sum("m").cast("bigint").alias("sm"),
        )
        .filter(F.col("sm") > 0)
    )
    mean_b = F.col("smc").cast("double") / F.col("sm")
    ranked = resample.select(
        "event_type",
        "b",
        mean_b.alias("mean_b"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(mean_b, F.col("b"))
        )
        .alias("rk"),
    )
    base = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(dec(N.cents("value"))).alias("sc"),
    )
    lo = ranked.filter(F.col("rk") == 2).select(
        "event_type", F.col("mean_b").alias("lo_b")
    )
    hi = ranked.filter(F.col("rk") == N_BOOT - 1).select(
        "event_type", F.col("mean_b").alias("hi_b")
    )
    return (
        base.join(F.broadcast(lo), "event_type")
        .join(F.broadcast(hi), "event_type")
        .select(
            "event_type",
            "n_events",
            N.rnd(
                F.col("sc").cast("double") / F.col("n_events") / 100
            ).alias("mean_value"),
            N.rnd(F.col("lo_b") / 100).alias("ci_lower"),
            N.rnd(F.col("hi_b") / 100).alias("ci_upper"),
        )
    )


# ---------------------------------------------------------------------------
# trimmed_stats
# ---------------------------------------------------------------------------

@query(
    "trimmed_stats",
    oracle=f"""
WITH cents AS (
  SELECT event_type, event_id, {N.sql_cents("value")} AS c FROM events
), ranked AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY c, event_id) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM cents
), agg AS (
  SELECT event_type,
         CAST(max(n) AS BIGINT) AS n,
         CAST(max(n) // 20 AS BIGINT) AS k,
         CAST(sum(c) AS HUGEINT) AS s_all,
         CAST(sum(CASE WHEN r > n // 20 AND r <= n - n // 20
                       THEN c ELSE 0 END) AS HUGEINT) AS s_mid,
         CAST(min(CASE WHEN r > n // 20 THEN c END) AS BIGINT) AS c_lo,
         CAST(max(CASE WHEN r <= n - n // 20 THEN c END) AS BIGINT) AS c_hi
  FROM ranked GROUP BY event_type
)
SELECT event_type, n,
       k AS n_trimmed_each_side,
       round(CAST(s_all AS DOUBLE) / n / 100, 4) AS mean_value,
       round(CAST(s_mid AS DOUBLE) / (n - 2 * k) / 100, 4) AS trimmed_mean,
       round((CAST(s_mid AS DOUBLE) + CAST(k AS DOUBLE) * c_lo
              + CAST(k AS DOUBLE) * c_hi) / n / 100, 4) AS winsorized_mean
FROM agg WHERE n > 2 * k""",
    doc="Robust location estimates per event type: 5%-per-side trimmed "
    "mean (drop the k = n//20 smallest and largest, average the rest) "
    "and winsorized mean (clamp the tails to the surviving boundary "
    "values c_(k+1) and c_(n-k)) next to the raw mean — the standard "
    "outlier-robust triple for monitoring a value stream. Fully exact: "
    "ranks are a total order (value, event_id), the three sums and "
    "both boundary values are integer cents via conditional "
    "aggregates, two double divisions render. Plan: one rank window "
    "per type + one aggregate — the rank is the only event-volume "
    "sort, partitioned by series.",
    survey_ids=("M7-A56",),
)
def trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cents = e.select(
        "event_type", "event_id", N.cents("value").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("c", "event_id")
    w_all = Window.partitionBy("event_type")
    ranked = cents.select(
        "event_type",
        "c",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    kk = F.expr("n div 20")
    agg = ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(F.expr("n div 20")).cast("bigint").alias("k"),
        F.sum(dec(F.col("c"))).alias("s_all"),
        F.sum(
            F.when(
                (F.col("r") > kk) & (F.col("r") <= F.col("n") - kk),
                dec(F.col("c")),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("s_mid"),
        F.min(F.when(F.col("r") > kk, F.col("c")))
        .cast("bigint")
        .alias("c_lo"),
        F.max(F.when(F.col("r") <= F.col("n") - kk, F.col("c")))
        .cast("bigint")
        .alias("c_hi"),
    )
    return agg.filter(F.col("n") > 2 * F.col("k")).select(
        "event_type",
        "n",
        F.col("k").alias("n_trimmed_each_side"),
        N.rnd(F.col("s_all").cast("double") / F.col("n") / 100).alias(
            "mean_value"
        ),
        N.rnd(
            F.col("s_mid").cast("double")
            / (F.col("n") - 2 * F.col("k"))
            / 100
        ).alias("trimmed_mean"),
        N.rnd(
            (
                F.col("s_mid").cast("double")
                + F.col("k").cast("double") * F.col("c_lo")
                + F.col("k").cast("double") * F.col("c_hi")
            )
            / F.col("n")
            / 100
        ).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# hill_tail_index
# ---------------------------------------------------------------------------

HILL_K = 100


@query(
    "hill_tail_index",
    oracle=f"""
WITH cents AS (
  SELECT event_type, event_id, {N.sql_cents("value")} AS c FROM events
  WHERE {N.sql_cents("value")} > 0
), ranked AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY c DESC, event_id) AS r
  FROM cents
), topk AS (
  SELECT * FROM ranked WHERE r <= {HILL_K} + 1
), thresh AS (
  SELECT event_type, c AS xk FROM topk WHERE r = {HILL_K} + 1
), terms AS (
  SELECT t.event_type,
         CASE WHEN ln(CAST(t.c AS DOUBLE) / x.xk) >= 0
              THEN floor(ln(CAST(t.c AS DOUBLE) / x.xk)
                         * 1000000000 + 0.5)
              ELSE -floor(-ln(CAST(t.c AS DOUBLE) / x.xk)
                          * 1000000000 + 0.5) END AS l9
  FROM topk t JOIN thresh x USING (event_type)
  WHERE t.r <= {HILL_K}
), agg AS (
  SELECT event_type, CAST(sum(l9) AS BIGINT) AS sl9,
         CAST(count(*) AS BIGINT) AS k
  FROM terms GROUP BY event_type
)
SELECT a.event_type,
       a.k,
       round(CAST(x.xk AS DOUBLE) / 100, 4) AS threshold_value,
       CASE WHEN a.sl9 <= 0 THEN NULL
            ELSE round(CAST(a.k AS DOUBLE) * 1e9 / a.sl9, 4)
       END AS hill_alpha
FROM agg a JOIN thresh x USING (event_type)""",
    doc=f"Hill tail-index estimator per event type: alpha-hat = k / "
    f"sum(ln(x_(i)/x_(k+1))) over the top k = {HILL_K} order "
    "statistics — the standard power-law tail-heaviness probe "
    "(alpha < 2: infinite variance, the skew regime where mean-based "
    "monitoring breaks). Determinism: the top-k set is an exact "
    "integer total order (value cents DESC, event_id); each log term "
    "is a per-row double over two exact integers, snapped to the "
    "1e-9 grid, summed exactly (snap-then-sum, as kaplan_meier); one "
    "double division renders alpha. Degenerate tails (all top-k "
    "equal to the threshold, sum = 0) render NULL via an integer "
    "guard. Plan: the rank filter r <= k+1 compiles to Spark's "
    "WindowGroupLimit partial top-k — each partition keeps k+1 rows "
    "before the exchange, so the sort never materializes the volume.",
    survey_ids=("M7-A57",),
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "event_type", "event_id", N.cents("value").alias("c")
    ).filter(F.col("c") > 0)
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), "event_id"
    )
    topk = cents.select(
        "event_type", "c", F.row_number().over(w).alias("r")
    ).filter(F.col("r") <= HILL_K + 1)
    thresh = topk.filter(F.col("r") == HILL_K + 1).select(
        "event_type", F.col("c").alias("xk")
    )
    terms = (
        topk.filter(F.col("r") <= HILL_K)
        .join(F.broadcast(thresh), "event_type")
        .select(
            "event_type",
            N.cents(
                F.log(F.col("c").cast("double") / F.col("xk")),
                scale=1_000_000_000,
            ).alias("l9"),
        )
    )
    agg = terms.groupBy("event_type").agg(
        F.sum("l9").cast("bigint").alias("sl9"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return agg.join(F.broadcast(thresh), "event_type").select(
        "event_type",
        "k",
        N.rnd(F.col("xk").cast("double") / 100).alias("threshold_value"),
        F.when(F.col("sl9") <= 0, F.lit(None).cast("double"))
        .otherwise(
            N.rnd(F.col("k").cast("double") * 1e9 / F.col("sl9"))
        )
        .alias("hill_alpha"),
    )


# ---------------------------------------------------------------------------
# decision_stump
# ---------------------------------------------------------------------------

@query(
    "decision_stump",
    oracle=f"""
WITH cents AS (
  SELECT event_type AS cls, event_id, {N.sql_cents("value")} AS c
  FROM events
), sample AS (
  SELECT c, event_id FROM (
    SELECT c, event_id,
           row_number() OVER (ORDER BY md5(CAST(event_id AS VARCHAR)),
                              event_id) AS hr
    FROM cents)
  WHERE hr <= 1000
), ranked AS (
  SELECT c, row_number() OVER (ORDER BY c, event_id) AS r,
         count(*) OVER () AS m
  FROM sample
), cand AS (
  SELECT DISTINCT c AS theta
  FROM ranked, (SELECT unnest(range(1, 10)) AS i) deciles
  WHERE r = (i * m) // 10
), lc AS (
  SELECT cand.theta, cents.cls,
         CAST(sum(CASE WHEN cents.c <= cand.theta THEN 1 ELSE 0 END)
              AS BIGINT) AS lk,
         CAST(count(*) AS BIGINT) AS tk
  FROM cents CROSS JOIN cand
  GROUP BY cand.theta, cents.cls
), per AS (
  SELECT theta,
         CAST(sum(lk) AS BIGINT) AS nl,
         CAST(sum(tk - lk) AS BIGINT) AS nr,
         CAST(sum(tk) AS BIGINT) AS n,
         sum(CAST(lk AS HUGEINT) * lk) AS sl2,
         sum(CAST(tk - lk AS HUGEINT) * (tk - lk)) AS sr2,
         sum(CAST(tk AS HUGEINT) * tk) AS st2
  FROM lc GROUP BY theta
), scored AS (
  SELECT *,
         CAST(sl2 AS DOUBLE) / nl + CAST(sr2 AS DOUBLE) / nr AS f
  FROM per WHERE nl > 0 AND nr > 0
), best AS (
  SELECT *, row_number() OVER (ORDER BY f DESC, theta) AS rk FROM scored
)
SELECT round(CAST(theta AS DOUBLE) / 100, 4) AS threshold_value,
       nl AS n_left, nr AS n_right,
       round(1 - CAST(st2 AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6)
         AS gini_parent,
       round(1 - CAST(sl2 AS DOUBLE) / (CAST(nl AS DOUBLE) * nl), 6)
         AS gini_left,
       round(1 - CAST(sr2 AS DOUBLE) / (CAST(nr AS DOUBLE) * nr), 6)
         AS gini_right,
       round((1 - CAST(st2 AS DOUBLE) / (CAST(n AS DOUBLE) * n))
             - (CAST(nl AS DOUBLE) / n)
               * (1 - CAST(sl2 AS DOUBLE) / (CAST(nl AS DOUBLE) * nl))
             - (CAST(nr AS DOUBLE) / n)
               * (1 - CAST(sr2 AS DOUBLE) / (CAST(nr AS DOUBLE) * nr)), 6)
         AS gini_gain
FROM best WHERE rk = 1""",
    doc="Distributed decision-stump learner: the best single split of "
    "`value` predicting event_type by Gini impurity, with candidate "
    "thresholds = the nine decile boundaries of a FIXED-SIZE (1000) "
    "deterministic hash sample — the histogram/sketch trick every "
    "distributed GBDT uses (XGBoost/LightGBM approximate "
    "split-finding): candidates never require ordering the volume. "
    "The sample is the 1000 hash-smallest rows (md5(event_id) order), "
    "taken with orderBy().limit() which compiles to "
    "TakeOrderedAndProject — a distributed partial top-k, each "
    "partition forwards at most 1000 rows. "
    "Maximizing sum L_k^2/nL + R_k^2/nR is equivalent to minimizing "
    "weighted child Gini; all class counts over the FULL volume are "
    "exact integers, f is the identical double expression on both "
    "engines, argmax tie-breaks on the threshold. Plan: capped sample "
    "windows (<= 1000 rows), one broadcast 9-way conditional "
    "aggregate over the volume (map-side combined), scalar algebra "
    "after — no per-split repartition.",
    survey_ids=("M7-ML8",),
)
def decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cents = e.select(
        F.col("event_type").alias("cls"),
        "event_id",
        N.cents("value").alias("c"),
    )
    sample = (
        cents.orderBy(
            F.md5(F.col("event_id").cast("string")), "event_id"
        )
        .limit(1000)
        .select("c", "event_id")
    )
    w = Window.partitionBy().orderBy("c", "event_id")
    ranked = sample.select(
        "c",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    deciles = spark.range(1, 10).select(F.col("id").alias("i"))
    cand = (
        ranked.crossJoin(F.broadcast(deciles))
        .filter(F.col("r") == F.expr("(i * m) div 10"))
        .select(F.col("c").alias("theta"))
        .distinct()
    )
    lc = (
        cents.crossJoin(F.broadcast(cand))
        .groupBy("theta", "cls")
        .agg(
            F.sum(F.when(F.col("c") <= F.col("theta"), 1).otherwise(0))
            .cast("bigint")
            .alias("lk"),
            F.count(F.lit(1)).cast("bigint").alias("tk"),
        )
    )
    per = lc.groupBy("theta").agg(
        F.sum("lk").cast("bigint").alias("nl"),
        F.sum(F.col("tk") - F.col("lk")).cast("bigint").alias("nr"),
        F.sum("tk").cast("bigint").alias("n"),
        F.sum(dec(F.col("lk")) * F.col("lk")).alias("sl2"),
        F.sum(dec(F.col("tk") - F.col("lk")) * (F.col("tk") - F.col("lk")))
        .alias("sr2"),
        F.sum(dec(F.col("tk")) * F.col("tk")).alias("st2"),
    )
    f = F.col("sl2").cast("double") / F.col("nl") + F.col("sr2").cast(
        "double"
    ) / F.col("nr")
    best = (
        per.filter((F.col("nl") > 0) & (F.col("nr") > 0))
        .withColumn("f", f)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy().orderBy(F.col("f").desc(), "theta")
            ),
        )
        .filter(F.col("rk") == 1)
    )
    gp = 1 - F.col("st2").cast("double") / (
        F.col("n").cast("double") * F.col("n")
    )
    gl = 1 - F.col("sl2").cast("double") / (
        F.col("nl").cast("double") * F.col("nl")
    )
    gr = 1 - F.col("sr2").cast("double") / (
        F.col("nr").cast("double") * F.col("nr")
    )
    return best.select(
        N.rnd(F.col("theta").cast("double") / 100).alias(
            "threshold_value"
        ),
        F.col("nl").alias("n_left"),
        F.col("nr").alias("n_right"),
        N.rnd(gp, 6).alias("gini_parent"),
        N.rnd(gl, 6).alias("gini_left"),
        N.rnd(gr, 6).alias("gini_right"),
        N.rnd(
            gp
            - (F.col("nl").cast("double") / F.col("n")) * gl
            - (F.col("nr").cast("double") / F.col("n")) * gr,
            6,
        ).alias("gini_gain"),
    )


# ---------------------------------------------------------------------------
# conformal_intervals
# ---------------------------------------------------------------------------

@query(
    "conformal_intervals",
    oracle=f"""
WITH cents AS (
  SELECT event_type,
         CAST(date_part('hour', ts) AS BIGINT) AS h,
         event_id, {N.sql_cents("value")} AS c,
         ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS fold
  FROM events
), pred AS (
  SELECT event_type, h,
         CAST(sum(c) AS HUGEINT) AS s, CAST(count(*) AS BIGINT) AS w
  FROM cents WHERE fold = 0 GROUP BY 1, 2
), resid AS (
  SELECT ca.event_type, ca.event_id,
         abs(CAST(ca.c AS DOUBLE) - CAST(p.s AS DOUBLE) / p.w) AS r
  FROM cents ca JOIN pred p
    ON ca.event_type = p.event_type AND ca.h = p.h
  WHERE ca.fold = 1
), ranked AS (
  SELECT event_type, r,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY r, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n_cal
  FROM resid
), q AS (
  SELECT event_type, n_cal, r AS qhat
  FROM ranked
  WHERE rk = least(n_cal, CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT))
), tr AS (
  SELECT event_type, CAST(sum(w) AS BIGINT) AS n_train FROM pred
  GROUP BY event_type
), cov AS (
  SELECT re.event_type,
         CAST(sum(CASE WHEN re.r <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
           AS n_in
  FROM resid re JOIN q ON re.event_type = q.event_type
  GROUP BY re.event_type
)
SELECT q.event_type,
       tr.n_train,
       CAST(q.n_cal AS BIGINT) AS n_calib,
       round(q.qhat / 100, 4) AS qhat_value,
       round(CAST(cov.n_in AS DOUBLE) / q.n_cal, 4) AS calib_coverage
FROM q JOIN tr USING (event_type) JOIN cov USING (event_type)""",
    doc="Split-conformal 90% prediction interval per event type: an "
    "md5-parity fold splits events into train/calibration; the "
    "predictor is the per-(type, hour-of-day) train mean (exact "
    "integer s/w rendered as one identical double); qhat is the "
    "ceil(0.9*(n+1))-th smallest absolute calibration residual "
    "(finite-sample-valid conformal quantile, clamped to n_cal on "
    "tiny folds), with full (residual, event_id) tie-break. The "
    "reported calibration coverage >= 90% is the conformal guarantee "
    "made auditable. This is the distribution-free uncertainty "
    "wrapper a monitoring pipeline puts around ANY point forecast. "
    "Plan: one train aggregate (types x 24 rows, broadcast), one "
    "calibration join + per-type rank window, one coverage "
    "aggregate — per-series sort of the calibration half only.",
    survey_ids=("M7-ML10",),
)
def conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("h"),
        "event_id",
        N.cents("value").alias("c"),
        (
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("fold"),
    )
    pred = (
        cents.filter(F.col("fold") == 0)
        .groupBy("event_type", "h")
        .agg(
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("w"),
        )
    )
    resid = (
        cents.filter(F.col("fold") == 1)
        .join(F.broadcast(pred), ["event_type", "h"])
        .select(
            "event_type",
            "event_id",
            F.abs(
                F.col("c").cast("double")
                - F.col("s").cast("double") / F.col("w")
            ).alias("r"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("r", "event_id")
    wa = Window.partitionBy("event_type")
    ranked = resid.select(
        "event_type",
        "r",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wa).alias("n_cal"),
    )
    q = ranked.filter(
        F.col("rk")
        == F.least(
            F.col("n_cal"),
            F.ceil(0.9 * (F.col("n_cal") + 1)).cast("bigint"),
        )
    ).select("event_type", F.col("n_cal"), F.col("r").alias("qhat"))
    tr = pred.groupBy("event_type").agg(
        F.sum("w").cast("bigint").alias("n_train")
    )
    cov = (
        resid.join(F.broadcast(q.select("event_type", "qhat")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("qhat"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_in")
        )
    )
    return (
        q.join(F.broadcast(tr), "event_type")
        .join(F.broadcast(cov), "event_type")
        .select(
            "event_type",
            "n_train",
            F.col("n_cal").cast("bigint").alias("n_calib"),
            N.rnd(F.col("qhat") / 100).alias("qhat_value"),
            N.rnd(F.col("n_in").cast("double") / F.col("n_cal")).alias(
                "calib_coverage"
            ),
        )
    )


# ---------------------------------------------------------------------------
# median_polish
# ---------------------------------------------------------------------------

@query(
    "median_polish",
    oracle=f"""
WITH cents AS (
  SELECT event_type AS et,
         CAST(date_part('hour', ts) AS BIGINT) AS h,
         {N.sql_cents("value")} AS c
  FROM events
), cells AS (
  SELECT et, h, quantile_cont(CAST(c AS DOUBLE), 0.5) AS v
  FROM cents GROUP BY et, h
), r1 AS (
  SELECT *, quantile_cont(v, 0.5) OVER (PARTITION BY et) AS rm FROM cells
), s1 AS (
  SELECT et, h, v - rm AS v, rm AS re FROM r1
), c1 AS (
  SELECT *, quantile_cont(v, 0.5) OVER (PARTITION BY h) AS cm FROM s1
), s2 AS (
  SELECT et, h, v - cm AS v, re, cm AS ce FROM c1
), r2 AS (
  SELECT *, quantile_cont(v, 0.5) OVER (PARTITION BY et) AS rm FROM s2
), s3 AS (
  SELECT et, h, v - rm AS v, re + rm AS re, ce FROM r2
), c2 AS (
  SELECT *, quantile_cont(v, 0.5) OVER (PARTITION BY h) AS cm FROM s3
), s4 AS (
  SELECT et, h, v - cm AS v, re, ce + cm AS ce FROM c2
)
SELECT et AS event_type,
       h AS hour_of_day,
       round(re / 100, 4) AS row_effect,
       round(ce / 100, 4) AS col_effect,
       round(v / 100, 4) AS residual
FROM s4""",
    doc="Tukey median polish of the (event_type x hour-of-day) median-"
    "value matrix: two full row/column sweeps of median removal — the "
    "outlier-proof two-way decomposition (the robust sibling of "
    "anova_oneway's means and stl_profile's mean seasonal profile; a "
    "single wild hour cannot drag the effects). Exactness without any "
    "grid tricks: every input is an integer-cents value, and each "
    "interpolated median (Spark `percentile` == DuckDB quantile_cont, "
    "the catalog's attested pair) yields (a+b)/2 of dyadic rationals "
    "— exactly representable doubles closed under subtraction, so "
    "after 5 median levels every matrix entry is still a bit-exact "
    "dyadic rational on both engines. Plan: one (type, hod) aggregate "
    "over the volume (the only big pass), then four windowed medians "
    "over the 120-cell frame — vocabulary x 24 rows, constant at any "
    "scale.",
    survey_ids=("M7-A58",),
)
def median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.select(
            F.col("event_type").alias("et"),
            F.hour("ts").cast("bigint").alias("h"),
            N.cents("value").cast("double").alias("c"),
        )
        .groupBy("et", "h")
        .agg(F.percentile(F.col("c"), F.lit(0.5)).alias("v"))
    )
    w_r = Window.partitionBy("et")
    w_c = Window.partitionBy("h")
    med = lambda w: F.percentile(F.col("v"), F.lit(0.5)).over(w)  # noqa: E731
    r1 = cells.withColumn("rm", med(w_r))
    s1 = r1.select(
        "et", "h", (F.col("v") - F.col("rm")).alias("v"),
        F.col("rm").alias("re"),
    )
    c1 = s1.withColumn("cm", med(w_c))
    s2 = c1.select(
        "et", "h", (F.col("v") - F.col("cm")).alias("v"), "re",
        F.col("cm").alias("ce"),
    )
    r2 = s2.withColumn("rm", med(w_r))
    s3 = r2.select(
        "et", "h", (F.col("v") - F.col("rm")).alias("v"),
        (F.col("re") + F.col("rm")).alias("re"), "ce",
    )
    c2 = s3.withColumn("cm", med(w_c))
    s4 = c2.select(
        "et", "h", (F.col("v") - F.col("cm")).alias("v"), "re",
        (F.col("ce") + F.col("cm")).alias("ce"),
    )
    return s4.select(
        F.col("et").alias("event_type"),
        F.col("h").alias("hour_of_day"),
        N.rnd(F.col("re") / 100).alias("row_effect"),
        N.rnd(F.col("ce") / 100).alias("col_effect"),
        N.rnd(F.col("v") / 100).alias("residual"),
    )


# ---------------------------------------------------------------------------
# forecast_backtest
# ---------------------------------------------------------------------------

@query(
    "forecast_backtest",
    oracle=f"""
WITH {HOURLY_SQL},
idx AS (
  SELECT event_type, t, c,
         row_number() OVER w AS rn,
         lag(c, 1)  OVER w AS l1,
         lag(c, 24) OVER w AS l24,
         sum(c) OVER (PARTITION BY event_type ORDER BY t
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS s24
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY t)
), errs AS (
  SELECT event_type,
         CAST(c - l1 AS HUGEINT) AS e_naive,
         CAST(c - l24 AS HUGEINT) AS e_snaive,
         CAST(24 * c - s24 AS HUGEINT) AS e24_ma
  FROM idx WHERE rn >= 26
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         sum(abs(e_naive)) AS a1, sum(e_naive * e_naive) AS q1,
         sum(abs(e_snaive)) AS a2, sum(e_snaive * e_snaive) AS q2,
         sum(abs(e24_ma)) AS a3, sum(e24_ma * e24_ma) AS q3
  FROM errs GROUP BY event_type
)
SELECT event_type, method, n AS n_forecasts,
       round(mae, 4) AS mae, round(rmse, 4) AS rmse
FROM (
  SELECT event_type, n, 'naive' AS method,
         CAST(a1 AS DOUBLE) / n / 100 AS mae,
         sqrt(CAST(q1 AS DOUBLE) / n) / 100 AS rmse
  FROM m
  UNION ALL
  SELECT event_type, n, 'seasonal_naive',
         CAST(a2 AS DOUBLE) / n / 100,
         sqrt(CAST(q2 AS DOUBLE) / n) / 100
  FROM m
  UNION ALL
  SELECT event_type, n, 'moving_avg_24',
         CAST(a3 AS DOUBLE) / (24 * n) / 100,
         sqrt(CAST(q3 AS DOUBLE) / (576 * CAST(n AS DOUBLE))) / 100
  FROM m
)""",
    doc="Rolling-origin forecast backtest per hourly series: one-step "
    "MAE and RMSE of the three M-competition baselines every real "
    "forecaster must beat — naive (last hour), seasonal-naive (same "
    "hour yesterday), and the trailing 24h moving average — evaluated "
    "on the common support (hour 26+ of each series) so the "
    "comparison is fair. Exactness: every error is an exact integer "
    "(the moving-average error is kept 24-scaled: 24c - s24), |e| and "
    "e^2 sum in HUGEINT/DECIMAL(38,0), and MAE/RMSE are fixed double "
    "expressions at render. This is the evaluation harness that "
    "justifies (or indicts) holt_forecast's extra state. Plan: one "
    "hourly exchange, one window pass computing all three forecasts, "
    "one aggregate — linear in hours, independent of event volume.",
    survey_ids=("M7-A59",),
)
def forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    w = Window.partitionBy("event_type").orderBy("t")
    idx = hourly.select(
        "event_type",
        "c",
        F.row_number().over(w).alias("rn"),
        F.lag("c", 1).over(w).alias("l1"),
        F.lag("c", 24).over(w).alias("l24"),
        F.sum("c").over(w.rowsBetween(-24, -1)).alias("s24"),
    ).filter(F.col("rn") >= 26)
    errs = idx.select(
        "event_type",
        dec(F.col("c") - F.col("l1")).alias("e_naive"),
        dec(F.col("c") - F.col("l24")).alias("e_snaive"),
        dec(F.lit(24) * F.col("c") - F.col("s24")).alias("e24_ma"),
    )
    m = errs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.abs(F.col("e_naive"))).alias("a1"),
        F.sum(F.col("e_naive") * F.col("e_naive")).alias("q1"),
        F.sum(F.abs(F.col("e_snaive"))).alias("a2"),
        F.sum(F.col("e_snaive") * F.col("e_snaive")).alias("q2"),
        F.sum(F.abs(F.col("e24_ma"))).alias("a3"),
        F.sum(F.col("e24_ma") * F.col("e24_ma")).alias("q3"),
    )
    nd = F.col("n").cast("double")

    def row(method, a, q, scale_a, scale_q):
        return m.select(
            "event_type",
            F.lit(method).alias("method"),
            F.col("n").alias("n_forecasts"),
            N.rnd(F.col(a).cast("double") / scale_a / 100).alias("mae"),
            N.rnd(F.sqrt(F.col(q).cast("double") / scale_q) / 100).alias(
                "rmse"
            ),
        )

    out = (
        row("naive", "a1", "q1", nd, nd)
        .unionByName(row("seasonal_naive", "a2", "q2", nd, nd))
        .unionByName(
            row("moving_avg_24", "a3", "q3", 24 * nd, 576 * nd)
        )
    )
    return out


# ---------------------------------------------------------------------------
# ljung_box_test
# ---------------------------------------------------------------------------

LB_LAGS = 6
LB_CHI2_95_6 = 12.591587243743977  # chi2.ppf(0.95, 6), shared literal


@query(
    "ljung_box_test",
    oracle=f"""
WITH {HOURLY_SQL},
idx AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type) AS s
  FROM hourly
), dev AS (
  SELECT event_type, rn, n,
         CAST(n AS HUGEINT) * c - s AS d
  FROM idx
), den AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         sum(d * d) AS den
  FROM dev GROUP BY event_type
), lags(k) AS (SELECT unnest(range(1, {LB_LAGS} + 1))),
num AS (
  SELECT a.event_type, l.k, sum(a.d * b.d) AS num
  FROM dev a
  CROSS JOIN lags l
  JOIN dev b ON b.event_type = a.event_type AND b.rn = a.rn + l.k
  GROUP BY a.event_type, l.k
), terms AS (
  -- snap each r_k^2/(n-k) term to the 1e-12 grid BEFORE summing, so
  -- the 6-term sum is order-free integer arithmetic on both engines
  SELECT n.event_type, d.n,
         {N.sql_cents(
             "(CAST(n.num AS DOUBLE) / d.den)"
             " * (CAST(n.num AS DOUBLE) / d.den) / (d.n - n.k)",
             10**12,
         )} AS t12
  FROM num n JOIN den d USING (event_type)
  WHERE d.den > 0
), q AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) * (n + 2)
           * (CAST(sum(t12) AS DOUBLE) / 1e12) AS q_stat
  FROM terms GROUP BY event_type, n
)
SELECT event_type,
       n AS n_hours,
       CAST({LB_LAGS} AS BIGINT) AS dof,
       round(q_stat, 4) AS q_stat,
       CASE WHEN q_stat > {LB_CHI2_95_6!r} THEN 'autocorrelated'
            ELSE 'white_noise' END AS verdict
FROM q""",
    doc="Ljung-Box portmanteau test per hourly series: Q = n(n+2) * "
    f"sum_k r_k^2/(n-k) over lags 1..{LB_LAGS}, vs the chi-square "
    "95% critical value (a shared literal, the BENFORD pattern) — "
    "the standard 'is there ANY autocorrelation' gate run before "
    "trusting i.i.d.-based monitors (conversion_ci, poisson_bootstrap "
    "assume exchangeability; this test tells you when that is "
    "false). Exactness: each r_k = num_k/den is an exact-integer "
    "ratio (same n-scaled deviations as acf_lags), so Q is a fixed "
    "double expression over exact integers — identical cross-engine; "
    "the verdict compares identical doubles against one shared "
    "literal. Plan: one hourly exchange, a 6-lag index self-join "
    "(6 x hours pairs per series), two aggregates.",
    survey_ids=("M7-A60",),
)
def ljung_box_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    w_all = Window.partitionBy("event_type")
    w_t = Window.partitionBy("event_type").orderBy("t")
    dev = hourly.select(
        "event_type",
        F.row_number().over(w_t).alias("rn"),
        (
            F.count(F.lit(1)).over(w_all).cast("decimal(38,0)") * F.col("c")
            - F.sum("c").over(w_all).cast("decimal(38,0)")
        ).alias("d"),
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).alias("den"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    lags = spark.createDataFrame([(k,) for k in range(1, LB_LAGS + 1)], "k int")
    a, b = dev.alias("a"), dev.alias("b")
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.rn") == F.col("a.rn") + F.col("k")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "k")
        .agg(F.sum(F.col("a.d") * F.col("b.d")).alias("num"))
    )
    r = F.col("num").cast("double") / F.col("den").cast("double")
    t12 = N.cents(
        r * r / (F.col("n") - F.col("k")), scale=10**12
    )
    q = (
        num.join(den, "event_type")
        .filter(F.col("den") > 0)
        .select("event_type", "n", t12.alias("t12"))
        .groupBy("event_type", "n")
        .agg(
            (
                F.col("n").cast("double")
                * (F.col("n") + 2)
                * (F.sum("t12").cast("double") / 1e12)
            ).alias("q_stat")
        )
    )
    return q.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.lit(LB_LAGS).cast("bigint").alias("dof"),
        N.rnd(F.col("q_stat")).alias("q_stat"),
        F.when(F.col("q_stat") > LB_CHI2_95_6, "autocorrelated")
        .otherwise("white_noise")
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# stratified_ate
# ---------------------------------------------------------------------------

@query(
    "stratified_ate",
    oracle=f"""
WITH base AS (
  SELECT CAST(date_part('hour', ts) AS BIGINT) AS h,
         CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
              THEN 1 ELSE 0 END AS treated,
         {N.sql_cents("value")} AS c
  FROM events
), cell AS (
  SELECT h, treated,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS HUGEINT) AS s
  FROM base GROUP BY h, treated
), strat AS (
  SELECT t.h, t.n + c.n AS w,
         {N.sql_cents(
            "(CAST(t.s AS DOUBLE) / t.n - CAST(c.s AS DOUBLE) / c.n)"
            " * (t.n + c.n)", 10000)} AS term4
  FROM cell t JOIN cell c ON t.h = c.h AND t.treated = 1 AND c.treated = 0
), tot AS (
  SELECT CAST(sum(w) AS BIGINT) AS n_strat,
         CAST(sum(term4) AS HUGEINT) AS s_term
  FROM strat
), raw AS (
  SELECT CAST(sum(CASE WHEN treated = 1 THEN c END) AS DOUBLE)
           / sum(CASE WHEN treated = 1 THEN 1 END)
         - CAST(sum(CASE WHEN treated = 0 THEN c END) AS DOUBLE)
           / sum(CASE WHEN treated = 0 THEN 1 END) AS diff,
         CAST(sum(treated) AS BIGINT) AS n_treated,
         CAST(sum(1 - treated) AS BIGINT) AS n_control
  FROM base
)
SELECT r.n_treated, r.n_control,
       round(r.diff / 100, 4) AS unadjusted_diff,
       round(CAST(t.s_term AS DOUBLE) / t.n_strat / 1e4 / 100, 4)
         AS stratified_ate
FROM raw r CROSS JOIN tot t""",
    doc="Stratified average-treatment-effect estimator (direct "
    "standardization): treatment = props.k >= 50, strata = hour of "
    "day; ATE-hat = sum_h w_h * (mean_treated_h - mean_control_h) / "
    "sum_h w_h with w_h = stratum size — the covariate-adjusted "
    "contrast reported next to the unadjusted diff-in-means (their "
    "gap IS the confounding bound for this stratification; on this "
    "synthetic corpus k is independent of hour, so the two estimates "
    "agree — the honest null). Exactness: per-stratum means are "
    "exact-integer ratios; each stratum term is snapped to the 1e-4 "
    "grid before the cross-stratum sum (snap-then-sum); strata with "
    "a missing arm drop out via the inner join, the standard "
    "positivity rule. Plan: one (hour, arm) aggregate — 48 cells — "
    "then scalar algebra; single volume pass, map-side combined.",
    survey_ids=("M7-ML12",),
)
def stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = e.select(
        F.hour("ts").cast("bigint").alias("h"),
        F.when(
            F.get_json_object("props", "$.k").cast("bigint") >= 50, 1
        )
        .otherwise(0)
        .alias("treated"),
        N.cents("value").alias("c"),
    )
    cell = base.groupBy("h", "treated").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec(F.col("c"))).alias("s"),
    )
    t = cell.filter(F.col("treated") == 1).select(
        "h", F.col("n").alias("nt"), F.col("s").alias("st")
    )
    c = cell.filter(F.col("treated") == 0).select(
        "h", F.col("n").alias("nc"), F.col("s").alias("sc")
    )
    strat = t.join(c, "h").select(
        (F.col("nt") + F.col("nc")).alias("w"),
        N.cents(
            (
                F.col("st").cast("double") / F.col("nt")
                - F.col("sc").cast("double") / F.col("nc")
            )
            * (F.col("nt") + F.col("nc")),
            scale=10000,
        ).alias("term4"),
    )
    tot = strat.agg(
        F.sum("w").cast("bigint").alias("n_strat"),
        F.sum(dec(F.col("term4"))).alias("s_term"),
    )
    raw = base.agg(
        (
            F.sum(F.when(F.col("treated") == 1, F.col("c"))).cast("double")
            / F.sum(F.when(F.col("treated") == 1, 1))
            - F.sum(F.when(F.col("treated") == 0, F.col("c"))).cast(
                "double"
            )
            / F.sum(F.when(F.col("treated") == 0, 1))
        ).alias("diff"),
        F.sum("treated").cast("bigint").alias("n_treated"),
        F.sum(1 - F.col("treated")).cast("bigint").alias("n_control"),
    )
    return raw.crossJoin(F.broadcast(tot)).select(
        "n_treated",
        "n_control",
        N.rnd(F.col("diff") / 100).alias("unadjusted_diff"),
        N.rnd(
            F.col("s_term").cast("double") / F.col("n_strat") / 1e4 / 100
        ).alias("stratified_ate"),
    )


# ---------------------------------------------------------------------------
# diff_in_diff
# ---------------------------------------------------------------------------

@query(
    "diff_in_diff",
    oracle=f"""
WITH span AS (
  SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
         CAST(max(epoch_us(ts)) AS BIGINT) AS hi
  FROM events
), base AS (
  SELECT CASE WHEN epoch_us(e.ts) * 2 >= s.lo + s.hi THEN 1 ELSE 0 END
           AS post,
         CASE WHEN CAST(json_extract(e.props, '$.k') AS BIGINT) >= 50
              THEN 1 ELSE 0 END AS treated,
         {N.sql_cents("e.value")} AS c
  FROM events e CROSS JOIN span s
), cell AS (
  SELECT treated, post,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS HUGEINT) AS s
  FROM base GROUP BY treated, post
), piv AS (
  SELECT
    max(CASE WHEN treated = 1 AND post = 1
             THEN CAST(s AS DOUBLE) / n END) AS t1,
    max(CASE WHEN treated = 1 AND post = 0
             THEN CAST(s AS DOUBLE) / n END) AS t0,
    max(CASE WHEN treated = 0 AND post = 1
             THEN CAST(s AS DOUBLE) / n END) AS c1,
    max(CASE WHEN treated = 0 AND post = 0
             THEN CAST(s AS DOUBLE) / n END) AS c0,
    CAST(sum(n) AS BIGINT) AS n_events
  FROM cell
)
SELECT n_events,
       round((t1 - t0) / 100, 4) AS treated_delta,
       round((c1 - c0) / 100, 4) AS control_delta,
       round(((t1 - t0) - (c1 - c0)) / 100, 4) AS did_estimate
FROM piv""",
    doc="Difference-in-differences on the 2x2 design: treatment = "
    "props.k >= 50, periods split at the observation-window midpoint "
    "(pure integer epoch-microsecond comparison: 2*ts >= lo + hi, no "
    "float time math). DiD = (treated_post - treated_pre) - "
    "(control_post - control_pre) — the parallel-trends contrast that "
    "nets out both group effects and period effects; ~0 on this "
    "synthetic corpus, which is the correct null readout. Exactness: "
    "four cell means are exact-integer ratios; the final contrast is "
    "one fixed double expression; the midpoint is a broadcast scalar "
    "row (no driver collect). Plan: one scalar min/max reduce + one "
    "4-cell aggregate over a single volume pass.",
    survey_ids=("M7-ML13",),
)
def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    span = e.agg(
        F.min(F.unix_micros("ts")).cast("bigint").alias("lo"),
        F.max(F.unix_micros("ts")).cast("bigint").alias("hi"),
    )
    base = e.crossJoin(F.broadcast(span)).select(
        F.when(
            F.unix_micros("ts") * 2 >= F.col("lo") + F.col("hi"), 1
        )
        .otherwise(0)
        .alias("post"),
        F.when(
            F.get_json_object("props", "$.k").cast("bigint") >= 50, 1
        )
        .otherwise(0)
        .alias("treated"),
        N.cents("value").alias("c"),
    )
    cell = base.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec(F.col("c"))).alias("s"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    piv = cell.agg(
        F.max(
            F.when((F.col("treated") == 1) & (F.col("post") == 1), mean)
        ).alias("t1"),
        F.max(
            F.when((F.col("treated") == 1) & (F.col("post") == 0), mean)
        ).alias("t0"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("post") == 1), mean)
        ).alias("c1"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("post") == 0), mean)
        ).alias("c0"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    return piv.select(
        "n_events",
        N.rnd((F.col("t1") - F.col("t0")) / 100).alias("treated_delta"),
        N.rnd((F.col("c1") - F.col("c0")) / 100).alias("control_delta"),
        N.rnd(
            ((F.col("t1") - F.col("t0")) - (F.col("c1") - F.col("c0")))
            / 100
        ).alias("did_estimate"),
    )


# ---------------------------------------------------------------------------
# cuped_adjustment
# ---------------------------------------------------------------------------

@query(
    "cuped_adjustment",
    oracle=f"""
WITH span AS (
  SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
         CAST(max(epoch_us(ts)) AS BIGINT) AS hi
  FROM events
), per_user AS (
  SELECT e.user_id,
         CAST(sum(CASE WHEN epoch_us(e.ts) * 2 < s.lo + s.hi
                       THEN {N.sql_cents("e.value")} ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN epoch_us(e.ts) * 2 >= s.lo + s.hi
                       THEN {N.sql_cents("e.value")} ELSE 0 END)
              AS BIGINT) AS y,
         CAST(sum(CASE WHEN epoch_us(e.ts) * 2 < s.lo + s.hi
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
         CAST(sum(CASE WHEN epoch_us(e.ts) * 2 >= s.lo + s.hi
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_post,
         ('0x' || substring(md5(CAST(e.user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS variant
  FROM events e CROSS JOIN span s
  GROUP BY e.user_id
), cohort AS (
  SELECT * FROM per_user WHERE n_pre > 0 AND n_post > 0
), mom AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM cohort
), theta AS (
  SELECT n, sx, sy, syy,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS th,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
  FROM mom WHERE (n * sxx - sx * sx) > 0
), adj AS (
  SELECT c.variant,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(c.y) AS HUGEINT) AS sy_v,
         CAST(sum({N.sql_cents(
             "CAST(c.y AS DOUBLE) - t.th * (c.x - t.xbar)", 100)})
              AS HUGEINT) AS sadj_v,
         CAST(sum(CAST({N.sql_cents(
             "CAST(c.y AS DOUBLE) - t.th * (c.x - t.xbar)", 100)}
             AS HUGEINT)
             * {N.sql_cents(
             "CAST(c.y AS DOUBLE) - t.th * (c.x - t.xbar)", 100)})
              AS HUGEINT) AS sadj2_v
  FROM cohort c CROSS JOIN theta t
  GROUP BY c.variant
), tot AS (
  SELECT CAST(sum(n_users) AS BIGINT) AS n,
         CAST(sum(sadj_v) AS HUGEINT) AS sadj,
         CAST(sum(sadj2_v) AS HUGEINT) AS sadj2
  FROM adj
)
SELECT t2.n AS n_users,
       round(th.th, 6) AS theta,
       round((CAST(a1.sy_v AS DOUBLE) / a1.n_users
              - CAST(a0.sy_v AS DOUBLE) / a0.n_users) / 100, 4)
         AS mean_diff_raw,
       round((CAST(a1.sadj_v AS DOUBLE) / a1.n_users
              - CAST(a0.sadj_v AS DOUBLE) / a0.n_users) / 1e2 / 100, 4)
         AS mean_diff_cuped,
       round(1 - (CAST(t2.sadj2 AS DOUBLE) / t2.n
                  - (CAST(t2.sadj AS DOUBLE) / t2.n)
                    * (CAST(t2.sadj AS DOUBLE) / t2.n)) / 1e4
                 / (CAST(th.syy AS DOUBLE) / th.n
                    - (CAST(th.sy AS DOUBLE) / th.n)
                      * (CAST(th.sy AS DOUBLE) / th.n)), 4)
         AS var_reduction
FROM theta th
CROSS JOIN tot t2
JOIN adj a1 ON a1.variant = 1
JOIN adj a0 ON a0.variant = 0""",
    doc="CUPED variance reduction (Deng et al.): per-user post-period "
    "value adjusted by the pre-period covariate, yhat = y - "
    "theta*(x - xbar) with theta = cov(x,y)/var(x) — the standard "
    "trick that shrinks A/B confidence intervals using data from "
    "before the experiment. Periods split at the integer window "
    "midpoint (2*ts >= lo+hi, broadcast scalar span); variants are "
    "md5(user_id) parity; only users observed in BOTH periods enter "
    "(documented cohort rule). Exactness: the five covariate moments "
    "are exact HUGEINT/DECIMAL(38,0) sums; theta and xbar are fixed "
    "double expressions; each per-user adjusted value is snapped to "
    "the 1e-2-cents grid before any cross-row sum (snap-then-sum), "
    "so variant means and the variance-reduction readout replay "
    "bit-identically. Plan: one per-user aggregate, one moment "
    "reduce, one broadcast theta row back over the user frame — two "
    "volume-independent scalar frames, no per-user shuffle beyond "
    "the first aggregate.",
    survey_ids=("M7-ML14",),
)
def cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    span = e.agg(
        F.min(F.unix_micros("ts")).cast("bigint").alias("lo"),
        F.max(F.unix_micros("ts")).cast("bigint").alias("hi"),
    )
    pre = F.unix_micros("ts") * 2 < F.col("lo") + F.col("hi")
    per_user = (
        e.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(pre, N.cents("value")).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(~pre, N.cents("value")).otherwise(0))
            .cast("bigint")
            .alias("y"),
            F.sum(F.when(pre, 1).otherwise(0)).cast("bigint").alias(
                "n_pre"
            ),
            F.sum(F.when(~pre, 1).otherwise(0)).cast("bigint").alias(
                "n_post"
            ),
        )
        .withColumn(
            "variant",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2,
        )
        .filter((F.col("n_pre") > 0) & (F.col("n_post") > 0))
    )
    mom = per_user.agg(
        dec(F.count(F.lit(1))).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
    )
    theta = mom.filter(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) > 0
    ).select(
        "n",
        "sx",
        "sy",
        "syy",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (
                F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
            ).cast("double")
        ).alias("th"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias(
            "xbar"
        ),
    )
    yhat2 = N.cents(
        F.col("y").cast("double")
        - F.col("th") * (F.col("x") - F.col("xbar")),
        scale=100,
    )
    adj = (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(dec(F.col("y"))).alias("sy_v"),
            F.sum(dec(yhat2)).alias("sadj_v"),
            F.sum(dec(yhat2) * yhat2).alias("sadj2_v"),
        )
    )
    tot = adj.agg(
        F.sum("n_users").cast("bigint").alias("n"),
        F.sum("sadj_v").alias("sadj"),
        F.sum("sadj2_v").alias("sadj2"),
    )
    a1 = adj.filter(F.col("variant") == 1).select(
        F.col("n_users").alias("n1"),
        F.col("sy_v").alias("sy1"),
        F.col("sadj_v").alias("sa1"),
    )
    a0 = adj.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("n0"),
        F.col("sy_v").alias("sy0"),
        F.col("sadj_v").alias("sa0"),
    )
    var_adj = F.col("sadj2").cast("double") / F.col("n") - (
        F.col("sadj").cast("double") / F.col("n")
    ) * (F.col("sadj").cast("double") / F.col("n"))
    var_y = F.col("syy").cast("double") / F.col("n_m") - (
        F.col("sy_m").cast("double") / F.col("n_m")
    ) * (F.col("sy_m").cast("double") / F.col("n_m"))
    return (
        theta.select(
            F.col("th"),
            F.col("syy"),
            F.col("sy").alias("sy_m"),
            F.col("n").alias("n_m"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(a1))
        .crossJoin(F.broadcast(a0))
        .select(
            F.col("n").alias("n_users"),
            N.rnd(F.col("th"), 6).alias("theta"),
            N.rnd(
                (
                    F.col("sy1").cast("double") / F.col("n1")
                    - F.col("sy0").cast("double") / F.col("n0")
                )
                / 100
            ).alias("mean_diff_raw"),
            N.rnd(
                (
                    F.col("sa1").cast("double") / F.col("n1")
                    - F.col("sa0").cast("double") / F.col("n0")
                )
                / 1e2
                / 100
            ).alias("mean_diff_cuped"),
            N.rnd(1 - (var_adj / 1e4) / var_y).alias("var_reduction"),
        )
    )


# ---------------------------------------------------------------------------
# raking_ipf
# ---------------------------------------------------------------------------

def _ipf_round_sql(r: int, p: int) -> str:
    """One IPF sweep (rows then columns), weights snapped to the 1e-6
    grid after every per-cell scaling so the marginal sums stay exact
    integer arithmetic."""
    return f"""
, rsum{r} AS (
  SELECT et, CAST(sum(w6) AS HUGEINT) AS rs FROM w{p} GROUP BY et
), wr{r} AS (
  SELECT w.et, w.b, n_raw,
         {N.sql_cents(
             "CAST(w.w6 AS DOUBLE) * t.row_t / rs.rs", 1)} AS w6
  FROM w{p} w
  JOIN rsum{r} rs USING (et) CROSS JOIN targets t
), csum{r} AS (
  SELECT b, CAST(sum(w6) AS HUGEINT) AS cs FROM wr{r} GROUP BY b
), w{r} AS (
  SELECT w.et, w.b, n_raw,
         {N.sql_cents(
             "CAST(w.w6 AS DOUBLE) * t.col_t / cs.cs", 1)} AS w6
  FROM wr{r} w
  JOIN csum{r} cs USING (b) CROSS JOIN targets t
)"""


@query(
    "raking_ipf",
    oracle=f"""
WITH cells AS (
  SELECT event_type AS et,
         CAST(date_part('hour', ts) AS BIGINT) // 6 AS b,
         CAST(count(*) AS BIGINT) AS n_raw
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT CAST(sum(n_raw) AS BIGINT) AS n,
         CAST(count(DISTINCT et) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT b) AS BIGINT) AS n_cols
  FROM cells
), targets AS (
  -- uniform calibration targets on the 1e-6 weight grid
  SELECT CAST(n AS DOUBLE) * 1e6 / n_rows AS row_t,
         CAST(n AS DOUBLE) * 1e6 / n_cols AS col_t
  FROM tot
), w0 AS (
  SELECT et, b, n_raw, CAST(n_raw AS BIGINT) * 1000000 AS w6 FROM cells
)
{_ipf_round_sql(1, 0)}
{_ipf_round_sql(2, 1)}
{_ipf_round_sql(3, 2)}
SELECT et AS event_type,
       b AS hour_bucket,
       n_raw,
       round(CAST(w6 AS DOUBLE) / 1e6 / n_raw, 6) AS weight_factor
FROM w3""",
    doc="Raking / iterative proportional fitting (Deming-Stephan): "
    "calibrate the (event_type x 6h-bucket) cell weights so BOTH "
    "marginals match uniform targets — the survey-reweighting / "
    "dataset-rebalancing primitive (make the corpus look uniform "
    "over types AND daytime without touching the joint structure). "
    "Three row/column sweeps; after every per-cell scaling the "
    "weight is snapped to the 1e-6 grid, so every marginal sum the "
    "next sweep divides by is exact integer arithmetic — the "
    "fixpoint walk replays bit-identically on both engines "
    "(snap-then-sum applied to an ITERATIVE algorithm). Output: the "
    "per-cell weight factor w/n. Plan: one volume aggregate onto "
    "the 20-cell grid, then three sweeps of grid-sized joins — "
    "constant work at any scale after the first pass.",
    survey_ids=("M7-ML15",),
)
def raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        F.col("event_type").alias("et"),
        (F.hour("ts").cast("bigint") / 6).cast("bigint").alias("b"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_raw"))
    cells = cells.localCheckpoint(eager=True)
    tot = cells.agg(
        F.sum("n_raw").cast("bigint").alias("n"),
        F.countDistinct("et").cast("bigint").alias("n_rows"),
        F.countDistinct("b").cast("bigint").alias("n_cols"),
    )
    targets = tot.select(
        (F.col("n").cast("double") * 1e6 / F.col("n_rows")).alias("row_t"),
        (F.col("n").cast("double") * 1e6 / F.col("n_cols")).alias("col_t"),
    )
    w = cells.select(
        "et", "b", "n_raw", (F.col("n_raw") * 1_000_000).alias("w6")
    )
    # r11: pin w after each half-iteration — every half-step consumes the
    # previous w TWICE (marginal-sum aggregate + rescale projection), so
    # the unpinned 3x2 unroll replayed the chain 2^6 times (15.1 s warm
    # at sf0.1 for a ~20-cell frame; ~1 s pinned). Same discipline as the
    # hits/pca/cc per-round checkpoints.
    for _ in range(3):
        # widen to DECIMAL(38,0) like the module's dec() idiom — a BIGINT
        # sum would silently wrap (Spark non-ANSI) near ~9e12 events while
        # the DuckDB oracle widens to HUGEINT
        rs = w.groupBy("et").agg(
            F.sum(F.col("w6").cast("decimal(38,0)")).alias("rs")
        )
        w = (
            w.join(F.broadcast(rs), "et")
            .crossJoin(F.broadcast(targets))
            .select(
                "et",
                "b",
                "n_raw",
                N.cents(
                    F.col("w6").cast("double")
                    * F.col("row_t")
                    / F.col("rs"),
                    scale=1,
                ).alias("w6"),
            )
        ).localCheckpoint(eager=True)
        cs = w.groupBy("b").agg(
            F.sum(F.col("w6").cast("decimal(38,0)")).alias("cs")
        )
        w = (
            w.join(F.broadcast(cs), "b")
            .crossJoin(F.broadcast(targets))
            .select(
                "et",
                "b",
                "n_raw",
                N.cents(
                    F.col("w6").cast("double")
                    * F.col("col_t")
                    / F.col("cs"),
                    scale=1,
                ).alias("w6"),
            )
        ).localCheckpoint(eager=True)
    return w.select(
        F.col("et").alias("event_type"),
        F.col("b").alias("hour_bucket"),
        "n_raw",
        N.rnd(
            F.col("w6").cast("double") / 1e6 / F.col("n_raw"), 6
        ).alias("weight_factor"),
    )


# ---------------------------------------------------------------------------
# power_analysis
# ---------------------------------------------------------------------------

Z_ALPHA_2 = 1.959963984540054  # norm.ppf(0.975), shared literal
Z_BETA = 0.8416212335729143  # norm.ppf(0.80), shared literal


@query(
    "power_analysis",
    oracle=f"""
WITH base AS (
  SELECT event_type,
         ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS variant,
         {N.sql_cents("value")} AS c
  FROM events
), cell AS (
  SELECT event_type, variant,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
  FROM base GROUP BY 1, 2
), piv AS (
  SELECT event_type,
         max(CASE WHEN variant = 1 THEN n END) AS n1,
         max(CASE WHEN variant = 0 THEN n END) AS n0,
         max(CASE WHEN variant = 1 THEN CAST(s AS DOUBLE) / n END) AS m1,
         max(CASE WHEN variant = 0 THEN CAST(s AS DOUBLE) / n END) AS m0,
         max(CASE WHEN variant = 1 THEN CAST(q AS DOUBLE) END) AS q1,
         max(CASE WHEN variant = 0 THEN CAST(q AS DOUBLE) END) AS q0,
         max(CASE WHEN variant = 1 THEN CAST(s AS DOUBLE) END) AS s1,
         max(CASE WHEN variant = 0 THEN CAST(s AS DOUBLE) END) AS s0,
         CAST(sum(n) AS BIGINT) AS nt
  FROM cell GROUP BY event_type
), stat AS (
  SELECT event_type, n1, n0,
         (m1 - m0) AS delta,
         ((q1 - s1 * s1 / n1) + (q0 - s0 * s0 / n0)) / (nt - 2)
           AS var_pooled
  FROM piv WHERE n1 IS NOT NULL AND n0 IS NOT NULL
)
SELECT event_type,
       n1 AS n_variant_1, n0 AS n_variant_0,
       round(delta / 100, 4) AS observed_diff,
       round(sqrt(var_pooled) / 100, 4) AS pooled_std,
       CASE WHEN abs(delta) < 1e-9 THEN NULL
            ELSE CAST(ceil(2 * var_pooled
                           * {(Z_ALPHA_2 + Z_BETA) ** 2!r}
                           / (delta * delta)) AS BIGINT)
       END AS n_required_per_arm
FROM stat""",
    doc="Experiment power analysis per event type: given the observed "
    "variant difference (md5(event_id) parity arms) and the pooled "
    "WITHIN-arm variance s_p^2 = (ss1 + ss0)/(nt - 2) — the standard "
    "two-sample pooled estimator, excluding the between-arm component "
    "(round-5 advice) — the classic sizing formula n = "
    "2*sigma^2*(z_0.975 + z_0.80)^2 / delta^2 — how many samples per "
    "arm an A/B test needs to detect TODAY's effect size at 5% "
    "significance and 80% power. The z constants are shared literals "
    "(BENFORD pattern); variance and means come from exact "
    "HUGEINT/DECIMAL(38,0) moments, so delta and n_required are "
    "fixed double expressions over identical integers (the one ceil "
    "lands on an identical double); a zero observed delta renders "
    "NULL. Plan: one (type, arm) aggregate — single map-side-"
    "combined volume pass, then scalar algebra on 2k rows.",
    survey_ids=("M7-ML16",),
)
def power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = e.select(
        "event_type",
        (
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("variant"),
        N.cents("value").alias("c"),
    )
    cell = base.groupBy("event_type", "variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec(F.col("c"))).alias("s"),
        F.sum(dec(F.col("c")) * F.col("c")).alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    piv = cell.groupBy("event_type").agg(
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 1, mean)).alias("m1"),
        F.max(F.when(F.col("variant") == 0, mean)).alias("m0"),
        F.max(
            F.when(F.col("variant") == 1, F.col("q").cast("double"))
        ).alias("q1"),
        F.max(
            F.when(F.col("variant") == 0, F.col("q").cast("double"))
        ).alias("q0"),
        F.max(
            F.when(F.col("variant") == 1, F.col("s").cast("double"))
        ).alias("s1"),
        F.max(
            F.when(F.col("variant") == 0, F.col("s").cast("double"))
        ).alias("s0"),
        F.sum("n").cast("bigint").alias("nt"),
    )
    delta = F.col("m1") - F.col("m0")
    # pooled WITHIN-arm variance (nt - 2 dof) — fixed expression order,
    # so both engines evaluate the identical IEEE double
    var_pooled = (
        (F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1"))
        + (F.col("q0") - F.col("s0") * F.col("s0") / F.col("n0"))
    ) / (F.col("nt") - 2)
    k = (Z_ALPHA_2 + Z_BETA) ** 2
    return (
        piv.filter(F.col("n1").isNotNull() & F.col("n0").isNotNull())
        .select(
            "event_type",
            F.col("n1").alias("n_variant_1"),
            F.col("n0").alias("n_variant_0"),
            N.rnd(delta / 100).alias("observed_diff"),
            N.rnd(F.sqrt(var_pooled) / 100).alias("pooled_std"),
            F.when(
                F.abs(delta) < 1e-9, F.lit(None).cast("bigint")
            )
            .otherwise(
                F.ceil(
                    2 * var_pooled * F.lit(k) / (delta * delta)
                ).cast("bigint")
            )
            .alias("n_required_per_arm"),
        )
    )


# ---------------------------------------------------------------------------
# kendall_tau_hourly (round 6)
# ---------------------------------------------------------------------------

@query(
    "kendall_tau_hourly",
    oracle=f"""
WITH {HOURLY_SQL},
pairs AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN (a.n_events - b.n_events) * (a.c - b.c) > 0
                         THEN 1
                       WHEN (a.n_events - b.n_events) * (a.c - b.c) < 0
                         THEN -1 ELSE 0 END) AS HUGEINT) AS s,
         CAST(count(*) AS HUGEINT) AS n0
  FROM hourly a JOIN hourly b
    ON b.event_type = a.event_type AND a.t < b.t
  GROUP BY a.event_type
), tu AS (
  SELECT event_type,
         CAST(sum(cnt * (cnt - 1) / 2) AS HUGEINT) AS tied
  FROM (SELECT event_type, n_events, count(*) AS cnt
        FROM hourly GROUP BY 1, 2)
  GROUP BY event_type
), tv AS (
  SELECT event_type,
         CAST(sum(cnt * (cnt - 1) / 2) AS HUGEINT) AS tied
  FROM (SELECT event_type, c, count(*) AS cnt
        FROM hourly GROUP BY 1, 2)
  GROUP BY event_type
)
SELECT p.event_type,
       CAST(p.s AS BIGINT) AS nc_minus_nd,
       CASE WHEN (p.n0 - tu.tied) <= 0 OR (p.n0 - tv.tied) <= 0 THEN NULL
            ELSE round(CAST(p.s AS DOUBLE)
                       / (sqrt(CAST(p.n0 - tu.tied AS DOUBLE))
                          * sqrt(CAST(p.n0 - tv.tied AS DOUBLE))), 6)
       END AS tau_b
FROM pairs p JOIN tu USING (event_type) JOIN tv USING (event_type)""",
    doc="Kendall tau-b rank correlation between hourly event COUNT and "
    "hourly total VALUE per series — the concordance complement of "
    "spearman_hourly (tau's pairwise form is robust to the midrank "
    "construction entirely). nc - nd is an exact integer sign sum over "
    "ordered hour pairs; the tie corrections n0 - t_u, n0 - t_v are "
    "exact integers from group counts; tau_b is one double expression "
    "(sqrt per factor, same discipline as spearman). NULL guard for "
    "constant series. Plan: the pair join is bounded by series "
    "length^2 (hours^2, the theil_sen/mann_kendall bound — independent "
    "of event volume); two tiny tie aggregates join on the type key.",
    survey_ids=("M7-A61",),
)
def kendall_tau_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir).localCheckpoint()
    a, b = hourly.alias("a"), hourly.alias("b")
    du = F.col("a.n_events") - F.col("b.n_events")
    dv = F.col("a.c") - F.col("b.c")
    sgn = (
        F.when(du * dv > 0, 1).when(du * dv < 0, -1).otherwise(0)
    )
    pairs = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(sgn.cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n0"),
        )
    )

    def tie_sum(col: str):
        return (
            hourly.groupBy("event_type", col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("event_type")
            .agg(
                F.sum(
                    (F.col("cnt") * (F.col("cnt") - 1) / 2).cast(
                        "decimal(38,0)"
                    )
                ).alias("tied")
            )
        )

    tu = tie_sum("n_events").withColumnRenamed("tied", "tu")
    tv = tie_sum("c").withColumnRenamed("tied", "tv")
    j = pairs.join(tu, "event_type").join(tv, "event_type")
    fu = F.col("n0") - F.col("tu")
    fv = F.col("n0") - F.col("tv")
    tau = F.col("s").cast("double") / (
        F.sqrt(fu.cast("double")) * F.sqrt(fv.cast("double"))
    )
    return j.select(
        "event_type",
        F.col("s").cast("bigint").alias("nc_minus_nd"),
        F.when((fu <= 0) | (fv <= 0), F.lit(None).cast("double"))
        .otherwise(N.rnd(tau, 6))
        .alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# pacf_profile (round 6)
# ---------------------------------------------------------------------------

@query(
    "pacf_profile",
    oracle=f"""
WITH {HOURLY_SQL},
idx AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type) AS s
  FROM hourly
), dev AS (
  SELECT event_type, rn, CAST(n AS HUGEINT) * c - s AS d FROM idx
), den AS (
  SELECT event_type, sum(d * d) AS den FROM dev GROUP BY event_type
), num AS (
  SELECT a.event_type, b.rn - a.rn AS k, sum(a.d * b.d) AS num
  FROM dev a JOIN dev b
    ON b.event_type = a.event_type AND b.rn - a.rn IN (1, 2, 3)
  GROUP BY 1, 2
), r AS (
  SELECT n.event_type,
         max(CASE WHEN k = 1 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
             END) AS r1,
         max(CASE WHEN k = 2 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
             END) AS r2,
         max(CASE WHEN k = 3 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
             END) AS r3
  FROM num n JOIN den d USING (event_type)
  WHERE d.den > 0
  GROUP BY 1
)
SELECT event_type,
       round(r1, 6) AS pacf1,
       CASE WHEN (1 - r1 * r1) = 0 THEN NULL
            ELSE round((r2 - r1 * r1) / (1 - r1 * r1), 6) END AS pacf2,
       CASE WHEN (1 - 2 * (r1 * r1) - r2 * r2 + 2 * ((r1 * r1) * r2)) = 0
              THEN NULL
            ELSE round((r3 - 2 * (r1 * r2) - (r1 * r1) * r3
                        + r1 * (r2 * r2) + (r1 * r1) * r1)
                       / (1 - 2 * (r1 * r1) - r2 * r2
                          + 2 * ((r1 * r1) * r2)), 6)
       END AS pacf3
FROM r
WHERE r1 IS NOT NULL AND r2 IS NOT NULL AND r3 IS NOT NULL""",
    doc="Partial autocorrelation of each hourly series at lags 1-3 via "
    "the closed-form Durbin-Levinson solutions (Cramer on the Toeplitz "
    "system): pacf1 = r1, pacf2 = (r2 - r1^2)/(1 - r1^2), pacf3 from "
    "the 3x3 determinant ratio — the AR-order diagnostic acf_lags "
    "cannot give (ACF of an AR(1) decays forever; PACF cuts off). "
    "Exactness: the r_k inputs are the same exact-integer ratios as "
    "acf_lags (n-scaled deviations, HUGEINT/DECIMAL(38,0) sums), and "
    "the rational polynomials are written as the IDENTICAL expression "
    "tree on both engines, so every intermediate double matches "
    "bit-for-bit. Degenerate denominators render NULL via the same "
    "guard both sides. Plan: one hourly exchange, one window pass, a "
    "3-lag self-join bounded by series length, one pivot row per type.",
    survey_ids=("M7-A62",),
)
def pacf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    w_all = Window.partitionBy("event_type")
    w_t = Window.partitionBy("event_type").orderBy("t")
    dev = hourly.select(
        "event_type",
        F.row_number().over(w_t).alias("rn"),
        (
            F.count(F.lit(1)).over(w_all).cast("decimal(38,0)") * F.col("c")
            - F.sum("c").over(w_all).cast("decimal(38,0)")
        ).alias("d"),
    ).localCheckpoint()
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).alias("den")
    )
    a, b = dev.alias("a"), dev.alias("b")
    num = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.rn") - F.col("a.rn")).isin(1, 2, 3),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            (F.col("b.rn") - F.col("a.rn")).alias("k"),
        )
        .agg(F.sum(F.col("a.d") * F.col("b.d")).alias("num"))
    )
    rk = lambda k: F.max(  # noqa: E731
        F.when(
            F.col("k") == k,
            F.col("num").cast("double") / F.col("den").cast("double"),
        )
    )
    r = (
        num.join(den, "event_type")
        .filter(F.col("den") > 0)
        .groupBy("event_type")
        .agg(rk(1).alias("r1"), rk(2).alias("r2"), rk(3).alias("r3"))
        .filter(
            F.col("r1").isNotNull()
            & F.col("r2").isNotNull()
            & F.col("r3").isNotNull()
        )
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    den2 = 1 - r1 * r1
    den3 = 1 - 2 * (r1 * r1) - r2 * r2 + 2 * ((r1 * r1) * r2)
    num3 = (
        r3 - 2 * (r1 * r2) - (r1 * r1) * r3 + r1 * (r2 * r2)
        + (r1 * r1) * r1
    )
    return r.select(
        "event_type",
        N.rnd(r1, 6).alias("pacf1"),
        F.when(den2 == 0, F.lit(None).cast("double"))
        .otherwise(N.rnd((r2 - r1 * r1) / den2, 6))
        .alias("pacf2"),
        F.when(den3 == 0, F.lit(None).cast("double"))
        .otherwise(N.rnd(num3 / den3, 6))
        .alias("pacf3"),
    )


# ---------------------------------------------------------------------------
# friedman_daily_types (round 6)
# ---------------------------------------------------------------------------

# chi2.ppf(0.95, df) for df = 1..10 — shared literal table (the BENFORD /
# LB_CHI2 pattern): the treatment count k is data-dependent, so the
# decision needs the critical value AT k-1, looked up from identical
# literals on both engines. df > 10 renders NULL (never hit on this data).
CHI2_95 = {
    1: 3.841458820694124,
    2: 5.991464547107979,
    3: 7.814727903251179,
    4: 9.487729036781154,
    5: 11.070497693516351,
    6: 12.591587243743977,
    7: 14.067140449340169,
    8: 15.50731305586545,
    9: 16.918977604620448,
    10: 18.307038053275146,
}
_CHI2_CASES_SQL = " ".join(
    f"WHEN {df} THEN {crit!r}" for df, crit in CHI2_95.items()
)


@query(
    "friedman_daily_types",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)
           AS day,
         CAST(sum({N.sql_cents("value")}) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), k AS (
  SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM daily
), complete AS (
  SELECT d.day FROM daily d, k
  GROUP BY d.day, k.k HAVING count(*) = max(k.k)
), ranked AS (
  SELECT d.event_type, d.day,
         2 * rank() OVER (PARTITION BY d.day ORDER BY d.c)
           + count(*) OVER (PARTITION BY d.day, d.c) - 1 AS u
  FROM daily d JOIN complete USING (day)
), rsums AS (
  SELECT event_type, CAST(sum(u) AS HUGEINT) AS dj,
         CAST(count(*) AS BIGINT) AS n
  FROM ranked GROUP BY event_type
), stat AS (
  SELECT CAST(sum(dj * dj) AS HUGEINT) AS s2,
         max(n) AS n, CAST(count(*) AS BIGINT) AS k
  FROM rsums
)
SELECT n AS n_blocks, k AS k_treatments,
       round(3.0 * CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * k * (k + 1))
             - 3.0 * n * (k + 1), 6) AS q_stat,
       CAST(k - 1 AS BIGINT) AS df,
       CASE WHEN k - 1 > 10 THEN NULL
            WHEN 3.0 * CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * k * (k + 1))
                 - 3.0 * n * (k + 1)
                 > (CASE k - 1 {_CHI2_CASES_SQL} END)
              THEN 'types_differ' ELSE 'no_evidence' END AS decision
FROM stat""",
    doc="Friedman rank test across event types with DAYS as blocks: do "
    "the k types carry systematically different daily value totals, "
    "judged nonparametrically within each day (robust to day-level "
    "volume swings that would wreck ANOVA's assumptions)? Only "
    "complete blocks (days observing all k types) enter, per the "
    "classic design. Midranks within each day are DOUBLED "
    "(2*rank + ties - 1, the spearman_hourly recipe) so every rank "
    "sum D_j and S = sum(D_j^2) is an exact integer; with R_j = D_j/2 "
    "the statistic Q = 12/(nk(k+1))*sum(R_j^2) - 3n(k+1) reduces to "
    "3S/(nk(k+1)) - 3n(k+1), one double expression over exact "
    "integers. Decision vs the chi2(k-1) 95% shared-literal table. "
    "Plan: one daily aggregate, one complete-block semi-join, one "
    "rank window per day, one k-row reduce.",
    survey_ids=("M7-A63",),
)
def friedman_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("unix_timestamp(date_trunc('day', ts)) div 86400").alias(
            "day"
        ),
    ).agg(F.sum(N.cents("value")).cast("bigint").alias("c"))
    k = daily.agg(
        F.countDistinct("event_type").cast("bigint").alias("k")
    )
    complete = (
        daily.crossJoin(F.broadcast(k))
        .groupBy("day", "k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") == F.col("k"))
        .select("day")
    )
    ranked = daily.join(F.broadcast(complete), "day").select(
        "event_type",
        (
            2 * F.rank().over(Window.partitionBy("day").orderBy("c"))
            + F.count(F.lit(1)).over(Window.partitionBy("day", "c"))
            - 1
        ).alias("u"),
    )
    rsums = ranked.groupBy("event_type").agg(
        F.sum(F.col("u").cast("decimal(38,0)")).alias("dj"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    stat = rsums.agg(
        F.sum(F.col("dj") * F.col("dj")).alias("s2"),
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    n, kk = F.col("n"), F.col("k")
    q = (
        F.lit(3.0) * F.col("s2").cast("double")
        / (n.cast("double") * kk * (kk + 1))
        - F.lit(3.0) * n * (kk + 1)
    )
    crit = F.lit(None).cast("double")
    for df_, c_ in sorted(CHI2_95.items(), reverse=True):
        crit = F.when(kk - 1 == df_, F.lit(c_)).otherwise(crit)
    return stat.select(
        n.alias("n_blocks"),
        kk.alias("k_treatments"),
        N.rnd(q, 6).alias("q_stat"),
        (kk - 1).cast("bigint").alias("df"),
        F.when(kk - 1 > 10, F.lit(None).cast("string"))
        .when(q > crit, F.lit("types_differ"))
        .otherwise(F.lit("no_evidence"))
        .alias("decision"),
    )


# ---------------------------------------------------------------------------
# overdispersion_test (round 6)
# ---------------------------------------------------------------------------

Z_95 = 1.6448536269514722  # norm.ppf(0.95), shared literal


@query(
    "overdispersion_test",
    oracle=f"""
WITH {HOURLY_SQL},
m AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(n_events) AS HUGEINT) AS s,
         CAST(sum(CAST(n_events AS HUGEINT) * n_events) AS HUGEINT) AS q
  FROM hourly GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_hours,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_per_hour,
       round(CAST(n * q - s * s AS DOUBLE)
             / (CAST(n - 1 AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS vmr,
       CASE WHEN CAST(n * q - s * s AS DOUBLE) / CAST(s AS DOUBLE)
                 > CAST(n - 1 AS DOUBLE)
                   * pow(1.0 - 2.0 / (9.0 * CAST(n - 1 AS DOUBLE))
                         + {Z_95!r} * sqrt(2.0 / (9.0 * CAST(n - 1 AS DOUBLE))), 3.0)
              THEN 'overdispersed' ELSE 'poisson_ok' END AS decision
FROM m WHERE n > 1 AND s > 0""",
    doc="Poisson overdispersion test of each hourly COUNT series: the "
    "dispersion statistic D = (n-1)*s^2/xbar = (n*sum(x^2) - S^2)/S is "
    "an EXACT integer ratio (one double division at render), and under "
    "H0 (counts are Poisson) D ~ chi2(n-1). The variance-to-mean ratio "
    "(VMR > 1 = clumping/burstiness, the monitoring readout) is the "
    "same integers over (n-1). Because df = n-1 is data-dependent and "
    "large, the 95% critical value uses the Wilson-Hilferty closed "
    "form df*(1 - 2/(9df) + z*sqrt(2/(9df)))^3 with the z literal "
    "shared — a DEFINED decision rule evaluated as the identical "
    "double expression on both engines (WH is the standard large-df "
    "approximation). Plan: one hourly aggregate, one k-row reduce per "
    "type; cost bounded by series length, never event volume.",
    survey_ids=("M7-A64",),
)
def overdispersion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = hourly.groupBy("event_type").agg(
        dec(F.count(F.lit(1))).alias("n"),
        F.sum(dec(F.col("n_events"))).alias("s"),
        F.sum(dec(F.col("n_events")) * F.col("n_events")).alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    disp_num = (n * q - s * s).cast("double")
    df_ = (n - 1).cast("double")
    wh = df_ * F.pow(
        F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * df_)
        + F.lit(Z_95) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * df_)),
        F.lit(3.0),
    )
    return (
        m.filter((n > 1) & (s > 0))
        .select(
            "event_type",
            n.cast("bigint").alias("n_hours"),
            N.rnd(s.cast("double") / n.cast("double"), 6).alias(
                "mean_per_hour"
            ),
            N.rnd(disp_num / (df_ * s.cast("double")), 6).alias("vmr"),
            F.when(
                disp_num / s.cast("double") > wh, F.lit("overdispersed")
            )
            .otherwise(F.lit("poisson_ok"))
            .alias("decision"),
        )
    )


# ---------------------------------------------------------------------------
# mutual_information_profile (round 6)
# ---------------------------------------------------------------------------

@query(
    "mutual_information_profile",
    oracle=f"""
WITH cells AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), margins AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS nr FROM cells GROUP BY 1
), mcols AS (
  SELECT h, CAST(sum(n) AS BIGINT) AS nc FROM cells GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells
), terms AS (
  SELECT c.n,
         {N.sql_cents(
             "ln(CAST(c.n AS DOUBLE) * t.nt"
             " / (CAST(m.nr AS DOUBLE) * mc.nc))", 10**9)} AS l9
  FROM cells c JOIN margins m USING (event_type)
  JOIN mcols mc USING (h) CROSS JOIN tot t
), hx AS (
  SELECT {N.sql_cents(
      "-ln(CAST(nr AS DOUBLE) / t.nt) * (CAST(nr AS DOUBLE) / t.nt)",
      10**9)} AS e9
  FROM margins CROSS JOIN tot t
)
SELECT t.nt AS n_events,
       round(CAST(sum(CAST(terms.n AS HUGEINT) * terms.l9) AS DOUBLE)
             / CAST(t.nt AS DOUBLE) / 1e9, 6) AS mi_nats,
       round((SELECT CAST(sum(e9) AS DOUBLE) / 1e9 FROM hx), 6)
         AS h_type_nats,
       -- a single type makes H(type) exactly 0: decide U on the exact
       -- integer type count BEFORE the division (ANSI Spark throws)
       CASE WHEN (SELECT count(*) FROM margins) < 2 THEN 0.0e0 ELSE
         round(CAST(sum(CAST(terms.n AS HUGEINT) * terms.l9) AS DOUBLE)
               / CAST(t.nt AS DOUBLE)
               / (SELECT CAST(sum(e9) AS DOUBLE) / 1e9 FROM hx) / 1e9, 6)
         END AS uncertainty_coefficient
FROM terms CROSS JOIN tot t
GROUP BY t.nt""",
    doc="Mutual information between event type and hour-of-day, with the "
    "type entropy and Theil's uncertainty coefficient U = I/H(type) — "
    "the EFFECT-SIZE companion to chi_square_independence (chi-square "
    "answers 'is there any dependence?', which at 10^12 rows is almost "
    "always yes; MI answers 'how much' on a [0, H] scale and U "
    "normalizes it to [0, 1]). Every pointwise log term ln(n*N/"
    "(nr*nc)) is snapped to the 1e-9 grid and weighted by the exact "
    "integer cell count in HUGEINT/DECIMAL(38,0) (snap-then-sum), so "
    "the nats values replay bit-identically. Plan: one (type, hour) "
    "cell aggregate (24 x |types| rows), two margin aggregates, "
    "broadcast joins — all post-aggregate frames are grid-bounded.",
    survey_ids=("M7-A65",),
)
def mutual_information_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cells = e.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cells = cells.localCheckpoint()
    margins = cells.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("nr")
    )
    mcols = cells.groupBy("h").agg(F.sum("n").cast("bigint").alias("nc"))
    tot = cells.agg(F.sum("n").cast("bigint").alias("nt"))
    terms = (
        cells.join(F.broadcast(margins), "event_type")
        .join(F.broadcast(mcols), "h")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "nt",
            N.cents(
                F.log(
                    F.col("n").cast("double")
                    * F.col("nt")
                    / (F.col("nr").cast("double") * F.col("nc"))
                ),
                10**9,
            ).alias("l9"),
        )
    )
    hx = (
        margins.crossJoin(F.broadcast(tot))
        .select(
            N.cents(
                -F.log(F.col("nr").cast("double") / F.col("nt"))
                * (F.col("nr").cast("double") / F.col("nt")),
                10**9,
            ).alias("e9")
        )
        .agg(
            F.sum(dec(F.col("e9"))).alias("h9"),
            F.count(F.lit(1)).cast("bigint").alias("ktypes"),
        )
    )
    mi = terms.groupBy("nt").agg(
        F.sum(dec(F.col("n")) * F.col("l9")).alias("s9")
    )
    mi_nats = F.col("s9").cast("double") / F.col("nt").cast("double") / 1e9
    h_nats = F.col("h9").cast("double") / 1e9
    return mi.crossJoin(F.broadcast(hx)).select(
        F.col("nt").alias("n_events"),
        N.rnd(mi_nats, 6).alias("mi_nats"),
        N.rnd(h_nats, 6).alias("h_type_nats"),
        F.when(F.col("ktypes") >= 2, N.rnd(mi_nats / h_nats, 6))
        .otherwise(F.lit(0.0))
        .alias("uncertainty_coefficient"),
    )


# ---------------------------------------------------------------------------
# zipf_slope_fit (round 6)
# ---------------------------------------------------------------------------

ZIPF_TOP_N = 1000


@query(
    "zipf_slope_fit",
    oracle=f"""
WITH freq AS (
  SELECT w, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '')) AS w FROM documents)
  GROUP BY w
), ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r
  FROM freq
  QUALIFY r <= {ZIPF_TOP_N}
), pts AS (
  SELECT {N.sql_cents("ln(CAST(r AS DOUBLE))", 10**9)} AS x9,
         {N.sql_cents("ln(CAST(f AS DOUBLE))", 10**9)} AS y9
  FROM ranked
), s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(x9 AS HUGEINT)) AS sx, sum(CAST(y9 AS HUGEINT)) AS sy,
         sum(CAST(x9 AS HUGEINT) * x9) AS sxx,
         sum(CAST(x9 AS HUGEINT) * y9) AS sxy,
         sum(CAST(y9 AS HUGEINT) * y9) AS syy
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_ranks,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
       round((CAST(sy AS DOUBLE)
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) * sx)
             / CAST(n AS DOUBLE) / 1e9, 6) AS intercept_ln,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             * CAST(n * sxy - sx * sy AS DOUBLE)
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r_squared
FROM s""",
    doc="Zipf power-law fit of the corpus rank-frequency curve: OLS of "
    f"ln(freq) on ln(rank) over the top-{ZIPF_TOP_N} words — natural "
    "language sits near slope -1 / R^2 ~ 0.98+, template or generated "
    "text bends the curve (the corpus-level fingerprint of the "
    "heaviness hill_tail_index measures per tail). Ranks are fully "
    "tie-broken (freq DESC, word); both log coordinates snap to the "
    "1e-9 grid so the five OLS moments are exact HUGEINT/"
    "DECIMAL(38,0) sums and slope/intercept/R^2 are fixed double "
    "expressions. Plan: one word-frequency aggregate (digest-width "
    "shuffle), a WindowGroupLimit-capped top-1000 rank, one 1000-row "
    "reduce.",
    survey_ids=("M7-C22",),
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_bigdata_spark.operators.dedup import fan_out, words_col

    d = fan_out(load_table(spark, sf_dir, "documents").select("text"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    freq = (
        d.select(F.explode(words_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    ranked = (
        freq.orderBy(F.desc("f"), "w")
        .limit(ZIPF_TOP_N)
        .select(
            "f",
            F.row_number()
            .over(
                Window.partitionBy(F.lit(1)).orderBy(F.desc("f"), "w")
            )
            .alias("r"),
        )
    )
    pts = ranked.select(
        N.cents(F.log(F.col("r").cast("double")), 10**9).alias("x9"),
        N.cents(F.log(F.col("f").cast("double")), 10**9).alias("y9"),
    )
    s = pts.agg(
        dec(F.count(F.lit(1))).alias("n"),
        F.sum(dec(F.col("x9"))).alias("sx"),
        F.sum(dec(F.col("y9"))).alias("sy"),
        F.sum(dec(F.col("x9")) * F.col("x9")).alias("sxx"),
        F.sum(dec(F.col("x9")) * F.col("y9")).alias("sxy"),
        F.sum(dec(F.col("y9")) * F.col("y9")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    num = (n * sxy - sx * sy).cast("double")
    denx = (n * sxx - sx * sx).cast("double")
    deny = (n * syy - sy * sy).cast("double")
    slope = num / denx
    return s.select(
        n.cast("bigint").alias("n_ranks"),
        N.rnd(slope, 6).alias("zipf_slope"),
        N.rnd(
            (sy.cast("double") - slope * sx) / n.cast("double") / 1e9, 6
        ).alias("intercept_ln"),
        N.rnd(num * num / (denx * deny), 6).alias("r_squared"),
    )


# ---------------------------------------------------------------------------
# wasserstein_drift (round 8, third wave) — exact 1-D earth-mover distance
# per event type vs the pooled distribution (the transport-metric
# companion of drift_psi / ks_drift_by_type)
# ---------------------------------------------------------------------------

_W1_RENDER = "(CAST(s AS DOUBLE) / ((na * 1.0e0) * nb)) / 1.0e2"
_W1_MEANDIFF = "(sa / (na * 1.0e0) - sb / (nb * 1.0e0)) / 1.0e2"


@query(
    "wasserstein_drift",
    oracle=f"""
WITH c AS MATERIALIZED (
  SELECT event_type, {N.sql_cents('value')} AS c FROM events
), grid AS (
  SELECT c, CAST(count(*) AS BIGINT) AS gb FROM c GROUP BY c
), ta AS (
  SELECT event_type, c, CAST(count(*) AS BIGINT) AS ta
  FROM c GROUP BY 1, 2
), types AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS na,
         CAST(sum(c) AS BIGINT) AS sa
  FROM c GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS nb, CAST(sum(c) AS BIGINT) AS sb
  FROM c
), f AS (
  SELECT t.event_type, g.c, g.gb, coalesce(ta.ta, 0) AS ta
  FROM grid g CROSS JOIN (SELECT event_type FROM types) t
  LEFT JOIN ta ON ta.event_type = t.event_type AND ta.c = g.c
), cum AS (
  SELECT event_type, c,
         CAST(sum(ta) OVER w AS BIGINT) AS cuma,
         CAST(sum(gb) OVER w AS BIGINT) AS cumb,
         lead(c) OVER (PARTITION BY event_type ORDER BY c) AS nc
  FROM f
  WINDOW w AS (PARTITION BY event_type ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), seg AS (
  SELECT cum.event_type, ty.na, ty.sa,
         sum(CASE WHEN cum.nc IS NULL THEN CAST(0 AS HUGEINT)
                  ELSE CAST(abs(cum.cuma * tot.nb - cum.cumb * ty.na)
                            AS HUGEINT) * (cum.nc - cum.c) END) AS s,
         min(tot.nb) AS nb, min(tot.sb) AS sb
  FROM cum JOIN types ty USING (event_type) CROSS JOIN tot
  GROUP BY 1, 2, 3
)
SELECT event_type, na AS n_type, nb AS n_pooled,
       {N.sql_rnd(_W1_RENDER, 6)} AS w1_distance,
       {N.sql_rnd(_W1_MEANDIFF, 4)} AS mean_diff
FROM seg""",
    doc="Exact 1-D Wasserstein-1 (earth-mover) distance between each "
    "event type's value distribution and the pooled distribution — the "
    "transport metric that reads in VALUE UNITS ('this segment's "
    "values sit on average 1.37 higher'), where PSI reads in bits and "
    "KS in probability; the three drift lenses disagree exactly when "
    "monitoring needs all of them. W1 = integral |F_a - F_b| computed "
    "segment-exactly on the cents grid: per grid value, "
    "|cumA*nB - cumB*nA| * gap is an exact integer (HUGEINT/"
    "DECIMAL(38,0) sums), and ONE double division renders the "
    "distance, so it replays bit-identically. Plan: one cents "
    "aggregate for the pooled grid (value-cardinality-bounded, NOT "
    "row-bounded), a types x grid frame (|types| * |grid| rows by "
    "construction), per-type ordered cumsum windows. At 100 TB the "
    "frame stays bounded by the value grid regardless of row volume.",
    survey_ids=("M7-A68",),
)
def wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_type", N.cents("value").alias("c"))
    grid = c.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("gb"))
    ta = c.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("ta")
    )
    types = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("na"),
        F.sum("c").cast("bigint").alias("sa"),
    )
    tot = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("c").cast("bigint").alias("sb"),
    )
    f = (
        grid.crossJoin(F.broadcast(types.select("event_type")))
        .join(ta, ["event_type", "c"], "left")
        .select(
            "event_type",
            "c",
            "gb",
            F.coalesce("ta", F.lit(0)).alias("ta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = f.select(
        "event_type",
        "c",
        F.sum("ta").over(w).cast("bigint").alias("cuma"),
        F.sum("gb").over(w).cast("bigint").alias("cumb"),
        F.lead("c").over(Window.partitionBy("event_type").orderBy("c")).alias(
            "nc"
        ),
    )
    seg = (
        cum.join(F.broadcast(types), "event_type")
        .crossJoin(F.broadcast(tot))
        .groupBy("event_type", "na", "sa")
        .agg(
            F.sum(
                F.when(F.col("nc").isNull(), F.lit(0).cast("decimal(38,0)"))
                .otherwise(
                    F.abs(
                        F.col("cuma") * F.col("nb")
                        - F.col("cumb") * F.col("na")
                    ).cast("decimal(38,0)")
                    * (F.col("nc") - F.col("c"))
                )
            ).alias("s"),
            F.min("nb").alias("nb"),
            F.min("sb").alias("sb"),
        )
    )
    return seg.select(
        "event_type",
        F.col("na").alias("n_type"),
        F.col("nb").alias("n_pooled"),
        F.expr(N.sql_rnd(_W1_RENDER, 6)).alias("w1_distance"),
        F.expr(N.sql_rnd(_W1_MEANDIFF, 4)).alias("mean_diff"),
    )


# ---------------------------------------------------------------------------
# mann_whitney_u (round 8, third wave) — the rank-sum two-sample test per
# event type vs rest (the nonparametric companion of welch_ttest)
# ---------------------------------------------------------------------------

_MWU_U = "(u2 / 2.0e0)"
# Degenerate strata decided on EXACT INTEGER predicates before the
# float ratios (ANSI Spark throws DIVIDE_BY_ZERO where DuckDB renders
# NaN/inf): an empty comparison side (na/nbr), n<2, or an all-tied
# grid (nd<2 distinct values makes the tie-corrected variance 0).
_MWU_Z = (
    "(CASE WHEN na < 1 OR nbr < 1 OR n < 2 OR nd < 2 THEN 0.0e0"
    " ELSE (u2 / 2.0e0 - (na * 1.0e0) * nbr / 2.0e0)"
    " / sqrt(((na * 1.0e0) * nbr / 1.2e1)"
    " * ((n + 1) - (tcorr * 1.0e0) / ((n * 1.0e0) * (n - 1)))) END)"
)
_MWU_RB = (
    "(CASE WHEN na < 1 OR nbr < 1 THEN 0.0e0"
    " ELSE 1.0e0 - (u2 * 1.0e0) / ((na * 1.0e0) * nbr) END)"
)


@query(
    "mann_whitney_u",
    oracle=f"""
WITH c AS MATERIALIZED (
  SELECT event_type, {N.sql_cents('value')} AS c FROM events
), g AS (
  SELECT c, CAST(count(*) AS BIGINT) AS t FROM c GROUP BY c
), gc AS (
  SELECT c, t,
         CAST(sum(t) OVER (ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t
              AS BIGINT) AS cumlt
  FROM g
), ta AS (
  SELECT event_type, c, CAST(count(*) AS BIGINT) AS ta
  FROM c GROUP BY 1, 2
), scal AS (
  SELECT CAST(sum(t) AS BIGINT) AS n,
         CAST(sum(t * t * t - t) AS BIGINT) AS tcorr,
         CAST(count(*) AS BIGINT) AS nd
  FROM g
), per AS (
  SELECT ta.event_type,
         CAST(sum(ta.ta) AS BIGINT) AS na,
         CAST(sum(ta.ta * (2 * gc.cumlt + gc.t + 1)) AS BIGINT) AS r2
  FROM ta JOIN gc USING (c) GROUP BY 1
), s AS (
  SELECT p.event_type, p.na, (scal.n - p.na) AS nbr, scal.n, scal.tcorr,
         scal.nd, (p.r2 - p.na * (p.na + 1)) AS u2
  FROM per p CROSS JOIN scal
)
SELECT event_type, na AS n_type, nbr AS n_rest,
       {N.sql_rnd(_MWU_U, 1)} AS u_statistic,
       {N.sql_rnd(_MWU_Z, 4)} AS z_score,
       {N.sql_rnd(_MWU_RB, 6)} AS rank_biserial
FROM s""",
    doc="Mann-Whitney U rank-sum test per event type against the pooled "
    "rest (Mann & Whitney 1947), tie-corrected: the nonparametric "
    "location test welch_ttest's normality assumption falls back to. "
    "Midranks live on the DOUBLED integer grid (2*rank is always an "
    "integer under midrank ties), so U = sum of member midranks - "
    "nA(nA+1)/2 is exact-integer arithmetic end to end; the normal "
    "z (with the standard tie variance correction sum(t^3-t)) and the "
    "rank-biserial effect size render from shared double strings. "
    "p-values are deliberately omitted: neither engine ships a "
    "portable erf. Plan: one cents aggregate (value-cardinality-"
    "bounded), one ordered cumsum window over the grid, one "
    "(type, cents) aggregate joined back grid-side — row volume never "
    "enters a window; ties are resolved by counting, never sorting "
    "the volume.",
    survey_ids=("M7-A69",),
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_type", N.cents("value").alias("c"))
    g = c.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    wcum = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gc = g.select(
        "c",
        "t",
        (F.sum("t").over(wcum) - F.col("t")).cast("bigint").alias("cumlt"),
    )
    ta = c.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("ta")
    )
    scal = g.agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tcorr"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    per = (
        ta.join(gc, "c")
        .groupBy("event_type")
        .agg(
            F.sum("ta").cast("bigint").alias("na"),
            F.sum(
                F.col("ta") * (2 * F.col("cumlt") + F.col("t") + 1)
            )
            .cast("bigint")
            .alias("r2"),
        )
    )
    s = per.crossJoin(F.broadcast(scal)).select(
        "event_type",
        "na",
        (F.col("n") - F.col("na")).alias("nbr"),
        "n",
        "tcorr",
        "nd",
        (F.col("r2") - F.col("na") * (F.col("na") + 1)).alias("u2"),
    )
    return s.select(
        "event_type",
        F.col("na").alias("n_type"),
        F.col("nbr").alias("n_rest"),
        F.expr(N.sql_rnd(_MWU_U, 1)).alias("u_statistic"),
        F.expr(N.sql_rnd(_MWU_Z, 4)).alias("z_score"),
        F.expr(N.sql_rnd(_MWU_RB, 6)).alias("rank_biserial"),
    )


# ---------------------------------------------------------------------------
# lagged_crosscorr (round 8, fifth wave) — lead/lag cross-correlation
# between two hourly event-count series (does `click` activity lead
# `purchase` activity, and by how many hours?)
# ---------------------------------------------------------------------------

_XC_A = "click"
_XC_B = "purchase"
_XC_MAXLAG = 6

# Pearson r over the matched (x_t, y_{t+lag}) pairs from EXACT integer
# sufficient statistics (hourly counts are integers, so n, Sx, Sy, Sxy,
# Sxx, Syy are exact and order-free); one double render at the end.
# Dialect-neutral: shared verbatim by F.expr and the oracle.
# Zero-variance guard (round-8 ADVICE #4): a constant hourly series
# (e.g. all-zero purchase counts in a small window) makes either
# variance term exactly zero — emit 0.0e0 explicitly instead of an
# engine-dependent inf/NaN render. Integer predicates, so the guard
# itself is exact on both engines.
_XC_R = (
    "CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0"
    " THEN 0.0e0"
    " ELSE (1.0e0 * (n * sxy - sx * sy))"
    " / (sqrt(1.0e0 * (n * sxx - sx * sx))"
    " * sqrt(1.0e0 * (n * syy - sy * sy))) END"
)


@query(
    "lagged_crosscorr",
    oracle=f"""
WITH {HOURLY_SQL},
bounds AS (
  SELECT CAST(min(t) AS BIGINT) AS lo, CAST(max(t) AS BIGINT) AS hi
  FROM hourly WHERE event_type IN ('{_XC_A}', '{_XC_B}')
), grid AS (
  SELECT unnest(range(lo, hi + 1)) AS t FROM bounds
), xs AS (
  SELECT grid.t, CAST(coalesce(h.n_events, 0) AS BIGINT) AS x
  FROM grid LEFT JOIN (SELECT t, n_events FROM hourly
                       WHERE event_type = '{_XC_A}') h USING (t)
), ys AS (
  SELECT grid.t, CAST(coalesce(h.n_events, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN (SELECT t, n_events FROM hourly
                       WHERE event_type = '{_XC_B}') h USING (t)
), lags AS (
  SELECT CAST(unnest(range(-{_XC_MAXLAG}, {_XC_MAXLAG} + 1)) AS BIGINT) AS lag
), m AS (
  SELECT lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM lags, xs, ys WHERE ys.t = xs.t + lags.lag
  GROUP BY lag
)
SELECT lag, n AS n_hours, {N.sql_rnd(_XC_R, 6)} AS xcorr
FROM m""",
    doc=f"Lead/lag cross-correlation of the hourly '{_XC_A}' count series "
    f"against the hourly '{_XC_B}' series at every lag in "
    f"[-{_XC_MAXLAG}, +{_XC_MAXLAG}] (the classic does-X-lead-Y "
    "monitoring diagnostic; Box & Jenkins ch. 11 sample CCF). Both "
    "series are zero-filled onto the dense shared hour grid (a missing "
    "hour IS a zero count, exactly like pacf_profile), then each lag's "
    "Pearson r comes from exact integer sufficient statistics over the "
    "aligned pairs — one IEEE division per lag at render, so both "
    "engines produce the identical double. Plan: ONE hourly aggregate "
    "of the fact table; everything after is series-length-bounded "
    "(720 hours x 13 lags), with the lag dimension and the y-series "
    "broadcast — at 100 TB the events table is touched once and the "
    "CCF costs the same as today.",
    survey_ids=("M7-A70",),
)
def lagged_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (
        _hourly(spark, sf_dir)
        .filter(F.col("event_type").isin(_XC_A, _XC_B))
        .select("event_type", "t", "n_events")
    )
    bounds = h.agg(
        F.min("t").cast("bigint").alias("lo"),
        F.max("t").cast("bigint").alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("t")
    )
    xs = grid.join(
        h.filter(F.col("event_type") == _XC_A).select("t", "n_events"),
        "t",
        "left",
    ).select("t", F.coalesce("n_events", F.lit(0)).cast("bigint").alias("x"))
    ys = grid.join(
        h.filter(F.col("event_type") == _XC_B).select("t", "n_events"),
        "t",
        "left",
    ).select(
        F.col("t").alias("ty"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("y"),
    )
    lags = spark.range(-_XC_MAXLAG, _XC_MAXLAG + 1).select(
        F.col("id").cast("bigint").alias("lag")
    )
    m = (
        xs.crossJoin(F.broadcast(lags))
        .withColumn("tt", F.col("t") + F.col("lag"))
        .join(F.broadcast(ys), F.col("tt") == F.col("ty"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )
    )
    return m.select(
        "lag",
        F.col("n").alias("n_hours"),
        F.expr(N.sql_rnd(_XC_R, 6)).alias("xcorr"),
    )


# ---------------------------------------------------------------------------
# interarrival_fit (round 8, sixth wave) — exponential MLE on per-type
# inter-arrival gaps + one-sample Kolmogorov-Smirnov goodness-of-fit
# (is the arrival process Poisson? the companion question to
# overdispersion_test's count-side answer)
# ---------------------------------------------------------------------------

# F(g) under the fitted Exp(lambda = n/tot): engine-neutral over the
# exact integer columns g (gap micros), n (gap count), tot (gap sum).
_IA_F = "(1.0e0 - exp(-((g * n) / (1.0e0 * tot))))"
_IA_D = (
    f"greatest((i / (1.0e0 * n)) - {_IA_F},"
    f" {_IA_F} - ((i - 1) / (1.0e0 * n)))"
)


@query(
    "interarrival_fit",
    oracle=f"""
WITH gaps AS MATERIALIZED (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS g
  FROM events
), gg AS MATERIALIZED (
  SELECT event_type, g FROM gaps WHERE g IS NOT NULL
), st AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(g) AS BIGINT) AS tot
  FROM gg GROUP BY event_type
), rk AS (
  SELECT event_type, g,
         CAST(row_number() OVER (
           PARTITION BY event_type ORDER BY g) AS BIGINT) AS i
  FROM gg
), d AS (
  SELECT rk.event_type, max({_IA_D}) AS ks
  FROM rk JOIN st ON rk.event_type = st.event_type
  GROUP BY rk.event_type
)
SELECT st.event_type,
       st.n AS n_gaps,
       {N.sql_rnd("(tot / (1.0e0 * n)) / 1e6", 4)} AS mean_gap_s,
       {N.sql_rnd("n * 3.6e9 / (1.0e0 * tot)", 4)} AS lambda_per_hour,
       {N.sql_rnd("ks", 6)} AS ks_stat,
       CAST(CASE WHEN ks > 1.36 / sqrt(1.0e0 * n)
            THEN 1 ELSE 0 END AS BIGINT) AS reject_95
FROM st JOIN d ON st.event_type = d.event_type""",
    doc="Per event type: exponential MLE on the inter-arrival gaps "
    "(lambda = n/Σgap on the exact integer microsecond grid) and the "
    "one-sample Kolmogorov-Smirnov statistic against the fitted "
    "Exp(lambda) — D = max_i max(i/n − F(g_(i)), F(g_(i)) − (i−1)/n), "
    "with the 95% Smirnov threshold 1.36/√n as an integer decision "
    "flag. If arrivals were Poisson the gaps are exponential; this is "
    "the gap-side lens that pairs with overdispersion_test's "
    "count-side VMR. All inputs to every double kernel are exact "
    "integers (gap micros, n, Σ) so both engines compute identical "
    "doubles; ties in the sorted gaps contribute a contiguous "
    "row-number range whose max/min terms are order-independent. "
    "Plan: one window per type for the lag, one per-type sort for the "
    "ranks — both bounded by facts-per-type, no cross-type shuffle; "
    "at 100 TB each type's series sorts inside its own partition "
    "range, never globally.",
    survey_ids=("M7-A72",),
)
def interarrival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wlag = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gg = (
        e.select(
            "event_type", (us - F.lag(us).over(wlag)).alias("g")
        )
        .filter(F.col("g").isNotNull())
    )
    st = gg.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("tot"),
    )
    rk = gg.select(
        "event_type",
        "g",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("g"))
        .cast("bigint")
        .alias("i"),
    )
    d = (
        rk.join(F.broadcast(st), "event_type")
        .groupBy("event_type")
        .agg(F.max(F.expr(_IA_D)).alias("ks"))
    )
    return st.join(F.broadcast(d), "event_type").select(
        "event_type",
        F.col("n").alias("n_gaps"),
        F.expr(N.sql_rnd("(tot / (1.0e0 * n)) / 1e6", 4)).alias(
            "mean_gap_s"
        ),
        F.expr(N.sql_rnd("n * 3.6e9 / (1.0e0 * tot)", 4)).alias(
            "lambda_per_hour"
        ),
        F.expr(N.sql_rnd("ks", 6)).alias("ks_stat"),
        F.expr(
            "CAST(CASE WHEN ks > 1.36 / sqrt(1.0e0 * n)"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# wilson_proportion_ci (round 8, seventh wave) — Wilson score interval
# vs the Wald interval for a per-type event proportion (Brown, Cai &
# DasGupta 2001: Wald is broken near the boundary; Wilson is the
# monitoring-grade default)
# ---------------------------------------------------------------------------

_WP_Z = 1.959963984540054  # norm.ppf(0.975), shared literal
_WP_CENTS = 5000           # success = value >= 50.00 on the cents grid

# Wilson bounds from exact integers k (successes), n (trials):
# (p + z²/2n ± z·sqrt(p(1−p)/n + z²/4n²)) / (1 + z²/n)
_WP_PHAT = "(k / (1.0e0 * n))"
_WP_HALF = (
    f"({_WP_Z!r} * sqrt({_WP_PHAT} * (1.0e0 - {_WP_PHAT}) / n"
    f" + {_WP_Z!r} * {_WP_Z!r} / (4.0e0 * n * n)))"
)
_WP_DEN = f"(1.0e0 + {_WP_Z!r} * {_WP_Z!r} / n)"
_WP_MID = f"({_WP_PHAT} + {_WP_Z!r} * {_WP_Z!r} / (2.0e0 * n))"
_WP_LO = f"(({_WP_MID} - {_WP_HALF}) / {_WP_DEN})"
_WP_HI = f"(({_WP_MID} + {_WP_HALF}) / {_WP_DEN})"
_WP_WALD = f"({_WP_Z!r} * sqrt({_WP_PHAT} * (1.0e0 - {_WP_PHAT}) / n))"


@query(
    "wilson_proportion_ci",
    oracle=f"""
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN {N.sql_cents("value")} >= {_WP_CENTS}
                  THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM events GROUP BY event_type
)
SELECT event_type, n AS n_events, k AS n_success,
       {N.sql_rnd(_WP_PHAT, 6)} AS p_hat,
       {N.sql_rnd(_WP_LO, 6)} AS wilson_lo,
       {N.sql_rnd(_WP_HI, 6)} AS wilson_hi,
       {N.sql_rnd(f"greatest({_WP_PHAT} - {_WP_WALD}, 0.0e0)", 6)}
         AS wald_lo,
       {N.sql_rnd(f"least({_WP_PHAT} + {_WP_WALD}, 1.0e0)", 6)}
         AS wald_hi
FROM m""",
    doc="95% confidence intervals for the per-type share of high-value "
    "events (value ≥ 50.00 as the exact integer cents comparison): the "
    "Wilson score interval next to the clamped Wald interval it should "
    "replace (Brown-Cai-DasGupta 2001 — Wald's coverage collapses near "
    "0/1 and small n; Wilson's center shrinks toward 1/2). Inputs are "
    "exact integer (k, n) per type and the z literal is shared, so "
    "both engines render identical doubles through the identical "
    "algebra strings. Plan: ONE map-side-combining aggregate of the "
    "fact table to types-cardinality rows; every interval is "
    "per-group scalar math — the 100 TB cost is the single scan.",
    survey_ids=("M7-A73",),
)
def wilson_proportion_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            (N.cents("value") >= _WP_CENTS).cast("int")
        ).cast("bigint").alias("k"),
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.col("k").alias("n_success"),
        F.expr(N.sql_rnd(_WP_PHAT, 6)).alias("p_hat"),
        F.expr(N.sql_rnd(_WP_LO, 6)).alias("wilson_lo"),
        F.expr(N.sql_rnd(_WP_HI, 6)).alias("wilson_hi"),
        F.expr(
            N.sql_rnd(f"greatest({_WP_PHAT} - {_WP_WALD}, 0.0e0)", 6)
        ).alias("wald_lo"),
        F.expr(
            N.sql_rnd(f"least({_WP_PHAT} + {_WP_WALD}, 1.0e0)", 6)
        ).alias("wald_hi"),
    )


# ---------------------------------------------------------------------------
# hod_uniformity_test (round 8, seventh wave) — chi-square uniformity
# test of each type's hour-of-day profile (is traffic diurnal or flat?
# the seasonality-detection gate in front of seasonal models)
# ---------------------------------------------------------------------------

_HOD_CRIT_95 = 35.17246162690805  # chi2.ppf(0.95, df=23), shared literal

# chi2 = sum_h (o_h - n/24)^2 / (n/24) = (24 * sum o^2 - n^2) / n — an
# EXACT integer ratio rendered with one division.
_HOD_CHI2 = "((24.0e0 * q - 1.0e0 * n * n) / n)"


@query(
    "hod_uniformity_test",
    oracle=f"""
WITH hod AS (
  SELECT event_type,
         CAST(extract(hour FROM ts) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type,
         CAST(sum(o) AS BIGINT) AS n,
         CAST(sum(o * o) AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS n_hours_seen,
         CAST(max(o) AS BIGINT) AS peak,
         CAST(min(o) AS BIGINT) AS trough
  FROM hod GROUP BY event_type
)
SELECT event_type, n AS n_events, n_hours_seen, peak, trough,
       {N.sql_rnd(_HOD_CHI2, 6)} AS chi2,
       CAST(CASE WHEN {_HOD_CHI2} > {_HOD_CRIT_95!r}
            THEN 1 ELSE 0 END AS BIGINT) AS nonuniform_95
FROM m WHERE n_hours_seen = 24""",
    doc="Chi-square uniformity test of each event type's hour-of-day "
    "histogram against the flat 24-bin null: chi² = Σ(o_h − n/24)²/"
    "(n/24), algebraically collapsed to the EXACT integer ratio "
    "(24·Σo² − n²)/n so no per-bin float ever exists, compared to the "
    "df=23 95% critical value as a shared literal (the df is fixed by "
    "construction, so no approximation is needed — unlike "
    "overdispersion_test's data-dependent df). Reports peak/trough "
    "hour loads as the effect-size context. This is the gate you run "
    "before fitting seasonal models: flat profiles don't need them. "
    "Plan: facts collapse to types×24 cells in ONE group pass; the "
    "test is a types-cardinality reduce — scan-bound at any scale.",
    survey_ids=("M7-A74",),
)
def hod_uniformity_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hod = e.groupBy(
        "event_type",
        F.hour("ts").cast("bigint").alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    m = hod.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("n"),
        F.sum(F.col("o") * F.col("o")).cast("bigint").alias("q"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours_seen"),
        F.max("o").cast("bigint").alias("peak"),
        F.min("o").cast("bigint").alias("trough"),
    )
    return m.filter(F.col("n_hours_seen") == 24).select(
        "event_type",
        F.col("n").alias("n_events"),
        "n_hours_seen",
        "peak",
        "trough",
        F.expr(N.sql_rnd(_HOD_CHI2, 6)).alias("chi2"),
        F.expr(
            f"CAST(CASE WHEN {_HOD_CHI2} > {_HOD_CRIT_95!r}"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("nonuniform_95"),
    )


# ---------------------------------------------------------------------------
# kruskal_wallis_value (round 9) — k-group rank test: the one-way
# nonparametric ANOVA next to mann_whitney_u's two-group test
# ---------------------------------------------------------------------------

# Per-group term n_j (mean_rank_j - grand_mean_rank)^2 from the exact
# doubled-midrank sum r2 (grand mean rank = (N+1)/2); snapped to the
# cents grid so the k-term cross-group sum is order-free.
_KW_TERM = (
    "(na * (((1.0e0 * r2) / (2 * na)) - ((n + 1) / 2.0e0))"
    " * (((1.0e0 * r2) / (2 * na)) - ((n + 1) / 2.0e0)))"
)
# H = 12/(N(N+1)) * sum_j n_j (Rbar_j - Rbar)^2, from the snapped sum.
_KW_H = (
    "((12.0e0 * (s2 / 1.0e2)) / ((1.0e0 * n) * (n + 1))"
    " - 0.0e0)"
)
# Tie-corrected H = H / (1 - sum(t^3-t)/(N^3-N)); degenerate (all
# values tied => correction 0) emits 0.0e0 explicitly on both engines.
_KW_HC = (
    "(CASE WHEN ((1.0e0 * n) * n * n - n) <= (1.0e0 * tcorr)"
    f" THEN 0.0e0 ELSE {_KW_H}"
    " / (1.0e0 - tcorr / ((1.0e0 * n) * n * n - n)) END)"
)


@query(
    "kruskal_wallis_value",
    oracle=f"""
WITH c AS MATERIALIZED (
  SELECT event_type, {N.sql_cents('value')} AS c FROM events
), g AS (
  SELECT c, CAST(count(*) AS BIGINT) AS t FROM c GROUP BY c
), gc AS (
  SELECT c, t,
         CAST(sum(t) OVER (ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t
              AS BIGINT) AS cumlt
  FROM g
), ta AS (
  SELECT event_type, c, CAST(count(*) AS BIGINT) AS ta
  FROM c GROUP BY 1, 2
), scal AS (
  SELECT CAST(sum(t) AS BIGINT) AS n,
         CAST(sum(t * t * t - t) AS BIGINT) AS tcorr,
         CAST(count(*) AS BIGINT) AS nd
  FROM g
), per AS (
  SELECT ta.event_type,
         CAST(sum(ta.ta) AS BIGINT) AS na,
         CAST(sum(ta.ta * (2 * gc.cumlt + gc.t + 1)) AS BIGINT) AS r2
  FROM ta JOIN gc USING (c) GROUP BY 1
), terms AS (
  SELECT p.event_type, p.na, p.r2, scal.n, scal.tcorr,
         {N.sql_cents(_KW_TERM, 100)} AS t2
  FROM per p CROSS JOIN scal
), hs AS (
  SELECT CAST(sum(t2) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS k
  FROM terms
)
SELECT t.event_type,
       t.na AS n_type,
       {N.sql_rnd("(1.0e0 * t.r2) / (2 * t.na)", 4)} AS mean_rank,
       CAST(hs.k - 1 AS BIGINT) AS df,
       {N.sql_rnd(_KW_H, 4)} AS h_statistic,
       {N.sql_rnd(_KW_HC, 4)} AS h_corrected
FROM terms t CROSS JOIN hs""",
    doc="Kruskal-Wallis one-way rank test across ALL event types "
    "(Kruskal & Wallis 1952) — the k-group generalization of "
    "mann_whitney_u, sharing its exact machinery verbatim: midranks "
    "on the DOUBLED integer grid (2*rank is an integer under ties), "
    "per-group rank sums r2 as exact BIGINTs from one value-grid "
    "cumsum, H computed via the between-group form 12/(N(N+1)) * "
    "SUM n_j(meanrank_j - (N+1)/2)^2 with each group term snapped to "
    "the cents grid before the k-term sum (order-free; the naive "
    "SUM R_j^2/n_j form would square 2e10-scale BIGINTs past 2^63 — "
    "the deviation form keeps every double in IEEE-exact range). "
    "Tie-corrected H divides by 1 - SUM(t^3-t)/(N^3-N), with the "
    "all-tied degenerate case emitting 0.0e0 explicitly on both "
    "engines. p-values omitted: no portable chi-square CDF (the "
    "mann_whitney_u discipline). Plan: one cents aggregate (value-"
    "cardinality-bounded), one grid cumsum window, one (type, cents) "
    "aggregate — row volume never enters a window or a sort; the "
    "k-row term frame is scalar algebra.",
    survey_ids=("M7-A75",),
)
def kruskal_wallis_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_type", N.cents("value").alias("c"))
    g = c.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    wcum = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gc = g.select(
        "c",
        "t",
        (F.sum("t").over(wcum) - F.col("t")).cast("bigint").alias("cumlt"),
    )
    ta = c.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("ta")
    )
    scal = g.agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tcorr"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    per = (
        ta.join(gc, "c")
        .groupBy("event_type")
        .agg(
            F.sum("ta").cast("bigint").alias("na"),
            F.sum(F.col("ta") * (2 * F.col("cumlt") + F.col("t") + 1))
            .cast("bigint")
            .alias("r2"),
        )
    )
    terms = per.crossJoin(F.broadcast(scal)).select(
        "event_type",
        "na",
        "r2",
        "n",
        "tcorr",
        F.expr(N.sql_cents(_KW_TERM, 100)).alias("t2"),
    )
    hs = terms.agg(
        F.sum("t2").cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return terms.crossJoin(F.broadcast(hs)).select(
        "event_type",
        F.col("na").alias("n_type"),
        F.expr(N.sql_rnd("(1.0e0 * r2) / (2 * na)", 4)).alias("mean_rank"),
        (F.col("k") - 1).cast("bigint").alias("df"),
        F.expr(N.sql_rnd(_KW_H, 4)).alias("h_statistic"),
        F.expr(N.sql_rnd(_KW_HC, 4)).alias("h_corrected"),
    )


# ---------------------------------------------------------------------------
# brown_forsythe_variance (round 9) — variance-homogeneity test across
# event types: the gate in front of ANOVA/Welch pooling decisions
# ---------------------------------------------------------------------------

# One-way ANOVA F over the absolute deviations z (half-cent grid):
# SSB = sum_j S_j^2/n_j - (sum S)^2/N, SSW = sum Q - sum_j S_j^2/n_j,
# with the per-group S_j^2/n_j terms snapped to the cents grid before
# the k-term sum (the kruskal_wallis discipline). Grid scale cancels
# in the F ratio.
# Degenerate dfs (k<2 or n<=k) decided on exact integer predicates
# BEFORE the float ratio — ANSI Spark would otherwise throw
# DIVIDE_BY_ZERO where DuckDB renders inf/NaN.
_BF_F = (
    "(CASE WHEN k < 2 OR n <= k THEN 0.0e0"
    " WHEN (sq - s2c / 1.0e2) <= 0.0e0 THEN 0.0e0"
    " ELSE ((s2c / 1.0e2 - ((1.0e0 * st) * st) / n) / (k - 1))"
    " / ((sq - s2c / 1.0e2) / (n - k)) END)"
)


@query(
    "brown_forsythe_variance",
    oracle=f"""
WITH c AS MATERIALIZED (
  SELECT event_type, {N.sql_cents('value')} AS c FROM events
), med AS (
  SELECT event_type, CAST(2 * median(c) AS BIGINT) AS med2
  FROM c GROUP BY 1
), z AS (
  SELECT c.event_type, abs(2 * c.c - med.med2) AS z2
  FROM c JOIN med USING (event_type)
), per AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS nj,
         CAST(sum(z2) AS BIGINT) AS sj,
         CAST(sum(z2 * z2) AS BIGINT) AS qj
  FROM z GROUP BY 1
), terms AS (
  SELECT event_type, nj, sj, qj,
         {N.sql_cents("((1.0e0 * sj) * sj) / nj", 100)} AS t2
  FROM per
), x AS (
  SELECT CAST(sum(nj) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(sj) AS BIGINT) AS st,
         CAST(sum(qj) AS BIGINT) AS sq,
         CAST(sum(t2) AS BIGINT) AS s2c
  FROM terms
)
SELECT t.event_type, t.nj AS n_type,
       {N.sql_rnd("t.sj / (2.0e2 * t.nj)", 4)} AS mean_abs_dev,
       CAST(x.k - 1 AS BIGINT) AS df1,
       CAST(x.n - x.k AS BIGINT) AS df2,
       {N.sql_rnd(_BF_F, 4)} AS f_statistic
FROM terms t CROSS JOIN x""",
    doc="Brown-Forsythe variance-homogeneity test across event types "
    "(Brown & Forsythe 1974 — Levene's test with the MEDIAN center, "
    "the robust variant): one-way ANOVA F over per-row absolute "
    "deviations from the group median. Deviations live on the exact "
    "HALF-CENT integer grid (2·median of integer cents is always an "
    "integer — the interpolated even-n median is a half; both "
    "engines' percentile interpolation is exact integer averaging, "
    "so med2 is bit-identical), so every sufficient statistic (n_j, "
    "Σz, Σz²) is an exact BIGINT; the k per-group S²/n terms snap to "
    "the cents grid before the cross-group sum (kruskal_wallis "
    "discipline) and the grid scale cancels in the F ratio. "
    "Degenerate all-identical case emits 0.0e0 explicitly. This is "
    "the assumption gate in front of anova_oneway: heteroscedastic "
    "groups reroute to welch_ttest. Plan: one cents pass, one "
    "per-type median (types-bounded), one join back + one "
    "sufficient-stats aggregate — no window over row volume.",
    survey_ids=("M7-A77",),
)
def brown_forsythe_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_type", N.cents("value").alias("c"))
    med = c.groupBy("event_type").agg(
        (F.expr("percentile(c, 0.5)") * 2).cast("bigint").alias("med2")
    )
    z = c.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(2 * F.col("c") - F.col("med2")).alias("z2"),
    )
    per = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("z2").cast("bigint").alias("sj"),
        F.sum(F.col("z2") * F.col("z2")).cast("bigint").alias("qj"),
    )
    terms = per.select(
        "event_type",
        "nj",
        "sj",
        "qj",
        F.expr(N.sql_cents("((1.0e0 * sj) * sj) / nj", 100)).alias("t2"),
    )
    x = terms.agg(
        F.sum("nj").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("sj").cast("bigint").alias("st"),
        F.sum("qj").cast("bigint").alias("sq"),
        F.sum("t2").cast("bigint").alias("s2c"),
    )
    return terms.crossJoin(F.broadcast(x)).select(
        "event_type",
        F.col("nj").alias("n_type"),
        F.expr(N.sql_rnd("sj / (2.0e2 * nj)", 4)).alias("mean_abs_dev"),
        (F.col("k") - 1).cast("bigint").alias("df1"),
        (F.col("n") - F.col("k")).cast("bigint").alias("df2"),
        F.expr(N.sql_rnd(_BF_F, 4)).alias("f_statistic"),
    )


# ---------------------------------------------------------------------------
# wilcoxon_signed_rank (round 9) — PAIRED location test on the hourly
# click-vs-view count series: the within-pair companion to the
# unpaired mann_whitney_u
# ---------------------------------------------------------------------------

# z = (W+ - mu) / sigma with mu = n(n+1)/4 and the tie-corrected
# sigma^2 = n(n+1)(2n+1)/24 - sum(t^3 - t)/48; W+ carried in DOUBLED
# midrank units (w2 = 2*W+), so mu doubles and sigma scales by 2.
_WSR_Z = (
    "(CASE WHEN n < 2 OR ((1.0e0 * n) * (n + 1) * (2 * n + 1) / 24.0e0"
    " - tcorr / 48.0e0) <= 0.0e0 THEN 0.0e0"
    " ELSE (w2 / 2.0e0 - (1.0e0 * n) * (n + 1) / 4.0e0)"
    " / sqrt((1.0e0 * n) * (n + 1) * (2 * n + 1) / 24.0e0"
    "        - tcorr / 48.0e0) END)"
)


@query(
    "wilcoxon_signed_rank",
    oracle=f"""
WITH {HOURLY_SQL},
pairs AS (
  SELECT t,
         coalesce(sum(CASE WHEN event_type = 'click' THEN n_events END), 0)
         - coalesce(sum(CASE WHEN event_type = 'view' THEN n_events END), 0)
           AS d
  FROM hourly WHERE event_type IN ('click', 'view') GROUP BY t
), nz AS (
  SELECT t, d, abs(d) AS ad FROM pairs WHERE d <> 0
), g AS (
  SELECT ad, CAST(count(*) AS BIGINT) AS tt FROM nz GROUP BY ad
), gc AS (
  SELECT ad, tt,
         CAST(sum(tt) OVER (ORDER BY ad
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tt
              AS BIGINT) AS cumlt
  FROM g
), x AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN nz.d > 0
                  THEN 2 * gc.cumlt + gc.tt + 1 END) AS BIGINT) AS w2,
         CAST((SELECT sum(tt * tt * tt - tt) FROM g) AS BIGINT) AS tcorr
  FROM nz JOIN gc USING (ad)
)
SELECT n AS n_pairs,
       {N.sql_rnd("w2 / 2.0e0", 1)} AS w_plus,
       {N.sql_rnd("(1.0e0 * n) * (n + 1) / 4.0e0", 1)} AS w_expected,
       {N.sql_rnd(_WSR_Z, 4)} AS z_score
FROM x""",
    doc="Wilcoxon signed-rank test (Wilcoxon 1945) on the PAIRED hourly "
    "click-minus-view count differences — the within-pair location "
    "test mann_whitney_u cannot express (the pairing removes the "
    "shared hourly traffic level). Zero differences drop (the "
    "standard treatment); |d| midranks live on the DOUBLED integer "
    "grid via the same grid-cumsum trick as MW (2*rank is an integer "
    "under midrank ties), so W+ is exact integer arithmetic; the "
    "normal z uses the standard tie-corrected variance with the "
    "degenerate case emitting 0.0e0. p-values omitted (no portable "
    "erf — the family discipline). Plan: one hourly aggregate "
    "(frame bounded by hours, never events), one |d|-grid cumsum, "
    "one scalar reduce.",
    survey_ids=("M7-A78",),
)
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(
            (F.unix_micros(F.date_trunc("hour", "ts")) / 3600000000)
            .cast("bigint")
            .alias("t")
        )
        .agg(
            (
                F.coalesce(
                    F.sum(
                        F.when(F.col("event_type") == "click", 1)
                    ),
                    F.lit(0),
                )
                - F.coalesce(
                    F.sum(F.when(F.col("event_type") == "view", 1)),
                    F.lit(0),
                )
            ).alias("d")
        )
    )
    nz = hourly.filter(F.col("d") != 0).select(
        "d", F.abs("d").alias("ad")
    )
    g = nz.groupBy("ad").agg(
        F.count(F.lit(1)).cast("bigint").alias("tt")
    )
    wcum = Window.orderBy("ad").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gc = g.select(
        "ad",
        "tt",
        (F.sum("tt").over(wcum) - F.col("tt"))
        .cast("bigint")
        .alias("cumlt"),
    )
    tc = g.agg(
        F.sum(F.col("tt") * F.col("tt") * F.col("tt") - F.col("tt"))
        .cast("bigint")
        .alias("tcorr")
    )
    x = (
        nz.join(gc, "ad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(
                    F.col("d") > 0,
                    2 * F.col("cumlt") + F.col("tt") + 1,
                )
            )
            .cast("bigint")
            .alias("w2"),
        )
        .crossJoin(F.broadcast(tc))
    )
    return x.select(
        F.col("n").alias("n_pairs"),
        F.expr(N.sql_rnd("w2 / 2.0e0", 1)).alias("w_plus"),
        F.expr(N.sql_rnd("(1.0e0 * n) * (n + 1) / 4.0e0", 1)).alias(
            "w_expected"
        ),
        F.expr(N.sql_rnd(_WSR_Z, 4)).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# randomization_test_diff (round 9) — Monte-Carlo randomization test
# for the click-vs-purchase mean-value difference: EXACT p-values with
# no distributional assumption and no CDF special function
# ---------------------------------------------------------------------------

_RT_B = 60  # deterministic pseudo-randomizations (md5 bits 0..59 — the 60-bit prefix)
_RT_A, _RT_B_TYPE = "click", "purchase"


@query(
    "randomization_test_diff",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h,
         event_type, {N.sql_cents('value')} AS c
  FROM events WHERE event_type IN ('{_RT_A}', '{_RT_B_TYPE}')
), obs AS (
  SELECT CAST(sum(CASE WHEN event_type = '{_RT_A}' THEN 1 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN event_type = '{_RT_A}' THEN c END) AS BIGINT) AS sa,
         CAST(sum(CASE WHEN event_type = '{_RT_B_TYPE}' THEN 1 END) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN event_type = '{_RT_B_TYPE}' THEN c END) AS BIGINT) AS sb
  FROM base
), perm AS (
  SELECT b.b,
         CAST(sum(CASE WHEN (base.h // p2.v) % 2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(sum(CASE WHEN (base.h // p2.v) % 2 = 1 THEN base.c ELSE 0 END)
              AS BIGINT) AS s1,
         CAST(count(*) AS BIGINT) AS nt,
         CAST(sum(base.c) AS BIGINT) AS st
  FROM base
  CROSS JOIN (SELECT unnest(range(0, {_RT_B})) AS b) b
  JOIN (SELECT unnest(range(0, {_RT_B})) AS b,
               unnest(list_transform(range(0, {_RT_B}),
                      i -> CAST(2 ** i AS BIGINT))) AS v) p2
    ON p2.b = b.b
  GROUP BY b.b
), stats AS (
  SELECT b,
         abs((1.0e0 * s1) / n1 - (1.0e0 * (st - s1)) / (nt - n1)) AS stat
  FROM perm WHERE n1 > 0 AND n1 < nt
)
SELECT obs.na AS n_a, obs.nb AS n_b,
       {N.sql_rnd(
           "abs((1.0e0 * obs.sa) / obs.na - (1.0e0 * obs.sb) / obs.nb)"
           " / 1.0e2", 4)} AS mean_diff_obs,
       CAST((SELECT count(*) FROM stats
             WHERE stat >= abs((1.0e0 * obs.sa) / obs.na
                               - (1.0e0 * obs.sb) / obs.nb)) AS BIGINT)
         AS n_extreme,
       {N.sql_rnd(
           "(1.0e0 + (SELECT count(*) FROM stats"
           " WHERE stat >= abs((1.0e0 * obs.sa) / obs.na"
           " - (1.0e0 * obs.sb) / obs.nb)))"
           f" / (1.0e0 + {_RT_B})", 6)} AS p_value
FROM obs""",
    doc="Monte-Carlo randomization test for the click-vs-purchase mean "
    "value difference (Fisher 1935 / Edgington): the p-value the "
    "stats tier could not otherwise emit — welch/MW/KW all stop at "
    "the statistic because no portable erf/chi²-CDF exists, but the "
    "randomization p needs NOTHING except re-computed means under "
    "label reshuffles. The 60 reshuffles are DETERMINISTIC: bit b of "
    "each row's 60-bit md5(event_id) prefix decides its side in "
    "permutation b — seed-free, engine-identical, and independent "
    "across b to md5 quality. Group sums are exact integer cents, "
    "permuted stats are IEEE divisions of exact integers, and the "
    "add-one p = (1+#extreme)/(1+B) is an exact rational. Plan: ONE "
    "fan-out aggregate (rows × 60 with map-side combine straight to "
    "60 sufficient rows — the bounded-fanout discipline, no shuffle "
    "of the volume beyond the 64-row reduce) + scalar algebra.",
    survey_ids=("M7-A79",),
)
def randomization_test_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(
        F.col("event_type").isin(_RT_A, _RT_B_TYPE)
    ).select(
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
        "event_type",
        N.cents("value").alias("c"),
    )
    obs = base.agg(
        F.sum(F.when(F.col("event_type") == _RT_A, 1))
        .cast("bigint")
        .alias("na"),
        F.sum(F.when(F.col("event_type") == _RT_A, F.col("c")))
        .cast("bigint")
        .alias("sa"),
        F.sum(F.when(F.col("event_type") == _RT_B_TYPE, 1))
        .cast("bigint")
        .alias("nb"),
        F.sum(F.when(F.col("event_type") == _RT_B_TYPE, F.col("c")))
        .cast("bigint")
        .alias("sb"),
    )
    fan = base.select(
        "h",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(_RT_B - 1))).alias("b"),
    )
    flag = F.expr(
        "(h & shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))) != 0"
    )
    perm = fan.groupBy("b").agg(
        F.sum(F.when(flag, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(flag, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
        F.sum("c").cast("bigint").alias("st"),
    )
    stats = perm.filter(
        (F.col("n1") > 0) & (F.col("n1") < F.col("nt"))
    ).select(
        F.abs(
            F.col("s1") * 1.0 / F.col("n1")
            - (F.col("st") - F.col("s1")) * 1.0 / (F.col("nt") - F.col("n1"))
        ).alias("stat")
    )
    obs_stat = F.abs(
        F.col("sa") * 1.0 / F.col("na") - F.col("sb") * 1.0 / F.col("nb")
    )
    ext = (
        stats.crossJoin(F.broadcast(obs))
        .filter(F.col("stat") >= obs_stat)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_extreme"))
    )
    return obs.crossJoin(F.broadcast(ext)).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        N.rnd(obs_stat / 100.0, 4).alias("mean_diff_obs"),
        "n_extreme",
        N.rnd(
            (1.0 + F.col("n_extreme")) / F.lit(1.0 + _RT_B), 6
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# nelson_aalen_hazard (round 9) — cumulative-hazard estimator over the
# same right-censored signup→purchase cohort as kaplan_meier
# ---------------------------------------------------------------------------


@query(
    "nelson_aalen_hazard",
    oracle=f"""
WITH signup AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), lastobs AS (
  SELECT user_id, max(ts) AS l_ts FROM events GROUP BY user_id
), purch AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN signup s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.s_ts
  GROUP BY e.user_id
), subj AS (
  SELECT s.user_id,
         (epoch_us(coalesce(p.p_ts, l.l_ts)) - epoch_us(s.s_ts))
           // 3600000000 AS dur,
         CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM signup s
  JOIN lastobs l ON s.user_id = l.user_id
  LEFT JOIN purch p ON s.user_id = p.user_id
), byd AS (
  SELECT dur, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(ev) AS BIGINT) AS e
  FROM subj GROUP BY dur
), risk AS (
  SELECT dur, cnt, e,
         sum(cnt) OVER () -
           coalesce(sum(cnt) OVER (ORDER BY dur
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS n_risk
  FROM byd
), terms AS (
  SELECT dur, cnt, e, n_risk,
         {N.sql_cents("(1.0e0 * e) / n_risk", 10**9)} AS h9,
         {N.sql_cents(
             "(1.0e0 * e) / ((1.0e0 * n_risk) * n_risk)", 10**9)} AS v9
  FROM risk WHERE e > 0
)
SELECT CAST(dur AS BIGINT) AS duration_hours,
       CAST(n_risk AS BIGINT) AS n_at_risk,
       e AS n_events,
       CAST(cnt - e AS BIGINT) AS n_censored_at,
       {N.sql_rnd(
           "sum(h9) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) / 1e9",
           6)} AS cum_hazard,
       {N.sql_rnd(
           "sum(v9) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) / 1e9",
           6)} AS cum_hazard_var
FROM terms""",
    doc="Nelson-Aalen cumulative-hazard estimator over the SAME "
    "right-censored signup→purchase cohort as kaplan_meier: "
    "H(t) = Σ_{{d_i≤t}} e_i/n_i with the Poisson variance "
    "Σ e_i/n_i² — the hazard-side view (KM estimates survival, NA "
    "estimates integrated risk; at small per-step hazards "
    "S ≈ exp(−H), and NA feeds the log-rank family). Strictly "
    "SIMPLER arithmetic than KM: each step term is one IEEE "
    "division of exact integers snapped to the 1e-9 grid, "
    "prefix-summed as exact integers — NO ln, NO exp, no libm "
    "anywhere. Plan: identical to kaplan_meier — three per-user "
    "aggregates + the duration-grid frame (bounded by observation "
    "hours, never users); prefix windows on that tiny frame.",
    survey_ids=("M7-B28",),
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    lastobs = e.groupBy("user_id").agg(F.max("ts").alias("l_ts"))
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    subj = (
        signup.join(lastobs, "user_id")
        .join(purch, "user_id", "left")
        .select(
            (
                (
                    F.unix_micros(F.coalesce("p_ts", "l_ts"))
                    - F.unix_micros("s_ts")
                )
                / 3600000000
            )
            .cast("bigint")
            .alias("dur"),
            F.when(F.col("p_ts").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    byd = subj.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("ev").cast("bigint").alias("e"),
    )
    wall = Window.partitionBy()
    wprev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = byd.select(
        "dur",
        "cnt",
        "e",
        (
            F.sum("cnt").over(wall)
            - F.coalesce(F.sum("cnt").over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    terms = risk.filter(F.col("e") > 0).select(
        "dur",
        "cnt",
        "e",
        "n_risk",
        F.expr(N.sql_cents("(1.0e0 * e) / n_risk", 10**9)).alias("h9"),
        F.expr(
            N.sql_cents(
                "(1.0e0 * e) / ((1.0e0 * n_risk) * n_risk)", 10**9
            )
        ).alias("v9"),
    )
    wcum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return terms.select(
        F.col("dur").cast("bigint").alias("duration_hours"),
        F.col("n_risk").cast("bigint").alias("n_at_risk"),
        F.col("e").alias("n_events"),
        (F.col("cnt") - F.col("e")).cast("bigint").alias("n_censored_at"),
        N.rnd(F.sum("h9").over(wcum) / 1e9, 6).alias("cum_hazard"),
        N.rnd(F.sum("v9").over(wcum) / 1e9, 6).alias("cum_hazard_var"),
    )


# ---------------------------------------------------------------------------
# log_rank_test (round 9) — two-group survival comparison over the
# kaplan_meier/nelson_aalen cohort: the hypothesis test of that family
# ---------------------------------------------------------------------------

# Per-event-time hypergeometric terms: E1 = d*n1/n, V = d*(n1/n)*
# (1-n1/n)*(n-d)/(n-1) — doubles of exact integers snapped to 1e-9
# before the cross-time sum (order-free).
_LR_E9 = N.sql_cents("(1.0e0 * d * n1) / n", 10**9)
_LR_V9 = N.sql_cents(
    "CASE WHEN n <= 1 THEN 0.0e0 ELSE"
    " (1.0e0 * d) * ((1.0e0 * n1) / n) * (1.0e0 - (1.0e0 * n1) / n)"
    " * ((1.0e0 * (n - d)) / (n - 1)) END",
    10**9,
)
_LR_CHI2 = (
    "(CASE WHEN v9 <= 0 THEN 0.0e0"
    " ELSE ((o1 - e9 / 1.0e9) * (o1 - e9 / 1.0e9)) / (v9 / 1.0e9) END)"
)


@query(
    "log_rank_test",
    oracle=f"""
WITH signup AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), lastobs AS (
  SELECT user_id, max(ts) AS l_ts FROM events GROUP BY user_id
), purch AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN signup s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.s_ts
  GROUP BY e.user_id
), subj AS (
  SELECT s.user_id, CAST(s.user_id % 2 AS BIGINT) AS grp,
         (epoch_us(coalesce(p.p_ts, l.l_ts)) - epoch_us(s.s_ts))
           // 3600000000 AS dur,
         CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM signup s
  JOIN lastobs l ON s.user_id = l.user_id
  LEFT JOIN purch p ON s.user_id = p.user_id
), byd AS (
  SELECT dur,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt1,
         CAST(sum(ev) AS BIGINT) AS d,
         CAST(sum(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1
  FROM subj GROUP BY dur
), risk AS (
  SELECT dur, d, d1,
         sum(cnt) OVER () -
           coalesce(sum(cnt) OVER (ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n,
         sum(cnt1) OVER () -
           coalesce(sum(cnt1) OVER (ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1
  FROM byd
), terms AS (
  SELECT d, d1, n, n1, {_LR_E9} AS e9t, {_LR_V9} AS v9t
  FROM risk WHERE d > 0
), x AS (
  SELECT CAST(sum(d1) AS BIGINT) AS o1,
         CAST(sum(e9t) AS BIGINT) AS e9,
         CAST(sum(v9t) AS BIGINT) AS v9
  FROM terms
)
SELECT o1 AS observed_g1,
       {N.sql_rnd("e9 / 1.0e9", 4)} AS expected_g1,
       {N.sql_rnd("v9 / 1.0e9", 4)} AS variance,
       {N.sql_rnd(_LR_CHI2, 4)} AS chi2
FROM x""",
    doc="Log-rank (Mantel-Cox) test comparing signup→purchase survival "
    "between the even- and odd-user_id cohorts over the SAME "
    "right-censored frame as kaplan_meier/nelson_aalen: at each "
    "event time the observed group-1 events are compared with the "
    "hypergeometric expectation d·n1/n, variance "
    "d·(n1/n)(1−n1/n)(n−d)/(n−1); χ² = (O−E)²/V with df=1. Each "
    "per-time E and V term is a double of exact integers snapped to "
    "the 1e-9 grid BEFORE the cross-time sum (order-free; the "
    "kaplan_meier recipe), O is a pure BIGINT; the degenerate "
    "zero-variance case emits 0.0e0. The χ² CDF is omitted (no "
    "portable special function), but the 1-df 95% critical value "
    "3.841 makes the statistic directly actionable. Plan: the KM "
    "cohort aggregates + per-group cumulative windows on the "
    "DURATION GRID (hours-bounded, never user-sized), one scalar "
    "reduce.",
    survey_ids=("M7-B29",),
)
def log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    lastobs = e.groupBy("user_id").agg(F.max("ts").alias("l_ts"))
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    subj = (
        signup.join(lastobs, "user_id")
        .join(purch, "user_id", "left")
        .select(
            (F.col("user_id") % 2).cast("bigint").alias("grp"),
            (
                (
                    F.unix_micros(F.coalesce("p_ts", "l_ts"))
                    - F.unix_micros("s_ts")
                )
                / 3600000000
            )
            .cast("bigint")
            .alias("dur"),
            F.when(F.col("p_ts").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    byd = subj.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("cnt1"),
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.when(F.col("grp") == 1, F.col("ev")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
    )
    wall = Window.partitionBy()
    wprev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = byd.select(
        "dur",
        "d",
        "d1",
        (
            F.sum("cnt").over(wall)
            - F.coalesce(F.sum("cnt").over(wprev), F.lit(0))
        ).alias("n"),
        (
            F.sum("cnt1").over(wall)
            - F.coalesce(F.sum("cnt1").over(wprev), F.lit(0))
        ).alias("n1"),
    )
    terms = risk.filter(F.col("d") > 0).select(
        "d",
        "d1",
        "n",
        "n1",
        F.expr(_LR_E9).alias("e9t"),
        F.expr(_LR_V9).alias("v9t"),
    )
    x = terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("e9t").cast("bigint").alias("e9"),
        F.sum("v9t").cast("bigint").alias("v9"),
    )
    return x.select(
        F.col("o1").alias("observed_g1"),
        F.expr(N.sql_rnd("e9 / 1.0e9", 4)).alias("expected_g1"),
        F.expr(N.sql_rnd("v9 / 1.0e9", 4)).alias("variance"),
        F.expr(N.sql_rnd(_LR_CHI2, 4)).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# cohens_d_effect (round 9) — standardized mean difference for the
# click-vs-purchase value comparison: the effect size next to
# welch_ttest's significance and randomization_test_diff's p-value
# ---------------------------------------------------------------------------

_CD_SP2 = (
    "(((na - 1) * (((1.0e0 * qa) * na - (1.0e0 * sa) * sa)"
    " / ((1.0e0 * na) * (na - 1)))"
    " + (nb - 1) * (((1.0e0 * qb) * nb - (1.0e0 * sb) * sb)"
    " / ((1.0e0 * nb) * (nb - 1)))) / (na + nb - 2))"
)
# Degenerate groups (na<2 or nb<2) make _CD_SP2 a 0/0: Spark renders
# NULL, DuckDB NaN, and BOTH compare false against <= 0.0e0, so the
# sp2 guard alone never fires. Decide on the exact integer group
# counts FIRST — the float expression is only evaluated when both
# sample variances are well-defined (na+nb-2 >= 1 follows).
_CD_D = (
    f"(CASE WHEN na < 2 OR nb < 2 THEN 0.0e0"
    f" WHEN {_CD_SP2} <= 0.0e0 THEN 0.0e0"
    f" ELSE ((1.0e0 * sa) / na - (1.0e0 * sb) / nb) / sqrt({_CD_SP2}) END)"
)
# Hedges' small-sample correction g = d * (1 - 3/(4(na+nb) - 9)).
_CD_G = f"({_CD_D} * (1.0e0 - 3.0e0 / (4.0e0 * (na + nb) - 9.0e0)))"


@query(
    "cohens_d_effect",
    oracle=f"""
WITH c AS (
  SELECT event_type, {N.sql_cents('value')} AS c FROM events
  WHERE event_type IN ('click', 'purchase')
), x AS (
  SELECT
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN event_type = 'click' THEN c END) AS BIGINT) AS sa,
    CAST(sum(CASE WHEN event_type = 'click' THEN c * c END) AS BIGINT) AS qa,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS nb,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN c END) AS BIGINT) AS sb,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN c * c END) AS BIGINT) AS qb
  FROM c
)
SELECT na AS n_click, nb AS n_purchase,
       {N.sql_rnd("((1.0e0 * sa) / na - (1.0e0 * sb) / nb) / 1.0e2", 4)}
         AS mean_diff,
       {N.sql_rnd(f"sqrt({_CD_SP2}) / 1.0e2", 4)} AS pooled_sd,
       {N.sql_rnd(_CD_D, 6)} AS cohens_d,
       {N.sql_rnd(_CD_G, 6)} AS hedges_g
FROM x""",
    doc="Cohen's d and Hedges' g for the click-vs-purchase value "
    "comparison — the standardized effect size completing the "
    "two-sample family (welch_ttest: is it significant; "
    "randomization_test_diff: assumption-free p; THIS: how big in "
    "pooled-SD units, the number meta-analyses and power "
    "calculations consume — power_analysis already takes a d as "
    "input, this entry produces one). All sufficient statistics are "
    "exact integer cents (n, Σc, Σc²); pooled variance, d, and the "
    "Hedges small-sample correction are one shared double string "
    "with hardware sqrt only; degenerate zero-variance emits 0.0e0. "
    "The cents grid cancels in d and g (scale-free), and mean_diff/"
    "pooled_sd render in value units. Plan: ONE conditional "
    "aggregate over the two types, one scalar row out.",
    survey_ids=("M7-A80",),
)
def cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", N.cents("value").alias("c")
    )
    isa = F.col("event_type") == "click"
    isb = F.col("event_type") == "purchase"
    x = c.agg(
        F.sum(F.when(isa, 1)).cast("bigint").alias("na"),
        F.sum(F.when(isa, F.col("c"))).cast("bigint").alias("sa"),
        F.sum(F.when(isa, F.col("c") * F.col("c")))
        .cast("bigint")
        .alias("qa"),
        F.sum(F.when(isb, 1)).cast("bigint").alias("nb"),
        F.sum(F.when(isb, F.col("c"))).cast("bigint").alias("sb"),
        F.sum(F.when(isb, F.col("c") * F.col("c")))
        .cast("bigint")
        .alias("qb"),
    )
    return x.select(
        F.col("na").alias("n_click"),
        F.col("nb").alias("n_purchase"),
        F.expr(
            N.sql_rnd(
                "((1.0e0 * sa) / na - (1.0e0 * sb) / nb) / 1.0e2", 4
            )
        ).alias("mean_diff"),
        F.expr(N.sql_rnd(f"sqrt({_CD_SP2}) / 1.0e2", 4)).alias(
            "pooled_sd"
        ),
        F.expr(N.sql_rnd(_CD_D, 6)).alias("cohens_d"),
        F.expr(N.sql_rnd(_CD_G, 6)).alias("hedges_g"),
    )


# ---------------------------------------------------------------------------
# benjamini_hochberg_pairs (round 9) — multiple-testing correction over
# ALL pairwise randomization tests: the FDR step-up with an EXACT
# integer decision rule (no float ever enters the reject decision)
# ---------------------------------------------------------------------------

_BH_B = 60      # md5-bit reshuffles per pair (randomization_test_diff)
_BH_ALPHA_NUM, _BH_ALPHA_DEN = 5, 100   # alpha = 0.05 exactly


@query(
    "benjamini_hochberg_pairs",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h,
         event_type AS t, {N.sql_cents('value')} AS c
  FROM events
), types AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
  FROM base GROUP BY t
), pairs AS (
  SELECT a.t AS ta, b.t AS tb, a.n AS na, a.s AS sa, b.n AS nb, b.s AS sb
  FROM types a JOIN types b ON a.t < b.t
), m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
fan AS (
  SELECT p.ta, p.tb, base.h, base.c FROM base JOIN pairs p ON base.t = p.ta
  UNION ALL
  SELECT p.ta, p.tb, base.h, base.c FROM base JOIN pairs p ON base.t = p.tb
), perm AS (
  SELECT fan.ta, fan.tb, bb.b,
         CAST(sum(CASE WHEN (fan.h // bb.v) % 2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(sum(CASE WHEN (fan.h // bb.v) % 2 = 1 THEN fan.c ELSE 0 END)
              AS BIGINT) AS s1,
         CAST(count(*) AS BIGINT) AS nt,
         CAST(sum(fan.c) AS BIGINT) AS st
  FROM fan
  JOIN (SELECT unnest(range(0, {_BH_B})) AS b,
               unnest(list_transform(range(0, {_BH_B}),
                      i -> CAST(2 ** i AS BIGINT))) AS v) bb ON true
  GROUP BY 1, 2, 3
), pvals AS (
  SELECT p.ta, p.tb,
         CAST(1 + coalesce(sum(CASE WHEN perm.n1 > 0 AND perm.n1 < perm.nt
              AND abs((1.0e0 * perm.s1) / perm.n1
                      - (1.0e0 * (perm.st - perm.s1)) / (perm.nt - perm.n1))
                  >= abs((1.0e0 * p.sa) / p.na - (1.0e0 * p.sb) / p.nb)
              THEN 1 END), 0) AS BIGINT) AS pnum
  FROM pairs p
  JOIN perm ON perm.ta = p.ta AND perm.tb = p.tb
  GROUP BY p.ta, p.tb, p.sa, p.na, p.sb, p.nb
), ranked AS (
  SELECT ta, tb, pnum, m.m,
         row_number() OVER (ORDER BY pnum, ta, tb) AS rk
  FROM pvals CROSS JOIN m
), cut AS (
  SELECT max(CASE WHEN {_BH_ALPHA_DEN} * m * pnum
                       <= {_BH_ALPHA_NUM} * ({_BH_B} + 1) * rk
             THEN rk ELSE 0 END) AS k
  FROM ranked
)
SELECT ta AS type_a, tb AS type_b,
       CAST(rk AS BIGINT) AS rank,
       {N.sql_rnd(f"(1.0e0 * pnum) / ({_BH_B} + 1)", 6)} AS p_value,
       {N.sql_rnd(
           "min((1.0e0 * m * pnum) / (rk * (" + str(_BH_B) + " + 1.0e0)))"
           " OVER (ORDER BY rk DESC ROWS BETWEEN UNBOUNDED PRECEDING"
           " AND CURRENT ROW)", 6)} AS q_value,
       CAST(CASE WHEN rk <= (SELECT k FROM cut) THEN 1 ELSE 0 END
            AS BIGINT) AS rejected
FROM ranked""",
    doc="Benjamini-Hochberg FDR step-up (1995) over ALL pairwise "
    "event-type mean-value randomization tests — the multiple-testing "
    "layer the inference tier needed once it could emit p-values at "
    "all (randomization_test_diff): m = C(types,2) pairwise tests, "
    "each p an exact rational (1+#extreme)/61 from 60 deterministic "
    "md5-bit reshuffles of that pair's rows; the step-up decision "
    "p_(i) ≤ iα/m cross-multiplies to the EXACT INTEGER comparison "
    "100·m·pnum ≤ 5·61·i — no float ever enters the reject/keep "
    "decision, so the rejection set is bit-identical on any engine "
    "at any scale. BH q-values (suffix-min of m·p/i) render as "
    "doubles for reporting. Degenerate reshuffles (a bit isolating "
    "one side) count as not-extreme on both engines. Plan: ONE "
    "fan-out aggregate (rows × pairs-per-type × 60 with map-side "
    "combine straight to m×60 sufficient rows) + m-row rank/suffix "
    "windows (pair-cardinality-bounded).",
    survey_ids=("M7-A81",),
)
def benjamini_hochberg_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
        F.col("event_type").alias("t"),
        N.cents("value").alias("c"),
    )
    types = base.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
    ).localCheckpoint(eager=True)
    a = types.select(
        F.col("t").alias("ta"), F.col("n").alias("na"), F.col("s").alias("sa")
    )
    b = types.select(
        F.col("t").alias("tb"), F.col("n").alias("nb"), F.col("s").alias("sb")
    )
    pairs = a.join(b, F.col("ta") < F.col("tb"))
    m = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    fan = base.join(
        F.broadcast(pairs.select("ta", "tb")), base["t"] == F.col("ta")
    ).select("ta", "tb", "h", "c").unionByName(
        base.join(
            F.broadcast(pairs.select("ta", "tb")), base["t"] == F.col("tb")
        ).select("ta", "tb", "h", "c")
    )
    fanb = fan.select(
        "ta",
        "tb",
        "h",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(_BH_B - 1))).alias("b"),
    )
    flag = F.expr(
        "(h & shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))) != 0"
    )
    perm = fanb.groupBy("ta", "tb", "b").agg(
        F.sum(F.when(flag, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(flag, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
        F.sum("c").cast("bigint").alias("st"),
    )
    obs_stat = F.abs(
        F.col("sa") * 1.0 / F.col("na") - F.col("sb") * 1.0 / F.col("nb")
    )
    perm_stat = F.abs(
        F.col("s1") * 1.0 / F.col("n1")
        - (F.col("st") - F.col("s1")) * 1.0 / (F.col("nt") - F.col("n1"))
    )
    pvals = (
        pairs.join(perm, ["ta", "tb"])
        .groupBy("ta", "tb")
        .agg(
            (
                1
                + F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("n1") > 0)
                            & (F.col("n1") < F.col("nt"))
                            & (perm_stat >= obs_stat),
                            1,
                        )
                    ),
                    F.lit(0),
                )
            )
            .cast("bigint")
            .alias("pnum")
        )
    )
    wrk = Window.orderBy("pnum", "ta", "tb")
    ranked = pvals.crossJoin(F.broadcast(m)).select(
        "ta", "tb", "pnum", "m", F.row_number().over(wrk).alias("rk")
    )
    wall = Window.partitionBy()
    cut = F.max(
        F.when(
            F.lit(_BH_ALPHA_DEN) * F.col("m") * F.col("pnum")
            <= F.lit(_BH_ALPHA_NUM) * F.lit(_BH_B + 1) * F.col("rk"),
            F.col("rk"),
        ).otherwise(0)
    ).over(wall)
    wsuf = Window.orderBy(F.col("rk").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ranked.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("rk").cast("bigint").alias("rank"),
        N.rnd(F.col("pnum") * 1.0 / (_BH_B + 1), 6).alias("p_value"),
        N.rnd(
            F.min(
                F.col("m") * F.col("pnum") * 1.0
                / (F.col("rk") * (_BH_B + 1.0))
            ).over(wsuf),
            6,
        ).alias("q_value"),
        F.when(F.col("rk") <= cut, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("rejected"),
    )


# ---------------------------------------------------------------------------
# ams_f2_audit (round 9) — Alon-Matias-Szegedy second-frequency-moment
# sketch audited against the exact F2: the classic ±1 sketch next to
# the catalog's HLL/CountMin/MinHash estimator audits
# ---------------------------------------------------------------------------

_AMS_K = 16  # independent ±1 estimators (md5 bits 0..15)


@query(
    "ams_f2_audit",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT user_id,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events
), exact AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(c * c) AS BIGINT) AS f2
  FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS c
        FROM base GROUP BY user_id)
), sk AS (
  SELECT bb.b,
         CAST(sum(CASE WHEN (base.h // bb.v) % 2 = 1
                  THEN 1 ELSE -1 END) AS BIGINT) AS x
  FROM base
  JOIN (SELECT unnest(range(0, {_AMS_K})) AS b,
               unnest(list_transform(range(0, {_AMS_K}),
                      i -> CAST(2 ** i AS BIGINT))) AS v) bb ON true
  GROUP BY bb.b
), est AS (
  SELECT CAST(sum(x * x) AS BIGINT) AS sum_x2,
         median(x * x) AS med_x2
  FROM sk
)
SELECT exact.n_rows, exact.n_users, exact.f2 AS f2_exact,
       {N.sql_rnd(f"(1.0e0 * est.sum_x2) / {_AMS_K}", 1)} AS f2_ams_mean,
       {N.sql_rnd("1.0e0 * est.med_x2", 1)} AS f2_ams_median,
       {N.sql_rnd(
           f"abs((1.0e0 * est.sum_x2) / {_AMS_K} - exact.f2)"
           " / exact.f2", 6)} AS rel_err_mean
FROM exact CROSS JOIN est""",
    doc="Alon-Matias-Szegedy F2 (second frequency moment / repeat "
    "rate) sketch audited against the exact Σc²: 16 independent ±1 "
    "estimators, sign of item u in estimator k = md5-bit k of "
    "h(user_id) — seed-free and engine-identical; each X_k = Σ±1 "
    "over ROWS is one exact BIGINT per estimator, E[X²] = F2 "
    "(Alon et al. 1996). Mean-of-squares and median-of-squares "
    "estimates are exact integer arithmetic (median of 16 ints is "
    "the average of the middle two — exactly representable), and "
    "the relative-error audit row makes the estimator's quality a "
    "driver-checked fact like the HLL/CountMin audits. Plan: ONE "
    "×16 fan-out aggregate with map-side combine straight to 16 "
    "(k, X) rows + the exact per-user aggregate — at 100 TB the "
    "sketch pass is one shuffle of 16 integers per partition.",
    survey_ids=("M7-A82",),
)
def ams_f2_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    exact = (
        base.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2"),
        )
    )
    fan = base.select(
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(_AMS_K - 1))).alias("b"),
    )
    sign = F.when(
        F.expr("(h & shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))) != 0"),
        1,
    ).otherwise(-1)
    sk = fan.groupBy("b").agg(F.sum(sign).cast("bigint").alias("x"))
    est = sk.agg(
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_x2"),
        F.expr("percentile(x * x, 0.5)").alias("med_x2"),
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_rows",
        "n_users",
        F.col("f2").alias("f2_exact"),
        F.expr(N.sql_rnd(f"(1.0e0 * sum_x2) / {_AMS_K}", 1)).alias(
            "f2_ams_mean"
        ),
        F.expr(N.sql_rnd("1.0e0 * med_x2", 1)).alias("f2_ams_median"),
        F.expr(
            N.sql_rnd(
                f"abs((1.0e0 * sum_x2) / {_AMS_K} - f2) / f2", 6
            )
        ).alias("rel_err_mean"),
    )


# ---------------------------------------------------------------------------
# block_jackknife_variance (round 9) — delete-one-block jackknife SE of
# the overall mean: the third resampling face next to poisson_bootstrap
# (with-replacement) and randomization_test_diff (label reshuffle)
# ---------------------------------------------------------------------------


@query(
    "block_jackknife_variance",
    oracle=f"""
WITH blocks AS (
  SELECT CAST(date_part('day', ts) AS BIGINT) AS blk,
         CAST(count(*) AS BIGINT) AS nb,
         CAST(sum({N.sql_cents('value')}) AS BIGINT) AS sb
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(sum(nb) AS BIGINT) AS n, CAST(sum(sb) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS d
  FROM blocks
), loo AS (
  SELECT b.blk, t.n, t.s, t.d,
         (1.0e0 * (t.s - b.sb)) / (t.n - b.nb) AS mu_del
  FROM blocks b CROSS JOIN tot t
), mbar AS (
  SELECT CAST(sum({N.sql_cents("mu_del", 10**9)}) AS BIGINT) AS m9,
         CAST(count(*) AS BIGINT) AS d
  FROM loo
), dev AS (
  SELECT loo.d,
         CAST(sum({N.sql_cents(
             "(mu_del - (1.0e0 * mbar.m9) / (1.0e9 * mbar.d))"
             " * (mu_del - (1.0e0 * mbar.m9) / (1.0e9 * mbar.d))",
             10**9)}) AS BIGINT) AS ss9
  FROM loo CROSS JOIN mbar GROUP BY loo.d
)
SELECT tot.n AS n_events, tot.d AS n_blocks,
       {N.sql_rnd("(1.0e0 * tot.s) / tot.n / 1.0e2", 4)} AS mean_value,
       {N.sql_rnd(
           "sqrt(((dev.d - 1.0e0) / dev.d) * (dev.ss9 / 1.0e9))"
           " / 1.0e2", 6)} AS jackknife_se
FROM tot CROSS JOIN dev""",
    doc="Delete-one-block jackknife standard error of the overall mean "
    "value, blocks = day-of-month (Quenouille/Tukey; the BLOCK "
    "variant is the one that exists at scale — delete-one-ROW would "
    "need n recomputes, delete-one-block needs only per-block "
    "sufficient statistics, and blocking by day also absorbs "
    "within-day autocorrelation a row-jackknife would miss). Each "
    "leave-block-out mean is one IEEE division of exact BIGINT "
    "sums; deviations snap to the 1e-9 grid before the D-term sum "
    "(order-free), SE = sqrt((D-1)/D · Σ(μ_(d) − μ̄)²). The "
    "resampling-family completion: poisson_bootstrap resamples WITH "
    "replacement, randomization_test_diff reshuffles labels, THIS "
    "deletes structured blocks. Plan: one day-keyed aggregate "
    "(≤31 rows), scalar algebra after — the corpus is touched once.",
    survey_ids=("M7-A83",),
)
def block_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    blocks = ev.groupBy(
        F.dayofmonth("ts").cast("bigint").alias("blk")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum(N.cents("value")).cast("bigint").alias("sb"),
    )
    tot = blocks.agg(
        F.sum("nb").cast("bigint").alias("n"),
        F.sum("sb").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("d"),
    )
    loo = blocks.crossJoin(F.broadcast(tot)).select(
        "blk",
        "n",
        "s",
        "d",
        (
            (F.col("s") - F.col("sb")) * 1.0 / (F.col("n") - F.col("nb"))
        ).alias("mu_del"),
    )
    mbar = loo.agg(
        F.sum(F.expr(N.sql_cents("mu_del", 10**9)))
        .cast("bigint")
        .alias("m9"),
        F.count(F.lit(1)).cast("bigint").alias("d"),
    )
    dev = (
        loo.crossJoin(F.broadcast(mbar.select(F.col("m9"), F.col("d").alias("dd"))))
        .select(
            "d",
            F.expr(
                N.sql_cents(
                    "(mu_del - (1.0e0 * m9) / (1.0e9 * dd))"
                    " * (mu_del - (1.0e0 * m9) / (1.0e9 * dd))",
                    10**9,
                )
            ).alias("t9"),
        )
        .groupBy("d")
        .agg(F.sum("t9").cast("bigint").alias("ss9"))
    )
    return tot.crossJoin(F.broadcast(dev.select(F.col("d").alias("dd"), "ss9"))).select(
        F.col("n").alias("n_events"),
        F.col("d").alias("n_blocks"),
        F.expr(N.sql_rnd("(1.0e0 * s) / n / 1.0e2", 4)).alias(
            "mean_value"
        ),
        F.expr(
            N.sql_rnd(
                "sqrt(((dd - 1.0e0) / dd) * (ss9 / 1.0e9)) / 1.0e2", 6
            )
        ).alias("jackknife_se"),
    )
