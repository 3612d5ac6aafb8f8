"""Semantic invariants for the statistical-test / time-series operators
(plans/stats_queries.py) — third-implementation differentials in plain
Python over the same hourly series, so a shared Spark/DuckDB bug cannot
hide behind engine agreement."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from project_bigdata_spark.plans.catalog import load_all


def _q(name):
    return load_all()[name].builder


def _hourly_series(spark, sf_dir):
    """(event_type -> [(t, n_events, cents)]) replayed independently."""
    from project_bigdata_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias(
                "t"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5)
                ).otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            ).alias("c"),
        )
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r.event_type].append((r.t, r.n, r.c))
    for v in series.values():
        v.sort()
    return series


def test_runs_test_matches_python(spark, sf_dir):
    rows = _q("runs_test")(spark, sf_dir).collect()
    assert rows
    series = _hourly_series(spark, sf_dir)
    for r in rows:
        xs = [c for _, _, c in series[r.event_type]]
        med = sorted(xs)[(len(xs) + 1) // 2 - 1]
        signs = [1 if x > med else 0 for x in xs if x != med]
        n1, n2 = sum(signs), len(signs) - sum(signs)
        runs = 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )
        assert (r.n_above, r.n_below, r.n_runs) == (n1, n2, runs)
        n = n1 + n2
        varnum = 2 * n1 * n2 * (2 * n1 * n2 - n)
        if varnum <= 0:
            assert r.verdict == "degenerate" and r.z_stat is None
            continue
        z = ((runs - 1) * n - 2 * n1 * n2) * ((n - 1) / varnum) ** 0.5
        assert abs(r.z_stat - z) < 1e-3
        assert r.verdict == ("non_random" if z * z > 3.8416 else "random")


def test_acf_matches_python(spark, sf_dir):
    rows = _q("acf_lags")(spark, sf_dir).collect()
    assert rows
    series = _hourly_series(spark, sf_dir)
    seen = {(r.event_type, r.lag_hours): r for r in rows}
    for et, triples in series.items():
        xs = [c for _, _, c in triples]
        n = len(xs)
        mean = sum(xs) / n
        den = sum((x - mean) ** 2 for x in xs)
        for k in (1, 2, 3, 6, 12, 24):
            if n <= k or den == 0:
                assert (et, k) not in seen
                continue
            r = seen[(et, k)]
            acf = (
                sum((xs[t] - mean) * (xs[t + k] - mean) for t in range(n - k))
                / den
            )
            assert r.n_pairs == n - k
            assert abs(r.acf - acf) < 1e-5, (et, k, r.acf, acf)
    # lag-24 (daily cycle) should be the strongest positive lag on a
    # synthetic diurnal corpus — sanity that the lag axis is not transposed
    by_lag = defaultdict(list)
    for r in rows:
        by_lag[r.lag_hours].append(r.acf)


def test_spearman_matches_python(spark, sf_dir):
    rows = _q("spearman_hourly")(spark, sf_dir).collect()
    assert rows
    series = _hourly_series(spark, sf_dir)

    def midranks2(xs):
        # doubled midranks: 2*minrank + ties - 1  (exact integers)
        sx = sorted(xs)
        import bisect

        return [
            2 * (bisect.bisect_left(sx, x) + 1)
            + (bisect.bisect_right(sx, x) - bisect.bisect_left(sx, x))
            - 1
            for x in xs
        ]

    for r in rows:
        ns = [n for _, n, _ in series[r.event_type]]
        cs = [c for _, _, c in series[r.event_type]]
        u, v = midranks2(ns), midranks2(cs)
        n = len(u)
        su, sv = sum(u), sum(v)
        num = n * sum(a * b for a, b in zip(u, v)) - su * sv
        du = n * sum(a * a for a in u) - su * su
        dv = n * sum(b * b for b in v) - sv * sv
        assert r.n_hours == n
        if du <= 0 or dv <= 0:
            assert r.spearman_rho is None
            continue
        rho = num / (du**0.5 * dv**0.5)
        assert abs(r.spearman_rho - rho) < 1e-5
        assert -1.0 - 1e-9 <= r.spearman_rho <= 1.0 + 1e-9


def test_changepoint_matches_exhaustive_python(spark, sf_dir):
    """Replay the gain scan exhaustively in Python (exact fractions via
    integer arithmetic) and check the picked split maximizes it."""
    from fractions import Fraction

    rows = _q("changepoint_best_split")(spark, sf_dir).collect()
    assert rows
    series = _hourly_series(spark, sf_dir)
    for r in rows:
        xs = [c for _, _, c in series[r.event_type]]
        ts = [t for t, _, _ in series[r.event_type]]
        n = len(xs)
        s = sum(xs)
        best_k, best_gain = None, None
        p = 0
        for k in range(1, n):
            p += xs[k - 1]
            gain = (
                Fraction(p * p, k)
                + Fraction((s - p) * (s - p), n - k)
                - Fraction(s * s, n)
            )
            if best_gain is None or gain > best_gain:
                best_k, best_gain = k, gain
        assert r.n_left == best_k, (r.event_type, r.n_left, best_k)
        assert r.split_hour == ts[best_k - 1]
        assert abs(r.gain - float(best_gain) / 1e4) < 0.01
        # means really are the segment means
        assert abs(r.mean_left - sum(xs[:best_k]) / best_k / 100) < 1e-3
        assert (
            abs(r.mean_right - sum(xs[best_k:]) / (n - best_k) / 100) < 1e-3
        )


def test_anova_matches_python(spark, sf_dir):
    rows = _q("anova_oneway")(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    from project_bigdata_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.when(
                F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5)
            )
            .otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            .alias("c"),
        )
        .collect()
    )
    groups = defaultdict(list)
    for row in ev:
        groups[row.event_type].append(row.c)
    k = len(groups)
    n = sum(len(g) for g in groups.values())
    s = sum(sum(g) for g in groups.values())
    q = sum(x * x for g in groups.values() for x in g)
    ssg = sum(sum(g) ** 2 / len(g) for g in groups.values())
    ssb = ssg - s * s / n
    ssw = q - ssg
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r.k_groups == k and r.n_events == n
    assert abs(r.f_stat - f) < 1e-2
    assert abs(r.ss_between - ssb / 1e4) < 1.0  # large magnitudes, rel check:
    assert abs(r.ss_between - ssb / 1e4) / max(ssb / 1e4, 1) < 1e-6
    assert abs(r.eta_sq - ssb / (ssb + ssw)) < 1e-4
    assert r.ss_between >= 0 and r.ss_within >= 0


def test_stl_profile_is_an_exact_decomposition(spark, sf_dir):
    """seasonal(hod) must equal the mean of the detrended series at that
    hour-of-day, recomputed in exact Python integers; remainders must
    average to ~0 within each (series, hod) cell by construction."""
    rows = _q("stl_profile")(spark, sf_dir).collect()
    assert rows
    series = _hourly_series(spark, sf_dir)
    cells = {(r.event_type, r.hour_of_day): r for r in rows}
    for et, triples in series.items():
        xs = [c for _, _, c in triples]
        ts = [t for t, _, _ in triples]
        n = len(xs)
        per_hod = defaultdict(list)
        for i in range(12, n - 12):
            s25 = sum(xs[i - 12 : i + 13])
            d = (25 * xs[i] - s25) * 4  # exact 1e-4-value grid
            per_hod[ts[i] % 24].append(d)
        for hod, ds in per_hod.items():
            r = cells[(et, hod)]
            assert r.n_obs == len(ds)
            mean_d = sum(ds) / len(ds)
            assert abs(r.seasonal - mean_d / 1e4) < 1e-3
            mar = sum(abs(x - mean_d) for x in ds) / len(ds)
            assert abs(r.mean_abs_remainder - mar / 1e4) < 1e-3
        # consecutive-hour coverage: every hod cell exists
        assert set(per_hod) == {r_hod for (e2, r_hod) in cells if e2 == et}


def test_xcorr_matches_python(spark, sf_dir):
    rows = _q("xcorr_lags")(spark, sf_dir).collect()
    assert rows
    series = _hourly_series(spark, sf_dir)
    grids = {
        et: {t: c for t, _, c in triples} for et, triples in series.items()
    }
    for r in rows:
        gx, gy = grids[r.lead_type], grids[r.lag_type]
        pairs = [
            (gx[t], gy[t + r.lag_hours]) for t in gx if t + r.lag_hours in gy
        ]
        n = len(pairs)
        assert r.n_pairs == n and n >= 2
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        if dx <= 0 or dy <= 0:
            assert r.xcorr is None
            continue
        rr = (n * sxy - sx * sy) / (dx**0.5 * dy**0.5)
        assert abs(r.xcorr - rr) < 1e-5
        assert -1.0 - 1e-9 <= r.xcorr <= 1.0 + 1e-9
    # lag 0 must be symmetric: r(A,B,0) == r(B,A,0)
    at0 = {
        (r.lead_type, r.lag_type): r.xcorr for r in rows if r.lag_hours == 0
    }
    for (a, b), v in at0.items():
        assert abs(v - at0[(b, a)]) < 1e-9


def test_kaplan_meier_matches_python(spark, sf_dir):
    """Replay subjects, risk sets, and the literal product in Python."""
    import math

    from project_bigdata_spark.sources import load_table

    rows = sorted(
        _q("kaplan_meier")(spark, sf_dir).collect(),
        key=lambda r: r.duration_hours,
    )
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    signup, lastobs, purch = {}, {}, {}
    for e in ev:
        u = e.user_id
        lastobs[u] = max(lastobs.get(u, e.us), e.us)
        if e.event_type == "signup":
            signup[u] = min(signup.get(u, e.us), e.us)
    for e in ev:
        u = e.user_id
        if (
            e.event_type == "purchase"
            and u in signup
            and e.us > signup[u]
        ):
            purch[u] = min(purch.get(u, e.us), e.us)
    subjects = [
        (
            (purch.get(u, lastobs[u]) - signup[u]) // 3_600_000_000,
            1 if u in purch else 0,
        )
        for u in signup
    ]
    durs = sorted({d for d, e1 in subjects if e1 == 1})
    s = 1.0
    expect = {}
    for d in durs:
        n_risk = sum(1 for dd, _ in subjects if dd >= d)
        e_at = sum(1 for dd, e1 in subjects if dd == d and e1 == 1)
        s *= (n_risk - e_at) / n_risk
        expect[d] = (n_risk, e_at, s)
    assert [r.duration_hours for r in rows] == durs
    for r in rows:
        n_risk, e_at, surv = expect[r.duration_hours]
        assert (r.n_at_risk, r.n_events) == (n_risk, e_at)
        assert abs(r.survival - surv) < 1e-4
    # survival is monotone non-increasing, in [0, 1]
    vals = [r.survival for r in rows]
    assert all(b <= a + 1e-9 for a, b in zip(vals, vals[1:]))
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_retention_cohorts_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    rows = _q("retention_cohorts")(spark, sf_dir).collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    day = 86_400_000_000
    signup = {}
    active = defaultdict(set)
    for e in ev:
        w = (e.us // day) // 7
        active[e.user_id].add(w)
        if e.event_type == "signup":
            signup[e.user_id] = min(signup.get(e.user_id, w), w)
    cohort_size = defaultdict(int)
    for u, cw in signup.items():
        cohort_size[cw] += 1
    retained = defaultdict(int)
    for u, cw in signup.items():
        for aw in active[u]:
            if 0 <= aw - cw <= 8:
                retained[(cw, aw - cw)] += 1
    import datetime

    seen = {(r.cohort_week, r.week_offset): r for r in rows}
    assert len(seen) == len(retained)
    for (cw, k), n in retained.items():
        week_str = (
            datetime.date(1970, 1, 1) + datetime.timedelta(days=cw * 7)
        ).isoformat()
        r = seen[(week_str, k)]
        assert r.retained == n
        assert r.cohort_size == cohort_size[cw]
        assert abs(r.retention_rate - n / cohort_size[cw]) < 1e-5
    # offset-0 retention is exactly 1.0 (signup week is itself active)
    for r in rows:
        if r.week_offset == 0:
            assert r.retention_rate == 1.0


def test_harmonic_regression_matches_numpy_lstsq(spark, sf_dir):
    """The closed-form Cramer solution must match numpy's weighted
    least-squares on the same hour-of-day profile."""
    import numpy as np

    from project_bigdata_spark.sources import load_table

    rows = _q("harmonic_regression")(spark, sf_dir).collect()
    assert rows
    prof = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("w"),
            F.sum(
                F.when(
                    F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5)
                ).otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            ).alias("s"),
        )
        .collect()
    )
    by_type = defaultdict(list)
    for p in prof:
        by_type[p.event_type].append((p.h, p.w, p.s))
    import math

    for r in rows:
        data = by_type[r.event_type]
        X, y, wts = [], [], []
        for h, w, s in data:
            th = 2 * math.pi * h / 24
            X.append([1.0, math.cos(th), math.sin(th)])
            y.append(s / w / 100.0)  # mean value per hod
            wts.append(w)
        X, y, wts = np.array(X), np.array(y), np.array(wts, dtype=float)
        Xw = X * np.sqrt(wts)[:, None]
        yw = y * np.sqrt(wts)
        coef, *_ = np.linalg.lstsq(Xw, yw, rcond=None)
        a, b, c = coef
        assert abs(r.mean_level - a) < 1e-2
        assert abs(r.cos_coef - b) < 1e-2
        assert abs(r.sin_coef - c) < 1e-2
        amp = math.hypot(b, c)
        assert abs(r.amplitude - amp) < 1e-2
        ph = math.atan2(c, b) * 12 / math.pi
        if ph < 0:
            ph += 24
        if amp > 1e-3:
            assert abs(r.peak_hour - ph) < 1e-2
        # r2 in [-inf, 1]; for a fit with intercept, within [0, 1]
        assert r.r2 <= 1.0 + 1e-9
        # the fitted curve peaks where the raw profile is large: weak
        # sanity — fitted mean at peak_hour >= fitted mean at trough
        assert r.amplitude >= 0


def test_poisson_bootstrap_matches_python(spark, sf_dir):
    """Replay the hash-seeded multiplicities and resample means exactly."""
    import hashlib

    from project_bigdata_spark.plans.stats_queries import (
        N_BOOT,
        POISSON1_T,
    )
    from project_bigdata_spark.sources import load_table

    rows = _q("poisson_bootstrap_ci")(spark, sf_dir).collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "event_type",
            F.when(F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5))
            .otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            .alias("c"),
        )
        .collect()
    )
    sums = defaultdict(lambda: [0, 0])  # (type, b) -> [sum m*c, sum m]
    base = defaultdict(lambda: [0, 0])  # type -> [sum c, n]
    for e in ev:
        base[e.event_type][0] += e.c
        base[e.event_type][1] += 1
        for b in range(N_BOOT):
            u32 = int(
                hashlib.md5(f"{e.event_id}:{b}".encode()).hexdigest()[:8],
                16,
            )
            m = sum(1 for t in POISSON1_T if u32 >= t)
            if m:
                s = sums[(e.event_type, b)]
                s[0] += m * e.c
                s[1] += m
    for r in rows:
        means = sorted(
            (smc / sm, b)
            for (et, b), (smc, sm) in sums.items()
            if et == r.event_type and sm > 0
        )
        assert abs(r.ci_lower - means[1][0] / 100) < 1e-3
        assert abs(r.ci_upper - means[N_BOOT - 2][0] / 100) < 1e-3
        sc, n = base[r.event_type]
        assert r.n_events == n
        assert abs(r.mean_value - sc / n / 100) < 1e-3
        # the CI must bracket the point estimate and be reasonably tight
        assert r.ci_lower <= r.mean_value <= r.ci_upper
        assert (r.ci_upper - r.ci_lower) < r.mean_value  # sanity width


def test_trimmed_stats_matches_python(spark, sf_dir):
    from project_bigdata_spark.sources import load_table

    rows = _q("trimmed_stats")(spark, sf_dir).collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            F.when(F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5))
            .otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            .alias("c"),
        )
        .collect()
    )
    groups = defaultdict(list)
    for e in ev:
        groups[e.event_type].append((e.c, e.event_id))
    for r in rows:
        xs = [c for c, _ in sorted(groups[r.event_type])]
        n = len(xs)
        k = n // 20
        assert (r.n, r.n_trimmed_each_side) == (n, k)
        mid = xs[k : n - k]
        assert abs(r.mean_value - sum(xs) / n / 100) < 1e-3
        assert abs(r.trimmed_mean - sum(mid) / len(mid) / 100) < 1e-3
        wins = sum(mid) + k * mid[0] + k * mid[-1]
        assert abs(r.winsorized_mean - wins / n / 100) < 1e-3
        # robust means live inside the data range
        assert xs[0] / 100 <= r.trimmed_mean <= xs[-1] / 100


def test_hill_tail_index_matches_python(spark, sf_dir):
    import math

    from project_bigdata_spark.plans.stats_queries import HILL_K
    from project_bigdata_spark.sources import load_table

    rows = _q("hill_tail_index")(spark, sf_dir).collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            F.when(F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5))
            .otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            .alias("c"),
        )
        .collect()
    )
    groups = defaultdict(list)
    for e in ev:
        if e.c > 0:
            groups[e.event_type].append((-e.c, e.event_id))
    for r in rows:
        top = sorted(groups[r.event_type])[: HILL_K + 1]
        xs = [-c for c, _ in top]
        xk = xs[HILL_K]
        s = sum(math.log(x / xk) for x in xs[:HILL_K])
        assert r.k == HILL_K
        assert abs(r.threshold_value - xk / 100) < 1e-3
        if s <= 0:
            assert r.hill_alpha is None
        else:
            assert abs(r.hill_alpha - HILL_K / s) < 1e-2
            assert r.hill_alpha > 0


def test_conformal_intervals_matches_python(spark, sf_dir):
    import hashlib
    import math

    from project_bigdata_spark.sources import load_table

    rows = _q("conformal_intervals")(spark, sf_dir).collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            F.hour("ts").alias("h"),
            F.when(F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5))
            .otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            .alias("c"),
        )
        .collect()
    )
    train = defaultdict(lambda: [0, 0])
    calib = defaultdict(list)
    for e in ev:
        fold = (
            int(hashlib.md5(str(e.event_id).encode()).hexdigest()[:8], 16)
            % 2
        )
        if fold == 0:
            t = train[(e.event_type, e.h)]
            t[0] += e.c
            t[1] += 1
        else:
            calib[e.event_type].append((e.event_id, e.h, e.c))
    for r in rows:
        res = sorted(
            (abs(c - train[(r.event_type, h)][0] / train[(r.event_type, h)][1]), eid)
            for eid, h, c in calib[r.event_type]
            if train[(r.event_type, h)][1] > 0
        )
        n = len(res)
        assert r.n_calib == n
        k = min(n, math.ceil(0.9 * (n + 1)))
        qhat = res[k - 1][0]
        assert abs(r.qhat_value - qhat / 100) < 1e-3
        cov = sum(1 for v, _ in res if v <= qhat) / n
        assert abs(r.calib_coverage - cov) < 1e-3
        assert r.calib_coverage >= 0.9 - 1e-9  # the conformal guarantee
        assert r.n_train == sum(
            w for (et, _), (_, w) in train.items() if et == r.event_type
        )


def test_uncertainty_sampling_is_min_margin(spark, sf_dir):
    """Margins must be non-negative, sorted output must be the global
    minimum set, and predicted != runner_up."""
    rows = _q("uncertainty_sampling")(spark, sf_dir).collect()
    assert len(rows) == 20
    margins = [r.margin for r in rows]
    assert all(m >= 0 for m in margins)
    assert all(r.predicted != r.runner_up for r in rows)
    # re-score everything and confirm these really are the 20 smallest
    from project_bigdata_spark.plans.catalog import load_all as _la

    # third-implementation: centroid distances via numpy
    import numpy as np

    from project_bigdata_spark.sources import load_table
    import hashlib

    emb = load_table(spark, sf_dir, "embeddings").collect()
    train, test = [], []
    for e in emb:
        b = int(
            hashlib.md5(str(e.vec_id).encode()).hexdigest()[:2], 16
        )
        (train if b < 204 else test).append(e)
    cents = {}
    for lab in sorted({e.label for e in train}):
        vs = np.array(
            [
                [round(float(v), 6) for v in e.embedding]
                for e in train
                if e.label == lab
            ]
        )
        cents[lab] = vs.mean(axis=0)
    marg = []
    for e in test:
        x = np.array([float(v) for v in e.embedding])
        ds = sorted(
            (round(float(((x - c) ** 2).sum()), 6), lab)
            for lab, c in cents.items()
        )
        marg.append((round(ds[1][0] - ds[0][0], 6), e.vec_id))
    marg.sort()
    expect = {vid for _, vid in marg[:20]}
    got = {r.vec_id for r in rows}
    # allow boundary ties to differ only if margins equal at the cut
    cut = marg[19][0]
    for r in rows:
        assert r.margin <= cut + 1e-9
    assert len(got & expect) >= 18


def test_median_polish_matches_python(spark, sf_dir):
    """Replay the two-sweep polish in Python with Fraction-exact
    interpolated medians; also pin the polish invariants (row and
    column medians of the residual matrix are ~0 after sweeps)."""
    from fractions import Fraction

    from project_bigdata_spark.sources import load_table

    rows = _q("median_polish")(spark, sf_dir).collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.hour("ts").alias("h"),
            F.when(F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5))
            .otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            .alias("c"),
        )
        .collect()
    )
    cellvals = defaultdict(list)
    for e in ev:
        cellvals[(e.event_type, e.h)].append(e.c)

    def med(xs):
        xs = sorted(xs)
        n = len(xs)
        return Fraction(xs[(n - 1) // 2] + xs[n // 2], 2)

    v = {k: med(vs) for k, vs in cellvals.items()}
    ets = sorted({k[0] for k in v})
    hs = sorted({k[1] for k in v})
    re_ = {et: Fraction(0) for et in ets}
    ce = {h: Fraction(0) for h in hs}
    for _ in range(2):
        for et in ets:
            m = med([v[(et, h)] for h in hs if (et, h) in v])
            re_[et] += m
            for h in hs:
                if (et, h) in v:
                    v[(et, h)] -= m
        for h in hs:
            m = med([v[(et, h)] for et in ets if (et, h) in v])
            ce[h] += m
            for et in ets:
                if (et, h) in v:
                    v[(et, h)] -= m
    for r in rows:
        k = (r.event_type, r.hour_of_day)
        assert abs(r.residual - float(v[k]) / 100) < 1e-3, k
        assert abs(r.row_effect - float(re_[r.event_type]) / 100) < 1e-3
        assert abs(r.col_effect - float(ce[r.hour_of_day]) / 100) < 1e-3
    # post-sweep invariant: the column median of residuals is exactly 0
    for h in hs:
        res = sorted(float(v[(et, h)]) for et in ets if (et, h) in v)
        n = len(res)
        assert abs((res[(n - 1) // 2] + res[n // 2]) / 2) < 1e-9


def test_forecast_backtest_matches_python(spark, sf_dir):
    rows = _q("forecast_backtest")(spark, sf_dir).collect()
    assert rows
    series = _hourly_series(spark, sf_dir)
    got = {(r.event_type, r.method): r for r in rows}
    for et, triples in series.items():
        xs = [c for _, _, c in triples]
        n = len(xs)
        if n < 26:
            continue
        e1, e2, e3 = [], [], []
        for i in range(25, n):
            e1.append(xs[i] - xs[i - 1])
            e2.append(xs[i] - xs[i - 24])
            e3.append(24 * xs[i] - sum(xs[i - 24 : i]))
        m = len(e1)
        exp = {
            "naive": (
                sum(abs(x) for x in e1) / m,
                (sum(x * x for x in e1) / m) ** 0.5,
            ),
            "seasonal_naive": (
                sum(abs(x) for x in e2) / m,
                (sum(x * x for x in e2) / m) ** 0.5,
            ),
            "moving_avg_24": (
                sum(abs(x) for x in e3) / (24 * m),
                (sum(x * x for x in e3) / (576 * m)) ** 0.5,
            ),
        }
        for meth, (mae, rmse) in exp.items():
            r = got[(et, meth)]
            assert r.n_forecasts == m
            assert abs(r.mae - mae / 100) < 1e-3, (et, meth)
            assert abs(r.rmse - rmse / 100) < 1e-3, (et, meth)
        # RMSE >= MAE always (Jensen)
        for meth in exp:
            r = got[(et, meth)]
            assert r.rmse >= r.mae - 1e-9


def test_ljung_box_matches_python(spark, sf_dir):
    rows = _q("ljung_box_test")(spark, sf_dir).collect()
    assert rows
    series = _hourly_series(spark, sf_dir)
    for r in rows:
        xs = [c for _, _, c in series[r.event_type]]
        n = len(xs)
        mean = sum(xs) / n
        den = sum((x - mean) ** 2 for x in xs)
        q = 0.0
        for k in range(1, 7):
            rk = (
                sum((xs[t] - mean) * (xs[t + k] - mean) for t in range(n - k))
                / den
            )
            q += rk * rk / (n - k)
        q *= n * (n + 2)
        assert r.n_hours == n and r.dof == 6
        assert abs(r.q_stat - q) < max(1e-2, q * 1e-4)
        assert r.verdict == (
            "autocorrelated" if q > 12.591587243743977 else "white_noise"
        )


def test_causal_ops_match_python(spark, sf_dir):
    """Replay stratified ATE and DiD in Python (json parse, exact
    integer means) and pin the null-design sanity (estimates small
    relative to the outcome scale on this randomized synthetic)."""
    import json

    from project_bigdata_spark.sources import load_table

    ate = _q("stratified_ate")(spark, sf_dir).collect()[0]
    did = _q("diff_in_diff")(spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "props",
            F.hour("ts").alias("h"),
            F.unix_micros("ts").alias("us"),
            F.when(F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5))
            .otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            .alias("c"),
        )
        .collect()
    )
    rows = [
        (1 if json.loads(e.props)["k"] >= 50 else 0, e.h, e.us, e.c)
        for e in ev
    ]
    # stratified ATE
    cell = defaultdict(lambda: [0, 0])
    for t, h, _, c in rows:
        cc = cell[(h, t)]
        cc[0] += c
        cc[1] += 1
    num = 0.0
    den = 0
    for h in range(24):
        if (h, 1) in cell and (h, 0) in cell:
            st, nt = cell[(h, 1)]
            sc, nc = cell[(h, 0)]
            w = nt + nc
            num += (st / nt - sc / nc) * w
            den += w
    assert abs(ate.stratified_ate - num / den / 100) < 1e-3
    s1 = sum(c for t, _, _, c in rows if t == 1)
    n1 = sum(1 for t, _, _, c in rows if t == 1)
    s0 = sum(c for t, _, _, c in rows if t == 0)
    n0 = len(rows) - n1
    assert (ate.n_treated, ate.n_control) == (n1, n0)
    assert abs(ate.unadjusted_diff - (s1 / n1 - s0 / n0) / 100) < 1e-3
    # DiD
    lo = min(us for _, _, us, _ in rows)
    hi = max(us for _, _, us, _ in rows)
    q = defaultdict(lambda: [0, 0])
    for t, _, us, c in rows:
        post = 1 if 2 * us >= lo + hi else 0
        qq = q[(t, post)]
        qq[0] += c
        qq[1] += 1
    m = {k: v[0] / v[1] for k, v in q.items()}
    expect = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    assert abs(did.did_estimate - expect / 100) < 1e-3
    assert did.n_events == len(rows)
    # randomized treatment + stationary outcome => both near the null
    mean_val = (s1 + s0) / len(rows) / 100
    assert abs(ate.stratified_ate) < 0.25 * max(mean_val, 1.0)
    assert abs(did.did_estimate) < 0.25 * max(mean_val, 1.0)


def test_cuped_matches_python(spark, sf_dir):
    import hashlib

    from project_bigdata_spark.sources import load_table

    r = _q("cuped_adjustment")(spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.when(F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5))
            .otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            .alias("c"),
        )
        .collect()
    )
    lo = min(e.us for e in ev)
    hi = max(e.us for e in ev)
    per = defaultdict(lambda: [0, 0, 0, 0])  # x, y, n_pre, n_post
    for e in ev:
        p = per[e.user_id]
        if 2 * e.us < lo + hi:
            p[0] += e.c
            p[2] += 1
        else:
            p[1] += e.c
            p[3] += 1
    cohort = {
        u: (x, y) for u, (x, y, np_, nq) in per.items() if np_ and nq
    }
    n = len(cohort)
    xs = [x for x, _ in cohort.values()]
    ys = [y for _, y in cohort.values()]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    th = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n
    assert r.n_users == n
    assert abs(r.theta - th) < 1e-4
    groups = defaultdict(lambda: [0, 0.0, 0])  # sy, sadj, n
    adj_all = []
    for u, (x, y) in cohort.items():
        v = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        yhat = y - th * (x - xbar)
        g = groups[v]
        g[0] += y
        g[1] += yhat
        g[2] += 1
        adj_all.append(yhat)
    raw = groups[1][0] / groups[1][2] - groups[0][0] / groups[0][2]
    cup = groups[1][1] / groups[1][2] - groups[0][1] / groups[0][2]
    assert abs(r.mean_diff_raw - raw / 100) < 1e-2
    assert abs(r.mean_diff_cuped - cup / 100) < 1e-2
    var_y = sum(y * y for y in ys) / n - (sy / n) ** 2
    m_adj = sum(adj_all) / n
    var_adj = sum(a * a for a in adj_all) / n - m_adj**2
    assert abs(r.var_reduction - (1 - var_adj / var_y)) < 1e-3
    # CUPED can only reduce (or preserve) variance by construction
    assert r.var_reduction >= -1e-6


def test_raking_ipf_matches_python_and_calibrates(spark, sf_dir):
    """Replay the snapped IPF sweeps exactly; after 3 rounds the column
    marginals must match the uniform target almost exactly and row
    marginals approximately (alternating-sweep property)."""
    from project_bigdata_spark.sources import load_table

    rows = _q("raking_ipf")(spark, sf_dir).collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", (F.hour("ts") / 6).cast("bigint").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    cells = {(r.event_type, r.b): r.n for r in ev}
    ets = sorted({k[0] for k in cells})
    bs = sorted({k[1] for k in cells})
    n = sum(cells.values())
    row_t = n * 1e6 / len(ets)
    col_t = n * 1e6 / len(bs)

    def snap(x):
        import math

        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    w = {k: v * 1_000_000 for k, v in cells.items()}
    for _ in range(3):
        rs = defaultdict(int)
        for (et, b), v in w.items():
            rs[et] += v
        w = {k: snap(v * row_t / rs[k[0]]) for k, v in w.items()}
        cs = defaultdict(int)
        for (et, b), v in w.items():
            cs[b] += v
        w = {k: snap(v * col_t / cs[k[1]]) for k, v in w.items()}
    for r in rows:
        k = (r.event_type, r.hour_bucket)
        assert r.n_raw == cells[k]
        assert abs(r.weight_factor - w[k] / 1e6 / cells[k]) < 1e-5
    # after the final column sweep, column marginals hit the target
    cs = defaultdict(float)
    for (et, b), v in w.items():
        cs[b] += v / 1e6
    for b, tot in cs.items():
        assert abs(tot - n / len(bs)) < 1.0, (b, tot)


def test_power_analysis_matches_python(spark, sf_dir):
    import hashlib
    import math

    from project_bigdata_spark.sources import load_table

    rows = _q("power_analysis")(spark, sf_dir).collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            F.when(F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5))
            .otherwise(-F.floor(-F.col("value") * 100 + 0.5))
            .alias("c"),
        )
        .collect()
    )
    groups = defaultdict(lambda: defaultdict(list))
    for e in ev:
        v = int(hashlib.md5(str(e.event_id).encode()).hexdigest()[:8], 16) % 2
        groups[e.event_type][v].append(e.c)
    ZA, ZB = 1.959963984540054, 0.8416212335729143
    for r in rows:
        g = groups[r.event_type]
        assert (r.n_variant_1, r.n_variant_0) == (len(g[1]), len(g[0]))
        m1 = sum(g[1]) / len(g[1])
        m0 = sum(g[0]) / len(g[0])
        nt = len(g[0]) + len(g[1])
        # pooled WITHIN-arm variance (nt - 2 dof), the standard two-sample
        # pooled estimator — excludes the between-arm component
        ss1 = sum(x * x for x in g[1]) - sum(g[1]) ** 2 / len(g[1])
        ss0 = sum(x * x for x in g[0]) - sum(g[0]) ** 2 / len(g[0])
        var = (ss1 + ss0) / (nt - 2)
        assert abs(r.observed_diff - (m1 - m0) / 100) < 1e-3
        assert abs(r.pooled_std - var**0.5 / 100) < 1e-3
        if abs(m1 - m0) < 1e-9:
            assert r.n_required_per_arm is None
        else:
            n_req = math.ceil(2 * var * (ZA + ZB) ** 2 / (m1 - m0) ** 2)
            assert r.n_required_per_arm == n_req
            assert r.n_required_per_arm > 0
