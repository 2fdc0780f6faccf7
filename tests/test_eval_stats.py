"""Known-value checks for the statistical evaluation pack
(plans/eval_queries.py): the AUC / KS / CUSUM / Theil-Sen / Gini /
Spearman / JS-divergence / ACF kernels are verified against tiny
hand-computable datasets, independent of the
documents/events tables the registered queries run on.  (The
registered queries themselves are oracle-checked end-to-end by
tools/check_oracle.py; these tests pin the *math* so a refactor of
the shared prefix-sum shape can't silently change the statistics.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.operators.scale import (
    distributed_prefix_sum,
)


def _auc_from_groups(df):
    """The exact Mann-Whitney fold used by quality_classifier_auc."""
    c = distributed_prefix_sum(df, "s", "n", out_col="cum_before")
    t = c.agg(
        F.sum(F.col("npos") * (2 * F.col("cum_before") + F.col("n") + 1))
        .cast("long")
        .alias("twice_ranksum"),
        F.sum("npos").cast("long").alias("n_pos"),
        F.sum(F.col("n") - F.col("npos")).cast("long").alias("n_neg"),
    ).collect()[0]
    ranksum = t.twice_ranksum / 2.0
    return (ranksum - t.n_pos * (t.n_pos + 1) / 2.0) / (t.n_pos * t.n_neg)


def test_auc_perfect_separation(spark):
    # scores 1,2 negative; 3,4 positive -> AUC = 1.0
    rows = [(1.0, 1, 0), (2.0, 1, 0), (3.0, 1, 1), (4.0, 1, 1)]
    df = spark.createDataFrame(rows, "s double, n long, npos long")
    assert _auc_from_groups(df) == pytest.approx(1.0)


def test_auc_with_ties(spark):
    # pos scores {2,3}, neg scores {1,2}: pairs (2>1)=1, (2=2)=0.5,
    # (3>1)=1, (3>2)=1 -> AUC = 3.5/4 = 0.875.  Tied score 2 collapses
    # to one group of n=2, npos=1 — exercises the tie-aware rank.
    rows = [(1.0, 1, 0), (2.0, 2, 1), (3.0, 1, 1)]
    df = spark.createDataFrame(rows, "s double, n long, npos long")
    assert _auc_from_groups(df) == pytest.approx(0.875)


def test_auc_interleaved(spark):
    # pos at odd scores 1,3,5,7 vs neg at even 2,4,6,8:
    # wins 0+1+2+3 = 6 of 16 -> AUC = 0.375
    rows = [(float(i), 1, i % 2) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "s double, n long, npos long")
    assert _auc_from_groups(df) == pytest.approx(0.375)


def test_ks_statistic_disjoint_supports(spark):
    # population 1 entirely below population 2 -> D = 1.0
    # (multi-value form: both ECDF counts ride one binning pass)
    g = spark.createDataFrame(
        [(1.0, 1, 0), (2.0, 1, 0), (10.0, 0, 1), (11.0, 0, 1)],
        "value double, c1 long, c2 long",
    )
    cum = distributed_prefix_sum(
        g, "value", ["c1", "c2"], out_col=["cb1", "cb2"]
    ).select(
        (F.col("cb1") + F.col("c1")).alias("f1"),
        (F.col("cb2") + F.col("c2")).alias("f2"),
    )
    d = cum.agg(F.max(F.abs(F.col("f1") / 2.0 - F.col("f2") / 2.0))).collect()[0][0]
    assert d == pytest.approx(1.0)


def test_ks_identical_samples_zero(spark):
    g = spark.createDataFrame(
        [(1.0, 2, 2), (5.0, 3, 3), (9.0, 1, 1)], "value double, c1 long, c2 long"
    )
    cum = distributed_prefix_sum(
        g, "value", ["c1", "c2"], out_col=["cb1", "cb2"]
    ).select(
        (F.col("cb1") + F.col("c1")).alias("f1"),
        (F.col("cb2") + F.col("c2")).alias("f2"),
    )
    d = cum.agg(F.max(F.abs(F.col("f1") / 6.0 - F.col("f2") / 6.0))).collect()[0][0]
    assert d == pytest.approx(0.0)


def test_prefix_sum_multi_col_matches_single(spark):
    # the multi-value form must be column-for-column identical to two
    # independent single-column passes over the same ordering
    rows = [(float(i), i % 3 + 1, (i * 7) % 5) for i in range(200)]
    g = spark.createDataFrame(rows, "value double, c1 long, c2 long")
    multi = distributed_prefix_sum(
        g, "value", ["c1", "c2"], out_col=["m1", "m2"]
    )
    s1 = distributed_prefix_sum(g, "value", "c1", out_col="s1")
    s2 = distributed_prefix_sum(g, "value", "c2", out_col="s2")
    got = {r.value: (r.m1, r.m2) for r in multi.collect()}
    want1 = {r.value: r.s1 for r in s1.collect()}
    want2 = {r.value: r.s2 for r in s2.collect()}
    assert got == {v: (want1[v], want2[v]) for v in want1}


def test_cusum_peak_at_level_shift(spark):
    # series 0,0,0,10,10,10 -> mean 5; S_t = cum - t*5 peaks (in |.|)
    # at t=3 (S_3 = -15) -> changepoint at the last low day.
    rows = [(f"2024-01-0{i}", 0.0 if i <= 3 else 10.0) for i in range(1, 7)]
    daily = spark.createDataFrame(rows, "obs_date string, day_value double").select(
        F.to_date("obs_date").alias("obs_date"), "day_value"
    )
    from pyspark.sql import Window

    w = Window.orderBy("obs_date").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = daily.select(
        "obs_date",
        F.sum("day_value").over(w).alias("cum_incl"),
        F.row_number().over(Window.orderBy("obs_date")).cast("long").alias("t"),
    ).where(F.col("t") < 6)
    stat = F.abs(F.col("cum_incl") - F.col("t") * 5.0)
    top = c.orderBy(stat.desc(), F.col("obs_date").asc()).limit(1).collect()[0]
    assert str(top.obs_date) == "2024-01-03"


def test_theil_sen_recovers_exact_line(spark):
    # y = 3x + 7 exactly -> every pairwise slope is 3, intercept 7.
    rows = [(f"2024-01-{d:02d}", 7.0 + 3.0 * (d - 1)) for d in range(1, 8)]
    daily = spark.createDataFrame(rows, "obs_date string, daily_avg double").select(
        F.to_date("obs_date").alias("obs_date"), "daily_avg"
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.obs_date") < F.col("b.obs_date")).select(
        (
            (F.col("b.daily_avg") - F.col("a.daily_avg"))
            / F.datediff(F.col("b.obs_date"), F.col("a.obs_date"))
        ).alias("slope")
    )
    med = slopes.agg(F.median("slope")).collect()[0][0]
    assert med == pytest.approx(3.0)
    x = F.datediff(F.col("obs_date"), F.lit("2024-01-01").cast("date"))
    icpt = daily.agg(F.median(F.col("daily_avg") - med * x)).collect()[0][0]
    assert icpt == pytest.approx(7.0)


def test_theil_sen_robust_to_outlier(spark):
    # one wild outlier day should not move the median slope.
    rows = [(f"2024-01-{d:02d}", 7.0 + 3.0 * (d - 1)) for d in range(1, 8)]
    rows[3] = ("2024-01-04", 1000.0)
    daily = spark.createDataFrame(rows, "obs_date string, daily_avg double").select(
        F.to_date("obs_date").alias("obs_date"), "daily_avg"
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.obs_date") < F.col("b.obs_date")).select(
        (
            (F.col("b.daily_avg") - F.col("a.daily_avg"))
            / F.datediff(F.col("b.obs_date"), F.col("a.obs_date"))
        ).alias("slope")
    )
    med = slopes.agg(F.median("slope")).collect()[0][0]
    assert med == pytest.approx(3.0)


def test_gini_formula_extremes(spark):
    # perfectly equal revenues -> G = 0; one customer holds all -> G -> (n-1)/n
    def gini(rows):
        df = spark.createDataFrame(rows, "custkey long, rev long")
        ones = df.withColumn("__one", F.lit(1).cast("long"))
        ranked = distributed_prefix_sum(
            ones, ["rev", "custkey"], "__one", out_col="rk0"
        ).withColumn("rk", F.col("rk0") + 1)
        t = ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rev").alias("s"),
            F.sum(F.col("rk").cast("decimal(19,0)") * F.col("rev").cast("decimal(19,0)")).alias("w"),
        ).collect()[0]
        return 2.0 * float(t.w) / (t.n * t.s) - (t.n + 1.0) / t.n

    assert gini([(i, 100) for i in range(10)]) == pytest.approx(0.0)
    # one holder of everything: G = (n-1)/n = 0.9 for n=10
    assert gini([(i, 0) for i in range(9)] + [(9, 1000)]) == pytest.approx(0.9)


def test_spearman_perfect_and_inverse(spark):
    from end_to_end_database_pipeline_project_spark.plans.eval_queries import (
        doc_length_quality_spearman,  # noqa: F401 - import check only
    )

    def rho(pairs):
        d = spark.createDataFrame(pairs, "x long, y double")
        gx = d.groupBy(F.col("x").alias("v")).agg(F.count(F.lit(1)).cast("long").alias("n"))
        cx = distributed_prefix_sum(gx, "v", "n", out_col="cb").select(
            "v", (2 * F.col("cb") + F.col("n") + 1).alias("a2x")
        )
        gy = d.groupBy(F.col("y").alias("v")).agg(F.count(F.lit(1)).cast("long").alias("n"))
        cy = distributed_prefix_sum(gy, "v", "n", out_col="cb").select(
            "v", (2 * F.col("cb") + F.col("n") + 1).alias("a2y")
        )
        nt = d.count()
        j = (
            d.join(cx, d["x"] == cx["v"]).drop("v")
            .join(cy, d["y"] == cy["v"]).drop("v")
            .select(
                (F.col("a2x") - (nt + 1)).cast("decimal(19,0)").alias("dx"),
                (F.col("a2y") - (nt + 1)).cast("decimal(19,0)").alias("dy"),
            )
        )
        a = j.agg(
            F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
            F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
            F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        ).collect()[0]
        return float(a.sxy) / (float(a.sxx) ** 0.5 * float(a.syy) ** 0.5)

    inc = [(i, float(i) * 2.0) for i in range(1, 9)]
    dec = [(i, -float(i)) for i in range(1, 9)]
    assert rho(inc) == pytest.approx(1.0)
    assert rho(dec) == pytest.approx(-1.0)


def test_js_divergence_identities(spark):
    # identical distributions -> 0 bits; disjoint supports -> 1 bit,
    # via the closed form JS = ln2 + sum_common[...] the query uses
    import math

    def js_bits(rows):
        p = spark.createDataFrame(rows, "source string, token string, p double")
        a, b = p.alias("a"), p.alias("b")
        pa, pb = F.col("a.p"), F.col("b.p")
        term = (
            (pa / 2) * F.log(pa / 2)
            + (pb / 2) * F.log(pb / 2)
            - ((pa + pb) / 2) * F.log((pa + pb) / 2)
        )
        pairs = a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        ).select(term.alias("term"))
        s = pairs.agg(F.sum("term")).collect()[0][0]
        return ((s or 0.0) + math.log(2)) / math.log(2)

    same = [("s1", "a", 0.5), ("s1", "b", 0.5), ("s2", "a", 0.5), ("s2", "b", 0.5)]
    disjoint = [("s1", "a", 1.0), ("s2", "b", 1.0)]
    assert js_bits(same) == pytest.approx(0.0, abs=1e-12)
    assert js_bits(disjoint) == pytest.approx(1.0)


def test_acf_alternating_series(spark):
    # x = +1,-1,+1,... (mean 0): r_1 = -1, r_2 = +1 on the overlap
    # normalized by the full sum of squares -> r_k = -(n-k)/n * sign
    rows = [(f"2024-01-{d:02d}", 1.0 if d % 2 else -1.0) for d in range(1, 11)]
    daily = spark.createDataFrame(rows, "obs_date string, dev double").select(
        F.to_date("obs_date").alias("obs_date"), "dev"
    )
    from pyspark.sql import Window

    c = daily.select(
        F.row_number().over(Window.orderBy("obs_date")).cast("long").alias("t"),
        "dev",
    )
    den = 10.0  # sum of dev^2
    a, b = c.alias("a"), c.alias("b")
    for k, want in ((1, -9 / 10), (2, 8 / 10)):
        num = (
            a.join(b, F.col("b.t") == F.col("a.t") + k)
            .agg(F.sum(F.col("a.dev") * F.col("b.dev")))
            .collect()[0][0]
        )
        assert num / den == pytest.approx(want)


def test_psi_empty_bins_still_contribute(spark):
    # bins empty in BOTH halves must carry their add-1-smoothed mass:
    # with unequal half sizes the absent bins' term is nonzero, so a
    # PSI computed only over observed bins is biased. Mirror the
    # registered query's spine + smoothing shape on a 2-observed-bin
    # contingency and check against the closed-form 10-bin sum.
    import math

    c = spark.createDataFrame([(0, 3, 1), (9, 1, 2)], "bin long, nr long, nc long")
    tr, tc = 4, 3
    spine = spark.range(10).select(F.col("id").alias("bin"))
    p = spine.join(c, "bin", "left").select(
        ((F.coalesce(F.col("nr"), F.lit(0)) + 1.0) / (tr + 10.0)).alias("pr"),
        ((F.coalesce(F.col("nc"), F.lit(0)) + 1.0) / (tc + 10.0)).alias("pc"),
    )
    term = (F.col("pr") - F.col("pc")) * F.log(F.col("pr") / F.col("pc"))
    got_n, got_psi = p.agg(F.count(F.lit(1)), F.sum(term)).collect()[0]

    def t(nr, nc):
        pr, pc = (nr + 1.0) / (tr + 10.0), (nc + 1.0) / (tc + 10.0)
        return (pr - pc) * math.log(pr / pc)

    want = t(3, 1) + t(1, 2) + 8 * t(0, 0)
    assert got_n == 10
    assert got_psi == pytest.approx(want)
    assert 8 * t(0, 0) != 0.0  # the absent-bin mass the spine preserves
