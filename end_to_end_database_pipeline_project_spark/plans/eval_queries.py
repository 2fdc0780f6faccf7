"""Round-5 wave-3: statistical evaluation operators — the measurement
layer a data/training pipeline runs *on top of* its classifiers and
rollups (the reference's analytics surface stops at means/3-sigma;
these are the inferential forms a production curation stack adds).

- ``quality_classifier_auc`` — threshold-free ranking quality (ROC
  AUC) of a document quality scorer, via the tie-aware Mann-Whitney
  rank statistic over ``distributed_prefix_sum`` (no global window).
- ``ks_two_sample_test`` — Kolmogorov-Smirnov distribution drift test
  between two event populations, ECDFs from the same prefix-sum
  operator.
- ``calibration_bins`` — reliability diagram (predicted-probability
  bins vs empirical rate) for the same scorer.
- ``cusum_changepoint`` — CUSUM mean-shift changepoint over the daily
  series.
- ``theil_sen_trend`` — robust (median-of-pairwise-slopes) trend
  estimate per event type.

Determinism discipline shared by the pack: scores and test statistics
are built from RATIONAL double arithmetic only (+, -, *, /, sqrt — all
IEEE correctly-rounded and therefore bit-identical across Spark and
DuckDB); no exp/ln in any value that is *grouped or compared* on, so
tie structure and branch decisions can never diverge between the
engines. (Monotone transforms don't change AUC, so the sigmoid the
logreg applies is dropped rather than reproduced; the calibration
query squashes with the algebraic x/(1+|x|) instead of the logistic.)

All oracle-checked per the registry conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.scale import distributed_prefix_sum
from ..session import fan_out
from ..sources.catalog import load_table
from .registry import query

_R = 6

# DSIR target sources = the positive class, matching
# quality_logreg_classifier's label so the two queries evaluate the
# same classification task.
_POS_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s, y): fixed-weight linear quality score + binary
    label. Rational arithmetic only — see module docstring."""
    docs = load_table(spark, sf_dir, "documents")
    ln = F.length("text")
    space_ratio = (ln - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))) * 1.0 / (
        ln + 1
    )
    nonalpha_ratio = F.length(F.regexp_replace("text", "[a-zA-Z ]", "")) * 1.0 / (ln + 1)
    s = (space_ratio - 3.0 * nonalpha_ratio) + ln / 10000.0
    return fan_out(docs).select(
        "doc_id",
        s.alias("s"),
        F.col("source").isin(*_POS_SOURCES).cast("long").alias("y"),
    )


_SCORED_DOCS_SQL = """feats AS (
  SELECT doc_id,
         ((length(text) - length(replace(text, ' ', ''))) * 1.0
            / (length(text) + 1)
          - 3.0 * (length(regexp_replace(text, '[a-zA-Z ]', '', 'g')) * 1.0
            / (length(text) + 1)))
         + length(text) / 10000.0 AS s,
         CAST(CASE WHEN source IN ('src0','src1','src2','src3','src4')
              THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM documents
)"""


# ------------------------------------------------ ROC AUC (Mann-Whitney)


@query(
    "quality_classifier_auc",
    oracle="WITH "
    + _SCORED_DOCS_SQL
    + """,
g AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS npos
  FROM feats GROUP BY s
),
c AS (
  SELECT s, n, npos,
         CAST(coalesce(sum(n) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM g
),
t AS (
  SELECT CAST(sum(npos * (2 * cum_before + n + 1)) AS BIGINT) AS twice_ranksum,
         CAST(sum(npos) AS BIGINT) AS n_pos,
         CAST(sum(n - npos) AS BIGINT) AS n_neg
  FROM c
)
SELECT n_pos, n_neg,
       round((twice_ranksum / 2.0 - n_pos * (n_pos + 1) / 2.0)
             / (n_pos * 1.0 * n_neg), 6) AS auc,
       round(2.0 * ((twice_ranksum / 2.0 - n_pos * (n_pos + 1) / 2.0)
             / (n_pos * 1.0 * n_neg)) - 1.0, 6) AS gini
FROM t""",
)
def quality_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the fixed-weight document quality scorer against the
    DSIR-target label — the threshold-free ranking metric every
    classifier-filtered curation pipeline (CCNet, FineWeb-Edu) reports
    next to accuracy (`quality_logreg_classifier` covers the training
    recurrence; this covers the evaluation).

    AUC == the tie-aware Mann-Whitney U statistic, which needs every
    row's GLOBAL rank by score — the single-reducer trap. Shape here:
    collapse to score-distinct groups (one shuffle), take the group
    rank from ``distributed_prefix_sum`` (two-pass, deterministic
    binning — never a global window), and fold the tie correction in
    closed form: with cum_before rows below a group of n rows, the
    group's average rank is cum_before + (n+1)/2, so
    2*ranksum = sum(npos * (2*cum_before + n + 1)) stays in EXACT
    integer arithmetic until the final division. Bit-identical across
    engines and scales; wall-clock bounded by the largest prefix-sum
    bin."""
    g = (
        _scored_docs(spark, sf_dir)
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("npos"),
        )
    )
    c = distributed_prefix_sum(g, "s", "n", out_col="cum_before")
    t = c.agg(
        F.sum(F.col("npos") * (2 * F.col("cum_before") + F.col("n") + 1))
        .cast("long")
        .alias("twice_ranksum"),
        F.sum("npos").cast("long").alias("n_pos"),
        F.sum(F.col("n") - F.col("npos")).cast("long").alias("n_neg"),
    )
    auc = (F.col("twice_ranksum") / 2.0 - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0) / (
        F.col("n_pos") * 1.0 * F.col("n_neg")
    )
    return t.select(
        "n_pos",
        "n_neg",
        F.round(auc, _R).alias("auc"),
        F.round(2.0 * auc - 1.0, _R).alias("gini"),
    )


# ------------------------------------------------ two-sample KS test


@query(
    "ks_two_sample_test",
    oracle="""WITH pop AS (
  SELECT value,
         CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS BIGINT) AS is1,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT) AS is2
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
),
g AS (
  SELECT value, CAST(sum(is1) AS BIGINT) AS c1, CAST(sum(is2) AS BIGINT) AS c2
  FROM pop GROUP BY value
),
c AS (
  SELECT CAST(sum(c1) OVER w AS BIGINT) AS f1,
         CAST(sum(c2) OVER w AS BIGINT) AS f2
  FROM g
  WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM g),
d AS (
  SELECT n1, n2, max(abs(f1 * 1.0 / n1 - f2 * 1.0 / n2)) AS d_stat
  FROM c CROSS JOIN n GROUP BY n1, n2
)
SELECT n1, n2, round(d_stat, 6) AS d_stat,
       round(d_stat * sqrt(n1 * 1.0 * n2 / (n1 + n2)), 6) AS ks_lambda,
       d_stat * sqrt(n1 * 1.0 * n2 / (n1 + n2)) > 1.358 AS reject_05
FROM d""",
)
def ks_two_sample_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the click and
    purchase value distributions — the drift/dataset-shift gate a
    monitoring pipeline runs between a reference window and a live
    window (same statistic scipy.stats.ks_2samp computes).

    D = max over observed values of |F1(v) - F2(v)| needs both ECDFs
    over one global value ordering. Shape: collapse to value-distinct
    groups with per-population counts (one shuffle), INCLUSIVE
    cumulative counts from ``distributed_prefix_sum`` (exclusive
    prefix + own count; two passes, no global window), divide by the
    broadcast population totals only at the very end so everything
    until the final max is exact integer arithmetic. The asymptotic
    lambda = D*sqrt(n1*n2/(n1+n2)) rejects at alpha=0.05 above 1.358
    (Kolmogorov distribution critical value — sqrt is IEEE-exact, so
    the boolean can't flap between engines)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("event_type").isin("click", "purchase")
    )
    g = ev.groupBy("value").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("c1"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("c2"),
    )
    cum1 = distributed_prefix_sum(g, "value", "c1", out_col="cb1")
    cum = distributed_prefix_sum(cum1, "value", "c2", out_col="cb2").select(
        (F.col("cb1") + F.col("c1")).alias("f1"),
        (F.col("cb2") + F.col("c2")).alias("f2"),
    )
    n = g.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    d = (
        cum.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(
            F.max(
                F.abs(F.col("f1") * 1.0 / F.col("n1") - F.col("f2") * 1.0 / F.col("n2"))
            ).alias("d_stat")
        )
    )
    lam = F.col("d_stat") * F.sqrt(F.col("n1") * 1.0 * F.col("n2") / (F.col("n1") + F.col("n2")))
    return d.select(
        "n1",
        "n2",
        F.round("d_stat", _R).alias("d_stat"),
        F.round(lam, _R).alias("ks_lambda"),
        (lam > 1.358).alias("reject_05"),
    )


# ------------------------------------------------ calibration bins


@query(
    "calibration_bins",
    oracle="WITH "
    + _SCORED_DOCS_SQL
    + """,
p AS (
  SELECT 0.5 + 0.5 * (((s - 0.2) * 40.0) / (1.0 + abs((s - 0.2) * 40.0))) AS p, y
  FROM feats
)
SELECT CAST(least(CAST(floor(p * 10) AS BIGINT), 9) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(sum(p) / count(*), 6) AS mean_pred,
       round(sum(y) * 1.0 / count(*), 6) AS frac_pos,
       round(abs(sum(p) / count(*) - sum(y) * 1.0 / count(*)), 6) AS abs_gap
FROM p GROUP BY 1""",
)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the quality scorer: squash the linear
    score into (0,1) with the ALGEBRAIC sigmoid 0.5 + 0.5*s/(1+|s|)
    (rational ops only — the logistic's exp() is not bit-portable
    across engines and a monotone squash is all calibration binning
    needs; the affine re-center (s-0.2)*40 plays the role of the
    trained bias+gain so the squash actually spreads over the
    deciles), decile-bin the predicted probability, and compare mean
    predicted vs empirical positive rate per bin (the per-bin |gap| is
    the ECE integrand). One groupBy on a 10-value key — map-side
    combined, no skew (bins are balanced by construction of the
    squash), scan -> one tiny shuffle at any scale."""
    z = (F.col("s") - 0.2) * 40.0
    p = F.lit(0.5) + 0.5 * (z / (1.0 + F.abs(z)))
    scored = _scored_docs(spark, sf_dir).select(p.alias("p"), "y")
    binc = F.least(F.floor(F.col("p") * 10).cast("long"), F.lit(9).cast("long"))
    return (
        scored.groupBy(binc.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.sum("p") / F.count(F.lit(1)), _R).alias("mean_pred"),
            F.round(F.sum("y") * 1.0 / F.count(F.lit(1)), _R).alias("frac_pos"),
            F.round(
                F.abs(F.sum("p") / F.count(F.lit(1)) - F.sum("y") * 1.0 / F.count(F.lit(1))),
                _R,
            ).alias("abs_gap"),
        )
    )


# ------------------------------------------------ CUSUM changepoint


@query(
    "cusum_changepoint",
    oracle="""WITH daily AS (
  SELECT CAST(ts AS DATE) AS obs_date, sum(value) AS day_value
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         sum(day_value) AS total, sum(day_value) / count(*) AS mean_all
  FROM daily
),
c AS (
  SELECT obs_date, day_value, n_days, total, mean_all,
         sum(day_value) OVER (ORDER BY obs_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_incl,
         CAST(row_number() OVER (ORDER BY obs_date) AS BIGINT) AS t
  FROM daily CROSS JOIN tot
)
SELECT obs_date AS changepoint_date, n_days,
       round(abs(cum_incl - t * mean_all), 6) AS cusum_abs,
       round(cum_incl / t, 6) AS mean_before,
       round((total - cum_incl) / (n_days - t), 6) AS mean_after
FROM c
WHERE t < n_days
ORDER BY abs(cum_incl - t * mean_all) DESC, obs_date ASC
LIMIT 1""",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift changepoint over the daily event-value series:
    S_t = sum_{s<=t}(x_s - mean) peaks at the most likely shift point
    (the classic Page/Pettitt screen a monitoring pipeline runs before
    alerting on a level change); the split means quantify the shift.

    The prefix runs in ONE global window over the day-grain rollup —
    bounded by construction (<= ~3650 rows at a decade of 100 TB
    telemetry; the raw scan was already reduced by the day groupBy),
    the same boundedness class as the EWMA/islands series queries and
    registered in the audit allow-list. The argmax is a
    TakeOrderedAndProject over the same few rows with a deterministic
    (|S|, date) tie-break; split means come from the running sum and
    the broadcast total, so no second scan."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("obs_date")).agg(
        F.sum("value").alias("day_value")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("day_value").alias("total"),
        (F.sum("day_value") / F.count(F.lit(1))).alias("mean_all"),
    )
    w = Window.orderBy("obs_date").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = (
        daily.crossJoin(F.broadcast(tot))
        .select(
            "obs_date",
            "n_days",
            "total",
            "mean_all",
            F.sum("day_value").over(w).alias("cum_incl"),
            F.row_number().over(Window.orderBy("obs_date")).cast("long").alias("t"),
        )
        .where(F.col("t") < F.col("n_days"))
    )
    stat = F.abs(F.col("cum_incl") - F.col("t") * F.col("mean_all"))
    return (
        c.orderBy(stat.desc(), F.col("obs_date").asc())
        .limit(1)
        .select(
            F.col("obs_date").alias("changepoint_date"),
            "n_days",
            F.round(stat, _R).alias("cusum_abs"),
            F.round(F.col("cum_incl") / F.col("t"), _R).alias("mean_before"),
            F.round(
                (F.col("total") - F.col("cum_incl")) / (F.col("n_days") - F.col("t")), _R
            ).alias("mean_after"),
        )
    )


# ------------------------------------------------ Theil-Sen robust trend


@query(
    "theil_sen_trend",
    oracle="""WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS obs_date, avg(value) AS daily_avg
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
slopes AS (
  SELECT a.event_type,
         (b.daily_avg - a.daily_avg) * 1.0
           / date_diff('day', a.obs_date, b.obs_date) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.obs_date < b.obs_date
),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
         median(slope) AS slope_med
  FROM slopes GROUP BY 1
)
SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_days, max(m.n_pairs) AS n_pairs,
       round(max(m.slope_med), 6) AS slope_per_day,
       round(median(d.daily_avg - m.slope_med
             * date_diff('day', DATE '2024-01-01', d.obs_date)), 6) AS intercept
FROM daily d JOIN m ON d.event_type = m.event_type
GROUP BY d.event_type""",
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the median of all
    pairwise day-slopes (breakdown point 29%, vs 0% for the OLS line
    `ols_daily_trend` fits) plus the matching median intercept
    anchored at 2024-01-01 — the robust-regression twin of the
    median/MAD outlier screen.

    The pair generation is a self-equi-join ON event_type with
    obs_date < obs_date — O(days^2) PER TYPE on the day-grain rollup
    (~13M pairs per type at a decade; the raw scan is already reduced
    to <= #days rows per type before any join), the same documented
    boundedness class as the MAD/EWMA family. Both medians are exact
    per-type sort-aggregates over bounded groups; the second pass
    joins the 5-row medians frame back by broadcast."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy("event_type", F.to_date("ts").alias("obs_date")).agg(
        F.avg("value").alias("daily_avg")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.obs_date") < F.col("b.obs_date")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.daily_avg") - F.col("a.daily_avg"))
            * 1.0
            / F.datediff(F.col("b.obs_date"), F.col("a.obs_date"))
        ).alias("slope"),
    )
    m = slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.median("slope").alias("slope_med"),
    )
    x = F.datediff(F.col("obs_date"), F.lit("2024-01-01").cast("date"))
    return (
        daily.join(F.broadcast(m), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max("n_pairs").alias("n_pairs"),
            F.round(F.max("slope_med"), _R).alias("slope_per_day"),
            F.round(
                F.median(F.col("daily_avg") - F.col("slope_med") * x), _R
            ).alias("intercept"),
        )
    )
