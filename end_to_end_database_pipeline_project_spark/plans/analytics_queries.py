"""Round-3 analytics/governance operators: declarative data-quality
verification, robust (median/MAD) outlier detection, exponential
smoothing, and graph triangle statistics.

The deequ-shaped ``data_quality_report`` is the ETL capability the
reference approximates with scattered ad-hoc checks (not-null filters
in ``clickhouse_etl.py``, try/except conversions in the fetchers): a
*declarative* constraint suite computed in one pass over the table and
one anti-join per referential constraint, emitting a check/metric/pass
ledger. The rest generalize the reference's statistical surface
(3-sigma screening, rolling averages) to the robust/streaming forms a
production pipeline actually runs.

All oracle-checked per the registry conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import dec_rev, e4_to_rev, query, rev_e4

_R = 6


# ------------------------------------------------ data-quality suite


@query(
    "data_quality_report",
    oracle="""SELECT 'lineitem.l_orderkey.fk_orders' AS check,
       round(CAST(count(*) AS DOUBLE), 6) AS metric, count(*) = 0 AS passed
FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
UNION ALL
SELECT 'orders.o_custkey.fk_customer',
       round(CAST(count(*) AS DOUBLE), 6), count(*) = 0
FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
UNION ALL
SELECT 'orders.o_orderkey.unique',
       round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(o_orderkey), 6),
       count(DISTINCT o_orderkey) = count(o_orderkey)
FROM orders
UNION ALL
SELECT 'orders.o_orderstatus.domain',
       round(CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6),
       coalesce(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
                = count(*), TRUE)
FROM orders
UNION ALL
SELECT 'orders.o_totalprice.complete',
       round(CAST(count(o_totalprice) AS DOUBLE) / count(*), 6),
       count(o_totalprice) = count(*)
FROM orders
UNION ALL
SELECT 'orders.o_totalprice.non_negative',
       round(min(o_totalprice), 6), coalesce(min(o_totalprice) >= 0, TRUE)
FROM orders
UNION ALL
SELECT 'orders.row_count',
       round(CAST(count(*) AS DOUBLE), 6), count(*) > 0
FROM orders""",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality verification (the deequ shape): a
    constraint suite — row count, key uniqueness, completeness, value
    range, categorical domain, referential integrity — evaluated as a
    check/metric/pass ledger.

    Scale shape: every single-table constraint folds into ONE aggregate
    pass over ``orders`` (deequ's core trick — the metrics are all
    partial-aggregatable, so one scan + map-side combine computes the
    whole suite); each FK constraint is one LEFT ANTI join counting
    orphans (at 100 TB: the anti join shuffles on the key — or rides an
    existing bucketing; a bloom-filter pre-pass turns it into a scan +
    broadcast when the parent's key set sketch fits memory)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    agg = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("n_key"),
        F.count_distinct("o_orderkey").alias("n_key_d"),
        F.count("o_totalprice").alias("n_price"),
        F.min("o_totalprice").alias("min_price"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("n_status_ok"),
    )

    def chk(name, metric, passed):
        return F.struct(
            F.lit(name).alias("check"),
            metric.cast("double").alias("metric"),
            passed.alias("passed"),
        )

    def ratio(num, den):
        # empty-table guard: NULL ratio (DuckDB's x/0) instead of an
        # ANSI division-by-zero error
        return F.when(F.col(den) == 0, F.lit(None).cast("double")).otherwise(
            F.col(num).cast("double") / F.col(den)
        )

    single = agg.select(
        F.explode(
            F.array(
                chk("orders.row_count", F.col("n"), F.col("n") > 0),
                chk(
                    "orders.o_orderkey.unique",
                    ratio("n_key_d", "n_key"),
                    F.col("n_key_d") == F.col("n_key"),
                ),
                chk(
                    "orders.o_totalprice.complete",
                    ratio("n_price", "n"),
                    F.col("n_price") == F.col("n"),
                ),
                chk(
                    "orders.o_totalprice.non_negative",
                    F.col("min_price"),
                    # vacuously true on an empty table (NULL min):
                    # matches the oracle's coalesce(..., TRUE)
                    F.coalesce(F.col("min_price") >= 0, F.lit(True)),
                ),
                chk(
                    "orders.o_orderstatus.domain",
                    ratio("n_status_ok", "n"),
                    F.coalesce(
                        F.col("n_status_ok") == F.col("n"), F.lit(True)
                    ),
                ),
            )
        ).alias("c")
    ).select("c.*")

    def fk(name, child, parent, cond):
        orphans = child.join(parent, cond, "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphans")
        )
        return orphans.select(
            F.lit(name).alias("check"),
            F.col("n_orphans").cast("double").alias("metric"),
            (F.col("n_orphans") == 0).alias("passed"),
        )

    fk1 = fk(
        "orders.o_custkey.fk_customer",
        orders,
        customer,
        orders["o_custkey"] == customer["c_custkey"],
    )
    fk2 = fk(
        "lineitem.l_orderkey.fk_orders",
        lineitem,
        orders,
        lineitem["l_orderkey"] == orders["o_orderkey"],
    )
    return (
        single.unionByName(fk1)
        .unionByName(fk2)
        .select("check", F.round("metric", _R).alias("metric"), "passed")
    )


# --------------------------------------------- robust outlier scan


@query(
    "mad_outlier_days",
    oracle="""WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS obs_date, avg(value) AS daily_avg
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
med AS (SELECT event_type, median(daily_avg) AS med FROM daily GROUP BY 1),
mad AS (
  SELECT d.event_type, any_value(m.med) AS med,
         median(abs(d.daily_avg - m.med)) AS mad
  FROM daily d JOIN med m USING (event_type) GROUP BY 1
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN abs(d.daily_avg - m.med) > 3 * 1.4826 * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier_days,
       round(any_value(m.med), 6) AS med_daily_avg,
       round(any_value(m.mad), 6) AS mad_daily_avg
FROM daily d JOIN mad m USING (event_type)
GROUP BY 1""",
)
def mad_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: per-type daily averages screened by
    median/MAD (|x - med| > 3 * 1.4826 * MAD) instead of mean/sigma —
    the estimator that doesn't move when the outlier itself does (the
    3-sigma scan in ``value_outlier_counts`` has a 50% breakdown
    problem; MAD's breakdown point is 50%).

    Scale shape: the only full-data pass is the (type, day) partial
    aggregate; medians run on the tiny daily table (days-per-type is
    bounded — ~3650 at a decade of 100 TB telemetry — so the exact
    sort-based median's per-group state stays O(days), never O(rows)),
    and both stats ride back as broadcasts."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("obs_date")
    ).agg(F.avg("value").alias("daily_avg"))
    med = daily.groupBy("event_type").agg(F.median("daily_avg").alias("med"))
    j = daily.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.median(F.abs(F.col("daily_avg") - F.col("med"))).alias("mad"),
    )
    out = daily.join(F.broadcast(mad), "event_type")
    is_out = F.abs(F.col("daily_avg") - F.col("med")) > 3 * 1.4826 * F.col("mad")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outlier_days"),
        F.round(F.max("med"), _R).alias("med_daily_avg"),
        F.round(F.max("mad"), _R).alias("mad_daily_avg"),
    )


# ------------------------------------------- exponential smoothing


@query(
    "ewma_daily_value",
    oracle="""WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS obs_date, avg(value) AS daily_avg
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
i AS (
  SELECT event_type, obs_date, daily_avg,
         row_number() OVER (PARTITION BY event_type ORDER BY obs_date) - 1 AS idx
  FROM daily
),
s AS (
  SELECT event_type, obs_date, daily_avg,
         sum(pow(1 / 0.7, idx) * daily_avg)
           OVER (PARTITION BY event_type ORDER BY obs_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS num,
         sum(pow(1 / 0.7, idx))
           OVER (PARTITION BY event_type ORDER BY obs_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS den
  FROM i
)
SELECT event_type, obs_date, round(daily_avg, 6) AS daily_avg,
       round(num / den, 6) AS ewma
FROM s""",
)
def ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 0.3, adjusted
    form) of the per-type daily value — the denoised trend line a
    monitoring pipeline overlays on the raw rollup.

    EWMA's recurrence is non-associative, so the naive form can't
    distribute; the closed form y_t = sum_s (1-a)^(t-s) x_s /
    sum_s (1-a)^(t-s) factors the (1-a)^t out of both prefix sums —
    turning it into two ASSOCIATIVE running sums of
    (1-a)^(-s) * x_s, i.e. plain window frames that Spark executes
    with per-key streaming state. The trade the closed form makes: the
    (1-a)^(-s) weights grow geometrically (~3e4 at s=29 on this
    30-day fixture) and overflow double near s~2400, so an unbounded
    history needs per-window re-basing (restart s at each horizon and
    carry the previous window's tail as the seed term) — this query
    inherits its bound from the fixture's 30-day span."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("obs_date")
    ).agg(F.avg("value").alias("daily_avg"))
    order = Window.partitionBy("event_type").orderBy("obs_date")
    idx = F.row_number().over(order) - 1
    wt = F.pow(F.lit(1 / 0.7), F.col("idx"))
    run = (
        Window.partitionBy("event_type")
        .orderBy("obs_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        daily.withColumn("idx", idx)
        .select(
            "event_type",
            "obs_date",
            "daily_avg",
            (F.sum(wt * F.col("daily_avg")).over(run)).alias("num"),
            (F.sum(wt).over(run)).alias("den"),
        )
        .select(
            "event_type",
            "obs_date",
            F.round("daily_avg", _R).alias("daily_avg"),
            F.round(F.col("num") / F.col("den"), _R).alias("ewma"),
        )
    )


def _nation_pair_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted undirected nation-pair trading edges (a < b, w = count
    of distinct customer-supplier pairs trading across the two
    nations) — shared by the triangle and community queries, which
    differ only in the sparsification threshold they apply on ``w``."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    return (
        e0.join(customer, F.col("ck") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("sk") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


# --------------------------------------------- graph triangle stats


@query(
    "trading_triangles",
    oracle="""WITH e0 AS (
  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
cw AS (
  SELECT least(c.c_nationkey, s.s_nationkey) AS a,
         greatest(c.c_nationkey, s.s_nationkey) AS b,
         count(*) AS w
  FROM e0
  JOIN customer c ON ck = c_custkey
  JOIN supplier s ON sk = s_suppkey
  WHERE c.c_nationkey != s.s_nationkey
  GROUP BY 1, 2
),
cn AS (SELECT a, b FROM cw WHERE w >= (SELECT median(w) FROM cw)),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM cn e1
  JOIN cn e2 ON e1.b = e2.a
  JOIN cn e3 ON e3.a = e1.a AND e3.b = e2.b
),
tn AS (SELECT unnest([x, y, z]) AS nationkey FROM tri),
tc AS (SELECT nationkey, CAST(count(*) AS BIGINT) AS n_triangles FROM tn GROUP BY 1),
dn AS (
  SELECT nationkey, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT a AS nationkey FROM cn UNION ALL SELECT b FROM cn)
  GROUP BY 1
)
SELECT n.n_name,
       CAST(coalesce(d.degree, 0) AS BIGINT) AS degree,
       CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       round(CASE WHEN coalesce(d.degree, 0) >= 2
                  THEN 2.0 * coalesce(t.n_triangles, 0)
                       / (d.degree * (d.degree - 1))
                  ELSE 0 END, 6) AS clustering_coeff
FROM nation n
LEFT JOIN dn d ON d.nationkey = n.n_nationkey
LEFT JOIN tc t ON t.nationkey = n.n_nationkey""",
)
def trading_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the
    nation-level trading graph (an edge where customer-nation and
    supplier-nation trade in at least median volume — the relative
    threshold keeps the graph scale-free across SFs). The classic
    distributed graph statistic: triangles via the ordered two-path
    join (a<b<c once, no double counting).

    Scale shape: the heavy work is building the edge list — distinct
    (cust, supp) pairs reuse the fact join's shuffle, then two dim
    joins and a (nation, nation) aggregate collapse it to |V|^2 rows
    max. The triangle enumeration self-joins run on that collapsed
    edge list (broadcast — country-scale graphs are tiny; for
    billion-edge graphs the same ordered join shuffles on the edge
    key, the standard MR triangle algorithm)."""
    nation = load_table(spark, sf_dir, "nation")
    cw = _nation_pair_edges(spark, sf_dir)
    med_w = cw.agg(F.median("w").alias("med_w"))
    cn = (
        cw.crossJoin(F.broadcast(med_w))
        .where(F.col("w") >= F.col("med_w"))
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    e1 = cn.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = cn.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = cn.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    tri = (
        e1.join(F.broadcast(e2), F.col("y") == F.col("y2"))
        .join(
            F.broadcast(e3),
            (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")),
        )
        .select("x", "y", "z")
    )
    tc = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("nationkey"))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    dn = (
        cn.select(F.col("a").alias("nationkey"))
        .unionByName(cn.select(F.col("b").alias("nationkey")))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    deg = F.coalesce("degree", F.lit(0))
    tcnt = F.coalesce("n_triangles", F.lit(0))
    return (
        nation.join(F.broadcast(dn), nation["n_nationkey"] == dn["nationkey"], "left")
        .drop("nationkey")
        .join(F.broadcast(tc), nation["n_nationkey"] == tc["nationkey"], "left")
        .select(
            "n_name",
            deg.alias("degree"),
            tcnt.alias("n_triangles"),
            F.round(
                F.when(
                    deg >= 2,
                    2.0 * tcnt / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(F.lit(0.0)),
                _R,
            ).alias("clustering_coeff"),
        )
    )


# --------------------------------------- MV aggregate query rewrite


@query(
    "mv_rewrite_report",
    oracle="""WITH base AS (
  SELECT event_type, CAST(ts AS DATE) AS d, value FROM events
)
SELECT 'day' AS grain, event_type, CAST(d AS VARCHAR) AS period,
       round(avg(value), 6) AS avg_value,
       CAST(count(value) AS BIGINT) AS n_events,
       'mv_daily' AS mv_used
FROM base GROUP BY 2, 3
UNION ALL
SELECT 'month', event_type, CAST(date_trunc('month', d) AS VARCHAR),
       round(avg(value), 6), CAST(count(value) AS BIGINT), 'mv_monthly'
FROM base GROUP BY 2, 3
UNION ALL
SELECT 'quarter', event_type, CAST(date_trunc('quarter', d) AS VARCHAR),
       round(avg(value), 6), CAST(count(value) AS BIGINT), 'mv_monthly'
FROM base GROUP BY 2, 3""",
)
def mv_rewrite_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automatic aggregate rewrite onto materialized views
    (``operators/mv.py``): three requested grains — day, month,
    quarter — each answered from the COARSEST registered summary whose
    mergeable (sum, count) partials still cover it, never from the
    base table. The month and quarter grains both fold the monthly MV
    (quarter via the date->month->quarter derivation lattice); the
    day grain needs the daily MV. The ``mv_used`` column exposes the
    chooser's decision and the oracle recomputes every answer from the
    base table — asserting both the rewrite's correctness (partial
    associativity) and the expected MV choice as data.

    Scale shape: each answer is O(|MV|) — a few thousand summary rows
    folded with one tiny aggregate — while the oracle's recompute is a
    full fact scan; that asymmetry IS the feature at 100 TB."""
    from ..operators import mv as MV

    def build_daily(sp, sd):
        ev = load_table(sp, sd, "events")
        return ev.groupBy(
            "event_type", F.to_date("ts").alias("obs_date")
        ).agg(F.sum("value").alias("sum_v"), F.count("value").alias("cnt_v"))

    def build_monthly(sp, sd):
        # built by folding the daily partials — the MV hierarchy is
        # itself incrementally maintainable (never rescans the base)
        return (
            build_daily(sp, sd)
            .groupBy(
                "event_type",
                F.date_trunc("month", "obs_date").cast("date").alias("obs_month"),
            )
            .agg(F.sum("sum_v").alias("sum_v"), F.sum("cnt_v").alias("cnt_v"))
        )

    measures = {"value": ("sum_v", "cnt_v")}
    mvs = [
        MV.MaterializedView("mv_daily", ("event_type", "obs_date"), build_daily,
                            measures, approx_rows=150),
        MV.MaterializedView("mv_monthly", ("event_type", "obs_month"), build_monthly,
                            measures, approx_rows=5),
    ]

    outs = []
    for grain, dims in [
        ("day", ("event_type", "obs_date")),
        ("month", ("event_type", "obs_month")),
        ("quarter", ("event_type", "obs_quarter")),
    ]:
        ans, used = MV.answer_from_mv(spark, sf_dir, dims, "value", mvs)
        period = dims[1]
        outs.append(
            ans.select(
                F.lit(grain).alias("grain"),
                "event_type",
                F.col(period).cast("string").alias("period"),
                F.round("avg_value", _R).alias("avg_value"),
                F.col("n_events").cast("long").alias("n_events"),
                F.lit(used).alias("mv_used"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ----------------------------------- forecast baseline + evaluation


@query(
    "climatology_forecast_eval",
    oracle="""WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS d, hour(ts) AS h, value
  FROM events WHERE value IS NOT NULL
),
split AS (SELECT CAST(max(d) - INTERVAL 6 DAY AS DATE) AS test_start FROM ev),
clim AS (
  SELECT event_type, h, avg(value) AS pred
  FROM ev, split WHERE d < test_start GROUP BY 1, 2
),
test AS (SELECT ev.* FROM ev, split WHERE d >= test_start)
SELECT t.event_type,
       CAST(count(*) AS BIGINT) AS n_test,
       round(avg(abs(t.value - c.pred)), 6) AS mae,
       round(sqrt(avg((t.value - c.pred) * (t.value - c.pred))), 6) AS rmse,
       round(avg(t.value - c.pred), 6) AS bias
FROM test t JOIN clim c ON c.event_type = t.event_type AND c.h = t.h
GROUP BY 1""",
)
def climatology_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine forecast baseline + backtest: the climatology model
    (per-type hour-of-day mean over the train window) scored on the
    final 7 days with MAE / RMSE / bias — the evaluation loop the
    reference's forecast endpoint (S2) consumes from the NWS API but
    never verifies. Any fancier model must beat this table.

    Scale shape: the split date is a 1-row broadcast (relative to
    max(date) — no fixture-specific constants), the climatology is a
    (type x 24)-row aggregate broadcast back onto the test scan; the
    whole backtest is two passes over the fact with map-side partials
    and zero full-table shuffles."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.to_date("ts").alias("d"),
            F.hour("ts").alias("h"),
            "value",
        )
    )
    split = ev.agg(F.date_sub(F.max("d"), 6).alias("test_start"))
    evs = ev.crossJoin(F.broadcast(split))
    clim = (
        evs.where(F.col("d") < F.col("test_start"))
        .groupBy("event_type", "h")
        .agg(F.avg("value").alias("pred"))
    )
    test = evs.where(F.col("d") >= F.col("test_start"))
    err = F.col("value") - F.col("pred")
    return (
        test.join(F.broadcast(clim), ["event_type", "h"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.round(F.avg(F.abs(err)), _R).alias("mae"),
            F.round(F.sqrt(F.avg(err * err)), _R).alias("rmse"),
            F.round(F.avg(err), _R).alias("bias"),
        )
    )


# ------------------------------------------- market-basket analysis


@query(
    "part_association_rules",
    oracle="""WITH sized AS (
  SELECT l_orderkey, l_partkey
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 100
),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM sized),
item AS (SELECT l_partkey, count(*) AS c FROM sized GROUP BY 1),
pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_both
  FROM sized a JOIN sized b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT p.part_a, p.part_b, CAST(p.n_both AS BIGINT) AS n_both,
       round(p.n_both / n.n_orders, 6) AS support,
       round(p.n_both * 1.0 / ia.c, 6) AS conf_a_to_b,
       round(p.n_both * 1.0 / ib.c, 6) AS conf_b_to_a,
       round(p.n_both * n.n_orders / (ia.c * 1.0 * ib.c), 6) AS lift
FROM pair p
JOIN item ia ON ia.l_partkey = p.part_a
JOIN item ib ON ib.l_partkey = p.part_b
CROSS JOIN n""",
)
def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: part pairs
    co-purchased in >= 3 orders, with support, both-direction
    confidence and lift — the pairwise core of FP-growth-style
    co-occurrence mining, as one self-join.

    Scale shape: the pair explosion is bounded by BASKET SIZE, not
    corpus size — (|basket| choose 2) per order, and baskets over 100
    items are dropped up front (the standard guard: a single
    pathological mega-basket otherwise emits 10^4+ pairs on its own —
    same discipline as the stop-shingle cap in the n-gram index).
    Baskets are built ONCE (one groupBy-orderkey shuffle materializing
    sorted item arrays) and pairs are generated MAP-SIDE in array-land
    from each basket — the self-join formulation re-shuffled the item
    table three times for the same answer and measured 1.7x slower at
    K=16 (9.8 s vs 5.7 s). One more shuffle counts the pair key; item
    supports and the order count ride back as broadcasts. Lift ranks
    identically across engines because it's pure +*/ on integer counts
    — exact-rounded IEEE ops, no transcendentals."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items"))
        .where(F.size("items") <= 100)
        .localCheckpoint(eager=False)
    )
    n = baskets.agg(F.count(F.lit(1)).cast("double").alias("n_orders"))
    item = baskets.select(F.explode("items").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("c"))
    # (i, j>i) combinations generated inside the row — no self-join
    pair_expr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size("items") - 1),
            lambda i: F.transform(
                F.sequence(i + 1, F.size("items")),
                lambda j: F.struct(
                    F.element_at("items", i).alias("part_a"),
                    F.element_at("items", j).alias("part_b"),
                ),
            ),
        )
    )
    pair = (
        baskets.where(F.size("items") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= 3)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    return (
        pair.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.round(F.col("n_both") / F.col("n_orders"), _R).alias("support"),
            F.round(F.col("n_both") / F.col("ca"), _R).alias("conf_a_to_b"),
            F.round(F.col("n_both") / F.col("cb"), _R).alias("conf_b_to_a"),
            F.round(
                F.col("n_both") * F.col("n_orders") / (F.col("ca") * F.col("cb")),
                _R,
            ).alias("lift"),
        )
    )


# --------------------------------------------------- histogram operator


@query(
    "order_price_histogram",
    oracle="""WITH b AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
              FROM orders),
h AS (
  SELECT least(CAST(floor((o_totalprice - mn) / (mx - mn) * 20) AS BIGINT), 19)
           AS bucket, mn, mx
  FROM orders, b
)
SELECT bucket,
       round(mn + bucket * (mx - mn) / 20, 6) AS bucket_lo,
       round(mn + (bucket + 1) * (mx - mn) / 20, 6) AS bucket_hi,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(count(*) * 1.0 / (SELECT count(*) FROM orders), 6) AS pct
FROM h GROUP BY 1, mn, mx""",
)
def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 buckets) of order value with
    data-derived bounds — the profiling operator behind every dashboard
    distribution chart and every optimizer NDV/selectivity estimate.
    Bucketing is plain +-*/ arithmetic on a 1-row broadcast of
    (min, max): portable across engines (no width_bucket dialect
    dependency) and one map-side pass + one 20-row aggregate at any
    scale."""
    orders = load_table(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.count(F.lit(1)).alias("n_total"),
    )
    withb = orders.crossJoin(F.broadcast(b))
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 20
        ).cast("long"),
        F.lit(19).cast("long"),
    )
    return (
        withb.select(bucket.alias("bucket"), "mn", "mx", "n_total")
        .groupBy("bucket", "mn", "mx", "n_total")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket",
            F.round(F.col("mn") + F.col("bucket") * (F.col("mx") - F.col("mn")) / 20, _R)
            .alias("bucket_lo"),
            F.round(
                F.col("mn") + (F.col("bucket") + 1) * (F.col("mx") - F.col("mn")) / 20,
                _R,
            ).alias("bucket_hi"),
            "n_orders",
            F.round(F.col("n_orders") / F.col("n_total"), _R).alias("pct"),
        )
    )


# --------------------------------------------- k-core decomposition


@query(
    "trading_kcore",
    oracle="""WITH e0 AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
         's' || CAST(l_suppkey AS VARCHAR) AS b
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
ed AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
n0 AS (SELECT a AS node FROM ed GROUP BY 1 HAVING count(*) >= 5),
e1 AS (SELECT ed.a, ed.b FROM ed
       JOIN n0 x ON x.node = ed.a JOIN n0 y ON y.node = ed.b),
n1 AS (SELECT a AS node FROM e1 GROUP BY 1 HAVING count(*) >= 5),
e2 AS (SELECT e1.a, e1.b FROM e1
       JOIN n1 x ON x.node = e1.a JOIN n1 y ON y.node = e1.b),
n2 AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
       FROM e2 GROUP BY 1 HAVING count(*) >= 5)
SELECT substr(node, 1, 1) AS node_kind,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(degree) AS BIGINT) AS total_degree,
       CAST(min(degree) AS BIGINT) AS min_degree
FROM n2 GROUP BY 1""",
)
def trading_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=5, three peel rounds) of the bipartite
    customer-supplier trading graph: iteratively drop nodes with fewer
    than k distinct trading partners, keeping only the densely
    embedded core — the graph-quality filter crawl pipelines apply to
    separate hub domains from drive-by links.

    Scale shape: each peel round is one degree aggregate + one
    semi-join of the edge list against surviving nodes — shuffles
    keyed on node id, edge list checkpointed per round (the iterative
    lineage-truncation discipline of `operators/graph.py`). Rounds are
    BOUNDED (3 here; production iterates to fixpoint with the same
    per-round plan), and each round strictly shrinks the edge list, so
    cost is monotone decreasing — the peel is at worst
    O(rounds x |E|)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = e0.unionByName(
        e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)
    k = 5
    for _ in range(2):
        alive = (
            edges.groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= k)
            .select(F.col("a").alias("node"))
        )
        edges = (
            edges.join(alive.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(
                alive.select(F.col("node").alias("b")), "b", "left_semi"
            )
            .localCheckpoint(eager=False)
        )
    final = (
        edges.groupBy("a")
        .agg(F.count(F.lit(1)).alias("degree"))
        .where(F.col("degree") >= k)
    )
    return final.groupBy(F.substring("a", 1, 1).alias("node_kind")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("degree").cast("long").alias("total_degree"),
        F.min("degree").cast("long").alias("min_degree"),
    )


# --------------------------------------- seasonal-adjusted anomalies


@query(
    "climatology_anomaly_hours",
    oracle="""WITH ev AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS oh,
         hour(ts) AS h, value
  FROM events WHERE value IS NOT NULL
),
hourly AS (SELECT event_type, oh, h, avg(value) AS v
           FROM ev GROUP BY 1, 2, 3),
clim AS (SELECT event_type, h, avg(v) AS mu, stddev_samp(v) AS sigma
         FROM hourly GROUP BY 1, 2)
SELECT hr.event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(CASE WHEN abs(hr.v - c.mu) > 3 * c.sigma THEN 1 ELSE 0 END)
            AS BIGINT) AS n_anomalous,
       round(max(abs(hr.v - c.mu) / c.sigma), 6) AS max_abs_z
FROM hourly hr JOIN clim c ON c.event_type = hr.event_type AND c.h = hr.h
GROUP BY 1""",
)
def climatology_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-adjusted anomaly detection: hourly averages scored
    against their OWN hour-of-day climatology (mean/sigma per
    (type, hour-of-day)) — removing the diurnal cycle before
    thresholding, so a normal 3pm peak isn't flagged just for beating
    the 3am baseline (the flaw of the raw 3-sigma scan).

    Scale shape: one (type, hour) partial aggregate over the fact;
    the climatology is a (type x 24)-row broadcast joined back onto
    the hourly table, never the raw fact."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("oh"),
        F.hour("ts").alias("h"),
    ).agg(F.avg("value").alias("v"))
    clim = hourly.groupBy("event_type", "h").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sigma")
    )
    z = F.abs(F.col("v") - F.col("mu")) / F.col("sigma")
    return (
        hourly.join(F.broadcast(clim), ["event_type", "h"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.when(z > 3, 1).otherwise(0)).cast("long").alias("n_anomalous"),
            F.round(F.max(z), _R).alias("max_abs_z"),
        )
    )


# ------------------------------------------------- RFM segmentation


@query(
    "customer_rfm_segments",
    oracle="""WITH rfm AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY 1
),
scored AS (
  SELECT o_custkey,
         ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r,
         ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f,
         ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
  FROM rfm
)
SELECT CASE WHEN r = 1 AND f = 1 AND m = 1 THEN 'champion'
            WHEN r = 1 AND f >= 3 THEN 'new'
            WHEN r >= 3 AND f <= 2 THEN 'at_risk'
            WHEN r >= 3 THEN 'hibernating'
            ELSE 'regular' END AS segment,
       CAST(count(*) AS BIGINT) AS n_customers
FROM scored GROUP BY 1""",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — recency/frequency/monetary quartiles mapped
    to lifecycle segments (champion / new / at-risk / hibernating /
    regular), the canonical customer-analytics rollup.

    Scale shape: one aggregate to customer grain, then three quartile
    assignments. A quartile is a global rank, but NOT a global window:
    each ntile runs as ``operators.scale.distributed_ntile`` — the
    two-pass distributed rank (range partition on the sort key,
    per-partition counts, broadcast offsets) composed with the
    closed-form ntile bucket formula — so no reducer ever sees more
    than one range partition of the customer grain. Bit-identical to
    the window ntile (the oracle keeps the window form); explicit
    (key, custkey) tie-breaks keep boundary assignment
    engine-portable. Decimal money keeps quartile edges exact."""
    from ..operators.scale import distributed_ntile

    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    scored = rfm
    for out, keys in (
        ("r", [("last_order", "desc"), "o_custkey"]),
        ("f", [("frequency", "desc"), "o_custkey"]),
        ("m", [("monetary", "desc"), "o_custkey"]),
    ):
        scored = distributed_ntile(scored, keys, 4, out)
    scored = scored.select("o_custkey", "r", "f", "m")
    seg = (
        F.when((F.col("r") == 1) & (F.col("f") == 1) & (F.col("m") == 1), "champion")
        .when((F.col("r") == 1) & (F.col("f") >= 3), "new")
        .when((F.col("r") >= 3) & (F.col("f") <= 2), "at_risk")
        .when(F.col("r") >= 3, "hibernating")
        .otherwise("regular")
    )
    return scored.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# --------------------------------------------- Pareto / ABC classes


@query(
    "supplier_pareto_abc",
    oracle="""WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS revenue
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT l_suppkey, revenue,
         sum(revenue) OVER (ORDER BY revenue DESC, l_suppkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_rev,
         sum(revenue) OVER () AS tot_rev
  FROM rev
)
SELECT CASE WHEN cum_rev / tot_rev <= 0.5 THEN 'A'
            WHEN cum_rev / tot_rev <= 0.8 THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(round(sum(revenue), 2) AS DOUBLE) AS class_revenue,
       round(CAST(sum(revenue) / max(tot_rev) AS DOUBLE), 6) AS revenue_share
FROM ranked GROUP BY 1""",
)
def supplier_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification: suppliers bucketed by cumulative
    revenue share (A = first 50% of revenue, B = to 80%, C = tail) —
    the 80/20 concentration analysis behind vendor consolidation and
    hot-key detection alike.

    Scale shape: the revenue rollup is the only fact pass; the
    cumulative share runs as ``operators.scale.distributed_prefix_sum``
    over the supplier aggregate (range partition on the (revenue desc,
    suppkey) sort key, per-partition subtotals, broadcast offsets) —
    never a single-reducer ORDER-BY window, at any grain. The total
    rides along as a broadcast one-row aggregate. Decimal money
    end-to-end: cumulative boundaries are exact, so class assignment
    can't flap on summation order."""
    li = load_table(spark, sf_dir, "lineitem")
    from ..operators.scale import distributed_prefix_sum
    from .registry import dec_rev

    rev = li.groupBy("l_suppkey").agg(F.sum(dec_rev()).alias("revenue"))
    tot = rev.groupBy().agg(F.sum("revenue").alias("tot_rev"))
    ranked = (
        distributed_prefix_sum(
            rev, [("revenue", "desc"), "l_suppkey"], "revenue"
        )
        .withColumn("cum_rev", F.col("cum_before") + F.col("revenue"))
        .crossJoin(F.broadcast(tot))
        .select("l_suppkey", "revenue", "cum_rev", "tot_rev")
    )
    share = F.col("cum_rev") / F.col("tot_rev")
    cls = (
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C")
    )
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("revenue"), 2).cast("double").alias("class_revenue"),
        F.round((F.sum("revenue") / F.max("tot_rev")).cast("double"), _R).alias(
            "revenue_share"
        ),
    )


# --------------------------------------- label propagation communities


def _lpa_round(prev: str, out: str) -> str:
    return f"""cand_{out} AS (
  SELECT e.dst AS node, l.lab, count(*) AS c
  FROM ed e JOIN {prev} l ON l.node = e.src GROUP BY 1, 2
),
best_{out} AS (
  SELECT node, lab,
         row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rk
  FROM cand_{out}
),
{out} AS (
  SELECT p.node, coalesce(b.lab, p.lab) AS lab
  FROM {prev} p
  LEFT JOIN (SELECT node, lab FROM best_{out} WHERE rk = 1) b
    ON b.node = p.node
)"""


_LPA_ORACLE = (
    """WITH e0 AS (
  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
cw AS (
  SELECT least(c.c_nationkey, s.s_nationkey) AS a,
         greatest(c.c_nationkey, s.s_nationkey) AS b, count(*) AS w
  FROM e0 JOIN customer c ON ck = c_custkey JOIN supplier s ON sk = s_suppkey
  WHERE c.c_nationkey != s.s_nationkey GROUP BY 1, 2
),
thr AS (SELECT quantile_cont(w, 0.75) AS q FROM cw),
cn AS (SELECT a, b FROM cw, thr WHERE w >= q),
ed AS (SELECT a AS src, b AS dst FROM cn UNION ALL SELECT b, a FROM cn),
l0 AS (SELECT n_nationkey AS node, n_nationkey AS lab FROM nation),
"""
    + ",\n".join(_lpa_round(f"l{i}", f"l{i + 1}") for i in range(3))
    + """
SELECT l3.lab AS community_id,
       CAST(count(*) AS BIGINT) AS n_members,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS members
FROM l3 JOIN nation n ON n.n_nationkey = l3.node
GROUP BY 1"""
)


@query("trading_communities", oracle=_LPA_ORACLE)
def trading_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (3 rounds)
    over the strong-trade nation graph (edges at or above the 75th
    percentile of pair volume — a relative threshold, scale-free like
    `trading_triangles`' median cut). Each round every node adopts its
    neighbors' most frequent label (ties to the smallest label —
    fully deterministic, so the recurrence unrolls into the oracle).

    Scale shape: one fact join builds weighted nation-pair edges; each
    LPA round is one join + one (node, label) count + one rank-limit —
    all hash-partitioned on node id, label table checkpointed per
    round (the `operators/graph.py` iteration discipline). Rounds are
    bounded; per-round cost is O(|E|)."""
    nation = load_table(spark, sf_dir, "nation")
    cw = _nation_pair_edges(spark, sf_dir)
    thr = cw.agg(F.percentile("w", 0.75).alias("q"))
    cn = (
        cw.crossJoin(F.broadcast(thr))
        .where(F.col("w") >= F.col("q"))
        .select("a", "b")
    )
    ed = cn.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        cn.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = nation.select(
        F.col("n_nationkey").alias("node"), F.col("n_nationkey").alias("lab")
    )
    for _ in range(3):
        cand = (
            ed.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lab"))
        best = (
            cand.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", F.col("lab").alias("new_lab"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node", F.coalesce("new_lab", "lab").alias("lab")
            )
            .localCheckpoint(eager=False)
        )
    return (
        labels.join(
            F.broadcast(nation), labels["node"] == nation["n_nationkey"]
        )
        .groupBy(F.col("lab").alias("community_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "members"
            ),
        )
    )


# ------------------------------------------- calendar seasonality


@query(
    "shipments_by_weekday",
    oracle="""SELECT CAST(isodow(l_shipdate) AS BIGINT) AS iso_weekday,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
         AS revenue,
       round(count(*) * 7.0 / (SELECT count(*) FROM lineitem), 6)
         AS load_factor
FROM lineitem GROUP BY 1""",
)
def shipments_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar seasonality: shipment volume, revenue and relative load
    factor (share x 7 — 1.0 = a perfectly flat week) by ISO weekday.
    The day-numbering trap is the point of the exercise: Spark's
    ``dayofweek`` is 1=Sunday while DuckDB's ``dayofweek`` is 0=Sunday
    — both sides use the ISO convention (``weekday()+1`` == ``isodow``,
    1=Monday..7=Sunday) so the engines agree by construction instead
    of by locale luck."""
    li = load_table(spark, sf_dir, "lineitem")
    total = li.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        li.crossJoin(F.broadcast(total))
        .groupBy(
            (F.weekday("l_shipdate") + 1).cast("long").alias("iso_weekday"),
            "n_total",
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(e4_to_rev(F.sum(rev_e4())), 2)
            .cast("double")
            .alias("revenue"),
            F.round(
                F.count(F.lit(1)) * 7.0 / F.first("n_total"), _R
            ).alias("load_factor"),
        )
        .drop("n_total")
    )


# --------------------------------------------- Benford digit screen


@query(
    "benford_first_digit",
    oracle="""WITH d AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
)
SELECT digit,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(count(*) * 1.0 / (SELECT count(*) FROM d), 6) AS observed_freq,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_freq
FROM d GROUP BY 1""",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order values — the
    forensic data-quality test for fabricated or truncated monetary
    data (organic amounts follow log10(1+1/d); fabricated ones
    don't). Observed vs expected frequency per leading digit.

    The digit is extracted from the DECIMAL's string form, not via
    log10 arithmetic: floor(log10(x)) sits on an exact power-of-ten
    knife edge where two engines' last-ulp transcendentals could
    disagree, while decimal formatting is exact and identical. One
    scan + a 9-row aggregate; the total rides as a broadcast."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("long")
    d = orders.select(digit.alias("digit"))
    tot = d.agg(F.count(F.lit(1)).alias("n_tot"))
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy("digit", "n_tot")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "digit",
            "n_orders",
            F.round(F.col("n_orders") / F.col("n_tot"), _R).alias("observed_freq"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), _R).alias("benford_freq"),
        )
    )


# ------------------------------------------- rolling correlation


@query(
    "rolling_value_volume_corr",
    oracle="""WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS obs_date,
         avg(value) AS daily_avg, count(*) AS n_events
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
w AS (
  SELECT event_type, obs_date,
         count(*) OVER f AS n,
         sum(daily_avg) OVER f AS sx,
         sum(CAST(n_events AS DOUBLE)) OVER f AS sy,
         sum(daily_avg * daily_avg) OVER f AS sxx,
         sum(CAST(n_events AS DOUBLE) * n_events) OVER f AS syy,
         sum(daily_avg * n_events) OVER f AS sxy
  FROM daily
  WINDOW f AS (PARTITION BY event_type ORDER BY obs_date
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, obs_date,
       round(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
                  THEN (n * sxy - sx * sy)
                       / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
             END, 6) + 0.0 AS corr_7d
FROM w""",
)
def rolling_value_volume_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day correlation between level (daily average value)
    and volume (daily event count) per type — the co-movement monitor
    that flags when a metric's level starts tracking its own traffic
    (instrumentation bias) instead of the underlying signal.

    Demonstrates an ALGEBRAIC aggregate in a sliding frame, written
    out as its five running sums (count/sum/sum-of-squares/cross) and
    combined outside the window: the expansion is what makes the
    statistic distributable, it sidesteps ANSI-mode corr() raising on
    zero-variance frames (the first row of every key), and both
    engines compute the identical expression — NULL exactly when a
    frame has no variance. The only full-data pass is the daily
    pre-aggregate."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("obs_date")
    ).agg(
        F.avg("value").alias("daily_avg"), F.count(F.lit(1)).alias("n_events")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("obs_date")
        .rowsBetween(-6, Window.currentRow)
    )
    x = F.col("daily_avg")
    y = F.col("n_events").cast("double")
    sums = daily.select(
        "event_type",
        "obs_date",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(x).over(w).alias("sx"),
        F.sum(y).over(w).alias("sy"),
        F.sum(x * x).over(w).alias("sxx"),
        F.sum(y * y).over(w).alias("syy"),
        F.sum(x * y).over(w).alias("sxy"),
    )
    var_term = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    corr = F.when(
        var_term > 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / F.sqrt(var_term),
    )
    return sums.select(
        "event_type", "obs_date", F.round(corr, _R).alias("corr_7d")
    )


# --------------------------------------------- cross-table reconciliation


@query(
    "order_total_reconciliation",
    oracle="""WITH li AS (
  SELECT l_orderkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS line_total
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o.o_orderkey,
         abs(CAST(o.o_totalprice AS DECIMAL(18,2))
             - coalesce(li.line_total, 0)) AS adiff
  FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN adiff <= 0.01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reconciled,
       round(median(CAST(adiff AS DOUBLE)), 6) AS median_abs_diff,
       round(CAST(max(adiff) AS DOUBLE), 6) AS max_abs_diff
FROM j""",
)
def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation — the header-vs-detail consistency
    audit every financial ETL runs: each order's stated total against
    the sum of its line items, with the reconciled count (|diff| <= 1
    cent) and the diff distribution. On synthetic fixtures the columns
    are independently generated, so the report QUANTIFIES the expected
    divergence rather than asserting zero — which is exactly what the
    audit is for on real data too (fees, rounding and partial shipments
    all land here first).

    Scale shape: the detail side pre-aggregates to order grain (reusing
    the merge-join shuffle key), one left join header-to-detail,
    decimal-exact diffs so the cent threshold cannot flap, and the
    median runs over the per-order diff aggregate, never raw lines
    (cast to DOUBLE first: DuckDB's median returns an ELEMENT for
    decimal inputs but interpolates for doubles — Spark always
    interpolates, so the float form is the portable one)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    line = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("line_total")
    )
    j = orders.join(line, orders["o_orderkey"] == line["l_orderkey"], "left").select(
        F.abs(
            F.col("o_totalprice").cast("decimal(18,2)")
            - F.coalesce(
                F.col("line_total"), F.lit(0).cast("decimal(18,2)")
            )
        ).alias("adiff")
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("adiff") <= 0.01, 1).otherwise(0))
        .cast("long")
        .alias("n_reconciled"),
        F.round(F.median(F.col("adiff").cast("double")), _R).alias("median_abs_diff"),
        F.round(F.max("adiff").cast("double"), _R).alias("max_abs_diff"),
    )


# --------------------------------------------- in-plan OLS regression


@query(
    "ols_daily_trend",
    oracle="""WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         avg(value) AS y
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       round(regr_slope(y, datediff('day', DATE '2024-01-01', d)), 6) + 0.0
         AS slope,
       round(regr_intercept(y, datediff('day', DATE '2024-01-01', d)), 6) + 0.0
         AS intercept,
       round(regr_r2(y, datediff('day', DATE '2024-01-01', d)), 6) AS r2,
       CAST(count(*) AS BIGINT) AS n_days
FROM daily GROUP BY 1""",
)
def ols_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-plan least-squares trend fitting — slope / intercept / R^2 of
    the daily mean value per event type, the drift detector behind
    "is this metric trending?" panels (the reference eyeballs this from
    its dashboard charts; here it is a query). The oracle uses DuckDB's
    regr_* aggregates — a genuinely independent streaming-covariance
    implementation — against this side's sufficient-statistics form.

    Scale shape: OLS over n points needs only the five sufficient sums
    (n, Sx, Sy, Sxy, Sxx [, Syy for R^2]) — all algebraic aggregates
    with map-side partial merge, so the fit is ONE aggregation pass
    regardless of data size, never an iterative solver. The x values
    are centered (days since the corpus epoch, not epoch days) so the
    closed-form normal equations stay far from catastrophic
    cancellation at double precision."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.avg("value").alias("y"))
    x = F.datediff("d", F.lit("2024-01-01").cast("date")).cast("double")
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(x * F.col("y")).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.countDistinct(x).alias("dx"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    # single-x degenerate guard (one day of history): the fit is
    # undefined — NULL for all three, exactly DuckDB's regr_* semantics
    # (verified: regr_slope/intercept/r2 return NULL when x has no
    # variance). Signal is the EXACT countDistinct, vx==0 only shields
    # the ANSI division.
    undef = (F.col("dx") <= 1) | (vx == 0)
    slope = F.when(undef, F.lit(None).cast("double")).otherwise(cov / vx)
    return s.select(
        "event_type",
        F.round(slope, _R).alias("slope"),
        F.round(
            F.when(undef, F.lit(None).cast("double")).otherwise(
                (F.col("sy") - slope * F.col("sx")) / F.col("n")
            ),
            _R,
        ).alias("intercept"),
        # regr_r2 semantics: a constant dependent variable (vy = 0) is a
        # perfect fit (1.0), not 0/0 — matches DuckDB's streaming impl
        F.round(
            F.when(undef, F.lit(None).cast("double"))
            .when(vy == 0, F.lit(1.0))
            .otherwise(cov * cov / (vx * vy)),
            _R,
        ).alias("r2"),
        F.col("n").cast("long").alias("n_days"),
    )


# --------------------------------------------- independence testing


@query(
    "event_weekday_chi2",
    oracle="""WITH obs AS (
  SELECT event_type AS t, dayofweek(CAST(ts AS TIMESTAMP)) AS d,
         CAST(count(*) AS DOUBLE) AS o
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT t, d, o,
         sum(o) OVER (PARTITION BY t) AS rt,
         sum(o) OVER (PARTITION BY d) AS ct,
         sum(o) OVER () AS n
  FROM obs
)
SELECT round(sum((o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n)), 6)
         AS chi2,
       CAST((count(DISTINCT t) - 1) * (count(DISTINCT d) - 1) AS BIGINT)
         AS dof,
       round(sqrt(sum((o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n))
                  / (any_value(n)
                     * least(count(DISTINCT t) - 1,
                             count(DISTINCT d) - 1))), 6) AS cramers_v,
       CAST(any_value(n) AS BIGINT) AS n_events
FROM m""",
)
def event_weekday_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (event type x day-of-week) with
    Cramer's V effect size — the categorical-drift screen a curation
    pipeline runs to ask "did the traffic mix change by weekday?"
    before trusting a time-sliced sample. Day-of-week numbering differs
    between engines (Spark 1=Sun, DuckDB 0=Sun) but chi-square is
    invariant to category labels — both sides partition rows into the
    same 7 groups, which is all the statistic sees.

    Scale shape: the contingency table is one hash aggregate over the
    facts (R x C <= dozens of rows forever); margins ride as window
    sums over that tiny table and the statistic is a second one-row
    aggregate — the raw events are touched exactly once."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.col("event_type").alias("t"), F.dayofweek("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    m = obs.select(
        "t",
        "d",
        "o",
        F.sum("o").over(Window.partitionBy("t")).alias("rt"),
        F.sum("o").over(Window.partitionBy("d")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("rt") * F.col("ct") / F.col("n")
    dev = (F.col("o") - e) * (F.col("o") - e) / e
    chi2 = F.sum(dev)
    r1 = F.count_distinct(F.col("t")) - 1
    c1 = F.count_distinct(F.col("d")) - 1
    return m.agg(
        F.round(chi2, _R).alias("chi2"),
        (r1 * c1).cast("long").alias("dof"),
        # 1xC / Rx1 table guard (a tiny slice with one event type or
        # one weekday): V is undefined — NULL, matching DuckDB's x/0
        F.round(
            F.when(F.least(r1, c1) == 0, F.lit(None).cast("double")).otherwise(
                F.sqrt(chi2 / (F.any_value("n") * F.least(r1, c1)))
            ),
            _R,
        ).alias("cramers_v"),
        F.any_value("n").cast("long").alias("n_events"),
    )


# --------------------------------------------- frontier BFS reachability


@query(
    "supplier_reach_hops",
    oracle="""WITH e0 AS (
  SELECT o_custkey AS ck, l_suppkey AS sk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2 HAVING count(*) >= 3
),
seed AS (
  SELECT c_custkey AS ck FROM customer
  JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'NATION_7'
),
h1 AS (SELECT DISTINCT sk FROM e0 JOIN seed USING (ck)),
h2 AS (SELECT DISTINCT ck FROM e0 JOIN h1 USING (sk)
       WHERE ck NOT IN (SELECT ck FROM seed)),
h3 AS (SELECT DISTINCT sk FROM e0 JOIN h2 USING (ck)
       WHERE sk NOT IN (SELECT sk FROM h1))
SELECT 0 AS hop, 'customer' AS node_type,
       CAST((SELECT count(*) FROM seed) AS BIGINT) AS n_nodes
UNION ALL SELECT 1, 'supplier', CAST((SELECT count(*) FROM h1) AS BIGINT)
UNION ALL SELECT 2, 'customer', CAST((SELECT count(*) FROM h2) AS BIGINT)
UNION ALL SELECT 3, 'supplier', CAST((SELECT count(*) FROM h3) AS BIGINT)""",
)
def supplier_reach_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS reachability (`operators/graph.bfs_hops`) over
    the repeat-trade graph: starting from every customer of one nation,
    how many counterparties are 1, 2, 3 hops away through customer-
    supplier relationships with >= 3 line items (the threshold keeps
    "relationship" meaning repeat business, and the graph sparse)?
    Supply-chain blast-radius analysis — and the frontier-expansion
    iteration pattern (per-round work bounded by the NEW layer, min-
    distance by construction) that pagerank's dense fixed loop and
    label propagation's converge-all loop don't exercise. The oracle
    unrolls the same three levels as chained anti-joined CTEs.

    Scale shape: edge build reuses the fact-join shuffle and aggregates
    to the relationship grain; each round is |frontier| x avg-degree
    join work, a distinct, and a visited anti-join — all key-hashed,
    no driver-side data. Node ids are type-prefixed so the bipartite
    sides share one node space."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    from ..operators.graph import bfs_hops

    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 3)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    seeds = (
        customer.join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_7")),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"))
    )
    visited = bfs_hops(seeds, edges, max_hops=3)
    counts = visited.groupBy("hop").agg(F.count(F.lit(1)).alias("n"))
    # static hop spine (bipartite: even hops are customers, odd are
    # suppliers) so levels the frontier never reached report 0 instead
    # of vanishing from the result — matching the oracle's count-over-
    # empty-set semantics at every SF.
    spine = spark.createDataFrame(
        [(0, "customer"), (1, "supplier"), (2, "customer"), (3, "supplier")],
        "hop INT, node_type STRING",
    )
    return spine.join(F.broadcast(counts), "hop", "left").select(
        "hop",
        "node_type",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_nodes"),
    )


# --------------------------------------------- mix-shift decomposition


@query(
    "mix_shift_decomposition",
    oracle="""WITH j AS (
  SELECT c_mktsegment AS segment,
         CASE WHEN o_orderdate < DATE '1998-01-01' THEN 'a' ELSE 'b' END
           AS period,
         CAST(o_totalprice AS DOUBLE) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
),
g AS (
  SELECT segment,
         CAST(sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS DOUBLE) AS na,
         CAST(sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
         sum(CASE WHEN period = 'a' THEN v ELSE 0 END) AS sa,
         sum(CASE WHEN period = 'b' THEN v ELSE 0 END) AS sb
  FROM j GROUP BY 1
),
t AS (
  SELECT segment, na, nb, sa / na AS avg_a, sb / nb AS avg_b,
         na / sum(na) OVER () AS share_a,
         nb / sum(nb) OVER () AS share_b
  FROM g
)
SELECT segment,
       round(share_a, 6) AS share_a, round(share_b, 6) AS share_b,
       round(avg_a, 6) AS avg_a, round(avg_b, 6) AS avg_b,
       round(share_a * (avg_b - avg_a), 6) AS rate_effect,
       round((share_b - share_a) * avg_b, 6) AS mix_effect
FROM t""",
)
def mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-vs-rate decomposition (Oaxaca/Kitagawa shape) of the change
    in average order value between two periods, by customer segment:
    rate effect = share_a * (avg_b - avg_a) — the metric moved within
    the segment; mix effect = (share_b - share_a) * avg_b — the
    segment's weight in the portfolio moved. The two effects sum
    exactly to the overall delta, which is what makes this the honest
    answer to "did the metric drop, or did the mix shift?" — the
    drill-down every metrics review needs and naive per-segment deltas
    cannot give.

    Scale shape: one fact-fact join (orders x customer, key-hashed
    merge join at scale) feeding ONE conditional aggregate to segment
    grain; shares ride as window sums over the handful of segment rows.
    Both periods are computed in the same pass — no second scan."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_orderdate") < F.lit("1998-01-01").cast("date")).alias("in_a"),
        F.col("o_totalprice").cast("double").alias("v"),
    )
    g = j.groupBy("segment").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("double").alias("na"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).cast("double").alias("nb"),
        F.sum(F.when(F.col("in_a"), F.col("v")).otherwise(0)).alias("sa"),
        F.sum(F.when(~F.col("in_a"), F.col("v")).otherwise(0)).alias("sb"),
    )
    w = Window.partitionBy()
    t = g.select(
        "segment",
        (F.col("sa") / F.col("na")).alias("avg_a"),
        (F.col("sb") / F.col("nb")).alias("avg_b"),
        (F.col("na") / F.sum("na").over(w)).alias("share_a"),
        (F.col("nb") / F.sum("nb").over(w)).alias("share_b"),
    )
    return t.select(
        "segment",
        F.round("share_a", _R).alias("share_a"),
        F.round("share_b", _R).alias("share_b"),
        F.round("avg_a", _R).alias("avg_a"),
        F.round("avg_b", _R).alias("avg_b"),
        F.round(F.col("share_a") * (F.col("avg_b") - F.col("avg_a")), _R).alias(
            "rate_effect"
        ),
        F.round(
            (F.col("share_b") - F.col("share_a")) * F.col("avg_b"), _R
        ).alias("mix_effect"),
    )


# --------------------------------------------- survival analysis (KM)


@query(
    "conversion_survival",
    oracle="""WITH u AS (
  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t0,
         min(CASE WHEN event_type = 'purchase'
                  THEN CAST(ts AS TIMESTAMP) END) AS tp
  FROM events GROUP BY 1
),
horizon AS (SELECT max(CAST(ts AS TIMESTAMP)) AS tmax FROM events),
dur AS (
  SELECT CASE WHEN tp IS NOT NULL THEN datediff('day', t0, tp)
              ELSE datediff('day', t0, tmax) END AS t,
         (tp IS NOT NULL) AS converted
  FROM u CROSS JOIN horizon
),
g AS (
  SELECT t, CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS total
  FROM dur GROUP BY 1
),
r AS (
  SELECT t, d,
         sum(total) OVER () - coalesce(sum(total) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n,
         CASE WHEN d < sum(total) OVER () - coalesce(sum(total) OVER (
                ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              THEN ln(1 - CAST(d AS DOUBLE) / (sum(total) OVER ()
                   - coalesce(sum(total) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)))
              ELSE CAST('-infinity' AS DOUBLE) END AS logterm
  FROM g
)
SELECT t AS t_days, CAST(n AS BIGINT) AS n_at_risk, d AS n_converted,
       round(exp(sum(logterm) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
         AS survival
FROM r WHERE d > 0 ORDER BY t""",
)
def conversion_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion: survival curve of "user has not
    yet purchased" by days since first activity, with users who never
    purchase right-censored at the corpus horizon — the censoring-aware
    answer to "how long until users convert?" that a naive average of
    observed conversion times gets wrong (it silently drops the users
    who never converted). The product-limit estimator is computed as
    exp(cumsum(ln(1 - d/n))) — the associative-prefix factorization of
    a running product, same discipline as the EWMA query; the d = n
    exhaustion step maps to -infinity and survival 0 in both engines.

    Scale shape: one aggregate to user grain (the only corpus-sized
    shuffle), the horizon rides as a one-row broadcast, and the KM
    table itself is |distinct durations| rows — the unpartitioned
    cumulative windows run on dozens of rows forever."""
    ev = load_table(spark, sf_dir, "events")
    # the horizon (global max ts) is derived from the user-grain
    # aggregate's per-user max — the corpus is scanned ONCE, and the
    # user table feeds both the durations and the one-row horizon
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
        F.max("ts").alias("tl"),
    ).localCheckpoint(eager=False)
    horizon = u.agg(F.max("tl").alias("tmax"))
    dur = u.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("tp").isNotNull(), F.datediff(F.to_date("tp"), F.to_date("t0"))
        )
        .otherwise(F.datediff(F.to_date("tmax"), F.to_date("t0")))
        .alias("t"),
        F.col("tp").isNotNull().alias("converted"),
    )
    g = dur.groupBy("t").agg(
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    n = F.sum("total").over(w_all) - F.coalesce(
        F.sum("total").over(w_prev), F.lit(0)
    )
    logterm = F.when(
        F.col("d") < n, F.log(1 - F.col("d").cast("double") / n)
    ).otherwise(F.lit(float("-inf")))
    r = g.select("t", "d", n.alias("n"), logterm.alias("logterm"))
    return (
        r.select(
            F.col("t").alias("t_days"),
            F.col("n").cast("long").alias("n_at_risk"),
            F.col("d").alias("n_converted"),
            F.round(F.exp(F.sum("logterm").over(w_cum)), _R).alias("survival"),
        )
        .where(F.col("n_converted") > 0)
        .orderBy("t_days")
    )


# --------------------------------------------- Markov transition matrix


@query(
    "event_transition_matrix",
    oracle="""WITH seq AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS nxt
  FROM events
),
c AS (
  SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT cur, nxt, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur), 6) AS p
FROM c""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next event type | current event type) — the behavioral
    fingerprint behind "what do users do after an error?" and the
    input to next-step prediction and anomaly scoring (a session whose
    transitions are improbable under the matrix is an outlier). The
    deterministic (ts, event_id) ordering pins lead() across engines.

    Scale shape: ONE shuffle by user (the lead window), then the
    transition aggregate collapses to |types|^2 rows, over which the
    row-normalizing window sums are free. The per-user window never
    sees another user's rows — no skew beyond the busiest single
    user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    c = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return c.select(
        "cur",
        "nxt",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(Window.partitionBy("cur")),
            _R,
        ).alias("p"),
    )


# --------------------------------------------- A/B two-proportion test


@query(
    "ab_conversion_ztest",
    oracle="""WITH u AS (
  SELECT user_id,
         (strpos('0123456789abcdef',
                 substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2 = 0
           AS in_a,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS DOUBLE) AS na,
         CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
         CAST(sum(CASE WHEN in_a THEN conv ELSE 0 END) AS DOUBLE) AS ca,
         CAST(sum(CASE WHEN NOT in_a THEN conv ELSE 0 END) AS DOUBLE) AS cb
  FROM u
),
se AS (
  SELECT *, sqrt(((ca + cb) / (na + nb)) * (1 - (ca + cb) / (na + nb))
                 * (1 / na + 1 / nb)) AS s
  FROM g
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(ca / na, 6) AS conv_rate_a,
       round(cb / nb, 6) AS conv_rate_b,
       round(cb / nb - ca / na, 6) AS lift,
       round(CASE WHEN s > 0 THEN (cb / nb - ca / na) / s ELSE 0 END, 6)
         AS z_score,
       CASE WHEN s > 0 THEN abs((cb / nb - ca / na) / s) > 1.959964
            ELSE FALSE END AS significant
FROM se""",
)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on user conversion between two variants —
    the read-out of every A/B experimentation platform. Variant
    assignment is the repo's deterministic no-rand() discipline: md5
    parity of the user id (retry-safe, engine-portable), conversion is
    "user has >= 1 purchase", and the pooled-variance z statistic plus
    the alpha = 0.05 verdict are computed in-plan. On the synthetic
    fixture the split is null by construction, so the expected verdict
    is NOT significant — which is itself the regression check (a
    hash-split that ever turns 'significant' on uniform data signals a
    broken splitter or a p-hacked threshold).

    Scale shape: one aggregate to user grain (the only corpus-sized
    shuffle — assignment is a hash expression, not a join against an
    assignment table), then a single-row scalar reduction; the test
    statistic itself is O(1) arithmetic on four sums."""
    ev = load_table(spark, sf_dir, "events")
    in_a = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("int") % 2 == 0
    )
    u = ev.groupBy("user_id", in_a.alias("in_a")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        )
    )
    g = u.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("double").alias("na"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).cast("double").alias("nb"),
        F.sum(F.when(F.col("in_a"), F.col("conv")).otherwise(0))
        .cast("double")
        .alias("ca"),
        F.sum(F.when(~F.col("in_a"), F.col("conv")).otherwise(0))
        .cast("double")
        .alias("cb"),
    )
    # one-empty-variant guard (tiny slice where every user hashes to
    # the same arm): rates/SE are undefined — NULL, matching DuckDB's
    # x/0; the z CASE below then falls to its 0.0 branch on both sides
    null_d = F.lit(None).cast("double")
    pa = F.when(F.col("na") == 0, null_d).otherwise(F.col("ca") / F.col("na"))
    pb = F.when(F.col("nb") == 0, null_d).otherwise(F.col("cb") / F.col("nb"))
    pool = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    se = F.when((F.col("na") == 0) | (F.col("nb") == 0), null_d).otherwise(
        F.sqrt(pool * (1 - pool) * (1 / F.col("na") + 1 / F.col("nb")))
    )
    # degenerate pooled variance (0% or 100% conversion overall) carries
    # no information: define z = 0 / not-significant rather than letting
    # ANSI mode throw on the zero divisor
    z = F.when(se > 0, (pb - pa) / se).otherwise(F.lit(0.0))
    return g.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(pa, _R).alias("conv_rate_a"),
        F.round(pb, _R).alias("conv_rate_b"),
        F.round(pb - pa, _R).alias("lift"),
        F.round(z, _R).alias("z_score"),
        (F.abs(z) > 1.959964).alias("significant"),
    )


# ----------------------------------------------- resampling inference

# Half-sample bootstrap membership: bit r of a 32-bit mask derived from
# the first 8 hex chars of md5(o_orderkey) — engine-portable (md5 is the
# shared deterministic hash), each replicate an independent ~half-sample.
_BOOT_REPS = 32


def _boot_bit_sql(r: int) -> str:
    return (
        f"((strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)),"
        f" {r // 4 + 1}, 1)) - 1) >> {r % 4}) & 1"
    )


def _boot_oracle() -> str:
    sums = ",\n       ".join(
        f"sum(CASE WHEN {_boot_bit_sql(r)} = 1 THEN o_totalprice END) AS s{r},"
        f" count(CASE WHEN {_boot_bit_sql(r)} = 1 THEN 1 END) AS c{r}"
        for r in range(_BOOT_REPS)
    )
    means = ", ".join(f"s{r} / c{r}" for r in range(_BOOT_REPS))
    n = _BOOT_REPS
    lo_i, lo_w = int(0.025 * (n - 1)), 0.025 * (n - 1) - int(0.025 * (n - 1))
    hi_i, hi_w = int(0.975 * (n - 1)), 0.975 * (n - 1) - int(0.975 * (n - 1))
    return f"""WITH agg AS (
  SELECT avg(o_totalprice) AS point_avg,
       {sums}
  FROM orders
),
ms AS (SELECT point_avg, list_sort([{means}]) AS m FROM agg)
SELECT round(point_avg, 6) AS point_avg,
       CAST({n} AS INT) AS n_reps,
       round(m[{lo_i + 1}] + {lo_w} * (m[{lo_i + 2}] - m[{lo_i + 1}]), 6)
         AS ci_lo,
       round(m[{hi_i + 1}] + {hi_w} * (m[{hi_i + 2}] - m[{hi_i + 1}]), 6)
         AS ci_hi
FROM ms"""


@query("half_sample_bootstrap_ci", oracle=_boot_oracle())
def half_sample_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resampling-based uncertainty for the mean order value: 32
    half-sample bootstrap replicates, each membership decided by one
    bit of a 32-bit md5-derived mask per order (deterministic,
    engine-portable, retry-safe — no rand()), with the 95% interval
    read off the sorted replicate means by linear interpolation.

    The scale discipline is the whole point: the naive bootstrap
    explodes each row into its replicates (32x the fact scan). Here all
    32 replicate (sum, count) pairs fold into ONE conditional aggregate
    pass — 64 map-side-combined expressions over a single scan; the
    interpolation then runs on a one-row, 32-value array. At 100 TB the
    cost is one read of orders, identical to computing the plain mean."""
    orders = load_table(spark, sf_dir, "orders")

    def bit(r: int):
        nibble = F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), r // 4 + 1, 1),
            16,
            10,
        ).cast("int")
        return (F.shiftright(nibble, r % 4) % 2) == 1

    aggs = [F.avg("o_totalprice").alias("point_avg")]
    for r in range(_BOOT_REPS):
        aggs.append(F.sum(F.when(bit(r), F.col("o_totalprice"))).alias(f"s{r}"))
        aggs.append(F.count(F.when(bit(r), F.lit(1))).alias(f"c{r}"))
    one = orders.agg(*aggs)
    means = F.array_sort(
        F.array(*[F.col(f"s{r}") / F.col(f"c{r}") for r in range(_BOOT_REPS)])
    )
    n = _BOOT_REPS
    lo_i, lo_w = int(0.025 * (n - 1)), 0.025 * (n - 1) - int(0.025 * (n - 1))
    hi_i, hi_w = int(0.975 * (n - 1)), 0.975 * (n - 1) - int(0.975 * (n - 1))
    m = means
    lo = F.element_at(m, lo_i + 1) + F.lit(lo_w) * (
        F.element_at(m, lo_i + 2) - F.element_at(m, lo_i + 1)
    )
    hi = F.element_at(m, hi_i + 1) + F.lit(hi_w) * (
        F.element_at(m, hi_i + 2) - F.element_at(m, hi_i + 1)
    )
    return one.select(
        F.round("point_avg", _R).alias("point_avg"),
        F.lit(n).cast("int").alias("n_reps"),
        F.round(lo, _R).alias("ci_lo"),
        F.round(hi, _R).alias("ci_hi"),
    )


# ----------------------------------------------- time-series bars / TWAP


@query(
    "daily_ohlc_bars",
    oracle="""SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS obs_date,
       round(min_by(value, ts), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(max_by(value, ts), 6) AS close,
       CAST(count(value) AS BIGINT) AS n_obs
FROM events WHERE value IS NOT NULL
GROUP BY 1, 2""",
)
def daily_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar aggregation — the candlestick downsampling every
    market-data / IoT store ships: per (series, day), the first value
    by time (open), extremes (high/low), last value by time (close)
    and the observation count. Open/close are argmin/argmax aggregates
    (``min_by``/``max_by`` on the timestamp), NOT window row_numbers —
    one map-side-combinable aggregate pass, no per-row rank shuffle.

    Determinism note: events carry unique timestamps per (type, ts) in
    the fixture; were ties possible, the tie-break would need a
    secondary key inside the min_by struct (the engine-portable
    argmin discipline used by ``status_priority_profile``)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("obs_date")
    ).agg(
        F.round(F.expr("min_by(value, ts)"), _R).alias("open"),
        F.round(F.max("value"), _R).alias("high"),
        F.round(F.min("value"), _R).alias("low"),
        F.round(F.expr("max_by(value, ts)"), _R).alias("close"),
        F.count("value").cast("long").alias("n_obs"),
    )


@query(
    "daily_twap",
    oracle="""WITH obs AS (
  SELECT event_type, ts, value,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
         lead(ts) OVER (PARTITION BY event_type,
                                     CAST(date_trunc('day', ts) AS TIMESTAMP)
                        ORDER BY ts, event_id) AS nxt
  FROM events WHERE value IS NOT NULL
),
weighted AS (
  SELECT event_type, d,
         value,
         CAST(epoch(coalesce(nxt, d + INTERVAL 1 DAY)) - epoch(ts) AS DOUBLE)
           AS dur
  FROM obs
)
SELECT event_type, d AS obs_date,
       round(sum(value * dur) / sum(dur), 6) AS twap,
       round(avg(value), 6) AS plain_avg,
       CAST(count(*) AS BIGINT) AS n_obs
FROM weighted GROUP BY 1, 2""",
)
def daily_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) per (series, day) for IRREGULARLY
    sampled observations — each value holds until the next observation
    (or midnight for the day's last), and the average weights by that
    holding duration, so a burst of readings in one minute no longer
    dominates the day the way the plain mean (reported alongside, for
    the bias comparison) lets it.

    Plan shape: one lead() window per (series, day) partition — the
    same keyed-window discipline as the sessionization family, state
    bounded per partition, never a global ordering; then one
    map-side-combinable weighted aggregate."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = F.date_trunc("day", "ts")
    obs = ev.select(
        "event_type",
        "ts",
        "value",
        "event_id",
        d.alias("d"),
    ).withColumn("nxt", F.lead("ts").over(
        Window.partitionBy("event_type", "d").orderBy("ts", "event_id")
    ))
    dur = (
        F.unix_micros(F.coalesce(F.col("nxt"), F.col("d") + F.expr("INTERVAL 1 DAY")))
        - F.unix_micros(F.col("ts"))
    ).cast("double") / 1e6
    weighted = obs.withColumn("dur", dur)
    return weighted.groupBy(
        "event_type", F.col("d").alias("obs_date")
    ).agg(
        F.round(F.sum(F.col("value") * F.col("dur")) / F.sum("dur"), _R).alias(
            "twap"
        ),
        F.round(F.avg("value"), _R).alias("plain_avg"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )


@query(
    "benford_digit_audit",
    oracle="""WITH digits AS (
  SELECT CAST(floor(o_totalprice
               / power(10, floor(log10(o_totalprice)))) AS INT) AS digit
  FROM orders WHERE o_totalprice > 0
),
n AS (SELECT count(*) AS total FROM digits)
SELECT digit,
       CAST(count(*) AS BIGINT) AS n_values,
       round(count(*) * 1.0 / any_value(n.total), 6) AS observed_share,
       round(log10(1 + 1.0 / digit), 6) AS benford_share,
       round(abs(count(*) * 1.0 / any_value(n.total)
                 - log10(1 + 1.0 / digit)), 6) AS abs_deviation
FROM digits CROSS JOIN n
GROUP BY digit""",
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit — the data-forensics screen for
    fabricated or synthetically generated monetary columns: the first
    significant digit of naturally occurring amounts follows
    log10(1 + 1/d), and per-digit deviation from that curve is the
    classic fraud/synthetic-data flag (TPC-H's uniform price generator
    deviates hard, which is exactly what the report shows). The digit
    is extracted NUMERICALLY (x / 10^floor(log10 x)) — never via
    double->string formatting, which differs between engines.

    Plan shape: one scan, one 9-group aggregate, the total riding as a
    one-row broadcast — the cheapest possible forensic pass at any
    scale."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(10, F.floor(F.log10("o_totalprice")))
    ).cast("int")
    digits = orders.select(digit.alias("digit"))
    n = digits.agg(F.count(F.lit(1)).alias("total"))
    benford = F.log10(1 + 1.0 / F.col("digit"))
    obs = F.count(F.lit(1)) / F.first("total")
    return (
        digits.crossJoin(F.broadcast(n))
        .groupBy("digit")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.round(obs, _R).alias("observed_share"),
            F.round(benford, _R).alias("benford_share"),
            F.round(F.abs(obs - benford), _R).alias("abs_deviation"),
        )
    )


@query(
    "event_id_islands",
    oracle="""WITH ranked AS (
  SELECT event_id,
         event_id - row_number() OVER (ORDER BY event_id) AS grp
  FROM events
),
islands AS (
  SELECT grp, min(event_id) AS island_start, max(event_id) AS island_end,
         count(*) AS island_len
  FROM ranked GROUP BY grp
)
SELECT CAST(count(*) AS BIGINT) AS n_islands,
       CAST(max(island_len) AS BIGINT) AS longest_island,
       CAST(min(island_start) AS BIGINT) AS first_id,
       CAST(max(island_end) AS BIGINT) AS last_id,
       CAST(max(island_end) - min(island_start) + 1 - sum(island_len)
            AS BIGINT) AS n_missing
FROM islands""",
)
def event_id_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over the event id sequence — the classic
    contiguity audit (did the ingest drop ranges?): consecutive ids
    share ``id - rank``, so islands fall out of one groupBy on that
    difference; the report counts islands, the longest contiguous run,
    and the total missing ids between the observed bounds.

    The global rank is the trap: ``row_number() OVER (ORDER BY ...)``
    is a single-reducer window. Here it comes from
    ``distributed_prefix_sum`` over a ones column (two-pass,
    deterministic order-preserving bins — a pure function of the
    data), identical to the window form the oracle keeps — the same
    discipline as sequence packing, reused for an audit instead of a
    layout."""
    from ..operators.scale import distributed_prefix_sum

    ev = load_table(spark, sf_dir, "events").select("event_id")
    ones = ev.withColumn("__one", F.lit(1).cast("long"))
    ranked = distributed_prefix_sum(
        ones, "event_id", "__one", out_col="rank0"
    ).select(
        "event_id", (F.col("event_id") - (F.col("rank0") + 1)).alias("grp")
    )
    islands = ranked.groupBy("grp").agg(
        F.min("event_id").alias("island_start"),
        F.max("event_id").alias("island_end"),
        F.count(F.lit(1)).alias("island_len"),
    )
    return islands.agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max("island_len").cast("long").alias("longest_island"),
        F.min("island_start").cast("long").alias("first_id"),
        F.max("island_end").cast("long").alias("last_id"),
        (
            F.max("island_end") - F.min("island_start") + 1 - F.sum("island_len")
        ).cast("long").alias("n_missing"),
    )


# ------------------------------------------------ multi-touch attribution


@query(
    "linear_attribution",
    oracle="""WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
t AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events WHERE event_type IN ('view', 'click')
),
j AS (
  SELECT p.event_id, p.value, t.event_type
  FROM p JOIN t
    ON t.user_id = p.user_id
   AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY
),
n AS (SELECT event_id, CAST(count(*) AS BIGINT) AS n_t FROM j GROUP BY 1),
credited AS (
  SELECT j.event_type AS channel, j.value / n.n_t AS credit, j.event_id
  FROM j JOIN n ON j.event_id = n.event_id
)
SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_purchases,
       round(sum(credit), 6) AS credited_value
FROM credited GROUP BY 1
UNION ALL
SELECT 'direct', CAST(0 AS BIGINT), CAST(count(*) AS BIGINT),
       round(coalesce(sum(value), 0.0), 6)
FROM p WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.event_id = p.event_id)""",
)
def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch linear revenue attribution: every purchase's value
    is split equally across the user's view/click touchpoints in the
    preceding 7 days; untouched purchases land in a 'direct' bucket —
    the channel-credit table a marketing/behavior pipeline derives
    from the same event stream the funnel queries read (complements
    `session_funnel`'s conversion counts and `asof_last_purchase`'s
    last-touch shape with the fractional-credit model).

    Scale shape: the touch join is an equi-join ON user_id with a
    7-day range predicate — per-user fan bounded by a user's touch
    rate x the window, never cross-user; per-purchase touch counts are
    one groupBy on the join output joined back by purchase id (same
    key — AQE coalesces the exchange); the anti-join finds direct
    purchases without a second scan shape. No windows, no driver
    state."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("event_id", "user_id", "ts", "value")
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    j = (
        p.join(
            t,
            (F.col("t_user") == F.col("user_id"))
            & (F.col("t_ts") < F.col("ts"))
            & (F.col("t_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
        )
        .select("event_id", "value", "channel")
        # r11: the range join feeds the touch counts, the credit join
        # AND the direct anti-join — materialize it once instead of
        # re-running the join under three plan branches
        .localCheckpoint()
    )
    # r12 (guide §2.3, found by the sf1 spot bench going 14x at 10x
    # data): aggregate the touch stream to (event_id, channel) grain
    # FIRST — the per-channel credit sum is then
    # sum(c_ec * value/n_t) over ~|events| rows instead of summing
    # value/n_t per TOUCH row, which re-shuffled and re-sorted the
    # whole checkpointed touch stream through a second event_id
    # exchange. Touch credits within one (event, channel) group are
    # identical doubles, so the grouped multiply replaces c equal-value
    # adds (sub-ulp reordering, inside the 1e-6 output rounding and
    # the same class as the engine-vs-oracle summation differences);
    # exact-output parity vs the touch-grain plan is pinned in
    # tests/test_r12_pq_paths.py::test_linear_attribution_grouped_credit_parity.
    g = j.groupBy("event_id", "channel").agg(
        F.count(F.lit(1)).cast("long").alias("c_ec"),
        F.first("value").alias("value"),
    )
    n = g.groupBy("event_id").agg(F.sum("c_ec").cast("long").alias("n_t"))
    per_channel = (
        g.join(n, "event_id")
        .groupBy("channel")
        .agg(
            F.sum("c_ec").cast("long").alias("n_touches"),
            F.countDistinct("event_id").cast("long").alias("n_purchases"),
            F.round(
                F.sum(
                    F.col("c_ec") * (F.col("value") / F.col("n_t"))
                ),
                _R,
            ).alias("credited_value"),
        )
    )
    direct = (
        p.join(n, "event_id", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), _R).alias(
                "credited_value"
            ),
        )
        .select(
            F.lit("direct").alias("channel"),
            F.lit(0).cast("long").alias("n_touches"),
            "n_purchases",
            "credited_value",
        )
    )
    return per_channel.unionByName(direct)


# ------------------------------------------------ sequential path mining


@query(
    "event_trigram_paths",
    oracle="""WITH e AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
paths AS (
  SELECT event_type || ' > ' || t2 || ' > ' || t3 AS path
  FROM e
  WHERE event_type IS NOT NULL AND t2 IS NOT NULL AND t3 IS NOT NULL
),
counted AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences
  FROM paths GROUP BY 1
)
SELECT path, n_occurrences,
       CAST(row_number() OVER (ORDER BY n_occurrences DESC, path)
            AS BIGINT) AS rank
FROM counted QUALIFY rank <= 20""",
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step behavioral paths (event-type trigrams per
    user, ordered by time) — the sequential-pattern extension of
    `event_transition_matrix`'s bigram Markov counts: which WHOLE
    journeys (view > click > purchase vs view > error > view) dominate
    the stream, the input to funnel redesign and to next-event LMs.

    Scale shape: the lead() windows are PARTITIONED per user (state
    bounded by one user's history — never a global sort), trigram
    counting is one map-side-combined groupBy on the path string, and
    the top-20 cut is a TakeOrderedAndProject on the counted frame
    with a (count, path) tie-break so the cut is engine-portable.
    Ordering ties on ts are broken by event_id (the oracle casts its
    nanosecond ts to the same microsecond grain Spark reads)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # all three legs null-guarded: Spark's concat_ws SKIPS nulls while
    # the oracle's || PROPAGATES them, so an unguarded NULL leading
    # type would diverge between engines
    e = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(
        F.col("event_type").isNotNull()
        & F.col("t2").isNotNull()
        & F.col("t3").isNotNull()
    )
    counted = e.select(
        F.concat_ws(" > ", "event_type", "t2", "t3").alias("path")
    ).groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    wr = Window.orderBy(F.desc("n_occurrences"), F.asc("path"))
    return (
        counted.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= 20)
    )


# ------------------------------------------------ growth accounting


@query(
    "growth_accounting_weekly",
    oracle="""WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS wk
  FROM events
),
firsts AS (SELECT user_id, min(wk) AS first_wk FROM uw GROUP BY 1),
weeks AS (SELECT DISTINCT wk FROM uw),
states AS (
  SELECT a.wk, a.user_id,
         CASE WHEN f.first_wk = a.wk THEN 'new'
              WHEN p.user_id IS NOT NULL THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM uw a
  JOIN firsts f ON f.user_id = a.user_id
  LEFT JOIN uw p ON p.user_id = a.user_id
              AND p.wk = a.wk - INTERVAL 7 DAY
),
churned AS (
  SELECT p.wk + INTERVAL 7 DAY AS wk, count(*) AS n_churned
  FROM uw p
  LEFT JOIN uw n ON n.user_id = p.user_id
              AND n.wk = p.wk + INTERVAL 7 DAY
  WHERE n.user_id IS NULL
    AND p.wk + INTERVAL 7 DAY <= (SELECT max(wk) FROM weeks)
  GROUP BY 1
),
counts AS (
  SELECT wk,
         CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
         CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resurrected,
         CAST(count(*) AS BIGINT) AS n_active
  FROM states GROUP BY 1
)
SELECT CAST(counts.wk AS DATE) AS week_start, n_new, n_retained, n_resurrected,
       CAST(coalesce(churned.n_churned, 0) AS BIGINT) AS n_churned,
       n_active,
       round((n_retained + n_resurrected) * 1.0
             / greatest(n_retained + n_resurrected
                        + coalesce(churned.n_churned, 0), 1), 6)
         AS quick_ratio_denomfree
FROM counts LEFT JOIN churned ON counts.wk = churned.wk""",
)
def growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting over the event stream — every active
    user classified as NEW (first-ever week), RETAINED (also active
    the prior week) or RESURRECTED (active before, absent last week),
    plus the users CHURNED out of each week — the standard
    new/retained/resurrected/churned ledger (and a save-ratio column)
    that `retention_cohorts`' triangle summarizes by cohort age.

    Scale shape: one distinct to the (user, week) activity grain, then
    every classification is a user-keyed equi-join of that grain with
    itself shifted one week (first weeks are a user-keyed min) — no
    windows, no week-over-week loop, each state from ONE join. The
    churn anti-join is capped at the last observed week so the final
    week doesn't mint phantom churners."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.to_date("ts")).cast("date").alias("wk")
    ).distinct()
    firsts = uw.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    prev = uw.select(F.col("user_id").alias("p_user"), F.col("wk").alias("p_wk"))
    states = (
        uw.join(firsts, "user_id")
        .join(
            prev,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_wk") == F.date_sub(F.col("wk"), 7)),
            "left",
        )
        .select(
            "wk",
            F.when(F.col("first_wk") == F.col("wk"), F.lit("new"))
            .when(F.col("p_user").isNotNull(), F.lit("retained"))
            .otherwise(F.lit("resurrected"))
            .alias("state"),
        )
    )
    max_wk = uw.agg(F.max("wk").alias("max_wk"))
    nxt = uw.select(F.col("user_id").alias("n_user"), F.col("wk").alias("n_wk"))
    churned = (
        uw.join(
            nxt,
            (F.col("n_user") == F.col("user_id"))
            & (F.col("n_wk") == F.date_add(F.col("wk"), 7)),
            "left_anti",
        )
        .crossJoin(F.broadcast(max_wk))
        .where(F.date_add(F.col("wk"), 7) <= F.col("max_wk"))
        .groupBy(F.date_add(F.col("wk"), 7).alias("wk"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    counts = states.groupBy("wk").agg(
        F.sum((F.col("state") == "new").cast("long")).cast("long").alias("n_new"),
        F.sum((F.col("state") == "retained").cast("long")).cast("long").alias("n_retained"),
        F.sum((F.col("state") == "resurrected").cast("long"))
        .cast("long")
        .alias("n_resurrected"),
        F.count(F.lit(1)).cast("long").alias("n_active"),
    )
    save_num = F.col("n_retained") + F.col("n_resurrected")
    save_den = F.greatest(
        save_num + F.coalesce(F.col("n_churned"), F.lit(0)), F.lit(1)
    )
    return counts.join(churned, "wk", "left").select(
        F.col("wk").alias("week_start"),
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce(F.col("n_churned"), F.lit(0)).cast("long").alias("n_churned"),
        "n_active",
        F.round(save_num * 1.0 / save_den, _R).alias("quick_ratio_denomfree"),
    )
