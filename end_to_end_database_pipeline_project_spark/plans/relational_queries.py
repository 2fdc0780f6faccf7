"""Generalized relational surface over the star schema (SURVEY.md §2.3/2.5-2.7, M4).

The reference exercises no joins/windows/set-ops (SURVEY.md §2.3: zero
joins by design), but the driver's fixtures are a TPC-H-ish star schema,
so the engine exposes the full Spark repertoire. Scale notes per query:
dimension joins broadcast (region/nation/supplier are tiny by
construction in a star schema); fact-fact joins shuffle on their keys
with AQE skew handling; windows partition by the natural entity key so
state stays bounded per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import scalar
from ..sources.catalog import load_table, load_tables
from .registry import DEC_REV_SQL, dec_rev, e4_to_rev, query, rev_e4

_R = 6


def _t(spark, sf_dir, *names):
    return [load_table(spark, sf_dir, n) for n in names]


# ---------------------------------------------------------------- aggregates


@query(
    "pricing_summary",
    oracle="""SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
         AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                      * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)
         AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical wide hash-aggregate. One shuffle on
    a 6-value key; map-side partial aggregation collapses everything
    before the exchange, so it scales with distinct keys, not rows.

    Money aggregates run in DECIMAL end-to-end: double summation is
    order-dependent, and at ~1e9 per group one ULP exceeds even a
    2-decimal round at a boundary. The inputs are exact 2-decimal money
    values, so casting THEM to decimal (never a rounding tie — the
    stored double sits ~1e-13 from its decimal, the tie 5e-3 away) and
    multiplying/summing in decimal is exact and order-independent on
    both engines at any scale factor. Quantity sums are integer-valued
    doubles — exact under double addition — and stay as-is."""
    (li,) = _t(spark, sf_dir, "lineitem")
    # r11: the money values ride as integer-scaled longs (cents, e4,
    # e6) — one long multiply per row instead of a wider-than-18-digit
    # decimal product (see registry.rev_e4) — converted back to the
    # exact decimal value at the aggregate boundary, where the decimal
    # HALF_UP round runs on the identical exact value as before.
    epc = F.rint(F.col("l_extendedprice") * 100).cast("long")
    dc = F.rint(F.col("l_discount") * 100).cast("long")
    tc = F.rint(F.col("l_tax") * 100).cast("long")
    disc_e4 = (epc * (100 - dc)).cast("decimal(18,0)")
    charge_e6 = (epc * (100 - dc) * (100 + tc)).cast("decimal(18,0)")
    den = lambda n: F.lit(10**n).cast(f"decimal({n + 1},0)")
    # round in DECIMAL (exact HALF_UP on both engines) BEFORE the double
    # cast — a scale-4/6 sum ending on a half-cent would round
    # differently through the double path
    return (
        li.where(
            # type object, not "timestamp": immune to a session-level
            # spark.sql.timestampType=TIMESTAMP_NTZ remapping the keyword
            F.col("l_shipdate") <= F.lit("1998-09-02").cast(T.TimestampType())
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), _R).alias("sum_qty"),
            (F.sum(epc.cast("decimal(18,0)")) / den(2))
            .cast("double")
            .alias("sum_base_price"),
            F.round(F.sum(disc_e4) / den(4), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.sum(charge_e6) / den(6), 2)
            .cast("double")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), _R).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), _R).alias("avg_price"),
            F.round(F.avg("l_discount"), _R).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# -------------------------------------------------------------------- joins


@query(
    "nation_region_join",
    oracle="""SELECT r.r_name AS region_name, count(*) AS nation_count
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name""",
)
def nation_region_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension equi-join: region is 5 rows — broadcast
    explicitly so the plan is a BroadcastHashJoin with no shuffle of
    nation (and would stay so at 1000 executors)."""
    nation, region = _t(spark, sf_dir, "nation", "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.count(F.lit(1)).alias("nation_count"))
    )


@query(
    "regional_revenue",
    oracle="""SELECT r.r_name AS region_name, n.n_name AS nation_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
         AS revenue,
       count(DISTINCT o.o_orderkey) AS order_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2""",
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The star join, with aggregate pushdown below the join: lineitem
    revenue is pre-aggregated per orderkey FIRST (the same orderkey
    shuffle the fact-fact merge join needs anyway, so it's free), which
    collapses the fact by ~4x before any join, turns countDistinct into
    a plain count (one row per order), and merge-joins orders — facts
    are never broadcast (a fact side can't fit an executor at 100 TB).
    Small dimension hops (nation, region) broadcast explicitly; customer
    is left to Catalyst/AQE."""
    li, orders, customer, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    order_rev = li.groupBy("l_orderkey").agg(
        # r11: integer-cents revenue (registry.rev_e4) — same exact
        # value, one long multiply per row instead of a wide decimal
        F.sum(rev_e4()).alias("order_rev_e4")
    )
    return (
        order_rev.join(orders.hint("merge"), order_rev.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .agg(
            # decimal both levels: exact, order-independent, rounded in
            # decimal before the double cast (half-cent safety)
            F.round(e4_to_rev(F.sum("order_rev_e4")), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


@query(
    "customers_with_open_orders",
    oracle="""SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""",
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): no payload from the right side crosses
    the exchange — the build side is just the distinct key set."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    open_orders = orders.where(F.col("o_orderstatus") == "O")
    return customer.join(
        open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "customers_without_orders",
    oracle="""SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "nation_customer_supplier_balance",
    oracle="""WITH c AS (
  SELECT c_nationkey AS nationkey, count(*) AS customer_count,
         CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS customer_balance
  FROM customer GROUP BY 1
), s AS (
  SELECT s_nationkey AS nationkey, count(*) AS supplier_count,
         CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS supplier_balance
  FROM supplier GROUP BY 1
)
SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
       coalesce(customer_count, 0) AS customer_count,
       coalesce(customer_balance, 0.0) AS customer_balance,
       coalesce(supplier_count, 0) AS supplier_count,
       coalesce(supplier_balance, 0.0) AS supplier_balance
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey""",
)
def nation_customer_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two pre-aggregated sides. Aggregate-then-join:
    the join inputs are one row per nation, so the outer join is trivial
    regardless of fact-table size."""
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    dec_sum = lambda c: F.round(
        F.sum(F.col(c).cast("decimal(18,2)")), 2
    ).cast("double")
    c = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("customer_count"),
        dec_sum("c_acctbal").alias("customer_balance"),
    )
    s = supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("supplier_count"),
        dec_sum("s_acctbal").alias("supplier_balance"),
    )
    joined = c.join(s, "nationkey", "full_outer")
    return joined.select(
        "nationkey",
        F.coalesce("customer_count", F.lit(0)).alias("customer_count"),
        F.coalesce("customer_balance", F.lit(0.0)).alias("customer_balance"),
        F.coalesce("supplier_count", F.lit(0)).alias("supplier_count"),
        F.coalesce("supplier_balance", F.lit(0.0)).alias("supplier_balance"),
    )


@query(
    "late_shipment_orders",
    oracle="""SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority""",
)
def late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality — a
    left-semi join whose condition spans both sides."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    cond = (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "price_band_join",
    oracle="""WITH bands AS (
  SELECT CAST(i AS BIGINT) AS band_id,
         900.0 + CAST(i AS DOUBLE) * 20.0 AS lo,
         900.0 + CAST(i AS DOUBLE) * 20.0 + 20.0 AS hi
  FROM generate_series(0, 4) AS t(i)
)
SELECT band_id, count(*) AS part_count, round(avg(p_retailprice), 6) AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band_id""",
)
def price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: facts against a tiny derived band table. The
    band side broadcasts, so the inequality join is a broadcast
    nested-loop that never shuffles the fact side."""
    (part,) = _t(spark, sf_dir, "part")
    bands = spark.range(0, 5).select(
        F.col("id").alias("band_id"),
        (900.0 + F.col("id").cast("double") * 20.0).alias("lo"),
        (900.0 + F.col("id").cast("double") * 20.0 + 20.0).alias("hi"),
    )
    cond = (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi)
    return (
        part.join(F.broadcast(bands), cond)
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("part_count"),
            F.round(F.avg("p_retailprice"), _R).alias("avg_price"),
        )
    )


# ------------------------------------------------------------------ windows


@query(
    "top_orders_per_customer",
    oracle="""SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
) WHERE rn <= 3""",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: row_number window, orderkey tie-break for
    determinism. One shuffle on the partition key; per-group state is a
    single heap of K."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        ).where(F.col("rn") <= 3)
    )


@query(
    "order_gap_days",
    oracle="""SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS BIGINT) AS gap_days
FROM orders""",
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic: days since the customer's previous order."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("gap_days"),
    )


@query(
    "running_supplier_quantity",
    oracle="""SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_quantity) OVER (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_qty
FROM lineitem""",
)
def running_supplier_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total frame (rowsBetween): cumulative shipped quantity
    per supplier. The ordering must be TOTAL for a deterministic prefix
    sum: the fixture's (orderkey, linenumber) is not unique (118k dup
    pairs at sf0.1), so l_quantity joins the sort key — rows still tied
    after that are interchangeable for a quantity prefix sum, making
    the output order-insensitive on both engines."""
    (li,) = _t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), _R).alias("running_qty"),
    )


@query(
    "rolling_7day_avg",
    oracle="""WITH daily AS (
  SELECT CAST(ts AS DATE) AS obs_date, avg(value) AS day_avg
  FROM events WHERE value IS NOT NULL GROUP BY 1
)
SELECT obs_date,
       round(avg(day_avg) OVER (
         ORDER BY date_diff('day', DATE '1970-01-01', obs_date)
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS avg_7d
FROM daily""",
)
def rolling_7day_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rangeBetween frame: 7-day rolling mean over the daily series,
    keyed on epoch-day so the range frame is integer-valued on both
    engines. (The trailing-window serving analog of the reference's
    daily aggregates.) The unpartitioned window is safe at any scale:
    its input is the day-grain aggregate, bounded by calendar
    cardinality (~365 rows/year), not by fact rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("obs_date"))
        .agg(F.avg("value").alias("day_avg"))
    )
    w = (
        Window.orderBy(F.datediff("obs_date", F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "obs_date", F.round(F.avg("day_avg").over(w), _R).alias("avg_7d")
    )


@query(
    "user_sessionization",
    oracle="""WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, CAST(ts AS TIMESTAMP)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS events_in_session
FROM sessions GROUP BY user_id, session_id""",
)
def user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions via lag + cumulative flag —
    the batch analog of session_window (SURVEY.md §2.10 generalization).
    State per user is one running counter; scales with users, not events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.select(
        "user_id", F.sum("new_session").over(w2).cast("long").alias("session_id")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("events_in_session")
    )


@query(
    "customer_balance_deciles",
    oracle="""SELECT c_custkey, CAST(c_nationkey AS INT) AS nationkey,
       CAST(ntile(10) OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal, c_custkey) AS INT) AS decile,
       round(percent_rank() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal, c_custkey), 6)
         AS pct_rank
FROM customer""",
)
def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank windows: ntile(10) + percent_rank per nation
    cohort — the §2.5 window shapes not covered by rank/lag/frames.
    Partitioned by nation deliberately: a GLOBAL ntile is a single-
    reducer sort (the no-global-window rule); per-cohort ranking keeps
    every partition independent, and the order key includes c_custkey
    so ties can't straddle a decile boundary nondeterministically."""
    (cust,) = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.round(F.percent_rank().over(w), _R).alias("pct_rank"),
    )


@query(
    "fuzzy_nation_match",
    oracle="""SELECT a.n_name AS name_a, b.n_name AS name_b,
       CAST(levenshtein(a.n_name, b.n_name) AS INT) AS edit_distance
FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
WHERE levenshtein(a.n_name, b.n_name) <= 3""",
)
def fuzzy_nation_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy key matching by edit distance — the entity-resolution
    primitive for misspelled dimension values. Dim-sized self-join
    (broadcast, 25x25) with levenshtein <= 3; at fact scale the
    blocking step (first-letter / length band / phonetic bucket) bounds
    the candidate pairs exactly like LSH does for documents."""
    (nation,) = _t(spark, sf_dir, "nation")
    a = nation.select(
        F.col("n_nationkey").alias("key_a"), F.col("n_name").alias("name_a")
    )
    b = nation.select(
        F.col("n_nationkey").alias("key_b"), F.col("n_name").alias("name_b")
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
        .where(dist <= 3)
        .select("name_a", "name_b", dist.cast("int").alias("edit_distance"))
    )


@query(
    "hourly_gap_fill",
    oracle="""WITH hourly AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         avg(value) AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
spans AS (
  SELECT user_id, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
  FROM spans
),
joined AS (
  SELECT s.user_id, s.h, hr.v FROM spine s
  LEFT JOIN hourly hr ON hr.user_id = s.user_id AND hr.h = s.h
)
SELECT user_id, CAST(h AS TIMESTAMP) AS obs_hour,
       round(last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_filled,
       v IS NULL AS was_gap
FROM joined""",
)
def hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: per-key hour spine generation
    (sequence + explode — no driver loop) left-joined to the sparse
    hourly aggregate, gaps forward-filled (LOCF) with a per-key
    ignore-nulls window. Partitioned by key throughout — the spine, the
    join and the fill window all hash on user_id, so no global ordering
    exists anywhere (the no-global-window rule); at 100 TB long spans
    additionally split by month with boundary carry-in, like the
    prefix-sum operator."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.avg("value").alias("v"))
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    joined = spine.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").alias("obs_hour"),
        F.round(F.last("v", ignorenulls=True).over(w), _R).alias("value_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@query(
    "scd2_value_intervals",
    oracle="""WITH changes AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         lead(CAST(ts AS TIMESTAMP)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM events WHERE event_type = 'signup'
)
SELECT user_id, ts AS valid_from, valid_to,
       round(value, 6) AS value,
       valid_to IS NULL AS is_current
FROM changes""",
)
def scd2_value_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 build: a change log becomes validity intervals —
    each change opens a version at its timestamp and the next change
    for the same key closes it (open-ended = current row). One lead()
    per key partition, no self-join; the interval table is what the
    as-of join then probes. The standard dimension-history shape the
    reference's truncate-and-reload world can't express."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.round("value", _R).alias("value"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    return changes.select(
        "user_id",
        "valid_from",
        "valid_to",
        "value",
        F.col("valid_to").isNull().alias("is_current"),
    )


@query(
    "session_funnel",
    oracle="""WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS viewed,
       CAST(sum(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
       CAST(sum(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                      AND first_purchase > first_click
                THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_click,
       round(sum(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                       AND first_purchase > first_click
                 THEN 1 ELSE 0 END) * 1.0
             / nullif(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END),
                      0), 6) AS view_to_purchase_rate
FROM firsts""",
)
def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis — ordered-step conversion (view -> click ->
    purchase): a user converts a step only if the step's first event
    strictly follows the previous step's first event. One conditional-
    min aggregate per user (single shuffle, map-side combinable), then
    a one-row funnel report — the sequential-pattern query every
    event-analytics engine ships, absent from the batch-aggregate
    families covered so far."""
    ev = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    firsts = ev.groupBy("user_id").agg(
        first_of("view").alias("first_view"),
        first_of("click").alias("first_click"),
        first_of("purchase").alias("first_purchase"),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    purchased = clicked & (F.col("first_purchase") > F.col("first_click"))
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        one(viewed).alias("viewed"),
        one(clicked).alias("clicked_after_view"),
        one(purchased).alias("purchased_after_click"),
        F.round(
            one(purchased) / F.nullif(one(viewed), F.lit(0)), _R
        ).alias("view_to_purchase_rate"),
    )


@query(
    "retention_cohorts",
    oracle="""WITH cohort AS (
  SELECT user_id, date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cohort_week
  FROM events GROUP BY 1
),
activity AS (
  SELECT DISTINCT e.user_id,
         CAST(datediff('week', c.cohort_week,
                       date_trunc('week', CAST(e.ts AS TIMESTAMP))) AS INT)
           AS week_offset,
         c.cohort_week
  FROM events e JOIN cohort c ON c.user_id = e.user_id
)
SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
       CAST(count(*) AS BIGINT) AS active_users
FROM activity GROUP BY 1, 2""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the activity matrix (first-seen week x weeks-
    since) behind every retention dashboard. The per-user cohort week
    is one aggregate; the activity join is user-keyed (reusing the same
    hash partitioning Catalyst gives both sides), and the matrix is a
    distinct + count. Week arithmetic pinned to date_trunc so both
    engines bucket identically."""
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )


@query(
    "approx_quantile_bounded",
    oracle="""SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS exact_median,
       TRUE AS rank_within_bounds
FROM lineitem GROUP BY 1""",
)
def approx_quantile_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest-style sketch) made hard-checkable,
    the same pattern as the bounded HLL check: the sketch guarantees a
    RANK error (returned value sits within accuracy=1/100 rank
    fraction of the target quantile), so the query computes the approx
    median, re-ranks it exactly against the column, and asserts the
    rank fraction lands in [0.5 - eps, 0.5 + eps] as a boolean the
    oracle pins to TRUE. Sketch drift breaks the value hash. The exact
    median rides along oracle-matched. At 100 TB the sketch is the
    only viable path (constant memory, mergeable); this query is the
    certificate it stays within tolerance."""
    (li,) = _t(spark, sf_dir, "lineitem")
    eps = 1.0 / 100
    approx = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_quantity, 0.5, 100)").alias("approx_med"),
        F.expr("percentile(l_quantity, 0.5)").alias("exact_med"),
        F.count(F.lit(1)).alias("n"),
    )
    ranked = (
        li.select("l_returnflag", "l_quantity")
        .join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag", "approx_med", "exact_med", "n")
        .agg(
            F.sum(
                F.when(F.col("l_quantity") < F.col("approx_med"), 1).otherwise(0)
            ).alias("rank_lo"),
            F.sum(
                F.when(F.col("l_quantity") <= F.col("approx_med"), 1).otherwise(0)
            ).alias("rank_hi"),
        )
    )
    # the returned element occupies the tie interval [rank_lo, rank_hi]
    # among sorted values; the guarantee holds iff that interval
    # intersects the tolerance band around the target rank (a one-sided
    # count(<=v) check false-fails when the median value is heavily
    # tied, as integer-valued quantity is)
    lo_ok = F.col("rank_lo") / F.col("n") <= 0.5 + eps
    hi_ok = F.col("rank_hi") / F.col("n") >= 0.5 - eps
    return ranked.select(
        "l_returnflag",
        F.round("exact_med", _R).alias("exact_median"),
        (lo_ok & hi_ok).alias("rank_within_bounds"),
    )


@query(
    "lineitem_profile",
    oracle="""WITH stats AS (
  SELECT
    count(*) AS n,
    CAST(count(l_quantity) AS BIGINT) AS q_nonnull,
    round(min(l_quantity), 6) AS q_min, round(max(l_quantity), 6) AS q_max,
    round(avg(l_quantity), 6) AS q_avg, round(stddev(l_quantity), 6) AS q_std,
    CAST(count(l_extendedprice) AS BIGINT) AS p_nonnull,
    round(min(l_extendedprice), 6) AS p_min,
    round(max(l_extendedprice), 6) AS p_max,
    round(avg(l_extendedprice), 6) AS p_avg,
    round(stddev(l_extendedprice), 6) AS p_std,
    CAST(count(l_discount) AS BIGINT) AS d_nonnull,
    round(min(l_discount), 6) AS d_min, round(max(l_discount), 6) AS d_max,
    round(avg(l_discount), 6) AS d_avg, round(stddev(l_discount), 6) AS d_std
  FROM lineitem
)
SELECT 'l_quantity' AS col, CAST(n AS BIGINT) AS n_rows, q_nonnull AS n_nonnull,
       q_min AS min_val, q_max AS max_val, q_avg AS avg_val, q_std AS std_val
FROM stats
UNION ALL
SELECT 'l_extendedprice', CAST(n AS BIGINT), p_nonnull, p_min, p_max, p_avg, p_std
FROM stats
UNION ALL
SELECT 'l_discount', CAST(n AS BIGINT), d_nonnull, d_min, d_max, d_avg, d_std
FROM stats""",
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the data-quality gate every load runs: row
    count, non-null count, min/max/mean/stddev per numeric column, in
    ONE scan. All stats ride a single aggregate over the fact table
    (map-side partial, one exchange, one row out), then unpivot to the
    per-column report shape — never one pass per column."""
    (li,) = _t(spark, sf_dir, "lineitem")
    aggs = []
    for c, tag in [
        ("l_quantity", "q"),
        ("l_extendedprice", "p"),
        ("l_discount", "d"),
    ]:
        aggs += [
            F.count(c).alias(f"{tag}_nonnull"),
            F.round(F.min(c), _R).alias(f"{tag}_min"),
            F.round(F.max(c), _R).alias(f"{tag}_max"),
            F.round(F.avg(c), _R).alias(f"{tag}_avg"),
            F.round(F.stddev(c), _R).alias(f"{tag}_std"),
        ]
    # materialize the one-row stats before the unpivot fan-out: the
    # three union branches would otherwise each re-run the scan+agg
    # (verified: 3 FileScans without this, 0 with)
    stats = li.agg(F.count(F.lit(1)).alias("n"), *aggs).localCheckpoint()
    rows = [
        ("l_quantity", "q"),
        ("l_extendedprice", "p"),
        ("l_discount", "d"),
    ]
    parts = [
        stats.select(
            F.lit(col).alias("col"),
            F.col("n").alias("n_rows"),
            F.col(f"{t}_nonnull").alias("n_nonnull"),
            F.col(f"{t}_min").cast("double").alias("min_val"),
            F.col(f"{t}_max").cast("double").alias("max_val"),
            F.col(f"{t}_avg").alias("avg_val"),
            F.col(f"{t}_std").alias("std_val"),
        )
        for col, t in rows
    ]
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


# ----------------------------------------------------- sorts / limits / topk


@query(
    "top_orders_global",
    oracle="""SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
)
def top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K: Spark plans TakeOrderedAndProject — per-partition
    heaps then a driver merge of K, never a full sort at scale."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_custkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    ).limit(25)


# ---------------------------------------------------------------- group sets


@query(
    "rollup_returnflag_status",
    oracle="""SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
HAVING count(*) > 0""",
)
def rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (superset of the reference's manual
    hour→day→month hierarchy, computed in one pass).

    The oracle's ``HAVING count(*) > 0`` pins one engine divergence:
    standard SQL ROLLUP emits the grand-total grouping set even over an
    EMPTY table (one all-NULL row with count 0, DuckDB's behavior),
    while Spark's ``rollup`` emits no rows; the filter is the identity
    on any non-empty input."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), _R).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cube_status_priority",
    oracle="""SELECT o_orderstatus, o_orderpriority,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_price, count(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
HAVING count(*) > 0""",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets. The grand-total cell sums ALL orders (~5e9
    at sf0.1) — decimal accumulation for an order-independent sum."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "order_status_pivot",
    oracle="""SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
FROM orders GROUP BY o_orderpriority""",
)
def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: status columns per priority. Explicit value list keeps the
    output schema static (no extra distinct-scan, required for stable
    plans at scale)."""
    (orders,) = _t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce("O", F.lit(0)).alias("status_O"),
        F.coalesce("F", F.lit(0)).alias("status_F"),
        F.coalesce("P", F.lit(0)).alias("status_P"),
    )


# ------------------------------------------------------------------ set ops


@query(
    "nations_with_both",
    oracle="""SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier""",
)
def nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "nations_customers_only",
    oracle="""SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000""",
)
def nations_customers_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics, like SQL EXCEPT = Spark ``subtract``):
    customer nations lacking a high-balance (>8000) supplier."""
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supplier.where(F.col("s_acctbal") > 8000).select(
            F.col("s_nationkey").alias("nationkey")
        )
    )


@query(
    "heterogeneous_format_union",
    oracle="""WITH modern AS (
  SELECT event_id, CAST(ts AS DATE) AS obs_date, value AS temp_c,
         CAST(NULL AS DOUBLE) AS max_temp_c, CAST(NULL AS DOUBLE) AS min_temp_c,
         'nws' AS format
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
), legacy AS (
  SELECT event_id, CAST(ts AS DATE) AS obs_date, CAST(NULL AS DOUBLE) AS temp_c,
         value + 5.0 AS max_temp_c, value - 5.0 AS min_temp_c,
         'legacy_daily' AS format
  FROM events WHERE event_type IN ('signup', 'error')
), unioned AS (
  SELECT * FROM modern UNION ALL SELECT * FROM legacy
)
SELECT event_id, obs_date, format,
       round(coalesce((max_temp_c + min_temp_c) / 2, max_temp_c, min_temp_c, temp_c), 6)
         AS unified_temp_c
FROM unioned""",
)
def heterogeneous_format_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3/P3/F13: the reference's multi-format reader — two differently
    shaped branches unioned by name with missing columns null, then the
    midpoint-with-fallback chain resolves a unified measure
    (clickhouse_etl.py:103-170 re-expressed)."""
    ev = load_table(spark, sf_dir, "events")
    modern = ev.where(F.col("event_type").isin("click", "view", "purchase")).select(
        "event_id",
        F.to_date("ts").alias("obs_date"),
        F.col("value").alias("temp_c"),
        F.lit("nws").alias("format"),
    )
    legacy = ev.where(F.col("event_type").isin("signup", "error")).select(
        "event_id",
        F.to_date("ts").alias("obs_date"),
        (F.col("value") + 5.0).alias("max_temp_c"),
        (F.col("value") - 5.0).alias("min_temp_c"),
        F.lit("legacy_daily").alias("format"),
    )
    unioned = modern.unionByName(legacy, allowMissingColumns=True)
    unified = F.coalesce(
        scalar.midpoint_fallback(F.col("max_temp_c"), F.col("min_temp_c")),
        F.col("temp_c"),
    )
    return unioned.select(
        "event_id", "obs_date", "format", F.round(unified, _R).alias("unified_temp_c")
    )


# ------------------------------------------------------- distinct / approx


@query(
    "distinct_counts",
    oracle="""SELECT count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem""",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase count-distinct)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@query(
    "approx_distinct_orders",
    oracle="""SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS orders_within_5pct,
       TRUE AS parts_within_5pct
FROM lineitem""",
)
def approx_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the constant-memory
    distinct count for 100 TB — sketch merge instead of expand-shuffle.

    HLL sketch values are engine-specific, so the sketch estimate itself
    can't hash-match DuckDB; instead the query emits the exact count
    plus an in-query bounded-error assertion (|approx-exact|/exact <=
    5%, the rsd requested of the sketch).  The oracle asserts the same
    bound as a constant TRUE — a sketch drifting out of tolerance flips
    the boolean and fails the value hash, making HLL hard-checkable."""
    (li,) = _t(spark, sf_dir, "lineitem")
    out = li.agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
    )
    within = lambda a, e: (  # noqa: E731
        # empty-table guard: exact = 0 divides by zero under ANSI; a
        # zero-cardinality sketch is "within bound" iff it also says 0
        F.when(F.col(e) == 0, F.col(a) == F.col(e)).otherwise(
            F.abs(F.col(a) - F.col(e)) / F.col(e) <= F.lit(0.05)
        )
    )
    return out.select(
        "exact_orders",
        "exact_parts",
        within("approx_orders", "exact_orders").alias("orders_within_5pct"),
        within("approx_parts", "exact_parts").alias("parts_within_5pct"),
    )


@query(
    "quantity_quantiles",
    oracle="""SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
FROM lineitem GROUP BY l_returnflag""",
)
def quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles per group (percentile). The scale path
    is approx_percentile (t-digest); exact keeps the oracle meaningful."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), _R).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), _R).alias("p90_qty"),
    )


@query(
    "above_average_customers",
    oracle="""SELECT c_custkey, c_name, round(c_acctbal, 6) AS c_acctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)""",
)
def above_average_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern (TPC-H Q17 shape): global aggregate
    broadcast back against the table — one extra tiny stage, no
    re-shuffle of the fact side."""
    (customer,) = _t(spark, sf_dir, "customer")
    avg_bal = customer.agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        customer.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_name", F.round("c_acctbal", _R).alias("c_acctbal"))
    )


@query(
    "props_map_stats",
    oracle="""WITH x AS (
  SELECT unnest(json_keys(props)) AS prop_key, props FROM events
)
SELECT prop_key, CAST(count(*) AS BIGINT) AS n_values,
       round(avg(CAST(json_extract_string(props, '$.' || prop_key) AS DOUBLE)), 6)
         AS avg_value,
       round(min(CAST(json_extract_string(props, '$.' || prop_key) AS DOUBLE)), 6)
         AS min_value,
       round(max(CAST(json_extract_string(props, '$.' || prop_key) AS DOUBLE)), 6)
         AS max_value
FROM x GROUP BY 1""",
)
def props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 full-parse form: ``from_json`` into a typed map, explode to
    (key, value) rows, aggregate per key — the schema-on-read path for
    semi-structured columns (vs the single-path ``get_json_object`` of
    json_props_extract). At scale the map parse is one pass, codegen'd,
    no Python."""
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,double>")).alias(
            "prop_key", "v"
        )
    )
    return kv.groupBy("prop_key").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.round(F.avg("v"), _R).alias("avg_value"),
        F.round(F.min("v"), _R).alias("min_value"),
        F.round(F.max("v"), _R).alias("max_value"),
    )


@query(
    "shipping_priority",
    oracle=f"""SELECT l.l_orderkey,
       CAST(round(sum({DEC_REV_SQL}), 6) AS DOUBLE) AS revenue,
       CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-01-01'
  AND l.l_shipdate > DATE '1998-01-01'
GROUP BY 1, 3, 4
ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer dim broadcast into
    orders, date-disjoint predicates pushed to both fact scans, revenue
    aggregate, top-10 (TakeOrderedAndProject — no full sort). The
    selective dimension filter reaching the scan is the point at
    100 TB."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = "1998-01-01"
    c = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = t["orders"].where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )
    l = t["lineitem"].where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(e4_to_rev(F.sum(rev_e4())), _R)
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "order_priority_checking",
    oracle="""SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY 1""",
)
def order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a left-semi join whose condition spans
    both sides (shipment later than orderdate+90d) — the semi-join stops
    probing an order at its first qualifying lineitem, no duplicate
    counting and no distinct needed."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    l = t["lineitem"].select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "returned_item_report",
    oracle=f"""SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(round(sum({DEC_REV_SQL}), 2) AS DOUBLE) AS revenue,
       round(c.c_acctbal, 6) AS c_acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3, 5
ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue — returnflag
    filter pushed to the lineitem scan, nation broadcast, top-20 via
    TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    l = t["lineitem"].where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = t["orders"].select("o_orderkey", "o_custkey")
    c = t["customer"].select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    n = t["nation"].select("n_nationkey", "n_name")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(e4_to_rev(F.sum(rev_e4())), 2)
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "n_name", "revenue",
            F.round("c_acctbal", _R).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "promo_revenue_share",
    oracle=f"""SELECT round(
         100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                          THEN {DEC_REV_SQL}
                          ELSE 0 END) AS DOUBLE)
         / CAST(sum({DEC_REV_SQL}) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1998-01-01' AND l.l_shipdate < DATE '1998-04-01'""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a fact-dim join —
    the CASE rides inside the aggregate (one pass), the part dim
    broadcasts, the date filter prunes the lineitem scan."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    l = t["lineitem"].where(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01")
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = t["part"].select("p_partkey", "p_type")
    rev = rev_e4()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            # decimal sums (exact, via integer-cents rows) cast to
            # double, THEN the ratio in double — identical operands
            # give an identical quotient
            F.round(
                100.0
                * e4_to_rev(
                    F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                )
                .cast("double")
                / e4_to_rev(F.sum(rev)).cast("double"),
                _R,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "hourly_linear_interpolation",
    oracle="""WITH hourly AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         avg(value) AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
spans AS (
  SELECT user_id, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
  FROM spans
),
joined AS (
  SELECT s.user_id, s.h, hr.v FROM spine s
  LEFT JOIN hourly hr ON hr.user_id = s.user_id AND hr.h = s.h
),
b AS (
  SELECT user_id, h, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM joined
),
f AS (
  SELECT user_id, v IS NULL AS was_gap,
         CASE
           WHEN v IS NOT NULL THEN v
           WHEN pv IS NULL THEN nv
           WHEN nv IS NULL THEN pv
           ELSE pv + (nv - pv) * (epoch(h) - epoch(ph))
                               / (epoch(nh) - epoch(ph))
         END AS vi,
         CASE WHEN pv IS NOT NULL THEN pv ELSE nv END AS locf
  FROM b
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(CASE WHEN was_gap THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       round(avg(vi), 6) AS avg_interp,
       round(avg(abs(vi - locf)), 6) AS avg_abs_delta_vs_locf
FROM f GROUP BY 1""",
)
def hourly_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling by linear interpolation — the physically-meaningful
    twin of `hourly_gap_fill`'s LOCF: each missing hour is filled from
    the BRACKETING observations weighted by time distance, so a sensor
    ramping 10 -> 20 across a gap reads the ramp, not a flat 10. Edge
    gaps fall back to the one-sided nearest value. The mechanism is the
    bidirectional ignore-nulls window pair — forward last_value and
    backward first_value for both the value and its timestamp — with
    the ratio only evaluated inside the both-sides-known branch (CASE
    short-circuits the zero-width denominator of non-gap rows).

    The registered report aggregates to user grain (hours, gaps, mean
    filled value, mean |linear - LOCF|): per-cell interpolants are
    small-denominator rationals of 2-dp inputs that land EXACTLY on
    6th-decimal rounding ties, where the engines' tie policies differ —
    the aggregate sums hundreds of cells and is tie-immune, while exact
    per-cell values (12/14/16/18 across a 10->20 ramp) are pinned by
    tests/test_plan_audit.py::test_linear_interp_exact_values.

    Scale shape: identical to the LOCF query — spine, join and all four
    windows hash on user_id, no global ordering anywhere; forward and
    backward frames share one sort."""
    b = _interp_table(load_table(spark, sf_dir, "events"))
    vi = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.unix_timestamp("h") - F.unix_timestamp("ph")).cast("double")
            / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
        )
    )
    locf = F.when(F.col("pv").isNotNull(), F.col("pv")).otherwise(F.col("nv"))
    f = b.select(
        "user_id",
        F.col("v").isNull().alias("was_gap"),
        vi.alias("vi"),
        locf.alias("locf"),
    )
    return f.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum(F.when(F.col("was_gap"), 1).otherwise(0)).cast("long").alias("n_gaps"),
        F.round(F.avg("vi"), _R).alias("avg_interp"),
        F.round(F.avg(F.abs(F.col("vi") - F.col("locf"))), _R).alias(
            "avg_abs_delta_vs_locf"
        ),
    )


def _interp_table(ev: DataFrame) -> DataFrame:
    """(user_id, h, v, pv, ph, nv, nh) bracketing table shared by the
    registered aggregate report and the exact-value unit test."""
    hourly = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.avg("value").alias("v"))
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias(
                "h"
            ),
        )
    )
    joined = spine.join(hourly, ["user_id", "h"], "left")
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    vh = F.when(F.col("v").isNotNull(), F.col("h"))
    return joined.select(
        "user_id",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_fwd).alias("pv"),
        F.last(vh, ignorenulls=True).over(w_fwd).alias("ph"),
        F.first("v", ignorenulls=True).over(w_bwd).alias("nv"),
        F.first(vh, ignorenulls=True).over(w_bwd).alias("nh"),
    )
