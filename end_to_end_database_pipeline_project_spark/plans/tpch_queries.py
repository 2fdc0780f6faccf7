"""Remaining TPC-H-shaped analytics over the star schema (SURVEY.md §2.3
generalization targets; Q1/Q3/Q4/Q5/Q10/Q14 live in relational_queries).

The fixture schema is TPC-H-lite — no partsupp table and no
commitdate/receiptdate/phone/container columns — so Q2/Q11/Q12/Q16/
Q20/Q21 are out of schema scope and the rest are adapted to the columns
that exist (Q15 projects name only — supplier has no address/phone),
preserving each query's *shape* (the join topology, the subquery class,
the aggregation pattern), which is what exercises the planner. Scale discipline matches the rest of the repo: selective
predicates pushed to scans, dimensions broadcast, fact-fact joins
merge-joined on their shuffle key, facts never broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table, load_tables
from .registry import DEC_REV_SQL, dec_rev, e4_to_rev, query, rev_e4

_R = 6


def _t(spark, sf_dir, *names):
    return [load_table(spark, sf_dir, n) for n in names]


@query(
    "forecast_revenue_change",
    oracle="""SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)
         AS revenue_increase
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate. Every predicate
    (date range, discount band, quantity cap) is scan-pushable and the
    plan is a single pass with map-side partial aggregation — the
    baseline every columnar engine must win on, and the query where
    `PushedFilters` in .explain matters most at 100 TB."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(4,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue_increase")
        )
    )


@query(
    "volume_shipping",
    oracle=f"""SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         {DEC_REV_SQL} AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year""",
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    year. The nation-pair disjunction is applied AFTER both nation hops
    so it prunes on broadcast-joined columns; supplier broadcasts
    (proper dim), lineitem-orders merge-join on orderkey."""
    t = load_tables(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    l = t["lineitem"].where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    o = t["orders"].select("o_orderkey", "o_custkey")
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    c = t["customer"].select("c_custkey", "c_nationkey")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(e4_to_rev(F.sum(rev_e4())), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "market_share",
    oracle=f"""SELECT o_year,
       round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                  AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         {DEC_REV_SQL} AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
) all_nations
GROUP BY o_year""",
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's
    ECONOMY-part order volume, per year. The widest join tree in the
    suite (7 hops) — the selective part-type filter broadcasts into the
    lineitem scan first so the merge join with orders runs on the
    reduced fact, and the share is a conditional-sum ratio in one
    aggregate pass."""
    t = load_tables(
        spark, sf_dir,
        "part", "lineitem", "supplier", "orders", "customer", "nation", "region",
    )
    p = t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")
    l = t["lineitem"].select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    o = t["orders"].where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    c = t["customer"].select("c_custkey", "c_nationkey")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = t["region"].where(F.col("r_name") == "ASIA").select("r_regionkey")
    vol = rev_e4()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                e4_to_rev(
                    F.sum(
                        F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0))
                    )
                )
                .cast("double")
                / e4_to_rev(F.sum(vol)).cast("double"),
                _R,
            ).alias("mkt_share")
        )
    )


@query(
    "product_profit_by_nation",
    oracle="""SELECT nation, o_year,
       CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%gizmo%'
) profit
GROUP BY nation, o_year""",
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp/supplycost in the fixture
    schema, so profit = discounted revenue): per supplier-nation,
    per-year profit on parts whose name matches a substring. The LIKE
    filter lands on the broadcast part dim; everything else is the
    standard fact spine."""
    t = load_tables(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation"
    )
    p = t["part"].where(F.col("p_name").like("%gizmo%")).select("p_partkey")
    l = t["lineitem"].select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    o = t["orders"].select("o_orderkey", "o_orderdate")
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    n = t["nation"].select("n_nationkey", F.col("n_name").alias("nation"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            # decimal END-TO-END, rounded BEFORE the double cast: the
            # scale-4 decimal sum can end exactly on a half-cent, where
            # the engines' double-rounding paths disagree; decimal
            # round(2) is exact HALF_UP on both, and the rounded value
            # converts to double identically.
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("sum_profit")
        )
    )


@query(
    "customer_order_distribution",
    oracle="""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count""",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the order-count histogram, including
    zero-order customers — a left outer join with a predicate folded
    into the join condition (NOT a post-filter: filtering after the
    join would drop the zero-order rows), then two stacked aggregates.
    The second groupBy's key space is tiny, so its shuffle is free."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    c = t["customer"].select("c_custkey")
    o = t["orders"].where(F.col("o_orderpriority") != "1-URGENT").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "small_quantity_revenue",
    oracle="""SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                        AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in below-half-average-quantity
    line items of one brand. The correlated scalar subquery
    (per-part average quantity) decorrelates to a window average over
    the part key: the brand filter broadcasts into the lineitem scan
    first, so the window state only ever holds one brand's parts —
    at 100 TB that's the difference between a bounded and an unbounded
    shuffle."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    p = t["part"].where(F.col("p_brand") == "Brand#1").select("p_partkey")
    l = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@query(
    "large_volume_customers",
    oracle="""SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS o_orderdate,
       round(o.o_totalprice, 6) AS o_totalprice,
       round(sum(l.l_quantity), 6) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 20""",
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-quantity orders.
    The IN-subquery is the same aggregate the outer query needs, so it
    is computed ONCE (sum qty per order), filtered, and joined back —
    not a semi-join against a recomputed aggregate. Top-20 via
    TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    qty = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty_raw"))
        .where(F.col("sum_qty_raw") > 300)
    )
    o = t["orders"].select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    c = t["customer"].select("c_custkey", "c_name")
    return (
        qty.join(o.hint("merge"), qty.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", _R).alias("o_totalprice"),
            F.round("sum_qty_raw", _R).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "disjunctive_predicate_revenue",
    oracle=f"""SELECT CAST(round(sum({DEC_REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 50)""",
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted to fixture columns): revenue under a
    three-way disjunction spanning both join sides. Catalyst extracts
    the common conjuncts (brand ∈ {1,2,3}, size ≤ 50, quantity ≤ 50)
    below the join as scan filters and evaluates the residual
    disjunction on the joined row — the pattern that separates a
    predicate-pushdown engine from a naive one."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    l = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = t["part"].select("p_partkey", "p_brand", "p_size")
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    disj = (
        ((brand == "Brand#1") & size.between(1, 15) & qty.between(1, 20))
        | ((brand == "Brand#2") & size.between(10, 30) & qty.between(10, 35))
        | ((brand == "Brand#3") & size.between(20, 50) & qty.between(20, 50))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(disj)
        .agg(
            F.round(e4_to_rev(F.sum(rev_e4())), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "dormant_high_balance_customers",
    oracle="""WITH pos AS (
  SELECT avg(c_acctbal) AS threshold FROM customer
  WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7)
)
SELECT CAST(c.c_nationkey AS INT) AS nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS totacctbal
FROM customer c, pos
WHERE c.c_nationkey IN (1, 3, 5, 7)
  AND c.c_acctbal > pos.threshold
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= DATE '1999-01-01')
GROUP BY c.c_nationkey""",
)
def dormant_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: nationkey plays the phone country
    code): wealthy-but-dormant customers — above the average positive
    balance of their cohort, with no recent orders. The scalar average
    is a one-row broadcast (crossJoin), the NOT EXISTS a left-anti join
    against the date-pruned orders scan."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    cohort = t["customer"].where(F.col("c_nationkey").isin(1, 3, 5, 7))
    threshold = cohort.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("threshold")
    )
    recent = t["orders"].where(F.col("o_orderdate") >= "1999-01-01").select("o_custkey")
    return (
        cohort.crossJoin(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("threshold"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "top_supplier_revenue",
    oracle=f"""WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum({DEC_REV_SQL}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name,
       CAST(round(r.total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)""",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the view-then-argmax pattern — per-supplier
    revenue over a 3-month shipdate window, then the supplier(s) whose
    revenue equals the maximum. The revenue 'view' is computed once
    and reused for both the argmax scalar and the final join (decimal
    exact, so the equality cannot miss on float noise); the scalar max
    rides a one-row broadcast crossJoin, never a driver round-trip,
    and the supplier dimension is broadcast onto the aggregated (tiny)
    revenue side."""
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev_e4()).alias("dec_total_e4"))
        .localCheckpoint()  # the 'view': feeds the argmax and the join
    )
    mx = revenue.agg(F.max("dec_total_e4").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("dec_total_e4") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(e4_to_rev(F.col("dec_total_e4")), 2)
            .cast("double")
            .alias("total_revenue"),
        )
    )
