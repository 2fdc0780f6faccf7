"""Scale-technique queries: salting and bucketing, oracle-checked.

Each query produces results identical to its naive form (the DuckDB
oracle IS the naive form) — the point is that the physical plan
distributes the same answer skew-proof / shuffle-free. A plan-shape
test (tests/test_scale.py) asserts the physical properties the
fixtures are too small to show in wall-clock.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import bloom as BL
from ..operators import scale as SC
from ..sources.catalog import load_table, load_tables
from .registry import query

_R = 6


@query(
    "salted_event_stats",
    oracle="""SELECT event_type,
       round(sum(value), 6) AS total_value,
       CAST(count(value) AS BIGINT) AS n_values,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1""",
)
def salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregate: event_type is a 5-value key (the hot-key
    shape), so the salted two-phase plan spreads each key over 32
    reducers before the final tiny combine. Oracle is the plain
    groupBy — identical results by construction."""
    ev = load_table(spark, sf_dir, "events")
    out = SC.salted_sum_avg(
        ev, key_cols=["event_type"], value_col="value", salt_src="event_id"
    )
    return out.select(
        "event_type",
        F.round("total_value", _R).alias("total_value"),
        "n_values",
        F.round("avg_value", _R).alias("avg_value"),
    )


@query(
    "salted_nation_join",
    oracle="""SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1""",
)
def salted_nation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof join: customers concentrate on few nations (the
    hot-dimension-key shape); the nation side is replicated per salt so
    no reducer sees a whole nation. Oracle is the plain join. (At this
    dim size broadcast wins — the query exists to prove the salted plan
    is semantics-preserving for when the build side can't broadcast.)"""
    t = load_tables(spark, sf_dir, "customer", "nation")
    c = t["customer"].select(
        F.col("c_nationkey").alias("nationkey"), "c_acctbal", "c_custkey"
    )
    n = t["nation"].select(F.col("n_nationkey").alias("nationkey"), "n_name")
    joined = SC.salted_join(c, n, key="nationkey", salt_src="c_custkey", n_salts=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_acctbal"),
    )


@query(
    "bucketed_orders_revenue",
    oracle="""SELECT o.o_orderstatus,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
         AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1""",
)
def bucketed_orders_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketing: orders and lineitem are written
    bucketed+sorted on the order key, then joined — with broadcast
    disabled the plan is a SortMergeJoin with NO shuffle exchange on
    either side (asserted by tests/test_scale.py). This is the layout
    decision that turns every repeated fact-fact join at 100 TB from
    two full shuffles into zero."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    loc = tempfile.mkdtemp(prefix="bucketdb_")
    db = f"bucketdemo_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    SC.write_bucketed(
        t["orders"].select("o_orderkey", "o_orderstatus"),
        f"{db}.orders_b",
        "o_orderkey",
        n_buckets=8,
    )
    SC.write_bucketed(
        t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount"),
        f"{db}.lineitem_b",
        "l_orderkey",
        n_buckets=8,
    )
    o = spark.table(f"{db}.orders_b")
    l = spark.table(f"{db}.lineitem_b")
    joined = l.join(o, l.l_orderkey == o.o_orderkey)
    # decimal end-to-end: the per-status sum is ~1e9, where double
    # summation-order noise exceeds any fixed rounding; exact decimal
    # accumulation is order-independent (rounded in decimal, then cast)
    from .registry import e4_to_rev, rev_e4

    return joined.groupBy("o_orderstatus").agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.round(e4_to_rev(F.sum(rev_e4())), 2).cast("double").alias("revenue"),
    )


@query(
    "binned_price_band_join",
    oracle="""WITH bands AS (
  SELECT CAST(i AS BIGINT) AS band_id,
         900.0 + CAST(i AS DOUBLE) * 5.0 AS lo,
         900.0 + CAST(i AS DOUBLE) * 5.0 + 5.0 AS hi
  FROM generate_series(0, 39) AS t(i)
)
SELECT band_id, CAST(count(*) AS BIGINT) AS part_count,
       round(avg(p_retailprice), 6) AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band_id""",
)
def binned_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale form of the range join (vs ``price_band_join``'s
    broadcast nested-loop, which requires one side to fit in memory):
    operators.scale.binned_range_join discretizes prices and bands to
    width-5 bins, hash-joins on the bin, and applies exact containment
    as a residual — the same result through a shuffle-partitionable
    equi-join that survives when BOTH sides are fact-sized (e.g. events
    against a billion validity intervals)."""
    (part,) = [load_table(spark, sf_dir, "part")]
    bands = spark.range(0, 40).select(
        F.col("id").alias("band_id"),
        (900.0 + F.col("id").cast("double") * 5.0).alias("lo"),
        (900.0 + F.col("id").cast("double") * 5.0 + 5.0).alias("hi"),
    )
    joined = SC.binned_range_join(
        part, bands, "p_retailprice", "lo", "hi", bin_width=5.0
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("part_count"),
        F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
    )


@query(
    "zorder_events_roundtrip",
    oracle="""SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS total_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS nd_users
FROM events WHERE value IS NOT NULL GROUP BY 1""",
)
def zorder_events_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) re-clustering as a maintenance op: rewrite
    events clustered on the interleaved (user_id, value) key, then
    aggregate the clustered copy.

    A linear MergeTree-style ORDER BY (the reference's only layout
    dimension, clickhouse_etl.py DDL) skips on one column; the Morton
    layout gives every output file a tight min-max box in BOTH
    dimensions — tests/test_zorder_layout.py measures ~7/8 of files
    skippable for either single-dimension predicate from real parquet
    footer stats. The oracle checks the rewrite is content-preserving
    (same rows, nothing dropped or duplicated by the range shuffle)."""
    from ..operators.layout import cluster_by_zorder

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    out = tempfile.mkdtemp(prefix="zorder_") + "/events"
    cluster_by_zorder(
        ev.select("user_id", "value", "event_type"),
        "user_id",
        "value",
        out,
        n_files=16,
    )
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), _R).alias("total_value"),
        F.count_distinct("user_id").alias("nd_users"),
    )


# ------------------------------------------------------ spatial grid join


def _hex4_duck(expr: str) -> str:
    """DuckDB int value of the first 4 hex digits of md5(expr)."""
    digit = "(strpos('0123456789abcdef', substr(md5({e}), {i}, 1)) - 1)"
    terms = " + ".join(
        f"{16 ** (4 - i)} * {digit.format(e=expr, i=i)}" if i < 4 else digit.format(e=expr, i=i)
        for i in range(1, 5)
    )
    return f"({terms})"


_STATION_GEO_CTE = f"""st AS (
  SELECT sid,
         ({_hex4_duck("'lat' || sid")} % 1200) / 10.0 - 60.0 AS lat,
         ({_hex4_duck("'lon' || sid")} % 3600) / 10.0 - 180.0 AS lon
  FROM (SELECT DISTINCT 'S' || CAST(user_id AS VARCHAR) AS sid FROM events)
)"""

_HAVERSINE_DUCK = """2 * 6371.0088 * asin(sqrt(
  pow(sin(radians(b.lat - a.lat) / 2), 2)
  + cos(radians(a.lat)) * cos(radians(b.lat))
    * pow(sin(radians(b.lon - a.lon) / 2), 2)))"""


@query(
    "stations_within_500km",
    oracle=f"""WITH {_STATION_GEO_CTE}
SELECT a.sid AS sid_a, b.sid AS sid_b,
       round({_HAVERSINE_DUCK}, 6) AS dist_km
FROM st a JOIN st b ON a.sid < b.sid
WHERE {_HAVERSINE_DUCK} <= 500""",
)
def stations_within_500km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial distance self-join via GRID BUCKETING: station pairs
    within 500 km by haversine. The oracle is the naive all-pairs
    filter; the Spark plan never goes quadratic — each station lands in
    a 10-degree grid cell, the left side fans out to its 9-cell
    neighborhood (dateline-wrapped longitude cells), candidates meet by
    equi-join on cell, and exact haversine verifies. Cell size is
    chosen so the neighborhood provably covers the radius (10 deg of
    longitude at the extreme |lat| = 60 is 556 km > 500), making the
    bucketed join EXACTLY equal to all-pairs — same
    candidates-then-verify discipline as the LSH and binned-band
    joins, applied to geodesic space. Coordinates are synthesized
    deterministically from the station id hash (the fixture universe
    has no coordinate columns; the reference's stations carry lat/lon
    via the GeoJSON geometry, nws_api_fetcher_v2.py:54-64)."""
    ev = load_table(spark, sf_dir, "events")
    hex4 = lambda e: F.conv(F.substring(F.md5(e), 1, 4), 16, 10).cast("int")  # noqa: E731
    st = (
        ev.select(F.concat(F.lit("S"), F.col("user_id").cast("string")).alias("sid"))
        .distinct()
        .select(
            "sid",
            ((hex4(F.concat(F.lit("lat"), F.col("sid"))) % 1200) / 10.0 - 60.0).alias("lat"),
            ((hex4(F.concat(F.lit("lon"), F.col("sid"))) % 3600) / 10.0 - 180.0).alias("lon"),
        )
        .withColumn("cell_lat", F.floor(F.col("lat") / 10).cast("int"))
        .withColumn(
            "cell_lon",
            (F.floor(F.col("lon") / 10).cast("int") + 36) % 36,
        )
        .localCheckpoint()
    )
    # left side fans out to its 3x3 neighborhood; right side keeps its
    # single home cell — each qualifying pair meets exactly once
    neigh = st.select(
        F.col("sid").alias("sid_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dla -> "
                "transform(sequence(-1, 1), dlo -> "
                "struct(cell_lat + dla AS cl, pmod(cell_lon + dlo, 36) AS co))))"
            )
        ).alias("nc"),
    ).select("sid_a", "lat_a", "lon_a", F.col("nc.cl").alias("cell_lat"), F.col("nc.co").alias("cell_lon"))
    b = st.select(
        F.col("sid").alias("sid_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "cell_lat",
        "cell_lon",
    )
    dist = (
        F.lit(2 * 6371.0088)
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat_b") - F.col("lat_a")) / 2), 2)
                + F.cos(F.radians("lat_a"))
                * F.cos(F.radians("lat_b"))
                * F.pow(F.sin(F.radians(F.col("lon_b") - F.col("lon_a")) / 2), 2)
            )
        )
    )
    return (
        neigh.join(b, ["cell_lat", "cell_lon"])
        .where(F.col("sid_a") < F.col("sid_b"))
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= 500)
        .select("sid_a", "sid_b", F.round("dist_km", _R).alias("dist_km"))
    )


@query(
    "order_value_frontier",
    oracle="""WITH pts AS (
  SELECT DISTINCT o_totalprice AS price, CAST(o_orderdate AS TIMESTAMP) AS od
  FROM orders
),
s AS (
  SELECT price, od,
         max(od) OVER (ORDER BY price DESC, od DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM pts
)
SELECT price, CAST(od AS DATE) AS frontier_date
FROM s WHERE prev_max IS NULL OR od > prev_max""",
)
def order_value_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier of orders trading off value against
    recency: the orders no other order beats on BOTH total price and
    date. `operators/scale.skyline_2d` runs the sort-sweep with a
    distributed prefix max (range partition -> local running max ->
    broadcast partition maxima) — never the naive translation's
    single-reducer global window. The oracle IS that naive
    one-window sweep, so the check proves the distributed sweep exact."""
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.col("o_totalprice").alias("price"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("double")
        .alias("epoch_day"),
    )
    sky = SC.skyline_2d(pts, "price", "epoch_day")
    return sky.select(
        "price",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("epoch_day").cast("int")).alias(
            "frontier_date"
        ),
    )


_HAVERSINE_PS = """2 * 6371.0088 * asin(sqrt(
  pow(sin(radians(s.lat - p.plat) / 2), 2)
  + cos(radians(p.plat)) * cos(radians(s.lat))
    * pow(sin(radians(s.lon - p.plon) / 2), 2)))"""


@query(
    "idw_station_interpolation",
    oracle=f"""WITH {_STATION_GEO_CTE},
sv AS (
  SELECT st.sid, st.lat, st.lon, avg(e.value) AS v
  FROM st JOIN events e ON 'S' || CAST(e.user_id AS VARCHAR) = st.sid
  WHERE e.value IS NOT NULL
  GROUP BY 1, 2, 3
),
probes AS (
  SELECT CAST(i AS BIGINT) AS probe_id,
         CAST(-57 + (i * 97) % 115 AS DOUBLE) AS plat,
         CAST(-177 + (i * 211) % 355 AS DOUBLE) AS plon
  FROM range(20) t(i)
),
d AS (
  SELECT p.probe_id, p.plat, p.plon, s.v,
         {_HAVERSINE_PS} AS dist_km,
         row_number() OVER (PARTITION BY p.probe_id
                            ORDER BY {_HAVERSINE_PS}, s.sid) AS rk
  FROM probes p CROSS JOIN sv s
)
SELECT probe_id, plat, plon,
       CAST(count(*) AS BIGINT) AS n_stations,
       round(sum(v / (dist_km * dist_km + 1.0))
             / sum(1.0 / (dist_km * dist_km + 1.0)), 6) AS idw_value,
       round(min(dist_km), 6) AS nearest_km
FROM d WHERE rk <= 5
GROUP BY 1, 2, 3""",
)
def idw_station_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-distance-weighted spatial interpolation — the weather
    product the reference's station observations feed but never
    compute: the estimated field value at arbitrary probe points from
    the k=5 nearest stations, weighted 1/(d^2+1).

    Scale shape: the probe set is bounded (a forecast grid, not a
    fact table), so probes ride as ONE broadcast against a single
    station-means aggregate — cost is |probes| x |stations| map-side
    work with a rank-limit per probe, no shuffle of the fact beyond
    the per-station mean. For probe grids too large to broadcast, the
    same query flips to the grid-cell bucketing of
    `stations_within_500km` (probes and stations meet on cells)."""
    ev = load_table(spark, sf_dir, "events")
    hex4 = lambda e: F.conv(F.substring(F.md5(e), 1, 4), 16, 10).cast("int")  # noqa: E731
    st = (
        ev.select(F.concat(F.lit("S"), F.col("user_id").cast("string")).alias("sid"))
        .distinct()
        .select(
            "sid",
            ((hex4(F.concat(F.lit("lat"), F.col("sid"))) % 1200) / 10.0 - 60.0).alias(
                "lat"
            ),
            ((hex4(F.concat(F.lit("lon"), F.col("sid"))) % 3600) / 10.0 - 180.0).alias(
                "lon"
            ),
        )
    )
    sv = (
        ev.where(F.col("value").isNotNull())
        .select(
            F.concat(F.lit("S"), F.col("user_id").cast("string")).alias("sid"),
            "value",
        )
        .groupBy("sid")
        .agg(F.avg("value").alias("v"))
        .join(st, "sid")
    )
    probes = spark.range(20).select(
        F.col("id").alias("probe_id"),
        (F.lit(-57) + (F.col("id") * 97) % 115).cast("double").alias("plat"),
        (F.lit(-177) + (F.col("id") * 211) % 355).cast("double").alias("plon"),
    )
    dist = (
        F.lit(2 * 6371.0088)
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat") - F.col("plat")) / 2), 2)
                + F.cos(F.radians("plat"))
                * F.cos(F.radians("lat"))
                * F.pow(F.sin(F.radians(F.col("lon") - F.col("plon")) / 2), 2)
            )
        )
    )
    scored = sv.crossJoin(F.broadcast(probes)).select(
        "probe_id", "plat", "plon", "v", "sid", dist.alias("dist_km")
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("dist_km"), F.asc("sid"))
    wgt = 1.0 / (F.col("dist_km") * F.col("dist_km") + 1.0)
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .groupBy("probe_id", "plat", "plon")
        .agg(
            F.count(F.lit(1)).alias("n_stations"),
            F.round(F.sum(F.col("v") * wgt) / F.sum(wgt), _R).alias("idw_value"),
            F.round(F.min("dist_km"), _R).alias("nearest_km"),
        )
    )


@query(
    "bloom_semijoin_pushdown",
    oracle="""SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
GROUP BY 1""",
)
def bloom_semijoin_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join: the semijoin ``orders ⋉ rich-customers``
    probes every fact row against a Bloom filter of the selective
    build side BEFORE the exact semi join weeds out the ~1% false
    positives (false negatives are impossible, so the answer is exact;
    the oracle IS the naive ``IN`` form).

    The probe is ``operators.bloom.probe_bloom_scan``: the selective
    build side aggregates into a ≤16K-row words table, and the fact
    side fetches its ``K_HASHES`` probe words through CHAINED
    BROADCAST HASH JOINS fused into the scan stage — zero fact-side
    exchanges, one 8-byte word added per row per probe. Two rejected
    spellings are documented on the operator: the explode+groupBy
    probe (costs a fact-sized exchange — the thing a runtime filter
    exists to avoid) and a dense one-row array ride (measured 14x
    slower: the join copies 128 KB into every fact row). This is the
    same physical shape Spark's
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects
    automatically, spelled as explicit relational operators so the
    pushdown composes with any source.

    Scale shape: at 100 TB the fact side never shuffles for the
    filter — the probes are broadcast lookups evaluated in the scan;
    only the ~selectivity-sized survivor set reaches the broadcast
    semi join."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    rich = t["customer"].where(F.col("c_acctbal") > 9000).select("c_custkey")
    # pin the words table once — the K probe joins otherwise each
    # rebuild the (tiny) filter aggregation
    bloom = BL.build_bloom(rich, "c_custkey").localCheckpoint(eager=False)
    tagged = BL.probe_bloom_scan(t["orders"], bloom, key_col="o_custkey")
    survivors = tagged.where(F.col("maybe_dup")).drop("maybe_dup")
    exact = survivors.join(
        F.broadcast(rich),
        survivors["o_custkey"] == rich["c_custkey"],
        "left_semi",
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )
