"""Source/sink format coverage (SURVEY.md §2.1).

The reference's sources are HTTP JSON documents (GeoJSON-shaped station
lists, nested observation payloads, nws_api_fetcher_v2.py:21-119) landed
into stores by driver code; its DDL/load surface is ClickHouse SQL
(CREATE TABLE IF NOT EXISTS / INSERT / TRUNCATE-overwrite,
clickhouse_etl.py:22-296). Spark analogs, each proven by a round-trip
whose result is oracle-checked against the parquet fixtures:

- ``spark.read.json`` over nested documents + ``explode`` projection
  (S3: station-list extraction from GeoJSON features);
- CSV sink + schema'd CSV source (landing-zone interchange format);
- ``spark.sql`` DDL: CREATE TABLE USING parquet, INSERT INTO (append,
  S12), INSERT OVERWRITE (truncate-and-load, S13).

Everything writes to per-query temp dirs; at scale the same code paths
point at object-store URIs (the writers/readers are path-agnostic).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table, register_views
from .registry import query

_R = 6


@query(
    "json_source_stations",
    oracle="""SELECT DISTINCT 'S' || CAST(user_id AS VARCHAR) AS stationIdentifier
FROM events""",
)
def json_source_stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 analog: assemble a GeoJSON-shaped station document (features[]
    with nested properties), write it as JSON, read it back with
    ``spark.read.json`` (schema inferred from the documents) and project
    ``features[].properties.stationIdentifier`` via explode — the
    reference's station-list extraction (nws_api_fetcher_v2.py:54-64)
    as a real multi-line-JSON source scan."""
    tmp = tempfile.mkdtemp(prefix="json_src_")
    ev = load_table(spark, sf_dir, "events")
    stations = ev.select(
        F.concat(F.lit("S"), F.col("user_id").cast("string")).alias("sid")
    ).distinct()
    # empty-source guard on the RAW events (stations is empty iff events
    # is — the concat never nulls): a zero-feature GeoJSON round-trips
    # as an empty array whose element type can't be inferred on
    # read-back. Probing ev avoids running the distinct twice.
    if ev.limit(1).count() == 0:
        return spark.createDataFrame([], "stationIdentifier string")
    doc = stations.agg(
        F.collect_list(
            F.struct(
                F.lit("Feature").alias("type"),
                F.struct(F.col("sid").alias("stationIdentifier")).alias("properties"),
            )
        ).alias("features")
    ).select(F.lit("FeatureCollection").alias("type"), "features")
    doc.write.mode("overwrite").json(tmp)
    feats = spark.read.json(tmp)
    return feats.select(F.explode("features").alias("f")).select(
        F.col("f.properties.stationIdentifier").alias("stationIdentifier")
    )


@query(
    "csv_roundtrip_pricing",
    oracle="""SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY 1, 2""",
)
def csv_roundtrip_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + schema'd CSV source round-trip: lineitem columns out
    to headered CSV, back in with an explicit schema (CSV never infers
    in production — inference is a full extra pass), then the pricing
    aggregate. Values surviving the text round-trip bit-exactly is the
    point: Spark's CSV writer emits round-trippable doubles."""
    tmp = tempfile.mkdtemp(prefix="csv_src_")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )
    li.write.mode("overwrite").option("header", True).csv(tmp)
    back = (
        spark.read.schema(
            "l_returnflag string, l_linestatus string, "
            "l_quantity double, l_extendedprice double"
        )
        .option("header", True)
        .csv(tmp)
    )
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), _R).alias("sum_qty"),
        # decimal accumulation: the per-group price sum is ~1e9 at
        # sf0.1, where double summation-order noise exceeds round(6)
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "sql_ddl_pipeline",
    oracle="""WITH silver AS (
  SELECT CAST(user_id AS VARCHAR) AS station_id,
         CASE WHEN value > 100 THEN value - 273.15 ELSE value END AS temperature_c
  FROM events WHERE value IS NOT NULL
)
SELECT station_id, CAST(count(*) AS BIGINT) AS n_obs,
       round(avg(temperature_c), 6) AS avg_temp_c
FROM silver GROUP BY 1""",
)
def sql_ddl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/S12/S13 as Spark SQL: CREATE TABLE ... USING parquet at an
    explicit location, INSERT INTO (append), then INSERT OVERWRITE with
    the same rows (the truncate-and-load mode) — the final state must be
    exactly one copy, proving overwrite replaced the append rather than
    stacking on it. Aggregate read back via ``spark.sql``."""
    loc = tempfile.mkdtemp(prefix="ddl_tbl_")
    tbl = f"weather_obs_{uuid.uuid4().hex[:8]}"
    ev = load_table(spark, sf_dir, "events")
    silver = ev.where(F.col("value").isNotNull()).select(
        F.col("user_id").cast("string").alias("station_id"),
        F.when(F.col("value") > 100, F.col("value") - 273.15)
        .otherwise(F.col("value"))
        .alias("temperature_c"),
    )
    silver.createOrReplaceTempView(f"{tbl}_src")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"CREATE TABLE {tbl} (station_id STRING, temperature_c DOUBLE) "
        f"USING parquet LOCATION '{loc}'"
    )
    spark.sql(f"INSERT INTO {tbl} SELECT * FROM {tbl}_src")
    spark.sql(f"INSERT OVERWRITE {tbl} SELECT * FROM {tbl}_src")
    out = spark.sql(
        f"""SELECT station_id, count(*) AS n_obs,
                   round(avg(temperature_c), {_R}) AS avg_temp_c
            FROM {tbl} GROUP BY station_id"""
    )
    return out


@query(
    "sql_interface_pricing",
    oracle="""SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate <= DATE '2001-09-01'
GROUP BY 1, 2""",
)
def sql_interface_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL front door: fixture tables registered as views,
    query expressed as a SQL string via ``spark.sql`` — same Catalyst
    plan as the DataFrame form (the reference's own query medium was
    SQL strings, clickhouse_etl.py:309-334)."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus,
                  round(sum(l_quantity), 6) AS sum_qty,
                  round(avg(l_extendedprice), 6) AS avg_price,
                  count(*) AS n
           FROM lineitem
           WHERE l_shipdate <= DATE '2001-09-01'
           GROUP BY 1, 2"""
    )


@query(
    "orc_roundtrip_orders",
    oracle="""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_price
FROM orders GROUP BY 1""",
)
def orc_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source round-trip: the second columnar interchange
    format Spark ships natively (landing zones fed by Hive/Trino
    ecosystems are commonly ORC). Same scan virtues as parquet —
    column pruning and predicate pushdown reach the reader — proven by
    aggregating the round-tripped table against the parquet oracle."""
    tmp = tempfile.mkdtemp(prefix="orc_src_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    orders.write.mode("overwrite").orc(tmp)
    back = spark.read.orc(tmp)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # decimal accumulation like every money sum (the ~5e9 per-status
        # sum is exactly where double summation-order noise bites)
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


@query(
    "http_api_source_scan",
    oracle="""SELECT 'B' || CAST(user_id % 10 AS VARCHAR) AS station,
       CAST(count(*) AS BIGINT) AS n_obs,
       round(avg(value), 6) AS avg_value,
       min(ts) AS first_obs, max(ts) AS last_obs
FROM events GROUP BY 1""",
)
def http_api_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-S2 as a first-class connector: the reference's HTTP
    observation fetcher (nws_api_fetcher_v2.py:21-119) rebuilt as a
    Spark Python DataSource — `spark.read.format("weather_api")` over a
    live localhost ND-JSON API serving the events fixture.

    The fetch plan is (station x 7-day-window) input partitions, so the
    rate-limited GETs run inside executor tasks (50 concurrent windows
    here; thousands on a cluster) instead of the reference's single
    client loop. The aggregate proves the full path: socket -> JSON
    decode -> typed rows -> shuffle -> per-station stats match DuckDB
    reading the same parquet directly."""
    import os

    from ..sources.api_source import register, serve_events_api

    ev = load_table(spark, sf_dir, "events")  # also pins UTC + ships pkg
    path = os.path.join(sf_dir, "events.parquet")
    base_url, _server = serve_events_api(path, n_buckets=10)
    register(spark)
    lo, hi = ev.agg(
        F.min(F.to_date("ts")), F.max(F.to_date("ts"))
    ).first()  # O(1) row to size the backfill window, as the reference does
    if lo is None:
        # empty-history guard: no observations -> nothing to backfill;
        # return the aggregate's (empty) shape without issuing fetches
        return ev.groupBy(F.lit("B0").alias("station")).agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.avg("value"), _R).alias("avg_value"),
            F.min("ts").alias("first_obs"),
            F.max("ts").alias("last_obs"),
        )
    api = (
        spark.read.format("weather_api")
        .option("base_url", base_url)
        .option("stations", ",".join(f"B{i}" for i in range(10)))
        .option("start", lo.isoformat())
        .option("end", hi.isoformat())
        .option("chunk_days", "7")
        .option("rate_limit_s", "0.002")
        .load()
    )
    return api.groupBy("station").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.avg("value"), _R).alias("avg_value"),
        F.min("obs_ts").alias("first_obs"),
        F.max("obs_ts").alias("last_obs"),
    )


@query(
    "kv_cache_sink_roundtrip",
    oracle="""SELECT 'daily_' || strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d')
         AS key,
       CAST(1700003600 AS BIGINT) AS expires_at,
       CAST(count(value) AS BIGINT) AS n_obs,
       round(avg(value), 6) AS avg_value
FROM events WHERE value IS NOT NULL
GROUP BY 1""",
)
def kv_cache_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15 cache sink as a REAL custom connector: the daily serving
    aggregate written through the ``kv_cache`` Python DataSource writer
    (``sources/kv_sink.py`` — executor-side task files, driver-side
    manifest commit, TTL from an injectable clock), then read back via
    the manifest (the only committed view) and oracle-checked. The
    reference's redis_cache.py set-with-ttl refresh, upgraded with the
    two-phase commit protocol a distributed cache writer needs."""
    from ..sources import kv_sink

    kv_sink.register(spark)
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    serving = ev.groupBy(F.col("ts").cast("date").alias("obs_date")).agg(
        F.count("value").cast("long").alias("n_obs"),
        F.round(F.avg("value"), _R).alias("avg_value"),
    ).select(
        F.concat(F.lit("daily_"), F.date_format("obs_date", "yyyy-MM-dd")).alias(
            "cache_key"
        ),
        "n_obs",
        "avg_value",
    )
    store = tempfile.mkdtemp(prefix="kv_cache_")
    (
        serving.write.format("kv_cache")
        .option("path", store)
        .option("key", "cache_key")
        .option("ttl_seconds", 3600)
        .option("now_epoch", 1700000000)
        .mode("append")
        .save()
    )
    back = spark.read.schema(
        "key string, expires_at long, n_obs long, avg_value double"
    ).json(kv_sink.committed_files(store))
    return back.select("key", "expires_at", "n_obs", "avg_value")


@query(
    "parquet_schema_evolution",
    oracle="""WITH u AS (
  SELECT event_id, value, CAST(NULL AS INTEGER) AS quality
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT event_id, value, CAST(event_id % 5 AS INTEGER) AS quality
  FROM events WHERE event_id % 2 = 1
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(quality) AS BIGINT) AS n_with_quality,
       round(avg(quality), 6) AS avg_quality,
       round(avg(value), 6) AS avg_value
FROM u""",
)
def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across landed batches: an early batch lacks the
    ``quality`` column a later ingest added (the reference's API
    payloads gained/lost optional fields over time —
    nws_api_fetcher_v2.py's tolerant extraction). Both generations are
    read in ONE scan with ``mergeSchema``: missing columns surface as
    nulls, aggregates skip them natively. At 100 TB mergeSchema's
    footer union is driven off _metadata or the catalog schema — the
    per-file union here is the semantics being pinned."""
    tmp = tempfile.mkdtemp(prefix="evolve_")
    ev = load_table(spark, sf_dir, "events")
    ev.where(F.col("event_id") % 2 == 0).select("event_id", "value").write.parquet(
        f"{tmp}/batch=1"
    )
    ev.where(F.col("event_id") % 2 == 1).select(
        "event_id", "value", (F.col("event_id") % 5).cast("int").alias("quality")
    ).write.parquet(f"{tmp}/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{tmp}/batch=1", f"{tmp}/batch=2"
    )
    return merged.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("quality").cast("long").alias("n_with_quality"),
        F.round(F.avg("quality"), _R).alias("avg_quality"),
        F.round(F.avg("value"), _R).alias("avg_value"),
    )


@query(
    "versioned_time_travel",
    oracle="""SELECT CAST(sum(CASE WHEN o_orderkey % 13 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_common,
       CAST(sum(CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_deleted,
       round(CAST(sum(CASE WHEN o_orderkey % 13 <> 0 AND o_orderstatus = 'O'
                           THEN 10.0 ELSE 0 END) AS DOUBLE), 2) AS price_delta
FROM orders""",
)
def versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-versioned table with time travel (``sources/versioned.py``):
    v1 = the base orders snapshot; v2 = a refresh that bumps open-order
    prices and drops a slice of keys. Both versions are then read BACK
    through the manifest (v2 via the latest pointer) and diffed — the
    audit query an analyst runs to explain a metric shift between data
    versions, and the pinning a reproducible training run needs. The
    manifest-swap commit means a crashed refresh can never leave a
    half-loaded table visible — the atomicity the reference's
    TRUNCATE+INSERT refresh (clickhouse_etl.py:238-296) lacks."""
    from ..sources import versioned as V

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    store = tempfile.mkdtemp(prefix="versioned_")
    V.write_version(base, store)
    refreshed = base.where(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderstatus") == "O", F.col("o_totalprice") + 10.0
        ).otherwise(F.col("o_totalprice")),
    )
    V.write_version(refreshed, store)
    v1 = V.read_version(spark, store, 1).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p1"),
    )
    v2 = V.read_version(spark, store).select(  # latest == v2
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p2"),
    )
    j = v1.join(v2, "k", "full")
    return j.agg(
        F.sum(F.when(F.col("p2").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_common"),
        F.sum(F.when(F.col("p2").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_deleted"),
        F.round(
            F.sum(
                F.when(
                    F.col("p2").isNotNull(),
                    F.col("p2").cast("decimal(18,2)") - F.col("p1").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            ).cast("double"),
            2,
        ).alias("price_delta"),
    )


@query(
    "versioned_incremental_scan",
    oracle="""SELECT CAST(1 AS BIGINT) AS sync_step,
       CAST(1 AS BIGINT) AS from_version,
       CAST(2 AS BIGINT) AS to_version,
       CAST(count(*) AS BIGINT) AS delta_rows,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
                      0.0), 2) AS delta_revenue,
       (SELECT CAST(count(*) AS BIGINT) FROM orders
        WHERE year(o_orderdate) <= 2000) AS snapshot_rows
FROM orders WHERE year(o_orderdate) = 2000
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT),
       CAST(count(*) AS BIGINT),
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
                      0.0), 2),
       (SELECT CAST(count(*) AS BIGINT) FROM orders)
FROM orders WHERE year(o_orderdate) >= 2001""",
)
def versioned_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed sync on the versioned table
    (``sources/versioned.py``): v1 = a FULL snapshot of the order
    history (years < 2000), then each later year lands as an APPEND
    delta (v2 = 2000, v3 = 2001+) — the daily-load shape of the
    reference's warehouse refresh (clickhouse_etl.py:238-296), but
    committed as deltas instead of truncate-and-load. A downstream
    consumer then catches up one version at a time with
    ``incremental_scan``, which reads ONLY the delta directories —
    O(rows appended), never a snapshot re-scan (the Iceberg
    incremental-append-read contract; structural no-re-scan pinned by
    the ``inputFiles`` assertion in tests/test_versioned.py). Per sync
    step the ledger reports the delta (rows, exact-decimal revenue)
    and the chain-resolved row count of the target snapshot, so the
    oracle checks both the delta content AND that base + deltas
    compose to exactly the full table. At 100 TB this is the
    difference between a nightly consumer rereading the table and
    reading only the day's files; a full-snapshot rewrite in the range
    breaks lineage and fails loudly (tested) rather than returning a
    silently-wrong delta."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("cdf_orders_")
    # r12: the three data commits stage with one write job
    staged = V.stage_slices(
        orders,
        store,
        [("base", yr < 2000), ("y2000", yr == 2000), ("later", yr >= 2001)],
    )
    staged.commit("base", "full")  # v1: history, full
    staged.commit("y2000", "append")  # v2: one year's delta
    staged.commit("later", "append")  # v3: next delta

    def sync_row(step: int, frm: int, to: int) -> DataFrame:
        inc = V.incremental_scan(spark, store, from_version=frm, to_version=to)
        delta = inc.agg(
            F.count(F.lit(1)).cast("long").alias("delta_rows"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("delta_revenue"),
        )
        snap = V.read_version(spark, store, to).agg(
            F.count(F.lit(1)).cast("long").alias("snapshot_rows")
        )
        return delta.crossJoin(snap).select(
            F.lit(step).cast("long").alias("sync_step"),
            F.lit(frm).cast("long").alias("from_version"),
            F.lit(to).cast("long").alias("to_version"),
            "delta_rows",
            "delta_revenue",
            "snapshot_rows",
        )

    return sync_row(1, 1, 2).unionByName(sync_row(2, 2, 3))


@query(
    "versioned_delete_cdf",
    oracle="""WITH f AS (SELECT DISTINCT o_orderkey FROM orders
           WHERE o_custkey % 97 = 0 AND year(o_orderdate) <= 2000)
SELECT CAST(2 AS BIGINT) AS to_version, 'append' AS commit_mode,
       CAST((SELECT count(*) FROM orders WHERE year(o_orderdate) = 2000)
            AS BIGINT) AS n_inserts,
       CAST(0 AS BIGINT) AS n_deletes,
       CAST((SELECT count(*) FROM orders WHERE year(o_orderdate) <= 2000)
            AS BIGINT) AS visible_rows,
       round(coalesce(CAST((SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
                            FROM orders WHERE year(o_orderdate) <= 2000)
                           AS DOUBLE), 0.0), 2) AS visible_revenue
UNION ALL
SELECT CAST(3 AS BIGINT), 'delete',
       CAST(0 AS BIGINT),
       (SELECT CAST(count(*) AS BIGINT) FROM f),
       (SELECT CAST(count(*) AS BIGINT) FROM orders o
        WHERE year(o.o_orderdate) <= 2000
          AND NOT EXISTS (SELECT 1 FROM f WHERE f.o_orderkey = o.o_orderkey)),
       round(coalesce(CAST((SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
                            FROM orders o
                            WHERE year(o.o_orderdate) <= 2000
                              AND NOT EXISTS (SELECT 1 FROM f
                                              WHERE f.o_orderkey = o.o_orderkey))
                           AS DOUBLE), 0.0), 2)
UNION ALL
SELECT CAST(4 AS BIGINT), 'append',
       CAST((SELECT count(*) FROM orders WHERE year(o_orderdate) >= 2001)
            AS BIGINT),
       CAST(0 AS BIGINT),
       (SELECT CAST(count(*) AS BIGINT) FROM orders o
        WHERE NOT (year(o.o_orderdate) <= 2000
                   AND EXISTS (SELECT 1 FROM f
                               WHERE f.o_orderkey = o.o_orderkey))),
       round(coalesce(CAST((SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
                            FROM orders o
                            WHERE NOT (year(o.o_orderdate) <= 2000
                                       AND EXISTS (SELECT 1 FROM f
                                                   WHERE f.o_orderkey = o.o_orderkey)))
                           AS DOUBLE), 0.0), 2)""",
)
def versioned_delete_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletes + typed change-data-feed on the versioned
    table: v1 = full order history (years < 2000), v2 = the year-2000
    append, v3 = a GDPR forget-list TOMBSTONE (`delete_version`: the
    order keys of flagged customers — an O(keys) commit against the
    table, the physical rewrite deferred to the next full snapshot /
    compaction, composing with `gdpr_erasure_report`'s anti-join
    rewrite), v4 = the next year's append — including flagged
    customers' LATER orders, which stay visible because a tombstone
    hides only rows committed before it (fold order, pinned in
    tests/test_versioned.py). Per commit the ledger reports the CDF
    counts by change type (`incremental_scan` emits appends as
    ``insert`` full rows and tombstones as ``delete`` key rows,
    reading ONLY the delta files) and the chain-resolved visible
    rows/exact-decimal revenue at that version — so the oracle checks
    the typed delta stream AND that base + appends − tombstones
    compose to exactly the right table at every version. The
    reference's warehouse can only TRUNCATE+INSERT to forget
    (clickhouse_etl.py:238-296); this is the delta-log alternative
    that stays O(changes) at 100 TB."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("mor_orders_")
    # r12: the three data commits stage with one write job
    staged = V.stage_slices(
        orders,
        store,
        [("base", yr < 2000), ("y2000", yr == 2000), ("later", yr >= 2001)],
    )
    staged.commit("base", "full")  # v1: history, full
    staged.commit("y2000", "append")  # v2
    forget = orders.where((F.col("o_custkey") % 97 == 0) & (yr <= 2000)).select(
        "o_orderkey"
    )
    V.delete_version(forget, store, "o_orderkey")  # v3: tombstone commit
    staged.commit("later", "append")  # v4

    def ledger_row(to_v: int, mode: str) -> DataFrame:
        cdf = V.incremental_scan(
            spark, store, from_version=to_v - 1, to_version=to_v
        )
        counts = cdf.agg(
            F.coalesce(  # sum over an empty delta is NULL, not 0
                F.sum(F.when(F.col("_change_type") == "insert", 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_inserts"),
            F.coalesce(
                F.sum(F.when(F.col("_change_type") == "delete", 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_deletes"),
        )
        vis = V.read_version(spark, store, to_v).agg(
            F.count(F.lit(1)).cast("long").alias("visible_rows"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("visible_revenue"),
        )
        return counts.crossJoin(vis).select(
            F.lit(to_v).cast("long").alias("to_version"),
            F.lit(mode).alias("commit_mode"),
            "n_inserts",
            "n_deletes",
            "visible_rows",
            "visible_revenue",
        )

    return (
        ledger_row(2, "append")
        .unionByName(ledger_row(3, "delete"))
        .unionByName(ledger_row(4, "append"))
    )


@query(
    "versioned_pruned_compaction",
    oracle="""WITH y2000 AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                             AS DOUBLE), 0.0), 2) AS revenue
  FROM orders WHERE year(o_orderdate) = 2000
)
SELECT 'chain' AS phase, n_rows, revenue FROM y2000
UNION ALL
SELECT 'compacted', n_rows, revenue FROM y2000""",
)
def versioned_pruned_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats data skipping + compaction on the versioned
    table: the chain commits carry per-commit [min, max] of
    ``o_orderdate`` (one extra aggregate at write time), so a reader
    asking for one year's slice skips every other commit directory
    WITHOUT listing or opening a file in it — data skipping from the
    commit log, one level above parquet footer pruning (the
    Delta/Iceberg stats-in-log design; the no-open guarantee is
    pinned by inputFiles assertions in tests/test_versioned.py).
    ``compact_chain`` then squashes base + appends into a fresh full
    snapshot — ending the chain's merge-on-read debt and re-basing
    CDF lineage — and the SAME pruned read over the compacted table
    returns the identical slice: the two ledger rows (phase chain /
    compacted) must be equal, which is exactly what the oracle
    states. Pruning is a performance fact, never a correctness
    input: the BETWEEN filter is always applied to whatever is read,
    so a commit written without stats degrades to read+filter, not
    to wrong answers. At 100 TB this is what makes a
    time-sliced read of a long-history table O(slice), and
    compaction O(live rows) on a schedule."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    stats = ("o_orderdate",)
    store = scratch_artifact_dir("pruned_orders_")
    V.write_version(orders.where(yr < 2000), store, stats_cols=stats)
    V.append_version(orders.where(yr == 2000), store, stats_cols=stats)
    V.append_version(orders.where(yr >= 2001), store, stats_cols=stats)

    prune = ("o_orderdate", "2000-01-01", "2000-12-31T23:59:59.999999")

    def slice_row(phase: str) -> DataFrame:
        return (
            V.read_version(spark, store, prune=prune)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.round(
                    F.coalesce(
                        F.sum(
                            F.col("o_totalprice").cast("decimal(18,2)")
                        ).cast("double"),
                        F.lit(0.0),
                    ),
                    2,
                ).alias("revenue"),
            )
            .select(F.lit(phase).alias("phase"), "n_rows", "revenue")
        )

    chain_row = slice_row("chain").localCheckpoint(eager=True)
    V.compact_chain(spark, store, stats_cols=stats)
    return chain_row.unionByName(slice_row("compacted"))


@query(
    "versioned_exactly_once_sink",
    oracle="""SELECT CAST(count(DISTINCT year(o_orderdate)) AS BIGINT) AS n_commits,
       CAST(count(DISTINCT year(o_orderdate)) AS BIGINT)
         AS commits_after_replay,
       CAST(count(*) AS BIGINT) AS table_rows,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS revenue
FROM orders""",
)
def versioned_exactly_once_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once KEYLESS ingestion into the versioned table: each
    order-year delivery commits through
    ``streaming.versioned_sink.append_batch_versioned`` (the ONE body
    the foreachBatch streaming sink also calls —
    tests/test_versioned_streaming.py runs the real landing stream,
    restart, checkpoint-wipe and grown-landing cases), whose manifest
    batch-id watermark skips a replayed batch BEFORE any write. The
    query then REPLAYS the entire delivery history — the
    wiped-checkpoint shape — and the ledger must show zero growth:
    commits_after_replay == n_commits (== distinct years) and the
    table's rows/exact-decimal revenue equal to the source, which is
    exactly what the oracle states. This closes the at-least-once
    hole `streaming/incremental._maintain_silver_gold` documents for
    keyless fact appends: the transaction-log watermark (Delta's txn
    appId/version trick) makes the append idempotent with no MERGE
    key — at 100 TB the difference between an ingest that can be
    safely retried and one that silently double-counts."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..streaming.versioned_sink import append_batch_versioned

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("sink_orders_")
    # bounded driver-side list (a handful of years), the same allowed
    # pattern as the medallion month lists
    years = sorted(
        r["y"] for r in orders.select(yr.alias("y")).distinct().collect()
    )

    def deliver() -> None:
        for i, y in enumerate(years):
            append_batch_versioned(orders.where(yr == y), store, i)

    deliver()
    n_commits = len(V.versions(store))
    deliver()  # full replay of the delivery history: must be a no-op
    n_after = len(V.versions(store))

    zeros = spark.range(1).select(
        F.lit(0).cast("long").alias("table_rows"),
        F.lit(0.0).alias("revenue"),
    )
    body = (
        V.read_version(spark, store).agg(
            F.count(F.lit(1)).cast("long").alias("table_rows"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("revenue"),
        )
        if years
        else zeros
    )
    return body.select(
        F.lit(n_commits).cast("long").alias("n_commits"),
        F.lit(n_after).cast("long").alias("commits_after_replay"),
        "table_rows",
        "revenue",
    )


@query(
    "versioned_table_source_scan",
    oracle="""WITH f AS (SELECT DISTINCT o_orderkey FROM orders
           WHERE o_custkey % 97 = 0 AND year(o_orderdate) <= 2000),
vis AS (SELECT * FROM orders o
        WHERE NOT (year(o.o_orderdate) <= 2000
                   AND EXISTS (SELECT 1 FROM f
                               WHERE f.o_orderkey = o.o_orderkey)))
SELECT CAST(count(*) AS BIGINT) AS visible_rows,
       CAST(count(DISTINCT year(o_orderdate)) AS BIGINT) AS n_years,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS visible_revenue
FROM vis""",
)
def versioned_table_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned table consumed as a generic Spark FORMAT
    (`sources/versioned_source.py`, a Spark 4 Python DataSource —
    the same API surface as `http_api_source_scan`):
    ``spark.read.format("versioned_table")`` resolves the manifest
    chain in EXECUTORS, one input partition per committed parquet
    file, tombstones applied as per-partition key filters (bounded
    forget-lists shipped like a broadcast). The chain here is the
    `versioned_delete_cdf` history — full base, append, GDPR
    tombstone, append — and the format's latest-version scan must see
    exactly base + appends − tombstone, which the oracle states
    directly over orders. The streaming half of the same format
    (offset = committed version, Delta streaming-source semantics,
    restart-exactly-once, loud failure on mid-history rewrites,
    ignoreDeletes opt-in) is pinned by tests/test_versioned_source.py.
    The scale note lives in the module docstring: this format is the
    plug-into-any-pipeline path; heavy scans use the library calls
    that compile to native parquet reads."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..sources.versioned_source import register as register_vt

    register_vt(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("vt_source_")
    # r12: the three data commits stage with ONE write job
    # (stage_slices) and adopt in chain order — content per version is
    # identical to the sequential write/append calls this replaces
    staged = V.stage_slices(
        orders,
        store,
        [("base", yr < 2000), ("y2000", yr == 2000), ("later", yr >= 2001)],
    )
    staged.commit("base", "full")
    staged.commit("y2000", "append")
    forget = orders.where((F.col("o_custkey") % 97 == 0) & (yr <= 2000)).select(
        "o_orderkey"
    )
    V.delete_version(forget, store, "o_orderkey")
    staged.commit("later", "append")

    ddl = (
        "o_orderkey bigint, o_custkey bigint, "
        "o_orderdate timestamp, o_totalprice double"
    )
    vt = (
        spark.read.format("versioned_table")
        .option("path", store)
        .option("schema", ddl)
        .load()
    )
    return vt.agg(
        F.count(F.lit(1)).cast("long").alias("visible_rows"),
        F.countDistinct(F.year("o_orderdate")).cast("long").alias("n_years"),
        F.round(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                F.lit(0.0),
            ),
            2,
        ).alias("visible_revenue"),
    )


@query(
    "versioned_upsert_cdf",
    oracle="""SELECT CAST((SELECT count(*) FROM orders
             WHERE year(o_orderdate) <= 2000) AS BIGINT) AS visible_rows,
       CAST((SELECT count(*) FROM orders
             WHERE (year(o_orderdate) < 2000 AND o_orderkey % 50 = 0)
                OR year(o_orderdate) = 2000) AS BIGINT) AS n_upsert_rows,
       round(coalesce(CAST((SELECT sum(CAST(CASE WHEN year(o_orderdate) < 2000
                                                  AND o_orderkey % 50 = 0
                                             THEN 100.0 ELSE o_totalprice END
                                        AS DECIMAL(18,2)))
                            FROM orders WHERE year(o_orderdate) <= 2000)
                           AS DOUBLE), 0.0), 2) AS visible_revenue""",
)
def versioned_upsert_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins MERGE as ONE atomic commit (`upsert_version`, mode
    ``replace``): corrections to historical orders (price restated to
    a flat 100.00 for every 50th key) and the next year's new orders
    land together as a single replace delta — the commit both
    tombstones its keys in prior commits and inserts its rows, so
    readers never see a delete-without-insert window (the two-commit
    alternative has one), and the table needs no key-ordering
    shuffle at read time beyond one anti-join per upsert commit. The
    same latest-wins semantics `observation_upsert` computes with a
    per-key argmax here costs O(delta) at commit time against a
    100 TB table, with the physical rewrite deferred to
    `compact_chain`. The CDF emits the commit as typed ``upsert``
    full rows (consumers apply delete-by-key + insert); the ledger
    checks the CDF row count AND that the visible table equals
    restated-history + new-year exactly — which the oracle states
    directly over orders. Corrected rows keep their count (replace,
    not append): visible_rows is the plain ≤2000 count."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("upsert_orders_")
    V.write_version(orders.where(yr < 2000), store)  # v1: history
    corrections = orders.where(
        (yr < 2000) & (F.col("o_orderkey") % 50 == 0)
    ).withColumn("o_totalprice", F.lit(100.0))
    new_year = orders.where(yr == 2000)
    V.upsert_version(
        corrections.unionByName(new_year), store, "o_orderkey"
    )  # v2: one atomic replace delta

    cdf = V.incremental_scan(spark, store, from_version=1, to_version=2)
    n_upsert = cdf.agg(
        F.coalesce(
            F.sum(F.when(F.col("_change_type") == "upsert", 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_upsert_rows")
    )
    vis = V.read_version(spark, store).agg(
        F.count(F.lit(1)).cast("long").alias("visible_rows"),
        F.round(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                F.lit(0.0),
            ),
            2,
        ).alias("visible_revenue"),
    )
    return vis.crossJoin(n_upsert).select(
        "visible_rows", "n_upsert_rows", "visible_revenue"
    )


@query(
    "versioned_history",
    oracle="""WITH f AS (SELECT DISTINCT o_orderkey FROM orders
           WHERE o_custkey % 97 = 0 AND year(o_orderdate) <= 2000)
SELECT CAST(1 AS BIGINT) AS version, 'full' AS commit_mode,
       CAST((SELECT count(*) FROM orders WHERE year(o_orderdate) < 2000)
            AS BIGINT) AS n_rows
UNION ALL
SELECT CAST(2 AS BIGINT), 'append',
       CAST((SELECT count(*) FROM orders WHERE year(o_orderdate) = 2000)
            AS BIGINT)
UNION ALL
SELECT CAST(3 AS BIGINT), 'delete', (SELECT CAST(count(*) AS BIGINT) FROM f)
UNION ALL
SELECT CAST(4 AS BIGINT), 'append',
       CAST((SELECT count(*) FROM orders WHERE year(o_orderdate) >= 2001)
            AS BIGINT)""",
)
def versioned_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY on the versioned table (`sources.versioned
    .history`): the committed manifest as a queryable DataFrame — one
    row per commit with its mode and row count (full = snapshot rows,
    append/replace = delta rows, delete = tombstone keys) — the audit
    surface every table format exposes and the reference's warehouse
    (TRUNCATE+INSERT, no log) cannot. The chain is the
    `versioned_delete_cdf` history; each manifest count is
    deterministic from orders, which is exactly what the oracle
    states — so this also pins that the COMMITS recorded what they
    claim (the delta-rows bookkeeping), not just that reads resolve
    correctly. Manifest metadata is one row per commit: the
    driver-side build is the right cost at any table size."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("hist_orders_")
    # r12: the three data commits stage with one write job
    staged = V.stage_slices(
        orders,
        store,
        [("base", yr < 2000), ("y2000", yr == 2000), ("later", yr >= 2001)],
    )
    staged.commit("base", "full")
    staged.commit("y2000", "append")
    forget = orders.where((F.col("o_custkey") % 97 == 0) & (yr <= 2000)).select(
        "o_orderkey"
    )
    V.delete_version(forget, store, "o_orderkey")
    staged.commit("later", "append")
    return V.history(spark, store).select("version", "commit_mode", "n_rows")


@query(
    "gdpr_erasure_report",
    oracle="""WITH forget AS (SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0)
SELECT 'events' AS table_name,
       CAST((SELECT count(*) FROM events e JOIN forget f ON e.user_id = f.user_id)
            AS BIGINT) AS purged_rows,
       CAST((SELECT count(*) FROM events e
             WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.user_id = e.user_id))
            AS BIGINT) AS retained_rows
UNION ALL
SELECT 'customer',
       CAST((SELECT count(*) FROM customer c JOIN forget f ON c.c_custkey = f.user_id)
            AS BIGINT),
       CAST((SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.user_id = c.c_custkey))
            AS BIGINT)""",
)
def gdpr_erasure_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten erasure across the lake: a forget-list of
    subject ids is applied to every table carrying the subject key, and
    the audit report returns purged/retained counts per table (the
    compliance evidence record). The rewrite itself is the broadcast
    ANTI-join (forget lists are small against 100 TB facts) — composed
    with the partition-scoped rewrite of `gold_partition_refresh` and
    `compact_parquet`'s atomic swap, erasure touches only files that
    contain a forgotten subject, O(delta) not O(lake). Here both the
    purge and its complement are computed so the oracle checks the
    partition of every row into exactly one side."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    forget = ev.where(F.col("user_id") % 97 == 0).select("user_id").distinct()
    fb = F.broadcast(forget)

    def split_counts(df: DataFrame, key: str, label: str) -> DataFrame:
        purged = df.join(fb, df[key] == fb["user_id"], "left_semi")
        retained = df.join(fb, df[key] == fb["user_id"], "left_anti")
        return (
            purged.agg(F.count(F.lit(1)).cast("long").alias("purged_rows"))
            .crossJoin(
                retained.agg(F.count(F.lit(1)).cast("long").alias("retained_rows"))
            )
            .select(F.lit(label).alias("table_name"), "purged_rows", "retained_rows")
        )

    return split_counts(ev, "user_id", "events").unionByName(
        split_counts(cust, "c_custkey", "customer")
    )


@query(
    "xml_roundtrip_nations",
    oracle="""SELECT n.n_name, r.r_name AS region_name,
       CAST(count(c.c_custkey) AS BIGINT) AS n_customers
FROM nation n
JOIN region r ON r.r_regionkey = n.n_regionkey
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2""",
)
def xml_roundtrip_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source round-trip (Spark 4's native XML data source —
    the first release where XML needs no external package): the nation
    dimension written as <nations><nation>...</nation></nations>, read
    back with an explicit rowTag, then joined/aggregated against
    parquet-backed region+customer; the oracle computes the same from
    parquet alone, proving the XML path is lossless.

    XML is a row-exploded text format — no column pruning, no predicate
    pushdown, row-level parse cost — so at 100 TB it belongs at the
    EDGE of the pipeline only (the landing-zone interchange format B2B
    feeds actually deliver), converted to parquet in bronze on first
    touch, exactly like the reference's raw-JSON landing files."""
    tmp = tempfile.mkdtemp(prefix="xml_src_")
    nation = load_table(spark, sf_dir, "nation")
    (
        nation.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(tmp)
    )
    back = spark.read.format("xml").option("rowTag", "nation").load(tmp)
    if not back.columns:
        # empty-source guard: an XML file with zero <nation> rows
        # infers no columns on read-back; the round-trip is vacuous
        return spark.createDataFrame(
            [], "n_name string, region_name string, n_customers bigint"
        )
    region = load_table(spark, sf_dir, "region")
    customer = load_table(spark, sf_dir, "customer")
    return (
        back.join(F.broadcast(region), back["n_regionkey"] == region["r_regionkey"])
        .join(customer, customer["c_nationkey"] == back["n_nationkey"], "left")
        .groupBy("n_name", F.col("r_name").alias("region_name"))
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@query(
    "masked_customer_export",
    oracle="""SELECT c_custkey,
       'CUST_' || substr(md5(c_name), 1, 12) AS name_token,
       CASE WHEN length(c_name) >= 3
            THEN repeat('*', length(c_name) - 3) || substr(c_name, length(c_name) - 2, 3)
            ELSE repeat('*', length(c_name)) END AS name_masked,
       CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE) AS acctbal_bucket,
       c_mktsegment
FROM customer""",
)
def masked_customer_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic data masking for a governed export (the untrusted-
    consumer view of the serving layer): identifying names become a
    stable pseudonymous token (md5-derived — joinable across exports,
    not reversible) plus a redacted display form, account balances are
    floor-coarsened to $1000 buckets (floor, not round: round's half-way
    tie rule differs between engines) (k-anonymity-style generalization), and
    only non-identifying attributes pass through untouched.

    Scale shape: pure projection — one codegen'd stage over the scan,
    no shuffle, no Python; masking at 100 TB costs exactly the scan.
    The policy belongs in the engine (a governed view), not the
    consumer: paired with `gdpr_erasure_report` (deletion) and
    `pii_scrubbed_docs` (free-text scrubbing) it completes the
    governance triad of masking / erasure / scrubbing."""
    customer = load_table(spark, sf_dir, "customer")
    name_len = F.length("c_name")
    return customer.select(
        "c_custkey",
        F.concat(F.lit("CUST_"), F.substring(F.md5("c_name"), 1, 12)).alias(
            "name_token"
        ),
        F.when(
            name_len >= 3,
            F.concat(
                F.repeat(F.lit("*"), name_len - 3),
                F.substring(F.col("c_name"), -3, 3),
            ),
        )
        .otherwise(F.repeat(F.lit("*"), name_len))
        .alias("name_masked"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("double")
        .alias("acctbal_bucket"),
        "c_mktsegment",
    )


@query(
    "binaryfile_corpus_ingest",
    oracle=r"""SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS file_name,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+')) END
            AS BIGINT) AS n_tokens
FROM documents WHERE doc_id % 10 = 0""",
)
def binaryfile_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-file landing ingestion through Spark's ``binaryFile``
    source — the standard first hop of a multimodal pipeline, where
    media/documents arrive as FILES on shared storage, not rows in a
    table: a corpus drop (one UTF-8 file per document, written
    partition-parallel from the executors — no driver collect) is
    ingested back as ``(path, modificationTime, length, content)``,
    and per-file metadata is derived from the opaque bytes: size,
    content hash (the exact-dedup key at ingest time) and the token
    count of the decoded payload. Byte-exactness through the
    write→land→ingest→decode loop is the point — md5(content) must
    equal the oracle's md5 of the source text. At 100 TB the landing
    dir is an object-store prefix and ``binaryFile`` splits the
    listing across the cluster; per-file cost is one read + one hash,
    and the downstream is exactly `operators/multimodal`'s
    binary-column kernels (this query is their missing FILE-source
    front end; the reference's equivalent hop is its raw-payload
    landing into the Mongo raw collection, mongodb_etl.py:18,100).

    The landing prefix is injectable via ``SPARK_GRAFT_LANDING_DIR``
    (a fresh subdirectory is created under it per run) so a cluster
    deployment points it at shared storage — an object-store mount or
    NFS — without editing the query; the default is a local tempdir,
    correct for local[all] where executors and reader share a
    filesystem. Either way the count guard below fails loudly if the
    landing isn't actually shared."""
    import os

    from ..functions.text import word_count

    from ..pipeline.artifacts import env_scratch_dir

    tmp = env_scratch_dir("blob_land_", "SPARK_GRAFT_LANDING_DIR")
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 10 == 0
    ).select("doc_id", "text")

    def _land(rows) -> None:
        for r in rows:
            with open(os.path.join(tmp, f"doc_{r['doc_id']}.txt"), "wb") as fh:
                fh.write(r["text"].encode("utf-8"))

    n_expected = docs.count()
    docs.foreachPartition(_land)
    landed = [f for f in os.listdir(tmp) if f.endswith(".txt")]
    if len(landed) != n_expected:
        # executors landed files the reader can't see: the landing dir
        # MUST be shared storage (object store / NFS). Fail loudly —
        # a silent empty/partial ingest is a wrong result, not a
        # degenerate input (r07 review finding).
        raise RuntimeError(
            f"binaryFile landing dir has {len(landed)} of {n_expected} "
            f"expected files at {tmp}: executors and the reader must "
            "share the landing filesystem (local[all] or object store)"
        )
    if not landed:  # empty corpus: nothing landed, typed empty frame
        return spark.createDataFrame(
            [],
            "file_name string, n_bytes long, content_md5 string, n_tokens long",
        )
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(tmp)
    )
    return back.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").cast("long").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
        word_count(F.col("content").cast("string")).cast("long").alias("n_tokens"),
    )


@query(
    "versioned_partition_pruned_read",
    oracle="""WITH live AS (SELECT * FROM orders WHERE o_orderkey % 101 <> 0),
y97 AS (SELECT * FROM live WHERE year(o_orderdate) = 1997)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS revenue,
       TRUE AS lib_files_pruned,
       (SELECT CAST(count(*) AS BIGINT) FROM y97) AS format_rows
FROM y97""",
)
def versioned_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITIONED commits + partition pruning on the versioned table
    (``sources/versioned.py``): ``write_version(partition_by=
    ("o_year",))`` lays each commit out hive-partitioned and records
    the partition-dir list in the manifest — the MergeTree
    ``ORDER BY (timestamp, station_id)`` analog
    (clickhouse_etl.py:55-56) applied to the versioned path. A
    ``prune`` on the partition column then reads ONE partition dir per
    commit (never listing the rest — ``lib_files_pruned`` is computed
    from the plan's actual inputFiles and must be TRUE), composed with
    a merge-on-read tombstone that still applies to the surviving
    slice. The same slice read through the ``versioned_table`` FORMAT
    exercises pushFilters partition pruning: Spark pushes the
    ``o_year = 1997`` comparison into the Python DataSource, which
    skips non-matching files at planning while returning every filter
    for Spark to re-apply (pruning is a performance fact, never a
    correctness input). At 100 TB: a one-day read of a long-history
    table costs one partition dir per commit, not every live file's
    footer."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..sources.versioned_source import register as register_vt

    register_vt(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("o_year"),
    )
    store = scratch_artifact_dir("vt_part_")
    pby = ("o_year",)
    # r12: both partitioned data commits stage with one write job
    staged = V.stage_slices(
        orders,
        store,
        [("lo", F.col("o_year") < 2001), ("hi", F.col("o_year") >= 2001)],
        partition_by=pby,
    )
    staged.commit("lo", "full")
    staged.commit("hi", "append")
    V.delete_version(
        orders.where(F.col("o_orderkey") % 101 == 0).select("o_orderkey"),
        store,
        "o_orderkey",
    )

    pruned = V.read_version(spark, store, prune=("o_year", 1997, 1997))
    # the anti-join side legitimately reads the (tiny) tombstone dirs;
    # the pruning claim is about DATA commits: every data file the plan
    # touches must live under the matching partition dir
    tomb_dirs = {e["dir"] for e in V.versions(store) if e.get("mode") == "delete"}
    data_files = [
        f
        for f in pruned.inputFiles()
        if not any(f"/{d}/" in f for d in tomb_dirs)
    ]
    # empty-slice totality: an all-pruned (or all-empty-fixture) slice
    # reads only schema-bearing empty files — the "no out-of-range data
    # file contributed rows" claim then holds vacuously
    lib_files_pruned = pruned.isEmpty() or (
        bool(data_files)
        and all("/o_year=1997/" in f for f in data_files)
    )

    fmt = (
        spark.read.format("versioned_table")
        .option("path", store)
        .option("schema", "o_orderkey bigint, o_totalprice double, o_year int")
        .load()
        .where(F.col("o_year") == 1997)
    )
    fmt_rows = fmt.agg(
        F.count(F.lit(1)).cast("long").alias("format_rows")
    )

    return (
        pruned.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("revenue"),
        )
        .select(
            "n_rows",
            "revenue",
            F.lit(lib_files_pruned).alias("lib_files_pruned"),
        )
        .crossJoin(F.broadcast(fmt_rows))
    )


@query(
    "versioned_schema_evolution",
    oracle="""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS revenue,
       TRUE AS renamed_ok,
       TRUE AS widened_ok
FROM orders""",
)
def versioned_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the versioned table (VERDICT r08 #6):
    column RENAME as a metadata-only commit (``rename_column`` —
    O(1) against a 100 TB table, no data rewrite; readers fold the
    name map while resolving the chain, the Iceberg field-mapping idea
    at the name level) and TYPE WIDENING (a commit written with an
    int column reads long once any commit widened it — Spark's
    set-operation coercion at the chain union, Arrow cast in the
    format reader). The chain: v1 full (customer id as INT, old name
    ``o_custkey``), v2 rename ``o_custkey``→``customer_id``, v3 append
    written with the NEW name and the WIDE type. The latest read must
    carry (customer_id, bigint) and the full table's aggregate — which
    the oracle states directly over orders. Time-travel keeps
    pre-rename versions readable under their then-current schema
    (pinned in tests/test_versioned.py)."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("vt_evo_")
    V.write_version(
        orders.where(yr < 2000).withColumn(
            "o_custkey", F.col("o_custkey").cast("int")
        ),
        store,
    )
    V.rename_column(spark, store, "o_custkey", "customer_id")
    V.append_version(
        orders.where(yr >= 2000).withColumnRenamed("o_custkey", "customer_id"),
        store,
    )
    cur = V.read_version(spark, store)
    dt = dict(cur.dtypes)
    renamed_ok = "customer_id" in dt and "o_custkey" not in dt
    widened_ok = dt.get("customer_id") == "bigint"
    return cur.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("customer_id").cast("long").alias("n_customers"),
        F.round(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                F.lit(0.0),
            ),
            2,
        ).alias("revenue"),
    ).select(
        "n_rows",
        "n_customers",
        "revenue",
        F.lit(renamed_ok).alias("renamed_ok"),
        F.lit(widened_ok).alias("widened_ok"),
    )


@query(
    "versioned_writer_sink",
    oracle="""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS revenue,
       TRUE AS stats_pruned,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS table_rows
FROM orders WHERE year(o_orderdate) = 2000""",
)
def versioned_writer_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned table as a generic Spark WRITE format
    (`sources/versioned_source.py` writers):
    ``df.write.format("versioned_table").mode("overwrite"/"append")``
    stages per-task Arrow batches as parquet part files in executors
    and adopts them as ONE manifest commit under the table's commit
    lock (full snapshot for overwrite, append delta for append) —
    write-side parity for the format whose read/stream sides landed in
    r08, so ANY Spark pipeline can both produce and consume the table
    with no library calls. ``statscols`` computes per-commit min/max
    INCREMENTALLY in the write tasks (never a second pass) and records
    them in the manifest, so the year-2000 slice read skips the other
    two commits entirely — ``stats_pruned`` is computed from the
    pruned plan's actual inputFiles. The exactly-once STREAMING
    writer twin (``writeStream.format("versioned_table")``, batch-id
    watermark replay discipline) is pinned by
    tests/test_versioned_writer.py."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..sources.versioned_source import register as register_vt

    register_vt(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("vt_writer_")

    def write(df, mode):
        df.write.format("versioned_table").option("path", store).option(
            "statscols", "o_orderdate"
        ).mode(mode).save()

    write(orders.where(yr < 2000), "overwrite")
    write(orders.where(yr == 2000), "append")
    write(orders.where(yr >= 2001), "append")

    pruned = V.read_version(
        spark, store, prune=("o_orderdate", "2000-01-01", "2000-12-31T23:59:59.999999")
    )
    files = pruned.inputFiles()
    # empty-slice totality: zero-row commits leave only schema-bearing
    # empty files — skipping holds vacuously
    stats_pruned = pruned.isEmpty() or (
        bool(files) and all("/v=2/" in f for f in files)
    )
    total = V.read_version(spark, store).agg(
        F.count(F.lit(1)).cast("long").alias("table_rows")
    )
    return (
        pruned.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("revenue"),
        )
        .select(
            "n_rows", "revenue", F.lit(stats_pruned).alias("stats_pruned")
        )
        .crossJoin(F.broadcast(total))
    )


@query(
    "versioned_file_skipping_read",
    oracle="""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS revenue,
       TRUE AS files_skipped
FROM orders WHERE o_orderkey BETWEEN 1000 AND 2000""",
)
def versioned_file_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-FILE stats skipping on the versioned table (the Delta
    stats-per-file design, one level finer than r08's commit-level
    skipping and r09's partition-dir pruning): the commit lands
    RANGE-CLUSTERED on the key via DETERMINISTIC fixed-width key
    buckets in hive dirs + in-partition sort (the MergeTree ORDER BY
    analog at the file level, clickhouse_etl.py:55-56; sampled-boundary
    range repartitioning is banned in registered plans) and the
    manifest records each FILE's [min, max] (one
    ``groupBy(input_file_name())`` aggregate at commit time —
    metadata-sized). A key-slice read then opens ONLY
    the files whose recorded ranges intersect the slice:
    ``files_skipped`` is computed from the plan's actual inputFiles
    and must be TRUE. The same per-file skipping works through the
    ``versioned_table`` format's pushFilters (point lookups touch one
    file; pinned in tests/test_versioned_source.py). At 100 TB: a
    clustered table serves a key range from a handful of files out of
    millions, with zero footer reads for the rest — the manifest IS
    the index."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    store = scratch_artifact_dir("vt_fskip_")
    # DETERMINISTIC range clustering: fixed-width key buckets laid out
    # as hive dirs (repartitionByRange samples its boundaries — banned
    # in registered plans, tools/scan_audit tree audit), so every
    # file's o_orderkey range is contiguous within its bucket and the
    # per-FILE stats actually discriminate. Width adapts to the key
    # span (one bounded driver scalar — ~8 buckets at every SF).
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0] or 0
    width = max(64, (int(max_key) + 1) // 8)
    clustered = orders.withColumn(
        "key_bucket", F.floor(F.col("o_orderkey") / width).cast("int")
    ).sortWithinPartitions("o_orderkey")
    V.write_version(
        clustered,
        store,
        stats_cols=("o_orderkey",),
        partition_by=("key_bucket",),
    )

    pruned = V.read_version(spark, store, prune=("o_orderkey", 1000, 2000))
    n_committed_files = len(V.versions(store)[0].get("file_stats", {}))
    files = pruned.inputFiles()
    # empty-slice totality: a zero-row table commits one schema file —
    # nothing to skip, the claim holds vacuously
    files_skipped = pruned.isEmpty() or (
        bool(files) and len(files) < n_committed_files
    )
    return pruned.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                F.lit(0.0),
            ),
            2,
        ).alias("revenue"),
    ).select("n_rows", "revenue", F.lit(files_skipped).alias("files_skipped"))


@query(
    "versioned_date_partition_pruning",
    oracle="""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS revenue,
       TRUE AS lib_dirs_pruned,
       (SELECT CAST(count(*) AS BIGINT) FROM orders
        WHERE o_orderdate BETWEEN DATE '1997-03-01' AND DATE '1997-05-31')
           AS format_rows
FROM orders
WHERE o_orderdate BETWEEN DATE '1997-03-01' AND DATE '1997-05-31'""",
)
def versioned_date_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE-typed partition pruning on the versioned table (VERDICT
    r09 #2) — the 100-TB norm is a table partitioned by a DATE column,
    and both prune granularities must understand it:

    - the LIBRARY read takes natural ``datetime.date`` prune bounds
      (coerced to the manifest's ISO form instead of raising) and
      opens only the month directories inside [lo, hi] —
      ``lib_dirs_pruned`` is computed from the plan's actual
      inputFiles and must be TRUE;
    - the same slice through the ``versioned_table`` FORMAT pushes the
      ``o_month BETWEEN DATE...`` comparisons into the Python
      DataSource, whose ``_raw_matches`` now parses hive's ISO date
      strings (a date filter previously kept every dir).

    The reference's daily/monthly rollup tables are exactly this shape
    (clickhouse_etl.py:301-456 date-keyed gold tables); at 100 TB a
    one-quarter read of a years-long table opens three dirs per
    commit, with zero listing of the rest."""
    import datetime

    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..sources.versioned_source import register as register_vt

    register_vt(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.trunc("o_orderdate", "mm").alias("o_month"),
    )
    store = scratch_artifact_dir("vt_datep_")
    pby = ("o_month",)
    split = F.year("o_orderdate") < 1996
    # r12: both partitioned data commits stage with one write job
    staged = V.stage_slices(
        orders, store, [("old", split), ("new", ~split)], partition_by=pby
    )
    staged.commit("old", "full")
    staged.commit("new", "append")

    lo, hi = datetime.date(1997, 3, 1), datetime.date(1997, 5, 1)
    pruned = V.read_version(spark, store, prune=("o_month", lo, hi)).where(
        F.col("o_orderdate").between("1997-03-01", "1997-05-31")
    )
    keep_dirs = {"o_month=1997-03-01", "o_month=1997-04-01", "o_month=1997-05-01"}
    files = pruned.inputFiles()
    # empty-slice totality: vacuously pruned when the quarter is empty
    lib_dirs_pruned = pruned.isEmpty() or (
        bool(files)
        and all(any(f"/{d}/" in f for d in keep_dirs) for f in files)
    )

    fmt = (
        spark.read.format("versioned_table")
        .option("path", store)
        .option(
            "schema",
            "o_orderkey bigint, o_totalprice double, "
            "o_orderdate date, o_month date",
        )
        .load()
        .where(
            F.col("o_month").between(F.lit(lo), F.lit(hi))
            & F.col("o_orderdate").between("1997-03-01", "1997-05-31")
        )
    )
    fmt_rows = fmt.agg(F.count(F.lit(1)).cast("long").alias("format_rows"))

    return (
        pruned.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("revenue"),
        )
        .select(
            "n_rows",
            "revenue",
            F.lit(lib_dirs_pruned).alias("lib_dirs_pruned"),
        )
        .crossJoin(F.broadcast(fmt_rows))
    )


@query(
    "versioned_column_drop",
    oracle="""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS revenue,
       (SELECT CAST(count(*) AS BIGINT) FROM orders
        WHERE year(o_orderdate) >= 1996) AS tagged_rows,
       TRUE AS dropped_ok,
       TRUE AS fresh_lineage_ok
FROM orders""",
)
def versioned_column_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column DROP as schema evolution on the versioned table (VERDICT
    r09 #4, completing the rename/widening pair): ``drop_column``
    publishes a METADATA-ONLY commit — O(1) against a 100 TB table, no
    data rewrite, bytes reclaimed at the next compaction — and every
    reader excludes the column from commits written before the drop.
    The chain here: v1 full (orders pre-1996 carrying an extra
    ``batch_tag`` lineage column), v2 drop ``batch_tag``, v3 append
    (orders 1996+) RE-ADDING the same name as a FRESH lineage. The
    latest read must show the full table with ``batch_tag`` non-NULL
    ONLY for the post-drop rows (``fresh_lineage_ok``: pre-drop values
    are never resurrected — the positional fold in
    ``_compose_schema_map``), while time travel keeps v1 readable with
    its then-current schema (``dropped_ok``). Delta/Iceberg
    drop-then-add semantics under column mapping, expressed on the
    name level this format uses."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("vt_drop_")
    # r12: both data commits stage with one write job (the per-slice
    # batch_tag values ride a when() on the shared source frame)
    tagged = orders.withColumn(
        "batch_tag", F.when(yr < 1996, F.lit(1)).otherwise(F.lit(2))
    )
    staged = V.stage_slices(
        tagged, store, [("old", yr < 1996), ("new", yr >= 1996)]
    )
    staged.commit("old", "full")
    V.drop_column(spark, store, "batch_tag")
    staged.commit("new", "append")

    cur = V.read_version(spark, store)
    old = V.read_version(spark, store, 1)
    dropped_ok = (
        "batch_tag" in cur.columns  # re-added lineage is visible
        and "batch_tag" in old.columns  # time travel keeps v1's schema
        and V.versions(store)[1]["mode"] == "drop"
    )
    return cur.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                F.lit(0.0),
            ),
            2,
        ).alias("revenue"),
        F.count("batch_tag").cast("long").alias("tagged_rows"),
        F.lit(dropped_ok).alias("dropped_ok"),
        # fresh lineage: no surviving value came from the dropped
        # lineage (tag 1), every non-NULL is the re-added tag 2
        (
            F.coalesce(F.sum(F.when(F.col("batch_tag") == 1, 1)), F.lit(0))
            == 0
        ).alias("fresh_lineage_ok"),
    )


@query(
    "versioned_partitioned_format_write",
    oracle="""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS revenue,
       TRUE AS dirs_pruned,
       TRUE AS manifest_symmetric
FROM orders WHERE year(o_orderdate) = 1997""",
)
def versioned_partitioned_format_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITIONED writes through the ``versioned_table`` format sink
    (VERDICT r09 #3 — closing the read/write asymmetry: the read path
    understood partitions, the format writer staged flat files only).
    ``df.write.format("versioned_table").option("partitionby",
    "o_year")`` makes each WRITE TASK dynamic-partition its Arrow
    batches into hive subdir part files (vectorized group-split, no
    row loops), and the adopted manifest entry records
    ``partition_by``/``partition_dirs`` byte-compatibly with the
    library's ``write_version`` (``manifest_symmetric``) — so a
    format-WRITTEN table prunes partition dirs on read exactly like a
    library-written one (``dirs_pruned``, from the pruned plan's
    actual inputFiles). At 100 TB this is the landing-zone shape: any
    generic Spark pipeline writes the partitioned versioned table with
    no library imports, and every downstream slice read opens one dir
    per commit."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..sources.versioned_source import register as register_vt

    register_vt(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("o_year"),
    )
    store = scratch_artifact_dir("vt_pwrite_")

    def write(df, mode):
        df.write.format("versioned_table").option("path", store).option(
            "partitionby", "o_year"
        ).option("statscols", "o_orderkey").mode(mode).save()

    write(orders.where(F.col("o_year") < 2001), "overwrite")
    write(orders.where(F.col("o_year") >= 2001), "append")

    e1 = V.versions(store)[0]
    # an EMPTY partitioned write lands a flat schema-bearing file with
    # no partition metadata BY DESIGN on both writer paths — symmetry
    # holds vacuously for a zero-row base commit
    manifest_symmetric = e1["rows"] == 0 or (
        e1.get("partition_by") == ["o_year"]
        and bool(e1.get("partition_dirs"))
        and all(d.startswith("o_year=") for d in e1["partition_dirs"])
        # per-file stats keys are subdir-relative, like the library's
        and all(k.startswith("o_year=") for k in e1.get("file_stats", {}))
    )

    pruned = V.read_version(spark, store, prune=("o_year", 1997, 1997))
    files = pruned.inputFiles()
    dirs_pruned = pruned.isEmpty() or (
        bool(files) and all("/o_year=1997/" in f for f in files)
    )

    return pruned.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                F.lit(0.0),
            ),
            2,
        ).alias("revenue"),
    ).select(
        "n_rows",
        "revenue",
        F.lit(dirs_pruned).alias("dirs_pruned"),
        F.lit(manifest_symmetric).alias("manifest_symmetric"),
    )


@query(
    "versioned_struct_evolution",
    oracle="""WITH priced AS (
  SELECT o_orderkey,
         CASE WHEN year(o_orderdate) >= 1996
              THEN CAST(o_totalprice AS DOUBLE) END AS price
  FROM orders)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(price) AS BIGINT) AS priced_rows,
       round(coalesce(CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE),
                      0.0), 2) AS priced_revenue,
       TRUE AS format_parity
FROM priced""",
)
def versioned_struct_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT-FIELD schema evolution on the versioned table (the
    nested half of VERDICT r09 #4): an append may add a field INSIDE a
    struct column — pre-evolution rows read NULL for it, through BOTH
    read paths. The chain here: v1 full (orders pre-1996, ``meta``
    struct carrying only ``prio``), v2 append (orders 1996+, ``meta``
    gains a ``price`` field). The library chain read union-resolves
    nested fields (Spark's ``unionByName(allowMissingColumns)`` fills
    missing struct children); the ``versioned_table`` format
    reconciles per-file Arrow batches RECURSIVELY
    (``_conform_array``: missing struct children null-fill, nested
    widening casts apply) instead of failing the flat cast.
    ``format_parity`` pins that both paths agree on the full nested
    aggregate. At 100 TB nested payload columns evolve constantly
    (the reference's raw JSON observation struct grows fields across
    API versions, nws_api_fetcher_v2.py:21-119) — a rewrite per new
    field is untenable; this is the zero-rewrite path."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..sources.versioned_source import register as register_vt

    register_vt(spark)
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("vt_structevo_")
    V.write_version(
        orders.where(yr < 1996).select(
            "o_orderkey", F.struct(F.col("o_orderpriority").alias("prio")).alias("meta")
        ),
        store,
    )
    V.append_version(
        orders.where(yr >= 1996).select(
            "o_orderkey",
            F.struct(
                F.col("o_orderpriority").alias("prio"),
                F.col("o_totalprice").alias("price"),
            ).alias("meta"),
        ),
        store,
    )

    lib = V.read_version(spark, store)
    agg = lib.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("meta.price").cast("long").alias("priced_rows"),
        F.round(
            F.coalesce(
                F.sum(F.col("meta.price").cast("decimal(18,2)")).cast("double"),
                F.lit(0.0),
            ),
            2,
        ).alias("priced_revenue"),
    )
    fmt = (
        spark.read.format("versioned_table")
        .option("path", store)
        .option(
            "schema",
            "o_orderkey bigint, meta struct<prio:string, price:double>",
        )
        .load()
        .agg(
            F.count(F.lit(1)).cast("long").alias("f_rows"),
            F.count("meta.price").cast("long").alias("f_priced"),
            F.round(
                F.coalesce(
                    F.sum(F.col("meta.price").cast("decimal(18,2)")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("f_revenue"),
        )
    )
    return agg.crossJoin(F.broadcast(fmt)).select(
        "n_rows",
        "priced_rows",
        "priced_revenue",
        (
            (F.col("n_rows") == F.col("f_rows"))
            & (F.col("priced_rows") == F.col("f_priced"))
            & (F.col("priced_revenue") == F.col("f_revenue"))
        ).alias("format_parity"),
    )


@query(
    "versioned_cdf_format_read",
    oracle="""WITH nov AS (
  SELECT * FROM orders WHERE o_orderdate BETWEEN DATE '1997-11-01'
                                             AND DATE '1997-11-30'),
dec_ AS (
  SELECT * FROM orders WHERE o_orderdate BETWEEN DATE '1997-12-01'
                                             AND DATE '1997-12-31')
SELECT (SELECT CAST(count(*) AS BIGINT) FROM nov) +
       (SELECT CAST(count(*) AS BIGINT) FROM dec_) AS n_inserts,
       (SELECT CAST(count(*) AS BIGINT) FROM nov
        WHERE o_orderkey % 13 = 0) AS n_deletes,
       round(coalesce((SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                                   AS DOUBLE) FROM dec_), 0.0), 2)
           AS insert_revenue_v3,
       TRUE AS library_parity""",
)
def versioned_cdf_format_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed AS a Spark batch format (Delta's readChangeFeed
    analog): ``spark.read.format("versioned_table")
    .option("readchangefeed", "true").option("startingversion", N)``
    emits the typed change rows committed after version N — inserts as
    full rows, deletes as key-only rows, each stamped ``_change_type``
    and ``_commit_version`` — reading ONLY the delta directories
    (O(rows changed), never a snapshot re-scan), with loud failure if
    a full-snapshot rewrite breaks the range. The chain here: v1 full
    (orders pre-Nov-1997), v2 append (November), v3 delete (every 13th
    November key), v4 append (December). The feed from v1 must carry
    exactly the Nov+Dec inserts and the November tombstone keys, agree
    with the library's `incremental_scan` row-for-row
    (``library_parity``), and the per-commit slice (inserts of v4
    only) must aggregate to December's revenue. At 100 TB this is how
    a NON-library consumer (any generic Spark job) syncs a downstream
    copy: the feed is the format, no imports needed."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..sources.versioned_source import register as register_vt

    register_vt(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    store = scratch_artifact_dir("vt_cdf_fmt_")
    nov = F.col("o_orderdate").between("1997-11-01", "1997-11-30")
    dec = F.col("o_orderdate").between("1997-12-01", "1997-12-31")
    # r12: the three data commits stage with one write job
    staged = V.stage_slices(
        orders,
        store,
        [
            ("base", F.col("o_orderdate") < "1997-11-01"),
            ("nov", nov),
            ("dec", dec),
        ],
    )
    staged.commit("base", "full")
    staged.commit("nov", "append")
    V.delete_version(
        orders.where(nov & (F.col("o_orderkey") % 13 == 0)).select(
            "o_orderkey"
        ),
        store,
        "o_orderkey",
    )
    staged.commit("dec", "append")

    feed = (
        spark.read.format("versioned_table")
        .option("path", store)
        .option(
            "schema",
            "o_orderkey bigint, o_orderdate date, o_totalprice double",
        )
        .option("readchangefeed", "true")
        .option("startingversion", "1")
        .load()
    )
    lib = V.incremental_scan(spark, store, 1).select(*feed.columns)
    # row-for-row parity with the library CDF (exceptAll both ways)
    parity = (
        feed.exceptAll(lib).limit(1).count() == 0
        and lib.exceptAll(feed).limit(1).count() == 0
    )
    return feed.agg(
        F.coalesce(
            F.sum(F.when(F.col("_change_type") == "insert", 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_inserts"),
        F.coalesce(
            F.sum(F.when(F.col("_change_type") == "delete", 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_deletes"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("_change_type") == "insert")
                        & (F.col("_commit_version") == 4),
                        F.col("o_totalprice").cast("decimal(18,2)"),
                    )
                ).cast("double"),
                F.lit(0.0),
            ),
            2,
        ).alias("insert_revenue_v3"),
    ).select(
        "n_inserts",
        "n_deletes",
        "insert_revenue_v3",
        F.lit(parity).alias("library_parity"),
    )


@query(
    "versioned_schema_inference",
    oracle="""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT year(o_orderdate)) AS BIGINT) AS n_years,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS revenue,
       'o_orderdate:timestamp,o_orderkey:bigint,o_year:bigint,price:double'
           AS inferred_schema
FROM orders WHERE year(o_orderdate) <= 2001""",
)
def versioned_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-derived SCHEMA INFERENCE for the `versioned_table`
    format (r11; VERDICT r10 "What's wrong #1" / "What's missing #2"):
    `spark.read.format("versioned_table")` with NO `schema` option now
    derives the read schema from the manifest — one parquet FOOTER per
    chain commit folded through the rename/drop map, hive partition
    columns the files don't carry reconstituted with types inferred
    from the recorded partition dirs, per-commit schemas unified with
    permissive promotion (int→long widening, struct-field union) —
    exactly what Delta does from its log, at O(chain) metadata reads
    and zero data I/O. The table here exercises every fold at once: a
    format-partitioned base (`o_year` lives ONLY in hive dirs), a
    library rename (o_totalprice→price), a widened key (int→long
    across commits), and a metadata-only drop (o_custkey); the proof
    column pins the INFERRED schema itself, and the aggregates pin
    that the schema-less read serves the right rows. The `schema`
    option remains the override; an uninitialized table now raises a
    ValueError naming the option instead of a raw worker traceback
    (pinned in tests/test_versioned_source.py). Reference parity:
    the reference's readers never spell result schemas either — its
    stores are self-describing (clickhouse_etl.py:301-456)."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..sources.versioned_source import register as register_vt

    register_vt(spark)
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("vt_infer_")

    base = orders.where(yr <= 1999).select(
        F.col("o_orderkey").cast("int").alias("o_orderkey"),  # narrow
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderdate"),
        F.col("o_totalprice"),
        yr.cast("long").alias("o_year"),
    )
    (
        base.write.format("versioned_table")
        .mode("overwrite")
        .option("path", store)
        .option("partitionby", "o_year")  # o_year = hive dirs only
        .save()
    )
    V.rename_column(spark, store, "o_totalprice", "price")
    V.append_version(  # widened key: int (v1 files) ∪ long → bigint
        orders.where((yr >= 2000) & (yr <= 2001)).select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("o_custkey").cast("long").alias("o_custkey"),
            F.col("o_orderdate"),
            F.col("o_totalprice").alias("price"),
            yr.cast("long").alias("o_year"),
        ),
        store,
    )
    V.drop_column(spark, store, "o_custkey")

    inferred = (
        spark.read.format("versioned_table").option("path", store).load()
    )
    schema_sig = ",".join(
        sorted(
            f"{f.name}:{f.dataType.simpleString()}"
            for f in inferred.schema.fields
        )
    )
    return inferred.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("o_year").cast("long").alias("n_years"),
        F.round(
            F.coalesce(
                F.sum(F.col("price").cast("decimal(18,2)")).cast("double"),
                F.lit(0.0),
            ),
            2,
        ).alias("revenue"),
    ).select(
        "n_rows", "n_years", "revenue",
        F.lit(schema_sig).alias("inferred_schema"),
    )


@query(
    "versioned_operational_lifecycle",
    oracle="""SELECT CAST(count(*) AS BIGINT) AS table_rows,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS table_revenue,
       CAST((SELECT count(*) FROM orders WHERE year(o_orderdate) = 2001)
            AS BIGINT) AS reattached_rows,
       TRUE AS chain_bounded,
       TRUE AS history_expired,
       TRUE AS read_is_post_compaction
FROM orders WHERE year(o_orderdate) <= 2001""",
)
def versioned_operational_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The versioned table's OPERATIONAL lifecycle end to end (r11;
    VERDICT r10 "Next round #7") — the pieces r08-r10 pinned
    individually, composed as one run the way a production table
    lives: a stream of per-year commits with `maybe_compact(max_chain=4)`
    wired into the commit cadence (the plan-depth envelope: the
    rewrite triggers exactly when the chain exceeds budget), then
    `expire_versions(retain_last=2)` reclaims pre-compaction history
    (chain-unit retention), and a format-stream consumer RE-ATTACHES
    after the compaction via `startingversion=<compaction version>` —
    the documented recovery path for a rewrite-broken cursor —
    delivering exactly the post-compaction appends. Proof columns are
    computed from the run itself, each with an empty-slice vacuous
    branch: `chain_bounded` (chain_length stayed ≤ max_chain+1
    forever, so the merge-on-read plan depth is O(max_chain) — the
    in-plan O(max_chain) guarantee), `history_expired` (the manifest
    retains only the compaction-rooted suffix), and
    `read_is_post_compaction` (the final read's actual inputFiles all
    live under post-compaction version dirs: a time-travel read after
    vacuum provably never lists reclaimed history). Content and the
    re-attached delivery are oracle-checked against orders directly.
    Reference parity: scheduler.py:45-73 re-syncs by re-reading whole
    gold tables on a timer; this is the bounded-debt, bounded-history,
    bounded-catch-up version of the same serving loop."""
    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..sources.versioned_source import register as register_vt

    register_vt(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("vt_lifecycle_")
    max_chain = 4

    # r12: the base and the five yearly deltas stage with one write
    # job; adoption stays in chain order with maybe_compact interleaved
    staged = V.stage_slices(
        orders,
        store,
        [("base", yr <= 1996)]
        + [(f"y{y}", yr == y) for y in (1997, 1998, 1999, 2000, 2001)],
    )
    staged.commit("base", "full")
    chain_ok = True
    compact_v = None
    for year in (1997, 1998, 1999, 2000, 2001):
        staged.commit(f"y{year}", "append")
        new_full = V.maybe_compact(spark, store, max_chain=max_chain)
        if new_full is not None:
            compact_v = new_full
        chain_ok = chain_ok and V.chain_length(store) <= max_chain + 1
    # commit cadence: base v1 + appends v2-v5; the envelope trips once,
    # at the 2000 append (chain 5 > 4) -> compaction v6; the 2001
    # append lands after it as v7
    if compact_v is None:  # degenerate fixtures still compact nothing
        compact_v = V.versions(store)[-1]["version"]

    expired = V.expire_versions(store, retain_last=2)
    vs = V.versions(store)
    history_expired = (not expired and not vs) or (
        bool(vs) and vs[0]["version"] >= compact_v and len(vs) <= 2
    )

    # consumer re-attach AFTER the rewrite: startingversion names the
    # compaction; the drained delivery is exactly the post-compaction
    # appends (year 2001)
    out = tempfile.mkdtemp(prefix="vt_lifecycle_out_")
    ckpt = tempfile.mkdtemp(prefix="vt_lifecycle_ckpt_")
    q = (
        spark.readStream.format("versioned_table")
        .option("path", store)
        .option("startingversion", str(compact_v))
        .option("maxcatchupversions", "8")  # r11 guard: on, not tripped
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    reattached = spark.read.schema(
        "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    ).parquet(out)

    final = V.read_version(spark, store)
    files = final.inputFiles()
    post_dirs = {f"/v={e['version']}/" for e in vs}
    read_post = final.isEmpty() or (
        bool(files) and all(any(d in f for d in post_dirs) for f in files)
    )

    counts = final.agg(
        F.count(F.lit(1)).cast("long").alias("table_rows"),
        F.round(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                F.lit(0.0),
            ),
            2,
        ).alias("table_revenue"),
    )
    delivered = reattached.agg(
        F.count(F.lit(1)).cast("long").alias("reattached_rows")
    )
    return counts.crossJoin(F.broadcast(delivered)).select(
        "table_rows",
        "table_revenue",
        "reattached_rows",
        F.lit(bool(chain_ok)).alias("chain_bounded"),
        F.lit(bool(history_expired)).alias("history_expired"),
        F.lit(bool(read_post)).alias("read_is_post_compaction"),
    )


@query(
    "versioned_timestamp_travel",
    oracle="""SELECT CAST((SELECT count(*) FROM orders
             WHERE year(o_orderdate) <= 1999) AS BIGINT) AS rows_as_of_t1,
       CAST(count(*) AS BIGINT) AS rows_latest,
       TRUE AS history_stamped
FROM orders WHERE year(o_orderdate) <= 2000""",
)
def versioned_timestamp_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF time travel (r11): every commit now stamps a
    MONOTONIC ``committed_at`` in the manifest (clamped non-decreasing
    under clock skew, Delta's commit-timestamp adjustment), so a
    reader can pin a snapshot by TIME — `version_at_timestamp` resolves
    "latest commit at or before t", `read_version(as_of=...)` and the
    format's ``timestampasof`` option (exercised here, schema-LESS, so
    the r11 inference pins the as-of schema too) serve it, `history`
    exposes the timestamps, and `expire_versions(older_than_s=...)`
    retains by AGE (Delta's retention-hours vacuum; retention only
    ever widens past the count floor). The reproducible-training-run
    story at 100 TB: "the corpus as the pipeline saw it at 02:00" is
    one option, no version bookkeeping in the consumer. A timestamp
    before the earliest RETAINED commit fails loudly (never silently
    the oldest survivor) — pinned with the monotonicity, legacy-NULL,
    and age-vacuum cases in tests/test_versioned.py. Reference
    parity: the reference pins nothing — its serving cache only ever
    holds "now" (redis_etl.py:60); this is the audit/repro upgrade."""
    import time as _time

    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..sources.versioned_source import register as register_vt

    register_vt(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("vt_ts_travel_")
    V.write_version(orders.where(yr <= 1999), store)  # v1
    _time.sleep(0.02)
    t1 = _time.time()  # between v1 and v2: resolves to v1
    _time.sleep(0.02)
    V.append_version(orders.where(yr == 2000), store)  # v2

    as_of = (  # the format path, schema inferred at the as-of version
        spark.read.format("versioned_table")
        .option("path", store)
        .option("timestampasof", str(t1))
        .load()
    )
    # proof: the library resolver agrees, and history is fully stamped
    # in commit order
    stamps = [r.committed_at for r in V.history(spark, store).collect()]
    history_stamped = (
        V.version_at_timestamp(store, t1) == 1
        and all(s is not None for s in stamps)
        and stamps == sorted(stamps)
    )
    latest = V.read_version(spark, store).agg(
        F.count(F.lit(1)).cast("long").alias("rows_latest")
    )
    return (
        as_of.agg(F.count(F.lit(1)).cast("long").alias("rows_as_of_t1"))
        .crossJoin(F.broadcast(latest))
        .select(
            "rows_as_of_t1",
            "rows_latest",
            F.lit(bool(history_stamped)).alias("history_stamped"),
        )
    )


@query(
    "versioned_cdf_stream_sync",
    oracle="""WITH latest AS (
  SELECT o.o_orderkey, o.o_orderdate,
         CASE WHEN year(o.o_orderdate) < 2000 AND o.o_orderkey % 50 = 0
              THEN 100.0 ELSE o.o_totalprice END AS o_totalprice
  FROM orders o
  WHERE year(o.o_orderdate) <= 2000
    AND NOT (year(o.o_orderdate) < 2000 AND o.o_custkey % 97 = 0
             AND o.o_orderkey % 50 <> 0))
SELECT CAST(count(*) AS BIGINT) AS synced_rows,
       round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0), 2) AS synced_revenue,
       TRUE AS matches_table
FROM latest""",
)
def versioned_cdf_stream_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed as a STREAMING source driving a downstream SYNC
    (r11): ``readStream.format("versioned_table")`` with
    ``readchangefeed=true`` delivers each commit's typed change rows —
    inserts, key-only deletes, upserts — with NO ignore* opt-ins
    (typed changes are the feed's contract; before r11 this option
    combination silently fell through to the snapshot stream reader
    with NULL meta columns). The history here is base (<2000) → GDPR
    tombstone (every 97th customer's pre-2000 orders) → one atomic
    upsert (price restated to 100.00 for every 50th key + year-2000
    inserts); the consumer drains the feed (availableNow) and folds it
    Spark-first: per key, the row of the key's LAST change wins
    (window max on ``_commit_version``), delete-typed winners drop —
    i.e. the standard CDC-apply a downstream copy runs, O(changes) per
    sync against a 100 TB table. The ledger checks the SYNCED COPY's
    content (stated directly over orders by the oracle; note a
    tombstoned key that the later upsert re-touches survives with the
    restated price) AND an in-plan proof that the copy equals
    `read_version(latest)` row-for-row (`matches_table` via anti-join
    both ways). Reference parity: scheduler.py:45-73 re-reads whole
    gold tables per cycle; this is the O(delta) streaming version."""
    from pyspark.sql import Window

    from ..pipeline.artifacts import scratch_artifact_dir
    from ..sources import versioned as V
    from ..sources.versioned_source import register as register_vt

    register_vt(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("vt_cdf_sync_")
    base = orders.where(yr < 2000).drop("o_custkey")
    V.write_version(base, store)  # v1
    forget = orders.where((yr < 2000) & (F.col("o_custkey") % 97 == 0)).select(
        "o_orderkey"
    )
    V.delete_version(forget, store, "o_orderkey")  # v2 tombstone
    corrections = (
        orders.where((yr < 2000) & (F.col("o_orderkey") % 50 == 0))
        .drop("o_custkey")
        .withColumn("o_totalprice", F.lit(100.0))
    )
    V.upsert_version(
        corrections.unionByName(orders.where(yr == 2000).drop("o_custkey")),
        store,
        "o_orderkey",
    )  # v3 atomic replace delta

    out = tempfile.mkdtemp(prefix="vt_cdf_sync_out_")
    ckpt = tempfile.mkdtemp(prefix="vt_cdf_sync_ckpt_")
    q = (
        spark.readStream.format("versioned_table")
        .option("path", store)
        .option("readchangefeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = spark.read.schema(
        "o_orderkey long, o_orderdate timestamp, o_totalprice double, "
        "_change_type string, _commit_version long"
    ).parquet(out)

    # CDC apply: last change per key wins; delete-typed winners drop
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("_commit_version").desc()
    )
    synced = (
        feed.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("_change_type") != "delete"))
        .drop("_rn", "_change_type", "_commit_version")
    )
    table = V.read_version(spark, store)
    only_sync = synced.join(table, on="o_orderkey", how="left_anti").count()
    only_table = table.join(synced, on="o_orderkey", how="left_anti").count()
    matches = (only_sync == 0) and (only_table == 0)
    return synced.agg(
        F.count(F.lit(1)).cast("long").alias("synced_rows"),
        F.round(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                F.lit(0.0),
            ),
            2,
        ).alias("synced_revenue"),
    ).select(
        "synced_rows",
        "synced_revenue",
        F.lit(bool(matches)).alias("matches_table"),
    )
