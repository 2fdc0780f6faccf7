"""The reference's four-store pipeline as one Spark job graph (SURVEY.md §3.1).

Reference shape: NWS API -> MongoDB (bronze) -> ClickHouse (silver+gold)
-> Redis (serving), four processes over four networks
(run_pipeline.py:9-65). Spark shape: one lineage-explicit DataFrame DAG

    bronze (nested docs) --explode/normalize--> silver (flat facts)
      --rollup chain--> gold (daily/monthly) --envelope--> serving

with each layer persistable as parquet. The cross-store network
boundaries disappear; the only remaining boundary is source ingestion.

Layer semantics ported exactly:
- bronze docs carry the raw nested shape + lineage ids (S6, §3.4);
- silver rows apply P1/P2 normalization incl. unit sniffing (F1/F3);
- gold applies the A1→A2→A3 dedup-rollup hierarchy with audit columns
  (A7: warehouse_load_time, rows_loaded, load_mode);
- serving applies the humidity cap (F12), JSON envelope (F14/S15) and
  TTL-freshness status (S16) — TTL modeled as data, not wall-clock.

Scale: silver is written partitioned by date and sorted within
partitions by (timestamp, station) — the Spark analog of the MergeTree
``ORDER BY (timestamp, station_id)`` clustering (§1.4); gold refresh is
an idempotent overwrite (no SummingMergeTree delete dance, §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import scalar
from ..operators.rollup import daily_rollup, hourly_aggregate, monthly_rollup
from ..sources.catalog import load_table


def build_bronze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble raw nested documents from events — one doc per
    (station, day), observations[] inside, lineage stamped from data
    (deterministic; SURVEY.md §5.3). Mirrors the fetcher's document
    assembly (nws_api_fetcher_v2.py:121-195)."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "user_id",
        F.to_date("ts").alias("obs_date"),
        F.struct(
            F.struct(
                F.col("ts").alias("timestamp"),
                F.concat(F.lit("https://stations/"), F.col("user_id")).alias("station"),
                F.struct(F.col("value").alias("value")).alias("temperature"),
                F.struct((F.col("value") / 200).alias("value")).alias(
                    "precipitationLastHour"
                ),
                F.struct(
                    F.get_json_object("props", "$.k").cast("double").alias("value")
                ).alias("relativeHumidity"),
            ).alias("properties")
        ).alias("obs"),
    )
    return obs.groupBy("user_id", "obs_date").agg(
        F.sort_array(F.collect_list("obs")).alias("observations")
    ).select(
        F.concat(F.lit("batch_"), F.date_format("obs_date", "yyyyMMdd")).alias(
            "etl_batch_id"
        ),
        F.concat(F.lit("req_"), F.col("user_id"), F.lit("_"), F.col("obs_date")).alias(
            "api_request_id"
        ),
        "user_id",
        "obs_date",
        "observations",
    )


def bronze_to_silver(bronze: DataFrame, quarantine: bool = False) -> DataFrame:
    """Explode + normalize (P1/P2): nested properties to the flat
    12-ish-column silver schema with unit sniffing, id synthesis and
    lineage carried (clickhouse_etl.py:207-256 as one select).

    Error-row policy (SURVEY.md §7.4): the reference silently drops
    unparseable observations (clickhouse_etl.py:254-256). Default
    replicates that (timestamp-null rows dropped); ``quarantine=True``
    keeps every row and adds a ``_quarantined`` flag instead, so bad
    records stay auditable downstream."""
    ex = bronze.select(
        "etl_batch_id",
        "api_request_id",
        F.explode("observations").alias("o"),
    )
    props = F.col("o.properties")
    out = ex.select(
        scalar.synthetic_id(
            scalar.last_path_segment(props["station"]),
            F.expr("unix_micros(o.properties.timestamp) div 1000").cast("string"),
        ).alias("observation_id"),
        scalar.last_path_segment(props["station"]).alias("station_id"),
        props["timestamp"].alias("timestamp"),
        scalar.kelvin_sniff_to_celsius(props["temperature"]["value"]).alias(
            "temperature_c"
        ),
        scalar.meters_sniff_to_mm(props["precipitationLastHour"]["value"]).alias(
            "rainfall_mm"
        ),
        props["relativeHumidity"]["value"].alias("humidity_percent"),
        "etl_batch_id",
        "api_request_id",
    )
    if quarantine:
        return out.withColumn("_quarantined", F.col("timestamp").isNull())
    return out.where(F.col("timestamp").isNotNull())


def latest_wins_upsert(
    base: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """MERGE-shape maintenance: apply a delta batch onto a snapshot with
    latest-version-wins semantics — matched keys take the newer row
    (delta preferred on version ties, the re-delivery convention),
    unmatched delta rows insert, unmatched base rows persist.

    Implemented as union + per-key argmax rather than a full outer
    join: one shuffle on the key, and each key group is tiny (one row
    per side), so the window never concentrates data. At 100 TB the
    companion optimization is partition scoping — restrict ``base`` to
    the partitions the delta touches and rewrite only those (see
    ``refresh_gold_daily_months``); the merge itself stays this
    one-shuffle shape."""
    pref = F.lit(0)
    b = base.withColumn("_pref", pref)
    d = delta.withColumn("_pref", F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(version_col), F.desc("_pref")
    )
    return (
        b.unionByName(d)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_pref")
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-files compaction — the maintenance op every streaming/
    backfill landing zone needs: micro-batches and per-day fetch loops
    leave thousands of KB-sized files, and at 100 TB the scan's task
    count (and the namenode's metadata load) is driven by file count,
    not byte count.

    Sizes the output file count from the actual on-disk bytes
    (ceil(bytes/target)), rewrites via repartition — a full shuffle,
    which is what makes the output files uniformly sized rather than
    inheriting input skew — optionally re-sorting within files so
    parquet min/max stats stay selective, then atomically replaces the
    directory. Returns the output file count.

    At cluster scale this runs per-partition-directory (compact only
    partitions whose file count exceeds a threshold), exactly like the
    partition-scoped gold refresh."""
    import shutil

    src_files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in src_files)
    n_out = max(1, -(-total // target_bytes))
    df = spark.read.parquet(path).repartition(n_out)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    tmp = path.rstrip("/") + ".compact.tmp"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.replace(tmp, path)
    return len([f for f in os.listdir(path) if f.endswith(".parquet")])


def write_silver(silver: DataFrame, out_dir: str) -> None:
    """Silver at rest: date-partitioned, clustered within partitions —
    parquet min/max stats give the same pruning the MergeTree ORDER BY
    provided."""
    (
        silver.withColumn("obs_date", F.to_date("timestamp"))
        .repartition("obs_date")
        .sortWithinPartitions("timestamp", "station_id")
        .write.mode("overwrite")
        .partitionBy("obs_date")
        .parquet(os.path.join(out_dir, "silver"))
    )


def gold_tables(silver: DataFrame) -> tuple[DataFrame, DataFrame]:
    hourly = hourly_aggregate(silver, ts="timestamp", measure="temperature_c")
    daily = daily_rollup(hourly)
    monthly = monthly_rollup(daily)
    return daily, monthly


def serving_view(daily: DataFrame, monthly: DataFrame, as_of: str) -> DataFrame:
    """Serving envelope (S15/S16 analog): last-30-days slice with the
    humidity-cap semantics applied to the avg measure, cache freshness
    derived from data (as_of is the injectable 'now')."""
    capped = daily.withColumn("avg_value", scalar.humidity_cap(F.col("avg_value")))
    latest = F.max("obs_date").over(Window.partitionBy())
    return (
        capped.withColumn(
            "sync_status",
            F.when(
                F.datediff(F.lit(as_of).cast("date"), latest) <= 1, F.lit("full")
            ).otherwise(F.lit("partial")),
        )
        .orderBy(F.desc("obs_date"))
        .limit(30)
    )


def write_gold_daily(daily: DataFrame, out_dir: str) -> None:
    """Gold daily at rest, partitioned by month so refresh can be
    partition-scoped."""
    (
        daily.withColumn("obs_month", F.date_format("obs_date", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("obs_month")
        .parquet(os.path.join(out_dir, "gold_daily"))
    )


def refresh_gold_daily_months(
    silver: DataFrame, out_dir: str, months: list[str]
) -> None:
    """Partition-scoped gold refresh — the reference recomputes ALL
    aggregates from full history every sync, then ALTER TABLE DELETEs
    affected periods before re-insert (clickhouse_etl.py:309-334,
    341-346; O(history) per sync, SURVEY.md §6). Here only the affected
    month partitions are recomputed from the silver slice and swapped
    atomically via dynamic partition overwrite — O(delta). Valid because
    the rollup hierarchy never crosses a month boundary.

    At 100 TB this is the difference between re-shuffling the entire
    fact table per sync and touching only the partitions a sync landed
    data in."""
    spark = silver.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        sl = silver.where(
            F.date_format(F.to_date("timestamp"), "yyyy-MM").isin(months)
        )
        daily = daily_rollup(
            hourly_aggregate(sl, ts="timestamp", measure="temperature_c")
        )
        (
            daily.withColumn("obs_month", F.date_format("obs_date", "yyyy-MM"))
            .write.mode("overwrite")
            .partitionBy("obs_month")
            .parquet(os.path.join(out_dir, "gold_daily"))
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_gold_daily(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "gold_daily")).drop("obs_month")


def run_medallion(spark: SparkSession, sf_dir: str, out_dir: str | None = None) -> DataFrame:
    """End-to-end: bronze -> silver -> gold -> serving. Optionally
    persists each layer under out_dir. Returns the serving frame."""
    bronze = build_bronze(spark, sf_dir)
    silver = bronze_to_silver(bronze)
    if out_dir:
        bronze.write.mode("overwrite").parquet(os.path.join(out_dir, "bronze"))
        write_silver(silver, out_dir)
    daily, monthly = gold_tables(silver)
    if out_dir:
        daily.write.mode("overwrite").parquet(os.path.join(out_dir, "gold_daily"))
        monthly.write.mode("overwrite").parquet(os.path.join(out_dir, "gold_monthly"))
    as_of = silver.agg(F.date_format(F.max("timestamp"), "yyyy-MM-dd").alias("d")).collect()[0]["d"]
    return serving_view(daily, monthly, as_of)


def backfill_bronze_days(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    max_days: int = 7,
    rate_limit_s: float = 0.0,
    fetch_day=None,
    sleep=None,
) -> list[str]:
    """S5 analog: the bounded, rate-limited historical backfill
    (nws_api_fetcher_v2.py:79-119) as a day-partitioned bronze landing
    loop. The reference walks per-day windows newest-first, caps the
    horizon at 7 days, sleeps between requests and tolerates failed
    windows (HTTP 400 -> skip); here each day window is fetched
    (default: sliced from the events fixture — in production an HTTP
    reader), written as one bronze day-partition, and failures skip the
    day without aborting the backfill. Returns the list of day strings
    actually landed.

    The driver-side loop is ingestion orchestration, not a data-plane
    operator: each iteration's WORK is a distributed write, the loop
    just sequences bounded external requests (exactly why the reference
    rate-limits). Re-running is idempotent — day partitions overwrite."""
    import time as _time

    ev = load_table(spark, sf_dir, "events")
    days = [
        r["d"]
        for r in ev.select(F.to_date("ts").alias("d"))
        .distinct()
        .orderBy(F.desc("d"))
        .limit(max_days)
        .collect()
    ]
    sleep = sleep or _time.sleep
    landed: list[str] = []
    for i, day in enumerate(days):
        if i and rate_limit_s:
            sleep(rate_limit_s)
        try:
            batch = (
                fetch_day(spark, sf_dir, day)
                if fetch_day
                else ev.where(F.to_date("ts") == F.lit(day))
            )
            (
                batch.write.mode("overwrite").parquet(
                    os.path.join(out_dir, f"day={day.isoformat()}")
                )
            )
            landed.append(day.isoformat())
        except Exception:
            continue  # the reference tolerates a failed window (HTTP 400)
    return landed
