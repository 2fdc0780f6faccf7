"""Structured Streaming analog of the reference's scheduler-driven
micro-batching (SURVEY.md §2.10, M5).

The reference "streams" by re-running batch syncs every 30/60 minutes
(scheduler.py:45-73) and tolerates re-delivered observations via its
max-per-hour aggregate. Here that becomes a real streaming pipeline:

- file source (parquet) with explicit schema — the landing-zone pattern:
  each scheduler tick's fetch drops files, the stream picks them up;
- ``dropDuplicates`` on the natural key bounded by a watermark
  (the dedup the reference got implicitly from max-per-hour);
- 1-hour tumbling window aggregate (``toStartOfHour`` analog);
- ``availableNow`` trigger = the reference's catch-up batch semantics,
  ``processingTime`` trigger = its interval scheduler.

Batch-equivalence: with a catch-up trigger over static input, the
windowed result equals the batch hourly aggregate — asserted by the
oracle and tests/test_streaming.py.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (explicit schema —
    streaming sources never infer), ts normalized like the batch loader.

    The fixture's physical ts type has varied across driver generations
    — TIMESTAMP(NANOS) (readable only as raw int64 via ``nanosAsLong``)
    vs TIMESTAMP(MICROS, isAdjustedToUTC=false) — so probe the footer
    with a zero-row batch read and pick the matching streaming schema
    instead of hardcoding one."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # stateful streaming disables AQE, so the static shuffle width is
    # used as-is: on an externally-created session that's the 200
    # default — 200 state-store instances for fixtures that fill 32.
    # Pin to the engine's parallelism unless the session owner already
    # chose a non-default value.
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
        )
    probed = (
        spark.read.option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .schema["ts"]
        .dataType
    )
    # file streaming sources require a directory basePath; select just
    # the events file out of the fixture dir with a glob filter
    raw = (
        spark.readStream.schema(_events_schema(probed))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(probed, T.LongType):  # TIMESTAMP(NANOS) as raw int64
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif not isinstance(probed, T.TimestampType):
        # type object, not the string "timestamp" — see catalog.load_table
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def hourly_windowed_agg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Deduped 1-hour tumbling aggregate: watermark bounds both the
    dropDuplicates state and the window state; at steady state the
    memory footprint is (hours within watermark) x (distinct keys)."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicates(["event_id"])
        .where(F.col("value").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(
            # decimal-exact sum / count instead of avg(): double
            # summation is order-dependent and micro-batch boundaries
            # change the order, so a round-6 oracle hash can straddle a
            # boundary at larger SFs; the decimal(25,12) sum is exact
            # and order-independent (truncation error ~5e-13 per value)
            (
                F.sum(F.col("value").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
            F.count(F.lit(1)).alias("observation_count"),
        )
        .select(
            F.col("win.start").alias("obs_hour"),
            "avg_value",
            "max_value",
            "min_value",
            "observation_count",
        )
    )


def run_stream_to_table(
    agg: DataFrame, output_mode: str = "complete", name_prefix: str = "stream"
) -> DataFrame:
    """Run a streaming frame to completion over its (static) source —
    availableNow trigger into a memory sink — and return the sink
    contents as a batch DataFrame.

    Complete output mode (aggregations) emits open windows newer than
    the watermark too, giving exact batch equivalence; update mode is
    for arbitrary-stateful ops (applyInPandasWithState), whose sink then
    holds one row per (key, batch) — callers reduce to the final row."""
    spark = agg.sparkSession
    name = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
    return spark.table(name)


def run_hourly_stream_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the hourly windowed stream to completion over the static
    fixture and return the result as a batch DataFrame."""
    return run_stream_to_table(
        hourly_windowed_agg(stream_events(spark, sf_dir)), "complete", "stream_hourly"
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    interval: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner interval join: purchases matched to the same
    user's clicks in the preceding ``interval``.

    Both sides carry watermarks, which is what lets Spark BOUND the join
    state: a buffered click can be dropped once the watermark passes
    click_ts + interval (no purchase arriving later can match it), so
    steady-state memory is O(events within watermark), not O(stream).
    Inner-join matches emit as soon as both sides arrive — append mode
    needs no window close. ``how="leftOuter"`` additionally emits each
    unmatched purchase null-padded once the watermark proves no match
    can still arrive (the state-eviction point).

    ``left``/``right`` are streaming event frames (event_id, ts,
    user_id, event_type, ...); attribution = each purchase joined to
    every click of the same user within [purchase_ts - interval,
    purchase_ts]."""
    p = (
        left.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    c = (
        right.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    # leftOuter adds the unmatched-purchase rows: Spark holds them in
    # state and emits the null-padded row only once BOTH watermarks
    # guarantee no future click can match (purchase_ts + interval <
    # watermark) — so outer results are late by design, never wrong.
    joined = p.join(
        c,
        F.expr(
            "p_user = c_user AND "
            f"click_ts BETWEEN purchase_ts - interval {interval} "
            "AND purchase_ts"
        ),
        how,
    )
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
    )
