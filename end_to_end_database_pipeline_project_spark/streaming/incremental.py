"""Streaming ingestion driving incremental gold maintenance.

The reference's scheduler re-runs the whole warehouse sync every 30-60
minutes, recomputing every aggregate from full history
(clickhouse_etl.py:309-334 — no date predicate; SURVEY.md §6). The
Spark-native form: a file-landing stream whose ``foreachBatch`` hook

1. normalizes the micro-batch to silver and appends it to the silver
   table (the incremental fact load, S12);
2. computes which month partitions the batch touched;
3. recomputes ONLY those partitions from accumulated silver and swaps
   them in via dynamic partition overwrite
   (``pipeline.medallion.refresh_gold_daily_months``).

Per sync the work is O(batch + touched-partition history), not
O(full history). ``availableNow`` + ``maxFilesPerTrigger`` gives the
catch-up batch cadence; ``processingTime`` gives the reference's
interval scheduling — the batch hook is identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalar
from ..pipeline.medallion import refresh_gold_daily_months

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def normalize_batch(batch: DataFrame) -> DataFrame:
    """Flat-event normalization to the silver shape the gold refresh
    expects (unit sniffing + station id, P1/P2 over an already-flat
    landing format)."""
    return batch.select(
        F.col("user_id").cast("string").alias("station_id"),
        F.col("ts").alias("timestamp"),
        scalar.kelvin_sniff_to_celsius(F.col("value")).alias("temperature_c"),
    ).where(F.col("timestamp").isNotNull())


def run_incremental_pipeline(
    spark: SparkSession, landing_dir: str, out_dir: str, max_files_per_trigger: int = 1
) -> None:
    """Consume the landing directory to completion, maintaining silver
    (append) and gold daily (partition-scoped refresh) per micro-batch."""
    silver_path = os.path.join(out_dir, "silver")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        silver = normalize_batch(batch)
        silver.write.mode("append").parquet(silver_path)
        months = [
            r["m"]
            for r in silver.select(
                F.date_format(F.to_date("timestamp"), "yyyy-MM").alias("m")
            )
            .distinct()
            .collect()
        ]
        if not months:
            return
        full_silver = spark.read.parquet(silver_path)
        refresh_gold_daily_months(full_silver, out_dir, months)

    q = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "part-*")
        .parquet(landing_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()


def run_cdc_apply(
    spark: SparkSession,
    landing_dir: str,
    snapshot_dir: str,
    key_cols: list[str],
    version_col: str = "ts",
    max_files_per_trigger: int = 1,
) -> None:
    """Streaming CDC apply: each micro-batch of change records is
    MERGEd onto the persisted snapshot with latest-version-wins
    semantics (``pipeline.medallion.latest_wins_upsert``) and the
    snapshot swapped atomically — the foreachBatch sink pattern for
    change-data feeds when the table store has no native MERGE (plain
    parquet here; the same hook body works against any format).

    Per batch the cost is O(snapshot + batch) — at 100 TB the
    snapshot side is partition-scoped to the partitions the batch
    touches, like the gold refresh. The checkpoint makes redelivered
    batches idempotent: re-applying the same delta is a no-op under
    latest-wins."""
    import shutil

    from ..pipeline.medallion import latest_wins_upsert

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        if os.path.isdir(snapshot_dir):
            base = spark.read.parquet(snapshot_dir)
            merged = latest_wins_upsert(base, batch, key_cols, version_col)
        else:
            merged = batch
        tmp = snapshot_dir.rstrip("/") + f".b{batch_id}.tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(snapshot_dir):
            shutil.rmtree(snapshot_dir)
        os.replace(tmp, snapshot_dir)

    q = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "part-*")
        .parquet(landing_dir)
        .writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation", snapshot_dir.rstrip("/") + "_checkpoint"
        )
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()


def run_monitored_incremental_pipeline(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    hist: DataFrame,
    grid: DataFrame,
    max_files_per_trigger: int = 1,
) -> str:
    """The reference's periodic-sync loop WITH observability: one
    ``foreachBatch`` hook that (1) appends the normalized micro-batch
    to silver, (2) refreshes only the touched gold month partitions,
    and (3) scores the batch's raw value distribution against the
    reference drift artifacts (``streaming.drift``), appending one
    monitor row per batch to ``out_dir/monitor``. This is the
    composition a production deployment runs: every sync also answers
    "did this batch stop looking like the corpus" for the cost of one
    extra batch pass against two broadcast-sized artifacts. Returns
    the monitor table path.

    tests/test_streaming_drift_monitor.py asserts gold still equals
    the full-history batch rollup (the maintenance is untouched by the
    monitoring) and the monitor rows equal the standalone monitor's.
    """
    from .drift import ks_against_reference, psi_against_reference

    silver_path = os.path.join(out_dir, "silver")
    monitor_path = os.path.join(out_dir, "monitor")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint()  # consumed by 2 branches + monitor
        silver = normalize_batch(batch)
        silver.write.mode("append").parquet(silver_path)
        months = [
            r["m"]
            for r in silver.select(
                F.date_format(F.to_date("timestamp"), "yyyy-MM").alias("m")
            )
            .distinct()
            .collect()
        ]
        if months:
            full_silver = spark.read.parquet(silver_path)
            refresh_gold_daily_months(full_silver, out_dir, months)
        b = batch.where(F.col("value").isNotNull()).select(
            F.lit(batch_id).cast("long").alias("batch_id"), "value"
        )
        if not b.take(1):
            return
        psi = psi_against_reference(b, hist, group_cols=["batch_id"])
        ks = ks_against_reference(b, grid, group_cols=["batch_id"]).select(
            "batch_id", "ks_d", "ks_crit", F.col("drifted").alias("ks_drifted")
        )
        psi.join(ks, ["batch_id"]).write.mode("append").parquet(monitor_path)

    q = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "part-*")
        .parquet(landing_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
    return monitor_path
