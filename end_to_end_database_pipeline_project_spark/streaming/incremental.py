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

All landing-stream consumers share one runner (``_run_landing_stream``)
and one maintenance body (``_maintain_silver_gold``) so the batch
pipeline, the CDC apply, and the monitored pipeline cannot silently
diverge (r07 review: the maintenance body existed in two copies).
"""

from __future__ import annotations

import os
from collections.abc import Callable

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


def _run_landing_stream(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    hook: Callable[[DataFrame, int], None],
    max_files_per_trigger: int = 1,
    schema: str = EVENT_SCHEMA,
) -> None:
    """Consume the parquet landing directory to completion
    (availableNow semantics) through ``hook`` — the ONE place the
    landing-stream source/sink plumbing is spelled, shared by every
    landing-stream consumer (event maintenance/CDC/monitored
    pipelines, the document curation stream, the embedding
    index-maintenance stream, the drift monitor) so they cannot
    silently diverge. ``schema`` picks the landing row shape; all
    other plumbing (file trigger, glob, checkpoint, availableNow,
    stop-on-exit) is identical by construction."""
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "part-*")
        .parquet(landing_dir)
        .writeStream.foreachBatch(hook)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()


def _maintain_silver_gold(
    spark: SparkSession, out_dir: str, batch: DataFrame
) -> None:
    """The per-batch maintenance body: silver append + partition-scoped
    gold refresh of exactly the months the batch touched."""
    silver_path = os.path.join(out_dir, "silver")
    silver = normalize_batch(batch)
    # AT-LEAST-ONCE by design: a failure between this append and the
    # streaming checkpoint commit replays the batch, appending its
    # silver rows twice (and gold, recomputed FROM silver, inherits the
    # duplicates). Where the sink has a key this pipeline uses the
    # idempotent form instead — `run_cdc_apply`'s latest-wins MERGE,
    # the monitor sinks' per-batch_id dynamic partition overwrite; a
    # keyless fact append has no such handle short of writing
    # batch_id-partitioned silver, which would fragment the table the
    # gold refresh scans.
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


def run_incremental_pipeline(
    spark: SparkSession, landing_dir: str, out_dir: str, max_files_per_trigger: int = 1
) -> None:
    """Consume the landing directory to completion, maintaining silver
    (append) and gold daily (partition-scoped refresh) per micro-batch."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        _maintain_silver_gold(spark, out_dir, batch)

    _run_landing_stream(
        spark,
        landing_dir,
        os.path.join(out_dir, "_checkpoint"),
        process_batch,
        max_files_per_trigger,
    )


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

    _run_landing_stream(
        spark,
        landing_dir,
        snapshot_dir.rstrip("/") + "_checkpoint",
        apply_batch,
        max_files_per_trigger,
    )


def run_monitored_incremental_pipeline(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    hist: DataFrame,
    grid: DataFrame,
    max_files_per_trigger: int = 1,
) -> str:
    """The reference's periodic-sync loop WITH observability: one
    ``foreachBatch`` hook that composes the SAME maintenance body as
    ``run_incremental_pipeline`` (``_maintain_silver_gold`` — shared,
    not copied, so the two pipelines cannot drift) with a
    drift-monitoring step scoring the batch's raw value distribution
    against the reference artifacts (``streaming.drift``), writing one
    monitor row per batch to ``out_dir/monitor`` under its own
    ``batch_id`` partition (dynamic overwrite — replay-idempotent;
    ``batch_id`` reads back as an inferred-int partition column, and
    the layout is partitioned from r08 on, so point fresh runs at
    fresh monitor dirs). This is the
    composition a production deployment runs: every sync also answers
    "did this batch stop looking like the corpus" for the cost of one
    extra batch pass against two broadcast-sized artifacts. Returns
    the monitor table path.

    tests/test_streaming_drift_monitor.py asserts gold still equals
    the full-history batch rollup (the maintenance is untouched by the
    monitoring) and the monitor rows equal the standalone monitor's.
    """
    from .drift import ks_against_reference, psi_against_reference

    monitor_path = os.path.join(out_dir, "monitor")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint()  # consumed by maintenance + monitor
        _maintain_silver_gold(spark, out_dir, batch)
        b = batch.where(F.col("value").isNotNull()).select(
            F.lit(batch_id).cast("long").alias("batch_id"), "value"
        )
        if not b.take(1):
            return
        psi = psi_against_reference(b, hist, group_cols=["batch_id"])
        ks = ks_against_reference(b, grid, group_cols=["batch_id"]).select(
            "batch_id", "ks_d", "ks_crit", F.col("drifted").alias("ks_drifted")
        )
        # per-batch_id dynamic overwrite: replayed batches rewrite
        # their own partition, never duplicate monitor rows (r07 advice)
        psi.join(ks, ["batch_id"]).write.partitionBy("batch_id").option(
            "partitionOverwriteMode", "dynamic"
        ).mode("overwrite").parquet(monitor_path)

    _run_landing_stream(
        spark,
        landing_dir,
        os.path.join(out_dir, "_checkpoint"),
        process_batch,
        max_files_per_trigger,
    )
    return monitor_path
