"""Continuous ANN-index maintenance over an embedding landing stream.

The streaming composition of `pipeline.artifacts`: every micro-batch
of newly-embedded vectors is assigned to the COMMITTED centroid epoch
(`centroid_maintenance_report` — broadcast argmax, no re-fit, the
reference enters only as the artifact's per-cell count rows) and the
per-cell report lands under the batch's own ``batch_id`` partition
(dynamic overwrite — replays rewrite their rows, the drift-monitor
sink discipline). When a batch's ``rebuild_recommended`` fires, the
operator republishes the epoch (`publish_centroid_epoch` — a version
bump through the manifest swap; tests pin the full loop) and the
stream keeps probing the new version without restarting: the report
reads the LATEST committed version at each batch unless pinned.

Batch-equivalence contract (tests/test_index_maintenance_stream.py,
the `run_drift_monitor` style): each streamed batch's monitor rows
equal `centroid_maintenance_report` run on that slice directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.artifacts import centroid_maintenance_report

EMBEDDING_SCHEMA = "vec_id long, embedding array<double>"


def run_index_maintenance_stream(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    artifact_path: str,
    max_files_per_trigger: int = 1,
) -> str:
    """Consume the embedding landing stream to completion
    (availableNow), scoring every micro-batch against the committed
    centroid epoch and writing its per-cell report to
    ``out_dir/monitor`` under its own ``batch_id`` partition. Returns
    the monitor table path."""
    from .incremental import _run_landing_stream

    monitor_path = os.path.join(out_dir, "monitor")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        rep = centroid_maintenance_report(spark, artifact_path, batch).select(
            F.lit(batch_id).cast("long").alias("batch_id"), "*"
        )
        rep.write.partitionBy("batch_id").option(
            "partitionOverwriteMode", "dynamic"
        ).mode("overwrite").parquet(monitor_path)

    _run_landing_stream(
        spark,
        landing_dir,
        os.path.join(out_dir, "_checkpoint"),
        process_batch,
        max_files_per_trigger,
        schema=EMBEDDING_SCHEMA,
    )
    return monitor_path
