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


def run_corpus_minhash_stream(
    spark: SparkSession,
    landing_dir: str,
    corpus_path: str,
    artifact_path: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    max_files_per_trigger: int = 1,
) -> None:
    """The r09 closing composition, streaming end-to-end: a document
    landing stream commits each micro-batch to the VERSIONED corpus
    exactly once (`append_batch_versioned` — batch-id watermark), and
    the committed LSH bucket artifact then advances from its recorded
    ``corpus_version`` cursor to the new head via the CHANGE FEED
    (`cdf_update_minhash_epoch`) — O(batch) corpus commit + O(delta)
    artifact commit per trigger, never a corpus rescan or an epoch
    republish. Exactly-once on BOTH tables: a replayed batch is
    skipped at the corpus watermark, and the artifact cursor is then
    already at the corpus head so the CDF window nets to zero commits
    (replay-idempotence pinned in
    tests/test_index_maintenance_stream.py, along with parity against
    a full artifact rebuild at the final corpus version). The first
    ever batch seeds BOTH the corpus (full base snapshot) and the
    artifact epoch."""
    from ..pipeline.artifacts import (
        artifact_corpus_cursor,
        cdf_update_minhash_epoch,
        publish_minhash_epoch,
    )
    from ..sources.versioned import read_version, versions
    from .incremental import _run_landing_stream
    from .versioned_sink import append_batch_versioned

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        append_batch_versioned(batch, corpus_path, batch_id)
        head = versions(corpus_path)[-1]["version"]
        if not versions(artifact_path):
            # first epoch: built from the corpus snapshot just landed
            publish_minhash_epoch(
                read_version(spark, corpus_path), artifact_path,
                corpus_version=head,
            )
            return
        cursor = artifact_corpus_cursor(artifact_path)
        if cursor < head:
            cdf_update_minhash_epoch(
                spark, corpus_path, artifact_path, cursor, head
            )

    _run_landing_stream(
        spark,
        landing_dir,
        checkpoint_dir,
        process_batch,
        max_files_per_trigger,
        schema=schema,
    )


def run_corpus_bloom_stream(
    spark: SparkSession,
    landing_dir: str,
    corpus_path: str,
    artifact_path: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, content_hash string",
    key_col: str = "content_hash",
    max_files_per_trigger: int = 1,
    rebuild_stale_ratio: float | None = None,
) -> None:
    """The Bloom twin of `run_corpus_minhash_stream`, plus the
    STALE-FRACTION REBUILD POLICY (VERDICT r09 #7): each micro-batch
    commits to the versioned corpus exactly once, the committed Bloom
    words epoch advances from its ``corpus_version`` cursor via the
    change feed (O(delta) bit_or — insertion is monotone), and because
    deletes can only be COUNTED on a Bloom filter (never subtracted),
    the maintainer REPUBLISHES the epoch from the corpus snapshot once
    `pipeline.artifacts.bloom_stale_fraction` exceeds
    ``rebuild_stale_ratio`` (default `BLOOM_REBUILD_STALE` = 0.2,
    mirroring the IVF occupancy-PSI trigger) — exactly one corpus pass
    per threshold crossing, after which the fraction resets to 0.
    Live-key probe verdicts are identical across a republish; only the
    deleted keys' false positives disappear. Exactly-once on both
    tables as in the minhash twin: replays skip at the corpus
    watermark and net to zero artifact commits at the cursor."""
    from ..pipeline.artifacts import (
        BLOOM_REBUILD_STALE,
        artifact_corpus_cursor,
        cdf_update_bloom_epoch,
        publish_bloom_epoch,
    )
    from ..sources.versioned import read_version, versions
    from .incremental import _run_landing_stream
    from .versioned_sink import append_batch_versioned

    ratio = (
        BLOOM_REBUILD_STALE if rebuild_stale_ratio is None else rebuild_stale_ratio
    )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        append_batch_versioned(batch, corpus_path, batch_id)
        head = versions(corpus_path)[-1]["version"]
        if not versions(artifact_path):
            publish_bloom_epoch(
                read_version(spark, corpus_path),
                key_col,
                artifact_path,
                corpus_version=head,
            )
            return
        cursor = artifact_corpus_cursor(artifact_path)
        if cursor < head:
            cdf_update_bloom_epoch(
                spark,
                corpus_path,
                artifact_path,
                cursor,
                head,
                key_col=key_col,
                rebuild_stale_ratio=ratio,
            )

    _run_landing_stream(
        spark,
        landing_dir,
        checkpoint_dir,
        process_batch,
        max_files_per_trigger,
        schema=schema,
    )
