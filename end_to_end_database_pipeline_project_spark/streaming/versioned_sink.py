"""Exactly-once streaming sink into the versioned table.

``incremental._maintain_silver_gold`` documents the one hole in the
landing pipeline's delivery story: a KEYLESS fact append is
at-least-once — a failure between the parquet append and the streaming
checkpoint commit replays the batch and duplicates its rows, and
without a key there is no MERGE/overwrite handle to dedup by. The
versioned table's manifest IS that handle: ``append_batch_versioned``
records the micro-batch id in the committed manifest entry, so a
replayed batch (its id at or below the table's high-watermark) is
skipped BEFORE any write — the sink is idempotent without the rows
carrying any key. This is the transaction-log trick every lakehouse
streaming sink uses (Delta's txn appId/version watermark): the commit
and the "which batch was that" record are one atomic manifest swap.

Downstream, a consumer keeps a version cursor and calls
``sources.versioned.incremental_scan(cursor, latest)`` — each committed
batch is read exactly once, O(delta) per sync. Together: streaming
ingest -> delta-log table -> incremental consumers, end-to-end
exactly-once, no keys required.

Concurrent writers serialize under the table's commit lock (see
``sources.versioned._acquire_commit_lock``); the watermark check in
``append_batch_versioned`` runs OUTSIDE that lock, so two streams
writing the SAME table must still be distinct pipelines with distinct
batch-id spaces — one streaming sink per table is the supported
shape (Delta's per-appId txn watermark has the same contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.versioned import (
    _read_manifest,
    append_version,
    versions,
    write_version,
)


def last_committed_batch(path: str) -> int:
    """The table's batch high-watermark: the largest ``batch_id`` any
    committed manifest entry carries, or the table-level
    ``batch_watermark`` that ``expire_versions`` carries forward when
    it drops batch-stamped entries (-1 if neither exists)."""
    manifest = _read_manifest(path)
    entry_wm = max(
        (v.get("batch_id", -1) for v in manifest["versions"]), default=-1
    )
    return max(entry_wm, manifest.get("batch_watermark", -1))


def append_batch_versioned(
    batch: DataFrame,
    path: str,
    batch_id: int,
    stats_cols: tuple[str, ...] = (),
) -> int | None:
    """Commit a micro-batch as the table's next version, exactly once.

    A batch at or below the committed high-watermark is a replay: it
    is skipped before any data is written, returning None. Precisely:
    within one checkpoint lineage this is exactly-once under any
    failure point (the replayed batch keeps its id). A WIPED
    checkpoint re-delivers history with ids restarting at 0, which
    this watermark also absorbs as long as the landing set only GREW
    — the old files re-deliver below the watermark in their original
    order (the file source lists deterministically for an unchanged
    prefix), new files commit above it; a landing whose history was
    reordered or rewritten needs a fresh table path, same as any
    transaction-log sink. The
    first ever batch lands as the FULL base snapshot, later ones as
    appends — so the table is immediately chain-readable and
    CDF-scannable. The ONE body both the foreachBatch hook and the
    registered ledger query call (single-body discipline)."""
    if batch_id <= last_committed_batch(path):
        return None
    meta = {"batch_id": batch_id}
    if not versions(path):
        return write_version(batch, path, stats_cols=stats_cols, meta=meta)
    return append_version(batch, path, stats_cols=stats_cols, meta=meta)


def run_versioned_sink_stream(
    spark: SparkSession,
    landing_dir: str,
    table_path: str,
    checkpoint_dir: str,
    schema: str,
    stats_cols: tuple[str, ...] = (),
    max_files_per_trigger: int = 1,
    max_chain: int | None = None,
) -> None:
    """Consume the parquet landing directory to completion, committing
    each micro-batch to the versioned table exactly once (see
    ``append_batch_versioned``). Same landing plumbing as every other
    consumer (``incremental._run_landing_stream``).

    ``max_chain`` (opt-in) bounds the table's merge-on-read debt:
    after each committed batch, ``sources.versioned.maybe_compact``
    squashes the chain into a fresh full snapshot once it exceeds the
    budget — the plan-depth envelope for a long-running sink (a
    months-long stream otherwise accretes an unbounded delta log and
    an unbounded read plan). A replayed batch commits nothing, so it
    never triggers a spurious compaction. Leave None when downstream
    CDF/stream consumers cannot tolerate mid-history rewrites at this
    cadence (they must resync across a compaction)."""
    from ..sources.versioned import maybe_compact
    from .incremental import _run_landing_stream

    def hook(batch: DataFrame, batch_id: int) -> None:
        committed = append_batch_versioned(
            batch, table_path, batch_id, stats_cols
        )
        if committed is not None and max_chain is not None:
            maybe_compact(spark, table_path, max_chain, stats_cols=stats_cols)

    _run_landing_stream(
        spark,
        landing_dir,
        checkpoint_dir,
        hook,
        max_files_per_trigger=max_files_per_trigger,
        schema=schema,
    )
