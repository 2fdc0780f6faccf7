"""Watermark semantics: late rows are dropped, on-time state emits.

The reference never drops late data (every sync recomputes gold from
full history — SURVEY.md §2.10); the streaming analog bounds state with
a watermark instead, which necessarily drops events arriving later than
the bound. This pins that behavior: a second micro-batch delivering
rows 10+ hours older than the stream's high-water mark must NOT create
their window, while on-time windows closed by the final watermark must
emit exactly once (append mode).
"""

from __future__ import annotations

import time
import uuid
from datetime import datetime, timezone

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.streaming.pipeline import (
    hourly_windowed_agg,
)


def _rows(hours, n_per_hour=3):
    base = datetime(2024, 3, 1, tzinfo=timezone.utc)
    out = []
    eid = 0
    for h in hours:
        for i in range(n_per_hour):
            out.append(
                (eid, base.replace(hour=h, minute=5 * i + 1), float(100 + h))
            )
            eid += 1
    return out


def test_late_rows_dropped_on_time_windows_emit(spark, tmp_path):
    src = str(tmp_path / "landing")
    schema = "event_id long, ts timestamp, value double"
    # batch 1: hours 10..20 — advances the watermark to ~18:xx (2h bound)
    spark.createDataFrame(_rows(range(10, 21)), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)  # distinct mtime => file order == arrival order
    # batch 2: hour 0 of the same day — 10+ hours behind the watermark
    spark.createDataFrame(_rows([0]), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = hourly_windowed_agg(stream, watermark="2 hours")
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["obs_hour"].hour: r["observation_count"]
        for r in spark.table(name).collect()
    }
    # the late hour-0 rows were behind the watermark -> no window
    assert 0 not in got, f"late data must be dropped, got {got}"
    # on-time windows closed by the final watermark (max 20:11 - 2h)
    # emitted exactly the per-hour row count
    assert got, "closed on-time windows must emit in append mode"
    assert all(v == 3 for v in got.values()), got
    assert set(got) <= set(range(10, 21))


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the state-BOUNDED dedup — unlike
    plain dropDuplicates (whose key state lives forever), re-deliveries
    are suppressed only while the key is within the watermark, and the
    state is then evicted. Two micro-batches: batch 2 re-delivers a
    batch-1 event inside the watermark (must be dropped) along with a
    fresh event (must survive)."""
    import time
    import uuid
    import datetime as dt

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)

    def ev(eid, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), 1, "click", 1.0, "{}")

    src = str(tmp_path / "landing")
    batch1 = [ev(1, 0), ev(2, 5)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # re-delivery of event 2 (same key, later arrival) + a new event 3
    batch2 = [ev(2, 5), ev(3, 10)]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "part-*")
        .parquet(src)
    )
    deduped = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = f"ddww_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        if q.isActive:
            q.stop()
    assert n_batches >= 2
    got = sorted(r["event_id"] for r in spark.table(name).collect())
    assert got == [1, 2, 3], f"re-delivered event must be dropped once: {got}"
