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
