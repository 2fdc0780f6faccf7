"""S19 interval scheduling as a live processingTime stream.

The reference's scheduler fires syncs every 30/60 minutes
(scheduler.py:45-73). Structured Streaming's processingTime trigger is
that loop without the cron: this test runs the hourly aggregate as a
continuously-ticking query over a rate-limited file source for a couple
of ticks and asserts it is making batch progress, then stops it."""

from __future__ import annotations

import time
import uuid

from end_to_end_database_pipeline_project_spark.streaming.pipeline import (
    hourly_windowed_agg,
)

SF = "/root/testdata/sf0.001"


def test_processing_time_trigger_ticks(spark, tmp_path):
    from end_to_end_database_pipeline_project_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = str(tmp_path / "landing")
    # repartition, not coalesce: the fixture reads as ONE partition and
    # coalesce can't increase partition count — we need 4 part files so
    # maxFilesPerTrigger=1 yields 4 non-empty ticks
    ev.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "part-*")
        .parquet(src)
    )
    agg = hourly_windowed_agg(stream)
    name = f"ticker_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            progressed = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if len(progressed) >= 2 and spark.table(name).count() > 0:
                break
            time.sleep(1)
        else:
            raise AssertionError(
                f"stream did not tick twice in time: {len(q.recentProgress)} progress events"
            )
    finally:
        q.stop()
