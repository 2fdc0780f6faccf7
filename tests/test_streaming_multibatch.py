"""True multi-batch streaming: cross-batch state must merge correctly.

The availableNow runs in the query pack may consume the single fixture
file in one micro-batch, which exercises no cross-batch state. Here the
input is split chronologically into four landing files plus a fifth
file that duplicates the fourth (re-delivered data, the reference's
duplicate-observation scenario); ``maxFilesPerTrigger=1`` forces one
micro-batch per file, so the hourly aggregate's state merges across
five batches and ``dropDuplicates`` must suppress the re-delivery using
state from an earlier batch. Final result must equal the batch
aggregate over the original (un-duplicated) events.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.sources.catalog import load_table
from end_to_end_database_pipeline_project_spark.streaming.pipeline import (
    hourly_windowed_agg,
)

SF = "/root/testdata/sf0.001"


def test_hourly_agg_across_micro_batches(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 4
    src = str(tmp_path / "landing")
    chunks = []
    for i in range(4):
        start = lo + span * i
        end = hi if i == 3 else lo + span * (i + 1)
        cond = (F.col("ts") >= F.lit(start)) & (
            (F.col("ts") <= F.lit(end)) if i == 3 else (F.col("ts") < F.lit(end))
        )
        chunks.append(ev.where(cond))
    for i, chunk in enumerate(chunks):
        chunk.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtimes => deterministic oldest-first order
    # re-delivery: the last chronological chunk lands a second time
    chunks[3].coalesce(1).write.mode("append").parquet(src)

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
    name = f"multibatch_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
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
    assert n_batches >= 4, f"expected one micro-batch per file, got {n_batches}"

    got = {
        r["obs_hour"]: (r["avg_value"], r["observation_count"])
        for r in spark.table(name).collect()
    }
    expected = {
        r["obs_hour"]: (r["avg_value"], r["observation_count"])
        for r in (
            ev.where(F.col("value").isNotNull())
            .groupBy(F.date_trunc("hour", "ts").alias("obs_hour"))
            .agg(
                F.avg("value").alias("avg_value"),
                F.count(F.lit(1)).alias("observation_count"),
            )
            .collect()
        )
    }
    assert set(got) == set(expected)
    for hour, (avg, cnt) in expected.items():
        assert got[hour][1] == cnt, f"{hour}: duplicate rows leaked into count"
        assert abs(got[hour][0] - avg) < 1e-9
