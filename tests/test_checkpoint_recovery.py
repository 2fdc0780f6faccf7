"""Streaming checkpoint recovery: a restarted query resumes from the
checkpoint's source log and the file sink stays exactly-once.

This is the operational property the reference's cron-rerun model
lacks entirely (a crashed sync re-fetches and re-inserts): with a
checkpoint, batch N's offsets commit atomically with its output, so a
restart neither reprocesses old files nor loses new ones.
"""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)
T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _write(spark, path, ids):
    rows = [(i, T0, 100 + i, "click", float(i), "{}") for i in ids]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_once(spark, src, out, chk):
    q = (
        spark.readStream.schema(SCHEMA)
        .option("pathGlobFilter", "part-*")
        .parquet(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()


def test_restart_resumes_from_checkpoint_exactly_once(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    _write(spark, src, [1, 2, 3])
    _run_once(spark, src, out, chk)
    first = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert first == {1, 2, 3}

    time.sleep(1.1)  # distinct mtimes for deterministic file ordering
    _write(spark, src, [4, 5])
    # a SECOND query instance on the same checkpoint: must process ONLY
    # the new file — old rows appear exactly once in the sink
    _run_once(spark, src, out, chk)
    got = [r["event_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == [1, 2, 3, 4, 5], f"not exactly-once: {sorted(got)}"
