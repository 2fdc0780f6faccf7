"""Stream-stream interval join: cross-micro-batch state must buffer.

The oracle-parity run consumes the fixture in one micro-batch, which
never exercises the join's state store. Here clicks land in the FIRST
file and the purchases that match them in the SECOND; with
``maxFilesPerTrigger=1`` the clicks must be buffered in join state
across the batch boundary for any match to be emitted at all. A click
far outside every purchase's lookback window checks that non-matching
state produces nothing.
"""

from __future__ import annotations

import datetime as dt
import time
import uuid

from end_to_end_database_pipeline_project_spark.streaming.pipeline import (
    stream_stream_interval_join,
)

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _rows():
    def ev(eid, minutes, user, etype):
        return (eid, T0 + dt.timedelta(minutes=minutes), user, etype, 1.0, "{}")

    clicks = [
        ev(1, 0, 100, "click"),  # matched by purchase 10 (within 30 min)
        ev(2, 5, 100, "click"),  # matched by purchase 10
        ev(3, 8, 200, "click"),  # matched by purchase 11
        ev(4, -120, 300, "click"),  # too old for any purchase: must NOT match
        ev(5, 2, 400, "view"),  # wrong type: must NOT match
    ]
    purchases = [
        ev(10, 20, 100, "purchase"),
        ev(11, 25, 200, "purchase"),
        ev(12, 40, 500, "purchase"),  # user with no clicks: no match
    ]
    return clicks, purchases


def test_join_matches_across_micro_batches(spark, tmp_path):
    clicks, purchases = _rows()
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    src = str(tmp_path / "landing")
    spark.createDataFrame(clicks, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes => deterministic oldest-first order
    spark.createDataFrame(purchases, schema).coalesce(1).write.mode("append").parquet(
        src
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "part-*")
        .parquet(src)
    )
    joined = stream_stream_interval_join(stream, stream, interval="30 minutes")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
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
    assert n_batches >= 2, f"expected one micro-batch per file, got {n_batches}"

    got = {
        (r["user_id"], r["purchase_id"], r["click_id"])
        for r in spark.table(name).collect()
    }
    # every match pairs a batch-1 click with a batch-2 purchase
    assert got == {(100, 10, 1), (100, 10, 2), (200, 11, 3)}


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """leftOuter: the unmatched purchase (user 500) must eventually emit
    null-padded — but only once the watermark proves no click can still
    match. A third, much-later batch advances the watermark past every
    purchase's interval; the null-padded rows appear and every inner
    match is preserved."""
    clicks, purchases = _rows()
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    src = str(tmp_path / "landing")
    spark.createDataFrame(clicks, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(purchases, schema).coalesce(1).write.mode("append").parquet(
        src
    )
    time.sleep(1.1)
    # watermark advancer: an event far in the future on both sides
    adv = [
        (90, T0 + dt.timedelta(hours=12), 900, "click", 1.0, "{}"),
        (91, T0 + dt.timedelta(hours=12), 900, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(adv, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "part-*")
        .parquet(src)
    )
    joined = stream_stream_interval_join(
        stream, stream, interval="30 minutes", watermark="1 hour", how="leftOuter"
    )
    name = f"ssjo_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()

    rows = spark.table(name).collect()
    inner = {
        (r["user_id"], r["purchase_id"], r["click_id"])
        for r in rows
        if r["click_id"] is not None
    }
    outer = {
        (r["user_id"], r["purchase_id"]) for r in rows if r["click_id"] is None
    }
    assert {(100, 10, 1), (100, 10, 2), (200, 11, 3)} <= inner
    # purchase 12 (user 500, no clicks) must emit null-padded once the
    # advancer batch pushes the watermark past its join window; the
    # advancer's own purchase 91 stays in state (watermark never passes
    # it) and must NOT emit
    assert (500, 12) in outer
    assert all(pid != 91 for _, pid in outer)
