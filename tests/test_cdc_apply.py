"""Streaming CDC apply: per-micro-batch MERGE onto a parquet snapshot."""

from __future__ import annotations

import datetime as dt
import time

from end_to_end_database_pipeline_project_spark.streaming.incremental import (
    run_cdc_apply,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)
T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _ev(eid, minutes, value):
    return (eid, T0 + dt.timedelta(minutes=minutes), 1, "click", value, "{}")


def _snapshot(spark, path):
    return {
        r["event_id"]: (r["ts"], r["value"])
        for r in spark.read.parquet(path).collect()
    }


def test_cdc_batches_merge_latest_wins(spark, tmp_path):
    landing = str(tmp_path / "landing")
    snap = str(tmp_path / "snapshot")

    # batch 1: initial inserts
    spark.createDataFrame(
        [_ev(1, 0, 10.0), _ev(2, 0, 20.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    # batch 2: a newer correction for key 2, a STALE record for key 1
    # (older ts — must lose), and a fresh insert for key 3
    spark.createDataFrame(
        [_ev(2, 5, 99.0), _ev(1, -10, -1.0), _ev(3, 1, 30.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(landing)

    run_cdc_apply(spark, landing, snap, key_cols=["event_id"], version_col="ts")

    got = _snapshot(spark, snap)
    assert set(got) == {1, 2, 3}
    assert got[1][1] == 10.0, "stale change must not overwrite newer snapshot row"
    assert got[2][1] == 99.0, "newer change must win"
    assert got[3][1] == 30.0, "unmatched change must insert"


def test_cdc_rerun_is_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    snap = str(tmp_path / "snapshot")
    spark.createDataFrame([_ev(1, 0, 10.0)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    run_cdc_apply(spark, landing, snap, key_cols=["event_id"])
    first = _snapshot(spark, snap)
    # second run with the same checkpoint: no new files -> no-op
    run_cdc_apply(spark, landing, snap, key_cols=["event_id"])
    assert _snapshot(spark, snap) == first
