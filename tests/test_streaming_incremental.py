"""End-to-end incremental pipeline: streaming foreachBatch maintains
gold via partition-scoped refresh; final gold must equal the
full-history batch rollup exactly."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.operators.rollup import (
    daily_rollup,
    hourly_aggregate,
)
from end_to_end_database_pipeline_project_spark.pipeline.medallion import (
    read_gold_daily,
)
from end_to_end_database_pipeline_project_spark.sources.catalog import load_table
from end_to_end_database_pipeline_project_spark.streaming.incremental import (
    normalize_batch,
    run_incremental_pipeline,
)

SF = "/root/testdata/sf0.001"


def test_incremental_gold_equals_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "warehouse")
    span = (hi - lo) / 3
    for i in range(3):
        start = lo + span * i
        end = hi if i == 2 else lo + span * (i + 1)
        cond = (F.col("ts") >= F.lit(start)) & (
            (F.col("ts") <= F.lit(end)) if i == 2 else (F.col("ts") < F.lit(end))
        )
        ev.where(cond).coalesce(1).write.mode("append").parquet(landing)
        time.sleep(1.1)  # distinct mtimes => deterministic oldest-first order

    run_incremental_pipeline(spark, landing, out)

    got = {
        r["obs_date"]: (
            round(r["avg_value"], 9),
            round(r["total_value"], 9),
            r["observation_count"],
        )
        for r in read_gold_daily(spark, out).collect()
    }
    expected_silver = normalize_batch(ev)
    expected = {
        r["obs_date"]: (
            round(r["avg_value"], 9),
            round(r["total_value"], 9),
            r["observation_count"],
        )
        for r in daily_rollup(
            hourly_aggregate(expected_silver, ts="timestamp", measure="temperature_c")
        ).collect()
    }
    assert got == expected


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Stopping and re-running the pipeline with the same checkpoint
    must process only files that arrived in between — already-consumed
    landing files must NOT be re-appended to silver (exactly-once file
    source semantics), and gold must equal the batch rollup over
    everything."""
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    first = ev.where(F.col("ts") < F.lit(mid))
    second = ev.where(F.col("ts") >= F.lit(mid))
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "warehouse")

    first.coalesce(1).write.mode("append").parquet(landing)
    run_incremental_pipeline(spark, landing, out)
    n_silver_after_first = spark.read.parquet(out + "/silver").count()
    assert n_silver_after_first == first.where(F.col("ts").isNotNull()).count()

    time.sleep(1.1)
    second.coalesce(1).write.mode("append").parquet(landing)
    run_incremental_pipeline(spark, landing, out)  # same checkpoint dir

    # exactly-once: silver holds each event once, not first-batch twice
    n_silver = spark.read.parquet(out + "/silver").count()
    assert n_silver == ev.where(F.col("ts").isNotNull()).count(), (
        "restart re-processed already-consumed landing files"
    )

    from end_to_end_database_pipeline_project_spark.operators.rollup import (
        daily_rollup,
        hourly_aggregate,
    )

    got = {
        r["obs_date"]: (round(r["avg_value"], 9), r["observation_count"])
        for r in read_gold_daily(spark, out).collect()
    }
    expected = {
        r["obs_date"]: (round(r["avg_value"], 9), r["observation_count"])
        for r in daily_rollup(
            hourly_aggregate(
                normalize_batch(ev).withColumnRenamed("temperature_c", "value")
                .withColumnRenamed("timestamp", "ts")
            )
        ).collect()
    }
    assert got == expected
