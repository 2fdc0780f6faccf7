"""Streaming drift monitor == batch drift queries, plus the alert path.

The registered `streaming_psi_monitor` / `streaming_ks_monitor` rows
are defined as "what the foreachBatch monitor would emit per day-grain
micro-batch". This test makes that literal: it lands each
post-reference event day as its own file, streams the landing dir with
``maxFilesPerTrigger=1`` through ``run_drift_monitor``, and asserts the
monitor table's rows equal the registered batch queries' rows for the
same days. A final synthetic batch with values shifted far outside the
reference range must trip BOTH alerts (the fixture itself is
stationary, so `drifted` is never exercised by real days).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

if not os.path.isdir(SF):  # pragma: no cover - machine without fixtures
    pytest.skip(f"fixture dir {SF} missing", allow_module_level=True)

N_DAYS = 3  # post-reference days streamed (keep the test fast)


@pytest.fixture(scope="module")
def monitor_run(spark, tmp_path_factory):
    from end_to_end_database_pipeline_project_spark.streaming.drift import (
        reference_grid,
        reference_histogram,
        run_drift_monitor,
    )

    ev = (
        spark.read.parquet(os.path.join(SF, "events.parquet"))
        .where(F.col("value").isNotNull())
        .withColumn("d", F.to_date("ts"))
    )
    d0 = ev.agg(F.min("d").alias("d0")).first()["d0"]
    ref = ev.where(F.col("d") <= F.date_add(F.lit(d0), 6)).select(
        "value", "event_id"
    )
    hist = reference_histogram(ref).localCheckpoint()
    grid = reference_grid(ref).localCheckpoint()

    batch_days = sorted(
        r["d"]
        for r in ev.where(F.col("d") > F.date_add(F.lit(d0), 6))
        .select("d")
        .distinct()
        .collect()
    )[:N_DAYS]

    landing = str(tmp_path_factory.mktemp("landing"))
    full = spark.read.parquet(os.path.join(SF, "events.parquet"))
    for day in batch_days:
        full.where(F.to_date("ts") == F.lit(day)).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    # one synthetic far-out-of-range batch: every value shifted well
    # past the reference max -> all mass in the top bin / above every
    # grid point -> both monitors must alert
    shift = ref.agg((F.max("value") - F.min("value") + 1000.0).alias("s")).first()["s"]
    drift_day = batch_days[-1]
    (
        full.where(F.to_date("ts") == F.lit(drift_day))
        .withColumn("value", F.col("value") + F.lit(float(shift)) * 10)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 365 DAYS"))
        .coalesce(1)
        .write.mode("append")
        .parquet(landing)
    )

    out = str(tmp_path_factory.mktemp("monitor_out"))
    path = run_drift_monitor(spark, landing, out, hist, grid)
    rows = spark.read.parquet(path)
    return rows, batch_days, landing, out, hist, grid


def test_one_monitor_row_per_batch(spark, monitor_run):
    rows, batch_days = monitor_run[:2]
    assert rows.count() == N_DAYS + 1
    assert rows.select("batch_id").distinct().count() == N_DAYS + 1


def test_streaming_rows_equal_batch_query_rows(spark, monitor_run):
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import QUERIES

    rows, batch_days = monitor_run[:2]
    psi_batch = {
        r["batch_day"]: r
        for r in QUERIES["streaming_psi_monitor"](spark, SF).collect()
    }
    ks_batch = {
        r["batch_day"]: r
        for r in QUERIES["streaming_ks_monitor"](spark, SF).collect()
    }
    streamed = {r["batch_day"]: r for r in rows.collect()}
    for day in batch_days:
        s, p, k = streamed[day], psi_batch[day], ks_batch[day]
        assert s["n_events"] == p["n_events"] == k["n_events"]
        assert s["psi"] == p["psi"], f"{day}: psi {s['psi']} != {p['psi']}"
        assert s["drifted"] == p["drifted"]
        assert s["ks_d"] == k["ks_d"], f"{day}: ks {s['ks_d']} != {k['ks_d']}"
        assert s["ks_crit"] == k["ks_crit"]
        assert s["ks_drifted"] == k["drifted"]


def test_shifted_batch_trips_both_alerts(monitor_run):
    rows, batch_days = monitor_run[:2]
    alert = [r for r in rows.collect() if r["batch_day"] not in set(batch_days)]
    assert len(alert) == 1
    assert alert[0]["drifted"] is True, f"PSI alert missed: {alert[0]}"
    assert alert[0]["ks_drifted"] is True, f"KS alert missed: {alert[0]}"


def test_replayed_batches_never_duplicate_monitor_rows(spark, monitor_run):
    """At-least-once replay safety (r07 advice): wiping the streaming
    checkpoint and re-consuming the SAME landing dir replays every
    batch — the per-batch_id dynamic partition overwrite must rewrite
    each batch's own rows, leaving the one-row-per-(batch, day)
    invariant intact instead of doubling the monitor table."""
    import shutil

    from end_to_end_database_pipeline_project_spark.streaming.drift import (
        run_drift_monitor,
    )

    rows, _, landing, out, hist, grid = monitor_run
    before = sorted(map(tuple, rows.collect()))
    shutil.rmtree(os.path.join(out, "_checkpoint"))
    path = run_drift_monitor(spark, landing, out, hist, grid)
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before


def test_monitored_pipeline_maintains_gold_and_monitors(spark, tmp_path):
    """The composed sync-with-observability hook: gold must equal the
    full-history batch rollup (monitoring must not perturb the
    maintenance path) and every batch must get a monitor row whose PSI
    equals the standalone computation on the same slice."""
    from end_to_end_database_pipeline_project_spark.operators.rollup import (
        daily_rollup,
        hourly_aggregate,
    )
    from end_to_end_database_pipeline_project_spark.pipeline.medallion import (
        read_gold_daily,
    )
    from end_to_end_database_pipeline_project_spark.sources.catalog import (
        load_table,
    )
    from end_to_end_database_pipeline_project_spark.streaming.drift import (
        psi_against_reference,
        reference_grid,
        reference_histogram,
    )
    from end_to_end_database_pipeline_project_spark.streaming.incremental import (
        normalize_batch,
        run_monitored_incremental_pipeline,
    )

    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    ref = ev.where(
        (F.col("ts") < F.lit(mid)) & F.col("value").isNotNull()
    ).select("value", "event_id")
    hist = reference_histogram(ref).localCheckpoint()
    grid = reference_grid(ref).localCheckpoint()

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "warehouse")
    import time as _t

    for cond in [F.col("ts") < F.lit(mid), F.col("ts") >= F.lit(mid)]:
        ev.where(cond).coalesce(1).write.mode("append").parquet(landing)
        _t.sleep(1.1)

    path = run_monitored_incremental_pipeline(spark, landing, out, hist, grid)

    gold = {
        r["obs_date"]: (round(r["avg_value"], 9), r["observation_count"])
        for r in read_gold_daily(spark, out).collect()
    }
    expected = {
        r["obs_date"]: (round(r["avg_value"], 9), r["observation_count"])
        for r in daily_rollup(
            hourly_aggregate(
                normalize_batch(ev), ts="timestamp", measure="temperature_c"
            )
        ).collect()
    }
    assert gold == expected

    monitor = spark.read.parquet(path)
    assert monitor.count() == 2
    # cross-check one batch's PSI against the standalone computation
    # over the identical slice (batch ids follow landing-file mtime
    # order: 0 = first half)
    first_half = (
        ev.where((F.col("ts") < F.lit(mid)) & F.col("value").isNotNull())
        .select(F.lit(0).cast("long").alias("batch_id"), "value")
    )
    standalone = psi_against_reference(
        first_half, hist, group_cols=["batch_id"]
    ).collect()[0]
    streamed = [r for r in monitor.collect() if r["batch_id"] == 0][0]
    assert streamed["psi"] == standalone["psi"]
    assert streamed["n_events"] == standalone["n_events"]
