"""Tests for the medallion pipeline, streaming batch-equivalence and
the as-of join operators."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.pipeline.medallion import (
    build_bronze,
    bronze_to_silver,
    gold_tables,
    run_medallion,
    write_silver,
)
from end_to_end_database_pipeline_project_spark.operators.rollup import (
    daily_rollup,
    hourly_aggregate,
)
from end_to_end_database_pipeline_project_spark.sources.catalog import load_table
from end_to_end_database_pipeline_project_spark.streaming.pipeline import (
    run_hourly_stream_available_now,
)

SF = "/root/testdata/sf0.001"


def test_medallion_layers_consistent(spark):
    bronze = build_bronze(spark, SF)
    silver = bronze_to_silver(bronze)
    ev_rows = load_table(spark, SF, "events").count()
    # every event becomes exactly one silver observation
    assert silver.count() == ev_rows
    daily, monthly = gold_tables(silver)
    # dedup-rollup hierarchy conserves observation counts level-to-level
    d = daily.agg(F.sum("observation_count")).collect()[0][0]
    m = monthly.agg(F.sum("observation_count")).collect()[0][0]
    assert d == m == ev_rows


def test_medallion_persists_partitioned(spark, tmp_path):
    out = str(tmp_path / "lake")
    serving = run_medallion(spark, SF, out_dir=out)
    assert serving.count() == 30
    # silver written date-partitioned (hive-style directories)
    parts = [p for p in os.listdir(os.path.join(out, "silver")) if p.startswith("obs_date=")]
    assert len(parts) >= 25  # ~30 days of fixture data
    # layers re-readable
    assert spark.read.parquet(os.path.join(out, "gold_daily")).count() > 0


def test_streaming_equals_batch(spark):
    stream_out = run_hourly_stream_available_now(spark, SF)
    ev = load_table(spark, SF, "events")
    batch = (
        ev.where(F.col("value").isNotNull())
        .groupBy(F.date_trunc("hour", "ts").alias("obs_hour"))
        .agg(
            F.avg("value").alias("avg_value"),
            F.count(F.lit(1)).alias("observation_count"),
        )
    )
    s = {r["obs_hour"]: (r["avg_value"], r["observation_count"]) for r in stream_out.collect()}
    b = {r["obs_hour"]: (r["avg_value"], r["observation_count"]) for r in batch.collect()}
    assert set(s) == set(b)
    for k in b:
        assert abs(s[k][0] - b[k][0]) < 1e-9
        assert s[k][1] == b[k][1]


def test_asof_join_carries_latest_right(spark):
    df_l = spark.createDataFrame(
        [(1, 10, "u"), (2, 20, "u"), (3, 5, "v")], "id long, t long, k string"
    )
    df_r = spark.createDataFrame(
        [(9, 100.0, "u"), (15, 200.0, "u"), (99, 300.0, "v")],
        "rt long, val double, k string",
    )
    from end_to_end_database_pipeline_project_spark.operators.asof import asof_join

    out = asof_join(
        df_l, df_r, on="t", by="k", right_on="rt", right_cols=["val"]
    ).orderBy("id")
    rows = out.collect()
    assert [r["val_asof"] for r in rows] == [100.0, 200.0, None]


def test_transform_with_state_agrees(spark):
    """transformWithStateInPandas (the Spark 4 typed-state API) must run
    end-to-end — with the real protobuf wheel where installed, else via
    the vendored mini runtime shipped to Python workers — and its final
    per-user totals must agree exactly with the applyInPandasWithState
    twin."""
    from end_to_end_database_pipeline_project_spark.streaming.pipeline import (
        run_stream_to_table,
        stream_events,
    )
    from end_to_end_database_pipeline_project_spark.streaming.stateful import (
        stateful_user_totals,
        stateful_user_totals_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        tws = run_stream_to_table(
            stateful_user_totals_tws(stream_events(spark, SF)), "update", "tws"
        ).localCheckpoint()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    twin = run_stream_to_table(
        stateful_user_totals(stream_events(spark, SF)), "update", "totals_twin"
    ).localCheckpoint()

    def final_totals(df):
        # update-mode sink holds one row per (key, batch); the final
        # totals are the max-count row per key
        out = {}
        for r in df.collect():
            cur = out.get(r["user_id"])
            if cur is None or r["n_events"] > cur[0]:
                out[r["user_id"]] = (r["n_events"], r["total_value"])
        return out

    a, b = final_totals(tws), final_totals(twin)
    assert len(b) > 0 and set(a) == set(b)
    for uid in b:
        assert a[uid][0] == b[uid][0]
        assert abs(a[uid][1] - b[uid][1]) < 1e-6


def test_backfill_bronze_days(spark, tmp_path):
    """S5 semantics: newest-first, bounded horizon, rate-limited,
    failed windows skipped without aborting."""
    from end_to_end_database_pipeline_project_spark.pipeline.medallion import (
        backfill_bronze_days,
    )

    out = str(tmp_path / "bronze")
    sleeps = []

    def fake_sleep(s):
        sleeps.append(s)

    calls = {"n": 0}

    def flaky_fetch(spark_, sf_dir_, day):
        calls["n"] += 1
        if calls["n"] == 2:  # second-newest day fails like an HTTP 400
            raise RuntimeError("400")
        from end_to_end_database_pipeline_project_spark.sources.catalog import (
            load_table,
        )

        ev = load_table(spark_, sf_dir_, "events")
        return ev.where(F.to_date("ts") == F.lit(day))

    landed = backfill_bronze_days(
        spark, SF, out, max_days=3, rate_limit_s=0.3,
        fetch_day=flaky_fetch, sleep=fake_sleep,
    )
    assert len(landed) == 2, landed            # 3 attempted, 1 skipped
    assert sleeps == [0.3, 0.3]                # rate limit between windows
    assert landed == sorted(landed, reverse=True)  # newest-first
    total = spark.read.option("basePath", out).parquet(out).count()
    import datetime

    ev = load_table(spark, SF, "events")
    expected = ev.where(
        F.to_date("ts").cast("string").isin([d for d in landed])
    ).count()
    assert total == expected


def test_event_time_timeout_sessionization_matches_session_window(spark, tmp_path):
    """Gap sessionization via explicit state + EventTimeTimeout must
    reproduce the built-in session_window's sessions exactly (same
    per-user session count and sizes), with each session emitted once —
    including splits WITHIN a micro-batch. Sentinel users push the
    watermark so every real session expires; the last sentinel's own
    session never closes and must not be emitted."""
    import time as _time
    import uuid as _uuid
    from datetime import timedelta

    from end_to_end_database_pipeline_project_spark.sources.catalog import load_table
    from end_to_end_database_pipeline_project_spark.streaming.stateful import (
        stateful_sessions_with_timeout,
    )

    ev = load_table(spark, SF, "events").select("ts", "user_id", "value")
    hi = ev.agg(F.max("ts")).collect()[0][0]
    src = str(tmp_path / "landing")
    schema = "ts timestamp, user_id long, value double"
    ev.coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    for i, (dt, uid) in enumerate([(2, 999998), (5, 999999)]):
        spark.createDataFrame(
            [(hi + timedelta(hours=dt), uid, 1.0)], schema
        ).coalesce(1).write.mode("append").parquet(src)
        if i == 0:
            _time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_sessions_with_timeout(stream, watermark="1 hour")
    name = f"sessions_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    all_rows = spark.table(name).collect()
    assert 999999 not in {r["user_id"] for r in all_rows}, (
        "un-expired session must not be emitted"
    )
    got = [
        (r["user_id"], r["n_events"]) for r in all_rows if r["user_id"] < 999998
    ]
    # ground truth: the built-in session window over the same events
    expected = [
        (r["user_id"], r["n_events"])
        for r in ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    ]
    assert sorted(got) == sorted(expected), (len(got), len(expected))
