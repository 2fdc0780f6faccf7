"""RocksDB state store: stateful streaming whose state lives off-heap
on local disk — the provider that makes 100 TB-scale streaming state
(billions of keys) survivable, vs the default in-memory HDFS-backed
store. Same query, same results, different state backend."""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import functions as F

SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)
T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def test_windowed_agg_on_rocksdb_state_store(spark, tmp_path):
    rows = [
        (i, T0 + dt.timedelta(minutes=7 * i), 100 + (i % 3), "click", float(i), "{}")
        for i in range(40)
    ]
    src = str(tmp_path / "landing")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("pathGlobFilter", "part-*")
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("win.start").alias("h"), "n")
        )
        name = f"rocks_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            # the state store actually in use is reported per operator
            progress = q.lastProgress
            used = str(progress["stateOperators"])
            assert "numRowsTotal" in used
        finally:
            if q.isActive:
                q.stop()
        got = {(r["h"], r["n"]) for r in spark.table(name).collect()}
        truth = {
            (r["h"], r["n"])
            for r in spark.read.parquet(src)
            .groupBy(F.date_trunc("hour", "ts").alias("h"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == truth
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
