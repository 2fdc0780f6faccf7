"""`versioned_table` format WRITERS (sources/versioned_source.py): the
manifest commit protocol exposed as a Spark batch sink
(``df.write.format("versioned_table")``) and an exactly-once streaming
sink (``df.writeStream.format("versioned_table")``) — per-task Arrow
staging, driver-side adoption under the commit lock, batch-id
watermark replay discipline."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.sources import versioned as V
from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
    register,
)

DDL = "x bigint, s string"


def _write(df, path, mode, **opts):
    df.write.format("versioned_table").option("path", path).options(
        **opts
    ).mode(mode).save()


def test_batch_writer_overwrite_then_append(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    _write(spark.createDataFrame([(1, "a"), (2, "b")], DDL), path, "overwrite")
    assert [(e["version"], e["mode"]) for e in V.versions(path)] == [(1, "full")]
    _write(spark.createDataFrame([(3, "c")], DDL), path, "append")
    assert [(e["version"], e["mode"]) for e in V.versions(path)] == [
        (1, "full"),
        (2, "append"),
    ]
    got = sorted((r.x, r.s) for r in V.read_version(spark, path).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # a second overwrite resets the chain
    _write(spark.createDataFrame([(9, "z")], DDL), path, "overwrite")
    assert sorted(r.x for r in V.read_version(spark, path).collect()) == [9]
    # time travel to the pre-overwrite chain still works
    assert sorted(r.x for r in V.read_version(spark, path, 2).collect()) == [1, 2, 3]
    # no staging litter
    assert not [d for d in os.listdir(path) if d.startswith("_staging")]


def test_batch_writer_append_requires_base(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "nobase")
    try:
        _write(spark.createDataFrame([(1, "a")], DDL), path, "append")
        raise AssertionError("append without a base must fail")
    except Exception as exc:
        assert "full snapshot" in str(exc)
    # nothing committed, nothing littered
    assert V.versions(path) == []
    assert not [d for d in os.listdir(path) if d.startswith("_staging")]


def test_batch_writer_records_stats_for_pruning(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "st")
    df = spark.range(100).selectExpr("id AS x", "CAST(id AS STRING) AS s")
    _write(df, path, "overwrite", statscols="x")
    e = V.versions(path)[0]
    assert e["stats"]["x"] == {"min": 0, "max": 99}
    # the stats feed the library's commit-level skip
    _write(
        spark.range(1000, 1100).selectExpr("id AS x", "CAST(id AS STRING) AS s"),
        path,
        "append",
        statscols="x",
    )
    pruned = V.read_version(spark, path, prune=("x", 1000, 1005))
    assert all("/v=2/" in f for f in pruned.inputFiles())
    assert pruned.count() == 6


def test_writer_roundtrip_through_format_reader(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "rt")
    _write(spark.createDataFrame([(1, "a"), (2, "b")], DDL), path, "overwrite")
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", DDL)
        .load()
    )
    assert sorted((r.x, r.s) for r in got.collect()) == [(1, "a"), (2, "b")]


def test_stream_writer_exactly_once_across_restarts(spark, tmp_path):
    """The streaming sink commits each micro-batch once: restart with
    the same checkpoint re-delivers nothing; a wiped checkpoint replays
    history below the batch watermark and is absorbed."""
    register(spark)
    landing, path, ckpt = (str(tmp_path / d) for d in ("landing", "t", "ckpt"))
    os.makedirs(landing)

    def land(lo, hi, name):
        spark.range(lo, hi).selectExpr(
            "id AS x", "CAST(id AS STRING) AS s"
        ).coalesce(1).write.mode("overwrite").parquet(f"{landing}/{name}")

    def drain():
        q = (
            spark.readStream.schema(DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{landing}/*")
            .writeStream.format("versioned_table")
            .option("path", path)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    land(0, 3, "d1")
    drain()
    vs1 = V.versions(path)
    assert [e["mode"] for e in vs1][0] == "full"
    assert sorted(r.x for r in V.read_version(spark, path).collect()) == [0, 1, 2]
    # restart, no new data: no new commits
    drain()
    assert len(V.versions(path)) == len(vs1)
    # new landing file -> exactly one more commit
    land(3, 5, "d2")
    drain()
    assert len(V.versions(path)) == len(vs1) + 1
    assert sorted(r.x for r in V.read_version(spark, path).collect()) == list(
        range(5)
    )
    n_commits = len(V.versions(path))
    # wiped checkpoint: full replay, ids restart at 0 -> absorbed
    shutil.rmtree(ckpt)
    drain()
    assert len(V.versions(path)) == n_commits
    assert V.read_version(spark, path).count() == 5
    # every committed entry carries its batch id (the CDF consumers'
    # exactly-once ledger)
    assert all(e.get("batch_id") is not None for e in V.versions(path))


def test_stream_writer_feeds_incremental_consumers(spark, tmp_path):
    """End-to-end: stream writer in, CDF consumer out — each committed
    batch read exactly once via a version cursor."""
    register(spark)
    landing, path, ckpt = (str(tmp_path / d) for d in ("landing", "t", "ckpt"))
    os.makedirs(landing)
    spark.range(0, 4).selectExpr("id AS x", "'r' AS s").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{landing}/a")
    q = (
        spark.readStream.schema(DDL)
        .parquet(f"{landing}/*")
        .writeStream.format("versioned_table")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = V.incremental_scan(spark, path, V.versions(path)[0]["version"])
    assert feed.count() == 0  # cursor at the only commit: caught up
    spark.range(4, 6).selectExpr("id AS x", "'r' AS s").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{landing}/b")
    q = (
        spark.readStream.schema(DDL)
        .parquet(f"{landing}/*")
        .writeStream.format("versioned_table")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = V.incremental_scan(spark, path, 1)
    assert sorted(r.x for r in feed.collect()) == [4, 5]


def test_empty_writes_truncate_vs_noop(spark, tmp_path):
    """A zero-row OVERWRITE is a truncate (a readable empty full
    snapshot — one schema-bearing parquet file); a zero-row APPEND is
    a no-op (no manifest change, no unreadable empty commit dir)."""
    register(spark)
    path = str(tmp_path / "t")
    _write(spark.createDataFrame([(1, "a")], DDL), path, "overwrite")
    # zero-row append: no-op
    _write(spark.createDataFrame([], DDL), path, "append")
    assert [e["version"] for e in V.versions(path)] == [1]
    assert V.read_version(spark, path).count() == 1
    # zero-row overwrite: truncate, still chain-readable
    _write(spark.createDataFrame([], DDL), path, "overwrite")
    assert [e["rows"] for e in V.versions(path)] == [1, 0]
    cur = V.read_version(spark, path)
    assert cur.count() == 0
    assert set(cur.columns) == {"x", "s"}
    # and the format read of the truncated table works too
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", DDL)
        .load()
    )
    assert got.count() == 0
    # appends resume on the truncated chain
    _write(spark.createDataFrame([(2, "b")], DDL), path, "append")
    assert sorted(r.x for r in V.read_version(spark, path).collect()) == [2]


def test_statscols_typo_never_prunes_live_data(spark, tmp_path):
    """A statscols name that matches no column records NO stat for it
    (a {None, None} stat would read as 'provably empty' and prune live
    rows)."""
    register(spark)
    path = str(tmp_path / "typo")
    _write(
        spark.range(10).selectExpr("id AS x", "'a' AS s"),
        path,
        "overwrite",
        statscols="nope,x",
    )
    e = V.versions(path)[0]
    assert "nope" not in e.get("stats", {})
    assert e["stats"]["x"] == {"min": 0, "max": 9}


def test_batch_writer_partitionby_prunes_on_read(spark, tmp_path):
    """VERDICT r09 #3: the format writer's ``partitionby`` option lays
    the commit out hive-partitioned (per-task dynamic partitioning of
    Arrow batches), records partition_by/partition_dirs in the
    manifest exactly like write_version, and the table then prunes
    partition dirs through BOTH read paths (library prune= and format
    pushFilters) — inputFiles-pinned."""
    register(spark)
    path = str(tmp_path / "pw")
    df = spark.range(60).selectExpr(
        "id AS x", "CONCAT('s', id) AS s", "CAST(id % 3 AS INT) AS b"
    )
    df.write.format("versioned_table").option("path", path).option(
        "partitionby", "b"
    ).option("statscols", "x").mode("overwrite").save()
    df2 = spark.range(60, 90).selectExpr(
        "id AS x", "CONCAT('s', id) AS s", "CAST(id % 3 AS INT) AS b"
    )
    df2.write.format("versioned_table").option("path", path).option(
        "partitionby", "b"
    ).mode("append").save()

    e1, e2 = V.versions(path)
    assert e1["partition_by"] == ["b"] and e2["partition_by"] == ["b"]
    assert sorted(e1["partition_dirs"]) == ["b=0", "b=1", "b=2"]
    # per-file stats keys carry the hive subdir (manifest-relative)
    assert all("/" in k and k.startswith("b=") for k in e1["file_stats"])

    # library read prunes dirs
    pruned = V.read_version(spark, path, prune=("b", 1, 1))
    assert sorted(r.x for r in pruned.collect()) == [
        x for x in range(90) if x % 3 == 1
    ]
    files = pruned.inputFiles()
    assert files and all("/b=1/" in f for f in files), files

    # format read reconstitutes the partition column and prunes via
    # pushFilters
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "x bigint, s string, b int")
        .load()
    )
    assert sorted((r.x, r.b) for r in got.collect()) == [
        (x, x % 3) for x in range(90)
    ]
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType

    from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
        _VersionedBatchReader,
    )

    rdr = _VersionedBatchReader(
        {"path": path}, StructType.fromDDL("x bigint, s string, b int")
    )
    list(rdr.pushFilters([EqualTo(("b",), 1)]))
    parts = rdr.partitions()
    assert parts and all("/b=1/" in p.value[0] for p in parts)


def test_batch_writer_partitionby_null_and_date_values(spark, tmp_path):
    """Dynamic partitioning handles NULL keys (__HIVE_DEFAULT_PARTITION__)
    and date-typed keys (ISO dir values the reader casts back)."""
    register(spark)
    path = str(tmp_path / "pn")
    df = spark.sql(
        """SELECT * FROM VALUES
             (1, DATE'2020-06-01'), (2, DATE'2020-06-02'), (3, CAST(NULL AS DATE))
           AS t(x, day)"""
    )
    df.write.format("versioned_table").option("path", path).option(
        "partitionby", "day"
    ).mode("overwrite").save()
    dirs = sorted(V.versions(path)[0]["partition_dirs"])
    assert dirs == [
        "day=2020-06-01",
        "day=2020-06-02",
        "day=__HIVE_DEFAULT_PARTITION__",
    ]
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "x int, day date")
        .load()
    )
    import datetime

    rows = sorted(
        ((r.x, r.day) for r in got.collect()),
        key=lambda t: t[0],
    )
    assert rows == [
        (1, datetime.date(2020, 6, 1)),
        (2, datetime.date(2020, 6, 2)),
        (3, None),
    ]
    # library read agrees (Spark partition discovery on the hive dirs)
    lib = sorted(
        ((r.x, r.day) for r in V.read_version(spark, path).collect()),
        key=lambda t: t[0],
    )
    assert lib == rows


def test_stream_writer_partitionby(spark, tmp_path):
    """The streaming format sink honors partitionby per micro-batch:
    each commit is hive-partitioned and dir-prunable."""
    register(spark)
    path = str(tmp_path / "ps")
    landing, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.range(20).selectExpr(
        "id AS x", "CONCAT('s', id) AS s", "CAST(id % 2 AS INT) AS b"
    ).write.parquet(landing)
    q = (
        spark.readStream.schema("x bigint, s string, b int")
        .parquet(landing)
        .writeStream.format("versioned_table")
        .option("path", path)
        .option("partitionby", "b")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert all(e.get("partition_by") == ["b"] for e in V.versions(path))
    pruned = V.read_version(spark, path, prune=("b", 0, 0))
    assert sorted(r.x for r in pruned.collect()) == [
        x for x in range(20) if x % 2 == 0
    ]
    assert all("/b=0/" in f for f in pruned.inputFiles())


def test_partitionby_nan_key_fails_loudly(spark, tmp_path):
    """Row conservation in the dynamic partitioner: a NaN partition key
    cannot be equality-routed (NaN != NaN) — the write must FAIL, never
    silently drop the rows."""
    import pytest

    register(spark)
    path = str(tmp_path / "nan")
    df = spark.sql(
        "SELECT * FROM VALUES (1, CAST(1.5 AS DOUBLE)), "
        "(2, CAST('NaN' AS DOUBLE)) AS t(x, b)"
    )
    with pytest.raises(Exception, match="non-groupable|NaN"):
        df.write.format("versioned_table").option("path", path).option(
            "partitionby", "b"
        ).mode("overwrite").save()
    # NULL keys, by contrast, route to the hive default partition
    df2 = spark.sql(
        "SELECT * FROM VALUES (1, CAST(1.5 AS DOUBLE)), "
        "(2, CAST(NULL AS DOUBLE)) AS t(x, b)"
    )
    df2.write.format("versioned_table").option("path", path).option(
        "partitionby", "b"
    ).mode("overwrite").save()
    got = V.read_version(spark, path)
    assert sorted((r.x, r.b) for r in got.collect()) == [(1, 1.5), (2, None)]


def test_partitionby_high_cardinality_writer_cap(spark, tmp_path):
    """A partition key with more distinct values than the per-task
    open-writer cap (64) still writes every row: evicted dirs reopen
    as additional part files in the same hive dir — file handles stay
    bounded, content is conserved, reads prune normally."""
    register(spark)
    path = str(tmp_path / "hc")
    # 200 distinct keys through ONE task: forces >64 dirs per task
    df = spark.range(400).selectExpr(
        "id AS x", "CAST(id % 200 AS INT) AS b"
    ).coalesce(1)
    df.write.format("versioned_table").option("path", path).option(
        "partitionby", "b"
    ).mode("overwrite").save()
    e = V.versions(path)[0]
    assert e["rows"] == 400
    assert len(e["partition_dirs"]) == 200
    got = V.read_version(spark, path)
    assert got.count() == 400
    assert sorted(r.x for r in got.where("b = 7").collect()) == [7, 207]
    pruned = V.read_version(spark, path, prune=("b", 7, 7))
    assert all("/b=7/" in f for f in pruned.inputFiles())
