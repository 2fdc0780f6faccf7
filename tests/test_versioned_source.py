"""`versioned_table` Spark format (sources/versioned_source.py): the
manifest protocol exposed as a batch + streaming SOURCE, so generic
read/readStream pipelines consume the table without library calls.
Offset = committed version number (the Delta streaming-source
contract).
"""

from __future__ import annotations

import shutil

from end_to_end_database_pipeline_project_spark.sources import versioned as V
from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
    register,
)

DDL = "x bigint, s string"


def _mk(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _batch_read(spark, path, version=None):
    r = spark.read.format("versioned_table").option("path", path).option(
        "schema", DDL
    )
    if version is not None:
        r = r.option("version", str(version))
    return r.load()


def test_batch_read_resolves_chain_and_tombstones(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    V.write_version(_mk(spark, [(1, "a"), (2, "b")]), path)  # v1
    V.append_version(_mk(spark, [(3, "c")]), path)  # v2
    V.delete_version(spark.createDataFrame([(2,)], "x long"), path, "x")  # v3
    V.append_version(_mk(spark, [(2, "b2")]), path)  # v4: re-insert

    got = sorted((r.x, r.s) for r in _batch_read(spark, path).collect())
    assert got == [(1, "a"), (2, "b2"), (3, "c")]
    # pinned time travel through the same format
    v2 = sorted((r.x, r.s) for r in _batch_read(spark, path, version=2).collect())
    assert v2 == [(1, "a"), (2, "b"), (3, "c")]
    v3 = sorted((r.x, r.s) for r in _batch_read(spark, path, version=3).collect())
    assert v3 == [(1, "a"), (3, "c")]


def test_stream_reads_each_commit_once_across_restarts(spark, tmp_path):
    register(spark)
    path, ckpt, out = (str(tmp_path / d) for d in ("t", "ckpt", "out"))
    V.write_version(_mk(spark, [(1, "a"), (2, "b")]), path)
    V.append_version(_mk(spark, [(3, "c")]), path)

    def drain():
        q = (
            spark.readStream.format("versioned_table")
            .option("path", path)
            .option("schema", DDL)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert sorted(r.x for r in spark.read.parquet(out).collect()) == [1, 2, 3]
    # restart with no new commits: nothing re-read
    drain()
    assert sorted(r.x for r in spark.read.parquet(out).collect()) == [1, 2, 3]
    # new commits land; the cursor resumes from the checkpointed version
    V.append_version(_mk(spark, [(4, "d"), (5, "e")]), path)
    drain()
    assert sorted(r.x for r in spark.read.parquet(out).collect()) == [
        1,
        2,
        3,
        4,
        5,
    ]


def test_stream_fails_on_rewrite_and_honors_ignoredeletes(spark, tmp_path):
    register(spark)
    path, ckpt, out = (str(tmp_path / d) for d in ("t", "ckpt", "out"))
    V.write_version(_mk(spark, [(1, "a")]), path)
    V.append_version(_mk(spark, [(2, "b")]), path)
    V.delete_version(spark.createDataFrame([(1,)], "x long"), path, "x")

    def drain(**opts):
        q = (
            spark.readStream.format("versioned_table")
            .option("path", path)
            .option("schema", DDL)
            .options(**opts)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # tombstone commit in range: fail loudly unless ignoredeletes
    try:
        drain()
        raise AssertionError("tombstone commit must fail the stream")
    except Exception as exc:  # StreamingQueryException wraps the ValueError
        assert "tombstone" in str(exc)
    shutil.rmtree(ckpt)
    drain(ignoredeletes="true")
    assert sorted(r.x for r in spark.read.parquet(out).collect()) == [1, 2]

    # a mid-history compaction breaks append lineage for a fresh consumer
    V.compact_chain(spark, path)
    ckpt2, out2 = str(tmp_path / "ckpt2"), str(tmp_path / "out2")
    try:
        q = (
            spark.readStream.format("versioned_table")
            .option("path", path)
            .option("schema", DDL)
            .option("ignoredeletes", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", out2)
            .option("checkpointLocation", ckpt2)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        raise AssertionError("mid-history full snapshot must fail the stream")
    except Exception as exc:
        assert "rewrite" in str(exc)


def test_batch_parallelism_is_per_committed_file(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    V.write_version(_mk(spark, [(1, "a"), (2, "b")]).repartition(3), path)
    V.append_version(_mk(spark, [(3, "c")]).coalesce(1), path)
    df = _batch_read(spark, path)
    n_files = sum(
        len(
            [
                f
                for f in __import__("os").listdir(f"{path}/{e['dir']}")
                if f.startswith("part-") and f.endswith(".parquet")
            ]
        )
        for e in V.versions(path)
    )
    assert df.rdd.getNumPartitions() == n_files
    assert sorted(r.x for r in df.collect()) == [1, 2, 3]


def test_batch_format_applies_upserts_and_stream_needs_ignorechanges(
    spark, tmp_path
):
    register(spark)
    path, ckpt, out = (str(tmp_path / d) for d in ("t", "ckpt", "out"))
    V.write_version(_mk(spark, [(1, "a"), (2, "b")]), path)
    V.upsert_version(_mk(spark, [(2, "B2"), (3, "c")]), path, "x")

    got = sorted((r.x, r.s) for r in _batch_read(spark, path).collect())
    assert got == [(1, "a"), (2, "B2"), (3, "c")]

    def drain(**opts):
        q = (
            spark.readStream.format("versioned_table")
            .option("path", path)
            .option("schema", DDL)
            .options(**opts)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        drain()
        raise AssertionError("upsert commit must fail the plain stream")
    except Exception as exc:
        assert "upsert" in str(exc)
    shutil.rmtree(ckpt)
    drain(ignorechanges="true")
    # ignoreChanges semantics: replaced keys appear twice downstream
    assert sorted(r.x for r in spark.read.parquet(out).collect()) == [
        1,
        2,
        2,
        3,
    ]


def test_format_null_fills_pre_evolution_files(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "evo")
    V.write_version(_mk(spark, [(1, "a")]), path)  # no 'score' yet
    V.append_version(
        spark.createDataFrame([(2, "b", 9.0)], "x bigint, s string, score double"),
        path,
    )
    df = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "x bigint, s string, score double")
        .load()
    )
    got = sorted((r.x, r.s, r.score) for r in df.collect())
    assert got == [(1, "a", None), (2, "b", 9.0)]
