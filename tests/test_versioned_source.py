"""`versioned_table` Spark format (sources/versioned_source.py): the
manifest protocol exposed as a batch + streaming SOURCE, so generic
read/readStream pipelines consume the table without library calls.
Offset = committed version number (the Delta streaming-source
contract).
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

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


def test_stream_resume_after_compact_vacuum_fails_loudly(spark, tmp_path):
    """ADVICE r08 (high): a consumer resuming from a pre-compaction
    checkpoint cursor must NOT silently re-stream the compacted full
    snapshot as if it were a delta (that duplicates every
    previously-delivered row downstream) — a full commit in a resumed
    cursor's range fails loudly even when compaction + vacuum made it
    the FIRST manifest entry."""
    register(spark)
    path, ckpt, out = (str(tmp_path / d) for d in ("t", "ckpt", "out"))
    V.write_version(_mk(spark, [(1, "a"), (2, "b")]), path)  # v1
    V.append_version(_mk(spark, [(3, "c")]), path)  # v2

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

    drain()  # cursor now at v2
    assert sorted(r.x for r in spark.read.parquet(out).collect()) == [1, 2, 3]
    V.compact_chain(spark, path)  # v3 = full rewrite
    V.expire_versions(path, retain_last=1)  # manifest now starts AT v3
    V.append_version(_mk(spark, [(4, "d")]), path)  # v4
    assert V.versions(path)[0]["version"] == 3  # compacted full is first
    try:
        drain()
        raise AssertionError(
            "resumed cursor across a compacted-to-first full snapshot "
            "must fail, not re-deliver the snapshot"
        )
    except Exception as exc:
        assert "rewrite" in str(exc) or "resync" in str(exc)
    # nothing was duplicated downstream by the failed attempt
    assert sorted(r.x for r in spark.read.parquet(out).collect()) == [1, 2, 3]


def test_stream_cursor_expired_by_vacuum_fails_loudly(spark, tmp_path):
    """A checkpointed cursor pointing BELOW the oldest retained
    version means vacuum reclaimed commits the consumer never saw —
    catch-up must fail loudly, not skip them."""
    from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
        _VersionedStreamReader,
    )

    register(spark)
    path = str(tmp_path / "t")
    V.write_version(_mk(spark, [(1, "a")]), path)  # v1
    V.append_version(_mk(spark, [(2, "b")]), path)  # v2
    V.compact_chain(spark, path)  # v3
    V.expire_versions(path, retain_last=1)  # only v3 retained
    from pyspark.sql.types import StructType

    rdr = _VersionedStreamReader(
        {"path": path}, StructType.fromDDL(DDL)
    )
    try:
        rdr.partitions({"version": 1}, {"version": 3})
        raise AssertionError("expired cursor must fail loudly")
    except ValueError as exc:
        assert "no longer resolves" in str(exc)
    # a FRESH stream (cursor 0) may consume the leading full snapshot
    parts = rdr.partitions({"version": 0}, {"version": 3})
    assert len(parts) >= 1 and parts[0].value[0] is not None


def test_large_forget_list_applies_executor_side(spark, tmp_path):
    """VERDICT r08 #4: tombstones travel as FILE PATHS in the input
    partition, never driver-materialized key sets — a 100k-key erasure
    batch stays O(manifest) on the driver and filters via one Arrow
    is_in mask per file in executors."""
    register(spark)
    path = str(tmp_path / "big")
    base = spark.range(0, 300_000).selectExpr("id AS x", "'r' AS s")
    V.write_version(base, path)
    forget = spark.range(0, 300_000).where("id % 3 = 0").selectExpr("id AS x")
    V.delete_version(forget, path, "x")  # 100k keys

    df = _batch_read(spark, path)
    # the partition payload carries paths, not keys
    from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
        _VersionedBatchReader,
    )
    from pyspark.sql.types import StructType

    rdr = _VersionedBatchReader({"path": path}, StructType.fromDDL(DDL))
    for p in rdr.partitions():
        _, exclusions, _pvals, _ren, _drops = p.value
        for _probe, _tc, files in exclusions:
            assert all(isinstance(f, str) and f.endswith(".parquet") for f in files)
    got = df.agg({"x": "count"}).collect()[0][0]
    assert got == 200_000
    assert df.where("x % 3 = 0").count() == 0


def test_format_reads_parametrized_and_nested_types(spark, tmp_path):
    """ADVICE r08 (low): the schema option is parsed by Spark's real
    DDL parser — decimal(18,2), map<string,int> and struct columns
    survive the format round-trip (the old comma-split would shred
    them into garbage column names)."""
    register(spark)
    path = str(tmp_path / "typed")
    ddl = (
        "k bigint, d decimal(18,2), m map<string,int>, "
        "st struct<a:int,b:string>"
    )
    src = spark.createDataFrame(
        [(1, __import__("decimal").Decimal("12.34"), {"u": 7}, (5, "z"))], ddl
    )
    V.write_version(src, path)
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", ddl)
        .load()
        .collect()
    )
    assert len(got) == 1
    r = got[0]
    assert (r.k, str(r.d), dict(r.m), (r.st.a, r.st.b)) == (
        1,
        "12.34",
        {"u": 7},
        (5, "z"),
    )


def test_format_widens_int_file_to_bigint_schema(spark, tmp_path):
    """Type widening through the format: a commit written with int
    columns reads cleanly under a bigint declared schema (Arrow cast
    in the executor read path)."""
    register(spark)
    path = str(tmp_path / "widen")
    V.write_version(
        spark.createDataFrame([(1, "a")], "x int, s string"), path
    )
    got = _batch_read(spark, path).collect()  # DDL declares x bigint
    assert [(r.x, r.s) for r in got] == [(1, "a")]
    assert dict(_batch_read(spark, path).dtypes)["x"] == "bigint"


def test_format_reconstitutes_partition_columns(spark, tmp_path):
    """Hive partition columns are not stored in the parquet files —
    the format reader rebuilds them from the directory path, cast to
    the declared type."""
    register(spark)
    path = str(tmp_path / "pf")
    df = spark.range(20).selectExpr(
        "id AS x", "CAST(id % 2 AS INT) AS b", "CONCAT('s', id) AS s"
    )
    V.write_version(df, path, partition_by=("b",))
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "x bigint, b int, s string")
        .load()
    )
    rows = sorted((r.x, r.b, r.s) for r in got.collect())
    assert rows == [(i, i % 2, f"s{i}") for i in range(20)]
    assert dict(got.dtypes)["b"] == "int"


def test_format_pushdown_prunes_partition_files(spark, tmp_path):
    """pushFilters records comparison filters on partition columns and
    skips non-matching files at planning; all filters are returned to
    Spark, so results are identical — only the file set shrinks."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual
    from pyspark.sql.types import StructType

    from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
        _VersionedBatchReader,
    )

    register(spark)
    path = str(tmp_path / "pp")
    df = spark.range(40).selectExpr("id AS x", "CAST(id % 4 AS INT) AS b")
    V.write_version(df, path, partition_by=("b",))
    V.append_version(
        spark.range(40, 60).selectExpr("id AS x", "CAST(id % 4 AS INT) AS b"),
        path,
        partition_by=("b",),
    )
    st = StructType.fromDDL("x bigint, b int")
    # unpruned: every partition dir of both commits
    rdr = _VersionedBatchReader({"path": path}, st)
    all_parts = rdr.partitions()
    # pruned: only b=2 files survive planning
    rdr2 = _VersionedBatchReader({"path": path}, st)
    residual = list(rdr2.pushFilters([EqualTo(("b",), 2)]))
    assert len(residual) == 1, "all filters returned for Spark to re-apply"
    pruned_parts = rdr2.partitions()
    assert 0 < len(pruned_parts) < len(all_parts)
    assert all("/b=2/" in p.value[0] for p in pruned_parts)
    # range filter prunes too
    rdr3 = _VersionedBatchReader({"path": path}, st)
    list(rdr3.pushFilters([GreaterThanOrEqual(("b",), 2)]))
    assert all(
        "/b=2/" in p.value[0] or "/b=3/" in p.value[0]
        for p in rdr3.partitions()
    )
    # end-to-end through SQL: same rows as an unpruned read + filter
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "x bigint, b int")
        .load()
        .where("b = 2")
    )
    assert sorted(r.x for r in got.collect()) == [
        x for x in range(60) if x % 4 == 2
    ]


def test_format_partitioned_with_tombstones(spark, tmp_path):
    """Partition pruning composes with executor-side tombstones."""
    register(spark)
    path = str(tmp_path / "pt")
    df = spark.range(30).selectExpr("id AS x", "CAST(id % 3 AS INT) AS b")
    V.write_version(df, path, partition_by=("b",))
    V.delete_version(
        spark.createDataFrame([(3,), (4,), (6,)], "x long"), path, "x"
    )
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "x bigint, b int")
        .load()
        .where("b = 0")
    )
    assert sorted(r.x for r in got.collect()) == [
        x for x in range(30) if x % 3 == 0 and x not in (3, 6)
    ]


def test_format_reads_across_rename(spark, tmp_path):
    """The format's declared schema uses CURRENT names; files written
    before a rename are mapped (including the tombstone-key mapping on
    both sides of the rename)."""
    register(spark)
    path = str(tmp_path / "fr")
    V.write_version(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id bigint, s string"
        ),
        path,
    )
    V.delete_version(spark.createDataFrame([(2,)], "id bigint"), path, "id")
    V.rename_column(spark, path, "id", "key_id")
    V.append_version(
        spark.createDataFrame([(4, "d")], "key_id bigint, s string"), path
    )
    V.delete_version(
        spark.createDataFrame([(3,)], "key_id bigint"), path, "key_id"
    )
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "key_id bigint, s string")
        .load()
    )
    assert sorted((r.key_id, r.s) for r in got.collect()) == [
        (1, "a"),
        (4, "d"),
    ]
    # time travel to a pre-rename version uses the then-current name
    old = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "id bigint, s string")
        .option("version", "2")
        .load()
    )
    assert sorted(r.id for r in old.collect()) == [1, 3]


def test_format_stream_maps_renamed_columns(spark, tmp_path):
    """A stream declared with current names delivers pre-rename
    commits mapped; the rename commit itself delivers nothing."""
    register(spark)
    path, ckpt, out = (str(tmp_path / d) for d in ("t", "ckpt", "out"))
    V.write_version(
        spark.createDataFrame([(1, "a")], "id bigint, s string"), path
    )
    V.rename_column(spark, path, "id", "key_id")
    V.append_version(
        spark.createDataFrame([(2, "b")], "key_id bigint, s string"), path
    )
    q = (
        spark.readStream.format("versioned_table")
        .option("path", path)
        .option("schema", "key_id bigint, s string")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(r.key_id for r in spark.read.parquet(out).collect()) == [1, 2]


def test_schema_omitting_tombstone_key_fails_loudly(spark, tmp_path):
    """A declared schema without the tombstone key column cannot
    filter deleted rows — the read fails at planning instead of
    silently resurrecting them."""
    register(spark)
    path = str(tmp_path / "nk")
    V.write_version(_mk(spark, [(1, "a"), (2, "b")]), path)
    V.delete_version(spark.createDataFrame([(2,)], "x long"), path, "x")
    try:
        (
            spark.read.format("versioned_table")
            .option("path", path)
            .option("schema", "s string")  # no 'x'
            .load()
            .collect()
        )
        raise AssertionError("must fail: schema omits the tombstone key")
    except Exception as exc:
        assert "tombstone key" in str(exc)
    # with the key included, the delete applies
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", DDL)
        .load()
    )
    assert sorted(r.x for r in got.collect()) == [1]


def test_format_per_file_stats_skipping(spark, tmp_path):
    """The format reader skips FILES whose recorded [min, max] cannot
    satisfy a pushed comparison filter — per-file data skipping through
    pushFilters, finer than partition-dir pruning."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType

    from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
        _VersionedBatchReader,
    )

    register(spark)
    path = str(tmp_path / "ffs")
    df = (
        spark.range(400)
        .selectExpr("id AS x", "CAST(id AS STRING) AS s")
        .repartitionByRange(4, "x")
        .sortWithinPartitions("x")
    )
    V.write_version(df, path, stats_cols=("x",))
    st = StructType.fromDDL(DDL)
    rdr = _VersionedBatchReader({"path": path}, st)
    all_parts = rdr.partitions()
    assert len(all_parts) == 4
    rdr2 = _VersionedBatchReader({"path": path}, st)
    list(rdr2.pushFilters([EqualTo(("x",), 42)]))
    assert len(rdr2.partitions()) == 1, "point lookup touches one file"
    # end-to-end result parity
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", DDL)
        .load()
        .where("x = 42")
        .collect()
    )
    assert [(r.x, r.s) for r in got] == [(42, "42")]


def test_writer_records_per_file_stats(spark, tmp_path):
    """statscols through the format WRITER records per-file min/max,
    and the library's pruned read then skips within the commit."""
    register(spark)
    path = str(tmp_path / "wfs")
    (
        spark.range(400)
        .selectExpr("id AS x", "CAST(id AS STRING) AS s")
        .repartitionByRange(4, "x")
        .sortWithinPartitions("x")
        .write.format("versioned_table")
        .option("path", path)
        .option("statscols", "x")
        .mode("overwrite")
        .save()
    )
    e = V.versions(path)[0]
    assert len(e.get("file_stats", {})) == 4
    pruned = V.read_version(spark, path, prune=("x", 10, 20))
    assert sorted(r.x for r in pruned.collect()) == list(range(10, 21))
    assert len(pruned.inputFiles()) == 1


def test_format_pushdown_prunes_date_partition_dirs(spark, tmp_path):
    """VERDICT r09 #2 (format side): a pushed DATE filter prunes
    date-partitioned dirs at planning (`_raw_matches` parses the hive
    ISO string instead of keeping every dir), and timestamp dirs with
    hive's space separator compare temporally."""
    import datetime

    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual
    from pyspark.sql.types import StructType

    from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
        _VersionedBatchReader,
        _raw_matches,
    )

    register(spark)
    path = str(tmp_path / "dp")
    df = spark.range(36).selectExpr(
        "id AS x", "DATE_ADD(DATE'2020-06-01', CAST(id % 6 AS INT)) AS day"
    )
    V.write_version(df, path, partition_by=("day",))
    st = StructType.fromDDL("x bigint, day date")
    rdr = _VersionedBatchReader({"path": path}, st)
    all_parts = rdr.partitions()
    rdr2 = _VersionedBatchReader({"path": path}, st)
    list(rdr2.pushFilters([EqualTo(("day",), datetime.date(2020, 6, 3))]))
    pruned = rdr2.partitions()
    assert 0 < len(pruned) < len(all_parts)
    assert all("/day=2020-06-03/" in p.value[0] for p in pruned)
    rdr3 = _VersionedBatchReader({"path": path}, st)
    list(rdr3.pushFilters([GreaterThanOrEqual(("day",), datetime.date(2020, 6, 4))]))
    assert all(
        any(f"/day=2020-06-0{d}/" in p.value[0] for d in (4, 5, 6))
        for p in rdr3.partitions()
    )
    # end-to-end: pruned plan, identical rows
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "x bigint, day date")
        .load()
        .where("day = DATE'2020-06-03'")
    )
    assert sorted(r.x for r in got.collect()) == [
        x for x in range(36) if x % 6 == 2
    ]
    # unit: hive space-separated timestamp dir value vs datetime filter
    ts = datetime.datetime(2020, 6, 1, 10, 0, 0)
    assert _raw_matches("2020-06-01 10:00:00", EqualTo(("ts",), ts))
    assert not _raw_matches("2020-06-01 12:00:00", EqualTo(("ts",), ts))
    # decimal filters compare numerically, not lexically
    import decimal

    d = decimal.Decimal("10.50")
    assert _raw_matches("10.5", EqualTo(("p",), d))
    assert not _raw_matches("9.50", GreaterThanOrEqual(("p",), d))


def test_format_reads_across_drop_and_readd(spark, tmp_path):
    """Format batch read folds drop commits: the declared schema's
    re-added column is a FRESH lineage — a pre-drop file's same-named
    physical column never serves it (values read NULL), and pushed
    filters on the re-added name never prune by the dropped lineage's
    partition dirs or stats."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType

    from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
        _VersionedBatchReader,
    )

    register(spark)
    path = str(tmp_path / "fd")
    V.write_version(
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 7)], "x long, s string, score int"
        ),
        path,
        partition_by=("score",),
    )  # v1: partitioned BY the soon-dropped column
    V.drop_column(spark, path, "score")  # v2
    V.append_version(
        spark.createDataFrame([(3, "c", 9)], "x long, s string, score int"),
        path,
    )  # v3: fresh lineage

    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "x bigint, s string, score int")
        .load()
    )
    rows = sorted((r.x, r.s, r.score) for r in got.collect())
    assert rows == [(1, "a", None), (2, "b", None), (3, "c", 9)]

    # a pushed filter score=7 must NOT keep v1's score=7 dir on the
    # strength of the DROPPED lineage — v1 files survive only because
    # their (new-lineage) score is unknown (NULL), and Spark's residual
    # filter then drops those rows
    st = StructType.fromDDL("x bigint, s string, score int")
    rdr = _VersionedBatchReader({"path": path}, st)
    list(rdr.pushFilters([EqualTo(("score",), 9)]))
    files = [p.value[0] for p in rdr.partitions()]
    assert any("/v=1/" in f for f in files), (
        "pre-drop files must stay (their new-lineage score is NULL-unknown)"
    )
    assert sorted(
        r.x for r in got.where(F.col("score") == 9).collect()
    ) == [3]


def test_format_stream_excludes_dropped_columns(spark, tmp_path):
    """Streamed commits delivered AFTER a drop come out in the current
    schema: pre-drop commits' dropped column reads NULL downstream."""
    register(spark)
    path, ckpt, out = (str(tmp_path / d) for d in ("t", "ckpt", "out"))
    V.write_version(
        spark.createDataFrame([(1, "a", 5.0)], "x long, s string, junk double"),
        path,
    )
    V.drop_column(spark, path, "junk")
    V.append_version(
        spark.createDataFrame([(2, "b")], "x long, s string"), path
    )
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
    assert sorted((r.x, r.s) for r in spark.read.parquet(out).collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_tombstone_cache_lru_eviction():
    """VERDICT r09 #8: the executor tombstone cache evicts LRU instead
    of clearing wholesale — a hot entry survives 64+ cold inserts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
        _tombstone_array,
    )

    cache = _tombstone_array.cache
    cache.clear()
    import tempfile

    d = tempfile.mkdtemp(prefix="tomb_lru_")
    files = []
    for i in range(70):
        f = f"{d}/t{i}.parquet"
        pq.write_table(pa.table({"k": pa.array([i], pa.int64())}), f)
        files.append(f)
    hot = _tombstone_array("k", (files[0],), pa.int64())
    hot_key = next(iter(cache))
    for i in range(1, 70):
        _tombstone_array("k", (files[i],), pa.int64())
        # touch the hot entry every few inserts — LRU must keep it
        if i % 5 == 0:
            again = _tombstone_array("k", (files[0],), pa.int64())
            assert again is hot, "hot entry must be served from cache"
    assert hot_key in cache, "LRU keeps the hot entry"
    assert len(cache) <= 64, "cache bounded"
    cache.clear()


def test_format_struct_field_evolution(spark, tmp_path):
    """Struct-FIELD schema evolution through the format (VERDICT r09
    #4's nested half): an append may add a field INSIDE a struct (or a
    list<struct> element); pre-evolution files read NULL for the new
    field instead of failing the Arrow cast — `_conform_array`
    recursively null-fills missing children. The library chain read
    already union-resolves nested fields; this pins format parity."""
    register(spark)
    path = str(tmp_path / "se")
    V.write_version(
        spark.sql(
            "SELECT 1 AS x, named_struct('a', 10, 'b', 'p') AS s, "
            "array(named_struct('k', 1)) AS lst"
        ),
        path,
    )
    V.append_version(
        spark.sql(
            "SELECT 2 AS x, named_struct('a', 20, 'b', 'q', 'c', 3.5) AS s, "
            "array(named_struct('k', 2, 'm', 'z')) AS lst"
        ),
        path,
    )
    ddl = (
        "x int, s struct<a:int, b:string, c:double>, "
        "lst array<struct<k:int, m:string>>"
    )
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", ddl)
        .load()
    )
    rows = sorted(
        ((r.x, r.s.asDict(), [e.asDict() for e in r.lst]) for r in got.collect()),
        key=lambda t: t[0],
    )
    assert rows == [
        (1, {"a": 10, "b": "p", "c": None}, [{"k": 1, "m": None}]),
        (2, {"a": 20, "b": "q", "c": 3.5}, [{"k": 2, "m": "z"}]),
    ]
    # library read agrees (unionByName allowMissingColumns nested fill)
    lib = V.read_version(spark, path).selectExpr("x", "s.c AS c").collect()
    assert {(r.x, r.c) for r in lib} == {(1, None), (2, 3.5)}
    # widening inside the struct: int field vs declared long
    got2 = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "x bigint, s struct<a:bigint, b:string, c:double>")
        .load()
    )
    assert {r.s.a for r in got2.collect()} == {10, 20}


def test_stream_maxversionspertrigger_and_startingversion(spark, tmp_path):
    """Rate limiting + startingversion (Delta's maxFilesPerTrigger /
    startingVersion analogs). The run's FIRST batch is planned before
    the source learns its cursor (no ReadLimit in the Python DS API)
    and is uncapped; every later trigger advances the offset by at
    most N versions. startingversion bounds a fresh consumer's
    catch-up batch explicitly (and re-attaches consumers after a
    compaction)."""
    import json
    import os as _os

    register(spark)
    path, ckpt, out = (str(tmp_path / d) for d in ("t", "ckpt", "out"))
    V.write_version(_mk(spark, [(0, "a")]), path)
    for i in range(1, 6):
        V.append_version(_mk(spark, [(i, f"s{i}")]), path)  # v2..v6

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
        return sorted(r.x for r in spark.read.parquet(out).collect())

    # startingversion: the catch-up batch starts AFTER v4 — only the
    # v5/v6 rows arrive; history before it is skipped by contract
    assert drain(startingversion="4", maxversionspertrigger="2") == [4, 5]
    # new commits: a RESTARTED run learns its cursor from recovery, so
    # even its first planned batch is capped — each availableNow rerun
    # advances by at most the cap and stops at its prepared target;
    # looping drains catches up exactly once
    for i in range(6, 11):
        V.append_version(_mk(spark, [(i, f"s{i}")]), path)  # v7..v11
    seen = [4, 5]
    for _ in range(5):
        got = drain(startingversion="4", maxversionspertrigger="2")
        assert len(got) - len(seen) <= 2, "restarted runs advance <= cap"
        assert got[: len(seen)] == seen and got == sorted(set(got))
        seen = got
        if got == [4, 5, 6, 7, 8, 9, 10]:
            break
    assert seen == [4, 5, 6, 7, 8, 9, 10]
    # the checkpointed offsets after the first batch advance by <= 2
    odir = _os.path.join(ckpt, "offsets")
    ends = []
    for f in sorted(_os.listdir(odir), key=lambda x: int(x) if x.isdigit() else -1):
        if f.isdigit():
            last = open(_os.path.join(odir, f)).read().strip().split("\n")[-1]
            ends.append(json.loads(last)["version"])
    assert ends[0] == 6  # FRESH run's first batch: uncapped to then-head
    deltas = [b - a for a, b in zip(ends, ends[1:])]
    assert deltas and all(0 < d <= 2 for d in deltas), (ends, deltas)
    assert ends[-1] == 11
    # a startingversion beyond the head fails loudly
    import pytest

    with pytest.raises(Exception, match="beyond the committed head"):
        (
            spark.readStream.format("versioned_table")
            .option("path", path)
            .option("schema", DDL)
            .option("startingversion", "99")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    # a bad cap fails loudly
    with pytest.raises(Exception, match="maxversionspertrigger"):
        (
            spark.readStream.format("versioned_table")
            .option("path", path)
            .option("schema", DDL)
            .option("maxversionspertrigger", "0")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck3"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


def test_format_readchangefeed(spark, tmp_path):
    """readchangefeed=true: the CDF as a batch format (Delta's
    readChangeFeed analog) — typed change rows from only the delta
    dirs, as-of-end names across rename/drop, key-only delete rows,
    loud failure across a rewrite, endingversion pinning."""
    import pytest

    register(spark)
    path = str(tmp_path / "cf")
    mk = lambda rows: spark.createDataFrame(rows, "x long, s string")
    V.write_version(mk([(1, "a"), (2, "b")]), path)  # v1
    V.append_version(mk([(3, "c")]), path)  # v2
    V.delete_version(spark.createDataFrame([(2,)], "x long"), path, "x")  # v3
    V.upsert_version(mk([(1, "A2")]), path, "x")  # v4
    V.rename_column(spark, path, "s", "txt")  # v5
    V.append_version(
        spark.createDataFrame([(4, "d")], "x long, txt string"), path
    )  # v6

    def feed(**opts):
        return (
            spark.read.format("versioned_table")
            .option("path", path)
            .option("schema", "x bigint, txt string")
            .option("readchangefeed", "true")
            .options(**opts)
            .load()
        )

    got = sorted(
        (r._commit_version, r._change_type, r.x, r.txt)
        for r in feed(startingversion="1").collect()
    )
    assert got == [
        (2, "insert", 3, "c"),
        (3, "delete", 2, None),  # key-only row: non-key columns NULL
        (4, "upsert", 1, "A2"),
        (6, "insert", 4, "d"),
    ]
    # library parity (same contract as incremental_scan)
    lib = sorted(
        (r._commit_version, r._change_type, r.x, r.txt)
        for r in V.incremental_scan(spark, path, 1).collect()
    )
    assert got == lib
    # endingversion pins the window
    upto = feed(startingversion="1", endingversion="3")
    assert sorted(r._commit_version for r in upto.collect()) == [2, 3]
    # a rewrite inside the range fails loudly at planning
    V.compact_chain(spark, path)  # v7: full rewrite
    with pytest.raises(Exception, match="rewrite"):
        feed(startingversion="1").collect()
    # resync from the rewrite: empty feed (nothing after v7 yet)
    assert feed(startingversion="7").count() == 0


def test_format_never_resurrects_renamed_away_column(spark, tmp_path):
    """Review fix (r10): a physical column that is a RENAME SOURCE must
    not serve a same-named declared column when the freed name is later
    RE-ADDED as a fresh lineage — pre-rename rows read NULL there (and
    the old lineage's stats never prune filters on the new lineage),
    matching the library read."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType

    from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
        _VersionedBatchReader,
    )

    register(spark)
    path = str(tmp_path / "rr")
    V.write_version(
        spark.createDataFrame([(1, 100)], "x long, a long"),
        path,
        stats_cols=("a",),
    )  # v1: physical 'a' = old lineage
    V.rename_column(spark, path, "a", "b")  # v2
    V.append_version(
        spark.createDataFrame([(2, 7, 200)], "x long, a long, b long"), path
    )  # v3: re-adds 'a' as a FRESH lineage
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", "x bigint, a bigint, b bigint")
        .load()
    )
    rows = sorted((r.x, r.a, r.b) for r in got.collect())
    assert rows == [(1, None, 100), (2, 7, 200)], (
        "old physical 'a' must serve declared 'b', never fresh 'a'"
    )
    lib = sorted(
        (r.x, r.a, r.b) for r in V.read_version(spark, path).collect()
    )
    assert lib == rows, "format and library reads must agree"
    # old 'a' file stats must not prune a filter on the NEW 'a'
    rdr = _VersionedBatchReader(
        {"path": path}, StructType.fromDDL("x bigint, a bigint, b bigint")
    )
    list(rdr.pushFilters([EqualTo(("a",), 7)]))
    files = [p.value[0] for p in rdr.partitions()]
    assert any("/v=1/" in f for f in files), (
        "v1 must not be pruned by its old-lineage 'a' stats (its new-'a' "
        "values are NULL-unknown)"
    )


def test_format_cdf_startingversion_zero_and_inverted_range(spark, tmp_path):
    """Review fixes (r10): the default startingversion=0 emits the
    LEADING base snapshot as inserts (Delta's startingVersion=0) —
    previously every table raised; an inverted window fails loudly
    instead of reading as an empty (caught-up) feed."""
    import pytest

    register(spark)
    path = str(tmp_path / "cz")
    mk = lambda rows: spark.createDataFrame(rows, "x long, s string")
    V.write_version(mk([(1, "a"), (2, "b")]), path)  # v1 base
    V.append_version(mk([(3, "c")]), path)  # v2
    V.delete_version(spark.createDataFrame([(1,)], "x long"), path, "x")  # v3

    def feed(**opts):
        return (
            spark.read.format("versioned_table")
            .option("path", path)
            .option("schema", DDL)
            .option("readchangefeed", "true")
            .options(**opts)
            .load()
        )

    got = sorted(
        (r._commit_version, r._change_type, r.x) for r in feed().collect()
    )
    assert got == [
        (1, "insert", 1),
        (1, "insert", 2),
        (2, "insert", 3),
        (3, "delete", 1),
    ], "start=0 bootstraps the base snapshot as inserts"
    # a MID-history rewrite still fails loudly even from start=0
    V.compact_chain(spark, path)  # v4
    with pytest.raises(Exception, match="rewrite"):
        feed().collect()
    # ... but from the compaction version onward the feed works again
    assert feed(startingversion="4").count() == 0
    # inverted window: loud, never silently empty
    with pytest.raises(Exception, match="exceeds endingversion"):
        feed(startingversion="3", endingversion="2").collect()


def test_bloom_cardinality_estimator(spark):
    """The popcount estimator recovers small distinct-key counts near
    exactly, and re-inserting existing keys cannot inflate it (their
    bits are already set) — the denominator property the
    stale-fraction policy needs."""
    from end_to_end_database_pipeline_project_spark.operators.bloom import (
        build_bloom,
    )
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        bloom_cardinality,
    )

    keys = spark.createDataFrame([(f"h{i}",) for i in range(500)], "k string")
    est = bloom_cardinality(build_bloom(keys, "k"))
    assert 450 <= est <= 550, est
    # duplicating every key changes nothing: same bits
    doubled = keys.unionAll(keys)
    est2 = bloom_cardinality(build_bloom(doubled, "k"))
    assert abs(est2 - est) < 1e-9, (est, est2)


# --- manifest-derived schema inference (VERDICT r10 "What's wrong #1" /
# "What's missing #2": Delta infers its read schema from the log; the
# format must too, keeping the `schema` option as the override and
# turning every impossible-inference case into a ValueError that names
# the option, never a raw worker KeyError traceback) -------------------


def _evolved_table(spark, tmp_path) -> str:
    """base (partitioned by a DATE col, int32 key) → rename → append
    (widened key, NEW column) → drop: exercises every fold the
    inference must reproduce."""
    path = str(tmp_path / "infer_t")
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01", 1.5), (2, "b", "2024-01-02", 2.5)],
        "k int, name string, d string, v double",
    ).withColumn("d", F.to_date("d"))
    V.write_version(base, path, partition_by=("d",))  # v1
    V.rename_column(spark, path, "name", "label")  # v2
    V.append_version(  # v3: long key (widening) + fresh column ts
        spark.createDataFrame(
            [(3, "c", "2024-01-03", 3.5, "2024-01-03 12:00:00")],
            "k long, label string, d string, v double, ts string",
        )
        .withColumn("d", F.to_date("d"))
        .withColumn("ts", F.to_timestamp("ts")),
        path,
    )
    V.drop_column(spark, path, "v")  # v4
    return path


def test_schema_inference_folds_rename_drop_widening(spark, tmp_path):
    register(spark)
    path = _evolved_table(spark, tmp_path)
    got = spark.read.format("versioned_table").option("path", path).load()
    # inferred: rename applied, drop excluded, int+long unified to long,
    # DATE partition dirs typed date, timestamp normalized to TIMESTAMP
    assert sorted(
        (f.name, f.dataType.simpleString()) for f in got.schema.fields
    ) == [
        ("d", "date"),
        ("k", "bigint"),
        ("label", "string"),
        ("ts", "timestamp"),
    ]
    rows = sorted(
        (r.k, r.label, str(r.d), r.ts is not None) for r in got.collect()
    )
    assert rows == [
        (1, "a", "2024-01-01", False),
        (2, "b", "2024-01-02", False),
        (3, "c", "2024-01-03", True),
    ]
    # content parity with the library read (modulo column order)
    lib = V.read_version(spark, path)
    assert sorted(got.columns) == sorted(lib.columns)
    assert got.count() == lib.count()


def test_schema_inference_pinned_version_is_as_of(spark, tmp_path):
    register(spark)
    path = _evolved_table(spark, tmp_path)
    v1 = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("version", "1")
        .load()
    )
    # as-of v1: pre-rename name, pre-drop column, no ts yet
    assert sorted(v1.columns) == ["d", "k", "name", "v"]
    assert v1.count() == 2


def test_schema_inference_cdf_appends_meta_columns(spark, tmp_path):
    register(spark)
    path = _evolved_table(spark, tmp_path)
    cdf = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("readchangefeed", "true")
        .load()
    )
    assert cdf.columns[-2:] == ["_change_type", "_commit_version"]
    assert "label" in cdf.columns and "v" not in cdf.columns
    assert cdf.count() == 3  # 2 base inserts + 1 append insert


def test_schema_inference_streaming_read(spark, tmp_path):
    register(spark)
    path = _evolved_table(spark, tmp_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("versioned_table")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert sorted(got.columns) == ["d", "k", "label", "ts"]
    assert sorted(r.k for r in got.collect()) == [1, 2, 3]


def test_schema_inference_errors_name_the_option(spark, tmp_path):
    register(spark)
    # missing / uninitialized table: ValueError text (inside Spark's
    # PYTHON_DATA_SOURCE_ERROR wrapper) names the schema option
    try:
        spark.read.format("versioned_table").option(
            "path", str(tmp_path / "nope")
        ).load().count()
        raise AssertionError("uninitialized table must fail loudly")
    except Exception as exc:
        msg = str(exc)
        assert "no committed versions" in msg and "'schema' option" in msg
    # missing path option: same discipline
    try:
        spark.read.format("versioned_table").load().count()
        raise AssertionError("missing path must fail loudly")
    except Exception as exc:
        assert "'path' option" in str(exc)


def test_schema_inference_partition_only_column_types(spark, tmp_path):
    from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
        infer_arrow_schema,
    )

    register(spark)
    path = str(tmp_path / "pt")
    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "y")], "a long, bucket int, s string"
    )
    # format write partitioned: partition col exists ONLY as hive dirs
    (
        df.write.format("versioned_table")
        .mode("overwrite")
        .option("path", path)
        .option("partitionby", "bucket")
        .save()
    )
    sch = infer_arrow_schema(path)
    import pyarrow as pa

    assert sch.field("bucket").type == pa.int64()  # int dirs infer wide
    got = spark.read.format("versioned_table").option("path", path).load()
    assert sorted((r.a, r.bucket) for r in got.collect()) == [(1, 10), (2, 20)]


# --- maxcatchupversions: loud guard for the uncapped fresh-run
# catch-up batch (VERDICT r10 "What's missing #3") ---------------------


def test_maxcatchup_fresh_run_backlog_raises(spark, tmp_path):
    register(spark)
    path, ckpt, out = (str(tmp_path / d) for d in ("t", "ckpt", "out"))
    V.write_version(_mk(spark, [(1, "a")]), path)
    for i in range(2, 7):  # head = v6: fresh catch-up would span 6
        V.append_version(_mk(spark, [(i, "x")]), path)

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
        drain(maxcatchupversions="3")
        raise AssertionError("fresh-run backlog beyond the guard must fail")
    except Exception as exc:
        msg = str(exc)
        assert "maxcatchupversions=3" in msg and "startingversion" in msg
    # the stated fix works: startingversion bounds the catch-up inside
    # the guard, and the stream then drains the remainder
    shutil.rmtree(ckpt, ignore_errors=True)
    drain(maxcatchupversions="3", startingversion="3")
    assert sorted(r.x for r in spark.read.parquet(out).collect()) == [4, 5, 6]


def test_maxcatchup_restart_path_stays_green(spark, tmp_path):
    register(spark)
    path, ckpt, out = (str(tmp_path / d) for d in ("t", "ckpt", "out"))
    V.write_version(_mk(spark, [(1, "a")]), path)

    def drain():
        q = (
            spark.readStream.format("versioned_table")
            .option("path", path)
            .option("schema", DDL)
            .option("maxcatchupversions", "2")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # fresh run: 1 version <= guard
    # pile up a backlog BIGGER than the guard, then RESTART: the cursor
    # is known from recovery, so the guard must not trip — only a FRESH
    # run's unknown-cursor catch-up is the mega-batch hazard
    for i in range(2, 7):
        V.append_version(_mk(spark, [(i, "x")]), path)
    drain()
    assert sorted(r.x for r in spark.read.parquet(out).collect()) == [
        1, 2, 3, 4, 5, 6,
    ]


def test_raw_matches_never_sees_null_tests(spark, tmp_path):
    """Guard for the `__HIVE_DEFAULT_PARTITION__` branch (VERDICT r10
    "What's wrong #3"): `_raw_matches` answers False for the NULL dir,
    which is only sound for COMPARISON filters — `pushFilters` must
    never record a null-test (IsNull MATCHES the null dir) or a
    null-safe equality. Pinned two ways: the recorder drops them, and
    a query filtering IS NULL over a null-partitioned table still
    finds its rows (pruning never skipped the null dir)."""
    from pyspark.sql.datasource import EqualNullSafe, IsNotNull, IsNull

    from end_to_end_database_pipeline_project_spark.sources.versioned_source import (
        _VersionedBatchReader,
    )

    schema = spark.createDataFrame([], "x long, s string").schema
    r = _VersionedBatchReader({"path": str(tmp_path)}, schema)
    r.pushFilters([IsNull(("s",)), IsNotNull(("s",)), EqualNullSafe(("s",), None)])
    assert r.part_filters == []  # null tests are never recorded

    register(spark)
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "x long, s string"
    )
    (
        df.write.format("versioned_table")
        .mode("overwrite")
        .option("path", path)
        .option("partitionby", "s")
        .save()
    )
    got = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("schema", DDL)
        .load()
        .where("s IS NULL")
    )
    assert [r2.x for r2 in got.collect()] == [2]


def test_cdf_rejects_snapshot_pins(spark, tmp_path):
    """The change feed's window is VERSIONS: a `version` or
    `timestampasof` option on a readchangefeed read fails loudly
    instead of being silently ignored (resolve a timestamp first via
    version_at_timestamp)."""
    register(spark)
    path = str(tmp_path / "t")
    V.write_version(_mk(spark, [(1, "a")]), path)
    for opt, val in (("timestampasof", "2024-01-01"), ("version", "1")):
        try:
            (
                spark.read.format("versioned_table")
                .option("path", path)
                .option("schema", DDL)
                .option("readchangefeed", "true")
                .option(opt, val)
                .load()
                .count()
            )
            raise AssertionError(f"{opt} on the change feed must fail")
        except Exception as exc:
            assert "startingversion" in str(exc)


# --- change feed as a STREAMING source (r11) --------------------------


def _drain_cdf(spark, path, out, ckpt, **opts):
    q = (
        spark.readStream.format("versioned_table")
        .option("path", path)
        .option("schema", DDL)
        .option("readchangefeed", "true")
        .options(**opts)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_cdf_stream_delivers_typed_changes_and_resumes(spark, tmp_path):
    """readStream + readchangefeed: typed insert/delete/upsert rows —
    NO ignore* opt-ins needed (pre-r11 this combination silently fell
    through to the snapshot reader with NULL meta columns) — and the
    checkpoint cursor resumes exactly."""
    register(spark)
    path, ckpt, out = (str(tmp_path / d) for d in ("t", "ckpt", "out"))
    V.write_version(_mk(spark, [(1, "a"), (2, "b")]), path)  # v1 base
    V.append_version(_mk(spark, [(3, "c")]), path)  # v2
    V.delete_version(spark.createDataFrame([(2,)], "x long"), path, "x")  # v3

    got = _drain_cdf(spark, path, out, ckpt)
    rows = sorted(
        (r._commit_version, r._change_type, r.x) for r in got.collect()
    )
    # fresh stream bootstraps the leading base as inserts (batch-feed
    # startingversion=0 semantics); the delete is a typed key-only row
    assert rows == [
        (1, "insert", 1),
        (1, "insert", 2),
        (2, "insert", 3),
        (3, "delete", 2),
    ]
    # resume: an upsert commit streams as typed upsert rows, once
    V.upsert_version(_mk(spark, [(3, "C2"), (4, "d")]), path, "x")  # v4
    got = _drain_cdf(spark, path, out, ckpt)
    rows = sorted(
        (r._commit_version, r._change_type, r.x) for r in got.collect()
    )
    assert rows.count((4, "upsert", 3)) == 1
    assert rows.count((4, "upsert", 4)) == 1
    assert len(rows) == 6
    # parity with the library feed over the same range
    lib = V.incremental_scan(spark, path, from_version=1)
    assert sorted(
        (r._commit_version, r._change_type, r.x) for r in lib.collect()
    ) == [r for r in rows if r[0] > 1]


def test_cdf_stream_rewrite_fails_and_reattaches(spark, tmp_path):
    """A mid-history compaction breaks feed lineage loudly; a consumer
    re-attaches AFTER it via startingversion; ignore* opt-ins are
    rejected (the feed's contract IS typed changes)."""
    register(spark)
    path = str(tmp_path / "t")
    V.write_version(_mk(spark, [(1, "a")]), path)  # v1
    V.append_version(_mk(spark, [(2, "b")]), path)  # v2
    V.compact_chain(spark, path)  # v3 rewrite
    V.append_version(_mk(spark, [(3, "c")]), path)  # v4

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    try:
        _drain_cdf(spark, path, out, ckpt)
        raise AssertionError("feed stream across a rewrite must fail")
    except Exception as exc:
        assert "rewrite" in str(exc)
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    got = _drain_cdf(spark, path, out2, ckpt2, startingversion="3")
    assert sorted(
        (r._commit_version, r._change_type, r.x) for r in got.collect()
    ) == [(4, "insert", 3)]
    try:
        _drain_cdf(
            spark, path, str(tmp_path / "o3"), str(tmp_path / "c3"),
            ignoredeletes="true",
        )
        raise AssertionError("ignore* on the feed stream must fail")
    except Exception as exc:
        assert "do not apply" in str(exc)


def test_cdf_stream_schema_less_and_evolution(spark, tmp_path):
    """Schema-less feed stream: inference appends the meta columns and
    folds renames — pre-rename commits deliver under current names."""
    register(spark)
    path = str(tmp_path / "t")
    V.write_version(_mk(spark, [(1, "a")]), path)
    V.rename_column(spark, path, "s", "label")
    V.append_version(
        spark.createDataFrame([(2, "b")], "x bigint, label string"), path
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("versioned_table")
        .option("path", path)
        .option("readchangefeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert sorted(got.columns) == [
        "_change_type", "_commit_version", "label", "x",
    ]
    assert sorted((r.x, r.label) for r in got.collect()) == [
        (1, "a"), (2, "b"),
    ]


# --- startingtimestamp / endingtimestamp (r11: wall-clock windows on
# the stream and the batch change feed — Delta's startingTimestamp) ----


def test_stream_startingtimestamp_resolves_first_commit_at_or_after(
    spark, tmp_path
):
    import time

    register(spark)
    path = str(tmp_path / "t")
    V.write_version(_mk(spark, [(1, "a")]), path)  # v1
    V.append_version(_mk(spark, [(2, "b")]), path)  # v2
    time.sleep(0.02)
    mid = time.time()  # between v2 and v3
    time.sleep(0.02)
    V.append_version(_mk(spark, [(3, "c")]), path)  # v3

    def drain(out, ckpt, **opts):
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
        return spark.read.schema(DDL).parquet(out)

    # from mid: only v3 delivers
    got = drain(str(tmp_path / "o1"), str(tmp_path / "c1"),
                startingtimestamp=str(mid))
    assert sorted(r.x for r in got.collect()) == [3]
    # from before everything: full retained history incl. the base
    got = drain(str(tmp_path / "o2"), str(tmp_path / "c2"),
                startingtimestamp=str(mid - 3600))
    assert sorted(r.x for r in got.collect()) == [1, 2, 3]
    # from after the head: nothing yet; a new commit then streams
    out3, c3 = str(tmp_path / "o3"), str(tmp_path / "c3")
    got = drain(out3, c3, startingtimestamp=str(time.time() + 3600))
    assert got.count() == 0
    V.append_version(_mk(spark, [(4, "d")]), path)
    got = drain(out3, c3, startingtimestamp=str(time.time() + 3600))
    assert sorted(r.x for r in got.collect()) == [4]
    # mutually exclusive with startingversion
    try:
        drain(str(tmp_path / "o4"), str(tmp_path / "c4"),
              startingtimestamp=str(mid), startingversion="1")
        raise AssertionError("both starting options must fail")
    except Exception as exc:
        assert "not both" in str(exc)


def test_cdf_batch_timestamp_window_matches_version_window(spark, tmp_path):
    import time

    register(spark)
    path = str(tmp_path / "t")
    V.write_version(_mk(spark, [(1, "a")]), path)  # v1
    time.sleep(0.02)
    t_after_v1 = time.time()
    time.sleep(0.02)
    V.append_version(_mk(spark, [(2, "b")]), path)  # v2
    time.sleep(0.02)
    t_after_v2 = time.time()
    time.sleep(0.02)
    V.append_version(_mk(spark, [(3, "c")]), path)  # v3

    def feed(**opts):
        return (
            spark.read.format("versioned_table")
            .option("path", path)
            .option("schema", DDL)
            .option("readchangefeed", "true")
            .options(**opts)
            .load()
        )

    by_ts = sorted(
        (r._commit_version, r.x)
        for r in feed(
            startingtimestamp=str(t_after_v1),
            endingtimestamp=str(t_after_v2),
        ).collect()
    )
    by_v = sorted(
        (r._commit_version, r.x)
        for r in feed(startingversion="1", endingversion="2").collect()
    )
    assert by_ts == by_v == [(2, 2)]
    # mixing a version and its timestamp twin fails loudly
    for opts in (
        {"startingversion": "1", "startingtimestamp": str(t_after_v1)},
        {"endingversion": "2", "endingtimestamp": str(t_after_v2)},
    ):
        try:
            feed(**opts).count()
            raise AssertionError("mixed window options must fail")
        except Exception as exc:
            assert "not both" in str(exc)


def test_file_uri_paths_and_sql_view_bridge(spark, tmp_path):
    """`file:` URI path options work (Spark's SQL surfaces and some
    callers hand the option through as a URI; the manifest protocol is
    plain os.path — `_opt_path` strips the local scheme), and the
    supported SQL bridge is a temp view over the format read (Spark
    4.1 rejects Python data sources for catalog-table reads and
    direct `format.`path`` queries — UNSUPPORTED_DATASOURCE_FOR_
    DIRECT_QUERY — so the view IS the SQL surface)."""
    register(spark)
    path = str(tmp_path / "t")
    V.write_version(_mk(spark, [(1, "a"), (2, "b")]), path)
    got = (
        spark.read.format("versioned_table")
        .option("path", f"file://{path}")
        .load()
    )
    assert sorted(r.x for r in got.collect()) == [1, 2]
    got.createOrReplaceTempView("vt_bridge")
    assert spark.sql("SELECT count(*) AS n FROM vt_bridge").collect()[0].n == 2
    assert (
        spark.sql("SELECT s FROM vt_bridge WHERE x = 2").collect()[0].s == "b"
    )
    spark.catalog.dropTempView("vt_bridge")
