"""Versioned-table layer (sources/versioned.py): commit/read protocol.

Diff parity is covered by the registered `versioned_time_travel` query;
these pin the snapshot-isolation mechanics.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.sources import versioned as V


def test_versions_increment_and_latest_wins(spark, tmp_path):
    store = str(tmp_path / "t")
    assert V.write_version(spark.range(10), store) == 1
    assert V.write_version(spark.range(20), store) == 2
    assert [v["version"] for v in V.versions(store)] == [1, 2]
    assert V.read_version(spark, store).count() == 20
    assert V.read_version(spark, store, 1).count() == 10


def test_old_version_is_immutable_under_new_writes(spark, tmp_path):
    store = str(tmp_path / "t")
    V.write_version(spark.range(5).select((F.col("id") * 2).alias("x")), store)
    v1 = V.read_version(spark, store, 1)
    before = sorted(r.x for r in v1.collect())
    V.write_version(spark.range(5).select((F.col("id") * 100).alias("x")), store)
    # the v1 handle and a fresh v1 read both still see the old snapshot
    assert sorted(r.x for r in v1.collect()) == before
    assert sorted(r.x for r in V.read_version(spark, store, 1).collect()) == before


def test_uncommitted_snapshot_dirs_are_invisible(spark, tmp_path):
    store = str(tmp_path / "t")
    V.write_version(spark.range(7), store)
    # a crashed writer's half-landed snapshot: data dir, no manifest entry
    spark.range(3).write.parquet(os.path.join(store, "v=2"))
    assert [v["version"] for v in V.versions(store)] == [1]
    assert V.read_version(spark, store).count() == 7
    # the next committed write claims version 2's SLOT atomically: the
    # manifest, not the directory listing, is the source of truth
    try:
        V.read_version(spark, store, 2)
        assert False, "uncommitted version must not be readable"
    except ValueError:
        pass


def test_vacuum_expires_old_versions_and_orphans(spark, tmp_path):
    from end_to_end_database_pipeline_project_spark.sources.versioned import (
        expire_versions,
        read_version,
        versions,
        write_version,
    )

    path = str(tmp_path / "vt")
    for i in range(4):
        df = spark.range(10 * (i + 1)).withColumnRenamed("id", "x")
        write_version(df, path)
    # two uncommitted dirs: an old crash orphan BELOW the retention
    # watermark (must be reclaimed) and a higher-numbered dir that
    # could be an in-flight writer (must be left alone — write_version
    # always numbers above every committed entry)
    import os

    os.makedirs(os.path.join(path, "v=0"))
    os.makedirs(os.path.join(path, "v=99"))

    expired = expire_versions(path, retain_last=2)
    assert expired == [1, 2]
    left = [v["version"] for v in versions(path)]
    assert left == [3, 4]
    # latest still readable, expired gone from disk and manifest
    assert read_version(spark, path).count() == 40
    assert read_version(spark, path, 3).count() == 30
    dirs = {d for d in os.listdir(path) if d.startswith("v=")}
    assert dirs == {"v=3", "v=4", "v=99"}, (
        "below-watermark dirs reclaimed, in-flight-candidate dirs kept"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_version(spark, path, 1)
