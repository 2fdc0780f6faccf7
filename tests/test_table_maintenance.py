"""Table-maintenance lifecycle integration: the pieces compose.

A drip-fed landing zone is compacted, published as a versioned
snapshot, re-clustered (z-order) into a new snapshot, and old
snapshots are vacuumed — the nightly OPTIMIZE/VACUUM loop of a
lakehouse table, run end-to-end with content equality checked at
every step."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.operators.layout import (
    cluster_by_zorder,
    file_skip_fraction,
)
from end_to_end_database_pipeline_project_spark.pipeline.medallion import compact_parquet
from end_to_end_database_pipeline_project_spark.sources.versioned import (
    expire_versions,
    read_version,
    versions,
    write_version,
)


def test_compact_publish_zorder_vacuum_roundtrip(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")

    # 1. drip-fed landing zone: 30 tiny appends (written directly as
    # parquet — the compactor doesn't care who wrote them, and 30
    # Spark write jobs cost ~1 s each)
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(landing)
    for i in range(30):
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([i], pa.int64()),
                    "k": pa.array([i % 7], pa.int64()),
                    "v": pa.array([float(i)], pa.float64()),
                }
            ),
            os.path.join(landing, f"part-{i:05d}.parquet"),
        )
    n_small = len([f for f in os.listdir(landing) if f.endswith(".parquet")])
    assert n_small >= 30
    truth = {(r["id"], r["k"], r["v"]) for r in spark.read.parquet(landing).collect()}

    # 2. compact in place, content preserved
    compact_parquet(spark, landing, target_bytes=1 << 30, sort_cols=["id"])
    assert len([f for f in os.listdir(landing) if f.endswith(".parquet")]) == 1
    assert {
        (r["id"], r["k"], r["v"]) for r in spark.read.parquet(landing).collect()
    } == truth

    # 3. publish as snapshot v1
    v1 = write_version(spark.read.parquet(landing), table)
    assert v1 == 1

    # 4. z-order maintenance -> published as snapshot v2
    zdir = str(tmp_path / "zorder")
    cluster_by_zorder(read_version(spark, table), "id", "k", zdir, n_files=4)
    assert file_skip_fraction(zdir, "id", 0, 3) > 0  # skipping works
    v2 = write_version(spark.read.parquet(zdir), table)
    assert v2 == 2
    assert {
        (r["id"], r["k"], r["v"]) for r in read_version(spark, table).collect()
    } == truth  # latest snapshot content-identical after re-cluster

    # 5. another refresh, then vacuum to the last 2 snapshots
    write_version(read_version(spark, table).where(F.col("id") < 20), table)
    expired = expire_versions(table, retain_last=2)
    assert expired == [1]
    assert [v["version"] for v in versions(table)] == [2, 3]
    assert read_version(spark, table, 2).count() == 30
    assert read_version(spark, table).count() == 20
