"""Small-files compaction: content-preserving, file-count-bounding."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.pipeline.medallion import (
    compact_parquet,
)


def _parquet_files(path):
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_compaction_preserves_content_and_bounds_files(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "landing")
    # a drip-fed landing zone: 40 single-row appends -> 40 tiny files
    # (written directly as parquet — the compactor doesn't care who
    # wrote them, and 40 Spark write jobs cost ~1 s each)
    os.makedirs(path)
    for i in range(40):
        pq.write_table(
            pa.table({"id": pa.array([i], pa.int64()), "v": [f"v{i}"]}),
            os.path.join(path, f"part-{i:05d}.parquet"),
        )
    assert len(_parquet_files(path)) >= 40

    before = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    n_out = compact_parquet(spark, path, target_bytes=1 << 30, sort_cols=["id"])
    assert n_out == 1  # tiny data, one target-size file
    assert len(_parquet_files(path)) == 1
    after = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert after == before


def test_compaction_splits_at_target_size(spark, tmp_path):
    path = str(tmp_path / "big")
    spark.range(200_000).withColumn("pad", F.md5(F.col("id").cast("string"))).write.mode(
        "overwrite"
    ).parquet(path)
    total = sum(
        os.path.getsize(os.path.join(path, f)) for f in _parquet_files(path)
    )
    target = total // 3
    n_out = compact_parquet(spark, path, target_bytes=target)
    # ceil(total/target) in {3, 4}
    assert n_out in (3, 4)
    assert spark.read.parquet(path).count() == 200_000
