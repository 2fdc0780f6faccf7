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
    path = str(tmp_path / "landing")
    # a drip-fed landing zone: 40 single-row appends -> 40 tiny files
    for i in range(40):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string").coalesce(
            1
        ).write.mode("append").parquet(path)
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
