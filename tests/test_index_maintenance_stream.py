"""Streaming index maintenance == the batch maintenance report.

`run_index_maintenance_stream` lands embedding micro-batches against
the committed centroid epoch; this pins (test_streaming_drift_monitor
style):

- per-batch monitor rows equal `centroid_maintenance_report` run on
  the same slice directly (batch-equivalence);
- a collapsed micro-batch trips `rebuild_recommended` in-stream while
  an in-distribution one stays quiet;
- republishing mid-loop is picked up: after the rebuild, a fresh
  stream run over a mixture batch probes the NEW version and is quiet.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

REPORT_COLS = [
    "cell_id",
    "ref_n",
    "batch_n",
    "total_n",
    "artifact_version",
    "occupancy_psi",
    "rebuild_recommended",
]


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def vectors():
    import numpy as np

    rng = np.random.default_rng(88)
    base = np.eye(4)
    return [
        (i, [float(x) for x in base[i % 4] + rng.normal(0, 0.05, 4)])
        for i in range(24)
    ]


def _rows(df, batch_id=None):
    if batch_id is not None:
        df = df.where(F.col("batch_id") == batch_id)
    return sorted(tuple(r[c] for c in REPORT_COLS) for r in df.collect())


def test_streamed_batches_equal_batch_report_and_alert(
    spark, tmp_path, vectors
):
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        centroid_maintenance_report,
        publish_centroid_epoch,
    )
    from end_to_end_database_pipeline_project_spark.streaming.index_maintenance import (
        run_index_maintenance_stream,
    )

    ref = _emb_df(spark, vectors)
    centroids = _emb_df(spark, vectors[:4])
    art = str(tmp_path / "epoch")
    publish_centroid_epoch(ref, centroids, art)

    # two micro-batches: in-distribution, then collapsed
    calm = _emb_df(spark, [(100 + i, v) for i, (_, v) in enumerate(vectors)])
    collapsed = _emb_df(spark, [(200 + i, vectors[0][1]) for i in range(12)])
    landing = str(tmp_path / "landing")
    for s in (calm, collapsed):
        s.coalesce(1).write.mode("append").parquet(landing)
        time.sleep(1.1)

    path = run_index_maintenance_stream(
        spark, landing, str(tmp_path / "out"), art
    )
    monitor = spark.read.parquet(path)
    assert monitor.select("batch_id").distinct().count() == 2

    assert _rows(monitor, 0) == _rows(centroid_maintenance_report(spark, art, calm))
    assert _rows(monitor, 1) == _rows(
        centroid_maintenance_report(spark, art, collapsed)
    )
    flags = {
        r["batch_id"]: r["rebuild_recommended"]
        for r in monitor.select("batch_id", "rebuild_recommended").distinct().collect()
    }
    assert flags[0] is False and flags[1] is True

    # the operator acts on the alert: republish over ref + the drifted
    # batch, then a fresh stream pass over a mixture batch probes the
    # NEW version and is quiet
    assert publish_centroid_epoch(ref.unionByName(collapsed), centroids, art) == 2
    landing2 = str(tmp_path / "landing2")
    ref.unionByName(collapsed).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    ).coalesce(1).write.parquet(landing2)
    path2 = run_index_maintenance_stream(
        spark, landing2, str(tmp_path / "out2"), art
    )
    after = spark.read.parquet(path2).collect()
    assert all(r["artifact_version"] == 2 for r in after)
    assert all(r["rebuild_recommended"] is False for r in after)


def test_replay_never_duplicates_monitor_rows(spark, tmp_path, vectors):
    import shutil

    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        publish_centroid_epoch,
    )
    from end_to_end_database_pipeline_project_spark.streaming.index_maintenance import (
        run_index_maintenance_stream,
    )

    art = str(tmp_path / "epoch")
    publish_centroid_epoch(
        _emb_df(spark, vectors), _emb_df(spark, vectors[:4]), art
    )
    landing = str(tmp_path / "landing")
    _emb_df(spark, [(100 + i, v) for i, (_, v) in enumerate(vectors)]).coalesce(
        1
    ).write.parquet(landing)
    out = str(tmp_path / "out")
    path = run_index_maintenance_stream(spark, landing, out, art)
    before = _rows(spark.read.parquet(path))
    shutil.rmtree(os.path.join(out, "_checkpoint"))
    path = run_index_maintenance_stream(spark, landing, out, art)
    assert _rows(spark.read.parquet(path)) == before
