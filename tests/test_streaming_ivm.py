"""Streaming incremental view maintenance: micro-batches fold into a
versioned rollup snapshot; the final state equals the batch recompute.

Composes three proven mechanisms end-to-end: Structured Streaming
micro-batching (maxFilesPerTrigger + availableNow), the mergeable
(sum, count) partial discipline of `incremental_rollup_merge`, and the
manifest-committed snapshots of `sources/versioned.py` — i.e. the
streaming gold-table refresh a serving layer would actually run: each
micro-batch publishes a NEW committed version (readers never see a
half-merged rollup), and history stays addressable per batch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.sources import versioned as V


def test_streaming_microbatches_fold_into_versioned_rollup(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    # three source files -> three micro-batches (maxFilesPerTrigger=1)
    full = spark.range(300).select(
        (F.col("id") % 7).alias("grp"), (F.col("id") * 1.5).alias("value")
    )
    for i in range(3):
        full.where(F.col("id") % 3 == i).coalesce(1).write.parquet(f"{src}/slice={i}")

    def fold(batch_df, batch_id):
        partials = batch_df.groupBy("grp").agg(
            F.sum("value").alias("s"), F.count("value").alias("c")
        )
        if V.versions(store):
            prev = V.read_version(batch_df.sparkSession, store)
            partials = prev.unionByName(partials).groupBy("grp").agg(
                F.sum("s").alias("s"), F.sum("c").alias("c")
            )
        V.write_version(partials, store)

    q = (
        spark.readStream.schema("grp long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/slice=*")
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    vs = V.versions(store)
    assert len(vs) == 3, f"expected one committed version per micro-batch, got {vs}"
    final = V.read_version(spark, store).select(
        "grp", (F.col("s") / F.col("c")).alias("avg_value"), F.col("c").alias("n")
    )
    expect = full.groupBy("grp").agg(
        F.avg("value").alias("avg_value"), F.count("value").alias("n")
    )
    got = {r.grp: (round(r.avg_value, 9), r.n) for r in final.collect()}
    want = {r.grp: (round(r.avg_value, 9), r.n) for r in expect.collect()}
    assert got == want

    # time travel: the version after batch 0 holds ~1/3 of the rows
    v1 = V.read_version(spark, store, 1)
    assert v1.agg(F.sum("c")).first()[0] == 100
